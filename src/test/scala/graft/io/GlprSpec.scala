package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Contracts for the GLPR DataSource V2 connector (q284): byte-exact
  * round trip, REAL filter pushdown (visible in the plan AND correct),
  * column pruning down to the read schema, shard-per-partition planning,
  * and graceful empties. */
class GlprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def glpr = GlprSource.documentsVia(spark, dir)
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select("doc_id", "lang", "source", "text")

  test("round trip is byte-exact against the parquet originals") {
    val got = glpr.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val exp = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("doc_id range filters are PUSHED into the scan and stay correct") {
    val q = glpr.filter(col("doc_id") >= 100L && col("doc_id") < 200L)
    val plan = q.queryExecution.executedPlan.toString
    val pushedLine = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushedLine.contains("doc_id"),
      s"doc_id bounds not pushed into the GLPR scan:\n$pushedLine")
    val got = q.select("doc_id").collect().map(_.getLong(0)).toSet
    val exp = docs.filter(col("doc_id") >= 100L && col("doc_id") < 200L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === exp)
    assert(exp.nonEmpty)
    // non-pushable predicates remain residuals and stay correct too
    val mixed = glpr.filter(col("doc_id") >= 100L && col("lang") === "en")
    val gotMixed = mixed.count()
    val expMixed = docs.filter(col("doc_id") >= 100L && col("lang") === "en").count()
    assert(gotMixed === expMixed)
  }

  test("column pruning reaches the connector's read schema") {
    val q = glpr.select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    val rs = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("doc_id") && rs.contains("lang"),
      s"required columns missing from ReadSchema:\n$rs")
    assert(!rs.contains("text"),
      s"pruned 'text' still in the connector ReadSchema:\n$rs")
    // pruned read still returns the right values
    val got = q.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val exp = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === exp)
  }

  test("DSv2 write path: two-phase commit leaves no temp files, replay is idempotent") {
    val out = TempDirs.scratch("graft-glpr-write").toString
    val small = docs.limit(50)
    small.write.format("graft.io.GlprSource").mode("append").save(out)
    val shards = new java.io.File(out).listFiles()
    assert(shards.nonEmpty && shards.forall(_.getName.endsWith(".glpr")))
    assert(!shards.exists(_.getName.startsWith("_tmp")),
      "staged temp files must not survive a committed write")
    def readBack() = spark.read.format("graft.io.GlprSource").load(out)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    val once = readBack()
    assert(once === small.collect().map(r => (r.getLong(0), r.getString(3))).toSet)
    // replayed job: same data, same partitioning — shards replace, never duplicate
    small.write.format("graft.io.GlprSource").mode("append").save(out)
    assert(readBack() === once, "a replayed write must not duplicate records")
  }

  test("q285 streaming source: shards arriving between triggers are read exactly once") {
    import spark.implicits._
    val root = TempDirs.scratch("graft-glpr-stream-test").toString
    def shardOf(rows: Seq[(Long, String, String, String)], name: String): Unit = {
      val tmp = TempDirs.scratch("graft-glpr-shard").toString
      rows.toDF("doc_id", "lang", "source", "text")
        .coalesce(1).write.format("graft.io.GlprSource").mode("append").save(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".glpr")).head
      java.nio.file.Files.move(part.toPath, new java.io.File(root, name).toPath)
    }
    shardOf(Seq((1L, "en", "a", "one"), (2L, "de", "a", "two")), "part-00000.glpr")
    val name = "graft_glpr_arrival_test"
    val q = spark.readStream.format("graft.io.GlprSource").load(root)
      .groupBy("lang").count()
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      def counts() = spark.table(name).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts() === Map("en" -> 1L, "de" -> 1L))
      // a LATER-SORTING shard lands between triggers: picked up exactly once
      shardOf(Seq((3L, "en", "b", "three")), "part-10000.glpr")
      q.processAllAvailable()
      assert(counts() === Map("en" -> 2L, "de" -> 1L),
        "the arriving shard must be read exactly once")
      q.processAllAvailable() // no new shards: nothing double-counts
      assert(counts() === Map("en" -> 2L, "de" -> 1L))
    } finally { q.stop(); spark.catalog.dropTempView(name) }
  }

  test("streaming offsets round-trip their JSON, including quote-bearing names") {
    val o = GlprOffset("""part-"odd"\name.glpr""")
    val back = new GlprMicroBatchStream("/nonexistent", GlprSource.schema,
      GlprSource.IdRange(Long.MinValue, Long.MaxValue)).deserializeOffset(o.json())
    assert(back === o)
    assert(new GlprMicroBatchStream("/nonexistent", GlprSource.schema,
      GlprSource.IdRange(Long.MinValue, Long.MaxValue))
      .deserializeOffset(GlprOffset("").json()) === GlprOffset(""))
  }

  test("filter compilation saturates at the Long extremes instead of wrapping") {
    import org.apache.spark.sql.sources.{GreaterThan, LessThan, LessThanOrEqual}
    // v+1 / v-1 at the extremes would wrap and silently widen a pushed
    // (residual-dropped) filter to the whole id space
    val (p1, _) = GlprSource.compileFilters(Array(GreaterThan("doc_id", Long.MaxValue)))
    assert(p1.isEmpty, "a wrapping strict bound must stay a residual")
    val (p2, _) = GlprSource.compileFilters(Array(LessThan("doc_id", Long.MinValue)))
    assert(p2.isEmpty)
    val (p3, r3) = GlprSource.compileFilters(
      Array(GreaterThan("doc_id", 10L), LessThanOrEqual("doc_id", 20L)))
    assert(p3.length === 2 && r3 === GlprSource.IdRange(11L, 20L))
  }

  test("a truncated shard fails with a diagnostic naming the file, never a silent short read") {
    import spark.implicits._
    val root = TempDirs.scratch("graft-glpr-corrupt").toString
    Seq((1L, "en", "a", "a long enough text payload to truncate inside"))
      .toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.format("graft.io.GlprSource").mode("append").save(root)
    val shard = new java.io.File(root).listFiles().filter(_.getName.endsWith(".glpr")).head
    val full = java.nio.file.Files.readAllBytes(shard.toPath)
    // cut inside the text field
    java.nio.file.Files.write(shard.toPath, full.take(full.length - 10))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft.io.GlprSource").load(root).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("truncated") && msg.contains(".glpr"),
      s"corrupt shard must fail with a named diagnostic, got: $msg")
    // cut inside the 8-byte id of a (hypothetical) second record
    java.nio.file.Files.write(shard.toPath, full ++ Array[Byte](0, 0, 1))
    val e2 = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft.io.GlprSource").load(root).collect()
    }
    val msg2 = Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage
    assert(msg2.contains("inside a record id"), s"got: $msg2")
  }

  test("one input partition per shard; empty shard dir reads as empty") {
    // the staged write shards by writer partition: >= 1 .glpr files, and
    // the scan plans exactly one partition per shard
    val n = glpr.rdd.getNumPartitions
    assert(n >= 1)
    val empty = TempDirs.scratch("graft-glpr-empty").toString
    val e = spark.read.format("graft.io.GlprSource").load(empty)
    assert(e.count() === 0L)
    assert(e.schema === GlprSource.schema)
  }
}
