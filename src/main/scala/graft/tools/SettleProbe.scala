package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost decomposition for the two heaviest streaming settles (q162
  * streaming history near-dup, q170 streaming admission quota) — the
  * IpfSweepProbe pattern: measure the harness phases a drain-and-stop
  * settle always pays, so a future bench drift is attributable to a phase
  * (staging write, micro-batch machinery, or the query's own logic) before
  * anything is tuned.
  *
  * Phases:
  *  - `stage-docs`: write the newest ingest batch to scratch parquet (the
  *    settleDocs staging write; q170's event staging is a symlink, ~0).
  *  - `null-drain-docs` / `null-drain-events`: a trivial projection
  *    streamed over the same staged input through a memory sink,
  *    processAllAvailable + stop — the fixed cost of the micro-batch
  *    machinery (source listing, offset log, one-batch execution, sink).
  *  - `q162` / `q170`: the registry queries end-to-end (min of `reps`).
  *  - residual = end-to-end − null-drain − staging ≈ the query's own plan
  *    (q162: two stream-static broadcast joins + verify; q170: the
  *    flatMapGroupsWithState quota core).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.SettleProbe"
  */
object SettleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = args.headOption.map(_.toInt).getOrElse(3)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map(_ => time(f))
      println(f"SETTLE $label min=${ts.min}%.2f s reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // ---- staging write: the newest doc batch, the settleDocs shape ----
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val maxB = docs.agg(max(expr("doc_id div 100"))).head().getLong(0)
    val incoming = docs.filter(expr("doc_id div 100") === maxB)
    val stagedDocs = graft.io.TempDirs.scratch("graft-probe-docs").toString
    minOf("stage-docs") {
      incoming.coalesce(1).write.mode("overwrite").parquet(stagedDocs)
    }

    // ---- null drains: micro-batch machinery with a trivial projection ----
    def nullDrain(staged: String, schemaOf: String): Unit = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "8")
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s2.read.parquet(schemaOf).schema
      val name = s"probe_null_${System.nanoTime()}"
      val q = s2.readStream.schema(schema).parquet(staged)
        .select(col(schema.head.name))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      s2.catalog.dropTempView(name)
    }
    minOf("null-drain-docs") { nullDrain(stagedDocs, s"$dir/documents.parquet") }

    val stagedEv = graft.io.TempDirs.scratch("graft-probe-ev")
    java.nio.file.Files.createSymbolicLink(
      stagedEv.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
    minOf("null-drain-events") {
      nullDrain(stagedEv.toString, s"$dir/events.parquet")
    }

    // ---- the registry queries end-to-end ----
    minOf("q162") {
      graft.Registry.queries("q162_streaming_history_neardup")(spark, dir).count()
    }
    minOf("q170") {
      graft.Registry.queries("q170_streaming_quota")(spark, dir).count()
    }
    // q58 joined the probe after its r10→r12 driver-bench drift (1.49 →
    // 1.99 s): decomposing against null-drain-events attributes the delta
    // to the micro-batch machinery vs the mapGroupsWithState core.
    minOf("q58") {
      graft.Registry.queries("q58_stateful_user_stats")(spark, dir).count()
    }
    spark.stop()
  }
}
