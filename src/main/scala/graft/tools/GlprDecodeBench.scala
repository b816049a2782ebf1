package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench behind the GLPR reader's decode numbers
  * ([[graft.io.GlprReader]]): stages a synthetic corpus (default 2M
  * records, ~530 B of text each — far larger than the sandbox
  * `documents` table, so the scan cost is real) through the DSv2 write
  * path once, then times full-schema / text-only / pruned-id-only
  * scans, min-of-reps. Run:
  * `sbt "runMain graft.tools.GlprDecodeBench [nRows] [nMd5PerText]"`.
  *
  * Recorded results (local[8], min-of-5), three reader generations —
  * r14 `DataInputStream`+`InternalRow.fromSeq`, then the r15
  * chunk-buffered UnsafeRowWriter row reader, then the r15 COLUMNAR
  * reader (`ColumnarBatch` of reused `OnHeapColumnVector`s, the shipped
  * default):
  *
  *  - 2M rows × 16-md5 text (~1.1 GB): full-schema 0.390 -> 0.210 ->
  *    0.186s (2.1x total), text-only 0.376 -> 0.170 -> 0.147s (2.6x),
  *    id-only pruned count 0.313 -> 0.135 -> 0.117s (2.7x).
  *  - 8M rows × 2-md5 text (~0.9 GB, per-record-overhead-bound):
  *    full-schema 0.973 -> 0.302 -> 0.192s (5.1x total), text-only
  *    0.801 -> 0.237 -> 0.160s (5.0x), id-only 0.714 -> 0.181 -> 0.113s
  *    (6.3x).
  *
  * The three levers, in order: 1 MiB chunk refills with direct offset
  * arithmetic (kills per-length-prefix stream-call overhead), recycled
  * row/vector storage + zero-copy wraps (kills per-record allocation),
  * and the columnar hand-off (per-record row materialization leaves the
  * source; Spark's codegen'd ColumnarToRow takes over). See
  * GlprChunkCursor / GlprColumnarReader scaladocs. */
object GlprDecodeBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nMd5 = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("glpr-decode-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = graft.io.TempDirs.scratch("graft-glpr-decode-bench").toString
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("l"), (col("id") % 7).cast("string")).as("lang"),
      concat(lit("src"), (col("id") % 13).cast("string")).as("source"),
      // nMd5 x ~33 bytes of deterministic text per record
      concat_ws(" ", (0 until nMd5).map(i =>
        md5(concat(col("id").cast("string"), lit(s"-$i")))): _*).as("text"))
    graft.io.GlprSource.write(docs, root)
    val glpr = spark.read.format("graft.io.GlprSource").load(root)

    def time(label: String)(body: => Long): Unit = {
      val reps = 5
      var best = Double.MaxValue
      var rows = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        rows = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-28s $best%.3f s (min-of-$reps, $rows rows)")
    }
    // decode every field (the text-heavy path the rewrite targets)
    time("full-schema scan") {
      glpr.agg(count(lit(1)), sum(octet_length(col("text"))),
        sum(octet_length(col("lang")))).collect(); n
    }
    // only the big string column
    time("text-only scan") {
      glpr.agg(sum(octet_length(col("text")))).collect(); n
    }
    // pruned + nothing decoded: pure skip path
    time("id-only pruned count") { glpr.select("doc_id").count() }
    spark.stop()
  }
}
