package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic driver for the q64 stream-stream interval join cost trend:
  * replicates Events.settle's harness around the SAME join, but keeps the
  * StreamingQuery handle so per-micro-batch durations, state-operator row
  * counts, and commit-phase timings are visible. Knobs: watermark delay,
  * reps, and how many OTHER streaming queries to run first (tests whether
  * accumulated state-store providers / listener residue from earlier
  * registry queries inflates a later q64 — the cross-round drift
  * hypothesis: each round adds streaming queries that bench BEFORE q64).
  *
  *   sbt "runMain graft.tools.StreamProbe reps=3 wm=7200 pre=0"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val opt = args.map(_.split("=")).collect { case Array(k, v) => k -> v }.toMap
    val reps = opt.getOrElse("reps", "3").toInt
    val wmSec = opt.getOrElse("wm", "7200").toInt
    val pre = opt.getOrElse("pre", "0").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // pre-pollution: run other registry queries first (pre=N takes the
    // first N of the streaming list; preq=a,b,c names arbitrary queries —
    // e.g. the heavy LSH/ALS ones that leave persisted/checkpointed blocks)
    val streamingNames = Seq("q52_streaming_tumbling", "q54_streaming_sessionize",
      "q58_stateful_user_stats", "q89_streaming_dedup", "q113_stream_enrich")
    val preNames = streamingNames.take(pre) ++
      opt.get("preq").toSeq.flatMap(_.split(",")).filter(_.nonEmpty)
    def pollute(): Unit = preNames.foreach { n =>
      val t0 = System.nanoTime()
      graft.Registry.queries(n)(spark, dir).count()
      println(f"PRE $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // sandwich mode: probe BEFORE and AFTER pollution in the same JVM, so
    // box-level noise can't masquerade as a residue effect
    val sandwich = opt.get("sandwich").contains("true")
    if (!sandwich) pollute()

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    if (opt.get("nodata").contains("false"))
      s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val staged = graft.io.TempDirs.scratch("graft-probe-events")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
    val schema = s2.read.parquet(s"$dir/events.parquet").schema

    var phase = "pre"
    def probeOnce(rep: Int): Unit = {
      val t0 = System.nanoTime()
      val stream = graft.streaming.Events.convertTs(
        s2.readStream.schema(schema).parquet(staged.toString))
      val p = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_event"))
        .withWatermark("p_ts", s"$wmSec seconds")
      val v = stream.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("v_event"))
        .withWatermark("v_ts", s"$wmSec seconds")
      val joined = p.join(v, col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 3600000 MILLISECONDS") &&
          col("v_ts") <= col("p_ts"))
        .select(col("p_event"), col("v_event"),
          (unix_millis(col("p_ts")) - unix_millis(col("v_ts"))).as("lag_ms"))
      val name = s"probe_${phase}_$rep"
      val q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val n = s2.table(name).count()
      s2.catalog.dropTempView(name)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"RUN phase=$phase rep=$rep wm=${wmSec}s total=$total%.2f s rows=$n batches=${q.recentProgress.length}")
      q.recentProgress.foreach { pr =>
        val dur = pr.durationMs
        val st = pr.stateOperators.map(s =>
          s"rows=${s.numRowsTotal} upd=${s.numRowsUpdated} removed=${s.numRowsRemoved} " +
          s"commitMs=${s.allUpdatesTimeMs}/${s.allRemovalsTimeMs}/${s.commitTimeMs} mem=${s.memoryUsedBytes}")
          .mkString(" | ")
        println(s"  batch=${pr.batchId} in=${pr.numInputRows} " +
          s"trigger=${dur.get("triggerExecution")} addBatch=${dur.get("addBatch")} " +
          s"getBatch=${dur.get("getBatch")} planning=${dur.get("queryPlanning")} " +
          s"walCommit=${dur.get("walCommit")} commitOffsets=${dur.get("commitOffsets")} " +
          s"state[$st]")
      }
    }
    if (sandwich) {
      (1 to reps).foreach(probeOnce)
      pollute()
      phase = "post"
      (1 to reps).foreach(probeOnce)
    } else {
      phase = "run"
      (1 to reps).foreach(probeOnce)
    }
    spark.stop()
  }
}
