package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators over the `events` table (event_id, ts, user_id,
  * event_type, value, props). Batch variants are DuckDB-oracle-checkable;
  * [[streamingTumblingCounts]] runs the same aggregation through a real
  * Structured Streaming query (file source → watermark → windowed agg →
  * memory sink) and must produce identical results.
  *
  * All window-start outputs are epoch seconds/millis (longs) so the oracle
  * comparison never depends on timestamp encoding.
  */
object Events {

  /** The events parquet stores TIMESTAMP(NANOS), which Spark's reader only
    * surfaces via the nanosAsLong legacy conf; we floor-convert to the
    * engine-native microsecond timestamp (`div` keeps it in exact integer
    * arithmetic — ns values overflow double). */
  private def rawEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  private def convertTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  private def events(spark: SparkSession, dir: String): DataFrame =
    convertTs(rawEvents(spark, dir))

  /** Tumbling 1-hour windows: count + exact (decimal-summed) value total. */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
      .select(unix_timestamp(col("w.start")).as("ws_epoch"), col("event_type"),
        col("n"), col("total"))

  /** Sliding windows (1 hour, slide 30 min): each event lands in two
    * windows; windows align to the epoch, matching the DuckDB mirror's
    * floor-division arithmetic. */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws_epoch"), col("event_type"), col("n"))

  /** Batch sessionization (gaps-and-islands): a new session starts when a
    * user is idle > `gapMs`. Millisecond epochs keep ns/µs encoding out of
    * the comparison. This is the deterministic batch mirror of
    * [[streamingSessions]]. */
  def sessionize(spark: SparkSession, dir: String, gapMs: Long = 300000L): DataFrame = {
    val e = events(spark, dir).select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
      col("event_id"))
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val flagged = e.withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_seq"), col("session_start_ms"),
        (col("session_end_ms") - col("session_start_ms")).as("duration_ms"), col("n_events"))
  }

  /** JSON props extraction: real `from_json` on the Spark side (the oracle
    * mirrors it with a regexp — same values). */
  def propsExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("k_val"))

  private val streamCounter = new AtomicInteger(0)

  /** The tumbling aggregation as a genuine Structured Streaming query:
    * parquet file source → withWatermark → window agg → memory sink in
    * complete mode (so the final windows are emitted without needing
    * post-data watermark advancement). Returns the settled result table —
    * identical to [[tumblingCounts]], and checked against the same oracle.
    */
  def streamingTumblingCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = rawEvents(spark, dir).schema
    val name = s"graft_stream_${streamCounter.incrementAndGet()}"
    // FileStreamSource wants a directory; stage the single parquet behind one.
    val staged = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
    val stream = convertTs(spark.readStream.schema(schema).parquet(staged.toString))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
      .select(unix_timestamp(col("w.start")).as("ws_epoch"), col("event_type"),
        col("n"), col("total"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
