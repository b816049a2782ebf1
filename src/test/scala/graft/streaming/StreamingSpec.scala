package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.TestSpark

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def canon(rows: Array[Row]): Set[(Long, String, Long, Double)] =
    rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

  test("structured-streaming tumbling agg equals the batch plan") {
    val batch = Events.tumblingCounts(spark, dir).collect()
    val stream = Events.streamingTumblingCounts(spark, dir).collect()
    assert(batch.nonEmpty)
    assert(canon(batch) === canon(stream))
  }

  test("sliding windows cover each event twice") {
    val n = spark.read.format("parquet").load(s"$dir/events.parquet").count()
    val total = Events.slidingCounts(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(total === 2 * n)
  }

  test("sessionization: session count bounded and durations non-negative") {
    val s = Events.sessionize(spark, dir)
    import org.apache.spark.sql.functions._
    assert(s.filter(col("duration_ms") < 0).count() === 0)
    val perUser = s.groupBy("user_id").agg(count(lit(1)).as("n"), sum("n_events").as("ev"))
    val ev = spark.read.parquet(s"$dir/events.parquet").groupBy("user_id").count()
    // every user's events are fully partitioned into sessions
    val joined = perUser.join(ev, "user_id")
      .filter(col("ev") =!= col("count"))
    assert(joined.count() === 0)
  }
}
