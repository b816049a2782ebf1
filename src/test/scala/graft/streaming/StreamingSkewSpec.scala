package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key hardening for the STREAMING state stores — the stream-side
  * sibling of DedupSkewSpec: one user owns ~90% of all events (a bot, a
  * monitoring probe, a replayed firehose partition). The claims under test:
  *
  *  1. settled output stays exactly correct under the skew, and
  *  2. state is bounded by what the semantics require alive — one row per
  *     DISTINCT in-horizon key (TTL stats, dedup) or per in-window row
  *     (interval join) — never by the hot key's event count, and eviction
  *     actually removes what the watermark retires (`numRowsTotal` from the
  *     query progress is the witness).
  *
  * Bound 2 is what survives 100 TB: a hot key folds into its single state
  * row (or its in-window rows) no matter how many events it emits. */
class StreamingSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base = 1700000000000L // away from epoch 0: t=0 rows sit on the initial watermark
  private def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)

  private def stateRows(q: StreamingQuery): Long =
    q.lastProgress.stateOperators.map(_.numRowsTotal).sum

  test("TTL'd stateful stats under a 90%-hot user: exact stats, state = alive keys only") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = Events.statefulUserStatsTtl(
      input.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.sql.Timestamp, Double)],
      java.time.Duration.ofSeconds(10)).toDF()
    val name = "graft_skew_ttl"
    val q = agg.writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      // batch 1: hot user 1 emits 900 events; cold users 2-101 one each
      input.addData((0 until 900).map(i => (1L, ts(i % 10), i.toDouble)) ++
        (2L to 101L).map(u => (u, ts((u % 10).toInt), u.toDouble)): _*)
      q.processAllAvailable()
      // batch 2: hot user keeps going at t=60-69 (his state must FOLD, not
      // evict: data keeps arriving before his timeout fires); cold users
      // 102-111 appear at t=60
      input.addData((0 until 900).map(i => (1L, ts(60 + i % 10), (900 + i).toDouble)) ++
        (102L to 111L).map(u => (u, ts(60), u.toDouble)): _*)
      q.processAllAvailable()
      // batch 3: one hot event at t=120, then the trailing no-data batch
      // drains the watermark to 120 — every cold user's timeout (armed at
      // <= 70) fires and evicts; only the hot user (re-armed at 130)
      // remains in state. 111 keys, 1801 hot events -> ONE state row.
      input.addData((1L, ts(120), 9999.0))
      q.processAllAvailable()
      assert(stateRows(q) === 1L,
        s"only the in-horizon hot key should remain in state, got ${stateRows(q)}")
      // settled correctness: every user's final stat equals the batch agg
      // over ALL its events (no lifetime of any user was split by the TTL)
      val fin = Events.finalUserStats(s.table(name)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val exp = Set((1L, 1801L, 0.0, 9999.0)) ++
        (2L to 111L).map(u => (u, 1L, u.toDouble, u.toDouble))
      assert(fin === exp)
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("dropDuplicatesWithinWatermark under a 90%-hot key: distinct keys out, state evicts with the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = input.toDF().toDF("user_id", "event_type", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val name = "graft_skew_dedup"
    val q = deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: the hot (1, "view") key re-delivered 1800 times; 200 cold keys once
      input.addData((0 until 1800).map(i => (1L, "view", ts(i % 10))) ++
        (2L to 201L).map(u => (u, "view", ts((u % 10).toInt))): _*)
      q.processAllAvailable()
      // 2000 input rows collapse to 201 state rows — one per DISTINCT key
      assert(stateRows(q) === 201L,
        s"dedup state must scale with distinct keys, got ${stateRows(q)}")
      // batch 2: far-future key advances the watermark past every batch-1
      // key's horizon (9s + 10s delay < 100s) — their state evicts
      input.addData((999L, "view", ts(100)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L,
        s"watermark-retired dedup state must evict, got ${stateRows(q)}")
      val got = s.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === ((2L to 201L).map((_, "view")).toSet + ((1L, "view")) + ((999L, "view"))))
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("stream-stream interval join under a 90%-hot user: exact pairs, state evicts with the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    def tm(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val views = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val v = views.toDF().toDF("v_ts", "v_user", "v_event").withWatermark("v_ts", "15 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user", "p_event").withWatermark("p_ts", "15 minutes")
    val joined = p.join(v, col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("p_event"), col("v_event"))
    val name = "graft_skew_ssjoin"
    val q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // hot user 1: 180 views across minutes 0-9 and 10 purchases at minute
      // 9 (every view in-window -> 1800 pairs); cold users 2-21: one view
      // (min 0) + one purchase (min 5) each
      views.addData((0 until 180).map(i => (tm(i % 10), 1L, 1000L + i)) ++
        (2L to 21L).map(u => (tm(0), u, 2000L + u)): _*)
      purchases.addData((0 until 10).map(i => (tm(9), 1L, 3000L + i)) ++
        (2L to 21L).map(u => (tm(5), u, 4000L + u)): _*)
      q.processAllAvailable()
      val settled = s.table(name).count()
      assert(settled === 180L * 10 + 20,
        s"expected 1800 hot pairs + 20 cold pairs, got $settled")
      // both sides' rows are in state (inner join retains within watermark)
      assert(stateRows(q) === 200L + 30L,
        s"join state should hold all 230 in-horizon rows, got ${stateRows(q)}")
      // advance both watermarks far past every buffered row's horizon:
      // minute 9 + 10 (window) + 15 (delay) < minute 60 — state drains to
      // just the two new rows
      views.addData((tm(60), 999L, 1L))
      purchases.addData((tm(60), 998L, 2L))
      q.processAllAvailable()
      assert(stateRows(q) === 2L,
        s"watermark-retired join state must evict, got ${stateRows(q)}")
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }
}
