package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.TestSpark

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def canon(rows: Array[Row]): Set[(Long, String, Long, Double)] =
    rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

  test("streaming dedup settles to exactly the batch distinct key set") {
    val got = Events.streamingDedupKeys(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val exp = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(exp.nonEmpty)
    assert(got === exp)
  }

  test("structured-streaming tumbling agg equals the batch plan") {
    val batch = Events.tumblingCounts(spark, dir).collect()
    val stream = Events.streamingTumblingCounts(spark, dir).collect()
    assert(batch.nonEmpty)
    assert(canon(batch) === canon(stream))
  }

  test("stream-static enrichment settles to the batch join-then-window plan") {
    import org.apache.spark.sql.functions._
    val stream = Events.streamingEnrichedCounts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dim = s2.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("mktsegment"))
    val batch = Events.convertTs(s2.read.parquet(s"$dir/events.parquet"))
      .join(dim, "user_id")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("ws_epoch"), col("mktsegment"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("sliding windows cover each event twice") {
    val n = spark.read.format("parquet").load(s"$dir/events.parquet").count()
    val total = Events.slidingCounts(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(total === 2 * n)
  }

  test("streaming session_window equals the batch gaps-and-islands mirror") {
    val batch = Events.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val stream = Events.streamingSessions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("watermark drops late events in append-mode session aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val agg = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("sw"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), unix_millis(col("sw.start")).as("start_ms"), col("n"))
    val name = "graft_watermark_test"
    val q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData((ts(0), "u1"), (ts(1), "u1"))   // session A
      q.processAllAvailable()
      input.addData((ts(60), "u1"))                  // advances watermark to t=50min
      q.processAllAvailable()
      input.addData((ts(2), "u1"))                   // LATE: below watermark -> dropped
      q.processAllAvailable()
      val rows = s.table(name).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // session A emitted with exactly 2 events; the late event never lands
      assert(rows.contains(("u1", 0L, 2L)), s"got ${rows.mkString(", ")}")
      assert(rows.forall(_._3 <= 2L))
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
  }

  test("stateful user stats accumulate across micro-batches and match the batch agg") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, Double)]
    val name = "graft_stateful_test"
    val q = Events.statefulUserStats(input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      input.addData((1L, 5.0), (1L, 2.0), (2L, 7.0))
      q.processAllAvailable()
      input.addData((1L, 9.0))           // second batch: state must carry over
      q.processAllAvailable()
      val last = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .groupBy(_._1).map { case (u, rows) => rows.maxBy(_._2) }.toSet
      assert(last === Set((1L, 3L, 2.0, 9.0), (2L, 1L, 7.0, 7.0)))
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("q257 transformWithState: ValueState+MapState accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val prior = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String, Double)]
    val name = "graft_tws_test"
    val q = input.toDS().groupByKey(_._1)
      .transformWithState(new Events.UserTypeStatsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      input.addData((1L, "view", 5.0), (1L, "view", 2.0), (2L, "click", 7.0))
      q.processAllAvailable()
      input.addData((1L, "click", 9.0)) // batch 2: both state vars must carry over
      q.processAllAvailable()
      val last = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
      // user 1: 3 events, 2 distinct types (map state carried), min 2 max 9
      assert(last === Set((1L, 3L, 2L, 2.0, 9.0), (2L, 1L, 1L, 7.0, 7.0)))
    } finally {
      q.stop(); s.catalog.dropTempView(name)
      prior match {
        case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("q264 timers: a session closes via handleExpiredTimer with NO further input for its key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.functions.{col, unix_millis}
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val prior = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = 1700000000000L
    def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val name = "graft_tws_timer_test"
    val q = input.toDF().toDF("user_id", "ts", "event_id")
      .withWatermark("ts", "0 milliseconds")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new Events.SessionTimerProcessor(300000L),
        TimeMode.EventTime(), OutputMode.Update())
      .toDF()
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      input.addData((1L, ts(0), 10L), (1L, ts(60), 11L), (2L, ts(0), 20L))
      q.processAllAvailable()
      input.addData((1L, ts(120), 12L)) // extends user 1's open session across batches
      q.processAllAvailable()
      input.addData((2L, ts(3600), 21L)) // only advances the watermark for user 1
      q.processAllAvailable()
      val rows = s.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      // user 1 got NO input after ts(120), yet its session must close —
      // that close can only come from the expired event-time timer.
      val u1closed = rows.filter(r => r._1 == 1L && r._6)
      assert(u1closed.toSeq === Seq((1L, 1L, base, 120000L, 3L, true)),
        s"user 1 must close once, by timer, with the batch-merged span: ${rows.mkString(",")}")
      // user 2's first (one-event) session also times out; its hour-later
      // session sits within the gap of the final watermark → open snapshot only
      assert(rows.filter(r => r._1 == 2L && r._6).toSeq ===
        Seq((2L, 1L, base, 0L, 1L, true)))
      val u2open = rows.filter(r => r._1 == 2L && r._2 == 2L)
      assert(u2open.nonEmpty && u2open.forall(!_._6),
        "the corpus-edge session must surface as an open snapshot, never a close")
    } finally {
      q.stop(); s.catalog.dropTempView(name)
      prior match {
        case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("TTL'd user stats: timed-out state evicts and re-initializes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // Base away from epoch 0 (rows on the initial watermark drop as late).
    val base = 1700000000000L
    def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = Events.statefulUserStatsTtl(
      input.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.sql.Timestamp, Double)],
      java.time.Duration.ofSeconds(10)).toDF()
    val name = "graft_ttl_test"
    val q = agg.writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      input.addData((1L, ts(0), 5.0), (1L, ts(1), 7.0))
      q.processAllAvailable()                    // user 1: n=2, timeout armed at t=11s
      input.addData((2L, ts(60), 3.0))           // watermark -> t=60s: user 1 times out
      q.processAllAvailable()
      input.addData((1L, ts(70), 100.0))         // user 1 reappears after eviction
      q.processAllAvailable()
      val rows = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      // pre-eviction accumulation, then the timeout's final emission (same
      // stat), then a FRESH state: n restarts at 1 with min=max=100
      assert(rows.count(_ == ((1L, 2L, 5.0, 7.0))) >= 2, s"timeout emission missing: ${rows.mkString(", ")}")
      assert(rows.contains((1L, 1L, 100.0, 100.0)), s"state not re-initialized: ${rows.mkString(", ")}")
      assert(!rows.contains((1L, 3L, 5.0, 100.0)), "state survived past its TTL")
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("settle selection returns the POST-eviction stat when a key evicts and re-accumulates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = 1700000000000L
    def ts(sec: Int) = new java.sql.Timestamp(base + sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = Events.statefulUserStatsTtl(
      input.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.sql.Timestamp, Double)],
      java.time.Duration.ofSeconds(10)).toDF()
    val name = "graft_ttl_settle_test"
    val q = agg.writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      // user 1's FIRST lifetime accumulates n=2 — more emissions and a
      // higher count than its post-eviction lifetime will ever reach, so a
      // max-n_events settle rule would wrongly resurrect this partial.
      input.addData((1L, ts(0), 5.0), (1L, ts(1), 7.0))
      q.processAllAvailable()
      input.addData((2L, ts(60), 3.0))           // watermark -> 60s: user 1 evicts
      q.processAllAvailable()
      input.addData((1L, ts(70), 100.0))         // fresh lifetime: n restarts at 1
      q.processAllAvailable()
      val fin = Events.finalUserStats(s.table(name)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(fin === Set((1L, 1L, 100.0, 100.0), (2L, 1L, 3.0, 3.0)),
        s"settle did not pick the post-eviction lifetime: $fin")
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("streaming user stats over the events parquet equal the batch aggregation") {
    import org.apache.spark.sql.functions._
    val got = Events.streamingUserStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val exp = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id").agg(count(lit(1)).as("n"), min("value"), max("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got === exp)
  }

  test("stream-stream interval join equals its batch twin (which is DuckDB-checked as q77)") {
    val got = Events.streamingIntervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = Events.intervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got === exp)
  }

  test("stream-stream join state carries across micro-batches within the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // Base away from epoch 0: rows sitting exactly on the initial watermark
    // (t=0) are evicted as late — a fixture artifact, not join semantics.
    val base = 1700000000000L
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val views = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val v = views.toDF().toDF("v_ts", "v_user", "v_event").withWatermark("v_ts", "30 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user", "p_event").withWatermark("p_ts", "30 minutes")
    val joined = p.join(v, col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("p_event"), col("v_event"))
    val name = "graft_ssjoin_test"
    val q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      views.addData((ts(0), 1L, 10L))          // batch 1: view only
      q.processAllAvailable()
      purchases.addData((ts(5), 1L, 20L))      // batch 2: purchase 5 min later
      purchases.addData((ts(25), 1L, 30L))     // outside the 10-min window
      q.processAllAvailable()
      val got = s.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((20L, 10L)), s"got $got")  // matched across batches; 30 unmatched
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("q267 left-outer stream-stream join: null row emits ONLY at watermark eviction, exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = 1700000000000L
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val pIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val vIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val p = pIn.toDF().toDF("p_user", "p_ts", "p_event").withWatermark("p_ts", "10 minutes")
    val v = vIn.toDF().toDF("v_user", "v_ts", "v_event").withWatermark("v_ts", "10 minutes")
    val joined = p.join(v, col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 60 MINUTES") &&
        col("v_ts") <= col("p_ts"), "leftOuter")
      .select(col("p_event"), col("v_event"))
    val name = "graft_outer_join_test"
    val q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: u1 purchase with NO view; u2 purchase WITH a matching view
      pIn.addData((1L, ts(30), 100L), (2L, ts(30), 200L))
      vIn.addData((2L, ts(20), 201L))
      q.processAllAvailable()
      def rows() = s.table(name).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      val after1 = rows()
      assert(after1.contains((200L, 201L)), s"inner match must emit eagerly: ${after1.mkString(",")}")
      assert(!after1.exists(_._1 == 100L),
        "the null-padded row must NOT emit before the watermark passes the purchase")
      // batch 2: far-future rows on BOTH sides push the combined watermark
      // (min of the two inputs) past u1's eviction point (p_ts = 30 min)
      pIn.addData((9L, ts(600), 900L))
      vIn.addData((9L, ts(601), 901L)) // 1 min AFTER the purchase — no match
      q.processAllAvailable()
      val after2 = rows()
      assert(after2.count(_ == ((100L, -1L))) === 1,
        s"unmatched purchase must emit exactly one null row after eviction: ${after2.mkString(",")}")
      assert(!after2.exists(_._1 == 900L),
        "the corpus-edge purchase is not yet evictable and must stay silent")
      assert(after2.count(_._1 == 200L) === 1, "the matched purchase never gains a null twin")
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("q299 chained join->window: the window flushes only after the watermark passes its END") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = 1700000000000L
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val pIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val vIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val p = pIn.toDF().toDF("p_user", "p_ts", "p_event").withWatermark("p_ts", "10 minutes")
    val v = vIn.toDF().toDF("v_user", "v_ts", "v_event").withWatermark("v_ts", "10 minutes")
    val out = p.join(v, col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 60 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .groupBy(window(col("p_ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(unix_millis(col("w.start")).as("ws"), col("n_pairs"))
    val name = "graft_join_window_test"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      def rows() = s.table(name).collect().map(r => (r.getLong(0), r.getLong(1)))
      // two matches in the same epoch-hour window
      pIn.addData((2L, ts(30), 200L), (3L, ts(31), 210L))
      vIn.addData((2L, ts(20), 201L), (3L, ts(25), 211L))
      q.processAllAvailable()
      assert(rows().isEmpty,
        "the window must NOT flush while the watermark is below its end — even though the join matched")
      // advance both watermarks far past the window end
      pIn.addData((9L, ts(200), 900L))
      vIn.addData((8L, ts(200), 901L))
      q.processAllAvailable()
      val expectedStart = (base + 30 * 60000L) / 3600000L * 3600000L
      assert(rows().toSeq === Seq((expectedStart, 2L)),
        s"exactly one finalized window with both pairs: ${rows().mkString(",")}")
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("q294 full-outer stream-stream join: EACH side's null row emits only at ITS eviction point") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = 1700000000000L
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val pIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val vIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val p = pIn.toDF().toDF("p_user", "p_ts", "p_event").withWatermark("p_ts", "10 minutes")
    val v = vIn.toDF().toDF("v_user", "v_ts", "v_event").withWatermark("v_ts", "10 minutes")
    val joined = p.join(v, col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 60 MINUTES") &&
        col("v_ts") <= col("p_ts"), "fullOuter")
      .select(col("p_event"), col("v_event"))
    val name = "graft_full_outer_join_test"
    val q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      def rows() = s.table(name).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1)))
      // batch 1: u1 purchase@30 with NO view; u3 view@20 with NO purchase;
      // u2 purchase@30 WITH its view@20
      pIn.addData((1L, ts(30), 100L), (2L, ts(30), 200L))
      vIn.addData((2L, ts(20), 201L), (3L, ts(20), 301L))
      q.processAllAvailable()
      val after1 = rows()
      assert(after1.contains((200L, 201L)), s"inner match must emit eagerly: ${after1.mkString(",")}")
      assert(!after1.exists(t => t._1 == -1L || t._2 == -1L),
        "no null row may emit before any eviction point")
      // batch 2: watermark (min of both inputs, 10 min delay) moves to 45 —
      // past the purchase@30 (evicts at wm > 30) but NOT past the view@20's
      // later horizon (evicts only at wm > 20 + 60 = 80: a future purchase
      // at up to ts 80 could still reach back to it)
      pIn.addData((8L, ts(55), 800L))
      vIn.addData((9L, ts(55), 901L))
      q.processAllAvailable()
      val after2 = rows()
      assert(after2.count(_ == ((100L, -1L))) === 1,
        s"unmatched purchase must null-emit exactly once at wm 45: ${after2.mkString(",")}")
      assert(!after2.contains((-1L, 301L)),
        "the unmatched view must stay silent until wm passes v_ts + window")
      // batch 3: watermark to 90 — past the view's 80-minute horizon
      pIn.addData((8L, ts(100), 801L))
      vIn.addData((9L, ts(100), 902L))
      q.processAllAvailable()
      val after3 = rows()
      assert(after3.count(_ == ((-1L, 301L))) === 1,
        s"unmatched view must null-emit exactly once after ITS eviction: ${after3.mkString(",")}")
      assert(after3.count(_ == ((100L, -1L))) === 1, "the purchase null row never duplicates")
      assert(after3.count(_ == ((200L, 201L))) === 1, "the matched pair never gains a null twin")
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("q294 settled full outer join carries BOTH null sides and matches within the matured region") {
    val got = Events.streamingIntervalJoinFullOuter(spark, dir).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got.exists(t => t._1 != -1L && t._2 == -1L), "no purchase-side null rows — left leg vacuous")
    assert(got.exists(t => t._1 == -1L && t._2 != -1L), "no view-side null rows — right leg vacuous")
    assert(got.exists(t => t._1 != -1L && t._2 != -1L), "no matched rows")
  }

  test("q267 settled outer join equals the batch left join on matured purchases") {
    val got = Events.streamingIntervalJoinOuter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got.nonEmpty)
    // unmatched purchases really are present, null-padded
    assert(got.exists(_._3 == -1L), "no null-padded rows — the outer leg is vacuous")
    // and every inner match in the matured region appears too
    val inner = got.filter(_._3 != -1L)
    assert(inner.nonEmpty)
  }

  test("q268 foreachBatch merge: cross-batch upserts, tombstone wins, replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = graft.io.TempDirs.scratch("graft-fbmerge-test")
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val q = input.toDF().toDF("user_id", "ts_ms", "event_id", "event_type", "value")
      .writeStream
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        Events.mergeBatchInto(root, b, id))
      .start()
    def state(): Set[(Long, Long, String, Double)] = {
      val (_, snap) = Events.readMergeMeta(root).get
      s.read.parquet(snap).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4))).toSet
    }
    try {
      input.addData((1L, 100L, 10L, "view", 1.0), (2L, 100L, 20L, "view", 2.0))
      q.processAllAvailable()
      assert(state() === Set((1L, 10L, "view", 1.0), (2L, 20L, "view", 2.0)))
      // batch 2: newer event for u1, tombstone for u2 — latest wins, and
      // the tombstone must SIT IN state (readers filter it), not vanish
      input.addData((1L, 200L, 11L, "purchase", 5.0), (2L, 200L, 21L, "error", 0.0))
      q.processAllAvailable()
      val afterB2 = state()
      assert(afterB2 === Set((1L, 11L, "purchase", 5.0), (2L, 21L, "error", 0.0)))
      // REPLAY the committed batch id with DIFFERENT (poisoned) data: the
      // pointer check must make the retry invisible
      val (lastId, _) = Events.readMergeMeta(root).get
      val poison = Seq((1L, 999L, 99L, "poison", 9.9))
        .toDF("user_id", "ts_ms", "event_id", "event_type", "value")
      Events.mergeBatchInto(root, poison, lastId)
      Events.mergeBatchInto(root, poison, lastId - 1)
      assert(state() === afterB2, "a replayed batchId must never change the target")
      // and a genuinely NEW batch id still merges
      Events.mergeBatchInto(root, Seq((3L, 300L, 30L, "view", 3.0))
        .toDF("user_id", "ts_ms", "event_id", "event_type", "value"), lastId + 1)
      assert(state().contains((3L, 30L, "view", 3.0)))
    } finally q.stop()
  }

  test("q268 settled merge target equals the q207 batch compaction") {
    val got = Events.foreachBatchUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val exp = Events.cdcCompact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("q273 ListState context: history carries across micro-batches, stays trimmed to 2") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val prior = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long, Long, String)]
    val name = "graft_tws_list_test"
    val q = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new Events.RollingContextProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try {
      input.addData((1L, 100L, 10L, "view"), (1L, 200L, 11L, "click"))
      q.processAllAvailable()
      assert(s.table(name).count() === 0L, "two events cannot fill a 2-deep history")
      // batch 2: the example's context must come from batch-1 ListState
      input.addData((1L, 300L, 12L, "purchase"), (1L, 400L, 13L, "view"))
      q.processAllAvailable()
      val rows = s.table(name).collect()
        .map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getString(4))).toSet
      assert(rows === Set(
        (12L, "view", "click", "purchase"),   // carried history
        (13L, "click", "purchase", "view")),  // trimmed window slides
        s"got $rows")
    } finally {
      q.stop(); s.catalog.dropTempView(name)
      prior match {
        case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("q273 settled ListState dataset equals the batch lag-window build") {
    val got = Events.twsRollingContext(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getString(4))).toSet
    val exp = Events.nextEventDataset(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("q274 U-shaped credit: planted 1/2/4-touch purchases get exact weights") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // u1: one touch; u2: two; u4: four (0.4 / 0.1 / 0.1 / 0.4)
    val base = 1700000000000L
    val rows = Seq(
      (1L, base + 1000L, 10L, "view"), (1L, base + 2000L, 11L, "purchase"),
      (2L, base + 1000L, 20L, "view"), (2L, base + 2000L, 21L, "click"),
      (2L, base + 3000L, 22L, "purchase"),
      (4L, base + 1000L, 40L, "view"), (4L, base + 2000L, 41L, "click"),
      (4L, base + 3000L, 42L, "view"), (4L, base + 4000L, 43L, "click"),
      (4L, base + 5000L, 44L, "purchase"))
    val ev = rows.toDF("user_id", "ms", "event_id", "event_type")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_id"), col("event_type"), lit(0.0).as("value"))
    val out = Events.uShapedAttributionFrom(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(out.filter(_._1 == 11L).map(_._3).toSeq === Seq(1.0))
    assert(out.filter(_._1 == 22L).map(_._3).sorted.toSeq === Seq(0.5, 0.5))
    val u4 = out.filter(_._1 == 44L).sortBy(_._2).map(t => t._2 -> t._3)
    assert(u4.toSeq === Seq(40L -> 0.4, 41L -> 0.1, 42L -> 0.1, 43L -> 0.4))
    // credit always sums to 1 per purchase
    Seq(11L, 22L, 44L).foreach { p =>
      assert(math.abs(out.filter(_._1 == p).map(_._3).sum - 1.0) < 1e-9)
    }
  }

  test("q275 windowed funnel: out-of-order AND out-of-window steps never count") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = 1700000000000L
    // u1 completes in order; u2 clicks BEFORE viewing (click must not count);
    // u3 views only; u4 purchase before click (purchase must not count)
    val rows = Seq(
      (1L, base + 1000L, 10L, "view"), (1L, base + 2000L, 11L, "click"),
      (1L, base + 3000L, 12L, "purchase"),
      (2L, base + 1000L, 20L, "click"), (2L, base + 2000L, 21L, "view"),
      (3L, base + 1000L, 30L, "view"),
      (4L, base + 1000L, 40L, "view"), (4L, base + 2000L, 41L, "purchase"),
      (4L, base + 3000L, 42L, "click"),
      // u5 clicks 8 days after viewing: ordered but OUTSIDE the 7-day gap
      (5L, base + 1000L, 50L, "view"),
      (5L, base + 1000L + 8L * 86400000L, 51L, "click"))
    val ev = rows.toDF("user_id", "ms", "event_id", "event_type")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_id"), col("event_type"), lit(0.0).as("value"))
    val out = Events.funnelConversionFrom(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._3)) ===
      Array((1L, "view", 5L), (2L, "click", 2L), (3L, "purchase", 1L)))
    assert(out(0)._4 === 1.0)     // 5 viewers of 5 active users
    assert(out(1)._4 === 0.4)     // only u1, u4 clicked after viewing IN window
    assert(out(2)._4 === 0.5)     // only u1 purchased after the click
  }

  test("q276 growth accounting: planted new/retained/resurrected/churned, identities hold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wk = 7L * 86400000L
    // u1 active wk0,wk1 (retained), absent wk2 (churned at 2)
    // u2 active wk0, absent wk1 (churned at 1), back wk2 (resurrected)
    // u3 first appears wk1 (new at 1), active wk2 (retained)
    val rows = Seq(
      (1L, 0L), (1L, wk),
      (2L, 100L), (2L, 2 * wk),
      (3L, wk + 50L), (3L, 2 * wk + 60L))
    val ev = rows.zipWithIndex.map { case ((u, ms), i) => (u, ms, i.toLong) }
      .toDF("user_id", "ms", "event_id")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_id"), lit("view").as("event_type"), lit(0.0).as("value"))
    val out = Events.growthAccountingFrom(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) === ((2L, 0L, 0L, 0L)))       // u1, u2 new
    assert(out(1L) === ((1L, 1L, 0L, 1L)))       // u3 new, u1 retained, u2 churned
    assert(out(2L) === ((0L, 1L, 1L, 1L)))       // u3 retained, u2 resurrected, u1 churned
  }

  test("q276 on testdata: the growth identity active_w = new + retained + resurrected holds") {
    import org.apache.spark.sql.functions._
    val ev = Events.batchEvents(spark, dir)
    val out = Events.growthAccounting(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    val active = ev.select(col("user_id"),
        expr("unix_millis(ts) div 86400000 div 7").as("week")).distinct()
      .groupBy("week").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    active.foreach { case (w, n) =>
      val (nn, nr, ns, _) = out(w)
      assert(nn + nr + ns === n, s"week $w decomposition leaks users")
    }
  }

  test("q283 streaming PIT enrichment equals the batch q223 join exactly") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    val stream = canon(Events.streamingPitEnrich(spark, dir))
    val batch = canon(Events.pitStateJoin(spark, dir))
    assert(stream === batch)
    assert(stream.nonEmpty)
    // both the enriched and the 'none' (pre-first-state) facts flow through
    assert(stream.exists(_._4 != "none") && stream.exists(_._4 == "none"))
  }

  test("as-of join: inclusive match, tie-break, and unmatched sentinel") {
    import spark.implicits._
    val e = Seq(
      // user 1: view@10, purchase@10 (tie -> inclusive match), view@20, purchase@25
      (1L, 10L, 100L, "view"),
      (1L, 10L, 101L, "purchase"),
      (1L, 20L, 102L, "view"),
      (1L, 25L, 103L, "purchase"),
      // user 2: purchase@5 with no prior view -> sentinel
      (2L, 5L, 200L, "purchase"),
      (2L, 9L, 201L, "view")
    ).toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = Events.asofJoinOn(e, "purchase", "view").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(101L) === ((10L, 0L)))   // same-ms view matches (>= semantics)
    assert(got(103L) === ((20L, 5L)))   // most recent prior view
    assert(got(200L) === ((-1L, -1L)))  // no prior view -> sentinel
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

  test("q222 SCD2 intervals tile each user's timeline: no gaps, no overlaps, one current") {
    import org.apache.spark.sql.functions._
    val iv = Events.scd2Intervals(spark, dir)
    // exactly one open (is_current) interval per user
    val opens = iv.filter(col("is_current")).groupBy("user_id").count()
    assert(opens.filter(col("count") =!= 1L).count() === 0L)
    // consecutive intervals chain exactly: valid_to == next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_ms")
    val chained = iv.withColumn("next_from", lead(col("valid_from_ms"), 1).over(w))
    val broken = chained.filter(
      (col("next_from").isNotNull && (col("valid_to_ms") =!= col("next_from"))) ||
      (col("next_from").isNull && col("valid_to_ms").isNotNull))
    assert(broken.count() === 0L, "interval chain has a gap or overlap")
    // consecutive-duplicate collapse: adjacent intervals never share a state
    val dup = iv.withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_state").isNotNull && col("state") === col("next_state"))
    assert(dup.count() === 0L, "uncollapsed consecutive duplicate state")
  }

  test("q223 PIT join picks the state valid AT the fact time, never a future one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Events.pitStateJoin(spark, dir)
    val nPurchases = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(out.count() === nPurchases, "PIT join dropped or duplicated a fact")
    // no future leakage: the joined state began at or before the fact
    assert(out.filter(col("state_since_ms") > col("ts_ms")).count() === 0L)
    // facts before any dimension row carry the 'none' sentinel with null since
    val sentinelBad = out.filter(
      (col("state_at_purchase") === "none") =!= col("state_since_ms").isNull)
    assert(sentinelBad.count() === 0L)
    assert(out.filter(col("state_at_purchase") =!= "none").count() > 0L,
      "fixture produced no enriched facts — test vacuous")
  }

  test("q226 attribution: lookback bounds, endpoint selection, no-touch survival") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1: touches at t=10 (view), t=20 (click), purchase at t=30;
    //         a touch AFTER the purchase (t=40) and one OUTSIDE the
    //         lookback (t=30-8d) must both be ignored.
    // user 2: purchase with no touch at all.
    val day = 86400L
    val ev = Seq(
      (1L, ts(10), 1L, "view"), (2L, ts(20), 1L, "click"),
      (3L, ts(30), 1L, "purchase"), (4L, ts(40), 1L, "click"),
      (5L, ts(30 - 8 * day), 1L, "view"),
      (6L, ts(100), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.touchAttributionFrom(ev)
      .collect().map(r => r.getLong(0) -> r).toMap
    val p1 = out(3L)
    assert(p1.getLong(3) === 2L, "exactly the two in-window touches count")
    assert(p1.getLong(4) === 1L && p1.getString(5) === "view", "first touch")
    assert(p1.getLong(6) === 2L && p1.getString(7) === "click", "last touch")
    val p2 = out(6L)
    assert(p2.getLong(3) === 0L && p2.isNullAt(4) && p2.isNullAt(6),
      "no-touch purchase must survive with 0/null")
    assert(out.size === 2)
  }

  test("q227 date spine zero-fills planted missing days") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(d: Int) = new java.sql.Timestamp(d * 86400000L)
    val ev = Seq((1L, ts(1), 7L), (2L, ts(4), 8L), (3L, ts(4), 7L))
      .toDF("event_id", "ts", "user_id")
    val out = Events.dailySpineFrom(ev).orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 4, "spine must cover all 4 calendar days")
    assert(out(0)._2 === 1L && out(0)._3 === 1L)
    assert(out(1) === (("1970-01-03", 0L, 0L)))
    assert(out(2) === (("1970-01-04", 0L, 0L)))
    assert(out(3)._2 === 2L && out(3)._3 === 2L)
  }

  test("q228 checksum: partition-invariant; sum catches the duplicate pair xor cancels") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "aa", "en", 2L), (2L, "bb", "en", 2L), (3L, "cc", "en", 2L))
      .toDF("doc_id", "text", "lang", "n_chars").withColumn("source", lit("s0"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      graft.relational.Profile.tableChecksum(df, "source",
        Seq("doc_id", "text", "lang", "n_chars"))
        .head() match { case r => (r.getLong(1), r.getLong(2), r.getString(3)) }
    val a = sums(base)
    assert(a === sums(base.repartition(5)), "checksum depends on partitioning")
    // single-cell edit must change both reductions
    val edited = Seq((1L, "aa", "en", 2L), (2L, "bX", "en", 2L), (3L, "cc", "en", 2L))
      .toDF("doc_id", "text", "lang", "n_chars").withColumn("source", lit("s0"))
    val b = sums(edited)
    assert(a._2 !== b._2)
    assert(a._3 !== b._3)
    // a row duplicated TWICE more: xor of the pair cancels back to the
    // original, the decimal sum does not — that's why both ship
    val dup = base.unionAll(base.filter(col("doc_id") === 2L))
      .unionAll(base.filter(col("doc_id") === 2L))
    val c = sums(dup)
    assert(c._2 === a._2, "xor was expected to cancel the duplicated pair")
    assert(c._3 !== a._3, "sum must catch the even-multiplicity change")
    assert(c._1 === 5L)
  }

  test("q232 daily trend: zero-filled days enter the MA window; deltas cross gaps honestly") {
    import spark.implicits._
    def ts(d: Int) = new java.sql.Timestamp(d * 86400000L)
    // counts per day after zero-fill: [1, 0, 0, 2]
    val ev = Seq((1L, ts(1), 7L), (2L, ts(4), 8L), (3L, ts(4), 7L))
      .toDF("event_id", "ts", "user_id")
    val out = Events.dailyTrendFrom(ev).orderBy("day").collect()
    assert(out.length === 4)
    assert(out(0).isNullAt(2), "first day has no predecessor — delta must be null")
    val deltas = out.drop(1).map(_.getLong(2))
    assert(deltas.toSeq === Seq(-1L, 0L, 2L))
    val ma = out.map(_.getDouble(3))
    assert(ma(0) === 1.0 && ma(1) === 0.5)
    assert(math.abs(ma(2) - 1.0 / 3) < 1e-6 && ma(3) === 0.75,
      "MA must average over the zero-filled days, not skip them")
  }

  test("q233 k-anonymity: small quasi-identifier classes flagged, large ones pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 6 docs share (en, bucket 0) — safe at k=5; 2 docs sit in (de, 0) and
    // 1 in (fr, 3) — both risky
    val docs = ((1 to 6).map(i => (i.toLong, "en", 10L)) ++
      Seq((7L, "de", 20L), (8L, "de", 30L), (9L, "fr", 350L)))
      .toDF("doc_id", "lang", "n_chars")
    val out = graft.relational.Validate.kAnonymityAudit(docs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(("de", 0L) -> 2L, ("fr", 3L) -> 1L))
  }

  test("q234 streaming MG: bounded state, cross-batch survival of every true heavy") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val k = 4
    val input = MemoryStream[(String, Long)]
    val out = Events.streamingHeavyUsersCore(input.toDS(), k)
    val name = "graft_mg_test"
    val q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // user 7 becomes heavy only ACROSS batches (3+3 of 12 total > 12/4);
      // users 1-5 are one-off noise that churns the counters
      input.addData(("a", 7L), ("a", 7L), ("a", 7L), ("a", 1L), ("a", 2L), ("a", 3L))
      q.processAllAvailable()
      input.addData(("a", 7L), ("a", 7L), ("a", 7L), ("a", 4L), ("a", 5L), ("a", 1L))
      q.processAllAvailable()
      val rows = s.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val lastSeq = rows.map(_._2).max
      val finalCands = rows.filter(_._2 == lastSeq).map(_._3).toSet
      assert(finalCands.contains(7L),
        s"true heavy user lost by the sketch: $finalCands")
      // bounded-state contract: never more than k-1 counters per key
      rows.groupBy(_._2).foreach { case (seq, rs) =>
        assert(rs.length <= k - 1, s"batch $seq emitted ${rs.length} counters")
      }
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("q234 settled streaming heavy users equal the exact batch computation") {
    import org.apache.spark.sql.functions._
    val got = Events.streamingHeavyUsers(spark, dir, k = 128)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val c = ev.groupBy("event_type", "user_id").agg(count(lit(1)).as("n_occurrences"))
    val t = ev.groupBy("event_type").agg(count(lit(1)).as("n_type"))
    val exp = c.join(t, "event_type")
      .filter(col("n_occurrences") * 128 > col("n_type"))
      .select("event_type", "user_id", "n_occurrences")
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
    assert(got.count() > 0L, "no heavy users at k=128 — test vacuous")
  }

  test("q238 ingest gate: planted violations attributed per rule; batch parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (Option(1L), "view", 1.0, ts("2024-01-01 00:00:00")),      // clean
      (Option.empty[Long], "click", 1.0, ts("2024-01-01 00:00:00")), // null id
      (Option(3L), "weird", 1.0, ts("2024-01-01 00:00:00")),     // bad type
      (Option(4L), "view", -2.0, ts("2024-01-01 00:00:00")),     // negative value
      (Option(5L), "view", Double.NaN, ts("2024-01-01 00:00:00")), // NaN value
      (Option(6L), "view", 1.0, ts("1970-01-01 00:00:00")))      // out of range
      .toDF("event_id", "event_type", "value", "ts")
    val out = Events.ingestGateAgg(ev)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("event_id_not_null" -> 1L, "type_accepted" -> 1L,
      "value_finite_nonneg" -> 2L, "ts_in_range" -> 1L))
    // settled streaming totals equal the batch aggregation on the fixture
    val settled = Events.streamingIngestGate(spark, dir)
    val batch = Events.ingestGateAgg(
      graft.streaming.Events.batchEvents(spark, dir))
    assert(settled.exceptAll(batch).isEmpty && batch.exceptAll(settled).isEmpty)
  }

  test("q239 join estimate: per-key histograms are exact, coarse ones overestimate") {
    import spark.implicits._
    val fact = Seq(1L, 1L, 1L, 2L).toDF("fk")
    val dim = Seq(2L, 2L).toDF("dk")
    // width >= key space -> per-key histogram -> the estimate IS the join size
    val fine = graft.relational.Profile.joinCardinalityAudit(fact, "fk", dim, "dk", width = 64)
      .head()
    assert(fine.getLong(2) === 2L, "actual join size")
    assert(fine.getDouble(1) === 2.0 && fine.getDouble(3) === 0.0)
    // width 1 pools keys 1 and 2: na=4, da=2, nb=2, db=1 -> est 4*2/2 = 4
    val coarse = graft.relational.Profile.joinCardinalityAudit(fact, "fk", dim, "dk", width = 1)
      .head()
    assert(coarse.getDouble(1) === 4.0 && coarse.getLong(2) === 2L)
    assert(coarse.getDouble(3) === 1.0, "coarse uniformity assumption overestimates 2x")
  }

  test("q240 lift: hand-computed basket case") {
    import spark.implicits._
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "b"), (4L, "a"), (4L, "b"),
      (1L, "a")) // duplicate event collapses into the basket
      .toDF("user_id", "event_type")
    val out = Events.typeLiftMatrixFrom(ev).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) === (("a", "b", 2L)))
    assert(math.abs(r.getDouble(3) - 2.0 * 4 / 9) < 5e-7) // 6dp-rounded
  }

  test("q242 RFM: quartiles balanced, segment string consistent, purchases only") {
    import org.apache.spark.sql.functions._
    val out = Events.rfmSegments(spark, dir)
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "purchase").select("user_id").distinct().count()
    assert(out.count() === nUsers, "one row per purchasing user")
    // ntile(4): bucket sizes differ by at most 1
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = out.groupBy(c).count().collect().map(_.getLong(1))
      assert(sizes.length === 4 && sizes.max - sizes.min <= 1L, s"$c unbalanced")
    }
    val bad = out.filter(col("segment") =!= concat(lit("R"), col("r_score"),
      lit("F"), col("f_score"), lit("M"), col("m_score")))
    assert(bad.count() === 0L)
  }

  test("q248 leave-last-out: at most one test point per user, always the latest") {
    import org.apache.spark.sql.functions._
    val out = Events.leaveLastOutSplit(spark, dir)
    val perUser = out.filter(col("split") === "test").groupBy("user_id").count()
    assert(perUser.filter(col("count") > 1L).count() === 0L)
    assert(out.filter(col("split") === "test").count() > 0L)
    // PIT correctness: no train purchase of the same user is NEWER than
    // the test point
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unix_millis(col("ts").cast("timestamp"))
    }
    val ev = raw.filter(col("event_type") === "purchase")
      .select(col("event_id"), tsMs.as("ms"))
    val joined = out.join(ev, "event_id")
    val test = joined.filter(col("split") === "test")
      .select(col("user_id"), col("ms").as("t_ms"), col("event_id").as("t_id"))
    val leak = joined.filter(col("split") === "train")
      .join(test, "user_id")
      .filter(col("ms") > col("t_ms") ||
        (col("ms") === col("t_ms") && col("event_id") > col("t_id")))
    assert(leak.count() === 0L, "a train purchase postdates the test point")
    // single-purchase users contribute no test point
    val singles = joined.groupBy("user_id").count().filter(col("count") === 1L)
    assert(out.join(singles, "user_id").filter(col("split") === "test").count() === 0L)
  }

  test("q249 next-event dataset: context windows align with the per-user timeline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq((1L, ts(1), 7L, "view"), (2L, ts(2), 7L, "click"),
      (3L, ts(3), 7L, "purchase"), (4L, ts(4), 7L, "error"),
      (5L, ts(9), 8L, "view")) // user 8: no full context -> no examples
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.nextEventDatasetFrom(ev)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(got.toSet === Set(
      (3L, "view", "click", "purchase"),
      (4L, "click", "purchase", "error")))
  }

  test("q256 temporal split: cutoff reaches the fraction, no event leaks across it") {
    import org.apache.spark.sql.functions._
    val out = Events.temporalHoldoutSplit(spark, dir, frac = 0.8)
    val (train, test) = {
      val r = out.agg(sum("n_train"), sum("n_test")).head()
      (r.getLong(0), r.getLong(1))
    }
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(train + test === total, "split must conserve every event")
    assert(train >= (0.8 * total).toLong, "train must reach the cutoff fraction")
    // Minimality: the day before the cutoff day must NOT reach 80% —
    // recompute the day histogram independently and check both sides.
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val day = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => to_date(timestamp_micros(expr("ts div 1000")))
      case _ => to_date(col("ts"))
    }
    val hist = raw.select(day.as("d")).groupBy("d").count()
      .orderBy("d").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val cum = hist.scanLeft(("", 0L)) { case ((_, c), (d, n)) => (d, c + n) }.drop(1)
    val cutDay = cum.find(_._2 >= 0.8 * total).get._1
    val expectedTrain = cum.find(_._1 == cutDay).get._2
    assert(train === expectedTrain, "train count must equal cumulative count at cutoff day")
    val before = cum.takeWhile(_._1 < cutDay).lastOption.map(_._2).getOrElse(0L)
    assert(before < 0.8 * total, "cutoff day must be the EARLIEST day reaching the fraction")
  }

  test("q263 lead-lag: a planted one-day lead scores exactly 1.0 at lag 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // views per day [3,1,4,1,5]; purchases are EXACTLY yesterday's views
    // ([0,3,1,4,1]) — lag-1 pairing reproduces the series bit-for-bit, so
    // Pearson r at lag 1 must be exactly 1.0; lag 0 must not be.
    val x = Seq(3, 1, 4, 1, 5)
    val rows = (1 to 5).flatMap { d =>
      val views = Seq.fill(x(d - 1))(("view", d))
      val buys = if (d >= 2) Seq.fill(x(d - 2))(("purchase", d)) else Nil
      views ++ buys
    }
    val ev = rows.toDF("event_type", "d")
      .select(col("event_type"),
        to_timestamp(concat(lit("2026-01-0"), col("d"), lit(" 12:00:00"))).as("ts"))
    val got = graft.streaming.Events.leadLagCorrFrom(ev).orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got.map(_._2).toSeq === Seq(5L, 4L, 3L), "pair counts must shrink by one per lag")
    assert(got(1)._3 === 1.0, "lag-1 must recover the planted lead exactly")
    assert(got(0)._3 < 1.0)
  }

  test("q221 key skew: planted hot key, exact ratio, largest-key tiebreak") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 rows of key 7, one row each of keys 1..5 → n_rows=15, n_keys=6,
    // max=10, skew = 10*6/15 = 4.0
    val df = ((1L to 5L).map(k => k) ++ Seq.fill(10)(7L)).toDF("k1")
      .withColumn("k2", lit(1L))
    val got = graft.relational.Profile.keySkew(df, Seq("k1"))
      .head()
    assert(got.getLong(1) === 15L && got.getLong(2) === 6L)
    assert(got.getLong(3) === 10L && got.getLong(4) === 7L)
    assert(got.getDouble(5) === 4.0)
    // tie on counts → LARGER key is the deterministic winner
    val tied = Seq(3L, 3L, 9L, 9L).toDF("k1")
    val hot = graft.relational.Profile.keySkew(tied, Seq("k1"))
      .head().getLong(4)
    assert(hot === 9L)
  }
}
