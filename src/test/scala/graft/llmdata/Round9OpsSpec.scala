package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.relational.Queries
import graft.streaming.Events

/** Unit pins for the q123-q133 operators: hand-computed references on tiny
  * fixtures — minhash signature values against a JVM md5 reference, LSH
  * band/bucket recall on exact duplicates, df-pruning recall semantics,
  * salting/bucketing rewrite parity against the naive plan, OLS wiring,
  * entropy closed forms, grouping-set grains, window-bounded conversion,
  * row-selected quantiles, and debounce gap semantics.
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The operator's hash: 60-bit integer parse of the md5 hex prefix. */
  private def h60(seed: Long, shingle: String): Long =
    java.lang.Long.parseLong(md5hex(s"$seed|$shingle").substring(0, 15), 16)

  test("minhashMd5Signatures: min over the doc's distinct shingles, per seed") {
    val d = Seq((7L, "a b c d", "s", "en", 7L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.minhashMd5Signatures(d, numHashes = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    val shingles = Seq("a b c", "b c d")
    val want = (0L until 4L).map(s => s -> shingles.map(h60(s, _)).min).toMap
    assert(got === want)
  }

  test("minhashMd5Pairs: exact duplicates collide in every band; disjoint docs never pair") {
    val d = Seq(
      (0L, "p q r s t u v w", "s", "en", 1L),
      (1L, "p q r s t u v w", "s", "en", 1L),
      (2L, "m n o zz yy xx ww vv", "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.minhashMd5Pairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq === Seq((0L, 1L, 1.0)))
  }

  test("invertedCosinePairs: rare-shingle pair scores exact TF cosine; " +
    "pairs sharing only ubiquitous shingles are pruned (documented recall bound)") {
    // Docs 0/1 share the rare shingle "x y z" once each and are otherwise
    // disjoint; with 6 shingles per doc (all tf=1), cosine = 1/6.
    val common = "c1 c2 c3 c4"   // 2 shingles, in ALL docs -> df above maxDf=2
    val d = Seq(
      (0L, s"x y z $common a1 a2", "s", "en", 1L),
      (1L, s"x y z $common b1 b2", "s", "en", 1L),
      (2L, s"q r t $common d1 d2", "s", "en", 1L),
      (3L, s"q r t $common e1 e2", "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    // maxDf = 2: "x y z" (df 2) and "q r t" (df 2) generate candidates;
    // the common-tail shingles (df 4) are pruned and propose nothing.
    val got = Dedup.invertedCosinePairs(d, maxDf = 2, simThreshold = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // Each doc has 7 tokens -> 5 shingles, all tf=1, norm = sqrt(5).
    // Pair (0,1): shared shingles "x y z", plus the sliding overlap into the
    // common tail ("y z c1", "z c1 c2" differ: doc0 "z c1"... compute: doc0
    // shingles: [x y z, y z c1, z c1 c2, c1 c2 c3, c2 c3 c4, c3 c4 a1, c4 a1 a2]
    // -> 7 tokens? "x y z c1 c2 c3 c4 a1 a2" is 9 tokens -> 7 shingles.
    // Shared between doc0/doc1: "x y z", "y z c1", "z c1 c2", "c1 c2 c3",
    // "c2 c3 c4" = 5; norms sqrt(7) -> cosine = 5/7.
    val c57 = BigDecimal(5.0 / 7.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Set((0L, 1L, 5L, c57), (2L, 3L, 5L, c57)))
  }

  test("invertedCosinePairs: a single shared rare shingle is below the " +
    "AND-amplification bar and proposes no pair") {
    // Docs 0/1 share exactly ONE shingle ("x y z", df=2, rare); everything
    // else is doc-unique (df=1, excluded from the rare postings by df>=2).
    val d = Seq(
      (0L, "x y z a1 a2 a3", "s", "en", 1L),
      (1L, "x y z b1 b2 b3", "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    assert(Dedup.invertedCosinePairs(d, maxDf = 20, simThreshold = 0.0).isEmpty)
    // minSharedRare=1 restores the pair — the knob, not the plan, decides.
    assert(Dedup.invertedCosinePairs(d, maxDf = 20, simThreshold = 0.0,
      minSharedRare = 1).count() === 1L)
  }

  test("saltedSkewJoin: result identical to the unsalted plain join") {
    val dir = "/root/testdata/sf0.001"
    val got = Queries.saltedSkewJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
    val nat = spark.read.parquet(s"$dir/nation.parquet")
    val want = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy("n_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("rangeBucketJoin: equi-join-on-bucket rewrite equals the naive range join") {
    val dir = "/root/testdata/sf0.001"
    val got = Events.rangeBucketJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    val tiers = (0 until 10).map(i => (i.toLong, i * 50.0, (i + 1) * 50.0))
      .toDF("tier_id", "lo", "hi")
    val want = spark.read.parquet(s"$dir/events.parquet")
      .join(tiers, col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("tier_id", "lo", "hi")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .orderBy("tier_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === want.toSeq)
  }

  test("zipfSlope: OLS moments wired correctly (reference formula on the same points)") {
    val docs = Seq((0L, "a b a b a b a c", "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    // bigrams: [a b]x3, [b a]x2, [a c]x1, [c ...]: "a b a b a b a c" tokens
    // a,b,a,b,a,b,a,c -> bigrams: ab,ba,ab,ba,ab,ba,ac -> ab:3 ba:3 ac:1
    val counts = Seq(3L, 3L, 1L) // rank by (n desc, bigram asc): a b, b a, a c
    val xs = counts.indices.map(i => math.log(i + 1.0))
    val ys = counts.map(n => math.log(n.toDouble))
    val n = counts.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = TextAnalysis.zipfSlope(docs, topN = 100).collect()(0)
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - r6(slope)) < 1e-6)
    assert(math.abs(r.getDouble(2) - r6(intercept)) < 1e-6)
  }

  test("sourceEntropy: closed forms — uniform ln(k), skewed ln(T) - (3 ln 3)/4") {
    val docs = Seq(
      (0L, "a b c d", "uniform", "en", 1L),
      (1L, "a a a b", "skewed", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.sourceEntropy(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("uniform") === ((4L, r6(math.log(4.0)))))
    assert(got("skewed") === ((4L, r6(math.log(4.0) - 3.0 * math.log(3.0) / 4.0))))
  }

  test("corpusGroupingSets: exactly the three requested grains, labeled and id'd") {
    val docs = Seq(
      (0L, "t", "en", "web", 10L), (1L, "t", "en", "book", 20L),
      (2L, "t", "de", "web", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.corpusGroupingSets(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      ("en", "web", 0L, 1L, 10L), ("en", "book", 0L, 1L, 20L), ("de", "web", 0L, 1L, 30L),
      ("en", "ALL", 1L, 2L, 30L), ("de", "ALL", 1L, 1L, 30L),
      ("ALL", "ALL", 3L, 3L, 60L)))
  }

  test("timeboundConversionOn: converts only strictly-after within the window") {
    val e = Seq(
      (1L, "view", 100L), (1L, "purchase", 150L),          // converts, lag 50
      (2L, "view", 100L), (2L, "purchase", 2100L),         // outside window 1000
      (3L, "view", 100L), (3L, "purchase", 100L),          // same instant: NOT after
      (4L, "view", 100L), (4L, "purchase", 1100L),         // boundary: <= t0+window
      (5L, "purchase", 50L), (5L, "view", 100L)            // purchase before first view
    ).toDF("user_id", "event_type", "ms")
    val got = Events.timeboundConversionOn(e, "view", "purchase", 1000L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((100L, 1L, 50L)), 2L -> ((100L, 0L, -1L)), 3L -> ((100L, 0L, -1L)),
      4L -> ((100L, 1L, 1000L)), 5L -> ((100L, 0L, -1L))))
  }

  test("exactValueQuantilesOn: row-number selection, not interpolation") {
    val e = (1 to 10).map(i => ("a", i.toDouble, i.toLong)) ++
      Seq(("b", 5.0, 100L), ("b", 1.0, 101L), ("b", 9.0, 102L))
    val got = Events.exactValueQuantilesOn(e.toDF("event_type", "value", "event_id"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // a: n=10 -> median row 5 (value 5.0), p90 row 9 (value 9.0)
    // b: n=3 -> median row ceil(1.5)=2 (sorted 1,5,9 -> 5.0), p90 row ceil(2.7)=3 (9.0)
    assert(got === Map("a" -> ((10L, 5.0, 9.0)), "b" -> ((3L, 5.0, 9.0))))
  }

  test("denseRankTopOn: ties share a rank and do not consume the next; rank 3 survives a tie at 2") {
    val q = Seq(
      ("B1", 1L, 100.0), ("B1", 2L, 90.0), ("B1", 3L, 90.0), ("B1", 4L, 80.0),
      ("B1", 5L, 70.0), // rank 4 -> cut
      ("B2", 6L, 50.0)
    ).toDF("p_brand", "p_partkey", "qty")
    val got = Queries.denseRankTopOn(q, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("B1", 1L, 1L), ("B1", 2L, 2L), ("B1", 2L, 3L), ("B1", 3L, 4L),
      ("B2", 1L, 6L)))
  }

  test("runningRevenue: cum_revenue is the per-nation prefix sum of monthly revenue") {
    val rows = Queries.runningRevenue(spark, "/root/testdata/sf0.001")
      .orderBy("n_name", "ship_month").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ms) =>
      var acc = 0.0
      ms.sortBy(_._2).foreach { case (_, _, rev, cum) =>
        acc += rev
        assert(math.abs(cum - acc) < 1e-6)
      }
    }
  }

  test("tokenStatsLong: one row per (doc, metric) with the wide-form values") {
    val d = Seq((9L, "ab cd e", "s", "en", 7L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.tokenStatsLong(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((9L, "n_tokens", 3L), (9L, "n_chars_obs", 7L),
      (9L, "n_alpha_chars", 5L)))
  }

  test("streamingSlidingCounts settles to the batch sliding-window result") {
    val dir = "/root/testdata/sf0.001"
    val batch = Events.slidingCounts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val streamed = Events.streamingSlidingCounts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("sessionStats: the per-user rollup of the sessionize frame") {
    val dir = "/root/testdata/sf0.001"
    val sessions = Events.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = sessions.groupBy(_._1).map { case (u, ss) =>
      u -> ((ss.length.toLong, ss.map(_._4).sum, ss.map(_._3).max, ss.map(_._2).min))
    }
    val got = Events.sessionStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === want)
  }

  test("cumulativeUsers: first-touch rewrite equals the expanding-distinct definition") {
    val dir = "/root/testdata/sf0.001"
    val got = Events.cumulativeUsers(spark, dir).orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Reference: expanding distinct-user count per day, from the raw table.
    val dayUsers = graft.streaming.Events.convertTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = dayUsers.map(_._1).distinct.sorted
    val seen = scala.collection.mutable.Set[Long]()
    val expect = days.flatMap { d =>
      val before = seen.size
      dayUsers.filter(_._1 == d).foreach(u => seen += u._2)
      val fresh = seen.size - before
      if (fresh > 0) Some((d, fresh.toLong, seen.size.toLong)) else None
    }
    assert(got.toSeq === expect.toSeq)
  }

  test("splitLeakage: duplicate docs landing in different hash splits are counted as a leak") {
    // doc_ids chosen so the md5(':split') assignment differs: 0 -> test,
    // 3 -> train (stable — same hash the operator and q79 use).
    val d = Seq(
      (0L, "p q r s t u v w", "s", "en", 8L),
      (3L, "p q r s t u v w", "s", "en", 8L),
      (7L, "completely different words here now ok fine yes", "s", "en", 8L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.splitLeakage(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("test", "train", 1L)))
  }

  test("keepLongestRepresentatives: the longest member represents the component") {
    val d = Seq(
      (0L, "p q r s t u v w", "s", "en", 15L),
      (1L, "p q r s t u v w x", "s", "en", 17L),   // same component, longer
      (2L, "m n o zz yy xx ww vv", "s", "en", 20L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.keepLongestRepresentatives(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 1L, 17L), (2L, 2L, 20L)))
  }

  test("streamingDebounceCore: gap state carries across micro-batches; " +
    "in-batch disorder is sorted; stragglers below the high-water mark drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val input = MemoryStream[Events.RawEvent]
    val name = "graft_stream_debounce_test"
    val q = Events.streamingDebounceCore(input.toDS(), gapMs = 600L).toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1, deliberately out of order within the batch: sorted scan
      // keeps e1@0, drops e2@500 (gap 500), drops e3@1000 (gap 500 from
      // the RAW predecessor e2 — lag semantics).
      input.addData(Events.RawEvent(3L, 10L, "click", 1000L),
        Events.RawEvent(1L, 10L, "click", 0L),
        Events.RawEvent(2L, 10L, "click", 500L))
      q.processAllAvailable()
      // batch 2: e4@1500 is 500 after e3 (state carried the 1000 mark) ->
      // dropped; e5@2200 is 700 after e4 -> kept; e6@100 is a straggler
      // below the high-water mark -> dropped, and does NOT rewrite state.
      input.addData(Events.RawEvent(4L, 10L, "click", 1500L),
        Events.RawEvent(5L, 10L, "click", 2200L),
        Events.RawEvent(6L, 10L, "click", 100L))
      q.processAllAvailable()
      val kept = s.table(name).collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 5L))
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("streamingDebounceCore: equal-ms events split across micro-batches keep " +
    "the batch oracle's event_id tiebreak") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val input = MemoryStream[Events.RawEvent]
    val name = "graft_stream_debounce_tie_test"
    val q = Events.streamingDebounceCore(input.toDS(), gapMs = 600L).toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: e1@1000 kept (first), state = (1000, 1)
      input.addData(Events.RawEvent(1L, 10L, "click", 1000L))
      q.processAllAvailable()
      // batch 2: e2@1000 — same ms, HIGHER id: in oracle order, processed
      // and dropped by the zero gap (exactly what the batch side does);
      // state advances to (1000, 2).
      input.addData(Events.RawEvent(2L, 10L, "click", 1000L))
      q.processAllAvailable()
      // batch 3: e0@1000 — same ms, LOWER id than the high-water mark:
      // the oracle would have processed it FIRST; emitting now would
      // contradict history, so it is a late straggler — dropped, state
      // not regressed. Then e3@1700 is 700 after the 1000 mark -> kept
      // (state really did stay at ms=1000).
      input.addData(Events.RawEvent(0L, 10L, "click", 1000L),
        Events.RawEvent(3L, 10L, "click", 1700L))
      q.processAllAvailable()
      val kept = s.table(name).collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L))
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("streamingDebounce settles to the batch debounce result") {
    val dir = "/root/testdata/sf0.001"
    val batch = Events.debounceEvents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val streamed = Events.streamingDebounce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(streamed === batch)
  }

  test("dedupRateBySource: absorbed sources stay visible with zero retention") {
    // web's doc 1 duplicates wiki's doc 0 -> component rep is doc 0 (wiki);
    // web keeps nothing, wiki keeps 1 of 1, book keeps its singleton.
    val d = Seq(
      (0L, "p q r s t u v w", "wiki", "en", 8L),
      (1L, "p q r s t u v w", "web", "en", 8L),
      (2L, "m n o zz yy xx ww vv", "book", "en", 8L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.dedupRateBySource(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(("wiki", 1L, 1L, 1.0), ("web", 1L, 0L, 0.0), ("book", 1L, 1L, 1.0)))
  }

  test("tokenBudgetCurve: best-first ranking with an exact cumulative token count") {
    val d = Seq(
      (0L, "a a a a", "s", "en", 1L),   // all common tokens -> highest avg logprob
      (1L, "a a b b", "s", "en", 1L),
      (2L, "c d e f", "s", "en", 1L)    // all rare tokens -> lowest
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.tokenBudgetCurve(d).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
    assert(got.map(_._4).toSeq === Seq(4L, 8L, 12L))
  }

  test("docNovelty: a duplicate of an earlier doc scores zero; the first doc scores one") {
    val d = Seq(
      (0L, "a b c d", "s", "en", 1L),
      (1L, "a b c d", "s", "en", 1L),     // exact dup of 0 -> novelty 0
      (2L, "a b x y", "s", "en", 1L)      // shares "a b" only -> 2 of 3 novel
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.docNovelty(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set((0L, 3L, 3L, 1.0), (1L, 3L, 0L, 0.0),
      (2L, 3L, 2L, BigDecimal(2.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("typeTokenRatio: distinct types over total tokens per source") {
    val d = Seq(
      (0L, "a a a b", "low", "en", 1L),
      (1L, "a b c d", "high", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.typeTokenRatio(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(("low", 4L, 2L, 0.5), ("high", 4L, 4L, 1.0)))
  }

  test("debounceOn: drops inside-gap repeats per (user, type), lag-based") {
    val e = Seq(
      (1L, 10L, "click", 0L), (2L, 10L, "click", 500L), (3L, 10L, "click", 1000L),
      (4L, 10L, "view", 100L),   // different type: own stream
      (5L, 20L, "click", 400L)   // different user: own stream
    ).toDF("event_id", "user_id", "event_type", "ms")
    // gap 600: e2 is 500 after e1 -> dropped; e3 is 500 after e2 (the raw
    // predecessor, lag semantics) -> dropped too even though it is 1000
    // after the last KEPT event.
    val kept = Events.debounceOn(e, 600L).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L))
  }
}
