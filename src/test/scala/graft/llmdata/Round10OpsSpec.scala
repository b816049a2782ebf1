package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.window.WindowExec
import graft.TestSpark
import graft.streaming.Events

/** Unit pins for the round-10 operator work: the tokenBudgetCurve two-phase
  * prefix sum (parity against the sequential window for several bucket
  * scales, and the plan-shape guarantee that no document-scale window runs
  * on a single partition — the q84 packSequences pattern applied to a
  * corpus-wide total order).
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Scores collide (docs 1/2 tie on avg_logprob -> doc_id breaks), spread
  // across magnitudes so several buckets are occupied at scale 64 and a
  // single bucket swallows everything at a tiny scale.
  private def docs = Seq(
    (0L, "a a a a", "s", "en", 1L),
    (1L, "a a b b", "s", "en", 1L),
    (2L, "b b a a", "s", "en", 1L),    // same multiset as doc 1 -> exact tie
    (3L, "c d e f", "s", "en", 1L),
    (4L, "a b c d e f g h", "s", "en", 1L),
    (5L, "a a a b c c", "s", "en", 1L)
  ).toDF("doc_id", "text", "source", "lang", "n_chars")

  test("tokenBudgetCurve: two-phase prefix sum matches the sequential window for any bucketScale") {
    val exp = TextAnalysis.tokenBudgetCurveWindow(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toSet
    // scales exercising many tiny buckets, the default, and the
    // everything-in-one-bucket degenerate case
    for (scale <- Seq(1024.0, 64.0, 1e-6)) {
      val got = TextAnalysis.tokenBudgetCurve(docs, bucketScale = scale).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toSet
      assert(got === exp, s"bucketScale=$scale diverged from the sequential window")
    }
  }

  test("tokenBudgetCurve: no single-partition window anywhere in the plan") {
    // sparkPlan, not executedPlan: under AQE the executed plan is an opaque
    // AdaptiveSparkPlanExec wrapper until run, so collect() sees no WindowExec.
    val plan = TextAnalysis.tokenBudgetCurve(docs).queryExecution.sparkPlan
    val unpartitioned = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.isEmpty,
      s"corpus-wide single-partition window frame(s): ${unpartitioned.mkString("\n")}")
    // and the baseline really does have one — the property being tested is
    // the rewrite, not an accident of the fixture
    val basePlan = TextAnalysis.tokenBudgetCurveWindow(docs).queryExecution.sparkPlan
    assert(basePlan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.nonEmpty)
  }

  test("sourceEntropyByBatch / typeTokenRatioByBatch: per-batch grain splits a source's stats") {
    // one source, two batches (batchSize=2): batch 0 is pure repetition
    // (entropy 0, TTR 1/8), batch 1 is all-distinct (max entropy, TTR 1).
    val d = Seq(
      (0L, "x x x x", "s", "en", 1L),
      (1L, "x x x x", "s", "en", 1L),
      (2L, "a b c d", "s", "en", 1L),
      (3L, "e f g h", "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val ent = TextAnalysis.sourceEntropyByBatch(d, batchSize = 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ent === Set((0L, "s", 8L, 0.0), (1L, "s", 8L,
      BigDecimal(math.log(8.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    val ttr = TextAnalysis.typeTokenRatioByBatch(d, batchSize = 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(ttr === Set((0L, "s", 8L, 1L, 0.125), (1L, "s", 8L, 8L, 1.0)))
  }

  test("tokenBudgetCurve: ranks are a gapless 1..n permutation with an exact running sum") {
    val rows = TextAnalysis.tokenBudgetCurve(docs, bucketScale = 1024.0)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq)
    var cum = 0L
    rows.foreach { case (_, n, c) => cum += n; assert(c === cum) }
  }

  test("componentLabelsOn / minhashMd5PairsOn: memoized per (dir, threshold)") {
    val dir = graft.TestSpark.sfDir
    val a = Dedup.componentLabelsOn(spark, dir)
    // same key -> the SAME DataFrame instance (computeIfAbsent), so no
    // consumer can re-run the label propagation
    assert(a eq Dedup.componentLabelsOn(spark, dir))
    // different threshold -> a different cache slot
    assert(!(a eq Dedup.componentLabelsOn(spark, dir, simThreshold = 0.7)))
    val p = Dedup.minhashMd5PairsOn(spark, dir)
    assert(p eq Dedup.minhashMd5PairsOn(spark, dir))
  }

  test("componentSizeHistogramFrom: sizes count docs, histogram counts components") {
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "component")
    val got = Dedup.componentSizeHistogramFrom(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 1L), (2L, 1L), (1L, 1L)))
  }

  test("historyDupRateFrom: only strictly-earlier-batch pairs count, distinct per doc, zero-filled") {
    val docsDf = (0L to 5L).map(i => (i, s"t$i", "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    // batchSize=2 -> batches {0,1}, {2,3}, {4,5}. doc 3 dups history twice
    // (still one doc), doc 2 dups within its own batch only (not counted),
    // doc 5 dups history once.
    val pairs = Seq((0L, 3L), (1L, 3L), (2L, 3L), (4L, 5L), (1L, 5L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.historyDupRateFrom(pairs, docsDf, batchSize = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set((0L, 2L, 0L, 0.0), (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  test("pmiBigrams: hand-computed PMI on a fixed collocation; glue pairs rank below") {
    // "x y" always co-occurs (8 times); every other adjacency is diffuse.
    val d = (0L to 7L).map(i => (i, s"x y f$i g${i % 2}", "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.pmiBigrams(d, minCount = 2L, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // totals: 32 unigrams (x:8, y:8, g0:4, g1:4, f_i:1 each), 24 bigrams
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      BigDecimal(math.log((cab / 24.0) / ((ca / 32.0) * (cb / 32.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head === (("x y", 8L, pmi(8, 8, 8))))
    // "y f..." pairs are below minCount individually; "g0"/"g1" never lead
    // a bigram with count >= 2 except none — only "x y" survives
    assert(got.length === 1)
  }

  test("lengthDriftKs: a shifted batch scores the exact hand-computed KS distance") {
    // batchSize=4 -> batch 0 lengths {10,10,20,20}, batch 1 {20,20,30,30}
    val d = Seq((0L, 10L), (1L, 10L), (2L, 20L), (3L, 20L),
      (4L, 20L), (5L, 20L), (6L, 30L), (7L, 30L))
      .map { case (i, n) => (i, "t", "s", "en", n) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.lengthDriftKs(d, batchSize = 4L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // ECDFs at x=10: F0=.5 F1=0 (d=.5); x=20: F0=1 F1=.5 (d=.5); x=30: 1,1
    assert(got === Map(0L -> 0.5, 1L -> 0.5))
  }

  test("containmentPairs: a truncation scores 1.0 where its Jaccard sits far below the near-dup gate") {
    // doc 1 = the first third of doc 0 -> containment 1.0, jaccard ~1/3.
    // doc 2 unrelated. Shingles must be rare (df<=20) and >=2 shared.
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val truncated = (1 to 6).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, base, "s", "en", 1L),
      (1L, truncated, "s", "en", 1L),
      (2L, "z1 z2 z3 z4 z5 z6", "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.containmentPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    // doc0 has 10 shingles, doc1 has 4, all 4 shared
    assert(got.toSeq === Seq((0L, 1L, 4L, 10L, 4L, 1.0)))
    // and the symmetric near-dup gate would have missed it
    val jac = Dedup.minhashNearDup(d, simThreshold = 0.5).collect()
    assert(jac.isEmpty)
  }

  test("batchCentroidDrift: identical batches score 1.0; an orthogonal batch scores 0.x") {
    val mk = (id: Long, v: Seq[Float]) => (id, v.toArray, 0)
    // batchSize=2: batch 0 = two copies of e1, batch 1 = two copies of e2 (orthogonal)
    val emb = Seq(
      mk(0L, Seq(1f, 0f)), mk(1L, Seq(1f, 0f)),
      mk(2L, Seq(0f, 1f)), mk(3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.batchCentroidDrift(emb, batchSize = 2L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // corpus centroid = (.5,.5); cos(batch0, corpus) = .5/ (1 * sqrt(.5)) = 0.707107
    assert(got(0L) === 0.707107)
    assert(got(1L) === 0.707107)
  }

  test("robustLengthOutliers: one extreme doc flagged; median/MAD unmoved by it") {
    // lengths 100..100+8 plus one 10000-char monster: median 104.5? n=10 ->
    // median = (104+105)/2 = 104.5... use 9 regulars + 1 monster: n=10,
    // sorted lengths 100..108, 10000 -> median = (104+105)/2 = 104.5,
    // adevs = {4.5,3.5,...,0.5,0.5,...,9895.5} -> MAD = 2.5+... compute:
    // adevs sorted: .5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,9895.5 -> MAD=(2.5+2.5)/2=2.5
    // gate = 2*1.4826*2.5 = 7.413 -> only the monster exceeds it.
    val d = ((0 until 9).map(i => (i.toLong, "t", "s", "en", 100L + i)) :+
      (9L, "t", "s", "en", 10000L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Curation.robustLengthOutliers(d).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq(("s", 104.5, 2.5, 1L)))
  }

  test("tfidfSearch: rarer matched term outweighs a common one; non-matching docs absent") {
    val d = Seq(
      (0L, "spark spark filler", "s", "en", 1L),   // tf(spark)=2
      (1L, "hash filler filler", "s", "en", 1L),   // tf(hash)=1, hash rarer
      (2L, "spark other words", "s", "en", 1L),
      (3L, "nothing relevant here", "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.tfidfSearch(d, terms = Seq("spark", "hash"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def w(df: Long) = math.log(4.0 / df)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc0: 2*ln(4/2)=1.386294; doc1: 1*ln(4/1)=1.386294 -> tie, doc_id breaks
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got(0)._3 === r6(2 * w(2)) && got(1)._3 === r6(w(1)) && got(2)._3 === r6(w(2)))
  }

  test("rebalanceMixture: one IPF sweep hits the lang marginal exactly; weights invert the skew") {
    // 2 sources x 2 langs, heavily skewed: src0 is 6 docs (4 en / 2 de),
    // src1 is 2 docs (1 en / 1 de). Targets: 4 per source, 4 per lang.
    val d = (
      (0 until 4).map(i => (i.toLong, "t", "src0", "en", 1L)) ++
      (4 until 6).map(i => (i.toLong, "t", "src0", "de", 1L)) ++
      Seq((6L, "t", "src1", "en", 1L), (7L, "t", "src1", "de", 1L))
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Curation.rebalanceMixture(d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // row fit: src0 scaled by 4/6 -> (en 2.666667, de 1.333333); src1 by
    // 4/2 -> (en 2, de 2). col sums: en 4.666667, de 3.333333. col fit:
    // en * 4/4.666667, de * 4/3.333333 -> fitted sums per lang == 4.
    val fitted = got.map { case (k, (_, f, _)) => k -> f }
    assert(math.abs(fitted(("src0", "en")) + fitted(("src1", "en")) - 4.0) < 1e-9)
    assert(math.abs(fitted(("src0", "de")) + fitted(("src1", "de")) - 4.0) < 1e-9)
    // the over-represented (src0, en) cell is down-weighted, the rest up
    assert(got(("src0", "en"))._3 < 1.0)
    assert(got(("src1", "de"))._3 > 1.0)
  }

  test("centroidConfusion: separable labels confuse nothing; a mislabeled vector lands off-diagonal") {
    val mk = (id: Long, v: Seq[Float], l: Int) => (id, v.toArray, l)
    val emb = Seq(
      mk(0L, Seq(1f, 0f), 0), mk(1L, Seq(0.9f, 0.1f), 0),
      mk(2L, Seq(0f, 1f), 1), mk(3L, Seq(0.1f, 0.9f), 1),
      mk(4L, Seq(0.95f, 0.05f), 1)   // label-1 vector sitting in label-0 space
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidConfusion(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L, 2L), (1L, 1L, 2L), (1L, 0L, 1L)))
  }

  test("lengthDeciles: within-source ranking; min lands in decile 0, max folded into 9") {
    val d = (1L to 11L).map(i => (i, s"t$i", "s", "en", i * 10L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Curation.lengthDeciles(d).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    // n=11 -> pr = (rank-1)/10 -> decile = rank-1 capped at 9
    assert(got === (1L to 11L).map(i => i -> math.min(9L, i - 1)).toMap)
  }

  test("weightedSample: selects the k largest ln(u)/w keys, JVM-recomputed; zero weights excluded") {
    val d = (0L to 19L).map(i => (i, s"t$i", "s", "en", if (i == 13L) 0L else (i + 1) * 7L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val key = (id: Long, w: Long) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:wsamp".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.substring(0, 15), 16) + 1.0) / math.pow(2, 60)
      BigDecimal(math.log(u) / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = (0L to 19L).filter(_ != 13L).map(i => (i, key(i, (i + 1) * 7L)))
      .sortBy { case (id, k) => (-k, id) }.take(5).toSet
    val got = Curation.weightedSample(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(4))).toSet
    assert(got === want)
    // zero-weight doc is out even when k exceeds the corpus
    val all = Curation.weightedSample(d, k = 100).collect().map(_.getLong(0)).toSet
    assert(all === (0L to 19L).toSet - 13L)
  }

  test("weightedSample: selection is TakeOrderedAndProject, not a global sort") {
    // repartition keeps Catalyst from collapsing the query into a
    // LocalTableScan, and k < fixture rows keeps EliminateLimits from
    // dropping the limit via the local relation's known maxRows — a
    // parquet-backed corpus (unknown maxRows) plans like this form
    val d = (0L to 9L).map(i => (i, s"t$i", "s", "en", i + 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars").repartition(4)
    val plan = Curation.weightedSample(d, k = 5).queryExecution.sparkPlan
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("streamingHistoryNearDup: finds history x incoming pairs only, one row per pair") {
    // batchSize=4 -> docs 0..3 are history, 4..7 the live batch.
    // Planted: 4 copies 0 (the one expected pair — an exact dup collides
    // in EVERY band, so this also pins the multi-band candidate dedup);
    // 1 copies 2 (history-history: excluded); 5 copies 6
    // (incoming-incoming: excluded); 3 and 7 share nothing with anyone.
    val texts = Map(
      0L -> "a b c d e f g h", 1L -> "p q r s t u v w", 2L -> "p q r s t u v w",
      3L -> "k l m n o aa bb cc", 4L -> "a b c d e f g h",
      5L -> "dd ee ff gg hh ii", 6L -> "dd ee ff gg hh ii", 7L -> "zz yy xx ww vv uu")
    val dir = graft.io.TempDirs.scratch("graft-shnd-fixture").toString
    texts.toSeq.map { case (id, t) => (id, t, "s", "en", t.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.streamingHistoryNearDup(spark, dir, batchSize = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet === Set((0L, 4L, 6L, 1.0)))
    assert(got.length === 1, s"multi-band candidate not deduped: ${got.mkString(",")}")
    // and the settled stream equals the batch twin restricted to the
    // (history, final-batch) slice it certifies against
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val twin = Dedup.minhashMd5Pairs(all).filter("doc_a div 4 < 1 and doc_b div 4 = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.toSet === twin)
    // the history-index driver cache is CAPPED (round-19 verdict #5):
    // past the cap it refuses BEFORE collecting, pointing at the
    // maintained-table contract — and the refusal is checked
    // distributed, so nothing lands on the driver first. A fresh
    // batchSize forces a rebuild (the cache key carries the caps too).
    val e = intercept[IllegalArgumentException] {
      Dedup.streamingHistoryNearDup(spark, dir, batchSize = 2L,
        historyRowCap = 1L)
    }
    assert(e.getMessage.contains("maintained") ||
      e.getMessage.contains("pre-partitioned"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.streamingHistoryNearDup(spark, dir, batchSize = 2L,
        historyShingleCap = 1L)
    }
    assert(e2.getMessage.contains("band_key"), e2.getMessage)
  }

  test("weightedStratified: per-source A-ES top-n, JVM-recomputed; no Window in the plan") {
    val d = (0L to 39L).map(i => (i, s"t$i", s"src${i % 3}", "en", (i % 7) * 11L + 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val key = (id: Long, w: Long) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:wstrat".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.substring(0, 15), 16) + 1.0) / math.pow(2, 60)
      math.log(u) / w
    }
    val want = (0L to 39L).map(i => (s"src${i % 3}", i, (i % 7) * 11L + 1L))
      .groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        rows.map { case (_, id, w) => (id, w, key(id, w)) }
          .sortBy { case (id, _, k) => (-k, id) }.take(4).zipWithIndex
          .map { case ((id, w, k), pos) =>
            (src, (pos + 1).toLong, id, w,
              BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
      }.toSet
    val got = Curation.weightedStratified(d, n = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got === want)
    // the selection is the bounded aggregator, not a per-group Window funnel
    val plan = Curation.weightedStratified(d, n = 4).queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"expected no WindowExec in:\n$plan")
  }

  test("dupShingleRatio: cross-document shared shingles only; unique docs score 0") {
    val d = Seq(
      (0L, "a b c d e"),         // shares "a b c"/"b c d"/"c d e" with doc 1
      (1L, "a b c d e"),         // exact dup of 0 -> ratio 1.0 both
      (2L, "a b c x y"),         // shares only "a b c" -> 1/3
      (3L, "p q r s t"),         // unique -> 0.0
      (4L, "u v")                // too short: excluded
    ).map { case (id, t) => (id, t, "s", "en", t.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.dupShingleRatio(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (0L, 3L, 3L, 1.0), (1L, 3L, 3L, 1.0),
      (2L, 3L, 1L, 0.333333), (3L, 3L, 0L, 0.0)))
  }

  test("importanceWeights: target-looking docs score above off-target; smoothing handles absent terms") {
    // target lang 'en' uses vocabulary {a,b}; 'de' uses {x,y}; doc 4 mixes.
    val d = Seq(
      (0L, "a b a b", "en"), (1L, "b a a a", "en"),
      (2L, "x y x y", "de"), (3L, "y x y y", "de"),
      (4L, "a b x y", "de")
    ).map { case (id, t, l) => (id, t, "s", l, t.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Curation.importanceWeights(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.map(_._1) === List(0L, 1L, 2L, 3L, 4L))
    assert(got.forall(_._2 === 4L))
    val imp = got.map(_._3)
    // en docs positive, pure-de docs negative, the mixed doc in between
    assert(imp(0) > 0 && imp(1) > 0 && imp(2) < 0 && imp(3) < 0)
    assert(imp(4) > imp(2) && imp(4) < imp(0))
    // JVM recompute of doc 0: terms a(x2), b(x2); raw counts a=6,b=4,x=4,y=6
    // (20 tokens, V=4); target counts a=5,b=3 over 8 tokens.
    val lr = (nt: Long, nr: Long) =>
      BigDecimal(math.log((nt + 1.0) / (8 + 4.0)) - math.log((nr + 1.0) / (20 + 4.0)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    // decimal-exact sum, THEN cast to double and divide (the engine's order)
    val want0 = BigDecimal((lr(5, 6) * 2 + lr(3, 4) * 2).toDouble / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(imp(0) === want0)
  }

  test("bm25Search: saturation + length normalization, JVM-recomputed") {
    val d = Seq(
      (0L, "spark spark spark spark x"),  // tf=4, dl=5
      (1L, "spark y"),                    // tf=1, dl=2
      (2L, "z z z z z z z z"),            // no match, dl=8
      (3L, "shuffle spark a b")           // two matched terms, dl=4
    ).map { case (id, t) => (id, t, "s", "en", t.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    // N=4, avgdl=19/4; df(spark)=3, df(shuffle)=1
    val avgdl = 19.0 / 4.0
    def termScore(tf: Long, dfv: Long, dl: Long) = BigDecimal(
      math.log(1.0 + (4.0 - dfv.toDouble + 0.5) / (dfv.toDouble + 0.5)) *
        (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
    ).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def score(ts: BigDecimal*) = BigDecimal(ts.sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(
      0L -> (1L, score(termScore(4, 3, 5))),
      1L -> (1L, score(termScore(1, 3, 2))),
      3L -> (2L, score(termScore(1, 3, 4), termScore(1, 1, 4))))
    val got = TextAnalysis.bm25Search(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === want)
    // length normalization: same tf, shorter doc scores higher
    assert(got(1L)._2 < got(3L)._2, "two matched terms must beat one at similar dl")
  }

  test("lloydStep: deterministic seeds, rounded-cosine assignment with c_id tiebreak, exact means") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0L), (1L, Array(0.0f, 1.0f), 0L),
      (2L, Array(0.8f, 0.2f), 0L), (3L, Array(0.1f, 0.9f), 0L),
      (4L, Array(1.0f, 1.0f), 0L)  // exact cosine tie -> lower c_id (0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.lloydStep(e, kClusters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    def m(xs: Double*) = BigDecimal(xs.sum / xs.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val f = (x: Float) => x.toDouble
    assert(got === Seq(
      (0L, 1L, m(1.0, f(0.8f), 1.0), 3L), (0L, 2L, m(0.0, f(0.2f), 1.0), 3L),
      (1L, 1L, m(0.0, f(0.1f)), 2L), (1L, 2L, m(1.0, f(0.9f)), 2L)))
  }

  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dp = ad.zip(bd).map { case (x, y) => x * y }.sum
    BigDecimal(dp / (math.sqrt(ad.map(x => x * x).sum) *
      math.sqrt(bd.map(x => x * x).sum)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("semanticDedup: cluster-bounded pairs, keep-lowest-id drop rule, JVM-recomputed") {
    val vecs = Map(
      0L -> Array(1.0f, 0.0f), 1L -> Array(0.0f, 1.0f),
      2L -> Array(0.9f, 0.1f), 3L -> Array(0.1f, 0.9f),
      4L -> Array(0.95f, 0.05f),
      5L -> Array(-1.0f, 0.1f)) // co-clusters with nothing similar -> kept
    val e = vecs.toSeq.sortBy(_._1).map { case (id, v) => (id, v, 0L) }
      .toDF("vec_id", "embedding", "label")
    val seeds = Seq(0L, 1L)
    val assign = vecs.keys.map { id =>
      id -> seeds.map(c => (c, cos6(vecs(id), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.head._1
    }.toMap
    val want = (for {
      a <- vecs.keys.toSeq; b <- vecs.keys.toSeq
      if a < b && assign(a) == assign(b)
      c = cos6(vecs(a), vecs(b)) if c >= 0.9
    } yield (assign(b), b, a, c))
      .groupBy { case (_, b, _, _) => b }
      .map { case (b, rows) =>
        (rows.head._1, b, rows.map(_._3).min, rows.map(_._4).max) }.toSet
    val got = Similarity.semanticDedup(e, kClusters = 2, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want)
    // the fixture actually exercises both the drop and the keep path
    assert(want.map(_._2) === Set(2L, 3L, 4L))
  }

  test("perplexityBuckets: per-lang terciles by LM score, order-independent bucket stats") {
    val toks = Map(
      0L -> Seq("a", "a", "a", "a"), 1L -> Seq("a", "a", "b", "b"),
      2L -> Seq("b", "b", "a", "a"), 3L -> Seq("c", "d", "e", "f"),
      4L -> Seq("a", "b", "c", "d", "e", "f", "g", "h"),
      5L -> Seq("a", "a", "a", "b", "c", "c"))
    val wc = toks.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val total = wc.values.sum
    def lp(id: Long): Double = {
      val s = toks(id).groupBy(identity).map { case (t, tf) =>
        BigDecimal(math.log(wc(t).toDouble / total))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP) * tf.size
      }.sum
      BigDecimal(s.toDouble / toks(id).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // ntile(3) over 6 docs ordered (lp desc, doc_id) -> buckets of 2
    val ordered = toks.keys.toSeq.map(id => (id, lp(id))).sortBy { case (id, l) => (-l, id) }
    val buckets = Seq("head", "head", "middle", "middle", "tail", "tail")
    val want = ordered.zip(buckets).groupBy(_._2).map { case (bk, rows) =>
      val lps = rows.map(_._1._2)
      val ids = rows.map(_._1._1)
      ("en", bk, rows.size.toLong, ids.map(i => toks(i).size.toLong).sum,
        lps.min, lps.max)
    }.toSet
    val got = TextAnalysis.perplexityBuckets(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got === want)
  }

  test("streamingQuotaCore: admission count carries across micro-batches; " +
    "saturated keys stay closed; stragglers drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val input = MemoryStream[Events.RawEvent]
    val name = "graft_stream_quota_test"
    val q = Events.streamingQuotaCore(input.toDS(), n = 2).toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1 deliberately out of order: the sorted scan admits e1@0
      // (rank 1) and e2@100 (rank 2); e3@200 is over quota.
      input.addData(Events.RawEvent(3L, 10L, "click", 200L),
        Events.RawEvent(1L, 10L, "click", 0L),
        Events.RawEvent(2L, 10L, "click", 100L))
      q.processAllAvailable()
      // batch 2: user 10 is saturated -> e4 dropped; e0@50 is a straggler
      // below the (ms, id) high-water mark -> dropped without touching
      // the count; fresh user 11 admits e5 at rank 1.
      input.addData(Events.RawEvent(4L, 10L, "click", 300L),
        Events.RawEvent(0L, 10L, "click", 50L),
        Events.RawEvent(5L, 11L, "view", 10L))
      q.processAllAvailable()
      val got = s.table(name).collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(got === Set((1L, 1L), (2L, 2L), (5L, 1L)))
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("nearestEventJoinOn: bidirectional nearest, |dt| tie -> smaller view_id, " +
    "tolerance drops unmatched purchases") {
    val ev = Seq(
      (1L, 10L, "purchase", 1000L),
      (2L, 10L, "view", 400L),   // dt 600 looking back
      (3L, 10L, "view", 1600L),  // dt 600 looking forward -> tie, id 2 wins
      (4L, 10L, "view", 250L),   // dt 750, farther
      (5L, 11L, "purchase", 5000L),
      (6L, 11L, "view", 20000L), // outside tolerance -> purchase 5 unmatched
      (7L, 12L, "view", 999L)    // another user's view never matches
    ).toDF("event_id", "user_id", "event_type", "ms")
    val got = Events.nearestEventJoinOn(ev, toleranceMs = 10000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((10L, 1L, 2L, 600L)))
  }

  test("rankerAgreement: overlap@k arithmetic against the two rankers' own outputs") {
    val d = Seq(
      (0L, "spark spark spark spark x"),
      (1L, "spark y"),
      (2L, "z z z z z z z z"),
      (3L, "shuffle spark a b"),
      (4L, "hash hash q r s")
    ).map { case (id, t) => (id, t, "s", "en", t.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val t = TextAnalysis.tfidfSearch(d, k = 20).collect().map(_.getLong(0)).toSeq
    val b = TextAnalysis.bm25Search(d, k = 20).collect().map(_.getLong(0)).toSeq
    val want = Seq(5, 10, 20).map { k =>
      val (tk, bk) = (t.take(k).toSet, b.take(k).toSet)
      val common = (tk & bk).size.toLong
      (k.toLong, tk.size.toLong, bk.size.toLong, common,
        BigDecimal(common.toDouble / (tk.size + bk.size - common))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextAnalysis.rankerAgreement(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === want)
  }

  test("sourceLengthTokenCorr: closed-form Pearson from exact integer moments") {
    val d = Seq(
      // sA: y = x/10 exactly -> corr 1.0
      (0L, "a b c", "sA", "en", 30L), (1L, "a b c d", "sA", "en", 40L),
      (2L, "a b", "sA", "en", 20L),
      // sB: anti-correlated lengths
      (3L, "a b c d e", "sB", "en", 10L), (4L, "a b c", "sB", "en", 20L),
      (5L, "a", "sB", "en", 30L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    def corr(xs: Seq[(Long, Long)]): Double = {
      val n = xs.size.toLong
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum; val syy = xs.map(p => p._2 * p._2).sum
      BigDecimal((n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = TextAnalysis.sourceLengthTokenCorr(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      ("sA", 3L, corr(Seq((30L, 3L), (40L, 4L), (20L, 2L)))),
      ("sB", 3L, corr(Seq((10L, 5L), (20L, 3L), (30L, 1L))))))
    assert(got(0)._3 === 1.0 && got(1)._3 < 0)
  }

  test("minhashErrorAuditFrom: agreement-fraction estimate vs exact jaccard, JVM-recomputed") {
    val d = Seq(
      (0L, "w1 w2 w3 w4 w5"),
      (1L, "w1 w2 w3 w4 w5"),   // exact dup of 0: est = 1, err = 0
      (2L, "w1 w2 w3 w4 x")     // partial overlap with 0
    ).map { case (id, t) => (id, t, "s", "en", t.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    // verified pairs fed directly (the cached-frame fan-in shape)
    val pairs = Seq((0L, 1L, 1.0), (0L, 2L, 0.5))
      .toDF("doc_a", "doc_b", "jaccard")
    def md5h(seed: Long, s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def sig(toks: Seq[String]): Map[Long, Long] = {
      val sh = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      (0L to 7L).map(seed => seed -> sh.map(s => md5h(seed, s)).min).toMap
    }
    val s0 = sig(Seq("w1", "w2", "w3", "w4", "w5"))
    val s2 = sig(Seq("w1", "w2", "w3", "w4", "x"))
    val est02 = (0L to 7L).count(seed => s0(seed) == s2(seed)) / 8.0
    val got = Dedup.minhashErrorAuditFrom(pairs, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (0L, 1L, 1.0, 1.0, 0.0),
      (0L, 2L, 0.5, est02,
        BigDecimal(math.abs(est02 - 0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("eventRateAnomaliesOn: spike against a flat 24h baseline scores z = sqrt(24); " +
    "cold-start hours are never scored") {
    // one event per hour for 24h, then a 6-event spike at hour 24
    val ev = ((0 until 24).map(h => ("click", h * 3600000L)) ++
      (0 until 6).map(i => ("click", 24 * 3600000L + i))).toDF("event_type", "ms")
    val got = Events.eventRateAnomaliesOn(ev, lookback = 24, zMin = 2.0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // baseline mean 1, sample std 0 would divide by zero -> use a baseline
    // with variance: replace hour 0 with a 2-event hour
    val ev2 = (Seq(("click", 0L), ("click", 1L)) ++
      (1 until 24).map(h => ("click", h * 3600000L)) ++
      (0 until 6).map(i => ("click", 24 * 3600000L + i))).toDF("event_type", "ms")
    val got2 = Events.eventRateAnomaliesOn(ev2, lookback = 24, zMin = 2.0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // s1 = 25, s2 = 27 over the 24 prior hours; z = (6 - 25/24)/sqrt((27 - 625/24)/23)
    val z = BigDecimal((6.0 - 25.0 / 24.0) /
      math.sqrt((27.0 - 625.0 / 24.0) / 23.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got2 === Seq(("click", 24L, 6L, z)))
    // the all-flat baseline yields a NaN/zero-variance z, filtered by abs(z) >= zMin
    assert(got.isEmpty)
  }

  test("shardBalance: md5 shard assignment + chi-square vs corpus mix, JVM-recomputed") {
    val d = (0L to 39L).map(i => (i, "t", s"src${i % 2}", "en", 10L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    def shard(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:shard".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 4
    }
    val assign = (0L to 39L).map(i => (shard(i), s"src${i % 2}"))
    val srcTot = assign.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val want = assign.groupBy(_._1).map { case (sh, xs) =>
      val nShard = xs.size.toLong
      val chi2 = srcTot.keys.toSeq.sorted.map { src =>
        val obs = xs.count(_._2 == src).toDouble
        val exp = nShard.toDouble * srcTot(src) / 40.0
        BigDecimal((obs - exp) * (obs - exp) / exp)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (sh, nShard,
        BigDecimal(chi2.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = Curation.shardBalance(d, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("quantizationError: round-trip error bounded by the half-step, JVM-recomputed") {
    val e = Seq(
      (0L, Array(0.5f, -0.25f, 0.1f), 0L),
      (1L, Array(0.0f, 0.0f, 0.0f), 0L),   // zero vector: scale 0, zero error
      (2L, Array(1.0f, -1.0f, 0.003f), 0L)
    ).toDF("vec_id", "embedding", "label")
    def expect(v: Array[Float]): (Double, Double, Double) = {
      val xs = v.map(_.toDouble)
      val mx = xs.map(math.abs).max
      val scale = if (mx > 0) 127.0 / mx else 0.0
      val errs = xs.map(x =>
        if (scale > 0) math.abs(x - math.floor(x * scale + 0.5) / scale) else math.abs(x))
      def r(x: Double, s: Int) =
        BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
      val mean = errs.map(x => BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / xs.length
      (r(mx, 6), r(errs.max, 9), r(mean, 9))
    }
    val got = Similarity.quantizationError(e).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    val want = Seq(
      (0L, expect(Array(0.5f, -0.25f, 0.1f))),
      (1L, expect(Array(0.0f, 0.0f, 0.0f))),
      (2L, expect(Array(1.0f, -1.0f, 0.003f)))
    ).map { case (id, (a, b, c)) => (id, a, b, c) }
    assert(got === want)
    // error never exceeds the half-step bound mx/254 (+ rounding slack)
    got.filter(_._2 > 0).foreach { case (_, mx, maxErr, _) =>
      assert(maxErr <= mx / 254.0 + 1e-9) }
  }

  test("streamingAnomaliesCore: hours close on later-hour arrival, baseline carries " +
    "across micro-batches, open hour never scores, stragglers drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val H = 3600000L
    val input = MemoryStream[(String, Long)]
    val name = "graft_stream_anom_test"
    val q = Events.streamingAnomaliesCore(input.toDS(), lookback = 3, zMin = 1.0).toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: hour 0 (1 event), hour 1 partially (1 event)
      input.addData(("click", 0L), ("click", H + 1L))
      q.processAllAvailable()
      // batch 2: hour 1 completes (2nd event), hour 2 (1), hour 3 (5) —
      // hours 0,1,2 close along the way with deque < lookback, no score
      input.addData(("click", H + 2L), ("click", 2 * H), ("click", 3 * H),
        ("click", 3 * H + 1), ("click", 3 * H + 2), ("click", 3 * H + 3),
        ("click", 3 * H + 4))
      q.processAllAvailable()
      // batch 3: hour 4 opens -> hour 3 closes against baseline
      // [(0,1),(1,2),(2,1)]; a straggler into closed hour 2 is dropped
      input.addData(("click", 4 * H), ("click", 2 * H + 5L))
      q.processAllAvailable()
      val got = s.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      // s1 = 4, s2 = 6 over the 3 prior hours; z = (5 - 4/3)/sqrt((6 - 16/3)/2)
      val z = BigDecimal((5.0 - 4.0 / 3.0) / math.sqrt((6.0 - 16.0 / 3.0) / 2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got === Seq(("click", 3L, 5L, z)))
    } finally { q.stop(); s.catalog.dropTempView(name) }
  }

  test("eventTransitionsOn: per-user lead pairs, exact conditional probabilities") {
    val ev = Seq(
      (1L, 10L, "view", 0L), (2L, 10L, "click", 100L), (3L, 10L, "view", 200L),
      (4L, 10L, "click", 300L),
      (5L, 11L, "view", 0L), (6L, 11L, "purchase", 50L),
      (7L, 12L, "error", 0L)   // single event: no transition
    ).toDF("event_id", "user_id", "event_type", "ms")
      .select("user_id", "event_id", "event_type", "ms")
    val got = Events.eventTransitionsOn(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // user 10: view->click, click->view, view->click; user 11: view->purchase
    assert(got === Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 2L, 0.666667),
      ("view", "purchase", 1L, 0.333333)))
  }

  test("crossLangShingleRatio: only shingles spanning >= 2 languages count; " +
    "same-lang duplication does not") {
    val d = Seq(
      (0L, "a b c d", "en"), // "a b c" shared with de doc -> cross
      (1L, "a b c x", "de"),
      (2L, "a b c d", "en")  // exact same-lang dup of 0: "b c d" NOT cross
    ).map { case (id, t, l) => (id, t, "s", l, t.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.crossLangShingleRatio(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq((0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }
}
