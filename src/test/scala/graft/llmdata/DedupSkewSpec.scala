package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key hardening for the dedup family: a corpus where ONE text owns 90%
  * of all rows — the degenerate shape (boilerplate page, scraped error
  * banner) that melts any per-key Window at 100 TB. The claim under test is
  * not just "right answer" but "right PLAN": the aggregation must partial-
  * combine map-side, so the hot key crosses the shuffle as one row per map
  * partition instead of funneling its entire row set through one reducer.
  * The shuffle-records metric makes that mechanical: with map-side combine
  * the exchange carries ~#distinct-keys records; without it, ~#rows.
  *
  * AQE is disabled for the plan-metrics assertions so the executed tree
  * exposes plain ShuffleExchangeExec nodes (no query-stage wrapping) and
  * the measured exchange is the static plan's — the map-side-combine
  * property is AQE-independent.
  */
class DedupSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val nRows = 120000L
  private val hotShare = 9 // of 10

  /** 120k docs; doc_id ≡ 0-8 (mod 10) share one hot text, the rest unique. */
  private def skewedCorpus = {
    spark.range(nRows).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < hotShare,
          lit("the same hot boilerplate banner text repeated everywhere"))
        .otherwise(concat(lit("unique text number "), col("id"))).as("text"),
      lit("web").as("source"), lit("en").as("lang"))
  }

  private def withStaticPlans[T](body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prior)
  }

  private def shuffledRecords(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec =>
        e.metrics.collect { case (k, m) if k.toLowerCase.contains("recordswritten") => m.value }.sum
    }.sum
  }

  test("exactGroups on a 90%-hot corpus: correct groups, hot key crosses the shuffle combined") {
    withStaticPlans {
      val nUnique = nRows / 10
      val groups = Dedup.exactGroups(skewedCorpus)
      val rows = shuffledRecords(groups)
      val got = groups.collect()
      assert(got.length === nUnique + 1)
      val hot = got.filter(_.getAs[Long]("n_docs") > 1)
      assert(hot.length === 1)
      assert(hot.head.getAs[Long]("n_docs") === nRows / 10 * hotShare)
      assert(hot.head.getAs[Long]("keeper_doc_id") === 0L)
      // Map-side combine bound: ≈ one record per (distinct key, map partition)
      // pair. Without partial aggregation this would be ~108k for the hot key
      // alone; 2x the distinct-key count is generous headroom for the
      // per-partition duplicates of the hot key and proves the combine.
      assert(rows > 0, "expected a shuffle in the aggregation plan")
      assert(rows < 2 * (nUnique + 1),
        s"hot key was not map-side combined: $rows records shuffled for ${nUnique + 1} keys")
    }
  }

  test("dedupKeepFirst on a 90%-hot corpus: survivors exact, no Window funnel in the plan") {
    withStaticPlans {
      val deduped = Dedup.dedupKeepFirst(skewedCorpus)
      val plan = deduped.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"per-key Window funnel in dedup plan:\n$plan")
      val got = deduped.select("doc_id").collect().map(_.getLong(0)).sorted
      val expected = (0L +: (0L until nRows).filter(_ % 10 >= hotShare)).sorted
      assert(got.length === nRows / 10 + 1)
      assert(got === expected.toArray)
    }
  }

  /** 6 docs sliding a 12-token window 2 tokens at a time over a 22-token
    * stream: adjacent docs share 8 of 10 distinct 3-shingles each
    * (Jaccard 8/12 ≈ 0.667 ≥ 0.5), docs two apart share 6
    * (6/14 ≈ 0.43 < 0.5) — so the near-dup graph is exactly the 5-edge
    * PATH 0–1–2–3–4–5, diameter 5. Min-label propagation needs one sweep
    * per hop: this is the fixture that forces [[Dedup.nearDupComponents]]
    * through 5+ real sweeps (clique corpora settle in 2), exercising the
    * folded convergence check and the maxSweeps contract on a deep
    * component. */
  private def pathCorpus = {
    import spark.implicits._
    (0 until 6).map { i =>
      val text = (2 * i until 2 * i + 12).map(t => s"w$t").mkString(" ")
      (i.toLong, text, "web", "en", text.length.toLong)
    }.toDF("doc_id", "text", "source", "lang", "n_chars")
  }

  test("nearDupComponents on a 6-node path graph (diameter 5): multi-sweep convergence to one min-label component") {
    val edges = Dedup.minhashNearDup(pathCorpus, simThreshold = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixture sanity: exactly the adjacent pairs — the graph IS a path
    assert(edges === (0L to 4L).map(i => (i, i + 1)).toSet)
    val labels = Dedup.nearDupComponents(pathCorpus, simThreshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === (0L to 5L).map(_ -> 0L).toMap)
    val reps = Dedup.nearDupRepresentatives(pathCorpus, simThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(reps === Seq(0L))
  }

  test("nearDupComponents throws (never returns unconverged labels) when maxSweeps is below the diameter") {
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupComponents(pathCorpus, simThreshold = 0.5, maxSweeps = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("contaminationCheck executes on the hot corpus with the agg-join shape (no Window)") {
    withStaticPlans {
      val res = TextAnalysis.contaminationCheck(skewedCorpus)
      val plan = res.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"Window in contamination plan:\n$plan")
      // Hot text is identical in corpus and probe subsets -> every non-probe
      // hot doc overlaps on all 6 of the hot text's distinct 3-shingles
      // (8 tokens -> 6 windows).
      // Unique texts ("unique text number <id>", 4 tokens -> 2 shingles)
      // share exactly the "unique text number" shingle across docs, so
      // non-probe unique docs overlap with count 1 — the id-bearing shingle
      // never matches another document.
      val got = res.collect()
      assert(got.nonEmpty)
      val byDoc = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_overlap")).toMap
      assert(byDoc.forall { case (id, n) => n === (if (id % 10 < hotShare) 6L else 1L) })
    }
  }
}
