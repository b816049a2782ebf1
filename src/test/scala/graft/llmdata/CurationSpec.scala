package graft.llmdata

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Curation operators: determinism, partition/coverage invariants, the
  * bounded-aggregator-vs-window equivalence, and the HLL error envelope. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")

  test("hashSample is deterministic, a subset, and near the 41/256 target rate") {
    val a = Curation.hashSample(docs).collect().map(_.getLong(0)).sorted
    val b = Curation.hashSample(docs).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "same input must select the same rows")
    val n = docs.count().toDouble
    assert(a.length > 0 && a.length < n)
    val rate = a.length / n
    assert(math.abs(rate - 41.0 / 256) < 0.08, s"sample rate $rate far from ${41.0 / 256}")
    assert(a.toSet.subsetOf(docs.select("doc_id").collect().map(_.getLong(0)).toSet))
  }

  test("assignSplits covers every doc exactly once with ~80/10/10 mass") {
    val s = Curation.assignSplits(docs)
    assert(s.count() === docs.count())
    assert(s.select("doc_id").distinct().count() === docs.count())
    val frac = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / docs.count().toDouble).toMap
    assert(frac.keySet === Set("train", "val", "test"))
    assert(math.abs(frac("train") - 205.0 / 256) < 0.1, s"train ${frac("train")}")
    assert(frac("val") > 0.02 && frac("test") > 0.02)
  }

  test("quotaCap equals the window row_number reference and plans no Window") {
    val got = Curation.quotaCap(docs, n = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val exp = docs.select(col("source"), col("doc_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(1))).toSet
    assert(got === exp)
    val plan = Curation.quotaCap(docs, n = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"quotaCap planned a Window:\n$plan")
  }

  test("approxLengthQuantiles: every estimate is a data value within the GK rank-error envelope") {
    val got = Curation.approxLengthQuantiles(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byLang = docs.select("lang", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    assert(got.length === byLang.size * qs.length)
    got.foreach { case (lang, qPos, est) =>
      val v = byLang(lang)
      assert(v.contains(est), s"$lang q$qPos estimate $est is not a data value")
      // rank error bound: |rank(est) - q*n| <= n/accuracy + 1
      val target = qs(qPos.toInt - 1) * v.length
      val lo = v.indexOf(est)
      val hi = v.lastIndexOf(est)
      val slack = v.length / 1000.0 + 1.0
      assert(lo - slack <= target && target <= hi + 1 + slack,
        s"$lang q$qPos: rank of $est ([$lo,$hi]) outside envelope around $target")
    }
  }

  test("stratifiedSample: exact per-stratum count, window-reference parity, no Window funnel") {
    val n = 5
    val got = Curation.stratifiedSample(docs, n)
    val sizes = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.foreach { case (lang, c) =>
      assert(sizes.getOrElse(lang, 0L) === math.min(n.toLong, c),
        s"stratum $lang: expected min($n, $c)")
    }
    val priority = conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":strat"))), 1, 15),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("priority", "doc_id")
    val exp = docs.select(col("lang"), col("doc_id"), priority.as("priority"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val gotSet = got.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotSet === exp)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"stratifiedSample planned a Window:\n$plan")
  }

  test("KeepNSmallest agrees with sorted.take(n) under random reduce/merge orders") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val n = 1 + rnd.nextInt(5)
      val xs = Array.fill(rnd.nextInt(30))(rnd.nextLong() % 1000)
      val agg = new Curation.KeepNSmallest(n)
      // random split into partial buffers, then merge — any association
      val parts = xs.grouped(1 + rnd.nextInt(5)).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq === xs.sorted.take(n).toSeq)
    }
  }

  test("lengthQuantiles matches a local interpolated-quantile reference") {
    val got = Curation.lengthQuantiles(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byLang = docs.select("lang", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2.toDouble).sorted).toMap
    def qcont(v: IndexedSeq[Double], q: Double): Double = {
      val pos = q * (v.length - 1)
      val lo = pos.toInt
      if (lo == v.length - 1) v(lo) else v(lo) + (pos - lo) * (v(lo + 1) - v(lo))
    }
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    got.foreach { case (lang, qPos, value) =>
      val exp = qcont(byLang(lang).toIndexedSeq, qs(qPos.toInt - 1))
      assert(math.abs(value - exp) < 1e-6, s"$lang q$qPos: $value vs $exp")
    }
    assert(got.length === byLang.size * qs.length)
  }

  test("packSequences: offsets are gapless concatenation order; seq ids are start/budget") {
    val got = Curation.packSequences(docs, budget = 512).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === docs.count())
    got.groupBy(_._1).foreach { case (source, rows) =>
      val ordered = rows.sortBy(_._2)
      var expectedOffset = 0L
      ordered.foreach { case (_, docId, nTokens, startOffset, seqId) =>
        assert(startOffset === expectedOffset,
          s"$source/$docId: offset $startOffset, expected $expectedOffset (stream must be gapless)")
        assert(seqId === startOffset / 512, s"$source/$docId: seq_id $seqId")
        assert(nTokens > 0)
        expectedOffset += nTokens
      }
    }
  }

  test("packSequences: two-phase prefix sum matches the sequential window for any shardSpan") {
    val exp = Curation.packSequencesWindow(docs, budget = 512).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // spans chosen to exercise 1-doc shards, multi-doc shards, and the
    // everything-in-one-shard degenerate case
    for (span <- Seq(1L, 3L, 7L, 1L << 16)) {
      val got = Curation.packSequences(docs, budget = 512, shardSpan = span).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(got === exp, s"shardSpan=$span diverged from the sequential window")
    }
    // the doc-level window must partition by (source, shard) — the funnel
    // guard; the only source-only window left runs on one-row-per-shard totals
    val plan = Curation.packSequences(docs, budget = 512, shardSpan = 3)
      .queryExecution.executedPlan.toString
    val docWindow = plan.linesIterator.find(l =>
      l.contains("windowspecdefinition") && l.contains("n_tokens"))
    assert(docWindow.exists(l => l.contains("shard")),
      s"doc-level window is not sharded:\n${docWindow.getOrElse(plan)}")
  }

  test("mixCorpus: copy counts follow the weight map; realized rates near targets") {
    val got = Curation.mixCorpus(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val perDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // copies are numbered 1..n with no gaps
    perDoc.values.foreach(cs => assert(cs === (1L to cs.length)))
    val langOf = got.map(g => g._1 -> g._2).toMap
    perDoc.foreach { case (_, cs) =>
      assert(cs.length >= 0 && cs.length <= 3)
    }
    // realized per-lang rates approximate the weights (deterministic hash,
    // so these are fixed numbers — loose bounds guard fixture drift)
    val nByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val copiesByLang = got.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    assert(math.abs(copiesByLang("en") / nByLang("en") - 0.5) < 0.15)
    assert(math.abs(copiesByLang("de") / nByLang("de") - 2.25) < 0.2)
    assert(copiesByLang("es") / nByLang("es") === 1.0)
    // en docs get 0 or 1 copies; de docs 2 or 3
    got.filter(_._2 == "en").groupBy(_._1).foreach { case (_, rs) => assert(rs.length <= 1) }
    got.filter(_._2 == "de").groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length == 2 || rs.length == 3) }
    assert(langOf.nonEmpty)
  }

  test("curationPipeline: stages compose — unique survivors, gated lengths, train-only, gapless packing") {
    val out = Curation.curationPipeline(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty && out.length < docs.count())
    // survivors are unique doc_ids with gated token counts
    assert(out.map(_._2).distinct.length === out.length)
    out.foreach { case (_, id, n, _, _) => assert(n >= 20 && n <= 85, s"doc $id tokens $n") }
    // every survivor is in the train split (same md5 rule, computed locally)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    out.foreach { case (_, id, _, _, _) =>
      assert(md5hex(s"$id:split").take(2) < "cd", s"doc $id not in train split") }
    // per-source streams are gapless concatenations with correct seq ids
    out.groupBy(_._1).foreach { case (source, rows) =>
      var expected = 0L
      rows.sortBy(_._2).foreach { case (_, id, n, off, seq) =>
        assert(off === expected, s"$source/$id offset $off != $expected")
        assert(seq === off / 2048)
        expected += n
      }
    }
  }

  test("approxDistinctTexts lands within the rsd envelope of the exact count") {
    val got = Curation.approxDistinctTexts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val exact = docs.groupBy("lang").agg(countDistinct("text").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (lang, approx, nDocs) =>
      val e = exact(lang)
      assert(math.abs(approx - e).toDouble / e < 0.05,
        s"$lang: approx $approx vs exact $e out of envelope")
      // no approx <= nDocs assertion: HLL is an estimator and may
      // overshoot the true count (and thus the row count) slightly
      assert(nDocs > 0)
    }
  }

  test("q212 interleave schedule: stride-scheduler fairness in every prefix") {
    val sched = Curation.interleaveSchedule(docs)
      .orderBy("sched_pos", "doc_id")
      .select("source").collect().map(_.getString(0))
    val n = sched.length.toDouble
    val share = sched.groupBy(identity).view.mapValues(_.length / n).toMap
    // stride scheduling: in any prefix of length m, each source's count is
    // within 1 of m * its share
    val seen = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    sched.zipWithIndex.foreach { case (src, i) =>
      seen(src) += 1
      val m = i + 1
      share.foreach { case (s, p) =>
        val expect = m * p
        assert(math.abs(seen(s) - expect) <= 1.0 + 1e-9,
          s"prefix $m: source $s has ${seen(s)} vs expected $expect")
      }
    }
  }

  test("q212 interleave schedule is deterministic and covers every doc once") {
    val a = Curation.interleaveSchedule(docs)
    val b = Curation.interleaveSchedule(docs.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() === docs.count())
    assert(a.select("doc_id").distinct().count() === docs.count())
  }

  test("q217 group-aware folds: near-dup pairs NEVER straddle a fold boundary") {
    val folds = Curation.groupAwareFolds(spark, TestSpark.sfDir)
    assert(folds.count() === docs.count(), "every doc gets a fold")
    val fr = folds.agg(min("fold"), max("fold")).head()
    assert(fr.getLong(0) >= 0L && fr.getLong(1) <= 4L)
    // structural leakage-freedom: both ends of every VERIFIED near-dup
    // pair carry the same fold
    val pairs = Dedup.minhashMd5PairsOn(spark, TestSpark.sfDir)
    assert(pairs.count() > 0L, "fixture has no verified pairs — vacuous")
    val leaked = pairs
      .join(folds.select(col("doc_id").as("doc_a"), col("fold").as("fold_a")), "doc_a")
      .join(folds.select(col("doc_id").as("doc_b"), col("fold").as("fold_b")), "doc_b")
      .filter(col("fold_a") =!= col("fold_b"))
    assert(leaked.count() === 0L, "a near-dup pair straddles folds")
  }

  test("q236 apportionment: exact budget total, within-1 proportionality, remainder tiebreak") {
    import spark.implicits._
    // counts 7/7/6, budget 10: ideals 3.5/3.5/3, floors 3/3/3, one
    // leftover goes to the tied-largest remainder with the SMALLER source
    val tiny = (Seq.fill(7)("a") ++ Seq.fill(7)("b") ++ Seq.fill(6)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val got = Curation.apportionBudget(tiny, budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // fixture: quotas sum EXACTLY to the budget and stay within 1 of ideal
    val fix = Curation.apportionBudget(docs, budget = 100L).collect()
    val n = docs.count().toDouble
    assert(fix.map(_.getLong(2)).sum === 100L)
    fix.foreach { r =>
      val ideal = 100.0 * r.getLong(1) / n
      assert(math.abs(r.getLong(2) - ideal) < 1.0 + 1e-9,
        s"${r.getString(0)} quota ${r.getLong(2)} vs ideal $ideal")
    }
  }

  test("q218 snapshot diff classifies each planted change correctly") {
    import spark.implicits._
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone")).toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (2L, "after"), (4L, "fresh")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("q218 fixture releases populate all four status classes") {
    val byStatus = Curation.corpusSnapshotDiff(docs)
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("added", "removed", "changed", "unchanged").foreach { s =>
      assert(byStatus.getOrElse(s, 0L) > 0L, s"status $s unpopulated")
    }
    // unchanged dominates: the two releases share most of the corpus
    assert(byStatus("unchanged") > byStatus("changed"))
  }
}
