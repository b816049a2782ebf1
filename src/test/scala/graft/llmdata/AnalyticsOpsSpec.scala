package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.llmdata.{Dedup, Similarity, TextAnalysis}
import graft.streaming.Events

/** Unit pins for the q101-q105 operators: hand-computed references on tiny
  * fixtures — the chained-stage funnel rule, cohort offsets, near-dup
  * representative choice, unit-norm arithmetic, and occurrence-vs-term
  * coverage counting, none of which a rows-count check would catch.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("nearDupRepresentatives: exactly the component-minimum doc survives; md5 witness") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "web", "en", 44L),
      (1L, "the quick brown fox jumps over the lazy dog", "web", "en", 44L),
      (2L, "the quick brown fox jumps over the lazy cat", "web", "en", 44L),
      (3L, "completely different content about spark engines running fast", "book", "en", 62L),
      (4L, "the quick brown fox jumps over the lazy dog", "wiki", "en", 44L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.nearDupRepresentatives(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got === Set(
      (0L, "web", "en", 44L, md5hex("the quick brown fox jumps over the lazy dog")),
      (3L, "book", "en", 62L,
        md5hex("completely different content about spark engines running fast"))))
  }

  test("funnelOn: stage mins chain strictly — out-of-order events do not convert") {
    val e = Seq(
      // u1 completes all three stages in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2's purchase precedes its first click -> stage stops at 2
      (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      // u3's click precedes its first view -> stage stops at 1
      (3L, "click", 5L), (3L, "view", 10L),
      // u4 never views -> not in the funnel at all
      (4L, "click", 5L), (4L, "purchase", 6L),
      // u5: second click after the view is the one that counts
      (5L, "click", 1L), (5L, "view", 10L), (5L, "click", 12L)
    ).toDF("user_id", "event_type", "ms")
    val got = Events.funnelOn(e, Seq("view", "click", "purchase")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      1L -> ((10L, 20L, 30L, 3L)),
      2L -> ((10L, 20L, -1L, 2L)),
      3L -> ((10L, -1L, -1L, 1L)),
      5L -> ((10L, 12L, -1L, 2L))))
  }

  test("cohortRetentionOn: first-week cohorts, per-offset distinct user counts") {
    val wk = 604800000L
    val e = Seq(
      (1L, 0L * wk), (1L, 1L * wk + 5), (1L, 3L * wk),
      (2L, 1L * wk),
      (3L, 0L * wk + 7), (3L, 1L * wk), (3L, 1L * wk + 9) // same week twice: counted once
    ).toDF("user_id", "ms")
    val got = Events.cohortRetentionOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("normalizeEmbeddings: unit values and norm by hand; zero vector maps to zero") {
    val d = Seq(
      (1L, Seq(3.0f, 4.0f)),
      (2L, Seq(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.normalizeEmbeddings(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === Map(
      (1L, 0L) -> ((0.6, 5.0)), (1L, 1L) -> ((0.8, 5.0)),
      (2L, 0L) -> ((0.0, 0.0)), (2L, 1L) -> ((0.0, 0.0))))
  }

  test("temperatureMix: sqrt flattening boosts small sources, probabilities sum to 1") {
    val d = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"), // n=4, sc=2
      (5L, "B")                                   // n=1, sc=1
    ).toDF("doc_id", "source")
    val got = Curation.temperatureMix(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === Map(
      "A" -> ((4L, 0.666667, 0.833333)),  // p = 2/3, natural 0.8 -> downsampled
      "B" -> ((1L, 0.333333, 1.666667)))) // p = 1/3, natural 0.2 -> upsampled
  }

  test("lengthOutlierFilter: interpolated per-lang bounds trim exactly the tails") {
    // n_chars 1..20 in one lang: lo = 1 + 0.95*(2-1) = 1.95, hi = 19.05
    val d = (1L to 20L).map(i => (i, "en", i)).toDF("doc_id", "lang", "n_chars")
    val got = Curation.lengthOutlierFilter(d).collect().map(_.getLong(0)).sorted
    assert(got === (2L to 19L).toArray)
  }

  test("sourceLangProfile: pivot zero-fills absent langs, fixed column order") {
    val d = Seq((1L, "s1", "en"), (2L, "s1", "en"), (3L, "s1", "zh"), (4L, "s2", "de"))
      .toDF("doc_id", "source", "lang")
    val prof = Curation.sourceLangProfile(d)
    assert(prof.columns.toSeq === Seq("source", "n_de", "n_en", "n_es", "n_fr", "n_zh"))
    val got = prof.collect()
      .map(r => r.getString(0) -> (1 to 5).map(r.getLong).toList).toMap
    assert(got === Map("s1" -> List(0L, 2L, 0L, 0L, 1L), "s2" -> List(1L, 0L, 0L, 0L, 0L)))
  }

  test("eventPathsOn: consecutive triples per user; ms then event_id ordering; tails drop") {
    val e = Seq(
      (1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "c", 30L, 102L), (1L, "d", 40L, 103L),
      // u2: equal timestamps — event_id breaks the tie, so the path is a>b>c
      (2L, "a", 5L, 200L), (2L, "b", 5L, 201L), (2L, "c", 5L, 202L),
      // u3: only two events -> no complete triple
      (3L, "a", 1L, 300L), (3L, "b", 2L, 301L)
    ).toDF("user_id", "event_type", "ms", "event_id")
    val got = Events.eventPathsOn(e, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toList
    assert(got === List("a>b>c" -> 2L, "b>c>d" -> 1L))
    // k boundary: count tie between a>b>c (2) and nothing else at k=1
    assert(Events.eventPathsOn(e, 1).collect().map(_.getString(0)).toList === List("a>b>c"))
  }

  test("ngramVocab: document frequency on distinct bigrams, df-then-gram ordering") {
    val d = Seq((1L, "a b"), (2L, "a b a b"), (3L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramVocab(d, n = 2, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    // "a b" appears in docs 1,2 (distinct within doc 2); "b a" in doc 2; "b c" in doc 3
    assert(got === List((1L, "a b", 2L), (2L, "b a", 1L), (3L, "b c", 1L)))
  }

  test("tokenSpectrum: frequency-of-frequencies over total occurrences") {
    val d = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenSpectrum(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a:2, b:2, c:1 -> one term seen once, two terms seen twice
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("corpusCube: full lattice — cell, per-lang, per-source, and grand-total rows") {
    val d = Seq(
      (1L, "en", "s1", 10L), (2L, "en", "s2", 20L), (3L, "zh", "s1", 5L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val got = Curation.corpusCube(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      ("en", "s1") -> ((1L, 10L)), ("en", "s2") -> ((1L, 20L)), ("zh", "s1") -> ((1L, 5L)),
      ("en", "<all>") -> ((2L, 30L)), ("zh", "<all>") -> ((1L, 5L)),
      ("<all>", "s1") -> ((2L, 15L)), ("<all>", "s2") -> ((1L, 20L)),
      ("<all>", "<all>") -> ((3L, 35L))))
  }

  test("sourceOverlap: shingle-set Jaccard by hand; zero-overlap pairs absent") {
    val d = Seq(
      (1L, "a b c d", "s1"),   // shingles: {a b c, b c d}
      (2L, "a b c", "s2"),     // shingles: {a b c}
      (3L, "x y z", "s3")      // shingles: {x y z} — no overlap with anyone
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(("s1", "s2") -> ((1L, 0.5)))) // |∩|=1, |∪|=2
  }

  test("unigramLogprob: hand-computed mean token logprob") {
    // corpus: a a b (N=3); P(a)=2/3, P(b)=1/3
    val d = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogprob(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lnA = math.log(2.0 / 3.0)
    val lnB = math.log(1.0 / 3.0)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got === Map(1L -> ((2L, r6(lnA))), 2L -> ((1L, r6(lnB)))))
  }

  test("lengthHistogram: integer floor-log2 buckets, exact at powers of two") {
    val d = Seq((1L, "en", 1L), (2L, "en", 2L), (3L, "en", 3L), (4L, "en", 4L),
      (5L, "en", 1024L)).toDF("doc_id", "lang", "n_chars")
    val got = TextAnalysis.lengthHistogram(d).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      0L -> ((1L, 1L, 1L)), 1L -> ((2L, 2L, 3L)), 2L -> ((1L, 4L, 4L)),
      10L -> ((1L, 1024L, 1024L))))
  }

  test("vocabCoverage: counts token occurrences (not distinct terms) against top-k vocab") {
    // df: b=3, a=1, c=1 -> top-1 vocab = {b}
    val d = Seq((1L, "a b a"), (2L, "b c"), (3L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(d, k = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 1L, 0.333333)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((1L, 1L, 1.0))))
  }
}
