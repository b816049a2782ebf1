package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unit pins for the round-12 operator work. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // A 60-token quote planted verbatim inside two otherwise-unrelated
  // documents, at different offsets; two further documents share nothing.
  private val quote = (1 to 60).map(i => s"q$i").mkString(" ")
  private def planted = Seq(
    (0L, s"alpha beta gamma $quote delta", "s", "en", 1L),          // quote at tokens 4..63
    (1L, s"$quote omega psi chi phi upsilon tau", "s", "en", 1L),   // quote at tokens 1..60
    (2L, (1 to 80).map(i => s"u$i").mkString(" "), "s", "en", 1L),  // unrelated
    (3L, (1 to 80).map(i => s"v$i").mkString(" "), "s", "en", 1L)   // unrelated
  ).toDF("doc_id", "text", "source", "lang", "n_chars")

  test("duplicatedSpans: a planted 60-token cross-doc quote is found at the exact " +
       "offset and length; unrelated docs yield nothing") {
    val got = Dedup.duplicatedSpans(planted, windowTokens = 8, minSpanTokens = 50)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // span_tokens is exactly 60 in both docs; n_windows = 60 - 8 + 1 = 53
    assert(got.toSeq === Seq((0L, 4L, 60L, 53L), (1L, 1L, 60L, 53L)))
  }

  test("duplicatedSpans: windows duplicated only WITHIN one document do not count") {
    val selfRep = Seq(
      // the same 10-token run twice inside ONE doc; no other doc shares it
      (0L, ((1 to 10).map(i => s"r$i") ++ (1 to 10).map(i => s"r$i")).mkString(" "), "s", "en", 1L),
      (1L, (1 to 30).map(i => s"w$i").mkString(" "), "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    assert(Dedup.duplicatedSpans(selfRep, windowTokens = 4, minSpanTokens = 8).count() === 0L)
  }

  test("duplicatedSpans: two disjoint shared runs in one document stay two spans") {
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ")
    val gap = (1 to 15).map(i => s"g$i").mkString(" ")
    val d = Seq(
      (0L, s"$a $gap $b", "s", "en", 1L),
      (1L, s"zz $a yy", "s", "en", 1L),
      (2L, s"pp $b qq", "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val spans = Dedup.duplicatedSpans(d, windowTokens = 4, minSpanTokens = 10)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 0: run a at 1..20, run b at 36..55 — merged separately, not
    // bridged; docs 1/2 carry the run after a single leading token.
    assert(spans.toSeq === Seq(
      (0L, 1L, 20L), (0L, 36L, 20L), (1L, 2L, 20L), (2L, 2L, 20L)))
  }

  test("bpeMerges: hand-computed 3-merge chain — counts, tiebreak, and greedy " +
       "non-overlapping replace") {
    // Corpus pieces: "aaab" x2, "ab" x1.
    //   step 1: pairs (a,a)x4 (two per "aaab"), (a,b)x3 -> merge (a,a), 4.
    //     "aaab" folds a,a,a,b -> [aa, a, b]  (greedy non-overlap: the third
    //     'a' survives because the fold's last symbol is now "aa").
    //   step 2: (aa,a)x2, (a,b)x3 -> merge (a,b), 3.  "aaab" -> [aa, ab],
    //     "ab" -> [ab].
    //   step 3: (aa,ab)x2 -> merge (aa,ab), 2.
    val d = Seq((0L, "aaab aaab ab", "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.bpeMerges(d, steps = 3).orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))
  }

  test("bpeEncode: the learned 2-merge vocab compresses exactly as hand-computed") {
    // After merges (a,a) then (a,b): "aaab" -> [aa, ab] (2 tokens),
    // "ab" -> [ab] (1). Doc 0 = aaab aaab ab: 3 pieces, 2+2+1 = 5 BPE
    // tokens (from 4+4+2 = 10 chars).
    val d = Seq((0L, "aaab aaab ab", "s", "en", 1L),
                (1L, "ab ab", "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.bpeEncode(d, steps = 2).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 3L, 5L), (1L, 2L, 2L)))
  }

  test("bigramLogprob: word order moves the score where the unigram model is blind") {
    // Docs 0 and 1 share the same token MULTISET; doc 0 repeats the
    // corpus-frequent order "a b", doc 1 scrambles it. Unigram logprob is
    // identical by construction; the bigram model must rank doc 0 higher.
    val d = Seq(
      (0L, "a b a b a b", "s", "en", 1L),
      (1L, "b a a b b a", "s", "en", 1L),
      (2L, "a b a b", "s", "en", 1L),
      (3L, "x", "s", "en", 1L)                       // single token: no bigrams
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val uni = TextAnalysis.unigramLogprob(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(0L) === uni(1L))
    val got = TextAnalysis.bigramLogprob(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = got.map(r => r._1 -> r._3).toMap
    assert(got.map(_._1).toSet === Set(0L, 1L, 2L))  // doc 3 absent
    assert(byDoc(0L) > byDoc(1L),
      s"bigram LM did not prefer the frequent order: ${byDoc(0L)} <= ${byDoc(1L)}")
    // hand-check one doc: doc 2 = bigrams (a,b),(b,a),(a,b); corpus
    // counts c(a,b)=6, c(b,a)=5, c(a,a)=1, c(b,b)=1 -> contexts c(a)=7,
    // c(b)=6 (a doc's last token has no successor), V=3 ->
    // lp = [ln(7/10), ln(6/9), ln(7/10)]
    val expect2 = (2 * math.log(7.0 / 10) + math.log(6.0 / 9)) / 3
    assert(math.abs(byDoc(2L) - expect2) < 1e-6)
  }

  test("bpeMerges: deterministic tiebreak picks the lexicographically smallest pair") {
    // "ab" x2 and "cd" x2: both pairs count 2 -> (a,b) wins on sym_a.
    val d = Seq((0L, "ab cd ab cd", "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = TextAnalysis.bpeMerges(d, steps = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(("a", "b", 2L)))
  }
}
