package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Unit pins for the round-8 pipeline operators (q96-q100): hand-computed
  * references on tiny fixtures, plus the positive redaction path the clean
  * testdata corpus cannot exercise (the q98 oracle only proves
  * no-false-positives there).
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("chunkDocuments: window starts, short tails, and content digests by hand") {
    val d = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(d, chunkTokens = 3, stride = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    assert(got === Set(
      (0L, 1L, 3L, md5hex("a b c")),
      (1L, 3L, 3L, md5hex("c d e")),
      (2L, 5L, 1L, md5hex("e"))))
  }

  test("chunkDocuments: every token covered, counts telescope (real corpus)") {
    val real = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val chunks = Curation.chunkDocuments(real)
    val docTok = real.select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("n"))
    // last chunk must end exactly at the document's last token: start + len - 1 == n
    val lastEnd = chunks.groupBy("doc_id")
      .agg(max(col("start_pos") + col("n_chunk_tokens") - 1).as("last_end"))
      .join(docTok, "doc_id").filter(col("last_end") =!= col("n"))
    assert(lastEnd.count() === 0)
    // starts are exactly 1, 1+stride, ... <= n
    val nChunks = chunks.groupBy("doc_id").agg(count(lit(1)).as("c"))
      .join(docTok, "doc_id")
      .filter(col("c") =!= ceil(col("n") / lit(24.0)).cast("long"))
    assert(nChunks.count() === 0)
  }

  test("vocabTopK: df ordering, term tie-break, k cap") {
    val d = Seq((1L, "a b"), (2L, "b c"), (3L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabTopK(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got === List((1L, "b", 3L), (2L, "a", 1L)))
  }

  test("redactPii: positive path — emails and long digit runs actually replaced") {
    val d = Seq(
      (1L, "contact john.doe@example.com or call 5551234 ext 999"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((1L, 1L, md5hex("contact <EMAIL> or call <NUM> ext 999"))))
    assert(got(2L) === ((0L, 0L, md5hex("no pii here at all"))))
  }

  test("redactPii: email digits are not double-counted as digit runs") {
    val d = Seq((1L, "mail a1234567@host.org today")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(d).collect().head
    // the digit run lives inside the email; emails are replaced first, so the
    // redacted text has no <NUM> — but n_long_digit_runs counts the ORIGINAL
    // text (audit semantics), so it still reports 1.
    assert((r.getLong(1), r.getLong(2)) === ((1L, 1L)))
    assert(r.getString(3) === md5hex("mail <EMAIL> today"))
  }

  test("nearDupComponents: clusters = transitive closure; keep-one filter leaves one per cluster") {
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about spark engines running fast"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupComponents(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 0L))
    // the dedup filter: one representative per cluster
    val kept = got.filter { case (id, comp) => id == comp }.keySet
    assert(kept === Set(0L, 3L))
  }

  test("nearDupComponents: chain of near-dups collapses to one component (diameter > 1)") {
    // a-b and b-c are near-dups but a-c may not be: labels must propagate
    // transitively, not just one hop.
    val d = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 xx"),
      (12L, "w1 w2 w3 w4 w5 w6 w7 w8 yy xx")
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupComponents(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(10L))
  }

  test("sourceDivergence: zero for a single source, hand-computed two-source KL") {
    val single = Seq((1L, "a b c", "s1"), (2L, "a a", "s1")).toDF("doc_id", "text", "source")
    val z = TextAnalysis.sourceDivergence(single).collect()
    assert(z.map(r => (r.getString(0), r.getDouble(1))).toList === List(("s1", 0.0)))

    val two = Seq((1L, "a a b", "A"), (2L, "b", "B")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceDivergence(two).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // corpus: a=2 b=2 (N=4) -> Q(a)=Q(b)=0.5
    // KL(A) = 2/3 ln((2/3)/.5) + 1/3 ln((1/3)/.5) = 0.056633; KL(B) = ln 2
    assert(math.abs(got("A") - 0.056633) < 1e-6)
    assert(math.abs(got("B") - 0.693147) < 1e-6)
  }
}
