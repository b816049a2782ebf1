package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Contracts for the rolling window-digest expression (q198's stage 1):
  * the rolling update must equal a direct per-window Horner evaluation,
  * and the consumer must reproduce the md5 variant's spans exactly. */
class WindowHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def direct(tokens: Seq[String], w: Int): Seq[Long] = {
    import WindowHashes._
    def fold(t: String, p: Long, b: Long): Long =
      t.codePoints().toArray.foldLeft(0L)((a, c) => (a * b + c) % p)
    if (tokens.length < w) Seq.empty
    else (0 to tokens.length - w).map { s =>
      val win = tokens.slice(s, s + w)
      val h1 = win.foldLeft(0L)((a, t) => (a * W1 + fold(t, P1, B1)) % P1)
      val h2 = win.foldLeft(0L)((a, t) => (a * W2 + fold(t, P2, B2)) % P2)
      (h1 << 31) | h2
    }
  }

  private def viaExpr(tokens: Seq[String], w: Int): Seq[Long] =
    Seq(Tuple1(tokens)).toDF("toks")
      .select(VectorOps.windowHashes(col("toks"), w).as("h"))
      .head().getSeq[Long](0).toSeq

  test("rolling update equals direct Horner evaluation on every window") {
    val toks = "the quick brown fox jumps over the lazy dog again and again".split(" ").toSeq
    for (w <- Seq(2, 3, 5, toks.length)) {
      assert(viaExpr(toks, w) === direct(toks, w), s"w=$w diverged")
    }
  }

  test("shorter-than-window and empty inputs yield empty arrays") {
    assert(viaExpr(Seq("a", "b"), 3) === Seq.empty)
    assert(viaExpr(Seq.empty, 2) === Seq.empty)
  }

  test("scalacheck: rolling equals direct for arbitrary tokens and window sizes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tokens across the edge space: empty strings, single chars, long
    // runs, multibyte — the rolling subtraction must stay exact under all
    val genToken = Gen.oneOf(
      Gen.const(""),
      Gen.alphaNumStr.map(_.take(12)),
      Gen.nonEmptyListOf(Gen.oneOf('é', '日', 'a', '0', ' ')).map(_.mkString))
    val genCase = for {
      n <- Gen.choose(0, 24)
      toks <- Gen.listOfN(n, genToken)
      w <- Gen.choose(1, 10)
    } yield (toks, w)
    val prop = Prop.forAllNoShrink(genCase) { case (toks, w) =>
      viaExpr(toks, w) == direct(toks, w)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, s"scalacheck failed: ${res.status}")
  }

  test("non-ASCII tokens fold by code point (DuckDB ascii() parity beyond ASCII)") {
    val toks = Seq("héllo", "wörld", "日本語", "plain")
    assert(viaExpr(toks, 2) === direct(toks, 2))
    // a multibyte token must hash differently from its byte-mangled twin
    assert(viaExpr(Seq("é", "x"), 2) !== viaExpr(Seq("e", "x"), 2))
  }

  test("identical windows at different offsets/documents collide (by design)") {
    val a = viaExpr(Seq("x", "shared", "run", "here", "y"), 3)
    val b = viaExpr(Seq("p", "q", "shared", "run", "here"), 3)
    assert(a(1) === b(2), "same 3-token window hashed differently")
  }

  test("SQL function registration: graft_window_hashes callable from SQL") {
    org.apache.spark.sql.GraftColumnBridge.registerGraftFunctions(spark)
    Seq(Tuple1(Seq("a", "b", "c"))).toDF("toks").createOrReplaceTempView("wh_t")
    val got = spark.sql("SELECT graft_window_hashes(toks, 2) AS h FROM wh_t")
      .head().getSeq[Long](0).toSeq
    assert(got === direct(Seq("a", "b", "c"), 2))
  }

  test("q198 spans equal the md5 variant's spans on the fixture") {
    import graft.llmdata.Dedup
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val md5Spans = Dedup.duplicatedSpans(docs)
    val rolling = Dedup.duplicatedSpansRolling(docs)
    assert(md5Spans.exceptAll(rolling).isEmpty && rolling.exceptAll(md5Spans).isEmpty,
      "rolling-digest spans diverged from the md5 baseline")
  }

  test("q198 finds the planted cross-doc quote at the exact offset (Round12 case)") {
    import graft.llmdata.Dedup
    val quote = (1 to 60).map(i => s"q$i").mkString(" ")
    val planted = Seq(
      (0L, s"alpha beta gamma $quote delta", "s", "en", 1L),
      (1L, s"$quote omega psi chi phi upsilon tau", "s", "en", 1L),
      (2L, (1 to 80).map(i => s"u$i").mkString(" "), "s", "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.duplicatedSpansRolling(planted, windowTokens = 8, minSpanTokens = 50)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 4L, 60L, 53L), (1L, 1L, 60L, 53L)))
  }
}
