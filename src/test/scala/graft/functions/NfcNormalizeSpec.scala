package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[NfcNormalize]] contracts the ASCII-only fixture corpus cannot
  * exercise: composed/decomposed unification, already-normalized identity
  * (including the zero-copy fast path), null propagation, and the
  * canonicalText pipeline built on it. The cross-engine agreement with
  * DuckDB's nfc_normalize is certified by the q208 oracle. All non-ASCII
  * is spelled as \u escapes so the source encoding can never corrupt the
  * fixtures under test.
  */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val composed = "Café"        // e-acute, one code point
  private val decomposed = "Café"     // e + combining acute

  test("decomposed input composes to the NFC form byte-for-byte") {
    val out = Seq(composed, decomposed).toDF("s")
      .select(NfcNormalize.normalize(col("s")).as("n"))
      .as[String].collect()
    assert(out(0) === composed && out(1) === composed)
    // and their dedup keys now collide
    val keys = Seq(composed, decomposed).toDF("s")
      .select(md5(NfcNormalize.normalize(col("s"))).as("k"))
      .as[String].collect()
    assert(keys(0) === keys(1))
  }

  test("already-NFC strings pass through unchanged (incl. empty and plain ASCII)") {
    val in = Seq("", "plain ascii text", composed, "你好")
    val out = in.toDF("s").select(NfcNormalize.normalize(col("s")).as("n"))
      .as[String].collect()
    assert(out.toSeq === in)
  }

  test("null propagates") {
    val out = Seq[Option[String]](None, Some(decomposed)).toDF("s")
      .select(NfcNormalize.normalize(col("s")).as("n")).collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) === composed)
  }

  test("interpreted eval agrees with the DataFrame (codegen) path") {
    import org.apache.spark.unsafe.types.UTF8String
    assert(NfcNormalize.nfc(UTF8String.fromString(decomposed)).toString === composed)
    val viaDf = Seq(decomposed).toDF("s")
      .select(NfcNormalize.normalize(col("s"))).as[String].head()
    assert(viaDf === composed)
  }

  test("canonicalText unifies case, spacing, and Unicode form") {
    val variants = Seq("  CAFÉ  du   monde ", "café du monde")
    val keys = variants.toDF("text")
      .select(graft.llmdata.Dedup.canonicalText(col("text")).as("c"))
      .as[String].collect()
    assert(keys(0) === keys(1), s"canonical forms differ: ${keys.toSeq}")
    assert(keys(0) === "café du monde")
  }

  test("graft_nfc is usable from SQL after runtime registration") {
    org.apache.spark.sql.GraftColumnBridge.registerGraftFunctions(spark)
    val r = spark.sql("SELECT graft_nfc('Café') AS n").head
    assert(r.getString(0) === composed)
  }
}
