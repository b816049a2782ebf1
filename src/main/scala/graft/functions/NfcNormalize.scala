package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native codegen'd
  * expression — Spark ships no builtin for it, yet it is the FIRST step of
  * any honest text-canonicalization pipeline: the same visible string can
  * arrive composed (`é` = U+00E9) or decomposed (`e` + U+0301), and every
  * byte-level operator downstream — sha2 dedup keys, MinHash shingles,
  * vocabulary joins — treats those as distinct documents unless the corpus
  * is normalized first ([[graft.llmdata.Dedup.canonicalDedupGroups]],
  * q208).
  *
  * Delegates to `java.text.Normalizer` (the JDK's ICU-derived NFC, the
  * same canonical-composition tables DuckDB's `nfc_normalize` implements —
  * the q208 oracle certifies cross-engine agreement on the corpus, and
  * NfcNormalizeSpec pins the composed/decomposed cases byte-for-byte).
  * The fast path is free: `Normalizer.isNormalized` is O(n) with no
  * allocation and almost every real string IS already NFC, so the
  * expensive recomposition only runs on the rare decomposed input. A
  * UTF8String→String→UTF8String bridge is unavoidable (the JDK API is
  * char-based); the expression stays inside whole-stage codegen so there
  * is no iterator boundary around it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point. */
  def normalize(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(NfcNormalize(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
