package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling Karp–Rabin window digests over a token array — the
  * fixed-width upgrade of q184's md5-per-window digest stage that its
  * scaladoc promises for petabyte scale (Lee et al. 2022 use the same
  * rolling-hash construction): one O(n) pass per document computes ALL
  * stride-1 `windowTokens`-sized window hashes, where the md5 formulation
  * pays a concat + digest per window and ships 32-byte keys. Here each
  * window costs a constant handful of long multiplies (rolling update:
  * drop the left token's contribution, shift, add the right token's) and
  * the key is 8 bytes — smaller shuffle, codegen-resident arithmetic.
  *
  * Double-modulus construction, both 64-bit-overflow-safe AND
  * SQL-mirrorable (the reason NOT to use one 64-bit modulus: exact 128-bit
  * mulmod needs HUGEINT gymnastics in an oracle): per token a char-level
  * fold `(acc·B + byte) mod P` (q35's scheme), per window a second Horner
  * fold over token values with base W mod P, run for two independent
  * (P, B, W) parameter sets, packed as `h1 << 31 | h2` (both primes are
  * under 2^30, so the pack is lossless and fits a long). Per-pair
  * collision odds ~1/(P1·P2) ≈ 1e-18 — birthday-safe far past 100 TB
  * window counts; and because the oracle derives the IDENTICAL packed
  * values, cross-engine comparison is exact even at a collision.
  *
  * Token folds iterate Unicode CODE POINTS (not UTF-8 bytes), matching
  * DuckDB's `ascii()`-per-character fold on any corpus, not just ASCII
  * (identical on ASCII; spec-pinned). Windows shorter than the token
  * count yield an empty array. Null tokens cannot occur (split() output);
  * the eval guards anyway. The codegen path calls the same static loop the
  * interpreted path uses — the expression stays inside whole-stage codegen
  * (no lambda interpretation, no per-window allocation beyond the one
  * output array). */
case class WindowHashes(child: Expression, windowTokens: Int)
    extends UnaryExpression {
  require(windowTokens >= 1, "windowTokens must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[ArrayData], windowTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.WindowHashes.compute($arr, $windowTokens)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashes {
  // Two independent (prime, char base, window base) parameter sets; both
  // primes < 2^30 so every intermediate stays in 64-bit (max product is
  // tokenVal·W^(w-1) mod P pre-reduction ≈ P² ≈ 1e18 < 2^63) and the
  // packed pair fits a long.
  val P1 = 1000000007L; val B1 = 31L;  val W1 = 1000003L
  val P2 = 998244353L;  val B2 = 131L; val W2 = 1000033L

  private def foldCodePoints(t: UTF8String, p: Long, b: Long): Long = {
    val s = t.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * b + cp) % p
      i += java.lang.Character.charCount(cp)
    }
    acc
  }

  /** All stride-1 `w`-token window hashes of `arr`, packed double-modulus
    * longs; empty when the document is shorter than one window. */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val v1 = new Array[Long](n)
    val v2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) { v1(i) = 0L; v2(i) = 0L }
      else { v1(i) = foldCodePoints(t, P1, B1); v2(i) = foldCodePoints(t, P2, B2) }
      i += 1
    }
    // W^(w-1) mod P — the departing token's positional weight
    var pw1 = 1L; var pw2 = 1L
    i = 1
    while (i < w) { pw1 = pw1 * W1 % P1; pw2 = pw2 * W2 % P2; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < w) { h1 = (h1 * W1 + v1(i)) % P1; h2 = (h2 * W2 + v2(i)) % P2; i += 1 }
    out(0) = (h1 << 31) | h2
    var s = 1
    while (s <= n - w) {
      h1 = ((h1 - v1(s - 1) * pw1 % P1 + P1) % P1 * W1 + v1(s + w - 1)) % P1
      h2 = ((h2 - v2(s - 1) * pw2 % P2 + P2) % P2 * W2 + v2(s + w - 1)) % P2
      out(s) = (h1 << 31) | h2
      s += 1
    }
    new GenericArrayData(out)
  }
}
