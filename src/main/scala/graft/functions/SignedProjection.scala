package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The q194 Johnson–Lindenstrauss signed projection as ONE narrow codegen'd
  * expression: per input vector, all `k` reduced components in a single
  * pass — `out_j = Σ_i round(v_i, 6) · s(i,j) / √k` with the same
  * md5-parity ±1 signs the relational formulation derives. The point is the
  * plan shape: the posexplode → broadcast-sign-join → (vec, component)
  * hash-agg pipeline shuffles n·k rows; this expression is a pure
  * projection — at 100 TB the reduction becomes a map-only stage with NO
  * exchange at all (the [[ArrayDotProduct]] argument applied to a whole
  * operator). Similarity.jlProject keeps the relational form as the
  * cross-check twin (VectorOpsSpec-style parity pinned in
  * Round13OpsSpec); the DuckDB oracle is unchanged and bit-exact.
  *
  * Bit-exactness argument: round(v, 6) is quantized to integer MICRO-units
  * (HALF_UP via BigDecimal — Spark round()'s own rule) and the signed sum
  * runs in long arithmetic (≤ dims·10^9+ micros, far inside 2^63); the
  * final `(double) micros / 1e6` is an exact-by-exact IEEE division whose
  * correctly-rounded result equals the decimal→double cast the relational
  * form produces, and /√k with the default k=16 is an exact
  * power-of-two exponent shift. Signs are precomputed once per expression
  * instance for positions 0..MaxDims-1 (d×k longs — bytes, not a
  * broadcast).
  *
  * Edge note: a zero-length input array yields k exact zeros (the empty
  * sum), where the relational twin's posexplode yields no rows at all for
  * that vector — the expression is the more faithful algebra (the
  * projection of nothing is the origin); embeddings are fixed-width so
  * the case never arises in data, and the parity spec runs on real
  * vectors. */
case class SignedProjection(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 64, "k must be in [1, 64]")

  private def elemOf: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemOf match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_signed_project"

  @transient private lazy val signs: Array[Int] =
    SignedProjection.signMatrix(k)
  @transient private lazy val isFloat: Boolean = elemOf == FloatType

  override def nullSafeEval(input: Any): Any =
    SignedProjection.compute(input.asInstanceOf[ArrayData], k, signs, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[]")
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.SignedProjection.compute($arr, $k, $signsRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignedProjection {
  /** Positions beyond this many input dims are rejected (the sign matrix
    * is precomputed; embeddings here are 64-dim — 256 leaves headroom). */
  val MaxDims = 256

  /** ±1 for (pos, component), row-major [pos * k + j] — the parity of the
    * first hex digit of md5("jl:pos:j"), identical to Spark's md5() and
    * the DuckDB oracle's (both hash the UTF-8 bytes). */
  def signMatrix(k: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](MaxDims * k)
    var i = 0
    while (i < MaxDims) {
      var j = 0
      while (j < k) {
        md.reset()
        val digest = md.digest(s"jl:$i:$j".getBytes("UTF-8"))
        // first hex char = high nibble of byte 0
        val firstHexDigit = (digest(0) >> 4) & 0xf
        out(i * k + j) = if (firstHexDigit % 2 == 0) 1 else -1
        j += 1
      }
      i += 1
    }
    out
  }

  def compute(arr: ArrayData, k: Int, signs: Array[Int],
      isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    require(n <= MaxDims, s"input has $n dims; SignedProjection caps at $MaxDims")
    val acc = new Array[Long](k)
    var i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      // round(v, 6) in integer micro-units, Spark round()'s HALF_UP rule
      val micros = java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      val base = i * k
      var j = 0
      while (j < k) {
        acc(j) += micros * signs(base + j)
        j += 1
      }
      i += 1
    }
    val sqrtK = math.sqrt(k.toDouble)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      // exact-by-exact division equals the decimal->double cast; dividing
      // (not multiplying by the inverse) keeps non-power-of-4 k identical
      // to the relational form's / sqrt(k)
      out(j) = (acc(j).toDouble / 1e6) / sqrtK
      j += 1
    }
    new GenericArrayData(out)
  }
}
