package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Total-order-preserving embedding of a `double` into a `long`:
  * `x < y  ⟺  sortableBits(x) < sortableBits(y)` under signed-long
  * comparison, for all finite doubles (IEEE-754 sort-key construction —
  * flip the sign bit of non-negatives, flip every bit of negatives;
  * equivalently `b ^ ((b >> 63) & Long.MaxValue)` on the raw bits, which
  * keeps the sign bit as the major key).
  *
  * This is the adapter that lets DOUBLE sort keys ride integer-only
  * bounded machinery — specifically [[graft.llmdata.Curation.KeepNSmallest]],
  * whose `Array[Long]` buffer gives constant-memory per-group top-n with
  * map-side combine. Without it, a per-group selection over a double key
  * needs a Window funnel (full sort + single reducer per group). The
  * mapping is exact — no fixed-point scaling, no precision loss — so
  * selection by embedded key is bit-identical to selection by the double
  * itself, and an external oracle ordering by the raw double agrees with
  * the engine selecting by the embedded long.
  *
  * Edge order (documented, not load-bearing for finite keys): `-0.0`
  * sorts strictly below `+0.0` (their bit patterns differ), and `NaN`
  * sorts above `+Infinity` (its exponent+mantissa bits exceed every
  * finite pattern). Null propagates as null.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sortable_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    b ^ ((b >> 63) & Long.MaxValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToLongBits($c);
         |${ev.value} = $b ^ (($b >> 63) & Long.MAX_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleSortableBits =
    copy(child = newChild)
}
