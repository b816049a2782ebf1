package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd Σ aᵢ·bᵢ over two `array<float|double>` columns.
  *
  * Arithmetic is bit-identical to the higher-order-function formulation
  * `aggregate(zip_with(cast(a), cast(b), _*_), 0d, _+_)` — each element is
  * promoted to double (exact for float), multiplied, and accumulated in
  * left-to-right array order — but runs as a tight generated loop with no
  * per-row array allocation and no lambda interpretation. On the all-pairs
  * similarity path (O(n²) evaluations) this is the hot spot: the HOF
  * version allocates a 64-slot intermediate array per pair and is excluded
  * from whole-stage codegen; this expression stays inside the generated
  * stage.
  *
  * Lengths are reduced to the shorter array (embeddings are fixed-width so
  * this never triggers in practice). A null array *element* makes the
  * result null — the same value the HOF formulation produces (null
  * propagates through `zip_with` multiply and `aggregate` add); the guard
  * is generated only when the input type admits null elements, so the
  * common containsNull=false loop stays branch-free.
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (elemOf(left), elemOf(right)) match {
    case (FloatType | DoubleType, FloatType | DoubleType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    super.nullable || elemNullable(left) || elemNullable(right)
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemOf(left) == FloatType
    val rf = elemOf(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, t: DataType): String =
      if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val lt = elemOf(left)
    val rt = elemOf(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullGuard =
        if (elemNullable(left) || elemNullable(right))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += ${get(a, i, lt)} * ${get(b, i, rt)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
