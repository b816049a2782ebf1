package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The codegen'd [[ArrayDotProduct]] must be bit-identical to the
  * higher-order-function fold it replaces (same promotion to double, same
  * left-to-right accumulation) — it is the hot path of every similarity
  * query, and the DuckDB oracle parity of q45/q48 depends on the exact
  * IEEE sequence.
  */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 2f - 1f)

  test("graft_dot equals the HOF fold bit-for-bit on random float vectors") {
    val rows = Seq.fill(200)((vec(64), vec(64)))
    val df = rows.toDF("a", "b")
      .select(VectorOps.dot(col("a"), col("b")).as("fast"),
        VectorOps.hofDot(col("a"), col("b")).as("hof"))
    assert(df.filter(col("fast") =!= col("hof")).count() === 0)
  }

  test("graft_dot handles double arrays and mixed float/double") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(2.0, 0.5, -1.0))).toDF("f", "d")
    val r = df.select(
      VectorOps.dot(col("f").cast("array<double>"), col("d")).as("dd"),
      VectorOps.dot(col("f"), col("d")).as("fd")).head
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(r.getDouble(1) === r.getDouble(0))
  }

  test("graft_dot is null-safe on null arrays") {
    val df = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("graft_dot returns null on null array *elements*, matching the HOF fold") {
    // parquet-derived array schemas default to containsNull=true — a null
    // element must produce null (the HOF zip_with/aggregate value), not an
    // arbitrary accumulation. Exercises both codegen and interpreted paths.
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](2.0, 2.0, 2.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](2.0, 4.0))
    ).toDF("a", "b")
    val rows = df.select(VectorOps.dot(col("a"), col("b")).as("fast"),
      VectorOps.hofDot(col("a"), col("b")).as("hof")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && rows(1).getDouble(0) === 10.0)
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Literal.create(ArrayData.toArrayData(Array[Any](1.0, null)),
      ArrayType(DoubleType, containsNull = true))
    val b = Literal.create(ArrayData.toArrayData(Array[Any](2.0, 2.0)),
      ArrayType(DoubleType, containsNull = true))
    assert(ArrayDotProduct(a, b).eval(null) == null)
  }

  test("graft_dot matches interpreted eval (non-codegen path)") {
    // Force the interpreted path through a plan Catalyst won't codegen
    // end-to-end: literal arrays via eval on the expression itself.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Literal.create(ArrayData.toArrayData(Array(1.5f, -2.0f)), ArrayType(FloatType))
    val b = Literal.create(ArrayData.toArrayData(Array(2.0f, 3.0f)), ArrayType(FloatType))
    val got = ArrayDotProduct(a, b).eval(null).asInstanceOf[Double]
    assert(got === (1.5f.toDouble * 2.0f.toDouble + (-2.0f).toDouble * 3.0f.toDouble))
  }

  test("graft_dot is usable from SQL after runtime registration") {
    org.apache.spark.sql.GraftColumnBridge.registerGraftFunctions(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").head
    assert(r.getDouble(0) === 11.0)
  }

  test("scalar check: dot of known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0) === 32.0)
  }

  test("element-wise add and scale") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, -1.0f))).toDF("a", "b")
    val r = df.select(VectorOps.add(col("a"), col("b")).as("s"),
      VectorOps.scale(col("a"), lit(2.0)).as("k")).head
    assert(r.getSeq[Double](0) === Seq(4.0, 1.0))
    assert(r.getSeq[Double](1) === Seq(2.0, 4.0))
  }

  test("sortableBits preserves total order across signs, magnitudes, and zeros") {
    // strictly increasing double sequence spanning the edge cases the
    // embedding must keep ordered (incl. -0.0 < +0.0, denormals, infinities)
    val xs = Seq(Double.NegativeInfinity, -1e300, -42.5, -1.0, -1e-300,
      -0.0, 0.0, 1e-300, 1.0, 42.5, 1e300, Double.PositiveInfinity)
    val got = xs.zipWithIndex.toDF("x", "i")
      .select(col("i"), VectorOps.sortableBits(col("x")).as("b"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    assert(got.sliding(2).forall(p => p(0) < p(1)),
      s"embedding not strictly increasing: ${got.mkString(",")}")
    // codegen and interpreted paths agree
    for (x <- xs) {
      val interp = DoubleSortableBits(
        org.apache.spark.sql.catalyst.expressions.Literal(x)).eval(null)
      val viaDf = Seq(x).toDF("x").select(VectorOps.sortableBits(col("x"))).head.getLong(0)
      assert(interp === viaDf, s"interp/codegen divergence at $x")
    }
  }

  test("graft_sortable_bits is usable from SQL after runtime registration") {
    org.apache.spark.sql.GraftColumnBridge.registerGraftFunctions(spark)
    val r = spark.sql(
      "SELECT graft_sortable_bits(1.5D) > graft_sortable_bits(-2.5D) AS o").head
    assert(r.getBoolean(0))
  }
}
