package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Contracts for the custom top-k physical operator: the plan really is
  * exchange → TopKPerGroupExec (no Sort, no Window), results equal the
  * window spelling including ties, and k beyond the group size keeps
  * whole groups. */
class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plan is exchange -> TopKPerGroupExec: no Sort, no Window") {
    val df = TopKPerGroup.topOrdersPerCustomer(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    assert(!plan.contains("Sort "), s"a sort defeats the operator's point:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      "the required clustered distribution must surface as one hash exchange")
  }

  test("equals the row_number window spelling on the orders table") {
    val got = TopKPerGroup.topOrdersPerCustomer(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val exp = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("property: random data with heavy ties matches brute force; k covers small groups") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(400)((rnd.nextInt(12).toLong,
      rnd.nextInt(5).toDouble, rnd.nextLong(1000000L)))
    val df = rows.toDF("g", "v", "id")
    for (k <- Seq(1, 3, 50)) {
      val got = TopKPerGroup.topK(df, Seq("g"), Seq(("v", false), ("id", true)), k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val exp = rows.groupBy(_._1).values.flatMap(g =>
        g.sortBy(t => (-t._2, t._3)).take(k)).toSet
      assert(got === exp, s"k=$k mismatch")
    }
  }
}
