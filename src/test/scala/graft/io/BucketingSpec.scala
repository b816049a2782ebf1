package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The bucketing claim, asserted: a join of two tables bucketed on the join
  * key with equal bucket counts plans with NO shuffle exchange on either
  * input — and returns exactly the plain-parquet join's numbers (layout,
  * not semantics). The partition-local pre-join Sorts remain: since 3.0
  * Spark only trusts written bucket sort order behind a legacy conf
  * (multi-file buckets made it unsound), and a per-bucket sort of
  * co-located data is noise next to the 100 TB shuffle the bucketing
  * eliminates. The merge hint forces the sort-merge path the claim is
  * about (at this SF the small side would otherwise broadcast; at 100 TB
  * neither side broadcasts and SMJ-over-buckets is the default). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join: no Exchange on the join inputs; parity with plain join") {
    val (o, l) = Bucketing.bucketedTables(spark, TestSpark.sfDir)
    val joined = l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan did not use the bucketing:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")

    val got = Bucketing.revenueByPriority(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val dir = TestSpark.sfDir
    val exp = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === exp)
  }
}
