package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ipf.Ipf
import graft.matrix.CooMatrix

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: IPF cost allocation on the sf0.001 lineitem COO —
    * distribute each part's revenue across ship months proportional to
    * shipped quantity (the reference's search-ads allocation re-keyed to
    * the testdata; SURVEY.md §7.2). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val seed = CooMatrix(
      li.groupBy(col("l_partkey").as(CooMatrix.Row),
          month(col("l_shipdate")).cast("long").as(CooMatrix.Col))
        .agg(sum("l_quantity").as(CooMatrix.Value)))
    val x = li.groupBy(col("l_partkey").as(CooMatrix.Idx))
      .agg(sum("l_extendedprice").as(CooMatrix.Value))
    val y = li.groupBy(month(col("l_shipdate")).cast("long").as(CooMatrix.Idx))
      .agg(sum("l_extendedprice").as(CooMatrix.Value))
    val result = Ipf.converge(x, y, seed, threshold = 1e-9, maxIter = 20)
    result.matrix.df.select(
      col(CooMatrix.Row).as("l_partkey"),
      col(CooMatrix.Col).as("ship_month"),
      col(CooMatrix.Value).as("allocated_cost"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ north-star
    * extensions). See [[Registry]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** DuckDB-equivalent SQL for every hash-checkable query; non-SQL ops
    * (iterative IPF, LSH, ALS, mapPartitions decode) are rows-only. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
