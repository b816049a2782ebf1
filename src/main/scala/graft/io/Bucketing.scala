package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed co-located joins — the storage-layout lever for repeated big
  * joins at 100 TB: when both fact tables are bucketed on the join key
  * with the same bucket count, the sort-merge join consumes the bucketing
  * as its required distribution, so the join runs with NO shuffle exchange
  * on either side (the remaining pre-join Sorts are partition-local over
  * co-located data — Spark ≥3.0 only trusts written bucket sort order
  * behind a legacy conf, and that sort is noise next to the eliminated
  * shuffle). At cluster scale this is the difference between re-shuffling
  * 100 TB per join and reading co-located buckets; BucketingSpec asserts
  * the exchange-free plan and the oracle checks the result equals the
  * plain-parquet join.
  *
  * The bucketed copies are external parquet tables under a scratch path,
  * written once per (session catalog, dir) and dropped with the JVM's
  * scratch cleanup ([[TempDirs]]); only the metadata lives in the session's
  * in-memory catalog (no Hive dependency).
  */
object Bucketing {

  private val NumBuckets = 8

  /** Catalog names carry a digest of the source dir: the existence check
    * below is the once-per-(catalog, dir) guard, and a name shared across
    * dirs would silently serve the first dir's data to every later one
    * (caught by RegistryEmptySpec driving the registry at a second dir). */
  private def name(base: String, dir: String): String = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${base}_$sfx"
  }

  /** Create (once per session catalog + dir) bucketed, sorted copies of
    * orders and lineitem keyed on the order key. */
  def ensureBucketed(spark: SparkSession, dir: String): Unit = synchronized {
    if (!spark.catalog.tableExists(name("graft_orders_bucketed", dir))) {
      val base = TempDirs.scratch("graft-bucketed")
      // repartition on the bucket key first: one writer task per bucket →
      // exactly one file per bucket, which is the condition under which
      // Spark trusts the sortBy metadata and elides the pre-join Sort
      // (and avoids the tasks×buckets small-file explosion at scale).
      spark.read.parquet(s"$dir/orders.parquet")
        .repartition(NumBuckets, col("o_orderkey"))
        .write.format("parquet")
        .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", base.resolve("orders").toString)
        .mode("overwrite").saveAsTable(name("graft_orders_bucketed", dir))
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(NumBuckets, col("l_orderkey"))
        .write.format("parquet")
        .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", base.resolve("lineitem").toString)
        .mode("overwrite").saveAsTable(name("graft_lineitem_bucketed", dir))
    }
  }

  /** The bucketed copies of (orders, lineitem) for `dir`, creating them if
    * needed — the table-resolution seam BucketingSpec drives directly. */
  def bucketedTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    ensureBucketed(spark, dir)
    (spark.table(name("graft_orders_bucketed", dir)),
      spark.table(name("graft_lineitem_bucketed", dir)))
  }

  /** Revenue per order priority through the bucketed join: the join on the
    * shared bucket key plans exchange-free on both sides (the one shuffle
    * left is the small post-join aggregation). Result is identical to the
    * plain-parquet join — bucketing is pure layout, never semantics. */
  def revenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    val (o, l) = bucketedTables(spark, dir)
    bucketedJoinPlan(o, l)
  }

  /** The join+agg itself, split out so the spec can drive it directly. */
  def bucketedJoinPlan(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
}
