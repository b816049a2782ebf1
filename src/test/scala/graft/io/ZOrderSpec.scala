package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[ZOrder]] pins: hand-computed Morton codes, the locality win of
  * z-clustering over single-column sorting, and the clusterByZ writer
  * path. Cross-engine arithmetic agreement is the q210 oracle. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed Morton codes") {
    // interleave(x=0b101, y=0b011) = y2x2 y1x1 y0x0 = 0b011011 reading
    // x bits at even, y bits at odd positions:
    // x=5 -> bits 1,0,1 at pos 4,2,0 = 0b010001(17); wait compute directly:
    // spread(5)=0b010001=17, spread(3)=0b000101=5 -> z = 17 | (5<<1) = 27
    val rows = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 1L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z")).as[Long].collect()
    assert(rows(0) === 27L)
    assert(rows(1) === 0L)
    assert(rows(2) === 0x55555555L) // all even bits
    assert(rows(3) === 0xAAAAAAAAL) // all odd bits
    assert(rows(4) === 3L)          // bit0 of each
  }

  test("z-buckets have tight extents on BOTH dimensions") {
    val stats = ZOrder.layoutStats(spark, TestSpark.sfDir)
      .withColumn("x_span", col("x_max") - col("x_min"))
      .withColumn("y_span", col("y_max") - col("y_min"))
    val agg = stats.agg(avg(col("x_span")).as("ax"), avg(col("y_span")).as("ay"),
      max(col("x_max")).as("gx"), max(col("y_max")).as("gy")).head
    val (ax, ay, gx, gy) = (agg.getDouble(0), agg.getDouble(1),
      agg.getLong(2).toDouble, agg.getLong(3).toDouble)
    // mean per-bucket span must beat the global span on both dims — the
    // property single-column sorting cannot give the second dimension
    assert(ax < gx / 2, s"x locality weak: mean span $ax vs global $gx")
    assert(ay < gy / 2, s"y locality weak: mean span $ay vs global $gy")
  }

  test("clusterByZ preserves rows and range-partitions by z") {
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val out = ZOrder.clusterByZ(li, col("l_partkey"), col("l_suppkey"), 8)
    assert(out.count() === li.count())
    assert(out.columns.toSeq === li.columns.toSeq, "layout op changed the schema")
    // each partition's z-range must be disjoint (range partitioning):
    // partition-wise [min,max] intervals must not overlap
    val z = ZOrder.zValue(pmod(col("l_partkey"), lit(65536L)),
      pmod(col("l_suppkey"), lit(65536L)))
    val perPart = out.withColumn("__z", z)
      .withColumn("__p", spark_partition_id())
      .groupBy("__p").agg(min("__z").as("lo"), max("__z").as("hi"))
      .orderBy("lo").collect()
    val nonEmpty = perPart.filter(_ => true)
    nonEmpty.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"partition z-ranges overlap: ${a} vs ${b}")
      case _ =>
    }
  }
}
