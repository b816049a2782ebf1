package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[KmvSketch]] contracts beyond the q293 cross-engine oracle: exact
  * bottom-k semantics vs a reference fold, partition-invariance (the
  * merge path), serialization round-trip, duplicate collapse, null skip,
  * the ObjectHashAggregate partial+final plan shape, SQL registration,
  * and the estimator's accuracy envelope.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refBottomK(xs: Seq[String], k: Int): Seq[String] =
    xs.map(s => KmvSketch.md5Hex(s.getBytes("UTF-8"))).distinct.sorted.take(k)

  test("sketch equals the exact bottom-k distinct md5 fold") {
    val xs = (0 until 500).map(i => s"doc-$i") ++ (0 until 100).map(i => s"doc-$i")
    val got = xs.toDF("s").agg(KmvSketch.kmv(col("s"), 16).as("ks"))
      .select(col("ks")).as[Seq[String]].head()
    assert(got === refBottomK(xs, 16))
  }

  test("partition-invariance: 1 vs 13 partitions produce the identical sketch (merge path)") {
    val xs = (0 until 1000).map(i => s"row-$i")
    val one = xs.toDF("s").coalesce(1)
      .agg(KmvSketch.kmv(col("s"), 32).as("ks")).as[Seq[String]].head()
    val many = xs.toDF("s").repartition(13)
      .agg(KmvSketch.kmv(col("s"), 32).as("ks")).as[Seq[String]].head()
    assert(one === many && one === refBottomK(xs, 32))
  }

  test("duplicates collapse and nulls are skipped; fewer distincts than k returns all") {
    val got = Seq(Some("a"), Some("b"), Some("a"), None, Some("b"), None)
      .toDF("s").agg(KmvSketch.kmv(col("s"), 16).as("ks"))
      .as[Seq[String]].head()
    assert(got === refBottomK(Seq("a", "b"), 16))
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = KmvSketch(
      org.apache.spark.sql.GraftColumnBridge.expression(lit("x")), 8)
    val buf = agg.createAggregationBuffer()
    Seq("p", "q", "r").foreach(s =>
      KmvSketch.insertBounded(buf, KmvSketch.md5Hex(s.getBytes("UTF-8")), 8))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
  }

  test("insertBounded keeps only the k smallest and rejects above-threshold values in O(1)") {
    val set = new java.util.TreeSet[String]()
    val hs = (0 until 50).map(i => KmvSketch.md5Hex(s"v$i".getBytes("UTF-8")))
    hs.foreach(h => KmvSketch.insertBounded(set, h, 5))
    assert(set.size === 5)
    assert(set.toArray.toSeq === hs.distinct.sorted.take(5))
  }

  test("plan lands on ObjectHashAggregate with a partial and a final graft_kmv stage") {
    val df = (0 until 100).map(i => (i % 3, s"t$i")).toDF("g", "s")
      .groupBy("g").agg(KmvSketch.kmv(col("s"), 8).as("ks"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("partial_graft_kmv|partial graft_kmv|Partial".r
      .findFirstIn(plan).isDefined, plan)
    assert("graft_kmv".r.findAllIn(plan).size >= 2, plan)
  }

  test("SQL surface: graft_kmv callable from spark.sql after runtime registration") {
    org.apache.spark.sql.GraftColumnBridge.registerGraftFunctions(spark)
    (0 until 40).map(i => s"s$i").toDF("s").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT graft_kmv(s, 4) AS ks FROM kmv_in")
      .as[Seq[String]].head()
    spark.catalog.dropTempView("kmv_in")
    assert(got === refBottomK((0 until 40).map(i => s"s$i"), 4))
  }

  test("estimator envelope: k=64 estimate within 35% of the true distinct count") {
    val n = 5000
    val xs = (0 until n).map(i => s"uniq-$i")
    val ks = xs.toDF("s").agg(KmvSketch.kmv(col("s"), 64).as("ks"))
      .as[Seq[String]].head()
    val frac = java.lang.Long.parseLong(ks.last.take(13), 16).toDouble / (1L << 52)
    val est = 63.0 / frac
    assert(math.abs(est - n) / n < 0.35, s"est=$est true=$n")
  }
}
