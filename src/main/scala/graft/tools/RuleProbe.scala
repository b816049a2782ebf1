package graft.tools
import org.apache.spark.sql.SparkSession
object RuleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val naive = graft.plans.RangeJoinBucketRule.naiveNearbyOrderCounts(spark, dir, 172800000L)
    val naivePlan = naive.queryExecution.executedPlan.toString
    println("NAIVE bnlj=" + naivePlan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")))
    val expected = naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val opt = graft.plans.RangeJoinBucketRule.nearbyOrderCounts(spark, dir)
    val p = opt.queryExecution.executedPlan.toString
    println("OPT bnlj=" + p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      + " generate=" + p.linesIterator.count(_.contains("Generate")))
    val got = opt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println("equal=" + (got == expected) + " rows=" + got.size)
    spark.stop()
  }
}
