package graft.tools
import org.apache.spark.sql.SparkSession

/** One-line plan-shape summary per query (scan/shuffle/broadcast/Expand/
  * BNLJ node counts) — the quick pre-commit sanity check between full
  * PlanAudit regenerations:
  *   sbt "runMain graft.tools.PlanPeek q197_trusted_dedup q202_table_profile"
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val plan = graft.Registry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      val exch = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Broadcast"))
      val bcast = plan.linesIterator.count(_.contains("BroadcastExchange"))
      val expand = plan.linesIterator.count(_.contains("Expand"))
      val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      println(s"PEEK $q scans=$scans shuffles=$exch broadcasts=$bcast expands=$expand bnlj=$bnlj")
    }
    spark.stop()
  }
}
