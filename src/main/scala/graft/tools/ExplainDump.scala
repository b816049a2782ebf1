package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.FormattedMode

/** Dump `explain("formatted")` of registry queries to files — the
  * optimization-round before/after plan evidence (plans/r21/):
  *
  *   sbt "runMain graft.tools.ExplainDump plans/r21 before q126_inverted_cosine ..."
  *
  * writes plans/r21/<query>_<tag>.txt per query. Same session shape as
  * the bench (local[32], UTC, AQE defaults) so the dumped plan is the
  * one the bench actually runs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.Registry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"DUMPED $n -> $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
