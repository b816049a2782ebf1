package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probes: time or dump individual registry queries without running the
  * whole Verify/Bench mains.
  *
  *   sbt "runMain graft.tools.TimeProbe q48_embedding_neardup"
  *   sbt "runMain graft.tools.DumpProbe /root/testdata/sf0.01 /tmp/out q48_embedding_neardup"
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = graft.Registry.queries(name)(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
      println(f"TIMING $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

object DumpProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names @ _*) = args.toSeq.toArray
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      graft.Registry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"DUMPED $n")
    }
    spark.stop()
  }
}
