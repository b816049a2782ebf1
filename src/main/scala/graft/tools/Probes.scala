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

/** Probe/pollute/probe sandwich for ANY registry query — the q64-drift
  * methodology (StreamProbe) generalized: time the probe query N times,
  * run the pollution queries (each N times, as the bench would), then
  * time the probe again IN THE SAME JVM. Box-level noise hits both
  * phases equally, so post-min >> pre-min isolates residue left by the
  * pollution (persisted/checkpointed blocks, codegen cache pressure)
  * from neighbor noise.
  *
  *   sbt "runMain graft.tools.SandwichProbe probe=q95_fuzzy_contamination \
  *        preq=q94_ipf_unrolled,q121_ipf_unrolled4 reps=3"
  */
object SandwichProbe {
  def main(args: Array[String]): Unit = {
    val opt = args.map(_.split("=")).collect { case Array(k, v) => k -> v }.toMap
    val probe = opt.getOrElse("probe", "q95_fuzzy_contamination")
    val preq = opt.get("preq").toSeq.flatMap(_.split(",")).filter(_.nonEmpty)
    val reps = opt.getOrElse("reps", "3").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, tag: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.Registry.queries(name)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$tag $name rows=$n t=$t%.2f s")
      t
    }
    // JVM warmup outside the measured phases
    spark.read.parquet(s"$dir/nation.parquet").count()
    val pre = (1 to reps).map(_ => time(probe, "PRE-PHASE"))
    preq.foreach { q => (1 to reps).foreach(_ => time(q, "POLLUTE")) }
    val post = (1 to reps).map(_ => time(probe, "POST-PHASE"))
    println(f"SANDWICH probe=$probe pre_min=${pre.min}%.2f post_min=${post.min}%.2f " +
      f"ratio=${post.min / pre.min}%.2f")
    spark.stop()
  }
}
