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
    // gc=true: drain the ContextCleaner before the post phase — Spark
    // frees pollution residue (unpersisted blocks, dead broadcasts,
    // shuffle files) only when the driver GC collects the weak refs, so
    // an explicit GC separates "residue the runtime would reclaim" from
    // a real cost regression
    if (opt.get("gc").contains("true")) {
      (1 to 3).foreach { _ => System.gc(); Thread.sleep(500) }
      println("GC drained")
    }
    val post = (1 to reps).map(_ => time(probe, "POST-PHASE"))
    println(f"SANDWICH probe=$probe pre_min=${pre.min}%.2f post_min=${post.min}%.2f " +
      f"ratio=${post.min / pre.min}%.2f")
    spark.stop()
  }
}

/** Per-sweep cost decomposition for the q26 IPF convergence loop: times
  * Ipf.converge on the exact q26 inputs across maxIter in {2,4,8} (per-sweep
  * marginal cost = slope) and across loss-barrier/checkpoint knob settings,
  * so drift in the slowest bench query is attributable to a phase, not just
  * observed. Run warm: the first full loop is executed untimed.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.IpfSweepProbe"
  */
object IpfSweepProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.matrix.CooMatrix
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val seed = CooMatrix(li.groupBy(col("l_partkey").as(CooMatrix.Row),
        month(col("l_shipdate")).cast("long").as(CooMatrix.Col))
      .agg(sum("l_quantity").as(CooMatrix.Value)))
    val x = li.groupBy(col("l_partkey").as(CooMatrix.Idx))
      .agg(sum("l_extendedprice").as(CooMatrix.Value))
    val y = li.groupBy(month(col("l_shipdate")).cast("long").as(CooMatrix.Idx))
      .agg(sum("l_extendedprice").as(CooMatrix.Value))
    def run(maxIter: Int, ckEvery: Int, lossEvery: Int): Double = {
      val t0 = System.nanoTime()
      val r = graft.ipf.Ipf.converge(x, y, seed, threshold = 1e-9,
        maxIter = maxIter, checkpointEvery = ckEvery, lossEvery = lossEvery)
      r.matrix.df.count()
      (System.nanoTime() - t0) / 1e9
    }
    run(8, 2, 5) // JIT/caches warmup, untimed
    // NOTE: checkpointEvery must stay small — each un-checkpointed sweep
    // DOUBLES the self-joining fitRows plan (2^k leaves), so e.g. ckEvery=8
    // explodes planning time; that regime is measured in the q121 history
    // (commit 4963598), not here.
    for ((mi, ck, le) <- Seq((2, 2, 5), (4, 2, 5), (8, 2, 5), (8, 2, 1),
        (8, 2, 100), (8, 1, 5))) {
      val t = run(mi, ck, le)
      println(f"IPFPROBE maxIter=$mi ckEvery=$ck lossEvery=$le t=$t%.2f s perSweep=${t / mi}%.2f")
    }
    spark.stop()
  }
}
