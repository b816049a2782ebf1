package graft.tools

import org.apache.spark.sql.SparkSession

/** Execute a registry query (bench session shape), then print the FINAL
  * adaptive plan — the one AQE actually ran, ReusedExchange/AQEShuffleRead
  * nodes included — plus wall time. `explain` alone shows only the
  * initial plan (`isFinalPlan=false`), which hides runtime exchange
  * reuse, so redundant-subtree diagnoses must come from here.
  *
  *   sbt "runMain graft.tools.FinalPlanProbe q126_inverted_cosine"
  */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // stage-level attribution: executor-run-time per stage for the LAST
    // rep of each query (fixed cost vs data cost, shuffle vs compute)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"run=${m.executorRunTime / 1e3}%7.2fs cpu=${m.executorCpuTime / 1e9}%7.2fs " +
          f"srMB=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f " +
          f"swMB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f " +
          f"inMB=${m.inputMetrics.bytesRead / 1e6}%8.1f  ${si.name.take(60)}")
      }
    })
    for (name <- args) {
      // warm pass + timed pass, so the plan/time reflect steady state
      val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
      var best = Double.MaxValue
      var last: org.apache.spark.sql.DataFrame = null
      // fn construction INSIDE the timed region — the Bench contract
      // (eager work at DataFrame build time, e.g. localCheckpoint
      // materialization, must be charged to the query)
      (1 to reps).foreach { i =>
        if (i == reps) stages.clear()
        val t0 = System.nanoTime()
        val df = graft.Registry.queries(name)(spark, sfDir)
        df.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        last = df
      }
      println(f"==== $name min-of-$reps%d = $best%.3f s ====")
      stages.forEach(s => println(s))
      stages.clear()
      println(last.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
