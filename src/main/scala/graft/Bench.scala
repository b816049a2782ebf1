package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A failing query is
  * reported loudly — elapsed -1 plus an `errors` map entry — never
  * silently benched as fast.
  *
  * Each query is timed SPARK_GRAFT_REPS times (default 3) and the
  * per-query MINIMUM is reported. Single-pass timings on a shared box
  * recorded 3-6x phantom regressions from GC/JIT/neighbor noise; the
  * round-5 median-of-3 still recorded 14x phantoms (q85 73s vs 4.9s
  * quiet, q60 37s vs 2.9s) when contention spanned all three passes.
  * Scheduler/neighbor noise is strictly additive, so the minimum is
  * the best estimator of intrinsic plan cost — the quiet-machine
  * number rounds are compared on (same rationale as Python timeit's
  * repeat-min). Queries that populate intra-JVM caches (ALS model,
  * streaming staging) pay that cost in pass 1 only; the min then
  * reflects steady-state cost, which is the comparable signal across
  * rounds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    // Warm the JVM (codegen, parquet reader, shuffle machinery) outside the
    // timed region so the first query measures its plan, not JIT startup.
    try {
      spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count().collect()
      spark.range(1000).selectExpr("sum(id)").collect()
    } catch { case _: Throwable => () }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // reps timed passes; first error aborts the query (later passes would
      // fail identically and re-timing a failure has no signal).
      var err: Option[String] = None
      val times = (1 to reps).iterator.takeWhile(_ => err.isEmpty).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            err = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
        (System.nanoTime() - t0) / 1e9
      }.toVector
      val best =
        if (err.isDefined) -1.0
        else times.min
      (name, best, err)
    }
    // Per-query times rounded to ms: the sub-ms digits are pure noise and
    // the shorter line matters — the driver keeps only the TAIL of the run
    // output, and a 91-query line at nanosecond precision pushed past its
    // window every round (BENCH_r03..r07 all record parsed:null).
    // Locale.ROOT pins the '.' decimal separator — the default-locale
    // formatter emits "0,123" under comma-decimal locales (e.g. de_DE),
    // which is invalid JSON.
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => s"\"${esc(k)}\":${ms(v)}" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"${esc(k)}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._3.isDefined)
    // A failed query would shrink a success-only total below a clean run's —
    // a regression-masking "speedup". With any failure the total is null so
    // a gate comparing totals alone cannot misread the run as faster.
    val total =
      if (nFailed > 0) "null"
      else ms(results.collect { case (_, v, None) => v }.sum)
    // Headline fields LAST: under tail-truncation the queries map loses its
    // head, but metric/value/timing/errors_count stay inside the window, so
    // a truncated capture still carries the comparable numbers.
    println(s"""{"queries":$qs,"errors":$errs,"sf":"$sfDir",""" +
      s""""metric":"total","unit":"sec","timing":"min-of-$reps",""" +
      s""""errors_count":$nFailed,"value":$total}""")
    spark.stop()
  }
}
