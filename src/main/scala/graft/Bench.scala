package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * rounds.
  *
  * Min-of-reps still cannot defend against contention that spans the
  * WHOLE run: round 9's driver bench recorded ~2x inflation on nearly
  * every query (q43 18.7s vs 2.9s on a quiet machine) because another
  * process loaded the box for the full 13 minutes. Two defenses make
  * such a run self-labeling instead of masquerading as a regression:
  *
  *  - CANARY: one fixed cheap query (q01) is re-timed at the start,
  *    middle and end of the run. The contended flag uses two signals
  *    (threshold SPARK_GRAFT_CANARY_RATIO, default 2.0): the mid/end
  *    spread — both points run in an equally-warm JVM, so >2x between
  *    them means contention arrived or left DURING the run — and
  *    min(mid, end) vs the previous round's canary floor (scraped from
  *    the stored BENCH json), which catches the round-9 failure mode:
  *    contention spanning the WHOLE run, invisible to any intra-run
  *    comparison. The start point is emitted but informational — it
  *    carries residual JIT bias (~2-3x on a quiet box) that canary-only
  *    warmup cannot remove. Live-fire check (round 10, sf0.001): a 2x
  *    CPU-oversubscribed run measured mid=0.575/end=0.600 — intra-run
  *    spread a flat 1.04 — against a 0.130 stored floor: contended=true
  *    via the cross-round signal alone, exactly the round-9 mode.
  *  - SUSPECT LIST: each query's min is compared against the newest
  *    BENCH_r*.json in the working directory (values regex-scraped —
  *    the driver stores only the tail of long lines, so the file may
  *    hold a partial map). A query whose min exceeds 2x its previous
  *    value (and by >0.5s absolute, so sub-second jitter never flags)
  *    gets ONE extra interleaved re-timing at the end of the run — a
  *    transient spike washes out, a real regression survives into the
  *    emitted `suspect` array.
  *
  * Field order matters: the driver keeps only the TAIL of the run
  * output, so canary/suspect/headline fields come AFTER the 141-entry
  * queries map — a truncated capture still carries the verdict-bearing
  * fields. */
object Bench {
  /** Scrape "qNN_name":sec pairs out of a stored BENCH_r*.json. The driver
    * keeps only the TAIL of the bench line and stores it as an embedded JSON
    * string, so quotes may arrive escaped (\"q27_...\":0.349) and the map may
    * be partial — tolerate both rather than requiring valid JSON.
    * (BenchGuardSpec pins this against a real driver-truncated fixture.) */
  private[graft] def scrapeQueryTimes(txt: String): Map[String, Double] = {
    val qre = """"(q\d+_[A-Za-z0-9_]+)\\?":(-?\d+(?:\.\d+)?)""".r
    qre.findAllMatchIn(txt)
      .map(mm => mm.group(1) -> mm.group(2).toDouble)
      .filter(_._2 > 0).toMap
  }

  /** Per-query MIN across every stored round's scraped times. Each file may
    * be partial (driver tail-truncation), so a query's floor comes from
    * whichever rounds still carry it; a contended round can inflate but never
    * deflate a min, so one clean round anywhere in history pins the floor.
    * (BenchGuardSpec pins the contended-newer/clean-older case.) */
  private[graft] def minAcrossRounds(texts: Seq[String]): Map[String, Double] =
    texts.flatMap(scrapeQueryTimes).groupMapReduce(_._1)(_._2)(math.min)

  /** A query is suspect when its min exceeds 2x the previous round's value
    * AND by >0.5s absolute — the relative gate catches real regressions, the
    * absolute floor keeps sub-second jitter (a 0.1s -> 0.25s wobble) from
    * flagging. */
  private[graft] def suspectRule(cur: Double, prev: Double): Boolean =
    cur > 0 && prev > 0 && cur > 2 * prev && cur - prev > 0.5

  /** Scrape the previous round's canary mid/end out of a stored
    * BENCH_r*.json (same escaped-tail tolerance as [[scrapeQueryTimes]]). */
  private[graft] def scrapeCanaryFloor(txt: String): Option[Double] = {
    val re = """"mid\\?":(\d+(?:\.\d+)?),\\?"end\\?":(\d+(?:\.\d+)?)""".r
    re.findFirstMatchIn(txt).map(m =>
      math.min(m.group(1).toDouble, m.group(2).toDouble)).filter(_ > 0)
  }

  /** Contended when the two equally-warm canary points (mid, end) disagree
    * by more than `ratio` (contention arrived or left DURING the run), or
    * when their min sits `ratio` above the previous round's — the round-9
    * failure mode, contention spanning the WHOLE run, which no intra-run
    * comparison can see. The start point is informational only: it is
    * structurally inflated by residual JIT (measured ~2-3x on a quiet box
    * even after warm-until-stable), because the global warming the first
    * half of the suite provides cannot be replicated by canary-only
    * warmup. */
  private[graft] def contendedRule(mid: Double, end: Double,
      prevFloor: Option[Double], ratio: Double): Boolean = {
    val intra = math.max(mid, end) / math.max(math.min(mid, end), 1e-9)
    val cross = prevFloor.map(p => math.min(mid, end) / p).getOrElse(1.0)
    intra > ratio || cross > ratio
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
    // Warm the streaming micro-batch machinery the same way (round-15 q64
    // profiling): the settle path (MicroBatchExecution, state stores,
    // memory sink) reaches steady state only after ~4 executions — a
    // fresh-JVM q64 measures 7.4/3.0/2.4s then floors at ~1.6s — so
    // min-of-3 alone under-warms EVERY streaming query and reports
    // tiering cost as plan cost. Two untimed passes of the cheapest
    // settle query warm the shared path once for all ~35 streaming
    // entries; per-query pass 1 then completes the per-plan residue.
    try {
      SparkEntry.queries.get("q89_streaming_dedup")
        .foreach(f => (1 to 2).foreach(_ => f(spark, sfDir).count()))
    } catch { case _: Throwable => () }
    // Drain the ContextCleaner before the timed loop starts and again at
    // the canary points: Spark frees dead cached/broadcast/shuffle blocks
    // only when driver GC collects their weak refs, so without explicit
    // collection the residue of every cache-leaving query (ALS factors,
    // LSH features, checkpointed labels) stays resident and taxes the
    // tail of the run (the documented q64/q72/q76 drift mechanism —
    // "recovering as background cleanup drains"). An explicit GC is the
    // drain, scheduled, not left to heap pressure.
    def gcDrain(): Unit = {
      (1 to 2).foreach { _ => System.gc(); Thread.sleep(200) }
    }
    gcDrain()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)

    def timeOnce(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // ---- canary: fixed cheap query re-timed at start / middle / end ----
    val canaryName = "q01_pricing_summary"
    val canaryFn = SparkEntry.queries.get(canaryName)
    // Warm the canary's own plan UNTIL STABLE, not just once: C2 tiering
    // spans several executions, and a single warm pass left the start
    // point ~3x the mid/end on a QUIET machine (measured 0.60 vs 0.19s at
    // sf0.1) — a false "contended". Stop when two consecutive runs agree
    // within 25%, cap at 6 passes so a genuinely loaded box still gets
    // through to the (then honestly high) timed points.
    canaryFn.foreach { f =>
      try {
        var prev = timeOnce(f)
        var n = 1
        var stable = false
        while (!stable && n < 6) {
          val cur = timeOnce(f)
          stable = math.abs(cur - prev) / math.max(prev, 1e-9) < 0.25
          prev = cur; n += 1
        }
      } catch { case _: Throwable => () }
    }
    // Each canary point is a min-of-2: at small SF the canary runs ~0.2s and
    // single-shot scheduler jitter alone can fake a 1.8x spread; sustained
    // contention (the signal the canary exists for) inflates both runs.
    def canaryPoint(): Option[Double] =
      canaryFn.flatMap { f =>
        try Some(math.min(timeOnce(f), timeOnce(f)))
        catch { case _: Throwable => None }
      }
    val canaryStart = canaryPoint()

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val midIdx = ordered.size / 2
    var canaryMid: Option[Double] = None

    def timeQuery(name: String, fn: (SparkSession, String) => DataFrame,
                  nReps: Int): (Double, Option[String]) = {
      // nReps timed passes; first error aborts the query (later passes would
      // fail identically and re-timing a failure has no signal).
      var err: Option[String] = None
      def onePass(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            err = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val times = (1 to nReps).iterator.takeWhile(_ => err.isEmpty).map(_ => onePass()).toVector
      if (err.isDefined) return (-1.0, err)
      // Sub-3s plans are still C2-tiering after 3 executions (the
      // round-15/16 q41/q42 investigation: min-of-3 on a fresh path read
      // 0.50s against a 0.26s warm floor, and round-over-round "drift"
      // on these queries was warm-state variance, not plan cost): extend
      // with up to 3 more passes WHILE the min is still dropping >10%
      // per pass — the same warm-until-stable rule the canary uses. The
      // round-16 cutoff was <1s, which left the 1-2s bracket (q76/q95/
      // q49) showing the identical artifact one tier up (r16 verdict:
      // 1.5-1.9x their floors, same mechanism); <3s covers that bracket
      // while the genuinely heavy >=3s plans — past tiering by pass 3 —
      // are never extended, so the bench's total cost stays bounded
      // (worst case +3 passes on ~2s queries).
      var best = times.min
      var extra = 0
      var improving = true
      while (err.isEmpty && improving && best < 3.0 && extra < 3) {
        val t = onePass()
        improving = t < best * 0.9
        if (t < best) best = t
        extra += 1
      }
      (if (err.isDefined) -1.0 else best, err)
    }

    val threeQuarterIdx = ordered.size * 3 / 4
    val firstPass = ordered.zipWithIndex.map { case ((name, fn), i) =>
      if (i == midIdx) { gcDrain(); canaryMid = canaryPoint() }
      // second drain ahead of the tail stretch (lexically q3x-q9x — the
      // oldest, cheapest queries sit AFTER every q1xx/q2xx heavy, so they
      // run under maximum accumulated residue)
      if (i == threeQuarterIdx) gcDrain()
      val (best, err) = timeQuery(name, fn, reps)
      (name, best, err)
    }
    val canaryEnd = canaryPoint()

    // ---- suspects: compare against the per-query MIN across ALL stored
    // BENCH_r*.json files. Scraping only the newest file laundered real
    // regressions under a contaminated baseline: round 9's file was recorded
    // under whole-run contention (q43 18.7s vs 2.7s quiet), so round 10's
    // 2x-inflated values all passed vs that inflated baseline. The min
    // across every stored round is the same estimator the per-query
    // min-of-reps already argues: noise is strictly additive, so the
    // cross-round minimum is the best available quiet-machine floor. The
    // canary floor uses the identical rule for the same reason.
    val benchTexts: Seq[(String, String)] = {
      val re = """BENCH_r(\d+)\.json""".r
      val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .flatMap { f => f.getName match {
          case re(n) => Some((n.toInt, f)); case _ => None } }
      files.sortBy(_._1).toSeq.flatMap { case (_, f) =>
        try {
          val src = scala.io.Source.fromFile(f, "UTF-8")
          Some((f.getName, try src.mkString finally src.close()))
        } catch { case _: Throwable => None }
      }
    }
    val prevCanaryFloor: Option[Double] = {
      val floors = benchTexts.flatMap { case (_, txt) => scrapeCanaryFloor(txt) }
      if (floors.isEmpty) None else Some(floors.min)
    }
    val prev: Option[(String, Map[String, Double])] = {
      val merged = minAcrossRounds(benchTexts.map(_._2))
      if (merged.isEmpty) None
      else Some((s"min-of-${benchTexts.size}-rounds(${benchTexts.head._1}..${benchTexts.last._1})", merged))
    }
    def isSuspect(name: String, cur: Double): Boolean =
      prev.exists(_._2.get(name).exists(p => suspectRule(cur, p)))

    // One extra interleaved rep for first-pass suspects: run at the end of
    // the bench, when a transient spike has likely passed; keep the min.
    val results = firstPass.map { case (name, best, err) =>
      if (err.isEmpty && isSuspect(name, best)) {
        val (retry, rerr) = timeQuery(name, ordered.toMap.apply(name), 1)
        if (rerr.isEmpty && retry > 0) (name, math.min(best, retry), err)
        else (name, best, err)
      } else (name, best, err)
    }
    val suspects = results.collect { case (n, v, None) if isSuspect(n, v) => n }

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
    val canaryJson = (canaryStart, canaryMid, canaryEnd) match {
      case (Some(a), Some(b), Some(c)) =>
        val spread = math.max(b, c) / math.max(math.min(b, c), 1e-9)
        val ratioGate = sys.env.getOrElse("SPARK_GRAFT_CANARY_RATIO", "2.0").toDouble
        val floorJson = prevCanaryFloor.map(ms).getOrElse("null")
        s"""{"query":"$canaryName","start":${ms(a)},"mid":${ms(b)},"end":${ms(c)},""" +
          s""""spread":${ms(spread)},"prev_floor":$floorJson,""" +
          s""""contended":${contendedRule(b, c, prevCanaryFloor, ratioGate)}}"""
      case _ => "null"
    }
    val suspectJson = suspects.map(n => s"\"${esc(n)}\"").mkString("[", ",", "]")
    val suspectVs = prev.map(p => s"\"${esc(p._1)}\"").getOrElse("null")
    // Headline fields LAST: under tail-truncation the queries map loses its
    // head, but canary/suspect/metric/value/timing/errors_count stay inside
    // the window, so a truncated capture still carries the comparable
    // numbers AND the contention verdict.
    println(s"""{"queries":$qs,"errors":$errs,"sf":"$sfDir",""" +
      s""""canary":$canaryJson,"suspect":$suspectJson,"suspect_vs":$suspectVs,""" +
      s""""metric":"total","unit":"sec","timing":"min-of-$reps",""" +
      s""""errors_count":$nFailed,"value":$total}""")
    spark.stop()
  }
}
