package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Contracts for [[RangeJoinBucketRule]]: the rewrite must be exactly
  * lossless on arbitrary signed inputs (truncating-division buckets ±1
  * absorb the floor/trunc disagreement around zero), must actually
  * remove the BroadcastNestedLoopJoin, must not re-fire on its own
  * output, and must leave joins that already carry an equi key alone. */
class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val saved = spark.experimental.extraOptimizations
    RangeJoinBucketRule.installedIn(spark)
    try f finally spark.experimental.extraOptimizations = saved
  }

  /** Control arm: the rule may already be session-installed (any test
    * that touched the q245 registry entry installs it permanently), so
    * strip it explicitly for the naive plan. */
  private def withoutRule[A](f: => A): A = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == RangeJoinBucketRule)
    try f finally spark.experimental.extraOptimizations = saved
  }

  test("rewritten plan drops the BNLJ and gains the bucket Generate; results identical") {
    val dir = TestSpark.sfDir
    val expected = withoutRule {
      val naive = RangeJoinBucketRule.naiveNearbyOrderCounts(spark, dir, 172800000L)
      assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
        "control arm no longer BNLJs — the rule demo is vacuous")
      naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // queryExecution is lazy — optimization must happen while the rule is
    // still installed, so everything plan-touching stays inside withRule
    val got = withRule {
      val opt = RangeJoinBucketRule.nearbyOrderCounts(spark, dir)
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), "rule did not fire")
      assert(plan.contains("Generate"), "bucket expansion missing")
      opt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("property: lossless on random SIGNED longs, boundary-inclusive") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val t = Seq(7L, 10L, 1000L)(trial % 3)
      val as = Seq.fill(120)(rnd.nextLong(8L * t) - 4L * t)
      val bs = Seq.fill(120)(rnd.nextLong(8L * t) - 4L * t) ++
        as.take(5).map(_ + t) ++ as.take(5).map(_ - t)  // exact-boundary pairs
      val la = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ida", "va")
      val lb = bs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("idb", "vb")
      val got = withRule {
        la.join(lb, abs(col("va") - col("vb")) <= lit(t))
          .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val brute = (for {
        (a, i) <- as.zipWithIndex; (b, j) <- bs.zipWithIndex
        if math.abs(a - b) <= t
      } yield (i.toLong, j.toLong)).toSet
      assert(got === brute, s"trial $trial (T=$t): rewrite lost or invented pairs")
      assert(brute.nonEmpty)
    }
  }

  test("BETWEEN / two-conjunct spelling fires and is lossless (incl. asymmetric bounds)") {
    val rnd = new scala.util.Random(7)
    val as = Seq.fill(150)(rnd.nextLong(4000L) - 2000L)
    val bs = Seq.fill(150)(rnd.nextLong(4000L) - 2000L) ++
      as.take(5).map(_ + 10L) ++ as.take(5).map(_ - 25L)  // boundary pairs
    val la = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ida", "va")
    val lb = bs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("idb", "vb")
    withRule {
      // symmetric BETWEEN
      val sym = la.join(lb, col("va").between(col("vb") - 10L, col("vb") + 10L))
      assert(sym.queryExecution.optimizedPlan.toString.contains("__graft_rb_l"),
        "rule did not fire on the BETWEEN spelling")
      assert(!sym.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      val gotSym = sym.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expSym = (for {
        (a, i) <- as.zipWithIndex; (b, j) <- bs.zipWithIndex
        if a >= b - 10L && a <= b + 10L
      } yield (i.toLong, j.toLong)).toSet
      assert(gotSym === expSym && expSym.nonEmpty)
      // asymmetric two-conjunct: vb − 25 ≤ va ≤ vb + 10 (W = 25)
      val asym = la.join(lb, col("va") >= col("vb") - 25L && col("va") <= col("vb") + 10L)
      assert(asym.queryExecution.optimizedPlan.toString.contains("__graft_rb_l"),
        "rule did not fire on the asymmetric two-conjunct spelling")
      val gotAsym = asym.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expAsym = (for {
        (a, i) <- as.zipWithIndex; (b, j) <- bs.zipWithIndex
        if a >= b - 25L && a <= b + 10L
      } yield (i.toLong, j.toLong)).toSet
      assert(gotAsym === expAsym && expAsym.nonEmpty)
      // difference spelling: va − vb ≤ 10 AND vb − va ≤ 10
      val diff = la.join(lb, (col("va") - col("vb")) <= lit(10L) &&
        (col("vb") - col("va")) <= lit(10L))
      assert(diff.queryExecution.optimizedPlan.toString.contains("__graft_rb_l"),
        "rule did not fire on the explicit-difference spelling")
      assert(diff.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === expSym)
    }
  }

  test("strict < spelling fires and keeps the strict residual") {
    val as = Seq(0L, 5L, 10L, 15L)
    val bs = Seq(0L, 5L, 10L, 20L)
    val la = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ida", "va")
    val lb = bs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("idb", "vb")
    withRule {
      val strict = la.join(lb, abs(col("va") - col("vb")) < lit(5L))
      assert(strict.queryExecution.optimizedPlan.toString.contains("__graft_rb_l"),
        "rule did not fire on the strict-< spelling")
      val got = strict.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = (for {
        (a, i) <- as.zipWithIndex; (b, j) <- bs.zipWithIndex
        if math.abs(a - b) < 5L
      } yield (i.toLong, j.toLong)).toSet
      assert(got === exp, "strict bound must exclude the exact-boundary pairs")
      assert(!got.exists { case (i, j) => math.abs(as(i.toInt) - bs(j.toInt)) == 5L })
    }
  }

  test("timestamp operands fire: abs-interval and BETWEEN spellings, lossless") {
    val rnd = new scala.util.Random(11)
    // seconds-granularity instants across ~3 days
    val as = Seq.fill(100)(rnd.nextLong(260000L))
    val bs = Seq.fill(100)(rnd.nextLong(260000L)) ++ as.take(4).map(_ + 3600L)
    val la = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("ida", "sa")
      .withColumn("tsa", timestamp_seconds(col("sa")))
    val lb = bs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("idb", "sb")
      .withColumn("tsb", timestamp_seconds(col("sb")))
    val exp = (for {
      (a, i) <- as.zipWithIndex; (b, j) <- bs.zipWithIndex
      if math.abs(a - b) <= 3600L
    } yield (i.toLong, j.toLong)).toSet
    withRule {
      val viaAbs = la.join(lb, abs(col("tsa") - col("tsb")) <= expr("INTERVAL 1 HOUR"))
      assert(viaAbs.queryExecution.optimizedPlan.toString.contains("__graft_rb_l"),
        "rule did not fire on abs(ts − ts) <= INTERVAL")
      assert(viaAbs.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === exp)
      val viaBetween = la.join(lb, col("tsa").between(
        col("tsb") - expr("INTERVAL 1 HOUR"), col("tsb") + expr("INTERVAL 1 HOUR")))
      assert(viaBetween.queryExecution.optimizedPlan.toString.contains("__graft_rb_l"),
        "rule did not fire on the timestamp BETWEEN spelling")
      assert(!viaBetween.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(viaBetween.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === exp)
      assert(exp.nonEmpty)
    }
  }

  test("q266 timestamp BETWEEN query equals the q245 ms spelling, BNLJ-free") {
    val dir = TestSpark.sfDir
    val expected = withoutRule {
      RangeJoinBucketRule.naiveNearbyOrderCounts(spark, dir, 172800000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val got = {
      val df = RangeJoinBucketRule.nearbyOrderCountsBetween(spark, dir)
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
        "timestamp BETWEEN spelling fell off the rule")
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got === expected && got.nonEmpty)
  }

  test("one-sided bound alone never triggers a rewrite") {
    val la = Seq((1L, 10L)).toDF("ida", "va")
    val lb = Seq((1L, 12L)).toDF("idb", "vb")
    withRule {
      val oneSided = la.join(lb, col("va") <= col("vb") + 5L)
      assert(!oneSided.queryExecution.optimizedPlan.toString.contains("__graft_rb"),
        "a half-bounded difference cannot be bucketed")
      assert(oneSided.count() === 1L)
    }
  }

  test("rule is surgical: equi-keyed joins keep their plan, and it never re-fires") {
    val la = Seq((1L, 10L), (2L, 20L)).toDF("k", "va")
    val lb = Seq((1L, 12L), (2L, 500L)).toDF("k2", "vb")
    withRule {
      val joined = la.join(lb, col("k") === col("k2") &&
        abs(col("va") - col("vb")) <= lit(5L))
      // with an equi key present the rule must not touch the join
      assert(!joined.queryExecution.optimizedPlan.toString.contains("__graft_rb"),
        "rule rewrote a join that already had an equi key")
      assert(joined.count() === 1L)
      // no re-fire: exactly one bucket alias in the pure-range plan —
      // the rewritten join carries an equi conjunct, which disarms the rule
      val pure = la.join(lb, abs(col("va") - col("vb")) <= lit(5L))
      val s = pure.queryExecution.optimizedPlan.toString
      assert(s.contains("__graft_rb_l"), "rule did not fire on the pure-range join")
      assert(s.split(" AS __graft_rb_l").length - 1 === 1,
        "rule re-fired on its own output")
      assert(pure.count() === 1L)
    }
  }
}
