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
