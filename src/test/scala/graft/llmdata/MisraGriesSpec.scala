package graft.llmdata

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The Misra–Gries guarantee and the determinism restoration of the
  * exact-verify stage (q209). The sketch's candidate membership for
  * sub-threshold terms is partitioning-dependent BY DESIGN — these pins
  * are about what must NOT vary: no true heavy hitter ever missing, the
  * buffer bound, and the verified output being exactly the all-exact
  * frequent-items set under any partitioning.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dir = TestSpark.sfDir
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Adversarial stream: one genuine heavy hitter (30%), a mid item just
    * above threshold, and a long tail of distinct fillers designed to
    * force decrement rounds. */
  private val n = 1000
  private val stream: Seq[String] =
    (Seq.fill(300)("HEAVY") ++ Seq.fill(80)("MID") ++
      (0 until (n - 380)).map(i => s"tail_$i"))

  test("unit-level: undercount bound and buffer size on the raw aggregator") {
    val k = 32
    val agg = new TextAnalysis.MisraGries(k)
    // simulate 4 partitions + merges, in a worst-case interleaving
    val parts = stream.grouped(n / 4).toSeq
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    partials.foreach(p => assert(p.size <= k - 1, "buffer exceeded k-1 counters"))
    val merged = partials.reduce(agg.merge)
    assert(merged.size <= k - 1)
    // every term with true count > n/k must survive with positive estimate
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = trueCounts.filter(_._2 * k > n).keySet
    assert(mustSurvive.nonEmpty, "fixture has no heavy hitter — test vacuous")
    mustSurvive.foreach { t =>
      assert(merged.contains(t), s"true heavy hitter $t dropped from summary")
      assert(merged(t) >= trueCounts(t) - n / k,
        s"undercount of $t exceeds N/k: est ${merged(t)} true ${trueCounts(t)}")
    }
  }

  test("candidates are a superset of the exact frequent terms on the corpus") {
    val k = 32
    val cand = TextAnalysis.heavyHitterCandidates(docs, k)
      .as[String].collect().toSet
    assert(cand.size <= k - 1)
    val tok = docs.select(explode(split(col("text"), " ")).as("term"))
    val total = tok.count()
    val exact = tok.groupBy("term").count()
      .filter(col("count") * k > total).select("term").as[String].collect().toSet
    assert(exact.subsetOf(cand),
      s"sketch dropped true heavy hitters: ${exact -- cand}")
  }

  test("verified heavy hitters equal the all-exact computation, under any partitioning") {
    val k = 32
    val tok = docs.select(explode(split(col("text"), " ")).as("term"))
    val total = tok.count()
    val exact = tok.groupBy("term").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * k > total)
    val out1 = TextAnalysis.heavyHitters(docs, k)
    val out13 = TextAnalysis.heavyHitters(docs.repartition(13), k)
    assert(out1.exceptAll(exact).isEmpty && exact.exceptAll(out1).isEmpty)
    assert(out13.exceptAll(exact).isEmpty && exact.exceptAll(out13).isEmpty)
    assert(out1.count() > 0L, "no heavy hitters on the fixture — oracle vacuous")
  }
}
