package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Unit pins for the round-15 operator work. */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dir = TestSpark.sfDir

  // ---- q290 prefix-filtered set-similarity join -------------------------

  /** Planted corpus with known pairwise distinct-token overlaps:
    * d1∩d2 = {a b c d} (4), d1∩d3 = {a b} (2), d2∩d3 = {a b} (2),
    * d4 shares nothing. Duplicate tokens inside a doc count once. */
  private lazy val overlapDocs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e1 e2 e1"), // dup 'e1' exercises the distinct
      (2L, "a b c d f1 f2"),
      (3L, "a b g1 g2 g3"),
      (4L, "h1 h2 h3 h4")
    ).toDF("doc_id", "text")
  }

  /** Unfiltered exact truth at threshold c — what prefix filtering must
    * reproduce exactly. */
  private def bruteOverlap(docs: org.apache.spark.sql.DataFrame, c: Int) = {
    val t = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok")).distinct()
    t.select(col("doc_id").as("da"), col("tok"))
      .join(t.select(col("doc_id").as("db"), col("tok")), "tok")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= c)
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("da", "db", "overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("q290: planted overlaps surface with exact counts; below-threshold pairs filtered") {
    val got = pairSet(Dedup.prefixFilterOverlapJoin(overlapDocs, minOverlap = 3))
    assert(got === Set((1L, 2L, 4L)),
      "only d1-d2 reaches overlap >= 3, with the DISTINCT-token count 4")
    val got2 = pairSet(Dedup.prefixFilterOverlapJoin(overlapDocs, minOverlap = 2))
    assert(got2 === Set((1L, 2L, 4L), (1L, 3L, 2L), (2L, 3L, 2L)))
  }

  test("q290: prefix filtering is LOSSLESS vs the unfiltered exact join, fixture and corpus") {
    for (c <- Seq(2, 3, 4))
      assert(pairSet(Dedup.prefixFilterOverlapJoin(overlapDocs, c)) ===
        pairSet(bruteOverlap(overlapDocs, c)),
        s"prefix filter dropped a qualifying pair at threshold $c")
    // real corpus at the registry threshold: every pair, every count equal
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(pairSet(Dedup.prefixFilterOverlapJoin(docs, 30)) ===
      pairSet(bruteOverlap(docs, 30)))
  }

  test("q290: the prefix join examines far fewer pairs than the all-pairs token join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok")).distinct()
    val allPairs = t.select(col("doc_id").as("da"), col("tok"))
      .join(t.select(col("doc_id").as("db"), col("tok")), "tok")
      .filter(col("da") < col("db")).select("da", "db").distinct().count()
    val survivors = Dedup.prefixFilterOverlapJoin(docs, 30).count()
    // the verify stage is keyed on candidates; losslessness says
    // candidates ⊇ survivors, selectivity says candidates ≪ all pairs.
    // Candidate count isn't exposed, but survivors ≈ candidates here
    // (measured 437 vs 438 at sf0.01); assert the all-pairs base is
    // orders of magnitude above what the operator keeps.
    assert(allPairs > survivors * 50,
      s"all-pairs $allPairs vs survivors $survivors — fixture no longer " +
        "demonstrates the pruning")
  }

  // ---- q291 custom top-k operator on the token path ---------------------

  test("q291: TopKPerGroupExec plans on the token path — no Sort, no Window") {
    val df = graft.plans.TopKPerGroup.topTokensPerLang(spark, dir, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    assert(!plan.contains("Sort "), s"a sort defeats the operator's point:\n$plan")
  }

  test("q291: output identical to the row_number window spelling") {
    val got = graft.plans.TopKPerGroup.topTokensPerLang(spark, dir, k = 5)
      .select("lang", "token", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("token"))
    val exp = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("lang", "token", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }
}
