package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Quality gate for the model-based quality filter (q186): a broken
  * classifier (zero weights, miswired labels, degenerate split) must fail
  * loudly, not just produce rows. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("weak labels are balanced terciles and the middle is dropped") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val labeled = QualityClassifier.weakLabeled(docs)
    val n = docs.count()
    val byLabel = labeled.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // ntile(3) gives each lang's head and tail ~n_lang/3 docs; the middle
    // tercile is absent, so the labeled set is ~2/3 of the corpus and the
    // classes are balanced to within ntile's ±1-per-lang remainders.
    assert(byLabel.keySet === Set(0.0, 1.0))
    val total = byLabel.values.sum
    assert(math.abs(total - 2.0 * n / 3.0) <= 6,
      s"labeled $total of $n docs — tercile construction drifted")
    assert(math.abs(byLabel(1.0) - byLabel(0.0)) <= 6,
      s"class skew: $byLabel")
  }

  test("held-out AUC: the classifier reconstructs the weak label far above chance") {
    // The label is a function of token frequencies (avg unigram logprob
    // tercile) and the features are hashed token counts, so a working
    // linear model must recover it well out of sample. Envelope, not a pin:
    // hashing collisions and the solver's float path can wobble the third
    // decimal. Observed 0.97+ at sf0.001.
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val auc = QualityClassifier.heldOutAuc(docs)
    assert(auc > 0.85, s"held-out AUC $auc — quality classifier is not learning the weak label")
  }

  test("q186 contract: every document scored exactly once, probs in [0,1]") {
    val scored = QualityClassifier.scoreDocs(spark, TestSpark.sfDir)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    assert(scored.count() === docs.count())
    assert(scored.select("doc_id").distinct().count() === docs.count())
    import org.apache.spark.sql.functions._
    val bad = scored.filter(col("quality_prob") < 0.0 || col("quality_prob") > 1.0).count()
    assert(bad === 0L)
  }
}
