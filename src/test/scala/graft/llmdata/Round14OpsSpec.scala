package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Unit pins for the round-14 operator work. */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dir = TestSpark.sfDir

  // ---- q265 DoReMi one-step mixture reweighting -------------------------

  /** Planted two-source corpus: `easy` is one bigram repeated (the corpus
    * LM nails it), `hard` cycles through many distinct bigrams. */
  private lazy val doremiDocs = {
    import spark.implicits._
    val easy = (1L to 6L).map(i => (i, "aa bb aa bb aa bb aa bb", "easy"))
    val hard = (7L to 12L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h", "hard"))
    (easy ++ hard).toDF("doc_id", "text", "source")
  }

  test("q265 doremi: harder-than-average source gains weight, weights stay a distribution") {
    val out = TextAnalysis.doremiStep(doremiDocs).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap // source -> (excess, weight_old, weight_new)
    val (exH, oldH, newH) = out("hard")
    val (exE, oldE, newE) = out("easy")
    assert(exH > 0.0 && exE < 0.0, "planted hard/easy excess signs wrong")
    assert(newH > oldH, "hard source must gain weight")
    assert(newE < oldE, "easy source must lose weight")
    val sumNew = out.values.map(_._3).sum
    assert(math.abs(sumNew - 1.0) < 1e-5, s"weights must normalize, got $sumNew")
    val sumOld = out.values.map(_._2).sum
    assert(math.abs(sumOld - 1.0) < 1e-5)
  }

  test("q265 doremi: eta = 0 is the identity reweighting") {
    val out = TextAnalysis.doremiStep(doremiDocs, eta = 0.0).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getDouble(5)) <= 1e-6,
        s"eta=0 must keep weights: ${r.getString(0)}")
    }
  }

  test("q265 doremi on testdata: every source present, weights normalized") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.doremiStep(docs)
    assert(out.count() === docs.select("source").distinct().count())
    val s = out.agg(sum("weight_new")).collect()(0).getDouble(0)
    assert(math.abs(s - 1.0) < 1e-4)
  }
}
