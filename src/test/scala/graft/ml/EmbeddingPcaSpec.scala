package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Algebraic contracts for the PCA reduction (q190): a silently broken
  * factorization (non-orthogonal loadings, shuffled spectrum, lossy
  * full-rank projection) must fail loudly. */
class EmbeddingPcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")

  test("loadings are orthonormal and the variance spectrum is a monotone simplex") {
    val model = EmbeddingPca.fit(emb, k = 8)
    val pc = model.pc // d x k, column-major
    val d = pc.numRows; val k = pc.numCols
    for (i <- 0 until k; j <- i until k) {
      val dot = (0 until d).map(r => pc(r, i) * pc(r, j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"PC$i . PC$j = $dot, want $want")
    }
    val ev = model.explainedVariance.toArray
    assert(ev.forall(_ >= 0.0))
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-12 },
      s"spectrum not monotone: ${ev.toSeq}")
    assert(ev.sum <= 1.0 + 1e-9)
  }

  test("full-rank projection preserves pairwise distance (rotation, not loss)") {
    val dim = emb.head.getAs[Seq[Float]]("embedding").size
    val model = EmbeddingPca.fit(emb, k = dim)
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.sql.functions._
    val projected = model.transform(
      emb.select(col("vec_id"),
        array_to_vector(transform(col("embedding"), x => x.cast("double"))).as("features")))
      .select(col("vec_id"), vector_to_array(col("pc")).as("p"),
        vector_to_array(col("features")).as("f"))
      .limit(50).collect()
    // ||proj(a) - proj(b)|| == ||a - b|| for a distance-preserving rotation
    // (PCA first centers, which cancels in differences).
    val rows = projected.map(r => (r.getAs[Seq[Double]]("p"), r.getAs[Seq[Double]]("f")))
    def dist(x: Seq[Double], y: Seq[Double]) =
      math.sqrt(x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum)
    for (Seq((pa, fa), (pb, fb)) <- rows.toSeq.sliding(2)) {
      assert(math.abs(dist(pa, pb) - dist(fa, fb)) < 1e-6,
        "full-rank PCA changed a pairwise distance — not a rotation")
    }
  }

  test("q190 contract: every vector projected to k dims, deterministic re-fit") {
    val a = EmbeddingPca.project(spark, TestSpark.sfDir, k = 8)
    assert(a.count() === emb.count())
    import org.apache.spark.sql.functions._
    assert(a.filter(size(col("pc")) =!= 8).count() === 0L)
    val b = EmbeddingPca.project(spark, TestSpark.sfDir, k = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "re-fit on identical input diverged")
  }
}
