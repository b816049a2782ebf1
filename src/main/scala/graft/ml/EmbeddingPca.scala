package graft.ml

import org.apache.spark.ml.feature.{PCA, PCAModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction over the embedding column — the compaction
  * stage a real similarity pipeline runs before ANN indexing (fewer dims →
  * smaller IVF cells, cheaper dots) and the standard whitening front end
  * for embedding-space analytics (q156 drift, q159 confusion, SemDeDup).
  *
  * MLlib's PCA computes the covariance by a tree-aggregated Gramian over
  * the distributed rows (one pass, map-side partials — the 1000-executor
  * shape) and eigendecomposes the small d×d matrix on the driver: at
  * 100 TB the row count is unbounded while d stays model-sized, which is
  * exactly the asymmetry this factorization exploits. Like ALS and the
  * quality classifier, eigensolver outputs are iterative-float, so the
  * registry entry (q190) is rows-only; EmbeddingPcaSpec pins the algebraic
  * contracts (orthonormal loadings, monotone variance spectrum, exact
  * reconstruction at full rank).
  */
object EmbeddingPca {

  private def asVec(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      array_to_vector(transform(col("embedding"), x => x.cast("double"))).as("features"))

  def fit(emb: DataFrame, k: Int = 8): PCAModel =
    new PCA().setInputCol("features").setOutputCol("pc").setK(k).fit(asVec(emb))

  /** (vec_id, label, pc[k] rounded 6dp): every vector in the reduced
    * space. Degenerate corpora (no rows — PCA.fit throws) project to an
    * empty well-typed frame, the RegistryEmptySpec contract. */
  def project(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    if (emb.isEmpty) {
      return emb.select(col("vec_id"), col("label"),
        array().cast("array<double>").as("pc"))
    }
    val model = fit(emb, k)
    model.transform(asVec(emb))
      .select(col("vec_id"), col("label"),
        transform(vector_to_array(col("pc")), x => round(x, 6)).as("pc"))
  }

  /** The explained-variance spectrum as a 1-row-per-component frame. */
  def varianceSpectrum(emb: DataFrame, k: Int = 8): Seq[Double] =
    fit(emb, k).explainedVariance.toArray.toSeq
}
