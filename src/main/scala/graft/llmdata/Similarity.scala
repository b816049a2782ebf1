package graft.llmdata

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>[64], label).
  *
  * Scale design: brute-force cosine top-k is the exact baseline — a
  * broadcast of the (small) query set against a full scan of the corpus,
  * no shuffle of the corpus itself, then a per-query top-k. The scale path
  * buckets candidates with random-hyperplane LSH so each query probes a
  * bucket instead of the corpus.
  */
object Similarity {

  /** Exact cosine top-k: queries = rows with vec_id < nQueries, ranked by
    * cosine rounded to 6dp (ties broken by candidate id — deterministic
    * across engines and FP summation orders). */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(VectorOps.cosine(col("qe"), col("ce")), 6).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
  }

  /** Near-duplicate embedding pairs: cosine above `threshold`, brute force
    * over the (row-id-bounded) corpus. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.9, maxVecId: Long = Long.MaxValue): DataFrame = {
    val d = emb.filter(col("vec_id") < maxVecId)
    val a = d.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = d.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorOps.cosine(col("ea"), col("eb")), 6).as("cosine"))
      .filter(col("cosine") > threshold)
  }

  /** Approximate NN via random-hyperplane (bucketed random projection) LSH
    * — the scale path: O(n) bucketing instead of O(n²) scoring. Euclidean
    * buckets on L2-normalized vectors ≈ cosine buckets. */
  def lshTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      bucketLength: Double = 2.0, numHashTables: Int = 4): DataFrame = {
    val normed = emb.select(col("vec_id"), col("label"),
      array_to_vector(VectorOps.scale(col("embedding"),
        lit(1.0) / VectorOps.l2Norm(col("embedding")))).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(normed)
    val queries = normed.filter(col("vec_id") < nQueries)
    // euclidean distance on unit vectors: d² = 2 − 2·cos
    model.approxSimilarityJoin(queries, normed, math.sqrt(2.0), "dist")
      .select(
        col("datasetA.vec_id").as("query_id"),
        col("datasetB.vec_id").as("cand_id"),
        round(lit(1.0) - col("dist") * col("dist") / lit(2.0), 6).as("cosine_approx"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine_approx").desc, col("cand_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-label centroid, element-wise: posexplode + two-key aggregation —
    * partial aggregation map-side; shuffles only (label, pos) pairs. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
        posexplode(VectorOps.asDouble(col("embedding"))).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg("v"), 6).as("centroid_v"))
      .select(col("label"), col("pos").cast("long").as("pos"), col("centroid_v"))
}
