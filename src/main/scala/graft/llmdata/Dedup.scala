package graft.llmdata

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, over `documents`.
  *
  * Scale design: exact dedup is a hash-partitioned groupBy on a 256-bit
  * content hash (no full-text shuffle — only the 32-byte key + doc_id
  * move). Near-dup is MinHash+LSH: shingle → minhash signature → band →
  * bucket-join, so candidate generation is an equi-join on band hashes
  * instead of an O(n²) cross product.
  */
object Dedup {

  /** Exact duplicate groups keyed by sha2-256 of the raw text. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc_id"))

  /** Keep-first exact dedup: survivors only, deterministic keeper = lowest
    * doc_id per content hash. */
  def dedupKeepFirst(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Near-duplicate candidate pairs via MinHash+LSH over word-3-shingles.
    * Returns (doc_a, doc_b, jaccard_distance) with doc_a < doc_b. */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8, numHashTables: Int = 8): DataFrame = {
    val shingled = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", array_distinct(TextAnalysis.shingles(col("toks"), 3)))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(shingled)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, threshold, "jaccard_distance")
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        col("jaccard_distance"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** Exact pairwise Jaccard similarity on distinct-token sets for a bounded
    * candidate set (the verification stage after LSH candidate generation,
    * or a direct small-corpus near-dup pass). */
  def jaccardPairs(docs: DataFrame, maxDocId: Long): DataFrame = {
    val d = docs.filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    val a = d.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"), 6).as("jaccard"))
  }

  /** 64-bit SimHash aggregator: per-token 64-bit hashes vote per bit
    * position; the sign of each vote total becomes the signature bit.
    * A `TypedImperativeAggregate`-style typed Aggregator — constant-size
    * buffer, map-side partial aggregation for free. */
  object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < 64) { b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Int]): Long = {
      var out = 0L; var i = 0
      while (i < 64) { if (b(i) > 0) out |= (1L << i); i += 1 }
      out
    }
    override def bufferEncoder: Encoder[Array[Int]] = Encoders.kryo[Array[Int]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Per-document 64-bit SimHash over xxhash64 token hashes. */
  def simhash(docs: DataFrame): DataFrame = {
    val sim = udaf(SimHashAgg, Encoders.scalaLong)
    docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id").agg(sim(col("h")).as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance ≤ `maxHamming` over a bounded
    * candidate set (bit_count of xor — codegen'd built-ins). */
  def simhashPairs(docs: DataFrame, maxDocId: Long, maxHamming: Int = 8): DataFrame = {
    val s = simhash(docs.filter(col("doc_id") < maxDocId))
    val a = s.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = s.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
