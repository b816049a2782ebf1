package graft.llmdata

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The decode step is
  * STUBBED (this container has no image/audio codecs — see the builder
  * brief): [[FakeDecoder]] is a deterministic stand-in with the exact
  * signature a real codec plug-in would have. Everything around it —
  * schema, batch iteration via `mapPartitions`, partitioning — is real
  * Spark and is what matters at 100 TB: payload bytes are never shuffled,
  * only scanned and reduced to fixed-width features.
  */
object Multimodal {

  /** Attach a binary payload column (the testdata has no true media blobs;
    * the document text bytes stand in — byte-identical plumbing). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Typed metadata extraction over the opaque payload: size + content
    * hash, all computed scan-side (codegen'd, no shuffle). */
  def payloadMetadata(docs: DataFrame): DataFrame =
    withPayload(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("payload_bytes"),
      sha2(col("payload"), 256).as("payload_sha256"),
      lit("application/octet-stream").as("mime_type"))

  /** Frame sampling over the opaque payload — the video-style access
    * pattern: take `nFrames` fixed-stride slices of the payload and reduce
    * each to a digest, all scan-side (no shuffle, payload never moves).
    * A real pipeline would decode each slice; the offset arithmetic,
    * explode shape, and per-frame schema are exactly what a codec-backed
    * version ships. Offsets are integer floor division so the oracle can
    * mirror them bit-for-bit. */
  def sampleFrames(docs: DataFrame, nFrames: Int = 4, frameLen: Int = 16): DataFrame =
    docs.select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0), lit(nFrames - 1))).as(Seq("pos", "frame_id")))
      .withColumn("off", expr(s"(frame_id * length(text)) div $nFrames"))
      .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
        col("off").cast("long").as("frame_offset"),
        md5(substr(col("text"), col("off") + lit(1), lit(frameLen))).as("frame_md5"))

  /** Payload resize plumbing — the bytes→smaller-bytes transformation
    * shape (image thumbnail, audio downsample). The codec-dependent
    * resampling is stubbed by contract (no codecs in this container): the
    * stand-in is head-truncation to `targetBytes`, which preserves the
    * operator's real properties — output is a derived binary column with
    * its own size/hash metadata, computed scan-side, payload never
    * shuffled. A real codec swaps in at the `resized` expression. */
  def resizePayload(docs: DataFrame, targetBytes: Int = 64): DataFrame = {
    val resized = substring(col("payload"), 1, targetBytes)
    withPayload(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("orig_bytes"),
      least(length(col("payload")), lit(targetBytes)).cast("long").as("resized_bytes"),
      resized.as("resized"),
      sha2(resized, 256).as("resized_sha256"))
  }

  /** A media decoder: bytes → fixed-width feature vector. Real codecs
    * (JPEG decode, audio resample, video frame-sample) plug in here. */
  trait Decoder extends Serializable {
    def featureDim: Int
    def decode(payload: Array[Byte]): Array[Double]
  }

  /** Deterministic stand-in "decoder": byte-level moments + a tiny
    * 4-bin byte histogram — stable, content-derived, codec-free. */
  object FakeDecoder extends Decoder {
    val featureDim = 6
    def decode(p: Array[Byte]): Array[Double] = {
      val n = p.length.max(1)
      var sum = 0L; var sumSq = 0L
      val hist = new Array[Long](4)
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xff
        sum += b; sumSq += b.toLong * b
        hist(b >> 6) += 1
        i += 1
      }
      val mean = sum.toDouble / n
      Array(p.length.toDouble, mean,
        math.sqrt((sumSq.toDouble / n) - mean * mean),
        hist(0).toDouble / n, hist(1).toDouble / n, hist(2).toDouble / n)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** Batch feature extraction: `mapPartitions` so a real decoder can
    * amortize per-batch init (model load, codec contexts) across a whole
    * partition — the Scala analogue of `mapInPandas` batch shape. */
  def decodeFeatures(docs: DataFrame, decoder: Decoder = FakeDecoder): DataFrame = {
    val src = withPayload(docs).select(col("doc_id"), col("payload"))
    val enc = RowEncoder.encoderFor(featureSchema)
    src.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        Row(r.getLong(0), decoder.decode(r.getAs[Array[Byte]](1)).toSeq)
      }
    }(enc)
  }

  /** Exploded feature view (doc_id, feature_pos, feature_val) for
    * SQL-side consumption of the decoded features. */
  def featureTable(docs: DataFrame, decoder: Decoder = FakeDecoder): DataFrame =
    decodeFeatures(docs, decoder)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("feature_pos", "feature_val")))
      .select(col("doc_id"), col("feature_pos").cast("long").as("feature_pos"),
        round(col("feature_val"), 6).as("feature_val"))
}
