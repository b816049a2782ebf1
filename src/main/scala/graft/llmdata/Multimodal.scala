package graft.llmdata

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The decode step is a
  * REAL dependency-free codec: payloads are valid binary P6 PPM images
  * (the netpbm raw-RGB format — a public, header + raw-pixels layout any
  * image tool reads) and [[PpmDecoder]] genuinely parses the header
  * (magic, comments, dimensions, maxval) and reduces the pixel plane to
  * per-channel statistics. Everything around it — schema, batch iteration
  * via `mapPartitions`, partitioning — is what matters at 100 TB: payload
  * bytes are never shuffled, only scanned and reduced to fixed-width
  * features.
  */
object Multimodal {

  /** Attach a binary payload column (the testdata has no true media blobs;
    * the document text bytes stand in — byte-identical plumbing). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Attach a VALID binary P6 PPM payload derived from the document text:
    * an 8-pixel-wide RGB image whose raster is the text BYTES space-padded
    * to a whole number of rows. Deterministic, content-derived, and a real
    * image — `P6\n8 <h>\n255\n<3·8·h raster bytes>` parses in any netpbm
    * reader. Built scan-side from codegen'd string/binary built-ins; the
    * height lands in a named column so the padded-length arithmetic is
    * evaluated once per row.
    *
    * All raster arithmetic is in BYTES, not characters: the height derives
    * from `octet_length` and the padding runs over the binary cast of the
    * text (Spark's `rpad` pads byte-wise when its arguments are binary) —
    * [[PpmDecoder]] validates the raster length in bytes (3·w·h), so a
    * char-based height would over-promise on any multi-byte (non-ASCII)
    * document and fail the decode at runtime. */
  def withPpmPayload(docs: DataFrame, width: Int = 8): DataFrame = {
    val rowBytes = 3 * width
    docs
      .withColumn("__ppm_h",
        greatest(lit(1), ceil(octet_length(col("text")) / lit(rowBytes.toDouble))).cast("int"))
      .withColumn("payload", concat(
        concat(lit(s"P6\n$width "), col("__ppm_h").cast("string"), lit("\n255\n"))
          .cast("binary"),
        expr(s"rpad(cast(text as binary), __ppm_h * $rowBytes, cast(' ' as binary))")))
      .drop("__ppm_h")
  }

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

  /** Exact integer reduction of a parsed PPM: header fields plus
    * per-channel sum/min/max over the pixel plane — every field integer,
    * so any downstream comparison is arithmetic-free and cross-engine
    * exact (the [[decodeStats]] oracle surface). */
  final case class PpmStats(width: Int, height: Int, maxval: Int,
      sumR: Long, sumG: Long, sumB: Long,
      minR: Int, minG: Int, minB: Int,
      maxR: Int, maxG: Int, maxB: Int)

  /** Binary P6 PPM decoder — a real, dependency-free image parse:
    * validates the `P6` magic, skips `#` comments, reads the ASCII
    * width/height/maxval header fields and the single whitespace byte that
    * terminates the header (per the netpbm spec), checks the raster length
    * (3·w·h samples at maxval < 256), then reduces the pixel plane to
    * `[width, height, maxval, mean_R, mean_G, mean_B]`. Malformed payloads
    * throw IllegalArgumentException with the offending offset — a decode
    * job must surface corrupt media, not average over garbage.
    *
    * [[parse]] is the full pipeline with exact integer output; [[decode]]
    * derives the double feature vector from it, so the feature path and
    * the oracle-checked stats path exercise the SAME header/raster code. */
  object PpmDecoder extends Decoder {
    val featureDim = 6

    /** Header fields plus the byte offset where the raw raster begins —
      * shared by the stats walk ([[parse]]) and the perceptual-hash walk
      * ([[aHashBits]]), so both exercise the identical magic/comment/
      * dimension/terminator handling. */
    private[llmdata] final case class PpmHeader(width: Int, height: Int,
        maxval: Int, rasterOffset: Int)

    private[llmdata] def parseHeader(p: Array[Byte]): PpmHeader = {
      var i = 0
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"PPM parse error at byte $i: $msg")
      def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
      // whitespace between header fields, with netpbm '#'-to-EOL comments
      def skipWs(): Unit = {
        var in = true
        while (in && i < p.length) {
          if (isWs(p(i))) i += 1
          else if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
          else in = false
        }
      }
      def readInt(field: String): Int = {
        skipWs()
        if (i >= p.length || p(i) < '0' || p(i) > '9') fail(s"expected digit for $field")
        var v = 0L
        while (i < p.length && p(i) >= '0' && p(i) <= '9') {
          v = v * 10 + (p(i) - '0')
          if (v > Int.MaxValue) fail(s"$field overflows")
          i += 1
        }
        v.toInt
      }
      if (p.length < 2 || p(0) != 'P' || p(1) != '6') fail("bad magic (want P6)")
      i = 2
      val w = readInt("width"); val h = readInt("height")
      val maxval = readInt("maxval")
      if (w <= 0 || h <= 0) fail(s"degenerate dimensions ${w}x$h")
      if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval (1-byte samples only)")
      // exactly ONE whitespace byte ends the header; the raster follows raw
      if (i >= p.length || !isWs(p(i))) fail("missing header-terminating whitespace")
      i += 1
      val expected = 3L * w * h
      if (p.length - i != expected) fail(s"raster is ${p.length - i} bytes, want $expected")
      PpmHeader(w, h, maxval, i)
    }

    def parse(p: Array[Byte]): PpmStats = {
      val hdr = parseHeader(p)
      val w = hdr.width; val h = hdr.height; val maxval = hdr.maxval
      var i = hdr.rasterOffset
      val sums = new Array[Long](3)
      val mins = Array(256, 256, 256)
      val maxs = Array(-1, -1, -1)
      var c = 0
      while (i < p.length) {
        val v = p(i) & 0xff
        val ch = c % 3
        sums(ch) += v
        if (v < mins(ch)) mins(ch) = v
        if (v > maxs(ch)) maxs(ch) = v
        c += 1; i += 1
      }
      PpmStats(w, h, maxval, sums(0), sums(1), sums(2),
        mins(0), mins(1), mins(2), maxs(0), maxs(1), maxs(2))
    }

    /** Perceptual average-hash (aHash) of a P6 payload, as a 64-char
      * '0'/'1' string: the image reduces to an 8×8 grid of gray-mass
      * cells (cell (b,c) pools pixels whose row band is `row·8/h` and
      * col band `col·8/w` — the integer "resize"), and each bit compares
      * the CELL mean gray against the GLOBAL mean gray. The comparison
      * is cross-multiplied (`cellSum·nTotal ≥ totalSum·nCell`) so the
      * whole hash is exact integer arithmetic — no float resize kernel,
      * which is what lets a SQL engine reproduce every bit. Gray is the
      * unscaled channel sum r+g+b (monotone in the mean, so thresholding
      * is unchanged). Cells that receive no pixels (h or w < 8) emit
      * '0'. Near-identical images differ in few bits, so Hamming
      * distance on these hashes is the standard image near-dup metric. */
    def aHashBits(p: Array[Byte]): String = {
      val hdr = parseHeader(p)
      val w = hdr.width; val h = hdr.height
      val cellSum = new Array[Long](64)
      val cellN = new Array[Long](64)
      var total = 0L
      var i = hdr.rasterOffset
      var px = 0
      val nPx = w * h
      while (px < nPx) {
        val g = (p(i) & 0xff) + (p(i + 1) & 0xff) + (p(i + 2) & 0xff)
        val b = (px / w) * 8 / h
        val c = (px % w) * 8 / w
        cellSum(b * 8 + c) += g
        cellN(b * 8 + c) += 1
        total += g
        px += 1
        i += 3
      }
      val nTot = nPx.toLong
      val sb = new java.lang.StringBuilder(64)
      var k = 0
      while (k < 64) {
        sb.append(
          if (cellN(k) == 0L) '0'
          else if (cellSum(k) * nTot >= total * cellN(k)) '1'
          else '0')
        k += 1
      }
      sb.toString
    }

    def decode(p: Array[Byte]): Array[Double] = {
      val s = parse(p)
      val n = s.width.toDouble * s.height
      Array(s.width.toDouble, s.height.toDouble, s.maxval.toDouble,
        s.sumR / n, s.sumG / n, s.sumB / n)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** Batch feature extraction over the PPM payloads: `mapPartitions` so a
    * decoder can amortize per-batch init (model load, codec contexts)
    * across a whole partition — the Scala analogue of `mapInPandas` batch
    * shape. */
  def decodeFeatures(docs: DataFrame, decoder: Decoder = PpmDecoder): DataFrame = {
    val src = withPpmPayload(docs).select(col("doc_id"), col("payload"))
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
  def featureTable(docs: DataFrame, decoder: Decoder = PpmDecoder): DataFrame =
    decodeFeatures(docs, decoder)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("feature_pos", "feature_val")))
      .select(col("doc_id"), col("feature_pos").cast("long").as("feature_pos"),
        round(col("feature_val"), 6).as("feature_val"))

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType), StructField("height", LongType),
    StructField("maxval", LongType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("min_r", LongType), StructField("min_g", LongType),
    StructField("min_b", LongType),
    StructField("max_r", LongType), StructField("max_g", LongType),
    StructField("max_b", LongType)))

  /** Integer-exact decode statistics — the DECODE PATH'S ORACLE SURFACE:
    * the same [[PpmDecoder.parse]] that powers [[decodeFeatures]] runs per
    * payload, but emits the raw integer header fields and per-channel
    * pixel sum/min/max instead of double means — every value integer, so a
    * SQL engine that re-derives the deterministic text→PPM construction
    * ([[withPpmPayload]]: raster = text bytes space-padded to 3·w·h) can
    * reproduce the result bit-for-bit with string/byte functions and no
    * float arithmetic anywhere. This promotes the real codec from
    * rows-only to hash-checked: a header mis-parse, a channel-phase slip
    * (R/G/B interleave off by one), or a padding error all change these
    * integers. Same `mapPartitions` batch plumbing as the feature path —
    * payload bytes never shuffle, one fixed-width row out per document. */
  def decodeStats(docs: DataFrame): DataFrame =
    decodeStatsPayloads(withPpmPayload(docs).select(col("doc_id"), col("payload")))

  /** [[decodeStats]] on an arbitrary (doc_id, payload) frame — the decode
    * path detached from the text→PPM construction, so it also runs over
    * genuinely binary rasters ([[staticPpmFrame]]). */
  def decodeStatsPayloads(src: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(statsSchema)
    src.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val s = PpmDecoder.parse(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), s.width.toLong, s.height.toLong, s.maxval.toLong,
          s.sumR, s.sumG, s.sumB,
          s.minR.toLong, s.minG.toLong, s.minB.toLong,
          s.maxR.toLong, s.maxG.toLong, s.maxB.toLong)
      }
    }(enc)
  }

  /** Static binary P6 fixtures shipped on the classpath — payloads that are
    * NOT string-shaped, unlike [[withPpmPayload]]'s text-derived rasters:
    * non-trivial maxval (200 and the degenerate 1), dimensions unrelated to
    * any text length, raw pixel bytes spanning the full 0-255 range, and
    * netpbm '#' comments both on their own line and BETWEEN header fields.
    * Generated once by an independent script whose expected per-channel
    * stats are computed from the intended pixel ARRAYS (not by re-parsing
    * the files), so the q149 oracle's literal rows certify the decoder's
    * header skip, comment handling, channel interleave and raster walk
    * end-to-end on real binary input. */
  val staticPpmAssets: Seq[String] = Seq("asset0.ppm", "asset1.ppm", "asset2.ppm")

  /** Per-document perceptual hash table (q224): the REAL codec
    * ([[PpmDecoder.aHashBits]]) runs over each text-derived PPM payload
    * via the same `mapPartitions` batch plumbing as [[decodeStats]] —
    * payload bytes never shuffle, 64 bits out per document. Integer-exact
    * end to end, so the oracle re-derives every bit from the text→PPM
    * construction in SQL (a channel-phase slip, band-rounding error, or
    * threshold-tie mishandling flips bits and fails the hash compare). */
  def aHashTable(docs: DataFrame): DataFrame = {
    // spread BEFORE the payload construction + codec pass (single-task
    // otherwise — r21 guide §2.5; the payload bytes still never shuffle,
    // only the source text rows move once)
    val src = withPpmPayload(Dedup.spreadScan(docs))
      .select(col("doc_id"), col("payload"))
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("doc_id", LongType), StructField("ahash", StringType))))
    src.mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), PpmDecoder.aHashBits(r.getAs[Array[Byte]](1))))
    }(enc)
  }

  /** Perceptual near-dup pairs (q225): Hamming ≤ `maxHamming` on the
    * [[aHashTable]] hashes, found by pigeonhole banding — the 64 bits
    * split into `maxHamming + 1` bands, so any pair within the radius
    * agrees EXACTLY on at least one band (perfect recall, the q44/q117
    * SimHash argument on image hashes); candidates come from equi-joins
    * on band keys, never an all-pairs scan, and verification XORs the 4
    * band words with `bit_count` (codegen'd integer ops). The oracle is
    * the ALL-PAIRS computation, so hash equality certifies the banding
    * lost nothing. */
  def aHashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && 64 % (maxHamming + 1) == 0,
      "bands must tile the 64-bit hash")
    val nBands = maxHamming + 1
    val bandLen = 64 / nBands
    // The self-join consumes the hash table twice; materialize the tiny
    // (one 8-byte id + 64-char hash per doc) frame so the codec pass
    // over the payloads runs once, not once per join side.
    val hashes = aHashTable(docs).localCheckpoint(true)
    val banded = hashes.select(col("doc_id"), col("ahash"),
        posexplode(array((0 until nBands).map(j =>
          substring(col("ahash"), 1 + j * bandLen, bandLen)): _*))
          .as(Seq("band_id", "band_key")))
    val cand = banded.select(col("doc_id").as("doc_a"), col("ahash").as("ha"),
        col("band_id"), col("band_key"))
      .join(banded.select(col("doc_id").as("doc_b"), col("ahash").as("hb"),
        col("band_id").as("bid"), col("band_key").as("bkey")),
        col("band_id") === col("bid") && col("band_key") === col("bkey") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "ha", "hb").distinct()
    val hamming = (0 until nBands).map { j =>
      bit_count(conv(substring(col("ha"), 1 + j * bandLen, bandLen), 2, 10)
        .cast("long").bitwiseXOR(
          conv(substring(col("hb"), 1 + j * bandLen, bandLen), 2, 10).cast("long")))
    }.reduce(_ + _)
    cand.withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  def staticPpmFrame(spark: SparkSession): DataFrame = {
    val rows = staticPpmAssets.zipWithIndex.map { case (name, idx) =>
      val in = getClass.getResourceAsStream(s"/graft/fixtures/ppm/$name")
      require(in != null, s"classpath fixture /graft/fixtures/ppm/$name missing")
      val bytes = try in.readAllBytes() finally in.close()
      Row(idx.toLong, bytes)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
  }
}
