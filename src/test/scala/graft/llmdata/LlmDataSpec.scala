package graft.llmdata

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LlmDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docsWithDups = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L),
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat", "en", "s", 43L), // near dup
    (3L, "completely different content about spark engines", "en", "s", 48L),
    (4L, "the quick brown fox jumps over the lazy dog", "en", "s", 43L)  // exact dup of 0
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tfIdfTopK matches the hand-computed reference on a tiny corpus") {
    val tiny = Seq((1L, "a b a c"), (2L, "a b"), (3L, "c c d")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopK(tiny, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4))).toSet
    // N=3; df: a=2 b=2 c=2 d=1; ln(3/2)=0.405465..., ln(3)=1.098612...
    // doc1: a tf2 -> 0.81093 (rank1); b/c tie at 0.405465 -> term order, b
    // doc3: d 1.098612 outranks c (tf2, 0.81093)
    assert(got === Set(
      (1L, 1L, "a", 2L, 0.81093), (1L, 2L, "b", 1L, 0.405465),
      (2L, 1L, "a", 1L, 0.405465), (2L, 2L, "b", 1L, 0.405465),
      (3L, 1L, "d", 1L, 1.098612), (3L, 2L, "c", 2L, 0.81093)))
  }

  test("contaminationCheck equals a full local reference on the testdata") {
    val real = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val got = TextAnalysis.contaminationCheck(real).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // local reference: same md5-prefix probe membership, same 3-shingles
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val local = real.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 3)
      .map { case (id, t) =>
        (id, md5hex(s"$id:probe").take(2) < "15",
          t.sliding(3).map(_.mkString(" ")).toSet)
      }
    val probeShingles = local.filter(_._2).flatMap(_._3).toSet
    val exp = local.filterNot(_._2)
      .map { case (id, _, sh) => id -> (sh & probeShingles).size.toLong }
      .filter(_._2 > 0).toMap
    assert(exp.nonEmpty, "fixture produced no contamination — probe threshold too low to test anything")
    assert(got === exp)
  }

  test("repetitionScore: zero for all-distinct shingles, exact ratio for repeated text") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f"), (2L, "x y x y x y x y")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScore(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) === ((4L, 4L, 0.0)))
    // 8 tokens -> 6 shingles, only "x y x" and "y x y" distinct: 1 - 2/6
    assert(r(2L)._1 === 6L && r(2L)._2 === 2L)
    assert(math.abs(r(2L)._3 - 0.666667) < 1e-9)
  }

  test("quantizeEmbeddings: extrema hit ±127, zero vector guarded, dequantization bounded") {
    import spark.implicits._
    val d = Seq((1L, Array(0.5f, -1.0f, 0.25f), 0), (2L, Array(0f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Similarity.quantizeEmbeddings(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(q((1L, 0L)) === ((64L, 127.0)))   // floor(0.5*127 + 0.5)
    assert(q((1L, 1L)) === ((-127L, 127.0))) // the abs-max element
    assert(q((1L, 2L)) === ((32L, 127.0)))   // floor(31.75 + 0.5)
    (0 to 2).foreach(p => assert(q((2L, p.toLong)) === ((0L, 0.0))))
    // dequantization error <= 0.5/scale on the real corpus
    val emb = spark.read.parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val bad = Similarity.quantizeEmbeddings(emb)
      .join(emb.select(col("vec_id"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "x"))), Seq("vec_id", "pos"))
      .filter(col("scale") > 0 &&
        abs(col("q") / col("scale") - col("x")) > lit(0.5000001) / col("scale"))
      .count()
    assert(bad === 0L)
  }

  test("fuzzyContamination: known cross pairs on a synthetic fixture; corpus-corpus pairs excluded") {
    // t1..t8 with the LAST token changed -> 5 of 7 distinct shingles shared
    // (J = 5/7 ≈ 0.714); an identical pair (J = 1); an unrelated doc (J = 0);
    // and a corpus-corpus near-dup pair that must NOT surface (two-sided op).
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),   // near-dup of probe 1
      (11L, "nothing in common with any probe document here"),
      (12L, "one two three four five six seven eight nine"),    // exact dup of probe 2
      (13L, "red orange yellow green blue indigo violet pink"), // near-dup of 14 (corpus side)
      (14L, "red orange yellow green blue indigo violet black")
    ).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta iota"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "isolated probe text sharing zero shingles entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.fuzzyContamination(corpus, probe, simThreshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((10L, 1L, 0.714286), (12L, 2L, 1.0)))
  }

  test("fuzzyContamination: exact parity with the brute-force threshold join on the testdata") {
    val real = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val isProbe = (id: Long) => md5hex(s"$id:probe").take(2) < "15"
    val sh = real.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 3)
      .map { case (id, t) => (id, t.sliding(3).map(_.mkString(" ")).toSet) }
    val (probeSh, corpusSh) = sh.partition { case (id, _) => isProbe(id) }
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (cid, cs) <- corpusSh
      (pid, ps) <- probeSh
      j = round6((cs & ps).size.toDouble / (cs | ps).size.toDouble)
      if j >= 0.5
    } yield (cid, pid, j)).toSet
    val pr = substring(md5(concat(col("doc_id").cast("string"), lit(":probe"))), 1, 2)
    val got = Dedup.fuzzyContamination(
        real.filter(pr >= "15"), real.filter(pr < "15"), simThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected,
      s"missed=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
  }

  test("exact dedup groups and keep-first") {
    val groups = Dedup.exactGroups(docsWithDups).collect()
    assert(groups.length === 3)
    val trip = groups.find(_.getLong(1) == 3L)
    assert(trip.isDefined && trip.get.getLong(2) === 0L) // keeper = min doc_id
    val kept = Dedup.dedupKeepFirst(docsWithDups).select("doc_id").as[Long].collect().sorted
    assert(kept === Array(0L, 2L, 3L))
  }

  test("jaccard pairs rank near-dup above unrelated") {
    val pairs = Dedup.jaccardPairs(docsWithDups, PairScope.MaxId(4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) === 1.0)           // identical
    assert(pairs((0L, 2L)) > 0.7)             // near dup
    assert(pairs((0L, 3L)) < 0.1)             // unrelated
  }

  test("simhash: identical texts share a signature, near-dups are close") {
    val s = Dedup.simhash(docsWithDups).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(0L) === s(1L) && s(0L) === s(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(0L), s(2L)) < hamming(s(0L), s(3L)))
    val pairs = Dedup.simhashPairs(docsWithDups, PairScope.MaxId(5), maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("minhash LSH finds the injected near-duplicates") {
    // widen the corpus so LSH has something to bucket
    val filler = (10L until 60L).map(i => (i, s"filler doc number $i with unique tokens t$i u$i v$i w$i x$i", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.minhashPairs(docsWithDups.unionByName(filler), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 4L)) && pairs.contains((1L, 4L)))
  }

  test("minhashNearDup: verified pairs equal the exact jaccard threshold join") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val got = Dedup.minhashNearDup(docs, simThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact oracle: all-pairs jaccard over the same 3-shingle sets
    val toks = TextAnalysis.tokens(col("text"))
    val sh = docs.filter(size(toks) >= 3)
      .select(col("doc_id"), array_distinct(TextAnalysis.shingles(toks, 3)).as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val expected = a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("simhashBandedPairs: perfect recall vs the bounded all-pairs baseline") {
    val filler = (10L until 60L).map(i => (i, s"filler doc number $i with unique tokens t$i u$i v$i w$i x$i", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docsWithDups.unionByName(filler)
    val expected = Dedup.simhashPairs(corpus, PairScope.Unbounded, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Dedup.simhashBandedPairs(corpus, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.contains((0L, 1L, 0L))) // exact dups: hamming 0
  }

  test("dedupKeepFirst survives degenerate duplicate skew") {
    val skewed = (0L until 20000L).map(i => (i, "the one true duplicated text", "en", "s", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(Seq((20000L, "a unique survivor", "en", "s", 17L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val kept = Dedup.dedupKeepFirst(skewed).select("doc_id").as[Long].collect().sorted
    assert(kept === Array(0L, 20000L))
    // and the plan is agg+join, not a single-partition window sort
    val plan = Dedup.dedupKeepFirst(skewed).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window funnel still present:\n$plan")
  }

  test("token stats and quality on the testdata schema") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val stats = TextAnalysis.tokenStats(docs)
    assert(stats.filter(col("n_tokens") <= 0).count() === 0)
    val q = TextAnalysis.qualityScore(docs)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
    val fp = TextAnalysis.fingerprint(docs)
    assert(fp.select("fingerprint").distinct().count() === fp.count()
      || fp.count() === docs.count()) // fingerprints exist for every doc
  }

  test("rolling hash is deterministic and content-sensitive") {
    val h = TextAnalysis.rollingHash(docsWithDups).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) === h(1L))
    assert(h(0L) !== h(2L))
  }

  test("brute-force cosine top-k: self-similar labels rank high") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val topk = Similarity.bruteForceTopK(emb, nQueries = 5, k = 3)
    assert(topk.count() === 15)
    assert(topk.filter(col("cosine") > 1.000001 || col("cosine") < -1.000001).count() === 0)
    // ranks are 1..3 per query
    val ranks = topk.groupBy("query_id").agg(collect_list("rank")).collect()
    ranks.foreach(r => assert(r.getSeq[Long](1).sorted === Seq(1L, 2L, 3L)))
  }

  test("LSH ANN recall against brute force") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 5, k = 5)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, nQueries = 5, k = 5, numHashTables = 8)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
  }

  test("IVF ANN recall against brute force") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 5, k = 5)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCells = 16, nProbe = 6)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // the small-corpus cell-fill correction (Similarity.ivfTopK) lifts
    // the SF-fixture floor from the round-15 0.64 to >= 0.8
    assert(recall >= 0.8, s"IVF recall $recall too low")
    // rank lists are well-formed
    val ranks = Similarity.ivfTopK(emb, nQueries = 5, k = 5)
      .groupBy("query_id").agg(max("rank").as("mx"), count(lit(1)).as("n")).collect()
    ranks.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  /** Second (coarser/cheaper) parameter point per ANN family, so the
    * recall/cost CURVE is pinned, not one point: a regression that quietly
    * cheapens the expensive configuration (recall collapse) or quietly
    * enriches the cheap one (cost creep — e.g. nProbe ignored and every
    * cell scanned) both break an ordering assertion. Recall floors are the
    * envelope; the cross-point assertions are the curve shape. Seeds are
    * fixed throughout, so all values are deterministic. */
  test("ANN recall/cost curve: coarse parameter points sit below the fine ones, above their floors") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 5, k = 5)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    // LSH: 2 hash tables vs the standard 8 — fewer tables, fewer OR-chances.
    val lshCoarse = recallOf(Similarity.lshTopK(emb, nQueries = 5, k = 5, numHashTables = 2))
    val lshFine = recallOf(Similarity.lshTopK(emb, nQueries = 5, k = 5, numHashTables = 8))
    assert(lshCoarse >= 0.2, s"LSH(2 tables) recall $lshCoarse below envelope floor")
    assert(lshFine >= lshCoarse,
      s"LSH recall not monotone in numHashTables: 8 tables $lshFine < 2 tables $lshCoarse")
    // IVF: probe 1 of 16 cells vs 6 — strictly fewer candidate cells.
    val ivfCoarse = recallOf(Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCells = 16, nProbe = 1))
    val ivfFine = recallOf(Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCells = 16, nProbe = 6))
    assert(ivfCoarse >= 0.2, s"IVF(nProbe=1) recall $ivfCoarse below envelope floor")
    assert(ivfFine >= ivfCoarse,
      s"IVF recall not monotone in nProbe: nProbe=6 $ivfFine < nProbe=1 $ivfCoarse")
  }

  test("cosine near-dup block join: exact parity with the naive theta join") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    def naive(t: Double) = {
      val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(graft.functions.VectorOps.cosine(col("ea"), col("eb")), 6).as("cosine"))
        .filter(col("cosine") > t)
    }
    val expected = naive(0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Similarity.cosineNearDupPairs(emb, PairScope.Unbounded, threshold = 0.35, numBlocks = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("cosine near-dup block join: no BroadcastNestedLoopJoin in the plan") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val plan = Similarity.cosineNearDupPairs(emb, PairScope.Unbounded, threshold = 0.35)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ found in plan:\n$plan")
  }

  test("multimodal: payload metadata and real PPM decode plumbing") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val meta = Multimodal.payloadMetadata(docs)
    assert(meta.filter(col("payload_bytes") =!= length(col("text"))).count() === 0)
    val feats = Multimodal.decodeFeatures(docs)
    assert(feats.count() === docs.count())
    val first = feats.orderBy("doc_id").head
    assert(first.getSeq[Double](1).length === Multimodal.PpmDecoder.featureDim)
    // deterministic: same content -> same features
    val f2 = Multimodal.decodeFeatures(docs).orderBy("doc_id").head
    assert(first.getSeq[Double](1) === f2.getSeq[Double](1))
  }

  test("PpmDecoder: byte-exact parse of a hand-built 2x2 P6 image") {
    // R=(10,0,0) G=(0,20,0) B=(0,0,40) W=(250,250,250), maxval 255
    val raster = Array[Int](
      10, 0, 0,   0, 20, 0,
      0, 0, 40,   250, 250, 250).map(_.toByte)
    val img = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ raster
    val f = Multimodal.PpmDecoder.decode(img)
    assert(f.toSeq === Seq(2.0, 2.0, 255.0,
      (10 + 0 + 0 + 250) / 4.0, (0 + 20 + 0 + 250) / 4.0, (0 + 0 + 40 + 250) / 4.0))
  }

  test("PpmDecoder: malformed payloads are rejected, not averaged over") {
    def bad(bytes: Array[Byte]) =
      intercept[IllegalArgumentException](Multimodal.PpmDecoder.decode(bytes))
    assert(bad("P5\n1 1\n255\n...".getBytes("US-ASCII")).getMessage.contains("magic"))
    assert(bad("P6\n1 1\n255\nXX".getBytes("US-ASCII")).getMessage.contains("raster"))
    assert(bad("P6\n0 1\n255\n".getBytes("US-ASCII")).getMessage.contains("degenerate"))
    assert(bad("P6\n1 1\n65535\n".getBytes("US-ASCII")).getMessage.contains("maxval"))
  }

  test("static binary PPM fixtures decode to the generator's intended pixel stats") {
    // Expected rows computed by the fixture generator from the intended
    // pixel ARRAYS (same literals as the q149 oracle) — not by re-parsing
    // the files — so this pins the decoder against an independent source
    // on payloads that are genuinely binary: maxval 200 and 1, dimensions
    // unrelated to any text, pixels spanning 0-255, comments on their own
    // line AND between header fields.
    val expected = Map(
      0L -> (4L, 3L, 200L, 318L, 1674L, 612L, 0L, 86L, 5L, 53L, 193L, 164L),
      1L -> (1L, 1L, 1L, 1L, 0L, 1L, 1L, 0L, 1L, 1L, 0L, 1L),
      2L -> (8L, 2L, 255L, 2040L, 2064L, 1664L, 0L, 3L, 0L, 255L, 255L, 252L))
    val got = Multimodal.decodeStatsPayloads(Multimodal.staticPpmFrame(spark))
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
          r.getLong(10), r.getLong(11), r.getLong(12))
      }.toMap
    assert(got === expected)
  }

  test("withPpmPayload emits payloads PpmDecoder round-trips: h=ceil(len/24), space padding") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").limit(20)
    val rows = Multimodal.withPpmPayload(docs)
      .select(col("doc_id"), length(col("text")).as("len"), col("payload"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val len = r.getAs[Int]("len")
      val f = Multimodal.PpmDecoder.decode(r.getAs[Array[Byte]]("payload"))
      assert(f(0) === 8.0)
      assert(f(1) === math.max(1, math.ceil(len / 24.0)).toDouble)
      assert(f(2) === 255.0)
    }
  }

  test("q224 aHash: hand-built bright-top/dark-bottom image gives the known bit pattern") {
    // 8x2 image: top row all-white (gray 765), bottom row all-black.
    // h=2 → row 0 lands in band 0, row 1 in band 4; bands 1-3/5-7 empty.
    // Band 0 cells sit above the global mean → '1'; band 4 → '0';
    // empty cells → '0' by contract.
    val raster = Array.fill(24)(255.toByte) ++ Array.fill(24)(0.toByte)
    val img = "P6\n8 2\n255\n".getBytes("US-ASCII") ++ raster
    val bits = Multimodal.PpmDecoder.aHashBits(img)
    assert(bits === "1" * 8 + "0" * 56)
    // global-mean tie: a uniform image has every cell mean == global mean
    // → the >= threshold sets every occupied cell to '1'
    val flat = "P6\n8 2\n255\n".getBytes("US-ASCII") ++ Array.fill(48)(7.toByte)
    val fb = Multimodal.PpmDecoder.aHashBits(flat)
    assert(fb === "1" * 8 + "0" * 24 + "1" * 8 + "0" * 24)
  }

  test("q224 aHash runs on the genuinely binary static fixtures: 64 bits, deterministic") {
    val frames = Multimodal.staticPpmFrame(spark).collect()
    frames.foreach { r =>
      val b1 = Multimodal.PpmDecoder.aHashBits(r.getAs[Array[Byte]](1))
      val b2 = Multimodal.PpmDecoder.aHashBits(r.getAs[Array[Byte]](1))
      assert(b1.length === 64 && b1.forall(c => c == '0' || c == '1'))
      assert(b1 === b2)
    }
  }

  test("q225 banded perceptual near-dup has PERFECT recall vs brute-force Hamming") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val hashes = Multimodal.aHashTable(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = ha.zip(hb).count { case (x, y) => x != y } if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    val banded = Multimodal.aHashNearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute, "banding diverged from the all-pairs computation")
    assert(brute.nonEmpty, "fixture produced no perceptual near-dups — vacuous")
  }
}
