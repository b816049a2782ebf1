package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall regression harness (the ScaleProbe discipline applied to
  * RECALL instead of α): every approximate-nearest-neighbor registry
  * entry is measured against its exact counterpart at two SFs and the
  * numbers land in `RECALL_r<N>.md`, with the previous rounds' values
  * scraped back in for a round-over-round column — so recall drift
  * across rounds is as visible as a scaling-exponent drift. The
  * ScalaTest envelopes (LlmDataSpec / EmbeddingPcaSpec /
  * Round14OpsSpec) remain the hard gates; this probe is the TREND
  * instrument.
  *
  * Truth definitions match the pinned specs:
  *  - q46 (BRP-LSH) and q62 (IVF): top-k pair recall vs
  *    `Similarity.bruteForceTopK` on the full-dim embeddings.
  *  - q191 (PCA→IVF): top-k pair recall vs brute force IN THE REDUCED
  *    SPACE — the quantity the index approximates (full-dim recall on
  *    this isotropic fixture only certifies randomness; see
  *    EmbeddingPcaSpec).
  *  - q269 (ANN bitext): source recall AND selected-pair agreement vs
  *    the exact q254 margin grid.
  *
  *   sbt "runMain graft.tools.RecallProbe 15"   # writes RECALL_r15.md
  */
object RecallProbe {
  private val SfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val round = args.headOption.getOrElse("0")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llmdata.Similarity
    import graft.ml.EmbeddingPca

    // (entry, config, sf) -> recall in [0,1]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Double)]
    for (dir <- SfDirs) {
      val sf = dir.split("/").last
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val exact = pairSet(Similarity.bruteForceTopK(emb, nQueries = 5, k = 5))
      def recallOf(df: DataFrame): Double =
        (exact & pairSet(df)).size.toDouble / exact.size

      rows += (("q46_ann_lsh", "8 tables, top-5 of 5 queries", sf,
        recallOf(Similarity.lshTopK(emb, nQueries = 5, k = 5, numHashTables = 8))))
      rows += (("q62_ann_ivf", "16 cells (min-fill capped), nProbe=6, top-5 of 5 queries", sf,
        recallOf(Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCells = 16, nProbe = 6))))

      // q191: truth re-derived in the reduced space (the spec's contract)
      val reduced = EmbeddingPca.project(spark, dir, k = 8)
        .select(col("vec_id"), col("pc").as("embedding"))
      val exactReduced = pairSet(Similarity.bruteForceTopK(reduced, nQueries = 5, k = 5))
      val pcaIvf = pairSet(EmbeddingPca.pcaIvfTopK(spark, dir, k = 8, nQueries = 5, topK = 5))
      rows += (("q191_pca_ann", "PCA k=8 → IVF, reduced-space truth", sf,
        (exactReduced & pcaIvf).size.toDouble / exactReduced.size))

      // q269: source recall + selected-pair agreement vs exact q254
      def toMap(df: DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exactBi = toMap(Similarity.bitextMarginMining(emb))
      val annBi = toMap(Similarity.bitextMarginMiningAnn(emb))
      val common = exactBi.keySet.intersect(annBi.keySet)
      rows += (("q269_bitext_ann", "source recall vs exact q254", sf,
        common.size.toDouble / exactBi.size))
      rows += (("q269_bitext_ann", "pair agreement on common sources", sf,
        if (common.isEmpty) 0.0
        else common.count(k => exactBi(k) == annBi(k)).toDouble / common.size))
    }

    // previous rounds' values, scraped from stored RECALL_r*.md tables:
    // "| entry | config | sf | 0.xxx |" rows keyed (entry, config, sf)
    val prevRe = """RECALL_r(\d+)\.md""".r
    val rowRe = """\|\s*(\S+)\s*\|\s*([^|]*?)\s*\|\s*(sf[\d.]+)\s*\|\s*([\d.]+)\s*\|""".r
    val prevRows: Seq[((String, String, String), (Int, Double))] =
      Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .flatMap { f => f.getName match {
          case prevRe(n) if n.toInt.toString != round => Some((n.toInt, f)); case _ => None } }
        .sortBy(_._1)
        .flatMap { case (n, f) =>
          rowRe.findAllMatchIn(Files.readString(f.toPath)).map(m =>
            ((m.group(1), m.group(2), m.group(3)), (n, m.group(4).toDouble)))
        }.toSeq
    val prev: Map[(String, String, String), Seq[(Int, Double)]] =
      prevRows.groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    // config strings legitimately evolve (e.g. q62's round-16 min-fill
    // cap renamed its config); fall back to (entry, sf) history when
    // THIS round has exactly one row for the pair — so a config rename
    // never silently drops the trend column
    val entrySfCount = rows.groupBy(r => (r._1, r._3)).view.mapValues(_.size).toMap
    val prevByEntrySf: Map[(String, String), Seq[(Int, Double)]] =
      prevRows.groupBy(r => (r._1._1, r._1._3)).view
        .mapValues(_.map(_._2).sortBy(_._1)).toMap
    def historyOf(entry: String, config: String, sf: String): Seq[(Int, Double)] =
      prev.getOrElse((entry, config, sf),
        if (entrySfCount((entry, sf)) == 1)
          prevByEntrySf.getOrElse((entry, sf), Seq.empty)
        else Seq.empty)

    val sb = new StringBuilder
    sb.append(s"# RECALL — round $round ANN recall trend\n\n")
    sb.append("Generated by `graft.tools.RecallProbe`; truth definitions match the\n")
    sb.append("hard ScalaTest envelopes (LlmDataSpec, EmbeddingPcaSpec, Round14OpsSpec).\n")
    sb.append("Fixed seeds end to end, so values are deterministic per (code, SF).\n\n")
    sb.append("| entry | config | sf | recall | previous rounds |\n")
    sb.append("|---|---|---|---|---|\n")
    rows.foreach { case (entry, config, sf, recall) =>
      val hist = historyOf(entry, config, sf)
        .map { case (n, v) => f"r$n%s=$v%.3f" }.mkString(", ")
      sb.append(f"| $entry | $config | $sf | $recall%.3f | ${if (hist.isEmpty) "—" else hist} |\n")
    }
    Files.writeString(Paths.get(s"RECALL_r$round.md"), sb.toString)
    println(s"WROTE RECALL_r$round.md")
    spark.stop()
  }
}
