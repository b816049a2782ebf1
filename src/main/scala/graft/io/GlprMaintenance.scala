package graft.io

import org.apache.spark.sql.DataFrame

/** Maintenance operations over a GLPR shard directory — the OPTIMIZE /
  * VACUUM rung of the connector's lakehouse ladder (q309).
  *
  * '''Compaction''' (the small-files problem): streaming ingest under
  * admission control, per-task batch writes, and partitioned inserts all
  * produce many small shards; at 100 TB the per-file open/plan overhead
  * and the task-count explosion dominate. `compact` greedily groups
  * lexically-consecutive committed shards until each group reaches
  * `targetBytes`, then merges each group by BYTE CONCATENATION — the
  * GLPR record stream is self-delimiting, so concatenating shard
  * payloads IS a valid shard; no decode, no re-encode, no Spark job.
  * The merged sidecar is computed from the group's sidecars alone:
  * rows/field-bytes sum, id bounds take min/max, partition-value sets
  * union (dropped if any member lacks them or columns disagree), and
  * doc_id blooms OR-merge after folding to the smallest member size
  * (power-of-two folding is membership-exact, so the merged bloom
  * never false-negatives).
  *
  * '''Naming & visibility contract''': the merged shard REUSES the
  * group's first (lexically smallest) name, so compaction never mints
  * names outside the existing order — but it is for QUIESCENT corpora:
  * a concurrent streaming reader whose offset sits inside a group
  * could skip or re-read the moved rows (a production system makes
  * this atomic with a manifest/snapshot layer; this format's
  * documented scope is name-interval offsets over append-only dirs).
  * Crash ordering prefers a visibility gap over duplication: the
  * merged shard is staged invisibly (`_tmp-`), the old shards are
  * unlinked, and the stage is renamed in LAST — a crash in between
  * leaves the staged file on disk for manual recovery rather than
  * serving the same rows twice.
  *
  * '''Vacuum''': `_tmp-` stage wreckage from crashed/speculative
  * writers is invisible to readers (the committedShards filter) but
  * costs storage forever; `vacuum` unlinks stage files older than a
  * grace period (default 0 here — the sandbox has no concurrent
  * writers; production would use hours, like Delta's VACUUM horizon).
  */
object GlprMaintenance {

  /** One compacted group's bookkeeping, for reports/tests. */
  final case class CompactGroup(mergedName: String, memberNames: Seq[String],
      rows: Long, bytes: Long)

  /** Merge groups of small committed shards up to `targetBytes` each.
    * Returns the groups actually merged (singletons are untouched and
    * not reported). Byte-level concatenation; sidecars merged from
    * sidecars — see the object doc for the exact fold rules. */
  def compact(path: String, targetBytes: Long): Seq[CompactGroup] = {
    val shards = GlprSource.committedShards(path)
    // greedy consecutive grouping in lexical (= id/epoch) order, so the
    // merged shard's reused first-name keeps the directory's name order
    val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[java.io.File]]
    var cur = Vector.empty[java.io.File]
    var curBytes = 0L
    shards.foreach { f =>
      if (cur.nonEmpty && curBytes + f.length > targetBytes) {
        groups += cur; cur = Vector.empty; curBytes = 0L
      }
      cur :+= f; curBytes += f.length
    }
    if (cur.nonEmpty) groups += cur
    val merged = groups.toSeq.filter(_.length > 1).map(mergeGroup(path, _))
    // manifest hygiene after the swaps: members out, merged names stay
    // (each reuses its group's first name, already listed)
    if (merged.nonEmpty)
      GlprSource.readManifest(path).foreach { _ =>
        GlprSource.writeManifest(path,
          GlprSource.committedShards(path).map(_.getName).toSeq)
      }
    merged
  }

  private def mergeGroup(path: String, group: Vector[java.io.File]): CompactGroup = {
    val name = group.head.getName
    val metas = group.map(GlprSource.readMeta)
    // --- merged sidecar from member sidecars (None if any is missing:
    // the merged shard then rides the raw-size fallback, like any
    // externally-written shard) ---
    val mergedMeta: Option[String] = if (metas.forall(_.isDefined)) {
      val ms = metas.map(_.get)
      val rows = ms.map(_.rows).sum
      val base = s"rows=$rows lang=${ms.map(_.lang).sum} " +
        s"source=${ms.map(_.source).sum} text=${ms.map(_.text).sum}"
      val nonEmpty = ms.filter(_.rows > 0)
      val bounds =
        if (nonEmpty.nonEmpty && nonEmpty.forall(_.bounds.isDefined)) {
          val bs = nonEmpty.flatMap(_.bounds)
          s" idlo=${bs.map(_._1).min} idhi=${bs.map(_._2).max}"
        } else ""
      val pvals = {
        val cols = nonEmpty.flatMap(_.pcol).distinct
        if (nonEmpty.nonEmpty && cols.length == 1 &&
            nonEmpty.forall(_.pvals.isDefined)) {
          val union = nonEmpty.flatMap(_.pvals.get).toSet
          if (union.size <= 32)
            s" pcol=${cols.head} pvals=${union.toSeq.sorted.map(GlprSource.encodePval).mkString(",")}"
          else ""
        } else ""
      }
      val bloom =
        if (nonEmpty.nonEmpty && nonEmpty.forall(_.bloom.isDefined)) {
          val blooms = nonEmpty.flatMap(_.bloom)
          val minBits = blooms.map(_.length * 64).min
          val merged = new Array[Long](minBits / 64)
          blooms.foreach { b =>
            val folded = GlprSource.bloomFold(b, minBits)
            var i = 0
            while (i < merged.length) { merged(i) |= folded(i); i += 1 }
          }
          s" bloom=${GlprSource.bloomHex(merged)}"
        } else ""
      Some(base + bounds + pvals + bloom)
    } else None

    // --- stage the concatenated payload invisibly ---
    val stage = new java.io.File(path, s"_tmp-compact-$name")
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(stage))
    try group.foreach(f => java.nio.file.Files.copy(f.toPath, out))
    finally out.close()
    val stageMeta = new java.io.File(path, s"_tmp-compact-$name.meta")
    mergedMeta.foreach(m => java.nio.file.Files.write(stageMeta.toPath,
      m.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

    // --- unlink old, rename stage in LAST (gap over duplication) ---
    group.foreach { f => GlprSource.metaFile(f).delete(); f.delete(): Unit }
    val dest = new java.io.File(path, name)
    if (mergedMeta.isDefined)
      java.nio.file.Files.move(stageMeta.toPath,
        GlprSource.metaFile(dest).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(stage.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    CompactGroup(name, group.map(_.getName),
      mergedMeta.flatMap(_ => metas.flatMap(_.map(_.rows)).reduceOption(_ + _))
        .getOrElse(-1L),
      dest.length)
  }

  /** Unlink `_tmp-` stage wreckage older than `graceMillis`. Returns
    * the number of files removed. */
  def vacuum(path: String, graceMillis: Long = 0L): Int = {
    val horizon = System.currentTimeMillis() - graceMillis
    val doomed = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("_tmp") && f.lastModified() < horizon)
    doomed.foreach(_.delete(): Unit)
    doomed.length
  }

  /** q309 — the compaction pipeline as a registry entry: the corpus
    * written as MANY deliberately-small shards, compacted to a handful
    * by byte concatenation + sidecar merge, then read back through the
    * connector and aggregated. The oracle is the plain documents
    * rollup — hash equality certifies compaction moved every row
    * exactly once; the file-count collapse, sidecar-sum preservation,
    * and post-compaction bloom/bounds pruning are GlprSpec-pinned. */
  def compactionPipeline(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = compactCache.computeIfAbsent(dir, _ => {
      val out = TempDirs.scratch("graft-glpr-compact").toString
      GlprSource.write(Tables(spark, dir, "documents")
        .select("doc_id", "lang", "source", "text")
        .repartitionByRange(16, col("doc_id")), out)
      compact(out, targetBytes = Long.MaxValue / 2): Unit // one merged shard per run
      out
    })
    spark.read.format("graft.io.GlprSource").load(root)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("text")).cast("long")).as("n_bytes"))
  }
  private val compactCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
}
