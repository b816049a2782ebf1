package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** GLPR — "graft length-prefixed records" — a minimal WARC-shaped record
  * format (the length-prefixed record-stream layout LLM corpora actually
  * arrive in: WARC, TFRecord, MDS shards), implemented as a REAL
  * DataSource V2 connector so the engine's source layer is exercised end
  * to end, not just the built-in formats:
  *
  *  - '''record layout''' (big-endian): `[i64 doc_id][i32 langLen][lang
  *    utf8][i32 srcLen][source utf8][i32 textLen][text utf8]` — a
  *    self-describing stream any language can write.
  *  - '''shards''': one `part-N.glpr` file per writer partition; the read
  *    side plans ONE InputPartition per shard — the 100 TB parallelism
  *    unit, like parquet row-groups or WARC segment files.
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): pruned
  *    string fields are length-SKIPPED in the byte stream, never UTF-8
  *    decoded nor materialized — a doc_id-only count never touches text
  *    bytes. `.explain` shows the pruned ReadSchema.
  *  - '''filter pushdown''' ([[SupportsPushDownFilters]]): doc_id range
  *    predicates (`> >= < <=` with Long literals) evaluate against the
  *    fixed-offset id BEFORE field decode, skipping non-matching records
  *    entirely; they are reported as pushed (`PushedFilters: [...]`) and
  *    Spark drops its residual. Everything else stays a residual above
  *    the scan.
  *
  * Scope note: shard IO is `java.io` against a local path — the sandbox
  * reality; a cluster deployment swaps the two stream constructors for
  * `FileSystem.open/create` on the Hadoop FS API and nothing else
  * changes. Certified by the q284 oracle: documents written to GLPR and
  * read back through this connector hash-match the parquet originals
  * column for column, byte for byte. */
object GlprSource {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Distributed writer through the connector's own DSv2 WRITE path —
    * one shard per task, two-phase committed (stage + atomic rename; see
    * [[GlprWriter]]). Re-running the same write replaces shards by
    * partition id, so a replayed job is idempotent. */
  def write(docs: DataFrame, path: String): Unit =
    docs.select("doc_id", "lang", "source", "text")
      .write.format("graft.io.GlprSource").mode("append").save(path)

  /** One GLPR staging per (JVM, dir) — the cached-sink convention shared
    * with the format round-trips ([[Formats]]): write the documents table
    * once, then every reader (registry, specs, bench reps) goes through
    * the connector against the same shards. */
  private val stagedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[io] def stagedPath(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    stagedCache.computeIfAbsent(dir, _ => {
      val root = TempDirs.scratch("graft-glpr").toString
      write(Tables(spark, dir, "documents").select("doc_id", "lang", "source", "text"), root)
      root
    })
  def documentsVia(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.format("graft.io.GlprSource").load(stagedPath(spark, dir))

  /** q285: the staged shards consumed as a STREAM through the connector's
    * [[GlprMicroBatchStream]] and rolled into a per-language profile —
    * certifying the custom streaming-source path (offsets, per-trigger
    * shard planning, the same pruning reader) against the identical batch
    * oracle. Complete-mode memory settle, re-materialized on the caller's
    * session (the [[graft.streaming.Events]] settle shape). */
  def streamedLangProfile(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val path = stagedPath(spark, dir)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val stream = s2.readStream.format("graft.io.GlprSource").load(path)
    val agg = stream.groupBy("lang").agg(count(lit(1)).as("n_docs"),
      sum(octet_length(col("text")).cast("long")).as("n_bytes"))
    val name = s"graft_glpr_stream_${glprStreamCounter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val settled = s2.table(name)
    val outSchema = settled.schema
    val rows = settled.collect()
    s2.catalog.dropTempView(name)
    spark.createDataFrame(rows.toSeq.asJava, outSchema)
  }
  private val glprStreamCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  private[io] final case class GlprPartition(file: String) extends InputPartition

  /** doc_id bounds compiled from the pushed filters (inclusive). */
  private[io] final case class IdRange(lo: Long, hi: Long) {
    def contains(id: Long): Boolean = id >= lo && id <= hi
  }

  private[io] def compileFilters(fs: Array[Filter]): (Array[Filter], IdRange) = {
    var lo = Long.MinValue; var hi = Long.MaxValue
    // strict bounds at the Long extremes stay residuals: v+1 / v-1 would
    // WRAP, silently widening a pushed (residual-dropped) filter to the
    // whole id space
    val pushed = fs.filter {
      case GreaterThan("doc_id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) if v > Long.MinValue =>
        hi = math.min(hi, v - 1); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v); true
      case _ => false
    }
    (pushed, IdRange(lo, hi))
  }
}

class GlprSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GlprSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GlprTable(properties.get("path"))
}

class GlprTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"glpr:$path"
  override def schema(): StructType = GlprSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GlprScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GlprWriteBuilder(path, info.schema())
}

/** DSv2 WRITE path: `df.write.format("graft.io.GlprSource").save(path)`.
  * Tasks stage to `_tmp-<task>` files and COMMIT by atomic rename — an
  * aborted/speculative task leaves no visible shard (the two-phase
  * commit every exactly-once batch sink runs); the job-level commit is
  * the no-op the rename already made durable. */
class GlprWriteBuilder(path: String, schema: StructType) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GlprBatchWrite(path, schema)
  }
}

class GlprBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    new GlprWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GlprWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GlprWriter(path, schema, partitionId, taskId)
}

/** Per-task shard writer over the logical write schema (fields located
  * by name so a reordered projection still lands in layout order). */
class GlprWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val idx: Map[String, Int] = schema.fieldNames.zipWithIndex.toMap
  require(GlprSource.schema.fieldNames.forall(idx.contains),
    s"GLPR write needs columns ${GlprSource.schema.fieldNames.mkString(",")}")
  private val tmp = new java.io.File(path, f"_tmp-$taskId%d-part-$partitionId%05d.glpr")
  private val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(tmp)))
  override def write(r: InternalRow): Unit = {
    out.writeLong(r.getLong(idx("doc_id")))
    Seq("lang", "source", "text").foreach { f =>
      val b = r.getUTF8String(idx(f)).getBytes
      out.writeInt(b.length); out.write(b)
    }
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    val dest = new java.io.File(path, f"part-$partitionId%05d.glpr")
    java.nio.file.Files.move(tmp.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new WriterCommitMessage {}
  }
  override def abort(): Unit = { out.close(); tmp.delete(): Unit }
  override def close(): Unit = ()
}

class GlprScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = GlprSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var range: GlprSource.IdRange = GlprSource.IdRange(Long.MinValue, Long.MaxValue)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (p, r) = GlprSource.compileFilters(filters)
    pushed = p; range = r
    filters.filterNot(p.contains) // residual for Spark
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GlprScan(path, required, range, pushed)
}

class GlprScan(path: String, required: StructType, range: GlprSource.IdRange,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaces in .explain — the DSv2 analogue of the file-source
  // PushedFilters/ReadSchema lines PlanLint-style checks grep for
  override def description(): String =
    s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".glpr")).map(_.getAbsolutePath).sorted
    files.map(f => GlprSource.GlprPartition(f): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GlprReaderFactory(required, range)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GlprMicroBatchStream(path, required, range)
}

/** Streaming offset: the lexically-largest shard NAME processed so far.
  * Name-interval offsets make restarts exact without a metadata log, on
  * one contract: shards are APPEND-ONLY with monotonically increasing
  * names (the writer's zero-padded part numbering) — a late file sorting
  * below the committed name is ignored rather than double-read. The
  * built-in file source buys the general case with its `_spark_metadata`
  * log; this connector documents the cheaper invariant instead. */
private[io] case class GlprOffset(last: String) extends Offset {
  override def json(): String =
    "{\"last\":\"" + last.replace("\\", "\\\\").replace("\"", "\\\"") + "\"}"
}

/** GLPR as a STREAMING source ([[MicroBatchStream]]): each trigger reads
  * the shards that landed since the committed name offset — the "ingest
  * shards as they arrive" front door a corpus pipeline runs against an
  * object-store prefix. Pruning and doc_id pushdown apply per micro-batch
  * exactly as in the batch scan (same reader). */
class GlprMicroBatchStream(path: String, required: StructType,
    range: GlprSource.IdRange) extends MicroBatchStream {
  private def files(): Array[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".glpr") && !f.getName.startsWith("_tmp"))
      .map(_.getName).sorted
  }
  override def initialOffset(): Offset = GlprOffset("")
  override def latestOffset(): Offset =
    GlprOffset(files().lastOption.getOrElse(""))
  override def deserializeOffset(json: String): Offset = {
    val m = """\{"last":"(.*)"\}""".r
    json match {
      case m(last) => GlprOffset(last.replace("\\\"", "\"").replace("\\\\", "\\"))
      case _ => GlprOffset("")
    }
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GlprOffset].last
    val hi = end.asInstanceOf[GlprOffset].last
    files().filter(n => n > lo && n <= hi)
      .map(n => GlprSource.GlprPartition(new java.io.File(path, n).getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GlprReaderFactory(required, range)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class GlprReaderFactory(required: StructType, range: GlprSource.IdRange)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GlprReader(partition.asInstanceOf[GlprSource.GlprPartition].file,
      required, range)
}

/** Streaming per-shard reader: pruned fields are byte-skipped, pushed
  * doc_id bounds short-circuit before any field decode. */
class GlprReader(file: String, required: StructType, range: GlprSource.IdRange)
    extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file)))
  // field order in the byte stream after doc_id
  private val streamFields = Array("lang", "source", "text")
  private val wantIdx: Map[String, Int] =
    required.fieldNames.zipWithIndex.toMap
  private var current: InternalRow = _

  private def readOrSkip(want: Boolean): UTF8String = {
    val len = in.readInt()
    // corrupt-shard diagnostics: a negative or truncated length must name
    // the shard, not surface as a bare EOF three frames deep in a task
    if (len < 0)
      throw new java.io.IOException(
        s"GLPR shard $file is corrupt: negative field length $len")
    try {
      if (want) {
        val b = new Array[Byte](len)
        in.readFully(b)
        UTF8String.fromBytes(b)
      } else { in.skipNBytes(len.toLong); null }
    } catch {
      case e: EOFException =>
        throw new java.io.IOException(
          s"GLPR shard $file is truncated mid-record (field of $len bytes)", e)
    }
  }

  private val idTail = new Array[Byte](7)

  override def next(): Boolean = {
    while (true) {
      // distinguish CLEAN end-of-shard (no next record at all) from a
      // shard truncated INSIDE a record id — readLong alone reports both
      // as EOF
      val first = in.read()
      if (first == -1) return false
      try in.readFully(idTail) catch {
        case e: EOFException =>
          throw new java.io.IOException(
            s"GLPR shard $file is truncated inside a record id", e)
      }
      var id = first.toLong & 0xffL
      var i = 0
      while (i < 7) { id = (id << 8) | (idTail(i) & 0xffL); i += 1 }
      val keep = range.contains(id)
      val vals = new Array[Any](required.length)
      wantIdx.get("doc_id").foreach(i => vals(i) = id)
      streamFields.foreach { f =>
        val s = readOrSkip(keep && wantIdx.contains(f))
        wantIdx.get(f).foreach(i => if (keep) vals(i) = s)
      }
      if (keep) { current = InternalRow.fromSeq(vals.toIndexedSeq); return true }
      // else: record skipped wholesale; loop to the next one
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
