package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for GLPR maintenance (q316/q317) — the Iceberg
  * `CALL catalog.system.proc(...)` pattern over Spark 4's public
  * `ProcedureCatalog` API: table maintenance (compaction, vacuum,
  * restore, manifest recovery) and introspection (version history)
  * become one-line SQL for consumers with no DataFrame escape hatch —
  * DDL, DML, queries, functions AND maintenance all through the same
  * catalog. Each procedure resolves its `table` argument ('ns.table')
  * against the owning catalog's root, runs the corresponding
  * [[GlprSource]]/[[GlprMaintenance]] driver-side operation, and
  * returns its report as a [[LocalScan]] result set (CALL renders it
  * like a query). All procedures are non-deterministic by declaration:
  * they mutate or inspect on-disk state. */
object GlprProcedures {
  def names: Seq[String] = Seq(
    "history", "compact", "vacuum", "restore", "rebuild_manifest",
    "expire_versions", "recluster", "delete_where_mor",
    "create_branch", "publish_branch", "drop_branch",
    "set_partition_spec", "delete_range_mor", "branches", "clone",
    "tag", "drop_tag", "tags",
    "add_constraint", "drop_constraint", "constraints", "files",
    "update_where_mor", "merge_mor")
  def load(name: String, resolve: String => java.io.File,
      resolveFresh: String => java.io.File = null,
      catalog: String = ""): Option[UnboundProcedure] =
    names.find(_ == name).map(n => new GlprProcedure(n, resolve,
      Option(resolveFresh).getOrElse(resolve), catalog))

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** One row of a procedure result set. */
  private def row(vals: Any*): InternalRow = new GenericInternalRow(vals.toArray)

  // static result schemas — shared by the procedures and the metadata
  // TABLES (q360), whose schema() must not pay the full metadata read
  private[io] val historySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("n_shards", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = true)))
  private[io] val tagsSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("n_shards", IntegerType, nullable = true)))
  private[io] val branchesSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("n_versions", IntegerType, nullable = false),
    StructField("n_shards", IntegerType, nullable = false),
    StructField("fork_main_version", LongType, nullable = true)))
  private[io] val constraintsSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("expression", StringType, nullable = false)))
  private[io] val filesSchema = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("bytes", LongType, nullable = false),
    StructField("id_lo", LongType, nullable = true),
    StructField("id_hi", LongType, nullable = true),
    StructField("part_spec", StringType, nullable = true),
    StructField("part_values", StringType, nullable = true),
    StructField("masked", BooleanType, nullable = false)))

  private[io] final case class Result(schema: StructType,
      out: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = schema
    override def description(): String =
      s"GLPR procedure result: ${schema.fieldNames.mkString(", ")}"
  }

  /** `history('ns.table')` — the DESCRIBE HISTORY analogue: one row per
    * manifest version with its shard count and total rows (null when a
    * referenced shard or its sidecar no longer exists — vanished over
    * phantom, like the reads). Versions are CUMULATIVE snapshots, so
    * `n_rows` is the row count a `versionAsOf` read of that version
    * returns. */
  private[io] def history(dir: java.io.File): Result = {
    val schema = historySchema
    val path = dir.getAbsolutePath
    val out = GlprSource.listManifestVersions(path).map { v =>
      val names = GlprSource.versionShardNames(path, v)
      val metas = names.map(n =>
        GlprSource.readMeta(new java.io.File(dir, n)))
      val rows: Any =
        if (metas.forall(_.isDefined)) java.lang.Long.valueOf(metas.flatMap(_.map(_.rows)).sum)
        else null
      row(java.lang.Long.valueOf(v), java.lang.Integer.valueOf(names.length), rows)
    }.toArray
    Result(schema, out)
  }

  /** `tags('ns.table')` — tag introspection (q354): one row per tag
    * with its pinned version and that snapshot's shard count (null when
    * the version file vanished — shouldn't happen while the tag lives,
    * since expire skips tagged versions; an externally deleted file
    * still reads as null rather than erroring the listing). */
  private[io] def tags(dir: java.io.File): Result = {
    val schema = tagsSchema
    val path = dir.getAbsolutePath
    val out = GlprSource.listTags(path).toSeq.sortBy(_._1).map {
      case (t, v) =>
        val n: Any =
          try java.lang.Integer.valueOf(
            GlprSource.versionShardNames(path, v).length)
          catch { case _: IllegalArgumentException => null }
        row(utf8(t), java.lang.Long.valueOf(v), n)
    }.toArray
    Result(schema, out)
  }

  /** `add_constraint('ns.t', name, expr)` (q355) — admit a CHECK
    * constraint: validate the name, COMPILE the expression against the
    * table's full schema (parse / resolve / boolean / deterministic /
    * no-subquery — the same compiler every write job runs), then AUDIT
    * the EXISTING data through the catalog read path (masks, extras and
    * pruning all apply): a single violating row refuses the constraint,
    * the Delta posture — a constraint you could not have written under
    * never enters the marker. One atomic marker-token update. */
  private[io] def addConstraint(dir: java.io.File, catalog: String,
      ref: String, name: String, sql: String): Result = {
    val path = dir.getAbsolutePath
    require(name.matches("[A-Za-z0-9_-]{1,64}"),
      s"illegal GLPR constraint name '$name' ([A-Za-z0-9_-]{1,64})")
    val existing = GlprSource.checkConstraintsOf(path)
    require(!existing.exists(_._1 == name),
      s"GLPR CHECK constraint '$name' already exists on '$ref'")
    val extras = GlprSource.markerTokenOf(path, "extra_columns")
      .map(_.split(",", -1).iterator.filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    GlprSource.compileChecks(GlprSource.fullSchema(extras),
      Seq(name -> sql)): Unit
    val spark = org.apache.spark.sql.SparkSession.active
    require(catalog.nonEmpty, "GLPR add_constraint needs its owning catalog")
    def audit(): Long = spark.sql(
      s"SELECT count(*) FROM $catalog.$ref " +
        s"WHERE NOT ((($sql)) OR ((($sql)) IS NULL))").head().getLong(0)
    val bad = audit()
    require(bad == 0L,
      s"GLPR CHECK constraint '$name' refused: $bad existing row(s) of " +
        s"'$ref' violate ($sql) — constraints only admit over clean data")
    GlprSource.updateMarkerToken(path, "check_constraints",
      Some((existing :+ (name -> sql))
        .map { case (n, e) => GlprSource.encodeCheckToken(n, e) }
        .mkString(",")))
    // DOUBLE AUDIT (review finding): a write job whose factory compiled
    // its checks BEFORE the token landed enforces nothing for this
    // constraint — if such a job committed violating rows between the
    // first audit and the token write, re-auditing now (token visible,
    // so every NEW job enforces) catches it: back the token out and
    // refuse. A job that commits after this second audit remains a
    // documented race (a file-based format has no global write lock to
    // serialize admission against in-flight jobs) — the window is the
    // seconds between two audits, not the job's whole runtime.
    val bad2 = audit()
    if (bad2 > 0L) {
      // back out by RE-READING the current token and removing only this
      // constraint's entry — restoring the pre-write `existing` snapshot
      // would silently revert any other DDL writer's concurrent
      // add/drop, and this path only runs when concurrency already
      // happened (round-19 review)
      val current = GlprSource.checkConstraintsOf(path)
        .filterNot(_._1 == name)
      GlprSource.updateMarkerToken(path, "check_constraints",
        if (current.isEmpty) None
        else Some(current
          .map { case (n, e) => GlprSource.encodeCheckToken(n, e) }
          .mkString(",")))
      throw new IllegalStateException(
        s"GLPR CHECK constraint '$name' backed out: a concurrent write " +
          s"committed $bad2 violating row(s) between the admission audit " +
          "and the token write — re-run add_constraint once ingest settles")
    }
    summary("constraints" -> (existing.length + 1).toLong)
  }
  private[io] def dropConstraint(dir: java.io.File, name: String): Result = {
    val path = dir.getAbsolutePath
    val existing = GlprSource.checkConstraintsOf(path)
    require(existing.exists(_._1 == name),
      s"GLPR: no CHECK constraint '$name'" + {
        if (existing.isEmpty) " (table has no constraints)"
        else s"; constraints: ${existing.map(_._1).sorted.mkString(", ")}"
      })
    val kept = existing.filterNot(_._1 == name)
    GlprSource.updateMarkerToken(path, "check_constraints",
      if (kept.isEmpty) None
      else Some(kept.map { case (n, e) =>
        GlprSource.encodeCheckToken(n, e) }.mkString(",")))
    summary("constraints" -> kept.length.toLong)
  }
  /** `constraints('ns.table')` — one row per CHECK constraint. */
  private[io] def constraints(dir: java.io.File): Result = {
    Result(constraintsSchema, GlprSource.checkConstraintsOf(dir.getAbsolutePath)
      .sortBy(_._1).map { case (n, e) => row(utf8(n), utf8(e)) }.toArray)
  }

  /** `files('ns.table')` (q356) — shard-level introspection, the
    * Iceberg `files` metadata table / Delta `DESCRIBE DETAIL` move: one
    * row per LIVE shard with its sidecar statistics (rows, doc_id
    * bounds — PRE-mask, the planner's view), on-disk bytes, the
    * partition spec/values the shard was WRITTEN under (its own era,
    * q349), and whether a delete-vector mask currently gates it. Nulls
    * where a sidecar is missing or carries no bounds (external writers,
    * empty shards) — vanished stats read as unknown, never invented. */
  private[io] def files(dir: java.io.File): Result = {
    val schema = filesSchema
    val path = dir.getAbsolutePath
    val out = GlprSource.entriesResolved(path, None).sortBy(_._1.getName)
      .map { case (f, gen) =>
        val m = GlprSource.readMeta(f)
        val masked = gen.isDefined || GlprSource.dvFile(f).isFile
        row(utf8(f.getName),
          m.map(x => java.lang.Long.valueOf(x.rows)).orNull,
          java.lang.Long.valueOf(f.length()),
          m.flatMap(_.idLo).map(java.lang.Long.valueOf).orNull,
          m.flatMap(_.idHi).map(java.lang.Long.valueOf).orNull,
          m.flatMap(_.pcol).map(utf8).orNull,
          m.flatMap(_.pvals)
            .map(vs => utf8(vs.toSeq.sorted.mkString(","))).orNull,
          java.lang.Boolean.valueOf(masked))
      }.toArray
    Result(schema, out)
  }

  private[io] def summary(kv: (String, Long)*): Result =
    Result(StructType(kv.map(p => StructField(p._1, LongType, nullable = false))),
      Array(row(kv.map(p => java.lang.Long.valueOf(p._2)): _*)))

  /** `branches('ns.table')` — the refs introspection (the Iceberg
    * `refs` metadata-table analogue): one row per write-audit-publish
    * branch with its chain length, head shard count, and the recorded
    * fork-point main version (null for pre-round-19 chains). */
  private[io] def branches(dir: java.io.File): Result = {
    val schema = branchesSchema
    val path = dir.getAbsolutePath
    val out = GlprSource.listBranches(path).toSeq.sorted.map { b =>
      row(utf8(b),
        java.lang.Integer.valueOf(GlprSource.listBranchVersions(path, b).size),
        java.lang.Integer.valueOf(GlprSource.branchEntries(path, b).size),
        GlprSource.branchForkVersion(path, b)
          .map(java.lang.Long.valueOf).orNull)
    }.toArray
    Result(schema, out)
  }

  /** PARTITION-SPEC EVOLUTION (q349, round-18 verdict #4): re-point the
    * table's `partitioned_by` marker token at a new transform — one
    * atomic metadata write that MINTS A NEW SPEC ERA. New writes
    * cluster and track sidecar values under the new transform; every
    * existing shard keeps its OWN recorded spec in its sidecar (`pcol`)
    * and keeps pruning under it (the per-shard width resolution in the
    * scan's keep test), so a days-era and a months-era both prune
    * exactly under one predicate — the Iceberg spec-evolution model at
    * marker size. The transform is validated like CREATE TABLE's
    * PARTITIONED BY: identity/days/months/truncate read a STRING
    * column (base or extra), bucket reads doc_id. */
  private[io] def setPartitionSpec(dir: java.io.File, spec: String): Unit = {
    require(spec.nonEmpty && !spec.exists(_.isWhitespace),
      s"illegal GLPR partition spec '$spec'")
    val marker = new java.io.File(dir, "_glpr_table")
    val txt = new String(java.nio.file.Files.readAllBytes(marker.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim
    val tokens = txt.split("\\s+").filter(_.nonEmpty)
    val extras = tokens.collectFirst {
      case t if t.startsWith("extra_columns=") =>
        t.stripPrefix("extra_columns=").split(",", -1)
          .iterator.filter(_.nonEmpty).toSeq
    }.getOrElse(Seq.empty)
    val stringCols = (Seq("lang", "source") ++ extras
      .filter(t => GlprSource.extraTypeName(t) == "string")
      .map(GlprSource.extraLogical)).toSet
    GlprSource.parsePartSpec(spec) match {
      case GlprSource.BucketPart(n) =>
        require(n > 0 && n <= 4096, s"bucket count out of range: $n")
      case p: GlprSource.TruncatePart =>
        require(p.prefixLen > 0 && p.prefixLen <= 1024,
          s"truncate width out of range: ${p.prefixLen}")
        require(stringCols(p.column),
          s"GLPR truncate() partitioning reads a STRING column, got '${p.column}'")
      case p: GlprSource.PrefixPart =>
        require(stringCols(p.column),
          s"GLPR ${spec.takeWhile(_ != '(')}() partitioning reads an " +
            s"ISO-8601 STRING column, got '${p.column}'")
      case GlprSource.IdentityPart(c) =>
        require(stringCols(c),
          s"GLPR identity partitioning needs a string column, got '$c'")
    }
    val kept = tokens.filterNot(_.startsWith("partitioned_by="))
    java.nio.file.Files.write(marker.toPath,
      (s"partitioned_by=$spec" +: kept).mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}

/** SQL-ADDRESSABLE METADATA TABLES (q360) — `SELECT … FROM
  * cat.ns.t.<kind>` for kind ∈ history/files/tags/branches/constraints:
  * the same driver-side introspection the `sys` procedures return, but
  * as a real read-only TABLE (the Iceberg `db.table.history` idiom), so
  * the results compose with the rest of SQL — join `t.files` against a
  * rollup, filter `t.history` by version, aggregate `t.tags`. Backed by
  * the procedures' own [[GlprProcedures.Result]] (a DSv2 `LocalScan`),
  * built fresh at every scan: metadata reads only, no data bytes. */
private[io] object GlprMetadataTable {
  val Kinds: Set[String] =
    Set("history", "files", "tags", "branches", "constraints")
  private[io] def schemaOf(kind: String): StructType = kind match {
    case "history" => GlprProcedures.historySchema
    case "files" => GlprProcedures.filesSchema
    case "tags" => GlprProcedures.tagsSchema
    case "branches" => GlprProcedures.branchesSchema
    case "constraints" => GlprProcedures.constraintsSchema
    case other => throw new IllegalArgumentException(
      s"no GLPR metadata table '$other'")
  }
  private[io] def result(dir: java.io.File,
      kind: String): GlprProcedures.Result = kind match {
    case "history" => GlprProcedures.history(dir)
    case "files" => GlprProcedures.files(dir)
    case "tags" => GlprProcedures.tags(dir)
    case "branches" => GlprProcedures.branches(dir)
    case "constraints" => GlprProcedures.constraints(dir)
    case other => throw new IllegalArgumentException(
      s"no GLPR metadata table '$other'; available: ${Kinds.mkString(", ")}")
  }
}
private[io] final class GlprMetadataTable(dir: java.io.File, kind: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = s"${dir.getName}.$kind"
  // STATIC per-kind schema: resolution may call schema() repeatedly and
  // must not pay the full metadata read each time (review finding); the
  // procedure executes once, in build()
  override def schema(): StructType = GlprMetadataTable.schemaOf(kind)
  override def capabilities():
      java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.Collections.singleton(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap):
      org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): Scan = GlprMetadataTable.result(dir, kind)
    }
}

/** One named GLPR procedure; `bind` validates the argument shape, `call`
  * executes driver-side and returns the report as a local result set. */
final class GlprProcedure(procName: String, resolve: String => java.io.File,
    resolveFresh: String => java.io.File, catalog: String = "")
    extends UnboundProcedure {
  import GlprProcedures._
  override def name(): String = procName
  override def description(): String = procName match {
    case "history" => "history(table): manifest versions with shard/row counts"
    case "compact" => "compact(table, target_bytes): merge small shards up to target_bytes"
    case "vacuum" => "vacuum(table, grace_ms DEFAULT 0): unlink _tmp stage wreckage older than grace_ms"
    case "restore" => "restore(table, version): re-point the live manifest at a version"
    case "rebuild_manifest" => "rebuild_manifest(table): re-adopt the live content plus true orphans"
    case "expire_versions" => "expire_versions(table, keep DEFAULT -1, older_than_ms DEFAULT -1): drop manifest versions by COUNT (all but the newest keep) or by AGE (durable commit clock older than the instant; the live head never expires) - exactly one mode per call; tags exempt either way, then vacuum reclaims the retired shards"
    case "recluster" => "recluster(table, shards, zorder_by DEFAULT ''): rewrite the live table into shards tight-bounds files (OPTIMIZE) — range-clustered by doc_id, or Morton-interleaved with zorder_by (lang/source) so id bounds AND value sets both prune"
    case "delete_where_mor" => "delete_where_mor(table, column, values): merge-on-read predicate DELETE — mask rows where column IN (comma-separated values) via delete-vector generations, zero data moved (capped toward the COW SQL DELETE past 1M matched rows)"
    case "create_branch" => "create_branch(table, name): fork a write-audit-publish branch from the live manifest (stage writes with the 'branch' writer option; audit with the 'branch' reader option)"
    case "publish_branch" => "publish_branch(table, name): adopt the branch head into the live manifest in ONE commit (the audit passed)"
    case "drop_branch" => "drop_branch(table, name): unlink the branch chain (the audit failed); branch-only shards become vacuum-reclaimable orphans"
    case "set_partition_spec" => "set_partition_spec(table, spec): evolve the table's partition transform (e.g. 'days(ts)' -> 'months(ts)'); new writes cluster under the new spec, existing shards keep pruning under the spec they were written with"
    case "delete_range_mor" => "delete_range_mor(table, lo, hi, branch DEFAULT ''): merge-on-read id-range DELETE - mask doc_id in [lo, hi] via delete-vector generations, zero data moved; branch scopes the masks to a write-audit-publish branch head"
    case "update_where_mor" => "update_where_mor(table, column, values, set_column, set_value, branch DEFAULT ''): merge-on-read UPDATE - mask rows where column IN (comma-separated values) via delete-vector generations AND append their replacements with set_column := set_value, ONE versioned commit; priced by matched rows, not touched-shard bytes (capped toward the COW SQL UPDATE past 1M matches); branch scopes the fix to a write-audit-publish branch head"
    case "merge_mor" => "merge_mor(table, source, branch DEFAULT ''): merge-on-read MERGE/upsert - apply the source GLPR table keyed by doc_id (WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *): matched target rows masked, all source rows appended, ONE versioned commit; priced by the changeset (capped toward the COW SQL MERGE past 1M source rows); branch scopes the upsert to a write-audit-publish branch head"
    case "branches" => "branches(table): one row per write-audit-publish branch - chain length, head shard count, fork-point main version"
    case "clone" => "clone(table, dest): ZERO-COPY snapshot clone - hard-link the live shards (+ sidecars/masks) into dest and mint its manifest v1 from the live lines; fully independent tables over shared immutable bytes (the Delta shallow-clone move)"
    case "tag" => "tag(table, name, version DEFAULT -1): pin an IMMUTABLE named tag at a manifest version (-1 = the live head); VERSION AS OF '<name>' reads it forever and expire_versions keeps it (retention override)"
    case "drop_tag" => "drop_tag(table, name): remove a tag; its version rejoins ordinary retention"
    case "tags" => "tags(table): one row per tag - pinned version, shard count"
    case "add_constraint" => "add_constraint(table, name, expr): add a CHECK constraint (a SQL boolean over the table columns) enforced on EVERY write path - refused unless all existing rows already satisfy it (TRUE or NULL passes, the SQL standard)"
    case "drop_constraint" => "drop_constraint(table, name): remove a CHECK constraint"
    case "constraints" => "constraints(table): one row per CHECK constraint - name, expression"
    case "files" => "files(table): one row per LIVE shard - name, sidecar rows, bytes, doc_id bounds, partition spec/values, mask state (the Iceberg files / Delta DESCRIBE DETAIL introspection)"
    case _ => procName
  }

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = procName
    override def description(): String = GlprProcedure.this.description()
    // every procedure mutates or inspects on-disk state
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = procName match {
      case "compact" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("target_bytes", LongType).build())
      case "restore" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("version", LongType).build())
      // exactly ONE retention mode per call (q364): keep = count rule
      // (newest N survive), older_than_ms = age rule over the q335
      // durable commit clock (tags exempt, the head never expires)
      case "expire_versions" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("keep", LongType).defaultValue("-1").build(),
        ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue("-1").build())
      // zorder_by is OPTIONAL (q350): '' = the q336 doc_id range
      // recluster; 'lang'/'source' = the Morton-interleaved layout
      // (tight sidecar bounds AND value sets at once)
      case "recluster" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("shards", LongType).build(),
        ProcedureParameter.in("zorder_by", StringType).defaultValue("''").build())
      // grace_ms is OPTIONAL (SQL default 0): a vacuum issued while a
      // write is staging would unlink the live _tmp files of in-flight
      // tasks and fail them — the grace knob (GlprMaintenance.vacuum)
      // must be reachable from the SQL front door too (round-16 ADVICE)
      case "vacuum" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("grace_ms", LongType).defaultValue("0").build())
      // branch is OPTIONAL (q346): '' = main; a name scopes the delete
      // to that write-audit-publish branch head (masks in the branch's
      // dv namespace, one branch-chain commit, invisible to main)
      case "delete_where_mor" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("column", StringType).build(),
        ProcedureParameter.in("values", StringType).build(),
        ProcedureParameter.in("branch", StringType).defaultValue("''").build())
      case "create_branch" | "publish_branch" | "drop_branch" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      case "set_partition_spec" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("spec", StringType).build())
      case "clone" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("dest", StringType).build())
      // version is OPTIONAL (q354): -1 = the live head at call time
      case "tag" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("version", LongType).defaultValue("-1").build())
      case "drop_tag" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      case "add_constraint" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("expr", StringType).build())
      case "drop_constraint" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      case "delete_range_mor" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("lo", LongType).build(),
        ProcedureParameter.in("hi", LongType).build(),
        ProcedureParameter.in("branch", StringType).defaultValue("''").build())
      // branch is OPTIONAL (q366): '' = main; a name scopes the
      // update to that write-audit-publish branch head (masks in the
      // branch dv namespace, replacements on the branch chain, one
      // branch commit, invisible to main until publish)
      case "update_where_mor" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("column", StringType).build(),
        ProcedureParameter.in("values", StringType).build(),
        ProcedureParameter.in("set_column", StringType).build(),
        ProcedureParameter.in("set_value", StringType).build(),
        ProcedureParameter.in("branch", StringType).defaultValue("''").build())
      case "merge_mor" => Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("source", StringType).build(),
        ProcedureParameter.in("branch", StringType).defaultValue("''").build())
      case _ => Array(ProcedureParameter.in("table", StringType).build())
    }
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = resolve(input.getUTF8String(0).toString)
      val path = dir.getAbsolutePath
      val result: Result = procName match {
        case "history" => history(dir)
        case "compact" =>
          val merged = GlprMaintenance.compact(path, input.getLong(1))
          summary("merged_groups" -> merged.length.toLong,
            "merged_rows" -> merged.map(_.rows).sum)
        case "vacuum" =>
          summary("removed" ->
            GlprMaintenance.vacuum(path, input.getLong(1)).toLong)
        case "restore" =>
          val v = input.getLong(1)
          GlprSource.restoreToVersion(path, v)
          summary("restored_to" -> v,
            "live_version" -> GlprSource.listManifestVersions(path).last)
        case "expire_versions" =>
          val keep = input.getLong(1)
          val olderThan = input.getLong(2)
          require((keep >= 0L) != (olderThan >= 0L),
            "GLPR expire_versions takes exactly ONE retention mode: " +
              "keep => N (count rule) or older_than_ms => T (age rule " +
              "over the durable commit clock)")
          val expired =
            if (keep >= 0L) GlprMaintenance.expireVersions(path, keep.toInt)
            else GlprMaintenance.expireVersionsOlderThan(path, olderThan)
          summary("expired" -> expired.length.toLong,
            "live_version" ->
              GlprSource.listManifestVersions(path).lastOption.getOrElse(0L))
        case "recluster" =>
          val dim2 = Option(input.getUTF8String(2)).map(_.toString.trim)
            .filter(_.nonEmpty)
          val (oldN, newN) = dim2 match {
            case Some(d) => GlprMaintenance.zorderRecluster(
              org.apache.spark.sql.SparkSession.active, path,
              input.getLong(1).toInt, d)
            case None => GlprMaintenance.recluster(
              org.apache.spark.sql.SparkSession.active, path,
              input.getLong(1).toInt)
          }
          summary("retired" -> oldN.toLong, "clustered" -> newN.toLong)
        case "rebuild_manifest" =>
          GlprSource.rebuildManifest(path)
          summary("shards" ->
            GlprSource.committedShards(path).length.toLong)
        case "delete_where_mor" =>
          val vals = input.getUTF8String(2).toString
            .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet
          val b = Option(input.getUTF8String(3)).map(_.toString.trim)
            .filter(_.nonEmpty)
          val changed = GlprMaintenance.deleteWhereMergeOnRead(
            org.apache.spark.sql.SparkSession.active, path,
            input.getUTF8String(1).toString, vals, branch = b)
          summary("masked_shards" -> changed.length.toLong,
            "live_version" ->
              GlprSource.listManifestVersions(path).lastOption.getOrElse(0L))
        case "create_branch" =>
          val b = input.getUTF8String(1).toString
          GlprSource.createBranch(path, b)
          summary("forked_shards" ->
            GlprSource.branchEntries(path, b).length.toLong)
        case "publish_branch" =>
          val b = input.getUTF8String(1).toString
          val n = GlprSource.publishBranch(path, b)
          summary("published_shards" -> n.toLong,
            "live_version" -> GlprSource.listManifestVersions(path).last)
        case "drop_branch" =>
          summary("dropped_versions" ->
            GlprSource.dropBranch(path, input.getUTF8String(1).toString)
              .toLong)
        case "set_partition_spec" =>
          setPartitionSpec(dir, input.getUTF8String(1).toString.trim)
          summary("live_shards" ->
            GlprSource.committedShards(path).length.toLong)
        case "delete_range_mor" =>
          val b = Option(input.getUTF8String(3)).map(_.toString.trim)
            .filter(_.nonEmpty)
          val changed = GlprMaintenance.deleteIdRangeMergeOnRead(
            path, input.getLong(1), input.getLong(2), b)
          summary("masked_shards" -> changed.length.toLong)
        case "branches" => branches(dir)
        case "tag" =>
          val v0 = input.getLong(2)
          val v = GlprSource.createTag(path,
            input.getUTF8String(1).toString,
            if (v0 < 0) None else Some(v0))
          summary("tagged_version" -> v)
        case "drop_tag" =>
          summary("untagged_version" ->
            GlprSource.dropTag(path, input.getUTF8String(1).toString))
        case "tags" => tags(dir)
        case "add_constraint" =>
          addConstraint(dir, catalog, input.getUTF8String(0).toString,
            input.getUTF8String(1).toString, input.getUTF8String(2).toString)
        case "drop_constraint" =>
          dropConstraint(dir, input.getUTF8String(1).toString)
        case "constraints" => constraints(dir)
        case "files" => files(dir)
        case "clone" =>
          val dst = resolveFresh(input.getUTF8String(1).toString)
          val linked = GlprMaintenance.cloneTable(dir, dst)
          summary("linked_shards" -> linked.toLong)
        case "update_where_mor" =>
          val vals = input.getUTF8String(2).toString
            .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet
          val b = Option(input.getUTF8String(5)).map(_.toString.trim)
            .filter(_.nonEmpty)
          val (masked, appended) = GlprMaintenance.updateWhereMergeOnRead(
            org.apache.spark.sql.SparkSession.active, path,
            input.getUTF8String(1).toString, vals,
            input.getUTF8String(3).toString,
            input.getUTF8String(4).toString, branch = b)
          summary("masked_shards" -> masked.length.toLong,
            "replacement_shards" -> appended.length.toLong,
            "live_version" ->
              GlprSource.listManifestVersions(path).lastOption.getOrElse(0L))
        case "merge_mor" =>
          val spark = org.apache.spark.sql.SparkSession.active
          val srcDir = resolve(input.getUTF8String(1).toString)
          val src = spark.read.format("graft.io.GlprSource")
            .load(srcDir.getAbsolutePath)
          val b = Option(input.getUTF8String(2)).map(_.toString.trim)
            .filter(_.nonEmpty)
          val (masked, appended) =
            GlprMaintenance.mergeMergeOnRead(spark, path, src, branch = b)
          summary("masked_shards" -> masked.length.toLong,
            "appended_shards" -> appended.length.toLong,
            "live_version" ->
              GlprSource.listManifestVersions(path).lastOption.getOrElse(0L))
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      java.util.Collections.singletonList[Scan](result).iterator()
    }
  }
}
