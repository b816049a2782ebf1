package graft.io

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 `TableCatalog` over GLPR corpora — the SQL front door for the
  * connector: register once
  * {{{
  *   spark.conf.set("spark.sql.catalog.glpr", "graft.io.GlprCatalog")
  *   spark.conf.set("spark.sql.catalog.glpr.root", "/corpora")
  * }}}
  * and full DDL + DML works through plain SQL — `CREATE TABLE
  * glpr.raw.docs (...)`, `INSERT INTO glpr.raw.docs SELECT ...` (the
  * two-phase-commit [[GlprWriter]] path), `SELECT ... FROM glpr.raw.docs`
  * (the pruning/pushdown/statistics [[GlprScan]] path), `DROP TABLE`,
  * `ALTER TABLE ... SET TBLPROPERTIES`, `SHOW TABLES IN glpr.raw` — no
  * DataFrame-API escape hatch needed. This is how a lakehouse exposes a
  * custom format to SQL-only consumers (the Iceberg/Delta catalog
  * pattern, over the public `CatalogPlugin` API).
  *
  * Layout: `<root>/<namespace...>/<table>/` holds the shard files; a
  * `_glpr_table` marker distinguishes catalog-created tables from
  * arbitrary directories (an external shard dir is attachable by
  * `CREATE TABLE` on the same path — the marker is written, existing
  * shards become visible). The schema is the GLPR record schema by
  * construction; `CREATE TABLE` validates the requested columns against
  * it rather than silently writing an unreadable layout. Identifier
  * components are validated against a conservative charset — a catalog
  * must never let `..`-bearing names escape its root.
  */
class GlprCatalog extends TableCatalog with FunctionCatalog
    with ProcedureCatalog {
  private var catalogName: String = _
  private var root: java.io.File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null && r.nonEmpty,
      s"catalog '$name' requires option spark.sql.catalog.$name.root")
    root = new java.io.File(r)
    root.mkdirs(): Unit
  }
  override def name(): String = catalogName

  private val safePart = "[A-Za-z0-9_][A-Za-z0-9_.-]*".r
  private def checkPart(p: String): String = p match {
    case safePart() if p != "." && p != ".." => p
    case _ => throw new IllegalArgumentException(
      s"illegal glpr identifier component '$p'")
  }
  private def nsDir(ns: Array[String]): java.io.File =
    ns.foldLeft(root)((d, p) => new java.io.File(d, checkPart(p)))
  private def tableDir(ident: Identifier): java.io.File =
    new java.io.File(nsDir(ident.namespace()), checkPart(ident.name()))
  private def marker(dir: java.io.File): java.io.File =
    new java.io.File(dir, "_glpr_table")

  override def tableExists(ident: Identifier): Boolean =
    marker(tableDir(ident)).isFile

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!d.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && marker(f).isFile)
      .map(f => Identifier.of(namespace, f.getName))
      .sortBy(_.name())
  }

  /** The marker file doubles as the table descriptor: empty = flat
    * base-schema table (backward compatible with pre-round-16 markers);
    * whitespace-separated tokens otherwise — `partitioned_by=<spec>`
    * (an identity column, `bucket(N,doc_id)`, or `days(col)`) and
    * `extra_columns=a,b` (append-only schema evolution, q332). */
  private def readPartitionCol(dir: java.io.File): Option[String] =
    readMarkerToken(dir, "partitioned_by")
  private def readExtraCols(dir: java.io.File): Seq[String] =
    readMarkerToken(dir, "extra_columns")
      .map(_.split(",", -1).iterator.filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
  /** DROP COLUMN tombstones (q347): the logical AND physical names of
    * every dropped extra, kept forever — the physical namespace is
    * immutable (old shards still carry the bytes under it), so a later
    * ADD COLUMN reusing either name would silently re-bind the dropped
    * column's shard data. */
  private def readDroppedCols(dir: java.io.File): Seq[String] =
    readMarkerToken(dir, "dropped_columns")
      .map(_.split(",", -1).iterator.filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
  private def readMarkerToken(dir: java.io.File, key: String): Option[String] = {
    val bytes = java.nio.file.Files.readAllBytes(marker(dir).toPath)
    val txt = new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim
    txt.split("\\s+").collectFirst {
      case kv if kv.startsWith(key + "=") => kv.stripPrefix(key + "=")
    }
  }
  private def writeMarker(dir: java.io.File, partitionSpec: Option[String],
      extraCols: Seq[String], droppedCols: Seq[String] = Seq.empty): Unit = {
    // tokens this writer does not own (check_constraints, q355 — and
    // anything a future round adds) survive a schema ALTER verbatim:
    // rebuild only the tokens being written, keep the rest. CONTRACT:
    // marker updates are read-modify-write without a CAS, so DDL and
    // the constraint procedures must not run CONCURRENTLY on one table
    // — a racing pair is last-writer-wins on the file (single-DDL-writer
    // per table, the same documented posture as replace-form DML)
    val owned = Set("partitioned_by", "extra_columns", "dropped_columns")
    val foreign: Seq[String] =
      if (!marker(dir).isFile) Seq.empty
      else new String(
        java.nio.file.Files.readAllBytes(marker(dir).toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
        .split("\\s+").iterator.filter(_.nonEmpty)
        .filterNot(t => owned.exists(k => t.startsWith(k + "="))).toSeq
    val tokens = partitionSpec.map(p => s"partitioned_by=$p").toSeq ++
      (if (extraCols.nonEmpty) Seq(s"extra_columns=${extraCols.mkString(",")}")
       else Nil) ++
      (if (droppedCols.nonEmpty)
        Seq(s"dropped_columns=${droppedCols.mkString(",")}")
       else Nil) ++ foreign
    java.nio.file.Files.write(marker(dir).toPath,
      tokens.mkString(" ").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** Columns referenced by the table's CHECK constraints (q355), lower-
    * cased, each with the constraint names that read it — the RENAME /
    * DROP COLUMN guard: mutating a referenced column would silently
    * break the stored expression. */
  private def constraintRefs(dir: java.io.File): Map[String, Seq[String]] = {
    val checks = GlprSource.checkConstraintsOf(dir.getAbsolutePath)
    if (checks.isEmpty) return Map.empty
    val parser =
      org.apache.spark.sql.SparkSession.active.sessionState.sqlParser
    checks.flatMap { case (n, sql) =>
      parser.parseExpression(sql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name.toLowerCase(java.util.Locale.ROOT) -> n
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) {
      // METADATA TABLES (q360, the Iceberg `db.table.history` idiom):
      // `SELECT … FROM cat.ns.t.files` serves the same introspection
      // the sys procedures expose, as PLAIN SQL TABLES — joinable,
      // aggregatable, WHERE-able. Resolved only when `ns.t.<kind>`
      // names no real table, so a genuine table named 'files' shadows
      // its parent's metadata (the documented Iceberg caveat).
      if (ident.namespace.nonEmpty &&
          GlprMetadataTable.Kinds(ident.name)) {
        val parent = Identifier.of(ident.namespace.dropRight(1),
          ident.namespace.last)
        if (tableExists(parent))
          return new GlprMetadataTable(tableDir(parent), ident.name)
      }
      throw new NoSuchTableException(ident)
    }
    val dir = tableDir(ident)
    new GlprTable(dir.getAbsolutePath, readPartitionCol(dir),
      extraCols = readExtraCols(dir))
  }

  /** SQL time travel (q311): `SELECT ... FROM t VERSION AS OF <n>`
    * resolves here — the returned table is pinned to manifest version
    * `n` (read-only; see [[GlprTable.newWriteBuilder]]). A
    * NON-NUMERIC pin names a TAG (q354 — resolves to its pinned
    * manifest version, read-only and retention-protected) or a
    * write-audit-publish BRANCH (round 18, the Iceberg idiom):
    * `VERSION AS OF 'audit'` reads the branch HEAD — the SQL-only
    * audit surface. Tags and branches share one name space (creation
    * refuses collisions), so resolution order cannot matter; unknown
    * names fail loudly with the available tags and branches. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    version.toLongOption match {
      case Some(v) =>
        new GlprTable(dir.getAbsolutePath, readPartitionCol(dir), Some(v),
          readExtraCols(dir))
      case None =>
        val b = GlprSource.requireBranchName(version)
        GlprSource.resolveTag(dir.getAbsolutePath, b) match {
          case Some(v) =>
            new GlprTable(dir.getAbsolutePath, readPartitionCol(dir),
              Some(v), readExtraCols(dir))
          case None =>
            require(GlprSource.listBranchVersions(dir.getAbsolutePath,
                b).nonEmpty,
              s"GLPR VERSION AS OF '$b': no such manifest version, tag " +
                s"or branch under '$ident'" + {
                  val bs = GlprSource.listBranches(dir.getAbsolutePath)
                  val ts = GlprSource.listTags(dir.getAbsolutePath)
                  s"; tags: ${if (ts.isEmpty) "none"
                    else ts.keys.toSeq.sorted.mkString(", ")}" +
                    s"; branches: ${if (bs.isEmpty) "none"
                      else bs.toSeq.sorted.mkString(", ")}"
                })
            new GlprTable(dir.getAbsolutePath, readPartitionCol(dir), None,
              readExtraCols(dir), branchPin = Some(b))
        }
    }
  }

  /** `TIMESTAMP AS OF <ts>` (Spark hands MICROseconds since the epoch):
    * resolves to the NEWEST manifest version committed at or before
    * `ts`, on the DURABLE commit clock — the `# committedAtMs=` header
    * [[GlprSource.commitManifest]] writes into each version file at the
    * CAS commit point (round-17 verdict #5: survives copies/restores
    * and coarse-mtime filesystems, where Delta's log-file-mtime clock
    * does not); pre-round-18 version files without a header fall back
    * to their mtime. A timestamp before the first commit fails loudly,
    * naming the earliest one. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val path = dir.getAbsolutePath
    val tsMillis = Math.floorDiv(timestampMicros, 1000L)
    val stamped = GlprSource.listManifestVersions(path)
      .map(v => v -> GlprSource.versionCommitMs(path, v))
    require(stamped.nonEmpty,
      s"GLPR TIMESTAMP AS OF: table '${ident}' has no version history")
    val eligible = stamped.filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"GLPR TIMESTAMP AS OF $tsMillis ms: before the first commit " +
        s"(${stamped.head._2} ms, version ${stamped.head._1})")
    new GlprTable(path, readPartitionCol(dir),
      Some(eligible.map(_._1).max), readExtraCols(dir))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // the first four columns are the fixed record layout; any FURTHER
    // columns must be nullable-representable STRING extras (q332 —
    // the same appended-field encoding ALTER TABLE ADD COLUMN uses)
    val want = GlprSource.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val got = schema.fields.take(4).map(f => (f.name, f.dataType)).toSeq
    require(got == want,
      s"GLPR tables start with the fixed schema ${GlprSource.schema.simpleString}, got ${schema.simpleString}")
    val extraCols: Seq[String] = schema.fields.drop(4).toSeq.map { f =>
      require(!f.metadata.contains("CURRENT_DEFAULT") &&
          !f.metadata.contains("EXISTS_DEFAULT"),
        s"GLPR CREATE TABLE does not take column DEFAULTs ('${f.name}'): " +
          "a brand-new column has no pre-evolution shards for an initial " +
          "default to serve, and INSERTs never auto-fill — add the " +
          "column with ALTER TABLE ... ADD COLUMN ... DEFAULT after " +
          "data exists if the initial-default read is wanted")
      GlprSource.extraToken(checkExtraName(f.name),
        extraTypeNameOf(f.dataType, f.name), f.name)
    }
    require(extraCols.map(GlprSource.extraLogical).distinct.size ==
      extraCols.size, "duplicate extra column names")
    // partition transforms read STRING columns (identity/days); typed
    // extras are not partitionable
    val stringCols = (Seq("lang", "source") ++ extraCols
      .filter(t => GlprSource.extraTypeName(t) == "string")
      .map(GlprSource.extraLogical)).toSet
    // `PARTITIONED BY` — one transform: identity on a string column,
    // bucket(N, doc_id), or days(col) over an ISO-8601 string column.
    // The layout stays flat; TRANSFORMED partition values ride the
    // commit sidecars and drive shard pruning (see GlprTable).
    val partitionSpec: Option[String] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "identity" && t.references.length == 1 &&
          t.references()(0).fieldNames.length == 1 =>
        val c = t.references()(0).fieldNames()(0)
        require(stringCols(c),
          s"GLPR identity partitioning needs a string column, got '$c'")
        Some(c)
      case Seq(t) if t.name == "bucket" =>
        require(t.references.length == 1 &&
            t.references()(0).fieldNames.sameElements(Array("doc_id")),
          s"GLPR bucket partitioning supports bucket(N, doc_id) only, got $t")
        val n = t.arguments.collectFirst {
          case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
            lit.value() match {
              case i: java.lang.Integer => i.intValue()
              case l: java.lang.Long => l.toInt
            }
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform without a bucket count: $t"))
        require(n > 0 && n <= 4096, s"bucket count out of range: $n")
        Some(s"bucket($n,doc_id)")
      case Seq(t) if (t.name == "days" || t.name == "months") &&
          t.references.length == 1 &&
          t.references()(0).fieldNames.length == 1 =>
        val c = t.references()(0).fieldNames()(0)
        require(stringCols(c),
          s"GLPR ${t.name}() partitioning reads an ISO-8601 STRING column, got '$c'")
        Some(s"${t.name}($c)")
      case Seq(t) if t.name == "truncate" =>
        require(t.references.length == 1 &&
            t.references()(0).fieldNames.length == 1,
          s"GLPR truncate partitioning needs one column reference, got $t")
        val c = t.references()(0).fieldNames()(0)
        require(stringCols(c),
          s"GLPR truncate() partitioning reads a STRING column, got '$c'")
        val w = t.arguments.collectFirst {
          case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
            lit.value() match {
              case i: java.lang.Integer => i.intValue()
              case l: java.lang.Long => l.toInt
            }
        }.getOrElse(throw new IllegalArgumentException(
          s"truncate transform without a width: $t"))
        require(w > 0 && w <= 1024, s"truncate width out of range: $w")
        Some(s"truncate($w,$c)")
      case other => throw new UnsupportedOperationException(
        "GLPR tables support one partition transform: identity(col), " +
          "bucket(N, doc_id), days(col), months(col) or truncate(w, col); " +
          s"got ${other.mkString(", ")}")
    }
    val dir = tableDir(ident)
    dir.mkdirs()
    writeMarker(dir, partitionSpec, extraCols)
    new GlprTable(dir.getAbsolutePath, partitionSpec, extraCols = extraCols)
  }

  /** The extra-column type classes a GLPR table accepts (typed schema
    * evolution, round 18): STRING, BIGINT, DOUBLE — the three that
    * cover most real evolutions. Values of every class ride the byte
    * stream as length-prefixed strings (`Long.toString` /
    * `Double.toString` round-trip exactly); readers parse back. */
  /** Extra-column NAME hygiene: names become `logical[:type][@physical]`
    * marker/sidecar tokens, so the token metacharacters (':', '@',
    * whitespace, ',') and emptiness refuse loudly instead of silently
    * mis-parsing (a backquoted `a@b` would otherwise read as logical
    * 'a' bound to physical 'b'). */
  private def checkExtraName(name: String): String = {
    require(name.nonEmpty && name.matches("[A-Za-z0-9_.-]+"),
      s"illegal GLPR extra-column name '$name' (token-safe charset: " +
        "letters, digits, '_', '.', '-')")
    name
  }

  private def extraTypeNameOf(dt: org.apache.spark.sql.types.DataType,
      name: String): String = dt match {
    case org.apache.spark.sql.types.StringType => "string"
    case org.apache.spark.sql.types.LongType => "bigint"
    case org.apache.spark.sql.types.DoubleType => "double"
    case org.apache.spark.sql.types.IntegerType => "int"
    case org.apache.spark.sql.types.FloatType => "float"
    case other => throw new IllegalArgumentException(
      s"GLPR extra columns must be STRING, BIGINT, DOUBLE, INT or " +
        s"FLOAT, got $name: ${other.simpleString}")
  }

  /** SCHEMA EVOLUTION (q332; typed + rename since round 18):
    * `ALTER TABLE … ADD COLUMN c STRING|BIGINT|DOUBLE` appends a
    * nullable extra — old shards read null for it (default-null read
    * compat; the sidecar `cols=` channel tells the readers which extras
    * each shard carries). `RENAME COLUMN` on an extra is METADATA-ONLY:
    * the marker token re-labels the logical name while the immutable
    * PHYSICAL name keeps binding the existing sidecars and byte layouts
    * (the Iceberg field-id indirection at minimum size) — zero shard
    * touches, atomic, old and new shards read alike. Property alters
    * stay no-ops; every OTHER structural change (drops of any column,
    * renames of base columns, type changes, positioned adds) is still
    * rejected — the base layout is the format. */
  /** Declares column-DEFAULT support so `ADD COLUMN ... DEFAULT <lit>`
    * reaches [[alterTable]] (q363). GLPR stores the literal as an
    * INITIAL default only (applied at read to pre-evolution shards);
    * INSERTs never auto-fill — writes carry every column. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    var extras = readExtraCols(dir)
    var dropped = readDroppedCols(dir)
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          "GLPR ADD COLUMN supports top-level columns only")
        val name = checkExtraName(add.fieldNames()(0))
        val tpe = extraTypeNameOf(add.dataType(), name)
        require(add.isNullable,
          "GLPR added columns must be nullable (old shards read null)")
        require(add.position() == null,
          "GLPR added columns are APPENDED; positioned adds are not supported")
        require(!GlprSource.fullSchema(extras).fieldNames.contains(name),
          s"column '$name' already exists")
        // ...nor may it shadow a renamed-away PHYSICAL name: the
        // physical namespace is immutable (sidecars/byte layouts), so a
        // new 'a' after RENAME a TO b would bind b's shard data to the
        // new column and leave b reading null
        require(!extras.map(GlprSource.extraPhysical).contains(name),
          s"column name '$name' is the immutable physical name of a " +
            "renamed column; pick another name")
        // ...nor a DROPPED column's name (logical or physical): the
        // tombstone burns both forever — re-binding would resurrect the
        // dropped column's shard bytes under the new column (q347)
        require(!dropped.contains(name),
          s"column name '$name' belongs to a dropped column (burned " +
            "with its physical name); pick another name")
        // ADD COLUMN ... DEFAULT <literal> (q363): store the FOLDED
        // literal as the column's INITIAL default — applied at read to
        // shards that predate the column (the Iceberg initial-default
        // move); post-evolution rows carry their own bytes, and an
        // explicit NULL stays NULL. Non-literal defaults have no
        // stable fold point in a file-based format — refuse.
        val dflt: Option[String] = Option(add.defaultValue()).flatMap { dv =>
          val lit = dv.getValue
          require(lit != null,
            s"GLPR DEFAULT for '$name' must be a constant literal " +
              s"(got non-foldable ${dv.toString}); compute " +
              "row-dependent values in the INSERT instead")
          Option(lit.value()).map { v =>
            tpe match {
              case "bigint" => v match {
                case l: java.lang.Long => l.toString
                case i: java.lang.Integer => i.toString
                case other => throw new IllegalArgumentException(
                  s"GLPR DEFAULT for BIGINT column '$name' must be an " +
                    s"integral literal, got $other")
              }
              case "double" => v match {
                case d: java.lang.Double => java.lang.Double.toString(d)
                case f: java.lang.Float => java.lang.Double.toString(f.toDouble)
                case i: java.lang.Integer => java.lang.Double.toString(i.toDouble)
                case l: java.lang.Long => java.lang.Double.toString(l.toDouble)
                case other => throw new IllegalArgumentException(
                  s"GLPR DEFAULT for DOUBLE column '$name' must be a " +
                    s"numeric literal, got $other")
              }
              case "int" => v match {
                case i: java.lang.Integer => i.toString
                case other => throw new IllegalArgumentException(
                  s"GLPR DEFAULT for INT column '$name' must be an INT " +
                    s"literal, got $other")
              }
              case "float" => v match {
                case f: java.lang.Float => java.lang.Float.toString(f)
                case other => throw new IllegalArgumentException(
                  s"GLPR DEFAULT for FLOAT column '$name' must be a " +
                    s"FLOAT literal, got $other")
              }
              case _ => v.toString // string: UTF8String's toString
            }
          } // DEFAULT NULL = the ordinary q332 null-compat: no token
        }
        extras = extras :+ GlprSource.extraToken(name, tpe, name, dflt)
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          "GLPR RENAME COLUMN supports top-level columns only")
        val from = ren.fieldNames()(0)
        require(!GlprSource.schema.fieldNames.contains(from),
          s"GLPR base column '$from' is the format; RENAME COLUMN " +
            "applies to added extra columns only")
        val i = extras.indexWhere(t => GlprSource.extraLogical(t) == from)
        require(i >= 0, s"no such column '$from'")
        require(!readPartitionCol(dir)
            .exists(GlprSource.parsePartSpec(_).column == from),
          s"column '$from' drives the table's partition transform; " +
            "renaming it would orphan the prune index")
        constraintRefs(dir).get(from.toLowerCase(java.util.Locale.ROOT))
          .foreach(ns => throw new IllegalArgumentException(
            s"column '$from' is referenced by CHECK constraint(s) " +
              s"${ns.mkString(", ")}; drop them first (the stored " +
              "expression reads the old name)"))
        checkExtraName(ren.newName): Unit
        require(!GlprSource.fullSchema(extras).fieldNames
            .contains(ren.newName) && ren.newName != from,
          s"column '${ren.newName}' already exists")
        // a burned (dropped) name may not re-enter the logical namespace
        // through RENAME either — the tombstone guard must be symmetric
        // with ADD COLUMN or 'burned forever' quietly stops being true
        require(!dropped.contains(ren.newName),
          s"column name '${ren.newName}' belongs to a dropped column " +
            "(burned with its physical name); pick another name")
        val (_, tpe, phys) = GlprSource.parseExtraToken(extras(i))
        extras = extras.updated(i, GlprSource.extraToken(ren.newName, tpe,
          phys, GlprSource.extraDefault(extras(i))))
      // DROP COLUMN as a METADATA TOMBSTONE (round-18 verdict #2): the
      // extra's token leaves the marker — every scan stops projecting
      // it, on mixed shards alike (shards that carry the bytes skip
      // them via their sidecar `cols=` layout) — and BOTH its names
      // are burned in `dropped_columns=`, so the immutable physical
      // namespace can never be re-bound. Zero shard touches, atomic
      // (one marker write). Base columns keep rejecting: the fixed
      // 4-column layout IS the format.
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          "GLPR DROP COLUMN supports top-level columns only")
        val name = del.fieldNames()(0)
        require(!GlprSource.schema.fieldNames.contains(name),
          s"GLPR base column '$name' is the format; DROP COLUMN " +
            "applies to added extra columns only")
        val i = extras.indexWhere(t => GlprSource.extraLogical(t) == name)
        if (i < 0) {
          require(del.ifExists, s"no such column '$name'")
        } else {
          require(!readPartitionCol(dir)
              .exists(GlprSource.parsePartSpec(_).column == name),
            s"column '$name' drives the table's partition transform; " +
              "dropping it would orphan the prune index")
          constraintRefs(dir).get(name.toLowerCase(java.util.Locale.ROOT))
            .foreach(ns => throw new IllegalArgumentException(
              s"column '$name' is referenced by CHECK constraint(s) " +
                s"${ns.mkString(", ")}; drop them first"))
          val (_, _, phys) = GlprSource.parseExtraToken(extras(i))
          dropped = (dropped ++ Seq(name, phys)).distinct
          extras = extras.patch(i, Nil, 1)
        }
      // TYPE WIDENING (q362, round-19 verdict #3): the Iceberg-safe
      // promotions INT→BIGINT and FLOAT→DOUBLE, metadata-only — the
      // marker token's type changes, shard sidecars keep the type each
      // shard was WRITTEN under, and readers bind decode kinds from
      // the TABLE tokens (extraSlots). Both promotions are
      // VALUE-preserving: a decimal integer parses identically at
      // either width, and float text is parsed as the write-time
      // float THEN widened (shortest-decimal text is unique per
      // float, not per double — re-parsing it as double would change
      // the stored value). Everything else still rejects — a
      // narrowing or cross-family change would reinterpret committed
      // shard bytes.
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames.length == 1,
          "GLPR ALTER COLUMN TYPE supports top-level columns only")
        val name = upd.fieldNames()(0)
        require(!GlprSource.schema.fieldNames.contains(name),
          s"GLPR base column '$name' is the format; ALTER COLUMN TYPE " +
            "applies to added extra columns only")
        val i = extras.indexWhere(t => GlprSource.extraLogical(t) == name)
        require(i >= 0, s"no such column '$name'")
        val (_, from, phys) = GlprSource.parseExtraToken(extras(i))
        val to = extraTypeNameOf(upd.newDataType(), name)
        require(to == from || (from, to) == (("int", "bigint")) ||
            (from, to) == (("float", "double")),
          s"GLPR ALTER COLUMN supports WIDENING only (INT -> BIGINT, " +
            s"FLOAT -> DOUBLE); cannot change '$name' $from -> $to")
        // The stored initial-default literal must be re-boxed through
        // the WRITE-TIME type: it was written via Float.toString, and
        // shortest-decimal float text re-parsed as double changes the
        // value (0.3d != 0.3f.toDouble) — the same value-preservation
        // rule the kind-5 shard decode enforces for stored bytes. An
        // INT->BIGINT default text parses identically at either width.
        val dflt = GlprSource.extraDefault(extras(i)).map { d =>
          if ((from, to) == (("float", "double")))
            java.lang.Double.toString(java.lang.Float.parseFloat(d).toDouble)
          else d
        }
        extras = extras.updated(i, GlprSource.extraToken(name, to, phys, dflt))
      case other => throw new UnsupportedOperationException(
        "GLPR tables support ADD COLUMN (appended nullable " +
          "STRING/BIGINT/DOUBLE/INT/FLOAT), RENAME COLUMN on extras, " +
          "DROP COLUMN on extras, widening ALTER COLUMN TYPE on extras, " +
          s"and property changes only; got $other")
    }
    writeMarker(dir, readPartitionCol(dir), extras, dropped)
    new GlprTable(dir.getAbsolutePath, readPartitionCol(dir),
      extraCols = extras)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!marker(dir).isFile) false
    else {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
      true
    }
  }

  /** DSv2 `FunctionCatalog` (q315): connector-shipped SQL functions
    * under the reserved `sys` namespace — see [[GlprFunctions]]. Table
    * namespaces list no functions; unknown namespaces and unknown
    * function names fail loudly with the standard analysis errors. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array(GlprFunctions.Namespace)))
      GlprFunctions.names.map(n => Identifier.of(namespace, n)).toArray
    else if (nsDir(namespace).isDirectory) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  override def loadFunction(ident: Identifier): UnboundFunction =
    (if (ident.namespace.sameElements(Array(GlprFunctions.Namespace)))
      GlprFunctions.load(ident.name)
    // EMPTY namespace: the partition-transform functions
    // V2ExpressionUtils resolves when a write requires a
    // transform-clustered distribution (round 18; the Iceberg layout)
    else if (ident.namespace.isEmpty)
      GlprFunctions.loadTransform(ident.name)
    else None)
      .getOrElse(throw new NoSuchFunctionException(ident))

  /** DSv2 `ProcedureCatalog` (q316/q317): `CALL <cat>.sys.compact(
    * 'ns.table', bytes)` and friends — maintenance and history
    * introspection through plain SQL, the Iceberg system-procedures
    * pattern. See [[GlprProcedures]]. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array(GlprFunctions.Namespace)))
      GlprProcedures.names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    (if (ident.namespace.sameElements(Array(GlprFunctions.Namespace)))
      GlprProcedures.load(ident.name, tableRefDir _, tableRefDirFresh _,
        catalogName)
    else None)
      .getOrElse(throw new IllegalArgumentException(
        s"no such GLPR procedure: $ident; available under sys: " +
          GlprProcedures.names.mkString(", ")))
  /** Resolve a procedure's 'ns.table' argument against this catalog's
    * root, with the same path hygiene as identifiers; the table must
    * exist (marker-bearing). */
  private def tableRefDir(ref: String): java.io.File = {
    val dir = tableRefDirFresh(ref)
    require(marker(dir).isFile,
      s"no GLPR table '$ref' under catalog '$catalogName'")
    dir
  }
  /** [[tableRefDir]] without the existence requirement — for procedure
    * arguments that NAME a table to create (`sys.clone`'s dest). Same
    * path hygiene. */
  private def tableRefDirFresh(ref: String): java.io.File =
    ref.split("\\.").foldLeft(root)((d, p) =>
      new java.io.File(d, checkPart(p)))

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val dest = tableDir(to)
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(tableDir(from).toPath, dest.toPath)
  }
}
