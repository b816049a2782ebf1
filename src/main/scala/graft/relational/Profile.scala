package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling (q202) — the per-column data-quality report every lake
  * tool ships (DESCRIBE-with-statistics): for each column, row count, null
  * count, exact distinct count, and min/max, in ONE scan.
  *
  * Shape: a single aggregation computes every measure — Spark expands the
  * multiple exact `count(DISTINCT col)`s into one Expand + hash agg (each
  * input row fans out once per distinct-agg map-side; no repeated scans),
  * and the one resulting row is unpivoted to a row per column with
  * `stack`, a local Expand. At 100 TB the exact distinct counts are the
  * expensive honest choice — the approximate tier is q82's HLL; a profile
  * that silently approximates would lie to a data-quality gate.
  *
  * min/max are computed on the NATIVE type (so numeric columns order
  * numerically) and cast to string only for the uniform report schema;
  * string comparison is binary in both engines (ASCII corpus — the q35
  * charset note). Null handling: count(col) excludes nulls, min/max
  * ignore nulls, count(DISTINCT) excludes nulls — the same convention in
  * both engines, so the oracle needs no special-casing. */
object Profile {

  /** Join-key skew diagnostics (q221): per candidate join key, the
    * frequency-histogram summary a planner (or an engineer choosing a
    * salting factor) reads BEFORE shipping a shuffle join: total rows,
    * distinct keys, the hottest key and its row count, and the skew
    * ratio max/avg — the multiplier by which the hottest reducer
    * exceeds the average at that key's natural partitioning (AQE's
    * skew-join threshold reasons about exactly this quantity).
    *
    * Shape: one per-key hash agg per key column (the same agg the join
    * itself would do), then a 1-row rollup; the hottest key is an
    * argmax via `max(struct(n, key))` with a deterministic largest-key
    * tiebreak. Never a sort, never a window. */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains))
    keyCols.map { c =>
      df.groupBy(col(c).as("k")).agg(count(lit(1)).as("n"))
        .agg(sum("n").as("n_rows"), count(lit(1)).as("n_keys"),
          max(struct(col("n"), col("k").cast("long").as("k"))).as("hot"))
        .select(lit(c).as("key_col"), col("n_rows").cast("long").as("n_rows"),
          col("n_keys"), col("hot.n").as("max_rows_per_key"),
          col("hot.k").as("hottest_key"),
          round(col("hot.n").cast("double") * col("n_keys").cast("double") /
            col("n_rows").cast("double"), 6).as("skew_ratio"))
    }.reduce(_.unionAll(_))
  }

  /** Order-independent table checksum (q228) — the anti-entropy
    * fingerprint two replicas (or a table before/after a migration)
    * compare without moving rows: per group, the row count plus TWO
    * commutative reductions of a per-row md5-derived 60-bit hash — XOR
    * (cheap, but a duplicated row PAIR cancels) and the exact integer
    * SUM on DECIMAL(38,0) (catches even-multiplicity changes; 38 digits
    * hold 10^19 rows of 60-bit hashes without overflow, and decimal
    * addition is exact and partitioning-independent, the q01 rule).
    * Either reduction differing pinpoints the divergent group; both are
    * map-side combinable hash aggs, so the checksum of 100 TB is one
    * scan + a rows-per-group-sized shuffle. The row hash covers every
    * column through an ASCII-unit separator (fields can't reassociate). */
  def tableChecksum(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains))
    val rowHash = conv(substring(md5(concat_ws("\u001f",
      cols.map(c => col(c).cast("string")): _*)), 1, 15), 16, 10).cast("long")
    df.withColumn("__h", rowHash)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("checksum_xor"),
        sum(col("__h").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)))
          .cast("string").as("checksum_sum"))
  }

  /** Functional-dependency audit (q237) — the profiling primitive behind
    * schema discovery and key detection: does `A → B` hold, i.e. does
    * every A-group carry exactly one distinct B? Per candidate, one
    * (A)-keyed hash agg with an exact `count(DISTINCT B)` and a 1-row
    * rollup counting violating groups — the same shape a key-uniqueness
    * check compiles to, so a 100 TB audit is one shuffle per candidate
    * on the determinant column. A "holds" verdict is exact, never
    * sampled: an FD that silently held on a sample is how bad merge
    * keys get chosen. */
  def fdAudit(candidates: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(candidates.nonEmpty)
    candidates.map { case (tableName, df, a, b) =>
      df.groupBy(col(a)).agg(countDistinct(col(b)).as("ndb"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("ndb") > 1L, 1L).otherwise(0L)).as("n_violating_groups"))
        .select(lit(tableName).as("table_name"), lit(s"$a->$b").as("fd"),
          col("n_groups"), col("n_violating_groups").cast("long").as("n_violating_groups"),
          (col("n_violating_groups") === 0L).as("holds"))
    }.reduce(_.unionAll(_))
  }

  /** Join-cardinality estimation audit (q239) — the CBO primitive, made
    * honest: estimate |σ(fact) ⋈ σ(dim)| from per-bucket key histograms
    * (the System-R uniformity formula `n_a·n_b / max(d_a, d_b)` per
    * bucket, buckets = key mod `width`) and report it NEXT TO the true
    * join count and the relative error. This is the measurement a
    * planner's stats pipeline publishes to decide whether its histogram
    * resolution is adequate — an estimator nobody back-tests is how
    * broadcast thresholds get chosen wrong. Histograms are one hash agg
    * per side (width-bounded frames); only the verification pass runs
    * the actual join. Per-bucket contributions quantize to
    * DECIMAL(28,6) so the estimate sum is order-independent. */
  def joinCardinalityAudit(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, width: Int = 64): DataFrame = {
    require(width >= 1)
    val fh = fact.groupBy(pmod(col(factKey), lit(width.toLong)).as("bucket"))
      .agg(count(lit(1)).as("na"), countDistinct(col(factKey)).as("da"))
    val dh = dim.groupBy(pmod(col(dimKey), lit(width.toLong)).as("bucket"))
      .agg(count(lit(1)).as("nb"), countDistinct(col(dimKey)).as("db"))
    val est = fh.join(dh, "bucket")
      .select((col("na").cast("double") * col("nb").cast("double") /
        greatest(col("da"), col("db")).cast("double"))
        .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6))
        .as("contrib"))
      .agg(round(sum(col("contrib")).cast("double"), 6).as("est_rows"))
    val actual = fact.select(col(factKey).as("__k"))
      .join(dim.select(col(dimKey).as("__k")), "__k")
      .agg(count(lit(1)).as("actual_rows"))
    est.crossJoin(broadcast(actual))
      .select(lit(width.toLong).as("n_buckets"), col("est_rows"), col("actual_rows"),
        round(abs(col("est_rows") - col("actual_rows").cast("double")) /
          col("actual_rows").cast("double"), 6).as("rel_error"))
  }

  def tableProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty && columns.forall(df.columns.contains))
    val measures = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), measures: _*)
    val stackArgs = columns
      .map(c => s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c")
      .mkString(", ")
    one.select(col("__rows"),
        expr(s"stack(${columns.length}, $stackArgs) " +
          "as (column_name, n_non_null, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("__rows").as("n_rows"),
        (col("__rows") - col("n_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
