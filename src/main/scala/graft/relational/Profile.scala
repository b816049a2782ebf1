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
