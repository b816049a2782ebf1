package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimensional data layout —
  * the lakehouse technique (Delta OPTIMIZE ZORDER, Iceberg sort orders)
  * that makes min/max file statistics prune on EVERY interleaved
  * dimension at once: sorting by a single column clusters that column
  * perfectly and the others not at all; sorting by the interleaved bits
  * gives every dimension locality ~√(cells) per file, so a 100 TB scan
  * with a predicate on either dimension skips most files.
  *
  * The interleave is the classic magic-number bit spread — 4 constant
  * shift/mask rounds per dimension, all codegen'd built-ins (constant
  * shifts, AND/OR), no UDF — and the identical arithmetic is expressible
  * in any SQL engine with bitwise operators, which is how the q210 oracle
  * certifies it: DuckDB runs the same spread and must produce the same
  * buckets and the same per-bucket extents.
  *
  * [[layoutStats]] is the observable contract: range-bucket the z-value,
  * then per bucket report row count and each dimension's min/max span —
  * the exact statistics a file-skipping reader consults. ZOrderSpec pins
  * hand-computed interleaves and the locality win (mean per-bucket span ≪
  * global span on both dimensions).
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions 0,2,…,30. */
  private def spread16(v: Column): Column = {
    val m0 = lit(0xFFFFL)
    val m8 = lit(0x00FF00FFL)
    val m4 = lit(0x0F0F0F0FL)
    val m2 = lit(0x33333333L)
    val m1 = lit(0x55555555L)
    val a = v.bitwiseAND(m0)
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(m8)
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(m4)
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(m2)
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(m1)
  }

  /** 32-bit Morton code of two 16-bit grid coordinates: x on even bits,
    * y on odd. Monotone locality: nearby (x,y) cells share z prefixes. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` for writing: range-partition + sort by the z-value of
    * the two (grid-quantized) dimensions — each output partition then
    * holds a compact z-range, i.e. a small rectangle-cover in (x, y), so
    * per-file min/max stats are tight on BOTH columns. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, numPartitions: Int): DataFrame = {
    val z = zValue(pmod(x, lit(65536L)), pmod(y, lit(65536L)))
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** q210: per-z-bucket layout statistics over lineitem's
    * (l_partkey, l_suppkey) space — the min/max extents a file-skipping
    * reader would prune on. Both dimensions are quantized onto a 16-cell
    * grid scaled by their max (one broadcast 1-row extent frame — integer
    * `div`, engine-exact), interleaved, and bucketed by dropping the low
    * 2 z-bits: each bucket is a 2×2 cell block, so per-bucket extents on
    * BOTH raw dimensions are ~1/8 of the global span — scale-free
    * (holds at every SF), deterministic, and engine-portable, unlike
    * file boundaries. */
  /** q229: file-skipping effectiveness estimate for a rectangular
    * predicate against the [[layoutStats]] layout — the dry-run a table
    * optimizer publishes to justify (or veto) a Z-order rewrite: a
    * bucket must be scanned iff its [min,max]×[min,max] extent box
    * intersects the predicate box (exactly the file-level stats test a
    * reader performs), and the report counts buckets and rows scanned
    * vs rows actually matching — the gap is the false-positive I/O the
    * layout failed to prune. All-integer arithmetic over the tiny
    * bucket frame plus ONE predicate aggregate on the base table. */
  def pruningStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    // Scale-free predicate box: [2/16, 5/16] of each dimension's span —
    // integer div off the same 1-row extent frame in both engines, so
    // the box is deterministic at EVERY scale factor (a fixed literal
    // box would be empty at sf0.001 and a sliver at sf1).
    val ext = li.agg(max(col("x")).as("xmax"), max(col("y")).as("ymax"))
      .select(expr("(xmax + 1) * 2 div 16").as("x_lo"),
        expr("(xmax + 1) * 5 div 16").as("x_hi"),
        expr("(ymax + 1) * 2 div 16").as("y_lo"),
        expr("(ymax + 1) * 5 div 16").as("y_hi"))
    val scannedFlag = col("x_min") <= col("x_hi") && col("x_max") >= col("x_lo") &&
      col("y_min") <= col("y_hi") && col("y_max") >= col("y_lo")
    val buckets = layoutStats(spark, dir).crossJoin(broadcast(ext))
      .select(col("n_rows"), scannedFlag.as("scanned"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("scanned"), 1L).otherwise(0L)).as("n_buckets_scanned"),
        sum(col("n_rows")).cast("long").as("rows_total"),
        sum(when(col("scanned"), col("n_rows")).otherwise(0L)).cast("long")
          .as("rows_scanned"))
    val matching = li.crossJoin(broadcast(ext))
      .filter(col("x").between(col("x_lo"), col("x_hi")) &&
        col("y").between(col("y_lo"), col("y_hi")))
      .agg(count(lit(1)).as("rows_matching"))
    buckets.crossJoin(broadcast(matching))
      .select(col("n_buckets"), col("n_buckets_scanned"),
        col("rows_total"), col("rows_scanned"), col("rows_matching"),
        round(lit(1.0) - col("rows_scanned").cast("double") /
          col("rows_total").cast("double"), 6).as("skip_ratio"))
  }

  /** q252: the layout BAKE-OFF the q229 dry run implies — the same
    * scale-free predicate box evaluated against two physical layouts:
    * the 2-D Morton clustering vs a single-dimension sort (buckets =
    * 16ths of x alone, the default "sort by the leading column" layout).
    * The x-sorted layout prunes on x but its buckets span ALL of y, so
    * the y half of the predicate prunes nothing — rows_scanned collapses
    * toward the x-selectivity alone, while z-order buckets stay tight on
    * both dimensions. Same integer arithmetic, one report row per
    * layout; the measured gap is the justification a table-layout
    * migration cites. */
  def layoutComparison(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val ext = li.agg(max(col("x")).as("xmax"), max(col("y")).as("ymax"))
      .select(expr("(xmax + 1) * 2 div 16").as("x_lo"),
        expr("(xmax + 1) * 5 div 16").as("x_hi"),
        expr("(ymax + 1) * 2 div 16").as("y_lo"),
        expr("(ymax + 1) * 5 div 16").as("y_hi"),
        col("xmax"), col("ymax"))
    val zStats = layoutStats(spark, dir)
    val xStats = li.crossJoin(broadcast(ext))
      .groupBy(expr("x * 16 div (xmax + 1)").as("x_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
    def scannedAgg(stats: DataFrame, layout: String): DataFrame =
      stats.crossJoin(broadcast(ext))
        .select(col("n_rows"),
          (col("x_min") <= col("x_hi") && col("x_max") >= col("x_lo") &&
           col("y_min") <= col("y_hi") && col("y_max") >= col("y_lo")).as("scanned"))
        .agg(sum(col("n_rows")).cast("long").as("rows_total"),
          sum(when(col("scanned"), col("n_rows")).otherwise(0L)).cast("long")
            .as("rows_scanned"))
        .select(lit(layout).as("layout"), col("rows_total"), col("rows_scanned"),
          round(lit(1.0) - col("rows_scanned").cast("double") /
            col("rows_total").cast("double"), 6).as("skip_ratio"))
    scannedAgg(zStats, "zorder")
      .unionAll(scannedAgg(xStats, "x_sorted"))
  }

  def layoutStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val ext = li.agg(max(col("x")).as("xmax"), max(col("y")).as("ymax"))
    li.crossJoin(broadcast(ext))
      .withColumn("x0", expr("x * 16 div (xmax + 1)"))
      .withColumn("y0", expr("y * 16 div (ymax + 1)"))
      .withColumn("zval", zValue(col("x0"), col("y0")))
      .groupBy((col("zval") / lit(4L)).cast("long").as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }
}
