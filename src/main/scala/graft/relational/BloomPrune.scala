package graft.relational

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Bloom-filter pre-filtered join: build a bloom filter over the (small,
  * post-filter) dimension side's join keys, broadcast it, and prune the
  * fact side BEFORE the join's exchange — the runtime-row-filter pattern
  * that cuts a 100 TB fact shuffle down to (selectivity + ε) of its volume.
  * Spark's optimizer can inject this automatically
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`, off by
  * default); this operator makes the pattern an explicit, plan-visible
  * stage so the pruning applies regardless of conf and composes with any
  * downstream operator.
  *
  * Built entirely from relational primitives — no UDF, no driver-side
  * sketch object:
  *   - build: each key emits `kHashes` bit positions
  *     (`pmod(xxhash64(seed_i, key), mBits)`); positions fold to 64-bit
  *     words via a `bit_or` hash-agg (map-side combinable — the partial
  *     blooms OR together, which is exactly bloom mergeability) and the
  *     ≤ mBits/64 word rows collapse into ONE row holding a
  *     `map<word_idx, word>`.
  *   - probe: the 1-row frame is broadcast (a deliberate tiny-side cross
  *     join, PlanLint-whitelisted) and membership is
  *     `((word >> bit) & 1) = 1` for every hash — all codegen'd built-ins.
  *
  * No false negatives by construction, so the post-prune join result is
  * BIT-IDENTICAL to the unpruned join — which is what the q206 DuckDB
  * oracle certifies (the oracle is the plain join; the bloom is pure
  * pruning). False positives only waste probe-side rows; with the default
  * mBits = 2^16 and 3 hashes the fixture's fp rate is < 1e-3, and
  * Round13OpsSpec pins the measured pruning effectiveness.
  *
  * 100 TB shape: the dim side after its predicate is the SMALL side (the
  * whole point); the bloom build is one tiny hash-agg over it, the word
  * map is KBs (mBits/8 bytes) — trivially broadcastable where a distinct
  * key-list semi-join might be GBs. The fact scan → bloom probe is a
  * map-only stage; only survivors reach the join exchange.
  */
object BloomPrune {

  private def shl(v: Column, n: Column): Column =
    GraftColumnBridge.column(ShiftLeft(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(n)))

  private def shr(v: Column, n: Column): Column =
    GraftColumnBridge.column(ShiftRight(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(n)))

  /** One bit position per (key, hash-seed): `pmod(xxhash64(i, key), m)`. */
  private def bitIdx(key: Column, i: Int, mBits: Int): Column =
    pmod(xxhash64(lit(i), key), lit(mBits.toLong))

  /** The bloom filter over `key` as a ONE-row frame
    * `(bloom: map<int,long>)` — word index → 64-bit word. Absent words are
    * all-zero (the probe coalesces). */
  def bloomFrame(keys: DataFrame, key: Column, mBits: Int, kHashes: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(kHashes >= 1, "kHashes must be >= 1")
    val positions = keys.select(
      explode(array((0 until kHashes).map(i => bitIdx(key, i, mBits)): _*)).as("idx"))
    positions
      .select((col("idx") / 64).cast("int").as("w"),
        shl(lit(1L), (col("idx") % 64).cast("int")).as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("word"))
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("word")))
        .as("bloom"))
  }

  /** Membership test against the broadcast word map: all `kHashes` bits
    * set. Codegen'd built-ins only; `(word >> bit) & 1` reads the tested
    * bit correctly for every bit including 63 (arithmetic shift only
    * smears bits ABOVE the one masked). */
  def mightContain(bloom: Column, key: Column, mBits: Int, kHashes: Int): Column =
    (0 until kHashes).map { i =>
      val idx = bitIdx(key, i, mBits)
      val word = coalesce(element_at(bloom, (idx / 64).cast("int")), lit(0L))
      shr(word, (idx % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** `fact` rows whose `factKey` might be in `dim`'s `dimKey` set — the
    * reusable pre-join pruning stage (false positives possible, false
    * negatives impossible). */
  def prune(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
      mBits: Int = 1 << 16, kHashes: Int = 3): DataFrame =
    fact.crossJoin(broadcast(bloomFrame(dim, dimKey, mBits, kHashes)))
      .filter(mightContain(col("bloom"), factKey, mBits, kHashes))
      .drop("bloom")

  /** q206: per-customer order stats for one market segment, with the
    * orders side bloom-pruned before the join. Oracle = the plain
    * (unpruned) join — certifying the prune is lossless. */
  def segmentOrderStats(spark: SparkSession, dir: String,
      segment: String = "BUILDING"): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val orders = Tables(spark, dir, "orders")
    prune(orders, col("o_custkey"), cust, col("c_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_spend"))
  }
}
