package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (q261) — the classical
  * entity-resolution decision model (Fellegi & Sunter 1969; the engine
  * inside Splink/dedupe.io): candidate pairs from a BLOCKING equi-join,
  * per-field agreement comparisons, and a linkage score that sums
  * log2(m/u) field weights (m = P(agree | same entity), u = P(agree |
  * different entities)), banded into match / possible / non-match.
  *
  * The "dirty" side is a deterministic re-registration fixture both
  * engines derive identically from the customer table (the md5-gate
  * idiom of [[graft.llmdata.Curation]]): ~25% of customers re-register
  * with the last character of their name corrupted to 'X', and a ~12.5%
  * sub-gate also perturbs the account balance by +1.00 — so the output
  * exercises all three decision bands (clean true pairs score ~18.8 →
  * match; balance-perturbed true pairs ~5.5 → possible; blocked
  * non-pairs only reach "possible" when they agree on name-distance AND
  * segment by coincidence — the review queue a human clerical step
  * consumes).
  *
  * Scale shape: the only pair generator is the blocking equi-join
  * (nation here; a production deployment blocks on finer keys —
  * phonetic name codes, zip prefixes — possibly in multiple passes, and
  * each pass stays an equi-join). Candidates are O(Σ block²), never
  * corpus²; the Levenshtein verify runs on ≤18-char names inside the
  * join projection. Weights are fixed DECIMAL(12,6) literals summed
  * exactly (log2(m/u) for the documented m/u; a production fit
  * estimates m/u by EM — the scoring algebra is identical), so both
  * engines agree bit-for-bit with no float-boundary risk; only the
  * final band-filtered score casts to double. */
object RecordLinkage {

  private def dec(s: String): Column = lit(new java.math.BigDecimal(s))

  def fsLinkage(customer: DataFrame): DataFrame = {
    val key = col("c_custkey").cast("string")
    val gate1 = substring(md5(concat(key, lit(":dirty"))), 1, 2) < "40"
    val gate2 = substring(md5(concat(key, lit(":dirtybal"))), 1, 2) < "20"
    val dirty = customer.filter(gate1).select(
      (col("c_custkey") + 10000000L).as("dirty_id"),
      expr("concat(substr(c_name, 1, length(c_name) - 1), 'X')").as("d_name"),
      col("c_nationkey").as("d_nation"),
      when(gate2, col("c_acctbal").cast("double") + 1.0)
        .otherwise(col("c_acctbal").cast("double")).as("d_bal"),
      col("c_mktsegment").as("d_seg"))
    val clean = customer.select(col("c_custkey").as("cand_key"),
      col("c_name"), col("c_nationkey"),
      col("c_acctbal").cast("double").as("c_bal"), col("c_mktsegment"))
    val aName = levenshtein(col("d_name"), col("c_name")) <= 1
    val aSeg = col("d_seg") === col("c_mktsegment")
    val aBal = col("d_bal") === col("c_bal")
    val scoreDec =
      when(aName, dec("9.891784")).otherwise(dec("-4.320485")) +
      when(aSeg, dec("2.247928")).otherwise(dec("-4.000000")) +
      when(aBal, dec("6.629357")).otherwise(dec("-6.629357"))
    dirty.join(clean, col("d_nation") === col("c_nationkey"))
      .select(col("dirty_id"), col("cand_key"),
        aName.as("a_name"), aSeg.as("a_seg"), aBal.as("a_bal"),
        scoreDec.as("score_dec"))
      .filter(col("score_dec") >= 0)
      .select(col("dirty_id"), col("cand_key"),
        col("a_name"), col("a_seg"), col("a_bal"),
        col("score_dec").cast("double").as("score"),
        when(col("score_dec") >= 12, "match").otherwise("possible").as("verdict"))
  }
}
