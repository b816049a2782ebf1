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
  * Scale shape — MULTI-PASS blocking (the Splink discipline). Round 13
  * blocked on nation alone; candidates were O(Σ nation-block²) and the
  * measured scaling exponent hit α≈1.5 (SCALING_r13/r14) — the classic
  * "coarse blocking stops scaling" cliff. The emitted output only keeps
  * `score ≥ 0`, and the weight table makes that REQUIRE either name
  * agreement plus at least one of segment/balance (name alone does NOT
  * survive: +9.89 − 4.00 − 6.63 = −0.74 < 0 when both disagree), or
  * segment AND balance agreement without name (−4.32 + 2.25 + 6.63 ≥ 0;
  * any weaker combination is negative). Pass 1 below generates ALL
  * name-agreeing candidates — a strict superset of the name-side
  * survivors — and pass 2 covers the segment∧balance band, so two sharp
  * passes generate every survivor:
  *
  *  1. '''name pass''': Levenshtein-≤1 DELETION-NEIGHBORHOOD keys — each
  *     name emits itself plus every one-char-deleted variant (len+1
  *     keys); two strings within edit distance 1 (substitution,
  *     insertion, or deletion — any lengths) always share a key, so the
  *     (nation, key) equi-join captures exactly the aName candidates
  *     with near-unique buckets.
  *  2. '''attribute pass''': (nation, segment, balance) equi-join for
  *     the name-disagreeing "possible" band.
  *
  * Union, distinct, score — identical output to the single coarse pass
  * (the DuckDB oracle still runs nation-only blocking + filter, so hash
  * equality CERTIFIES the multi-pass rewrite lossless), but candidate
  * volume tracks true-match density instead of block². The Levenshtein
  * verify runs on ≤18-char names inside the join projection. Weights
  * are fixed DECIMAL(12,6) literals summed exactly (log2(m/u) for the
  * documented m/u; a production fit estimates m/u by EM — the scoring
  * algebra is identical), so both engines agree bit-for-bit with no
  * float-boundary risk; only the final band-filtered score casts to
  * double. */
object RecordLinkage {

  private def dec(s: String): Column = lit(new java.math.BigDecimal(s))

  /** `s` plus every one-char-deleted variant: the Levenshtein-≤1
    * blocking neighborhood. For strings a, b with lev(a,b) ≤ 1:
    * substitution at i → del_i(a) = del_i(b); insertion into a at i →
    * del_i(b) = a (a's own identity key); deletion symmetric; equality
    * trivially. So every lev-≤1 pair shares ≥1 key, for ANY lengths —
    * pinned by a brute-force property in Round14OpsSpec. */
  private def delNeighborhood(s: Column): Column =
    concat(array(s), transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  private def sides(customer: DataFrame): (DataFrame, DataFrame) = {
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
    (dirty, clean)
  }

  private def scorePairs(withSides: DataFrame): DataFrame = {
    val aName = levenshtein(col("d_name"), col("c_name")) <= 1
    val aSeg = col("d_seg") === col("c_mktsegment")
    val aBal = col("d_bal") === col("c_bal")
    val scoreDec =
      when(aName, dec("9.891784")).otherwise(dec("-4.320485")) +
      when(aSeg, dec("2.247928")).otherwise(dec("-4.000000")) +
      when(aBal, dec("6.629357")).otherwise(dec("-6.629357"))
    withSides
      .select(col("dirty_id"), col("cand_key"),
        aName.as("a_name"), aSeg.as("a_seg"), aBal.as("a_bal"),
        scoreDec.as("score_dec"))
      .filter(col("score_dec") >= 0)
      .select(col("dirty_id"), col("cand_key"),
        col("a_name"), col("a_seg"), col("a_bal"),
        col("score_dec").cast("double").as("score"),
        when(col("score_dec") >= 12, "match").otherwise("possible").as("verdict"))
  }

  def fsLinkage(customer: DataFrame): DataFrame = {
    val (dirty, clean) = sides(customer)
    // pass 1: lev-≤1 name neighborhood within the nation block
    val dKeys = dirty.select(col("dirty_id"), col("d_nation"),
      explode(delNeighborhood(col("d_name"))).as("bk"))
    val cKeys = clean.select(col("cand_key"), col("c_nationkey"),
      explode(delNeighborhood(col("c_name"))).as("bk"))
    val nameCands = dKeys.join(cKeys,
        dKeys("d_nation") === cKeys("c_nationkey") && dKeys("bk") === cKeys("bk"))
      .select(col("dirty_id"), col("cand_key"))
    // pass 2: exact (nation, segment, balance) agreement
    val attrCands = dirty.join(clean,
        col("d_nation") === col("c_nationkey") &&
          col("d_seg") === col("c_mktsegment") && col("d_bal") === col("c_bal"))
      .select(col("dirty_id"), col("cand_key"))
    val cands = nameCands.unionByName(attrCands).distinct()
    scorePairs(cands
      .join(dirty, "dirty_id")
      .join(clean, "cand_key"))
  }

  /** The round-13 single-pass form — nation-only blocking, O(Σ block²)
    * candidates. Kept as the spec's equality control arm; never the
    * registry path. */
  private[graft] def fsLinkageNaive(customer: DataFrame): DataFrame = {
    val (dirty, clean) = sides(customer)
    scorePairs(dirty.join(clean, col("d_nation") === col("c_nationkey")))
  }
}
