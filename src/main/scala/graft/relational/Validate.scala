package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declarative constraint validation (q216) — the dbt-test / Deequ-style
  * data-quality gate an ingest pipeline runs before publishing a corpus
  * snapshot: a fixed rule set evaluated in ONE scan, reported as a row
  * per rule with its violation count. A gate that needs one scan per
  * rule is unusable at 100 TB; here every rule folds into a single hash
  * aggregation (the q202 profile shape) and the 1-row result is
  * unpivoted locally with `stack`.
  *
  * Null semantics are part of each rule's contract and identical in both
  * engines: a rule is written as "violation unless the predicate proves
  * the row healthy", so a NULL that makes the predicate unknown COUNTS
  * as a violation (`CASE WHEN p THEN 0 ELSE 1 END` — null lands in
  * ELSE). Uniqueness is `count(key) − count(DISTINCT key)` (surplus
  * NON-NULL rows beyond one per key; both count forms ignore nulls in
  * both engines, so null keys surface through the not-null rule, not
  * the unique rule). */
object Validate {

  /** Constraint report over the documents table. Rules:
    *  - `doc_id_not_null`   — key present
    *  - `doc_id_unique`     — surplus rows sharing a doc_id
    *  - `text_not_empty`    — text present and non-empty
    *  - `n_chars_matches_text` — declared length equals `length(text)`
    *  - `lang_accepted`     — lang within the accepted-values list
    *  - `source_accepted`   — source matches the `srcN` namespace
    */
  def documentConstraints(docs: DataFrame,
      acceptedLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh")): DataFrame = {
    require(acceptedLangs.nonEmpty)
    val healthy = Map(
      "doc_id_not_null" -> col("doc_id").isNotNull,
      "doc_id_unique" -> lit(true), // handled via the distinct-count form
      "text_not_empty" -> (length(col("text")) > 0),
      "n_chars_matches_text" -> (col("n_chars") === length(col("text"))),
      "lang_accepted" -> col("lang").isin(acceptedLangs: _*),
      "source_accepted" -> col("source").rlike("^src[0-9]+$"))
    def violations(name: String) =
      sum(when(healthy(name), 0L).otherwise(1L)).as(s"__v_$name")
    val one = docs.agg(
      count(lit(1)).as("__rows"),
      violations("doc_id_not_null"),
      (count(col("doc_id")) - countDistinct(col("doc_id"))).as("__v_doc_id_unique"),
      violations("text_not_empty"),
      violations("n_chars_matches_text"),
      violations("lang_accepted"),
      violations("source_accepted"))
    val rules = Seq("doc_id_not_null", "doc_id_unique", "text_not_empty",
      "n_chars_matches_text", "lang_accepted", "source_accepted")
    val stackArgs = rules.map(r => s"'$r', __v_$r").mkString(", ")
    one.select(col("__rows"),
        expr(s"stack(${rules.length}, $stackArgs) AS (rule, n_violations)"))
      .select(col("rule"), col("__rows").as("n_checked"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** k-anonymity audit (q233) — the re-identification gate a governed
    * corpus release runs: group documents by their quasi-identifier
    * tuple (language × length bucket here — the attributes an attacker
    * can observe externally) and surface every equivalence class with
    * fewer than k members; a document in a small class is
    * re-identifiable by its quasi-identifiers alone, so releases
    * suppress or generalize those rows. One hash agg over the corpus +
    * a size filter; the output is the (tiny) risky-class frame a
    * suppression step consumes, ordered audit-stable. */
  def kAnonymityAudit(docs: DataFrame, k: Long = 5,
      lenBucket: Int = 100): DataFrame = {
    require(k >= 2 && lenBucket >= 1)
    docs.groupBy(col("lang"),
        floor(col("n_chars") / lenBucket).as("len_bucket"))
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** l-diversity audit (q246) — k-anonymity's necessary complement: a
    * quasi-identifier class can be large (k-anonymous) yet carry only
    * ONE sensitive value, so membership alone leaks the attribute
    * (the homogeneity attack). Per (lang × length-bucket) class:
    * size, distinct sensitive values (`source` stands in as the
    * sensitive attribute), and the diversity verdict `n_sensitive ≥ l`.
    * Same single-hash-agg shape as [[kAnonymityAudit]] — the exact
    * `count(DISTINCT)` is the honest cost, as in q202. */
  def lDiversityAudit(docs: DataFrame, l: Long = 3,
      lenBucket: Int = 100): DataFrame = {
    require(l >= 2 && lenBucket >= 1)
    docs.groupBy(col("lang"),
        floor(col("n_chars") / lenBucket).as("len_bucket"))
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col("source")).as("n_sensitive"))
      .select(col("lang"), col("len_bucket"), col("group_size"),
        col("n_sensitive"), (col("n_sensitive") >= l).as("diverse"))
  }

  /** t-closeness audit (q258) — the third rung of the privacy-audit
    * ladder after k-anonymity (q233) and l-diversity (q246): a class can
    * be large AND diverse yet still leak if its sensitive-value
    * DISTRIBUTION differs sharply from the corpus-wide one (the skewness
    * attack — membership shifts an attacker's posterior). Per
    * quasi-identifier class (lang × length bucket), the distance between
    * the class's `source` distribution and the global one, measured as
    * total variation distance (the categorical Earth-Mover's distance
    * under the uniform ground metric): TVD = ½·Σ_s |p_s − q_s|.
    *
    * Scale shape: sources ABSENT from a class still contribute (|0 − q_s|
    * = q_s), but materializing the class × source cross product to
    * zero-fill them would be a needless blow-up. Instead the absent mass
    * folds in algebraically: Σ_absent q_s = 1 − Σ_present q_s, so
    * TVD = ½·(1 + Σ_present(|p_s − q_s| − q_s)) — only OBSERVED
    * (class, source) cells are ever touched. One corpus scan builds the
    * cell frame; class totals and the global source distribution are
    * tiny re-aggregations OF that frame (no second scan); per-cell
    * contributions quantize to DECIMAL(30,18) before the sum (the q219
    * PSI rule) so the reduction is order-independent and engine-exact. */
  def tClosenessAudit(docs: DataFrame, t: Double = 0.35,
      lenBucket: Int = 100): DataFrame = {
    require(t > 0 && lenBucket >= 1)
    val cell = docs.groupBy(col("lang"),
        floor(col("n_chars") / lenBucket).as("len_bucket"), col("source"))
      .agg(count(lit(1)).as("ncs"))
    val cls = cell.groupBy("lang", "len_bucket").agg(sum("ncs").as("nc"))
    val glob = cell.groupBy("source").agg(sum("ncs").as("ns"))
    val tot = glob.agg(sum("ns").as("n"))
    val p = col("ncs").cast("double") / col("nc").cast("double")
    val q = col("ns").cast("double") / col("n").cast("double")
    val tvd = round((lit(1.0) + sum("contrib").cast("double")) / 2, 6)
    cell.join(cls, Seq("lang", "len_bucket"))
      .join(broadcast(glob), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("len_bucket"), col("nc"),
        (abs(p - q) - q).cast(DecimalType(30, 18)).as("contrib"))
      .groupBy("lang", "len_bucket", "nc")
      .agg(tvd.as("tvd"))
      .select(col("lang"), col("len_bucket"), col("nc").as("group_size"),
        col("tvd"), (col("tvd") <= t).as("close"))
  }
}
