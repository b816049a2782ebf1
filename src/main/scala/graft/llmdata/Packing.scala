package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GREEDY SEQUENCE PACKING (q357) — the LLM-training batching op: fill
  * fixed-budget training sequences ("bins") with documents, first-fit
  * in a deterministic order, starting a new bin whenever the next
  * document would overflow the budget. Packing is per GROUP (language
  * here — the usual per-corpus-slice batching), documents ordered by
  * `doc_id`, cost = text bytes (swap in a token counter for a real
  * tokenizer budget; the algorithm is cost-agnostic). A document larger
  * than the budget gets a bin of its own — greedy never splits.
  *
  * Scale shape: ONE shuffle clusters each group (`repartition(lang)`),
  * a LOCAL sort makes the greedy scan deterministic, and the scan
  * itself is a single O(n) pass per partition with O(1) state — groups
  * pack sequentially (inherent: bin k's start depends on every earlier
  * document), but distinct groups pack in parallel across the cluster.
  * At 100 TB the group key is whatever slice a sequence may not cross
  * (lang × source × date …), which also bounds per-task data; a single
  * monster group would call for sub-slicing the key, not for a cleverer
  * shuffle. Engine extension (reference has no packing; the pattern is
  * the T5/LLM data-pipeline "sequence packing" step). */
object Packing {

  /** Pack each language's documents (ordered by doc_id) into bins of at
    * most `capacity` text bytes. Returns one row per document:
    * (lang, doc_id, cost, bin) with bins numbered 0.. per language. */
  def packGreedy(docs: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"packing capacity must be positive: $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("lang"), col("doc_id"),
        octet_length(col("text")).cast("long").as("cost"))
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // a partition may hold several whole groups (hash collisions);
        // state resets at every group boundary — the sort guarantees
        // each group is contiguous and id-ordered. An explicit
        // first-row flag marks the boundary: a null sentinel would
        // confuse "no group yet" with a leading NULL-key group (whose
        // oversized first doc would then skip the reset and start at
        // bin 1, diverging from the oracle's rn=1-seeds-bin-0 rule).
        var started = false
        var lang: String = null
        var bin = 0L
        var acc = 0L
        it.map { case (l, id, cost) =>
          if (!started || l != lang) { started = true; lang = l; bin = 0L; acc = cost }
          else if (acc + cost > capacity) { bin += 1; acc = cost }
          else acc += cost
          (l, id, cost, bin)
        }
      }
      .toDF("lang", "doc_id", "cost", "bin")
  }

  /** The q357 registry shape: per-(lang, bin) packing report — how many
    * documents landed in each sequence, its fill in bytes, and the bin's
    * first document (the deterministic-order witness). */
  def packingReport(docs: DataFrame, capacity: Long): DataFrame =
    packGreedy(docs, capacity)
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("cost")).cast("long").as("bin_bytes"),
        min(col("doc_id")).cast("long").as("first_doc"))
}
