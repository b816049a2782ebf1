package graft.llmdata

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Synthetic ingestion clock for the time-series curation diagnostics
  * (q147/q148/q151/q153/q156).
  *
  * The driver fixtures carry no ingestion timestamp, and the testdata
  * directory is read-only — so the clock is DERIVED, deterministically, from
  * the arrival-order id: `ingest_ts = EPOCH_BASE + id` seconds (ids are
  * assigned in ingestion sequence, so the derived clock is a faithful
  * arrival-time model: one document per second, batchSize-second tumbling
  * windows = batchSize-document batches). The point of routing the grouping
  * through a REAL `window(ingest_ts, "N seconds")` rather than `id div N` is
  * that the operators now exercise Spark's actual event-time windowing — the
  * exact grouping a production pipeline with a real `ingest_ts` column runs —
  * while the derived `ingest_batch` ordinal keeps the output schema (and the
  * DuckDB oracles, which compute `doc_id // N`) unchanged.
  *
  * Exactness: EPOCH_BASE is a multiple of every batchSize used (100), so the
  * tumbling window start (Spark aligns windows to the 1970 epoch) is exactly
  * `EPOCH_BASE + (id div N) * N`, and `batchIndex` recovers `id div N`
  * losslessly — the indices are tiny integers, far inside double precision.
  */
object Ingest {

  /** 2024-01-01T00:00:00Z; divisible by 100 (see exactness note above). */
  val EpochBase = 1704067200L

  /** The derived event-time column for an arrival-order id. */
  def ingestTs(id: Column): Column = timestamp_seconds(lit(EpochBase) + id)

  /** Recover the arrival-order batch ordinal from a window struct —
    * `(epoch(start) − EPOCH_BASE) / batchSize`, exact (see scaladoc). */
  def batchIndex(w: Column, batchSize: Long): Column =
    ((unix_timestamp(w.getField("start")) - lit(EpochBase)) /
      lit(batchSize)).cast("long")

  /** Row-level batch ordinal of an id: the event-time floor
    * `(epoch(ingest_ts) − EPOCH_BASE) div batchSize` — identical to the
    * window-start recovery, but usable where `window()` is not (Spark
    * rejects multiple time-window expressions in one projection, which the
    * two-sided pair tagging in q151 would need). Grouping sites use the
    * real `window()`; this is only for per-row tagging. */
  def batchOf(id: Column, batchSize: Long): Column =
    ((unix_timestamp(ingestTs(id)) - lit(EpochBase)) / lit(batchSize))
      .cast("long")
}
