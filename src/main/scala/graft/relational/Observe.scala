package graft.relational

import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables

/** Pipeline observability via Spark's `observe`/[[Observation]] channel
  * (q318): a production ingest pipeline wants per-stage metrics — rows
  * in, rows surviving each gate, byte volumes, selectivities — WITHOUT
  * re-running audit queries. `observe` attaches accumulator-backed
  * aggregates to the running plan (a `CollectMetrics` node), so the
  * metrics ride the SAME pass over the data: zero extra scans, exact
  * values (accumulators are exactly-once per successful batch action),
  * delivered on the driver when the action completes. At 100 TB this is
  * the difference between "the gate dropped 37.2% of bytes" costing
  * nothing and costing a second corpus read. */
object Observe {

  /** q318 — a two-stage observed quality gate over the documents table:
    * stage metrics BEFORE the byte-length gate and AFTER it, one shared
    * scan, returned as the 1-row metric frame. The oracle recomputes all
    * four aggregates relationally (FILTER-ed twins) — hash agreement
    * certifies the observe channel delivers exactly the values the
    * relational plan computes, including the derived selectivity (basis
    * points, integer-exact). */
  def observedQualityGate(spark: SparkSession, dir: String): DataFrame = {
    // ISOLATED session for the observed action: attaching an Observation
    // initializes the session's lazy ObservationManager, which is not
    // serializable — and Spark MLlib model summaries capture their
    // SparkSession, so any later closure carrying such a model through
    // the caller's session would hit "Task not serializable". Observing
    // on a child session keeps the caller's session serialization-clean.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    val inObs = new Observation()
    val outObs = new Observation()
    val gated = Tables(s2, dir, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("bytes"))
      .observe(inObs,
        count(lit(1)).as("n_in"),
        coalesce(sum(col("bytes")), lit(0L)).as("bytes_in"))
      .filter(col("bytes") >= 200L)
      .observe(outObs,
        count(lit(1)).as("n_out"),
        coalesce(sum(col("bytes")), lit(0L)).as("bytes_out"))
    gated.count(): Unit // the one action both observations ride
    val in = inObs.get; val out = outObs.get
    val nIn = in("n_in").asInstanceOf[Long]
    val nOut = out("n_out").asInstanceOf[Long]
    val row = Row(nIn, in("bytes_in").asInstanceOf[Long],
      nOut, out("bytes_out").asInstanceOf[Long],
      if (nIn == 0L) 0L else nOut * 10000L / nIn)
    spark.createDataFrame(
      java.util.Collections.singletonList(row),
      StructType(Seq(
        StructField("n_in", LongType, nullable = false),
        StructField("bytes_in", LongType, nullable = false),
        StructField("n_out", LongType, nullable = false),
        StructField("bytes_out", LongType, nullable = false),
        StructField("survival_bp", LongType, nullable = false))))
  }
}
