package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.llmdata.{Curation, Dedup, Multimodal, PairScope, Similarity, TextAnalysis}
import graft.ml.AlsRecommender
import graft.relational.Queries
import graft.streaming.Events

/** Central operator registry: every SURVEY.md §2 operator (and the
  * north-star LLM-data extensions) as a named query over the testdata,
  * paired — where single-statement-SQL-expressible — with the exact
  * DuckDB oracle the driver hash-compares against.
  *
  * Column names AND value determinism are part of the contract: see
  * [[graft.relational.Queries]] for the decimal-sum / rounding rules.
  */
object Registry {

  final case class Entry(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")
  /** [[docs]] spread across the session's shuffle parallelism
    * (Tables.spread — gated, a no-op once the scan carries enough
    * splits). Used ONLY by the registry entries whose scan stage carries
    * heavy per-row CPU (shingle/k-gram explodes, rolling hashes, LSH
    * signatures): there the single-file testdata scan serialized 0.5-4.4s
    * of work on one task (r21, guide §2.5). Measured per query before
    * switching each entry — a BLANKET spread at docs() cost +0.2-0.4s on
    * every light docs query (one extra exchange + AQE stage against no
    * CPU win) for +19.6s aggregate across the suite, so the raw accessor
    * stays the default. embeddings never spreads: its heavy consumers
    * are MLlib iterative loops (q62 IVF k-means) whose per-stage work is
    * tiny — 32 near-empty tasks per iteration measured q62 at 3.3s vs
    * 1.9s on the single small partition (stage-latency-bound). */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    Tables.spread(docs(s, dir), "doc_id")
  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  // DuckDB CTE for the exact-cell lineitem COO (mirrors Queries.cooExact).
  private def cooSql(measure: String): String =
    s"SELECT l_partkey AS mrow, CAST(month(l_shipdate) AS BIGINT) AS mcol, " +
      s"CAST(sum(CAST($measure AS DECIMAL(18,2))) AS DOUBLE) AS mval FROM lineitem GROUP BY 1, 2"

  /** DuckDB mirror of [[graft.relational.Queries.ipfUnrolled]] at any
    * unroll depth: per sweep k, a row-sum CTE + row fit (to the x
    * marginal) then a col-sum CTE + col fit (to the y marginal), each fit
    * consuming the previous CTE and rounding to 6dp — the exact chain the
    * Spark side runs, so the generator and the operator share one `steps`
    * knob and can never drift. Denominator sums ride DECIMAL(38,6)
    * (order-independent, engine-exact — the fitRowsExact rule). */
  private def ipfUnrolledSql(steps: Int): String = {
    require(steps >= 1)
    val sweeps = (1 to steps).map { k =>
      val prev = if (k == 1) "m" else s"fb${k - 1}"
      s"""rs$k AS (SELECT mrow, CAST(sum(CAST(mval AS DECIMAL(38,6))) AS DOUBLE) AS rsum FROM $prev GROUP BY 1),
         |fa$k AS (SELECT $prev.mrow, $prev.mcol, round($prev.mval * (x.xval / rs$k.rsum), 6) AS mval
         |  FROM $prev JOIN rs$k ON $prev.mrow = rs$k.mrow JOIN x ON $prev.mrow = x.idx),
         |cs$k AS (SELECT mcol, CAST(sum(CAST(mval AS DECIMAL(38,6))) AS DOUBLE) AS csum FROM fa$k GROUP BY 1),
         |fb$k AS (SELECT fa$k.mrow, fa$k.mcol, round(fa$k.mval * (y.yval / cs$k.csum), 6) AS mval
         |  FROM fa$k JOIN cs$k ON fa$k.mcol = cs$k.mcol JOIN y ON fa$k.mcol = y.idx)""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (${cooSql("l_extendedprice")}),
       |x AS (SELECT l_partkey AS idx, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS xval
       |  FROM lineitem GROUP BY 1),
       |y AS (SELECT CAST(month(l_shipdate) AS BIGINT) AS idx,
       |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS yval
       |  FROM lineitem GROUP BY 1),
       |$sweeps
       |SELECT mrow, mcol, mval FROM fb$steps ORDER BY 1, 2""".stripMargin
  }

  // The reference fixture's visits.csv hour columns (hours 4 and 5 have no
  // visits and are absent from the wide header — FIXTURES.md §1).
  private val VisitHours: Seq[Int] = Seq(0, 1, 2, 3) ++ (6 to 23)

  /** DuckDB mirror of the visits melt + zero-pad union (same oracle for the
    * pivot→CSV→melt round-trip, which must settle to the identical COO). */
  /** Shared by q207 (batch argmax-struct) and q211 (streaming keyed
    * state): the latest-wins changelog compaction spelled as the oracle's
    * window rank. */
  /** Shared by q223 (batch PIT join) and q283 (the same join streaming):
    * SCD2 intervals from the signup/error change stream, facts enriched
    * with the state valid AT their own event time. */
  private val pitJoinSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
      |d0 AS (SELECT * FROM e WHERE event_type IN ('signup', 'error')),
      |l AS (SELECT user_id, ts_ms, event_id, event_type,
      |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_type FROM d0),
      |c AS (SELECT user_id, ts_ms, event_id, event_type FROM l
      | WHERE prev_type IS NULL OR prev_type <> event_type),
      |i AS (SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
      |  lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS valid_to_ms FROM c),
      |f AS (SELECT event_id, user_id, ts_ms FROM e WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, f.ts_ms,
      | coalesce(i.state, 'none') AS state_at_purchase,
      | i.valid_from_ms AS state_since_ms
      |FROM f LEFT JOIN i ON i.user_id = f.user_id AND i.valid_from_ms <= f.ts_ms
      |  AND (i.valid_to_ms IS NULL OR f.ts_ms < i.valid_to_ms)
      |ORDER BY f.event_id""".stripMargin

  private val cdcCompactSql: String =
    """WITH last AS (SELECT user_id, event_id, event_type, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      | value AS last_value
      |FROM last WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  private def paddedMatrixSql: String = {
    val fx = Queries.FixtureDir
    val melted = VisitHours.map(h =>
      s"""SELECT Keyword, $h AS hour, CAST("$h" AS DOUBLE) AS visits FROM v""")
      .mkString("\n  UNION ALL ")
    s"""WITH v AS (SELECT * FROM read_csv('$fx/visits.csv', header=true)),
       |k AS (SELECT Keyword FROM read_csv('$fx/keywords.csv', header=true) WHERE TotalClicks <> 0),
       |melted AS ($melted),
       |missing AS (SELECT Keyword FROM k WHERE Keyword NOT IN (SELECT Keyword FROM v)),
       |zeros AS (SELECT m.Keyword, h.hour, 0.0 AS visits FROM missing m
       |  CROSS JOIN (SELECT unnest([${VisitHours.mkString(", ")}]) AS hour) h)
       |SELECT Keyword, CAST(hour AS BIGINT) AS hour, visits
       |FROM (SELECT * FROM melted UNION ALL SELECT * FROM zeros)
       |ORDER BY Keyword, hour""".stripMargin
  }

  val all: Seq[(String, Entry)] = Seq(

    // ---- scans / filters / aggregations ---------------------------------
    "q01_pricing_summary" -> Entry(Queries.pricingSummary, Some(
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "q02_filter_project" -> Entry(Queries.filterProject, Some(
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
        | l_extendedprice, l_discount, l_extendedprice * l_discount AS disc_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    "q03_revenue_agg" -> Entry(Queries.revenueAgg, Some(
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // ---- joins ----------------------------------------------------------
    "q04_join_agg_segment" -> Entry(Queries.joinAggSegment, Some(
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "q05_revenue_by_nation" -> Entry(Queries.revenueByNation, Some(
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    "q06_broadcast_join_part" -> Entry(Queries.broadcastJoinPart, Some(
      """SELECT p_brand, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    "q07_anti_join_customers" -> Entry(Queries.antiJoinCustomers, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin)),

    "q08_semi_join_suppliers" -> Entry(Queries.semiJoinSuppliers, Some(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin)),

    // ---- window / sort / set ops ----------------------------------------
    "q09_window_share" -> Entry(Queries.windowShare, Some(
      """SELECT l_returnflag, l_linestatus, qty,
        | qty / sum(qty) OVER (PARTITION BY l_returnflag) AS share
        |FROM (SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        | FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "q10_sort_customers" -> Entry(Queries.sortCustomers, Some(
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey""".stripMargin)),

    "q11_union_tagged" -> Entry(Queries.unionTagged, Some(
      """SELECT 'customer' AS side, CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n
        |FROM customer GROUP BY 2
        |UNION ALL
        |SELECT 'supplier' AS side, CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n
        |FROM supplier GROUP BY 2
        |ORDER BY side, nationkey""".stripMargin)),

    "q12_symmetric_diff" -> Entry(Queries.symmetricDiff, Some(
      """SELECT 'left' AS side, custkey FROM
        | (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'right' AS side, custkey FROM
        | (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY side, custkey""".stripMargin)),

    "q13_outer_product" -> Entry(Queries.outerProduct, Some(
      """SELECT nationkey, orderstatus, u_n * v_n AS mass FROM
        | (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS u_n FROM customer GROUP BY 1) u
        | CROSS JOIN
        | (SELECT o_orderstatus AS orderstatus, count(*) AS v_n FROM orders GROUP BY 1) v
        |ORDER BY nationkey, orderstatus""".stripMargin)),

    "q64_stream_interval_join" -> Entry((s, d) => Events.streamingIntervalJoin(s, d)
      .orderBy("p_event", "v_event"), Some(
      """SELECT p.event_id AS p_event, v.event_id AS v_event,
        | epoch_ms(p.ts) - epoch_ms(v.ts) AS lag_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        | ON p.user_id = v.user_id
        | AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |ORDER BY p_event, v_event""".stripMargin)),

    // Stream-stream LEFT OUTER interval join: q64's machinery with
    // leftOuter — unmatched purchases emit null-padded exactly once, at
    // watermark eviction (the no-data batch). Settled == the batch left
    // join restricted to matured purchases (p_ms strictly below the final
    // watermark, re-derived from the batch table); the null-only-after-
    // eviction cross-batch behavior is MemoryStream-pinned in
    // StreamingSpec.
    "q267_stream_outer_join" -> Entry((s, d) =>
      Events.streamingIntervalJoinOuter(s, d).orderBy("p_event", "v_event"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
        |p AS (SELECT user_id AS p_user, ts_ms AS p_ms, event_id AS p_event
        |  FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, ts_ms AS v_ms, event_id AS v_event
        |  FROM e WHERE event_type = 'view'),
        |wm AS (SELECT least((SELECT max(p_ms) FROM p), (SELECT max(v_ms) FROM v))
        |  - 3900000 AS cutoff)
        |SELECT p_event, p_ms, v_event, p_ms - v_ms AS lag_ms
        |FROM p CROSS JOIN wm
        | LEFT JOIN v ON p_user = v_user AND v_ms >= p_ms - 3600000 AND v_ms <= p_ms
        |WHERE p_ms < cutoff
        |ORDER BY p_event, v_event""".stripMargin)),

    // Stream-stream FULL OUTER interval join — completes the stream-join
    // matrix (inner q64, left outer q267): matched pairs plus BOTH null
    // sides, each unmatched row emitted once at its own watermark
    // eviction point. Two-sided maturity restriction (purchases below
    // cutoff, views below cutoff - window) mirrored exactly in the
    // batch full-outer oracle.
    "q294_stream_full_outer_join" -> Entry((s, d) =>
      Events.streamingIntervalJoinFullOuter(s, d)
        .orderBy("p_event", "v_event"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
        |p AS (SELECT user_id AS p_user, ts_ms AS p_ms, event_id AS p_event
        |  FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, ts_ms AS v_ms, event_id AS v_event
        |  FROM e WHERE event_type = 'view'),
        |wm AS (SELECT least((SELECT max(p_ms) FROM p), (SELECT max(v_ms) FROM v))
        |  - 3900000 AS cutoff)
        |SELECT p_event, p_ms, v_event, v_ms, p_ms - v_ms AS lag_ms
        |FROM p FULL OUTER JOIN v
        |  ON p_user = v_user AND v_ms >= p_ms - 3600000 AND v_ms <= p_ms
        | CROSS JOIN wm
        |WHERE (p_event IS NOT NULL AND p_ms < cutoff)
        |   OR (p_event IS NULL AND v_ms < cutoff - 3600000)
        |ORDER BY p_event, v_event""".stripMargin)),

    // Multi-stateful streaming pipeline: stream-stream interval join ->
    // tumbling-window count in ONE query (two chained state stores,
    // both watermark-evicted). Settled windows strictly below the final
    // watermark equal the batch join + epoch-aligned hour buckets.
    "q299_stream_join_then_window" -> Entry((s, d) =>
      Events.streamingJoinThenWindow(s, d).orderBy("window_start_ms"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
        |p AS (SELECT user_id AS p_user, ts_ms AS p_ms FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, ts_ms AS v_ms FROM e WHERE event_type = 'view'),
        |wm AS (SELECT least((SELECT max(p_ms) FROM p), (SELECT max(v_ms) FROM v))
        |  - 3900000 AS cutoff),
        |pairs AS (SELECT (p_ms // 3600000) * 3600000 AS window_start_ms
        |  FROM p JOIN v ON p_user = v_user
        |   AND v_ms >= p_ms - 3600000 AND v_ms <= p_ms)
        |SELECT window_start_ms, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM pairs CROSS JOIN wm
        |WHERE window_start_ms + 3600000 < cutoff
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Batch twin of q64 — same semantics, same oracle, but a plain
    // (explainable) batch plan: the PlanAudit surface for the interval join.
    "q77_interval_join" -> Entry((s, d) => Events.intervalJoin(s, d)
      .orderBy("p_event", "v_event"), Some(
      """SELECT p.event_id AS p_event, v.event_id AS v_event,
        | epoch_ms(p.ts) - epoch_ms(v.ts) AS lag_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        | ON p.user_id = v.user_id
        | AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |ORDER BY p_event, v_event""".stripMargin)),

    "q63_rollup_revenue" -> Entry(Queries.rollupRevenue, Some(
      """SELECT COALESCE(c_mktsegment, '<all>') AS mktsegment,
        | COALESCE(o_orderstatus, '<all>') AS orderstatus,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
        |ORDER BY mktsegment, orderstatus""".stripMargin)),

    // ---- COO matrix operators -------------------------------------------
    "q14_matrix_transpose" -> Entry(Queries.matrixTranspose, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")})
         |SELECT mcol AS mrow, mrow AS mcol, mval FROM m ORDER BY 1, 2""".stripMargin)),

    "q15_matrix_sum_rows" -> Entry(Queries.matrixSumRows, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")})
         |SELECT mrow, round(sum(mval), 4) AS mval FROM m GROUP BY mrow ORDER BY mrow""".stripMargin)),

    "q16_matrix_sum_cols" -> Entry(Queries.matrixSumCols, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")})
         |SELECT mcol, round(sum(mval), 4) AS mval FROM m GROUP BY mcol ORDER BY mcol""".stripMargin)),

    "q17_matrix_multiply" -> Entry(Queries.matrixMultiply, Some(
      s"""WITH a AS (${cooSql("l_quantity")}),
         |b AS (SELECT CAST(month(l_shipdate) AS BIGINT) AS mrow, l_returnflag AS mcol,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS mval
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT a.mrow AS mrow, b.mcol AS mcol, round(sum(a.mval * b.mval), 4) AS mval
         |FROM a JOIN b ON a.mcol = b.mrow GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    "q18_marginal_dot" -> Entry(Queries.marginalDot, Some(
      """WITH a AS (SELECT l_partkey AS k, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS av
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT l_partkey AS k, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bv
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(CAST(a.av * b.bv AS DECIMAL(38,4))) AS DOUBLE) AS dot_product
        |FROM a JOIN b ON a.k = b.k""".stripMargin)),

    "q19_marginal_l2norm" -> Entry(Queries.marginalL2Norm, Some(
      """WITH a AS (SELECT l_partkey AS k, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS av
        |  FROM lineitem GROUP BY 1)
        |SELECT sqrt(CAST(sum(CAST(av * av AS DECIMAL(38,4))) AS DOUBLE)) AS l2_norm FROM a""".stripMargin)),

    "q20_marginal_rmse" -> Entry(Queries.marginalRmse, Some(
      """WITH a AS (SELECT l_partkey AS k, sum(CAST(l_quantity AS DECIMAL(18,2))) AS av
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT l_partkey AS k, sum(CAST(l_quantity AS DECIMAL(18,2))) AS bv
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
        |d AS (SELECT a.av - COALESCE(b.bv, CAST(0 AS DECIMAL(18,2))) AS d
        |  FROM a LEFT JOIN b ON a.k = b.k)
        |SELECT sqrt(CAST(sum(CAST(d * d AS DECIMAL(38,4))) AS DOUBLE)) AS rmse FROM d""".stripMargin)),

    "q21_laplace_smooth" -> Entry(Queries.laplaceSmooth, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")})
         |SELECT mrow, mcol, mval + 0.5 AS mval FROM m ORDER BY 1, 2""".stripMargin)),

    "q22_safe_divide" -> Entry(Queries.safeDivide, Some(
      s"""WITH p AS (${cooSql("l_extendedprice")}), q AS (${cooSql("l_quantity")})
         |SELECT p.mrow AS mrow, p.mcol AS mcol,
         | CASE WHEN q.mval = 0.0 THEN 0.0 ELSE p.mval / q.mval END AS mval
         |FROM p JOIN q ON p.mrow = q.mrow AND p.mcol = q.mcol ORDER BY 1, 2""".stripMargin)),

    "q23_error_matrix" -> Entry(Queries.errorMatrix, Some(
      s"""WITH p AS (${cooSql("l_extendedprice")}), q AS (${cooSql("l_quantity")})
         |SELECT p.mrow AS mrow, p.mcol AS mcol, abs(p.mval - q.mval) AS mval
         |FROM p JOIN q ON p.mrow = q.mrow AND p.mcol = q.mcol ORDER BY 1, 2""".stripMargin)),

    "q24_minmax_normalize" -> Entry(Queries.minMaxNormalize, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")}),
         |s AS (SELECT min(mval) AS mn, max(mval) AS mx FROM m)
         |SELECT mrow, mcol, (mval - mn) / (mx - mn) AS mval FROM m, s ORDER BY 1, 2""".stripMargin)),

    "q25_ipf_fit_rows" -> Entry(Queries.ipfFitRows, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")}),
         |rs AS (SELECT mrow, sum(mval) AS rsum FROM m GROUP BY 1),
         |x AS (SELECT l_partkey AS mrow, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS xval
         |  FROM lineitem GROUP BY 1)
         |SELECT m.mrow AS mrow, m.mcol AS mcol, round(m.mval * (x.xval / rs.rsum), 6) AS mval
         |FROM m JOIN rs ON m.mrow = rs.mrow JOIN x ON m.mrow = x.mrow
         |ORDER BY 1, 2""".stripMargin)),

    "q26_ipf_converge" -> Entry((s, d) => Queries.ipfConverge(s, d), None),

    // One full IPF sweep (reference `step`, core.clj:89-97), unrolled as
    // CTEs: f1 = row fit (the q25 shape, rounded 6dp), cs = decimal-exact
    // column sums of the rounded intermediate (mirrors fitRowsExact), f2 =
    // column fit. The decimal column sums are what make the ~2000-row
    // aggregations bit-identical across engines.
    "q76_ipf_two_sweep" -> Entry(Queries.ipfTwoSweep, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")}),
         |x AS (SELECT l_partkey AS idx, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS xval
         |  FROM lineitem GROUP BY 1),
         |y AS (SELECT CAST(month(l_shipdate) AS BIGINT) AS idx,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS yval
         |  FROM lineitem GROUP BY 1),
         |rs AS (SELECT mrow, sum(mval) AS rsum FROM m GROUP BY 1),
         |f1 AS (SELECT m.mrow, m.mcol, round(m.mval * (x.xval / rs.rsum), 6) AS mval
         |  FROM m JOIN rs ON m.mrow = rs.mrow JOIN x ON m.mrow = x.idx),
         |cs AS (SELECT mcol, CAST(sum(CAST(mval AS DECIMAL(38,6))) AS DOUBLE) AS csum
         |  FROM f1 GROUP BY 1),
         |f2 AS (SELECT f1.mrow, f1.mcol, round(f1.mval * (y.yval / cs.csum), 6) AS mval
         |  FROM f1 JOIN cs ON f1.mcol = cs.mcol JOIN y ON f1.mcol = y.idx)
         |SELECT mrow, mcol, mval FROM f2 ORDER BY 1, 2""".stripMargin)),

    // Fixed-k unrolled IPF — the q76 sweep CHAINED, closing the
    // `converge` loop-semantics oracle gap (q26 stays rows-only for the
    // stopping rule). Every fit mirrors fitRowsExact: the factor denominator
    // is a DECIMAL(38,6) sum (order-independent, engine-exact) and every
    // fit output is rounded to 6dp before the next sweep consumes it.
    // The oracle CTE chain is generated by ipfUnrolledSql(steps), in
    // lockstep with Queries.ipfUnrolled's `steps` parameter: q94 pins 2
    // sweeps (the round-8 form, unchanged), q121 pins 4 — repeated-
    // composition arithmetic certified out to near the real convergence
    // horizon of the reference loop (core.clj:99-119).
    "q94_ipf_unrolled" -> Entry((s, d) => Queries.ipfUnrolled(s, d, steps = 2),
      Some(ipfUnrolledSql(2))),

    "q121_ipf_unrolled4" -> Entry((s, d) => Queries.ipfUnrolled(s, d, steps = 4),
      Some(ipfUnrolledSql(4))),

    "q28_matrix_norm" -> Entry(Queries.matrixNorm, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")}),
         |r AS (SELECT mrow, sqrt(CAST(sum(CAST(mval * mval AS DECIMAL(38,4))) AS DOUBLE)) AS n
         |  FROM m GROUP BY mrow)
         |SELECT CAST(sum(CAST(round(n, 6) AS DECIMAL(38,6))) AS DOUBLE) AS l21_norm FROM r""".stripMargin)),

    "q29_diff_vector" -> Entry(Queries.diffVector, Some(
      """WITH a AS (SELECT l_partkey AS k, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS av
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT l_partkey AS k, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS bv
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1)
        |SELECT COALESCE(a.k, b.k) AS k, COALESCE(av, 0.0) - COALESCE(bv, 0.0) AS diff_v
        |FROM a FULL JOIN b ON a.k = b.k ORDER BY k""".stripMargin)),

    "q27_zero_pad_union" -> Entry(Queries.zeroPadUnion, Some(
      """SELECT l_partkey AS mrow, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS mval
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT p_partkey AS mrow, 0.0 AS mval FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
        |ORDER BY mrow""".stripMargin)),

    // ---- text analysis ---------------------------------------------------
    "q30_token_stats" -> Entry(
      (s, d) => TextAnalysis.tokenStats(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(length(text) AS BIGINT) AS n_chars_obs,
        | CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha_chars,
        | CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "q31_quality_score" -> Entry(
      (s, d) => TextAnalysis.qualityScore(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id,
        | CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
        | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS digit_ratio,
        | CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','and','of','to','in','is'))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        | 1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Gopher-style rule gate (Rae et al. 2021 A1.1, word-statistics core)
    // with per-rule failure attribution: the order-independent per-rule
    // marginal next to q250's sequential waterfall. Cross-multiplied
    // integer thresholds — no float boundary between engines.
    "q260_gopher_rules" -> Entry(
      (s, d) => TextAnalysis.gopherRuleReport(docsSpread(s, d)).orderBy("rule"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |   length(replace(text, ' ', '')) AS chars FROM documents),
        |d AS (SELECT doc_id, len(toks) AS words, chars,
        |   len(list_intersect(toks, ['the','a','and','of','to','in','is'])) AS n_stop FROM t),
        |tf AS (SELECT doc_id, max(c) AS max_tok, count(*) AS n_types FROM (
        |   SELECT doc_id, tok, count(*) AS c
        |   FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2) GROUP BY 1),
        |f AS (SELECT (words < 40 OR words > 10000) AS f1,
        |   (chars < words*3 OR chars > words*10) AS f2,
        |   (max_tok*5 > words) AS f3,
        |   (n_types*5 < words) AS f4,
        |   (n_stop < 2) AS f5
        |  FROM d JOIN tf USING (doc_id)),
        |a AS (SELECT count(*) AS n_docs,
        |   CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |   CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |   CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |   CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS v4,
        |   CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT) AS v5,
        |   CAST(sum(CASE WHEN f1 OR f2 OR f3 OR f4 OR f5 THEN 1 ELSE 0 END) AS BIGINT) AS vany
        |  FROM f)
        |SELECT rule, n_docs, n_fail, round(CAST(n_fail AS DOUBLE)/n_docs, 6) AS fail_share
        |FROM (
        | SELECT 'word_count' AS rule, n_docs, v1 AS n_fail FROM a UNION ALL
        | SELECT 'mean_word_len', n_docs, v2 FROM a UNION ALL
        | SELECT 'top_token_share', n_docs, v3 FROM a UNION ALL
        | SELECT 'type_token_ratio', n_docs, v4 FROM a UNION ALL
        | SELECT 'stopword_types', n_docs, v5 FROM a UNION ALL
        | SELECT 'any_rule', n_docs, vany FROM a)
        |ORDER BY rule""".stripMargin)),

    "q32_lang_id" -> Entry(
      (s, d) => TextAnalysis.langId(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id, lang,
        | CAST((CASE WHEN contains(' ' || text || ' ', ' the ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || text || ' ', ' and ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || text || ' ', ' of ') THEN 1 ELSE 0 END) AS BIGINT) AS score_en,
        | CAST((CASE WHEN contains(' ' || text || ' ', ' el ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || text || ' ', ' la ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || text || ' ', ' de ') THEN 1 ELSE 0 END) AS BIGINT) AS score_es,
        | CAST((CASE WHEN contains(' ' || text || ' ', ' der ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || text || ' ', ' und ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || text || ' ', ' das ') THEN 1 ELSE 0 END) AS BIGINT) AS score_de,
        | CASE WHEN (CASE WHEN contains(' ' || text || ' ', ' the ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' and ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' of ') THEN 1 ELSE 0 END) >=
        |           (CASE WHEN contains(' ' || text || ' ', ' el ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' la ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' de ') THEN 1 ELSE 0 END)
        |       AND (CASE WHEN contains(' ' || text || ' ', ' the ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' and ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' of ') THEN 1 ELSE 0 END) >=
        |           (CASE WHEN contains(' ' || text || ' ', ' der ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' und ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' das ') THEN 1 ELSE 0 END)
        |      THEN 'en'
        |      WHEN (CASE WHEN contains(' ' || text || ' ', ' el ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' la ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' de ') THEN 1 ELSE 0 END) >=
        |           (CASE WHEN contains(' ' || text || ' ', ' der ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' und ') THEN 1 ELSE 0 END
        |          + CASE WHEN contains(' ' || text || ' ', ' das ') THEN 1 ELSE 0 END)
        |      THEN 'es' ELSE 'de' END AS lang_pred
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "q33_fingerprint" -> Entry(
      (s, d) => TextAnalysis.fingerprint(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "q34_shingle_stats" -> Entry(
      (s, d) => TextAnalysis.shingleStats(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]))) AS BIGINT) AS n_distinct_shingles
        |FROM documents WHERE len(string_split(text, ' ')) >= 3 ORDER BY doc_id""".stripMargin)),

    // The oracle mirrors the same per-character left fold via list_reduce;
    // the accumulator rides a VARCHAR (list_reduce infers the accumulator
    // type from the list elements, which are single-char strings) and the
    // modular arithmetic keeps every intermediate exact in BIGINT on both
    // engines — previously rows-only, upgraded once list_reduce proved
    // available in the oracle's DuckDB.
    "q35_rolling_hash" -> Entry(
      (s, d) => TextAnalysis.rollingHash(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id,
        | CAST(list_reduce(list_prepend('0', string_split(text, '')),
        |   (acc, c) -> CAST((CAST(acc AS BIGINT) * 31 + ascii(c)) % 1000000007
        |     AS VARCHAR)) AS BIGINT) AS rolling_hash
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "q73_bpe_token_stats" -> Entry(
      (s, d) => TextAnalysis.bpeTokenStats(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_pieces,
        | CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
        |   p -> regexp_full_match(p, '[A-Za-z]+'))) AS BIGINT) AS n_word_pieces,
        | CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
        |   p -> regexp_full_match(p, '[0-9]+'))) AS BIGINT) AS n_digit_pieces,
        | CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS n_distinct_pieces
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "q74_partition_pruned_scan" -> Entry((s, d) => Queries.partitionPrunedScan(s, d), Some(
      s"""WITH m AS (${cooSql("l_quantity")})
         |SELECT mrow, mcol, mval FROM m WHERE mcol = 3 ORDER BY mrow""".stripMargin)),

    // ---- grand total / densify / CSV source family ----------------------
    "q36_grand_total" -> Entry(Queries.grandTotal, Some(
      s"""WITH m AS (${cooSql("l_extendedprice")})
         |SELECT CAST(sum(CAST(mval AS DECIMAL(38,2))) AS DOUBLE) AS grand_total FROM m""".stripMargin)),

    "q37_densify" -> Entry(Queries.densifyMatrix, Some(
      s"""WITH m AS (${cooSql("l_quantity")}),
         |keys AS (SELECT p_partkey AS mrow, mo.mcol FROM part
         |  CROSS JOIN (SELECT unnest(range(1, 13)) AS mcol) mo)
         |SELECT k.mrow, k.mcol, COALESCE(m.mval, 0.0) AS mval
         |FROM keys k LEFT JOIN m ON k.mrow = m.mrow AND k.mcol = m.mcol
         |ORDER BY 1, 2""".stripMargin)),

    "q38_csv_keyword_costs" -> Entry(Queries.csvKeywordCosts, Some(
      s"""SELECT Keyword, TotalCost * 1e-6 AS cost
         |FROM read_csv('${Queries.FixtureDir}/keywords.csv', header=true)
         |WHERE TotalClicks <> 0 ORDER BY Keyword""".stripMargin)),

    "q39_csv_hour_costs" -> Entry(Queries.csvHourCosts, Some(
      s"""SELECT CAST(HourOfDay AS BIGINT) AS HourOfDay, HourlyCost * 1e-6 AS cost
         |FROM read_csv('${Queries.FixtureDir}/hours.csv', header=true)
         |WHERE HourlyClicks <> 0 ORDER BY HourOfDay""".stripMargin)),

    // ---- dedup -----------------------------------------------------------
    "q40_exact_dedup_groups" -> Entry(
      (s, d) => Dedup.exactGroups(docs(s, d)).orderBy("content_hash"), Some(
      """SELECT sha256(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    "q41_dedup_keep_first" -> Entry(
      (s, d) => Dedup.dedupKeepFirst(docs(s, d))
        .select(col("doc_id"), sha2(col("text"), 256).as("content_hash")).orderBy("doc_id"), Some(
      """SELECT doc_id, content_hash FROM
        | (SELECT doc_id, sha256(text) AS content_hash,
        |   row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    "q42_jaccard_pairs" -> Entry(
      (s, d) => Dedup.jaccardPairs(docs(s, d), PairScope.MaxId(40)).orderBy("doc_a", "doc_b"), Some(
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE doc_id < 40)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |       CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6) AS jaccard
        |FROM d a JOIN d b ON a.doc_id < b.doc_id ORDER BY doc_a, doc_b""".stripMargin)),

    "q43_minhash_neardup" -> Entry(
      (s, d) => Dedup.minhashNearDupCached(docs(s, d), d, simThreshold = 0.5)
        .orderBy("doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |   round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin)),

    // Two-sided fuzzy decontamination: probe = the q85 benchmark split
    // (md5 ':probe' prefix < '15', ~8%), corpus = the rest; near-dup pairs
    // at exact Jaccard >= 0.5 via the corpus×probe MinHash band join. The
    // oracle is the exact threshold join — which hash-matches the LSH path
    // only because this corpus has a wide similarity margin (pairs sit at
    // s >= 0.9 or < 0.2, never near 0.5; a boundary pair would carry a
    // ~(0.5)^8 per-pair miss odds — see Dedup.fuzzyContamination's scaladoc
    // for the numHashTables dial if the corpus ever gains such pairs).
    "q95_fuzzy_contamination" -> Entry((s, d) => {
      val dd = docsSpread(s, d)
      val pr = substring(md5(concat(col("doc_id").cast("string"), lit(":probe"))), 1, 2)
      Dedup.fuzzyContamination(dd.filter(pr >= "15"), dd.filter(pr < "15"))
        .orderBy("doc_id", "probe_doc_id")
    }, Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |c AS (SELECT * FROM s WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':probe'), 1, 2) >= '15'),
        |p AS (SELECT * FROM s WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':probe'), 1, 2) < '15'),
        |j AS (SELECT c.doc_id AS doc_id, p.doc_id AS probe_doc_id,
        |   round(CAST(len(list_intersect(c.sh, p.sh)) AS DOUBLE) /
        |         CAST(len(list_distinct(list_concat(c.sh, p.sh))) AS DOUBLE), 6) AS jaccard
        |  FROM c, p)
        |SELECT doc_id, probe_doc_id, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY doc_id, probe_doc_id""".stripMargin)),

    "q44_simhash" -> Entry(
      (s, d) => Dedup.simhash(docs(s, d)).orderBy("doc_id"), None),

    "q49_simhash_neardup" -> Entry(
      (s, d) => Dedup.simhashBandedPairs(docs(s, d), maxHamming = 8)
        .orderBy("doc_a", "doc_b"), None),

    // ---- similarity search ----------------------------------------------
    "q45_cosine_topk" -> Entry(
      (s, d) => Similarity.bruteForceTopK(emb(s, d)).orderBy("query_id", "rank"), Some(
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
        |px AS (SELECT query_id, cand_id, CAST(unnest(qe) AS DOUBLE) AS qv,
        |        CAST(unnest(ce) AS DOUBLE) AS cv
        |       FROM q CROSS JOIN c WHERE query_id <> cand_id),
        |dots AS (SELECT query_id, cand_id, sum(qv * cv) AS dp,
        |          sqrt(sum(qv * qv)) AS nq, sqrt(sum(cv * cv)) AS nc
        |         FROM px GROUP BY 1, 2),
        |scored AS (SELECT query_id, cand_id, round(dp / (nq * nc), 6) AS cosine FROM dots),
        |ranked AS (SELECT query_id, cand_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rank
        | FROM scored)
        |SELECT query_id, rank, cand_id, cosine FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    "q46_ann_lsh" -> Entry(
      (s, d) => Similarity.lshTopK(emb(s, d)).orderBy("query_id", "rank"), None),

    "q62_ann_ivf" -> Entry(
      (s, d) => Similarity.ivfTopK(emb(s, d)).orderBy("query_id", "rank"), None),

    "q47_label_centroids" -> Entry(
      (s, d) => Similarity.labelCentroids(emb(s, d)).orderBy("label", "pos"), Some(
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |  CAST(unnest(embedding) AS DOUBLE) AS v,
        |  unnest(range(0, len(embedding))) AS pos
        | FROM embeddings)
        |SELECT label, CAST(pos AS BIGINT) AS pos, round(avg(v), 6) AS centroid_v
        |FROM e GROUP BY 1, 2 ORDER BY label, pos""".stripMargin)),

    // Deliberate whole-corpus exact pairs (the sf-bounded embeddings table);
    // the scale-path alternatives are q46 (LSH) / q62 (IVF).
    "q48_embedding_neardup" -> Entry(
      (s, d) => Similarity.cosineNearDupPairs(emb(s, d), PairScope.Unbounded,
        threshold = 0.35).orderBy("vec_a", "vec_b"), Some(
      """WITH a AS (SELECT vec_id AS vec_a, embedding AS ea FROM embeddings),
        |b AS (SELECT vec_id AS vec_b, embedding AS eb FROM embeddings),
        |px AS (SELECT vec_a, vec_b, CAST(unnest(ea) AS DOUBLE) AS av, CAST(unnest(eb) AS DOUBLE) AS bv
        |       FROM a CROSS JOIN b WHERE vec_a < vec_b),
        |dots AS (SELECT vec_a, vec_b, sum(av * bv) AS dp,
        |          sqrt(sum(av * av)) AS na, sqrt(sum(bv * bv)) AS nb
        |         FROM px GROUP BY 1, 2)
        |SELECT vec_a, vec_b, round(dp / (na * nb), 6) AS cosine FROM dots
        |WHERE round(dp / (na * nb), 6) > 0.35 ORDER BY vec_a, vec_b""".stripMargin)),

    // ---- events / streaming ---------------------------------------------
    "q50_tumbling_window" -> Entry(Events.tumblingCounts, Some(
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws_epoch, event_type,
        | count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY ws_epoch, event_type""".stripMargin)),

    "q51_sliding_window" -> Entry(Events.slidingCounts, Some(
      """WITH b AS (SELECT event_type, (epoch_ms(ts) // 1000 // 1800) * 1800 AS b0 FROM events),
        |w AS (SELECT event_type, unnest([b0, b0 - 1800]) AS ws_epoch FROM b)
        |SELECT ws_epoch, event_type, count(*) AS n FROM w
        |GROUP BY 1, 2 ORDER BY ws_epoch, event_type""".stripMargin)),

    "q52_streaming_tumbling" -> Entry(Events.streamingTumblingCounts, Some(
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ws_epoch, event_type,
        | count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY ws_epoch, event_type""".stripMargin)),

    "q53_sessionize" -> Entry((s, d) => Events.sessionize(s, d)
      .orderBy("user_id", "session_seq"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |l AS (SELECT user_id, ts_ms, event_id,
        |  lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e),
        |f AS (SELECT user_id, ts_ms, event_id,
        |  CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 300000 THEN 1 ELSE 0 END AS new_session FROM l),
        |g AS (SELECT user_id, ts_ms,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS BIGINT) AS session_seq
        | FROM f)
        |SELECT user_id, session_seq, min(ts_ms) AS session_start_ms,
        | max(ts_ms) - min(ts_ms) AS duration_ms, count(*) AS n_events
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin)),

    "q54_streaming_sessionize" -> Entry((s, d) => Events.streamingSessions(s, d)
      .orderBy("user_id", "session_seq"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |l AS (SELECT user_id, ts_ms, event_id,
        |  lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e),
        |f AS (SELECT user_id, ts_ms, event_id,
        |  CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 300000 THEN 1 ELSE 0 END AS new_session FROM l),
        |g AS (SELECT user_id, ts_ms,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS BIGINT) AS session_seq
        | FROM f)
        |SELECT user_id, session_seq, min(ts_ms) AS session_start_ms,
        | max(ts_ms) - min(ts_ms) AS duration_ms, count(*) AS n_events
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin)),

    "q55_json_props" -> Entry((s, d) => Events.propsExtract(s, d).orderBy("event_id"), Some(
      "SELECT event_id, CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS k_val " +
        "FROM events ORDER BY event_id")),

    "q59_asof_join" -> Entry((s, d) => Events.asofJoin(s, d).orderBy("event_id"), Some(
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts_ms AS event_ts_ms,
        |  COALESCE(v.ts_ms, -1) AS asof_view_ts_ms,
        |  COALESCE(p.ts_ms - v.ts_ms, -1) AS lag_ms
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts_ms >= v.ts_ms
        |ORDER BY p.event_id""".stripMargin)),

    "q58_stateful_user_stats" -> Entry((s, d) => Events.streamingUserStats(s, d)
      .orderBy("user_id"), Some(
      """SELECT user_id, count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Spark-4 transformWithState twin of q58: composite keyed state
    // (ValueState scalar triple + MapState per-type counts) on the
    // RocksDB store; exact distinct-type counts come straight from the
    // MapState key set. Settled == batch GROUP BY oracle.
    "q257_tws_user_stats" -> Entry((s, d) => Events.twsUserTypeStats(s, d)
      .orderBy("user_id"), Some(
      """SELECT user_id, count(*) AS n_events,
        | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Event-time-TIMER sessionization on transformWithState: per-user gap
    // sessions closed by registered timers when the watermark passes
    // (handleExpiredTimer — the API surface q257 doesn't touch), settled
    // == the q53 batch sessionize oracle.
    "q264_tws_timer_sessions" -> Entry((s, d) =>
      Events.twsTimerSessions(s, d).orderBy("user_id", "session_seq"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |l AS (SELECT user_id, ts_ms, event_id,
        |  lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e),
        |f AS (SELECT user_id, ts_ms, event_id,
        |  CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 300000 THEN 1 ELSE 0 END AS new_session FROM l),
        |g AS (SELECT user_id, ts_ms,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS BIGINT) AS session_seq
        | FROM f)
        |SELECT user_id, session_seq, min(ts_ms) AS session_start_ms,
        | max(ts_ms) - min(ts_ms) AS duration_ms, count(*) AS n_events
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin)),

    // CDC changelog compaction: latest-wins upsert view with tombstones
    // ('error' = DELETE), as one map-side-combinable argmax-struct agg.
    // The oracle spells the same semantics as a window rank — hash
    // equality certifies the rewrite. q211 is the SAME view maintained
    // live by keyed streaming state, certified against the SAME oracle.
    "q207_cdc_compact" -> Entry((s, d) =>
      Events.cdcCompact(s, d).orderBy("user_id"), Some(cdcCompactSql)),

    "q211_streaming_cdc" -> Entry((s, d) =>
      Events.streamingCdcCompact(s, d).orderBy("user_id"), Some(cdcCompactSql)),

    // foreachBatch idempotent egress: the changelog streamed through a
    // per-batch latest-wins MERGE (q207 argmax algebra) into a versioned
    // parquet target with an atomically-renamed commit pointer; the last
    // batch is deliberately REPLAYED under its own batchId (at-least-once
    // retry) before the read-back — hash equality with the same q207
    // oracle certifies delivery + merge algebra + replay idempotence.
    "q268_foreachbatch_merge" -> Entry((s, d) =>
      Events.foreachBatchUpsert(s, d).orderBy("user_id"), Some(cdcCompactSql)),

    "q56_csv_padded_matrix" -> Entry(Queries.csvPaddedMatrix, Some(paddedMatrixSql)),

    "q57_csv_labeled_roundtrip" -> Entry(Queries.csvLabeledRoundtrip, Some(paddedMatrixSql)),

    // ---- ML: ALS ---------------------------------------------------------
    // Both ALS entries draw on ONE shared training (trainedOn's per-(JVM,
    // dir, seed) cache): q60's CONTRACT is recommendations-from-the-0.8-
    // train-split — training twice bought nothing but wall-clock. AlsSpec
    // asserts the train split covers every rated user, so no user silently
    // drops out of q60 relative to full-data training.
    "q60_als_recommend" -> Entry((s, d) =>
      AlsRecommender.recommendTopKOn(s, d).orderBy("user", "rank"), None),

    // Model-based quality filter (rows-only like ALS: L-BFGS outputs are
    // iterative-float; the held-out AUC envelope is QualityClassifierSpec).
    "q186_quality_classifier" -> Entry((s, d) =>
      graft.ml.QualityClassifier.scoreDocs(s, d).orderBy("doc_id"), None),

    // PCA reduction of the embedding space (rows-only: eigensolver floats;
    // algebraic contracts pinned in EmbeddingPcaSpec). Flat one-row-per-
    // component layout — the harness canonicalizes rows-only output by
    // sorting every column, which an array<double> column breaks.
    "q190_embedding_pca" -> Entry((s, d) =>
      graft.ml.EmbeddingPca.projectFlat(s, d).orderBy("vec_id", "component"), None),

    // ANN over the PCA-compacted space — q190's consumer: project to k=8,
    // IVF-index the reduced vectors, probe (rows-only: eigensolver +
    // k-means floats; reduced-space recall envelope in EmbeddingPcaSpec).
    "q191_pca_ann" -> Entry((s, d) =>
      graft.ml.EmbeddingPca.pcaIvfTopK(s, d).orderBy("query_id", "rank"), None),

    // Quality-stack capstone: model score -> threshold -> near-dup dedup ->
    // sequence pack, one lazy plan downstream of the cached model artifacts
    // (rows-only: inherits q186's iterative-float scores; the stage-
    // composition contract is pinned in Round13OpsSpec).
    "q192_quality_pipeline" -> Entry((s, d) =>
      graft.llmdata.Curation.qualityCurationPipeline(s, d)
        .orderBy("source", "doc_id"), None),

    // Johnson-Lindenstrauss signed random projection: the deterministic,
    // hash-certified dim reduction next to rows-only PCA — md5-parity ±1
    // signs, decimal-exact sums, /4.0 the only float op (k=16).
    "q194_jl_projection" -> Entry((s, d) =>
      Similarity.jlProject(emb(s, d)).orderBy("vec_id", "component"), Some(
      """WITH px AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |        unnest(range(0, len(embedding))) AS pos FROM embeddings),
        |sgn AS (SELECT pos, j AS component,
        |  CASE WHEN (strpos('0123456789abcdef',
        |       substr(md5('jl:' || CAST(pos AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
        |   THEN 1 ELSE -1 END AS sign
        | FROM (SELECT DISTINCT pos FROM px) CROSS JOIN (SELECT unnest(range(16)) AS j))
        |SELECT px.vec_id, CAST(sgn.component AS BIGINT) AS component,
        | CAST(sum(CAST(round(px.v, 6) AS DECIMAL(12,6)) * sgn.sign) AS DOUBLE) / 4.0 AS value
        |FROM px JOIN sgn USING (pos)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // JSONL sink + source round-trip: write documents as line-delimited
    // JSON, read back with the explicit schema, hash-compare against the
    // parquet original (the q57 CSV round-trip pattern, on the format LLM
    // corpora actually interchange).
    "q195_jsonl_roundtrip" -> Entry((s, d) =>
      graft.io.Formats.jsonlRoundtrip(s, d).orderBy("doc_id"), Some(
      """SELECT doc_id, source, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ORC sink + source round-trip: the other columnar lake format.
    "q196_orc_roundtrip" -> Entry((s, d) =>
      graft.io.Formats.orcRoundtrip(s, d).orderBy("doc_id"), Some(
      """SELECT doc_id, source, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Incremental stats by partial-merge: per-source token/type counts
    // rolled up from per-ingest-batch partials (the backfill re-merge
    // path); the direct-computation oracle certifies the decomposition.
    "q205_incremental_stats" -> Entry((s, d) =>
      TextAnalysis.incrementalSourceStats(docs(s, d)).orderBy("source"), Some(
      """SELECT source, count(*) AS n_tokens, count(DISTINCT term) AS n_types
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin)),

    // Raw text-line sink + source round-trip: doc_id \t text lines,
    // re-parsed into typed columns (the crawl-line ingestion step).
    "q204_text_roundtrip" -> Entry((s, d) =>
      graft.io.Formats.textRoundtrip(s, d).orderBy("doc_id"), Some(
      """SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id""")),

    // Trust-ranked exact dedup: keeper = most-trusted source's copy
    // (source index DESC, doc_id tiebreak), not first arrival — the
    // provenance-priority rule; argmin struct agg, no window funnel.
    "q197_trusted_dedup" -> Entry((s, d) =>
      Dedup.dedupKeepTrusted(docs(s, d))
        .select(col("doc_id"), col("source"),
          sha2(col("text"), 256).as("content_hash")).orderBy("doc_id"), Some(
      """SELECT doc_id, source, content_hash FROM
        | (SELECT doc_id, source, sha256(text) AS content_hash,
        |   row_number() OVER (PARTITION BY sha256(text)
        |     ORDER BY -CAST(substr(source, 4) AS BIGINT), doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // Cascading-delete impact (right-to-be-forgotten dry run): tombstoned
    // customers -> their orders -> those orders' lineitems, one semi-join
    // per FK hop; per-table rows-lost report, hash-certified.
    "q214_cascade_delete" -> Entry((s, d) =>
      graft.relational.FkAudit.cascadeDeleteImpact(s, d).orderBy("table_name"), Some(
      """WITH tc AS (SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0),
        |oo AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM tc)),
        |ll AS (SELECT 1 AS x FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM oo))
        |SELECT 'customer' AS table_name, count(*) AS n_rows_deleted FROM tc
        |UNION ALL SELECT 'lineitem', count(*) FROM ll
        |UNION ALL SELECT 'orders', count(*) FROM oo
        |ORDER BY table_name""".stripMargin)),

    // Referential-integrity audit: per-FK-edge child/orphan counts over
    // the whole warehouse graph — the ingest data-quality gate (orphans
    // silently drop rows from every inner join downstream).
    "q213_fk_audit" -> Entry((s, d) =>
      graft.relational.FkAudit.audit(s, d).orderBy("relationship"), Some(
      """SELECT 'customer.c_nationkey->nation' AS relationship, count(*) AS n_child_rows,
        | CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        | FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |UNION ALL
        |SELECT 'lineitem.l_orderkey->orders', count(*),
        | CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part', count(*),
        | CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier', count(*),
        | CAST(sum(CASE WHEN su.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem l LEFT JOIN supplier su ON l.l_suppkey = su.s_suppkey
        |UNION ALL
        |SELECT 'nation.n_regionkey->region', count(*),
        | CAST(sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', count(*),
        | CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'supplier.s_nationkey->nation', count(*),
        | CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM supplier su LEFT JOIN nation n ON su.s_nationkey = n.n_nationkey
        |ORDER BY relationship""".stripMargin)),

    // Deterministic stride-scheduling interleave: the training-data
    // ordering operator — sched_pos = (rank_within_source − 0.5)/n_src;
    // reading by ascending position interleaves sources proportionally
    // (±1 fairness, pinned in CurationSpec). No RNG, hash-certifiable.
    "q212_interleave_schedule" -> Entry((s, d) =>
      Curation.interleaveSchedule(docs(s, d)).orderBy("doc_id"), Some(
      """WITH ranked AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r FROM documents),
        |c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1)
        |SELECT doc_id, source, round((r - 0.5) / n_src, 9) AS sched_pos
        |FROM ranked JOIN c USING (source) ORDER BY doc_id""".stripMargin)),

    // Z-order layout statistics: Morton-interleave (l_partkey, l_suppkey),
    // fixed z-range buckets, per-bucket min/max extents — the multi-dim
    // clustering stats a file-skipping reader prunes on. The oracle runs
    // the IDENTICAL magic-number bit spread in DuckDB.
    "q210_zorder_layout" -> Entry((s, d) =>
      graft.io.ZOrder.layoutStats(s, d).orderBy("z_bucket"), Some(
      """WITH d AS (SELECT l_partkey AS x, l_suppkey AS y FROM lineitem),
        |e AS (SELECT max(x) AS xmax, max(y) AS ymax FROM d),
        |b0 AS (SELECT x, y, (x * 16) // (xmax + 1) AS xs, (y * 16) // (ymax + 1) AS ys
        |  FROM d CROSS JOIN e),
        |b1 AS (SELECT x, y, (xs | (xs << 8)) & 16711935 AS xs, (ys | (ys << 8)) & 16711935 AS ys FROM b0),
        |b2 AS (SELECT x, y, (xs | (xs << 4)) & 252645135 AS xs, (ys | (ys << 4)) & 252645135 AS ys FROM b1),
        |b3 AS (SELECT x, y, (xs | (xs << 2)) & 858993459 AS xs, (ys | (ys << 2)) & 858993459 AS ys FROM b2),
        |b4 AS (SELECT x, y, (xs | (xs << 1)) & 1431655765 AS xs, (ys | (ys << 1)) & 1431655765 AS ys FROM b3),
        |z AS (SELECT x, y, xs | (ys << 1) AS zval FROM b4)
        |SELECT CAST(zval // 4 AS BIGINT) AS z_bucket, count(*) AS n_rows,
        | min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Heavy hitters: Misra–Gries mergeable sketch (bounded k-1 counters,
    // map-side combinable) generates candidates; exact verification
    // restores determinism — the sketch never drops a true >N/k term, so
    // the verified set EQUALS the all-exact computation the oracle runs.
    "q209_heavy_hitters" -> Entry((s, d) =>
      TextAnalysis.heavyHitters(docs(s, d), k = 32).orderBy("term"), Some(
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tc AS (SELECT term, count(*) AS n_occurrences FROM tok GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM tok)
        |SELECT term, n_occurrences FROM tc CROSS JOIN tot
        |WHERE n_occurrences * 32 > n_total ORDER BY term""".stripMargin)),

    // Edit-distance verification tier over the verified LSH pairs:
    // Levenshtein on 256-char prefixes + normalized edit similarity — the
    // ORDER-sensitive second opinion shingle-set Jaccard cannot give
    // (a shuffled bag of the same 3-grams scores Jaccard 1.0). O(L²) cost
    // confined to the tiny verified pair frame; both engines run the
    // identical unit-cost DP, so the report is hash-certified.
    "q215_editdist_verify" -> Entry((s, d) =>
      Dedup.editDistanceAuditOn(s, d).orderBy("doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |pre AS (SELECT doc_id, substr(text, 1, 256) AS prefix FROM documents)
        |SELECT p.doc_a, p.doc_b, p.jaccard,
        | CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS lev_prefix,
        | round(1.0 - CAST(levenshtein(a.prefix, b.prefix) AS DOUBLE) /
        |   CAST(greatest(len(a.prefix), len(b.prefix)) AS DOUBLE), 6) AS edit_sim
        |FROM pairs p JOIN pre a ON a.doc_id = p.doc_a JOIN pre b ON b.doc_id = p.doc_b
        |ORDER BY p.doc_a, p.doc_b""".stripMargin)),

    // Declarative constraint-validation gate (dbt-test/Deequ shape): the
    // fixed rule set in ONE scan — each rule is a conditional count inside
    // a single hash agg, the 1-row result unpivots locally. Null rows
    // count as violations by construction (CASE lands them in ELSE).
    "q216_constraint_gate" -> Entry((s, d) =>
      graft.relational.Validate.documentConstraints(docs(s, d)).orderBy("rule"), Some(
      """WITH a AS (SELECT count(*) AS n_rows,
        |  sum(CASE WHEN doc_id IS NOT NULL THEN 0 ELSE 1 END) AS v_notnull,
        |  count(doc_id) - count(DISTINCT doc_id) AS v_unique,
        |  sum(CASE WHEN length(text) > 0 THEN 0 ELSE 1 END) AS v_nonempty,
        |  sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END) AS v_lenmatch,
        |  sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 0 ELSE 1 END) AS v_lang,
        |  sum(CASE WHEN regexp_matches(source, '^src[0-9]+$') THEN 0 ELSE 1 END) AS v_source
        | FROM documents)
        |SELECT rule, n_rows AS n_checked, CAST(n_violations AS BIGINT) AS n_violations,
        | n_violations = 0 AS passed
        |FROM (
        |  SELECT 'doc_id_not_null' AS rule, n_rows, v_notnull AS n_violations FROM a
        |  UNION ALL SELECT 'doc_id_unique', n_rows, v_unique FROM a
        |  UNION ALL SELECT 'text_not_empty', n_rows, v_nonempty FROM a
        |  UNION ALL SELECT 'n_chars_matches_text', n_rows, v_lenmatch FROM a
        |  UNION ALL SELECT 'lang_accepted', n_rows, v_lang FROM a
        |  UNION ALL SELECT 'source_accepted', n_rows, v_source FROM a)
        |ORDER BY rule""".stripMargin)),

    // Component-aware k-fold assignment: fold = md5(component) mod k, so
    // near-duplicates can never straddle a fold boundary (leakage-free by
    // construction, not by post-hoc audit). Shares the cached LSH label
    // frame with q99/q101/q140; oracle re-walks the recursive closure.
    "q217_group_folds" -> Entry((s, d) =>
      Curation.groupAwareFolds(s, d).orderBy("doc_id"), Some(
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM s a JOIN s b
        |  ON a.doc_id <> b.doc_id
        |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.5),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON reach.node = e.src),
        |comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node)
        |SELECT doc_id, component,
        | CAST(list_reduce(list_prepend('0',
        |    string_split(substr(md5(CAST(component AS VARCHAR) || ':fold'), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) % 5 AS fold
        |FROM comp ORDER BY doc_id""".stripMargin)),

    // Corpus snapshot diff: per-key added/removed/changed/unchanged from
    // ONE full-outer join of md5 digests (computed before the join, so
    // the shuffle never carries document bodies). Versions are two
    // deterministic releases both engines derive from the fixture.
    "q218_snapshot_diff" -> Entry((s, d) =>
      Curation.corpusSnapshotDiff(docs(s, d)).orderBy("doc_id"), Some(
      """WITH o AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 7 = 0 THEN 'OLD ' || text ELSE text END) AS old_md5
        | FROM documents WHERE doc_id % 5 <> 0),
        |n AS (SELECT doc_id, md5(text) AS new_md5 FROM documents WHERE doc_id % 3 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        | CASE WHEN o.doc_id IS NULL THEN 'added'
        |      WHEN n.doc_id IS NULL THEN 'removed'
        |      WHEN old_md5 = new_md5 THEN 'unchanged' ELSE 'changed' END AS status,
        | old_md5, new_md5
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin)),

    // PSI drift between the even/odd cohort halves, per source: both
    // cohort histograms from ONE conditional-count hash agg (missing bins
    // zero-fill for free), +0.5 smoothing, DECIMAL(30,18)-quantized
    // contributions (the q100 KL rule).
    "q219_psi_drift" -> Entry((s, d) =>
      TextAnalysis.psiBySource(docs(s, d)).orderBy("source"), Some(
      """WITH b AS (SELECT source, n_chars // 100 AS bin, doc_id % 2 = 0 AS is_ref
        | FROM documents),
        |pb AS (SELECT source, bin,
        |  sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
        |  sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
        | FROM b GROUP BY 1, 2),
        |ps AS (SELECT source, sum(cr) AS nr, sum(cc) AS nc, count(*) AS n_bins
        | FROM pb GROUP BY 1),
        |t AS (SELECT pb.source, ps.n_bins,
        |  CAST(((CAST(cc AS DOUBLE) + 0.5) / (CAST(nc AS DOUBLE) + 0.5 * n_bins) -
        |        (CAST(cr AS DOUBLE) + 0.5) / (CAST(nr AS DOUBLE) + 0.5 * n_bins)) *
        |    ln(((CAST(cc AS DOUBLE) + 0.5) / (CAST(nc AS DOUBLE) + 0.5 * n_bins)) /
        |       ((CAST(cr AS DOUBLE) + 0.5) / (CAST(nr AS DOUBLE) + 0.5 * n_bins)))
        |   AS DECIMAL(30,18)) AS contrib
        | FROM pb JOIN ps USING (source))
        |SELECT source, CAST(n_bins AS BIGINT) AS n_bins,
        | round(CAST(sum(contrib) AS DOUBLE), 6) AS psi
        |FROM t GROUP BY 1, 2 ORDER BY source""".stripMargin)),

    // Count-min sketch + exact verification: depth md5 rows x width
    // buckets of summed counts; point estimate = min over depth counters
    // (one-sided error — can only over-estimate). Built from the tf agg,
    // never the raw token stream; report joins back to exact counts for
    // the q209 heavy set.
    "q220_count_min" -> Entry((s, d) =>
      TextAnalysis.countMinEstimates(docs(s, d)).orderBy("term"), Some(
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
        |hx AS (SELECT term, n, r,
        |  CAST(list_reduce(list_prepend('0',
        |    string_split(substr(md5(CAST(r AS VARCHAR) || ':cms:' || term), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) % 64 AS bucket
        | FROM tf CROSS JOIN (SELECT unnest(range(4)) AS r) rr),
        |counters AS (SELECT r, bucket, CAST(sum(n) AS BIGINT) AS c FROM hx GROUP BY 1, 2),
        |tot AS (SELECT sum(n) AS n_total FROM tf),
        |heavy AS (SELECT term, n AS exact_count FROM tf CROSS JOIN tot WHERE n * 32 > n_total),
        |est AS (SELECT h.term, h.exact_count, min(c.c) AS cms_estimate
        | FROM heavy h JOIN hx ON hx.term = h.term
        | JOIN counters c ON c.r = hx.r AND c.bucket = hx.bucket
        | GROUP BY 1, 2)
        |SELECT term, exact_count, cms_estimate, cms_estimate - exact_count AS overcount
        |FROM est ORDER BY term""".stripMargin)),

    // Join-key skew diagnostics: per candidate key, total/distinct/max
    // rows, the hottest key (argmax struct, deterministic largest-key
    // tiebreak), and max/avg skew ratio — the pre-shuffle report a
    // salting decision reads. One hash agg + 1-row rollup per key.
    "q221_key_skew" -> Entry((s, d) =>
      graft.relational.Profile.keySkew(Tables(s, d, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey")).orderBy("key_col"), Some(
      """SELECT 'l_orderkey' AS key_col, CAST(n_rows AS BIGINT) AS n_rows, n_keys,
        | mx AS max_rows_per_key, hk AS hottest_key,
        | round(CAST(mx AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS skew_ratio
        |FROM (SELECT sum(n) AS n_rows, count(*) AS n_keys, max(n) AS mx FROM
        |   (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1))
        | CROSS JOIN (SELECT k AS hk FROM
        |   (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1)
        |  ORDER BY n DESC, k DESC LIMIT 1)
        |UNION ALL
        |SELECT 'l_partkey', CAST(n_rows AS BIGINT), n_keys, mx, hk,
        | round(CAST(mx AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |FROM (SELECT sum(n) AS n_rows, count(*) AS n_keys, max(n) AS mx FROM
        |   (SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1))
        | CROSS JOIN (SELECT k AS hk FROM
        |   (SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1)
        |  ORDER BY n DESC, k DESC LIMIT 1)
        |UNION ALL
        |SELECT 'l_suppkey', CAST(n_rows AS BIGINT), n_keys, mx, hk,
        | round(CAST(mx AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |FROM (SELECT sum(n) AS n_rows, count(*) AS n_keys, max(n) AS mx FROM
        |   (SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1))
        | CROSS JOIN (SELECT k AS hk FROM
        |   (SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1)
        |  ORDER BY n DESC, k DESC LIMIT 1)
        |ORDER BY key_col""".stripMargin)),

    // SCD Type-2 dimension build: per-user event-type change history as
    // [valid_from, valid_to) validity intervals — consecutive duplicates
    // collapse, NULL valid_to marks the current row. Two windows over one
    // user partitioning; interval tiling pinned in StreamingSpec.
    "q222_scd2_intervals" -> Entry((s, d) =>
      Events.scd2Intervals(s, d).orderBy("user_id", "valid_from_ms", "state"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
        |l AS (SELECT user_id, ts_ms, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_type FROM e),
        |c AS (SELECT user_id, ts_ms, event_id, event_type FROM l
        | WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
        | lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS valid_to_ms,
        | lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL AS is_current
        |FROM c ORDER BY user_id, valid_from_ms, state""".stripMargin)),

    // Point-in-time-correct dimension join: each purchase fact enriched
    // with the SCD2 state (signup/error change stream) valid AT the
    // fact's own event time — the anti-leakage feature-join discipline.
    // Intervals partition each user's timeline, so the containment join
    // matches at most one row: the join IS the lookup.
    "q223_pit_join" -> Entry((s, d) =>
      Events.pitStateJoin(s, d).orderBy("event_id"), Some(pitJoinSql)),

    // The q223 point-in-time join run as a STREAM: purchase facts arrive
    // live and enrich against a STATIC broadcast SCD2 dimension with the
    // interval-containment residual — a stateless stream-static non-equi
    // join (no watermark, no state store). Settled == the q223 batch
    // oracle; the stream never shuffles for the join.
    "q283_streaming_pit" -> Entry((s, d) =>
      Events.streamingPitEnrich(s, d).orderBy("event_id"), Some(pitJoinSql)),


    // Perceptual average-hash over the real PPM codec: 8x8 integer-exact
    // gray-mass grid, cross-multiplied cell-vs-global mean threshold ->
    // 64-bit hash; the oracle re-derives EVERY bit from the text->PPM
    // construction in SQL (channel-phase slips and band-rounding errors
    // flip bits and fail the compare).
    "q224_ahash" -> Entry((s, d) =>
      Multimodal.aHashTable(docs(s, d)).orderBy("doc_id"), Some(
      """WITH p AS (SELECT doc_id,
        |  greatest(1, CAST(ceil(octet_length(encode(text)) / 24.0) AS BIGINT)) AS h,
        |  octet_length(encode(text)) AS nb, text FROM documents),
        |pad AS (SELECT doc_id, h, text || repeat(' ', CAST(h * 24 - nb AS INT)) AS t FROM p),
        |px0 AS (SELECT doc_id, h, t, unnest(range(0, CAST(h * 8 AS BIGINT))) AS i FROM pad),
        |px AS (SELECT doc_id, h, i,
        |  ascii(substr(t, CAST(3*i + 1 AS INT), 1)) + ascii(substr(t, CAST(3*i + 2 AS INT), 1)) +
        |  ascii(substr(t, CAST(3*i + 3 AS INT), 1)) AS g FROM px0),
        |cell AS (SELECT doc_id, (i // 8) * 8 // h AS b, i % 8 AS c,
        |  CAST(sum(g) AS BIGINT) AS cs, count(*) AS nc FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS ts, count(*) AS nt FROM px GROUP BY 1),
        |grid AS (SELECT d.doc_id, gb.b, gc.c FROM (SELECT doc_id FROM documents) d
        |  CROSS JOIN (SELECT unnest(range(8)) AS b) gb
        |  CROSS JOIN (SELECT unnest(range(8)) AS c) gc),
        |bits AS (SELECT g.doc_id, g.b, g.c,
        |  CASE WHEN cell.nc IS NULL THEN '0'
        |       WHEN cell.cs * tot.nt >= tot.ts * cell.nc THEN '1' ELSE '0' END AS bit
        | FROM grid g JOIN tot ON tot.doc_id = g.doc_id
        | LEFT JOIN cell ON cell.doc_id = g.doc_id AND cell.b = g.b AND cell.c = g.c)
        |SELECT doc_id, string_agg(bit, '' ORDER BY b, c) AS ahash
        |FROM bits GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Banded perceptual near-dup pairs: Hamming <= 3 via 4x16-bit band
    // equi-joins (pigeonhole: within-radius pairs agree on >=1 band —
    // perfect recall), XOR+bit_count verify. Oracle = the ALL-PAIRS
    // computation, so hash equality certifies the banding lost nothing.
    "q225_ahash_neardup" -> Entry((s, d) =>
      Multimodal.aHashNearDupPairs(docs(s, d)).orderBy("doc_a", "doc_b"), Some(
      """WITH p AS (SELECT doc_id,
        |  greatest(1, CAST(ceil(octet_length(encode(text)) / 24.0) AS BIGINT)) AS h,
        |  octet_length(encode(text)) AS nb, text FROM documents),
        |pad AS (SELECT doc_id, h, text || repeat(' ', CAST(h * 24 - nb AS INT)) AS t FROM p),
        |px0 AS (SELECT doc_id, h, t, unnest(range(0, CAST(h * 8 AS BIGINT))) AS i FROM pad),
        |px AS (SELECT doc_id, h, i,
        |  ascii(substr(t, CAST(3*i + 1 AS INT), 1)) + ascii(substr(t, CAST(3*i + 2 AS INT), 1)) +
        |  ascii(substr(t, CAST(3*i + 3 AS INT), 1)) AS g FROM px0),
        |cell AS (SELECT doc_id, (i // 8) * 8 // h AS b, i % 8 AS c,
        |  CAST(sum(g) AS BIGINT) AS cs, count(*) AS nc FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS ts, count(*) AS nt FROM px GROUP BY 1),
        |grid AS (SELECT d.doc_id, gb.b, gc.c FROM (SELECT doc_id FROM documents) d
        |  CROSS JOIN (SELECT unnest(range(8)) AS b) gb
        |  CROSS JOIN (SELECT unnest(range(8)) AS c) gc),
        |bits AS (SELECT g.doc_id, g.b, g.c,
        |  CASE WHEN cell.nc IS NULL THEN '0'
        |       WHEN cell.cs * tot.nt >= tot.ts * cell.nc THEN '1' ELSE '0' END AS bit
        | FROM grid g JOIN tot ON tot.doc_id = g.doc_id
        | LEFT JOIN cell ON cell.doc_id = g.doc_id AND cell.b = g.b AND cell.c = g.c),
        |ah AS (SELECT doc_id, string_agg(bit, '' ORDER BY b, c) AS ahash
        | FROM bits GROUP BY 1),
        |pr AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.ahash AS ha, y.ahash AS hb
        |  FROM ah x JOIN ah y ON x.doc_id < y.doc_id),
        |hv AS (SELECT doc_a, doc_b,
        |  len(list_filter(range(64),
        |    i -> substr(ha, CAST(i + 1 AS INT), 1) <> substr(hb, CAST(i + 1 AS INT), 1))) AS hamming
        | FROM pr)
        |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        |FROM hv WHERE hamming <= 3 ORDER BY 1, 2""".stripMargin)),

    // First/last-touch attribution: per purchase, the earliest and latest
    // view/click by the same user inside a 7d lookback — one range-bounded
    // per-user join, BOTH endpoints + count from a single argmin/argmax
    // struct agg; no-touch purchases survive the left join with 0/null.
    "q226_attribution" -> Entry((s, d) =>
      Events.touchAttribution(s, d).orderBy("event_id"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
        |t AS (SELECT user_id, event_id AS touch_id, event_type AS touch_type, ts_ms AS touch_ms
        | FROM e WHERE event_type IN ('view', 'click')),
        |p AS (SELECT event_id, user_id, ts_ms FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts_ms,
        | count(t.touch_id) AS n_touches,
        | arg_min(t.touch_id, t.touch_ms * 1000000 + t.touch_id) AS first_touch_id,
        | arg_min(t.touch_type, t.touch_ms * 1000000 + t.touch_id) AS first_touch_type,
        | arg_max(t.touch_id, t.touch_ms * 1000000 + t.touch_id) AS last_touch_id,
        | arg_max(t.touch_type, t.touch_ms * 1000000 + t.touch_id) AS last_touch_type
        |FROM p LEFT JOIN t ON t.user_id = p.user_id
        |  AND t.touch_ms <= p.ts_ms AND t.touch_ms >= p.ts_ms - 604800000
        |GROUP BY 1, 2, 3 ORDER BY p.event_id""".stripMargin)),

    // Daily date-spine densification: per-day totals with MISSING days
    // zero-filled (a day with no rows is invisible to a plain groupBy and
    // breaks moving averages); tiny generated spine broadcasts into the
    // left join against the one per-day hash agg.
    "q227_date_spine" -> Entry((s, d) =>
      Events.dailySpine(s, d).orderBy("day"), Some(
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |c AS (SELECT day, count(*) AS n_events, count(DISTINCT user_id) AS n_users
        | FROM e GROUP BY 1),
        |mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM mm)
        |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
        | coalesce(c.n_events, 0) AS n_events, coalesce(c.n_users, 0) AS n_users
        |FROM spine LEFT JOIN c ON c.day = spine.day
        |ORDER BY day""".stripMargin)),

    // Order-independent table checksum (anti-entropy fingerprint): per
    // source, row count + XOR and exact DECIMAL(38,0) SUM of a per-row
    // md5-derived 60-bit hash — two commutative map-side-combinable
    // reductions; one scan fingerprints the table, either reduction
    // differing pinpoints the divergent group.
    "q228_table_checksum" -> Entry((s, d) =>
      graft.relational.Profile.tableChecksum(docs(s, d), "source",
        Seq("doc_id", "text", "lang", "n_chars")).orderBy("source"), Some(
      """WITH h AS (SELECT source,
        |  CAST(list_reduce(list_prepend('0',
        |    string_split(substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31) ||
        |      lang || chr(31) || CAST(n_chars AS VARCHAR)), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS rh
        | FROM documents)
        |SELECT source, count(*) AS n_rows,
        | bit_xor(rh) AS checksum_xor,
        | CAST(CAST(sum(CAST(rh AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS checksum_sum
        |FROM h GROUP BY 1 ORDER BY source""".stripMargin)),

    // Z-order pruning dry run: scan/skip decision per bucket = extent-box
    // vs predicate-box intersection (the exact file-stats test a reader
    // performs); rows scanned vs matching quantifies the false-positive
    // I/O the layout failed to prune.
    "q229_zorder_pruning" -> Entry((s, d) =>
      graft.io.ZOrder.pruningStats(s, d), Some(
      """WITH d AS (SELECT l_partkey AS x, l_suppkey AS y FROM lineitem),
        |e AS (SELECT max(x) AS xmax, max(y) AS ymax FROM d),
        |box AS (SELECT (xmax + 1) * 2 // 16 AS x_lo, (xmax + 1) * 5 // 16 AS x_hi,
        |  (ymax + 1) * 2 // 16 AS y_lo, (ymax + 1) * 5 // 16 AS y_hi FROM e),
        |b0 AS (SELECT x, y, (x * 16) // (xmax + 1) AS xs, (y * 16) // (ymax + 1) AS ys
        |  FROM d CROSS JOIN e),
        |b1 AS (SELECT x, y, (xs | (xs << 8)) & 16711935 AS xs, (ys | (ys << 8)) & 16711935 AS ys FROM b0),
        |b2 AS (SELECT x, y, (xs | (xs << 4)) & 252645135 AS xs, (ys | (ys << 4)) & 252645135 AS ys FROM b1),
        |b3 AS (SELECT x, y, (xs | (xs << 2)) & 858993459 AS xs, (ys | (ys << 2)) & 858993459 AS ys FROM b2),
        |b4 AS (SELECT x, y, (xs | (xs << 1)) & 1431655765 AS xs, (ys | (ys << 1)) & 1431655765 AS ys FROM b3),
        |z AS (SELECT x, y, xs | (ys << 1) AS zval FROM b4),
        |st AS (SELECT zval // 4 AS z_bucket, count(*) AS n_rows,
        |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
        | FROM z GROUP BY 1),
        |sc AS (SELECT count(*) AS n_buckets,
        |  CAST(sum(CASE WHEN x_min <= x_hi AND x_max >= x_lo AND y_min <= y_hi AND y_max >= y_lo
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_scanned,
        |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |  CAST(sum(CASE WHEN x_min <= x_hi AND x_max >= x_lo AND y_min <= y_hi AND y_max >= y_lo
        |       THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
        | FROM st CROSS JOIN box),
        |m AS (SELECT count(*) AS rows_matching FROM d CROSS JOIN box
        | WHERE x BETWEEN x_lo AND x_hi AND y BETWEEN y_lo AND y_hi)
        |SELECT n_buckets, n_buckets_scanned, rows_total, rows_scanned, rows_matching,
        | round(1.0 - CAST(rows_scanned AS DOUBLE) / CAST(rows_total AS DOUBLE), 6) AS skip_ratio
        |FROM sc CROSS JOIN m""".stripMargin)),

    // Incremental aggregate maintenance: the new release's per-source
    // aggregate from base + change-set deltas ONLY (never rescanning
    // unchanged rows); the oracle recomputes directly from the new
    // release, so hash equality certifies the delta algebra is exact.
    "q230_incremental_view" -> Entry((s, d) =>
      Curation.incrementalAggMaintenance(docs(s, d)).orderBy("source"), Some(
      """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 <> 0
        |GROUP BY source ORDER BY source""".stripMargin)),

    // Matryoshka truncation fidelity: per prefix length, mean abs cosine
    // error vs full dimension + top-1 agreement over the query grid —
    // ONE exploded pass computes full and every prefix dot/norm as
    // conditional sums in a single hash agg; decimal-quantized errors,
    // rounded-cosine argmax with smallest-cand tiebreak.
    "q231_matryoshka" -> Entry((s, d) =>
      Similarity.matryoshkaFidelity(emb(s, d)).orderBy("prefix_dim"), Some(
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
        |px AS (SELECT query_id, cand_id, unnest(range(0, len(qe))) AS pos,
        |  CAST(unnest(qe) AS DOUBLE) AS qv, CAST(unnest(ce) AS DOUBLE) AS cv
        | FROM q CROSS JOIN c WHERE query_id <> cand_id),
        |dots AS (SELECT query_id, cand_id,
        |  sum(qv*cv) AS dp_f, sum(qv*qv) AS nq_f, sum(cv*cv) AS nc_f,
        |  sum(CASE WHEN pos < 8 THEN qv*cv ELSE 0 END) AS dp_8,
        |  sum(CASE WHEN pos < 8 THEN qv*qv ELSE 0 END) AS nq_8,
        |  sum(CASE WHEN pos < 8 THEN cv*cv ELSE 0 END) AS nc_8,
        |  sum(CASE WHEN pos < 16 THEN qv*cv ELSE 0 END) AS dp_16,
        |  sum(CASE WHEN pos < 16 THEN qv*qv ELSE 0 END) AS nq_16,
        |  sum(CASE WHEN pos < 16 THEN cv*cv ELSE 0 END) AS nc_16,
        |  sum(CASE WHEN pos < 32 THEN qv*cv ELSE 0 END) AS dp_32,
        |  sum(CASE WHEN pos < 32 THEN qv*qv ELSE 0 END) AS nq_32,
        |  sum(CASE WHEN pos < 32 THEN cv*cv ELSE 0 END) AS nc_32
        | FROM px GROUP BY 1, 2),
        |perk AS (
        | SELECT CAST(8 AS BIGINT) AS prefix_dim, query_id, cand_id,
        |  round(dp_8/(sqrt(nq_8)*sqrt(nc_8)), 6) AS cos_k,
        |  round(dp_f/(sqrt(nq_f)*sqrt(nc_f)), 6) AS cos_f FROM dots
        | UNION ALL
        | SELECT CAST(16 AS BIGINT), query_id, cand_id,
        |  round(dp_16/(sqrt(nq_16)*sqrt(nc_16)), 6),
        |  round(dp_f/(sqrt(nq_f)*sqrt(nc_f)), 6) FROM dots
        | UNION ALL
        | SELECT CAST(32 AS BIGINT), query_id, cand_id,
        |  round(dp_32/(sqrt(nq_32)*sqrt(nc_32)), 6),
        |  round(dp_f/(sqrt(nq_f)*sqrt(nc_f)), 6) FROM dots),
        |err AS (SELECT prefix_dim, count(*) AS n_pairs,
        |  round(CAST(sum(CAST(abs(cos_k - cos_f) AS DECIMAL(28,12))) AS DOUBLE)/count(*), 6) AS mean_abs_err
        | FROM perk GROUP BY 1),
        |t1 AS (SELECT prefix_dim, query_id,
        |  arg_max(-cand_id, round(cos_k*1000000) * 1000000 - cand_id) AS wk,
        |  arg_max(-cand_id, round(cos_f*1000000) * 1000000 - cand_id) AS wf
        | FROM perk GROUP BY 1, 2),
        |agree AS (SELECT prefix_dim,
        |  CAST(sum(CASE WHEN wk = wf THEN 1 ELSE 0 END) AS BIGINT) AS n_top1_agree
        | FROM t1 GROUP BY 1)
        |SELECT err.prefix_dim, n_pairs, mean_abs_err, n_top1_agree
        |FROM err JOIN agree USING (prefix_dim) ORDER BY prefix_dim""".stripMargin)),

    // Daily trend over the zero-filled spine: trailing 7d moving average
    // + day-over-day delta — the derived series the spine makes correct;
    // global window over the POST-AGG one-row-per-day frame (bounded).
    "q232_daily_trend" -> Entry((s, d) =>
      Events.dailyTrend(s, d).orderBy("day"), Some(
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |c AS (SELECT day, count(*) AS n_events, count(DISTINCT user_id) AS n_users
        | FROM e GROUP BY 1),
        |mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM mm),
        |s AS (SELECT strftime(spine.day, '%Y-%m-%d') AS day,
        |  coalesce(c.n_events, 0) AS n_events
        | FROM spine LEFT JOIN c ON c.day = spine.day)
        |SELECT day, n_events,
        | n_events - lag(n_events) OVER (ORDER BY day) AS dod_delta,
        | round(CAST(sum(n_events) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) /
        |   count(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
        |FROM s ORDER BY day""".stripMargin)),

    // k-anonymity audit: quasi-identifier classes (lang x length bucket)
    // with < k members — the re-identification gate before a governed
    // release; one hash agg + size filter, tiny risky-class output.
    "q233_k_anonymity" -> Entry((s, d) =>
      graft.relational.Validate.kAnonymityAudit(docs(s, d))
        .orderBy("lang", "len_bucket"), Some(
      """SELECT lang, n_chars // 100 AS len_bucket, count(*) AS group_size
        |FROM documents GROUP BY 1, 2 HAVING count(*) < 5
        |ORDER BY lang, len_bucket""".stripMargin)),

    // STREAMING Misra-Gries heavy users per event type: the q209 sketch
    // maintained live in keyed state (<=k-1 bounded counters per type —
    // constant state regardless of stream length); final candidates are a
    // SUPERSET of the true heavy set under every micro-batch interleave,
    // and the exact-verification join makes the output equal the all-
    // exact batch oracle.
    "q234_streaming_heavy_users" -> Entry((s, d) =>
      Events.streamingHeavyUsers(s, d, k = 128).orderBy("event_type", "user_id"), Some(
      """WITH c AS (SELECT event_type, user_id, count(*) AS n_occurrences
        | FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*) AS n_type FROM events GROUP BY 1)
        |SELECT c.event_type, c.user_id, c.n_occurrences
        |FROM c JOIN t USING (event_type)
        |WHERE c.n_occurrences * 128 > t.n_type
        |ORDER BY event_type, user_id""".stripMargin)),

    // Borderline-pair audit queue: verified pairs closest to the dedup
    // threshold (uncertainty sampling for human/model review) — md5 chain
    // at a lower 0.3 floor so both sides of the boundary appear; bounded
    // top-k with deterministic (dist, doc_a, doc_b) tiebreak.
    "q235_borderline_pairs" -> Entry((s, d) =>
      Dedup.borderlinePairs(s, d).orderBy("dist_to_threshold", "doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.3)
        |SELECT doc_a, doc_b, jaccard,
        | round(abs(jaccard - 0.5), 6) AS dist_to_threshold
        |FROM pairs ORDER BY dist_to_threshold, doc_a, doc_b LIMIT 20""".stripMargin)),

    // Largest-remainder (Hamilton) apportionment of an integer sample
    // budget across sources: floor the exact quota, hand leftovers to the
    // largest integer remainders (count-desc, source-asc tiebreak) — sums
    // to EXACTLY the budget, each source within 1 of proportional.
    "q236_budget_apportion" -> Entry((s, d) =>
      Curation.apportionBudget(docs(s, d)).orderBy("source"), Some(
      """WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_src) AS n_total FROM c),
        |b AS (SELECT source, n_src, (100 * n_src) // n_total AS floor_q,
        |  (100 * n_src) % n_total AS rem FROM c CROSS JOIN t),
        |fs AS (SELECT sum(floor_q) AS floor_sum FROM b),
        |r AS (SELECT b.source, b.n_src, b.floor_q,
        |  row_number() OVER (ORDER BY b.rem DESC, b.source) AS rk FROM b)
        |SELECT source, n_src,
        | CAST(floor_q + CASE WHEN rk <= 100 - floor_sum THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM r CROSS JOIN fs ORDER BY source""".stripMargin)),

    // UniMax token-budget allocation (Chung et al. 2023) with the
    // Muennighoff-style repetition ceiling: as-uniform-as-possible token
    // grants per source, capped at maxEpochs x the source's own tokens;
    // the sequential waterfill is certified as a finite UNROLLED form
    // (uniform round + one redistribution round — the q94/q121 idiom).
    // Integer token arithmetic end to end; one corpus scan, then K-row
    // frames with 1-row broadcast crosses.
    "q259_unimax_budget" -> Entry((s, d) =>
      Curation.unimaxAllocation(docs(s, d)).orderBy("source"), Some(
      """WITH tok AS (SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n, count(*) AS k FROM tok),
        |base AS (SELECT tok.source, tok.n_tokens, tok.n_tokens * 2 AS cap,
        |  (tot.n * 3) // 2 AS b, ((tot.n * 3) // 2) // tot.k AS fair1
        | FROM tok CROSS JOIN tot),
        |g1 AS (SELECT *, least(cap, fair1) AS grant1 FROM base),
        |r AS (SELECT CAST(sum(grant1) AS BIGINT) AS granted_r1,
        |  CAST(sum(CASE WHEN cap > fair1 THEN 1 ELSE 0 END) AS BIGINT) AS n_open FROM g1)
        |SELECT source, n_tokens, cap, grant1,
        | CAST(CASE WHEN r.n_open > 0 AND cap > fair1
        |   THEN least(cap, grant1 + (b - r.granted_r1) // r.n_open)
        |   ELSE grant1 END AS BIGINT) AS granted,
        | round(CAST(CASE WHEN r.n_open > 0 AND cap > fair1
        |   THEN least(cap, grant1 + (b - r.granted_r1) // r.n_open)
        |   ELSE grant1 END AS DOUBLE) / n_tokens, 6) AS epochs,
        | CASE WHEN r.n_open > 0 AND cap > fair1
        |   THEN least(cap, grant1 + (b - r.granted_r1) // r.n_open)
        |   ELSE grant1 END = cap AS saturated
        |FROM g1 CROSS JOIN r ORDER BY source""".stripMargin)),

    // Functional-dependency audit: per candidate A->B, one A-keyed hash
    // agg with exact count(DISTINCT B) + a 1-row violating-group rollup —
    // exact verdicts (a sampled FD is how bad merge keys get chosen);
    // candidates span holding keys AND expected failures.
    // Fellegi-Sunter probabilistic record linkage: blocked candidate
    // pairs (nation equi-join), per-field agreement (levenshtein<=1 name,
    // exact segment/balance), DECIMAL-exact log2(m/u) weight sums banded
    // into match/possible. The dirty side is a deterministic md5-gated
    // re-registration fixture both engines derive identically.
    "q261_record_linkage" -> Entry((s, d) =>
      graft.relational.RecordLinkage.fsLinkage(Tables(s, d, "customer"))
        .orderBy("dirty_id", "cand_key"), Some(
      """WITH dirty AS (SELECT c_custkey + 10000000 AS dirty_id,
        |   substr(c_name, 1, length(c_name) - 1) || 'X' AS d_name,
        |   c_nationkey AS d_nation,
        |   CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR) || ':dirtybal'), 1, 2) < '20'
        |     THEN CAST(c_acctbal AS DOUBLE) + 1.0 ELSE CAST(c_acctbal AS DOUBLE) END AS d_bal,
        |   c_mktsegment AS d_seg
        |  FROM customer
        |  WHERE substr(md5(CAST(c_custkey AS VARCHAR) || ':dirty'), 1, 2) < '40'),
        |sc AS (SELECT dirty_id, c.c_custkey AS cand_key,
        |   levenshtein(d_name, c.c_name) <= 1 AS a_name,
        |   d_seg = c.c_mktsegment AS a_seg,
        |   d_bal = CAST(c.c_acctbal AS DOUBLE) AS a_bal,
        |   (CASE WHEN levenshtein(d_name, c.c_name) <= 1
        |      THEN CAST(9.891784 AS DECIMAL(12,6)) ELSE CAST(-4.320485 AS DECIMAL(12,6)) END
        |    + CASE WHEN d_seg = c.c_mktsegment
        |      THEN CAST(2.247928 AS DECIMAL(12,6)) ELSE CAST(-4.000000 AS DECIMAL(12,6)) END
        |    + CASE WHEN d_bal = CAST(c.c_acctbal AS DOUBLE)
        |      THEN CAST(6.629357 AS DECIMAL(12,6)) ELSE CAST(-6.629357 AS DECIMAL(12,6)) END) AS score_dec
        |  FROM dirty JOIN customer c ON dirty.d_nation = c.c_nationkey)
        |SELECT dirty_id, cand_key, a_name, a_seg, a_bal,
        | CAST(score_dec AS DOUBLE) AS score,
        | CASE WHEN score_dec >= 12 THEN 'match' ELSE 'possible' END AS verdict
        |FROM sc WHERE score_dec >= 0 ORDER BY dirty_id, cand_key""".stripMargin)),

    "q237_fd_audit" -> Entry((s, d) =>
      graft.relational.Profile.fdAudit(Seq(
        ("orders", Tables(s, d, "orders"), "o_orderkey", "o_custkey"),
        ("orders", Tables(s, d, "orders"), "o_custkey", "o_orderstatus"),
        ("lineitem", Tables(s, d, "lineitem"), "l_orderkey", "l_suppkey"),
        ("nation", Tables(s, d, "nation"), "n_nationkey", "n_regionkey"),
        ("documents", docs(s, d), "doc_id", "lang"),
        ("documents", docs(s, d), "source", "lang"))).orderBy("table_name", "fd"), Some(
      """SELECT * FROM (
        | SELECT 'orders' AS table_name, 'o_orderkey->o_custkey' AS fd,
        |  count(*) AS n_groups,
        |  CAST(sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
        |  sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) = 0 AS holds
        | FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS ndb FROM orders GROUP BY 1)
        | UNION ALL
        | SELECT 'orders', 'o_custkey->o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) = 0
        | FROM (SELECT o_custkey, count(DISTINCT o_orderstatus) AS ndb FROM orders GROUP BY 1)
        | UNION ALL
        | SELECT 'lineitem', 'l_orderkey->l_suppkey', count(*),
        |  CAST(sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) = 0
        | FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS ndb FROM lineitem GROUP BY 1)
        | UNION ALL
        | SELECT 'nation', 'n_nationkey->n_regionkey', count(*),
        |  CAST(sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) = 0
        | FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS ndb FROM nation GROUP BY 1)
        | UNION ALL
        | SELECT 'documents', 'doc_id->lang', count(*),
        |  CAST(sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) = 0
        | FROM (SELECT doc_id, count(DISTINCT lang) AS ndb FROM documents GROUP BY 1)
        | UNION ALL
        | SELECT 'documents', 'source->lang', count(*),
        |  CAST(sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN ndb > 1 THEN 1 ELSE 0 END) = 0
        | FROM (SELECT source, count(DISTINCT lang) AS ndb FROM documents GROUP BY 1))
        |ORDER BY table_name, fd""".stripMargin)),

    // STREAMING ingest gate: the q216 constraint shape as a live monitor
    // (per-row rules only — uniqueness deliberately stays batch-side
    // where exact count(DISTINCT) is possible); stateless complete-mode
    // agg settles to exactly the batch audit.
    "q238_streaming_gate" -> Entry((s, d) =>
      Events.streamingIngestGate(s, d).orderBy("rule"), Some(
      """WITH a AS (SELECT count(*) AS n_rows,
        |  sum(CASE WHEN event_id IS NOT NULL THEN 0 ELSE 1 END) AS v_id,
        |  sum(CASE WHEN event_type IN ('view','click','purchase','signup','error') THEN 0 ELSE 1 END) AS v_type,
        |  sum(CASE WHEN value >= 0 AND NOT isnan(value) THEN 0 ELSE 1 END) AS v_value,
        |  sum(CASE WHEN ts BETWEEN TIMESTAMP '1990-01-01' AND TIMESTAMP '2100-01-01' THEN 0 ELSE 1 END) AS v_ts
        | FROM events)
        |SELECT rule, n_rows AS n_checked, CAST(n_violations AS BIGINT) AS n_violations
        |FROM (
        | SELECT 'event_id_not_null' AS rule, n_rows, v_id AS n_violations FROM a
        | UNION ALL SELECT 'type_accepted', n_rows, v_type FROM a
        | UNION ALL SELECT 'value_finite_nonneg', n_rows, v_value FROM a
        | UNION ALL SELECT 'ts_in_range', n_rows, v_ts FROM a)
        |ORDER BY rule""".stripMargin)),

    // Join-cardinality estimation audit: System-R per-bucket histogram
    // estimate (na*nb/max(da,db), key mod 64 buckets) reported NEXT TO
    // the true join count and relative error — the back-test a stats
    // pipeline publishes before trusting its histogram resolution.
    "q239_join_estimate" -> Entry((s, d) =>
      graft.relational.Profile.joinCardinalityAudit(
        Tables(s, d, "lineitem").filter(col("l_shipdate") >= "1997-01-01"), "l_orderkey",
        Tables(s, d, "orders").filter(col("o_orderstatus") === "O"), "o_orderkey"), Some(
      """WITH f AS (SELECT l_orderkey AS k FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'),
        |dm AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'),
        |fh AS (SELECT k % 64 AS bucket, count(*) AS na, count(DISTINCT k) AS da FROM f GROUP BY 1),
        |dh AS (SELECT k % 64 AS bucket, count(*) AS nb, count(DISTINCT k) AS db FROM dm GROUP BY 1),
        |e AS (SELECT round(CAST(sum(CAST(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) /
        |    CAST(greatest(da, db) AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE), 6) AS est_rows
        |  FROM fh JOIN dh USING (bucket)),
        |a AS (SELECT count(*) AS actual_rows FROM f JOIN dm USING (k))
        |SELECT CAST(64 AS BIGINT) AS n_buckets, est_rows, actual_rows,
        | round(abs(est_rows - CAST(actual_rows AS DOUBLE)) / CAST(actual_rows AS DOUBLE), 6) AS rel_error
        |FROM e CROSS JOIN a""".stripMargin)),

    // Event-type co-occurrence lift over per-user baskets: the market-
    // basket association matrix; pair counts from a type-bounded per-user
    // self-join, singles/total broadcast back, exact integer counts.
    "q240_type_lift" -> Entry((s, d) =>
      Events.typeLiftMatrix(s, d).orderBy("type_a", "type_b"), Some(
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |singles AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
        |tot AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
        | FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        | GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        | round(CAST(n_both AS DOUBLE) * CAST(n_users AS DOUBLE) /
        |   (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)), 6) AS lift
        |FROM p JOIN singles sa ON sa.event_type = p.type_a
        | JOIN singles sb ON sb.event_type = p.type_b CROSS JOIN tot
        |ORDER BY type_a, type_b""".stripMargin)),

    // Substring-dedup APPLY path: duplicated-token coverage as a UNION of
    // intervals (adjacent islands overlap by up to w-1 tokens — naive
    // span-length sums double-count the shoulder), kept counts + removal
    // ratio — the pre-rewrite accounting of a Lee-et-al dedup run.
    "q241_span_removal" -> Entry((s, d) =>
      Dedup.spanRemovalReport(docs(s, d)).orderBy("doc_id"), Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, CAST(i AS BIGINT) AS start_pos,
        |    md5(array_to_string(t[i:i+7], ' ')) AS h
        |  FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i) WHERE len(t) >= 8),
        |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) > 1),
        |d AS (SELECT w.doc_id, w.start_pos,
        |    row_number() OVER (PARTITION BY w.doc_id ORDER BY w.start_pos) AS rn
        |  FROM w JOIN dup USING (h)),
        |g AS (SELECT doc_id, start_pos - rn AS grp, min(start_pos) AS span_start,
        |    max(start_pos) AS span_last, count(*) AS n_windows
        |  FROM d GROUP BY doc_id, start_pos - rn),
        |spans AS (SELECT doc_id, span_start, span_last - span_start + 8 AS span_tokens
        |  FROM g WHERE span_last - span_start + 8 >= 50),
        |iv AS (SELECT doc_id, span_start, span_start + span_tokens - 1 AS e,
        |  max(span_start + span_tokens - 1) OVER (PARTITION BY doc_id ORDER BY span_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        | FROM spans),
        |cov AS (SELECT doc_id,
        |  sum(greatest(0, e - greatest(span_start, coalesce(pmax + 1, span_start)) + 1)) AS dup_tokens
        | FROM iv GROUP BY 1),
        |nt AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
        |SELECT nt.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(dup_tokens AS BIGINT) AS dup_tokens,
        | CAST(n_tokens - dup_tokens AS BIGINT) AS kept_tokens,
        | round(CAST(dup_tokens AS DOUBLE) / n_tokens, 6) AS dup_ratio
        |FROM cov JOIN nt USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // RFM segmentation: per-user recency/frequency/monetary quartiles via
    // ntile under deterministic (metric, user) order — rank-based scoring
    // is engine-exact; windows run over the post-agg one-row-per-user
    // frame (the q81 cutpoint machinery is the documented global-sort-
    // free swap at warehouse scale).
    "q242_rfm_segments" -> Entry((s, d) =>
      Events.rfmSegments(s, d).orderBy("user_id"), Some(
      """WITH p AS (SELECT user_id, max(epoch_ms(ts)) AS last_purchase_ms,
        |  count(*) AS n_purchases, sum(CAST(value AS DECIMAL(18,6))) AS tv
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |sc AS (SELECT user_id, last_purchase_ms, n_purchases,
        |  CAST(tv AS DOUBLE) AS total_value,
        |  CAST(ntile(4) OVER (ORDER BY last_purchase_ms, user_id) AS BIGINT) AS r_score,
        |  CAST(ntile(4) OVER (ORDER BY n_purchases, user_id) AS BIGINT) AS f_score,
        |  CAST(ntile(4) OVER (ORDER BY tv, user_id) AS BIGINT) AS m_score
        | FROM p)
        |SELECT user_id, last_purchase_ms, n_purchases, total_value,
        | r_score, f_score, m_score,
        | 'R' || CAST(r_score AS VARCHAR) || 'F' || CAST(f_score AS VARCHAR) ||
        |   'M' || CAST(m_score AS VARCHAR) AS segment
        |FROM sc ORDER BY user_id""".stripMargin)),

    // Duplicate-class triage: verified pairs labeled exact > containment
    // (>=90% of the smaller set — cross-multiplied, no float boundary) >
    // near > weak — the taxonomy the drop/keep/review branch runs on.
    "q243_dup_triage" -> Entry((s, d) =>
      Dedup.dupTriage(s, d).orderBy("doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT * FROM (
        |  SELECT doc_a, doc_b, n_common,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |hm AS (SELECT doc_id, md5(text) AS tm FROM documents)
        |SELECT p.doc_a, p.doc_b, p.jaccard,
        | round(CAST(p.n_common AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE), 6) AS containment,
        | CASE WHEN ha.tm = hb.tm THEN 'exact'
        |      WHEN p.n_common * 10 >= least(na.n, nb.n) * 9 THEN 'containment'
        |      WHEN p.jaccard >= 0.7 THEN 'near' ELSE 'weak' END AS dup_class
        |FROM pairs p JOIN sizes na ON p.doc_a = na.doc_id
        | JOIN sizes nb ON p.doc_b = nb.doc_id
        | JOIN hm ha ON ha.doc_id = p.doc_a JOIN hm hb ON hb.doc_id = p.doc_b
        |ORDER BY p.doc_a, p.doc_b""".stripMargin)),

    // Dataset card: the release-artifact statistics block as a uniform
    // (metric, value) frame — three hash-agg scans total (doc grain,
    // token grain, lang shares), metric names adapt to the corpus.
    "q244_dataset_card" -> Entry((s, d) =>
      TextAnalysis.datasetCard(docs(s, d)).orderBy("metric"), Some(
      """WITH base AS (SELECT lang, source, md5(text) AS tm,
        |  len(string_split(text, ' ')) AS ntok FROM documents),
        |dg AS (SELECT count(*) AS n_docs, sum(ntok) AS n_tokens,
        |  count(DISTINCT tm) AS n_distinct_texts, count(DISTINCT source) AS n_sources
        | FROM base),
        |tf AS (SELECT term, count(*) AS n FROM
        |  (SELECT unnest(string_split(text, ' ')) AS term FROM documents) GROUP BY 1),
        |tg AS (SELECT count(*) AS n_types,
        |  sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS n_hapax, sum(n) AS n_tok FROM tf),
        |tot AS (SELECT count(*) AS n_total FROM base),
        |ls AS (SELECT 'lang_share_' || lang AS metric,
        |  round(CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS value
        | FROM base CROSS JOIN tot GROUP BY lang, n_total)
        |SELECT metric, value FROM (
        | SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM dg
        | UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM dg
        | UNION ALL SELECT 'exact_dup_docs', CAST(n_docs - n_distinct_texts AS DOUBLE) FROM dg
        | UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM dg
        | UNION ALL SELECT 'mean_doc_tokens', round(CAST(n_tokens AS DOUBLE) / n_docs, 6) FROM dg
        | UNION ALL SELECT 'n_types', CAST(n_types AS DOUBLE) FROM tg
        | UNION ALL SELECT 'hapax_ratio', round(CAST(n_hapax AS DOUBLE) / n_types, 6) FROM tg
        | UNION ALL SELECT 'type_token_ratio', round(CAST(n_types AS DOUBLE) / n_tok, 6) FROM tg
        | UNION ALL SELECT metric, value FROM ls)
        |ORDER BY metric""".stripMargin)),

    // Catalyst optimizer rule in action: the NAIVE |delta-ms| <= 2d theta
    // join (which plans as a BroadcastNestedLoopJoin) rewritten by
    // RangeJoinBucketRule into a bucketed shuffle equi-join + residual —
    // the oracle runs the unrewritten theta join, so hash equality
    // certifies the rewrite is lossless; plan shape pinned in
    // RangeJoinRuleSpec.
    "q245_rule_range_join" -> Entry((s, d) =>
      graft.plans.RangeJoinBucketRule.nearbyOrderCounts(s, d).orderBy("o_orderkey"), Some(
      """WITH o AS (SELECT o_orderkey, epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS ms,
        |  o_orderpriority FROM orders),
        |u AS (SELECT o_orderkey AS u_key, ms AS u_ms FROM o
        | WHERE o_orderpriority = '1-URGENT')
        |SELECT u_key AS o_orderkey, count(*) AS n_nearby
        |FROM u JOIN o ON abs(u_ms - o.ms) <= 172800000
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The q245 range join written the way most users write it — genuine
    // TIMESTAMP operands and a BETWEEN predicate (analyzed: two
    // TimestampAddInterval conjuncts). Round 13's rule missed this
    // spelling and paid the BNLJ cliff; the generalized rule buckets it
    // via unix_micros. Oracle runs the unrewritten BETWEEN theta join.
    "q266_rule_range_between" -> Entry((s, d) =>
      graft.plans.RangeJoinBucketRule.nearbyOrderCountsBetween(s, d)
        .orderBy("o_orderkey"), Some(
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
        |  o_orderpriority FROM orders),
        |u AS (SELECT o_orderkey AS u_key, ts AS u_ts FROM o
        | WHERE o_orderpriority = '1-URGENT')
        |SELECT u_key AS o_orderkey, count(*) AS n_nearby
        |FROM u JOIN o ON o.ts BETWEEN u.u_ts - INTERVAL 2 DAY
        |                          AND u.u_ts + INTERVAL 2 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // l-diversity audit (k-anonymity's complement): per quasi-class,
    // size + distinct sensitive values + the diversity verdict — a large
    // class with ONE sensitive value still leaks by membership alone.
    "q246_l_diversity" -> Entry((s, d) =>
      graft.relational.Validate.lDiversityAudit(docs(s, d))
        .orderBy("lang", "len_bucket"), Some(
      """SELECT lang, n_chars // 100 AS len_bucket, count(*) AS group_size,
        | count(DISTINCT source) AS n_sensitive,
        | count(DISTINCT source) >= 3 AS diverse
        |FROM documents GROUP BY 1, 2 ORDER BY lang, len_bucket""".stripMargin)),

    // t-closeness audit: the third privacy rung after k-anonymity (q233)
    // and l-diversity (q246) — per quasi-class TVD between the class's
    // sensitive-value distribution and the global one (skewness attack).
    // Absent sources fold in algebraically (TVD = (1 + sum over PRESENT
    // cells of |p-q|-q)/2) so no class x source cross product is ever
    // built; DECIMAL(30,18)-quantized contributions (the q219 rule).
    "q258_t_closeness" -> Entry((s, d) =>
      graft.relational.Validate.tClosenessAudit(docs(s, d))
        .orderBy("lang", "len_bucket"), Some(
      """WITH c AS (SELECT lang, n_chars // 100 AS len_bucket, source, count(*) AS ncs
        | FROM documents GROUP BY 1, 2, 3),
        |cls AS (SELECT lang, len_bucket, CAST(sum(ncs) AS BIGINT) AS nc FROM c GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(ncs) AS BIGINT) AS ns FROM c GROUP BY 1),
        |n AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM g),
        |con AS (SELECT c.lang, c.len_bucket, cls.nc,
        |  CAST(abs(CAST(c.ncs AS DOUBLE)/CAST(cls.nc AS DOUBLE)
        |           - CAST(g.ns AS DOUBLE)/CAST(n.n AS DOUBLE))
        |       - CAST(g.ns AS DOUBLE)/CAST(n.n AS DOUBLE) AS DECIMAL(30,18)) AS contrib
        | FROM c JOIN cls USING (lang, len_bucket) JOIN g USING (source) CROSS JOIN n)
        |SELECT lang, len_bucket, nc AS group_size,
        | round((1.0 + CAST(sum(contrib) AS DOUBLE))/2, 6) AS tvd,
        | round((1.0 + CAST(sum(contrib) AS DOUBLE))/2, 6) <= 0.35 AS close
        |FROM con GROUP BY 1, 2, 3 ORDER BY lang, len_bucket""".stripMargin)),

    // Dedup threshold-calibration sweep: verified-pair counts per Jaccard
    // tenth-band + the cumulative at-or-above curve (the knee locates the
    // threshold); ONE pass over the cached 0.3-floor pair frame, integer
    // micro-unit banding (no float boundary), bounded <=7-row window.
    "q247_threshold_sweep" -> Entry((s, d) =>
      Dedup.thresholdSweep(s, d).orderBy("band"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.3),
        |bd AS (SELECT CAST(round(jaccard * 1000000) AS BIGINT) // 100000 AS band,
        |  count(*) AS n_pairs FROM pairs GROUP BY 1)
        |SELECT band, n_pairs,
        | CAST(sum(n_pairs) OVER (ORDER BY band DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_at_or_above
        |FROM bd ORDER BY band""".stripMargin)),

    // Leave-last-out eval split: each user's latest purchase is the held-
    // out test point (PIT-correct), singles stay train-only; argmax
    // struct + broadcast join back, no window over the fact stream.
    "q248_leave_last_out" -> Entry((s, d) =>
      Events.leaveLastOutSplit(s, d).orderBy("event_id"), Some(
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
        | WHERE event_type = 'purchase'),
        |l AS (SELECT user_id, arg_max(event_id, ms * 1000000 + event_id) AS last_id,
        |  count(*) AS n FROM p GROUP BY 1)
        |SELECT p.event_id, p.user_id,
        | CASE WHEN p.event_id = l.last_id AND l.n > 1 THEN 'test' ELSE 'train' END AS split
        |FROM p JOIN l USING (user_id) ORDER BY p.event_id""".stripMargin)),

    // Next-event-type dataset construction: (prev2, prev1) -> label
    // examples from two lag windows over one user partitioning; strict
    // full-context examples only.
    "q249_next_event_dataset" -> Entry((s, d) =>
      Events.nextEventDataset(s, d).orderBy("example_id"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
        |l AS (SELECT user_id, event_id AS example_id, event_type AS label,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev1,
        |  lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev2
        | FROM e)
        |SELECT user_id, example_id, prev2, prev1, label
        |FROM l WHERE prev2 IS NOT NULL ORDER BY example_id""".stripMargin)),

    // ListState rolling-context processor: the q249 next-event dataset
    // maintained LIVE by transformWithState (the third state primitive
    // after q257's Value+Map and q264's timers) — last-2 event types per
    // user in a bounded ListState, each full-history arrival emits one
    // training example. Settled == the q249 batch lag-window oracle.
    "q273_tws_rolling_context" -> Entry((s, d) =>
      Events.twsRollingContext(s, d).orderBy("example_id"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
        |l AS (SELECT user_id, event_id AS example_id, event_type AS label,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev1,
        |  lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev2
        | FROM e)
        |SELECT user_id, example_id, prev2, prev1, label
        |FROM l WHERE prev2 IS NOT NULL ORDER BY example_id""".stripMargin)),

    // U-shaped multi-touch attribution: 40/20/40 position-based credit
    // across the lookback touch list of each purchase (q226's endpoints
    // refined to the full industry-standard weighting).
    "q274_ushaped_attribution" -> Entry((s, d) =>
      Events.uShapedAttribution(s, d).orderBy("p_event", "touch_pos"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
        |p AS (SELECT user_id AS p_user, ms AS p_ms, event_id AS p_event
        |  FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS t_user, ms AS t_ms, event_id AS t_event
        |  FROM e WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p_event, t_event, t_ms FROM p JOIN t ON p_user = t_user
        |  AND t_ms >= p_ms - 3600000 AND t_ms <= p_ms),
        |r AS (SELECT p_event, t_event,
        |   row_number() OVER (PARTITION BY p_event ORDER BY t_ms, t_event) AS rn,
        |   count(*) OVER (PARTITION BY p_event) AS n FROM j)
        |SELECT p_event, t_event, CAST(rn AS BIGINT) AS touch_pos,
        | CAST(n AS BIGINT) AS n_touches,
        | round(CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
        |   WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
        |   WHEN rn = 1 OR rn = n THEN CAST(0.4 AS DOUBLE)
        |   ELSE CAST(0.2 AS DOUBLE) / (n - 2) END, 6) AS credit
        |FROM r ORDER BY p_event, touch_pos""".stripMargin)),

    // TIME-BOUNDED funnel: view -> click -> purchase, each step within
    // 7 days of the previous step's first occurrence — the windowed
    // refinement of q102's unbounded chain; K tiny agg+join rounds.
    "q275_windowed_funnel" -> Entry((s, d) =>
      Events.funnelConversion(s, d).orderBy("step_idx"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events),
        |u AS (SELECT count(DISTINCT user_id) AS n0 FROM e),
        |s1 AS (SELECT user_id, min(ms) AS m1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ms) AS m2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ms > m1 AND ms <= m1 + 604800000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ms) AS m3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > m2 AND ms <= m2 + 604800000 GROUP BY 1),
        |n1 AS (SELECT count(*) AS n1 FROM s1),
        |n2 AS (SELECT count(*) AS n2 FROM s2),
        |n3 AS (SELECT count(*) AS n3 FROM s3)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
        |  CAST(n1 AS BIGINT) AS n_users,
        |  round(CAST(n1 AS DOUBLE) / n0, 6) AS conversion FROM n1 CROSS JOIN u
        | UNION ALL
        | SELECT 2, 'click', CAST(n2 AS BIGINT),
        |  round(CAST(n2 AS DOUBLE) / n1, 6) FROM n2 CROSS JOIN n1
        | UNION ALL
        | SELECT 3, 'purchase', CAST(n3 AS BIGINT),
        |  round(CAST(n3 AS DOUBLE) / n2, 6) FROM n3 CROSS JOIN n2)
        |ORDER BY step_idx""".stripMargin)),

    // Wide pivot: per-user event-type count matrix (inverse of the q56
    // melt) on Spark's native pivot with a pinned value list.
    "q280_event_pivot" -> Entry((s, d) =>
      Queries.eventTypePivot(s, d).orderBy("user_id"), Some(
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact per-group percentiles: Spark percentile() vs DuckDB
    // quantile_cont — hash equality certifies both engines' p*(n-1)
    // linear interpolation agrees bit-for-bit.
    "q281_exact_percentiles" -> Entry((s, d) =>
      Queries.valuePercentiles(s, d).orderBy("event_type"), Some(
      """SELECT event_type,
        | round(quantile_cont(value, 0.25), 6) AS p25,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.75), 6) AS p75,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-group Pearson correlation matrix from DECIMAL(38,8)-quantized
    // moment sums (never the engines' order-dependent corr() kernels):
    // one scan, one hash agg, closed-form per-pair division.
    "q282_corr_matrix" -> Entry((s, d) =>
      Queries.corrMatrix(s, d).orderBy("flag"), Some(
      """WITH m AS (SELECT l_returnflag AS flag, count(*) AS n,
        | sum(CAST(l_quantity AS DECIMAL(38,8))) AS sq,
        | sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS sp,
        | sum(CAST(l_discount AS DECIMAL(38,8))) AS sd,
        | sum(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS sqq,
        | sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS spp,
        | sum(CAST(l_discount * l_discount AS DECIMAL(38,8))) AS sdd,
        | sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS sqp,
        | sum(CAST(l_quantity * l_discount AS DECIMAL(38,8))) AS sqd,
        | sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,8))) AS spd
        |FROM lineitem GROUP BY 1)
        |SELECT flag, n,
        | round((n * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) /
        |   sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
        |        (n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS corr_qty_price,
        | round((n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE)) /
        |   sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
        |        (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS corr_qty_disc,
        | round((n * CAST(spd AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE)) /
        |   sqrt((n * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) *
        |        (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS corr_price_disc
        |FROM m ORDER BY flag""".stripMargin)),

    // Weekly growth accounting: each active week's users decomposed into
    // new / retained / resurrected, plus the week's churn — the identity
    // (active_w = new+retained+resurrected, active_{w-1} = retained+churned)
    // behind q103's retention matrix.
    "q276_growth_accounting" -> Entry((s, d) =>
      Events.growthAccounting(s, d).orderBy("week"), Some(
      """WITH a AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 // 7 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS first_week FROM a GROUP BY 1),
        |st AS (SELECT a.week,
        |  CASE WHEN a.week = f.first_week THEN 'new'
        |       WHEN p.user_id IS NOT NULL THEN 'retained'
        |       ELSE 'resurrected' END AS status
        | FROM a JOIN f USING (user_id)
        | LEFT JOIN a p ON p.user_id = a.user_id AND p.week = a.week - 1),
        |cls AS (SELECT week,
        |  CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        | FROM st GROUP BY 1),
        |ch AS (SELECT a.week + 1 AS week, count(*) AS n_churned
        | FROM a LEFT JOIN a n ON n.user_id = a.user_id AND n.week = a.week + 1
        | WHERE n.user_id IS NULL GROUP BY 1)
        |SELECT cls.week, n_new, n_retained, n_resurrected,
        | CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
        |FROM cls LEFT JOIN ch USING (week) ORDER BY week""".stripMargin)),

    // Heaps'-law vocabulary-growth fit per source: V(N) ~ k*N^beta by
    // closed-form least squares on (ln cum_tokens, ln cum_vocab) across
    // ingest batches; DECIMAL(30,12)-quantized normal-equation sums.
    "q278_heaps_law" -> Entry((s, d) =>
      TextAnalysis.heapsLawFit(docs(s, d)).orderBy("source"), Some(
      """WITH tk AS (SELECT source, doc_id // 100 AS batch,
        |  unnest(string_split(text, ' ')) AS t FROM documents),
        |pb AS (SELECT source, batch, count(*) AS n_toks FROM tk GROUP BY 1, 2),
        |fs AS (SELECT source, t, min(batch) AS batch FROM
        |  (SELECT DISTINCT source, batch, t FROM tk) GROUP BY 1, 2),
        |nn AS (SELECT source, batch, count(*) AS n_new FROM fs GROUP BY 1, 2),
        |cum AS (SELECT pb.source, pb.batch,
        |   CAST(sum(pb.n_toks) OVER (PARTITION BY pb.source ORDER BY pb.batch) AS BIGINT) AS cum_toks,
        |   CAST(sum(coalesce(nn.n_new, 0)) OVER (PARTITION BY pb.source ORDER BY pb.batch) AS BIGINT) AS cum_vocab
        |  FROM pb LEFT JOIN nn ON pb.source = nn.source AND pb.batch = nn.batch),
        |pt AS (SELECT source, ln(CAST(cum_toks AS DOUBLE)) AS x,
        |   ln(CAST(cum_vocab AS DOUBLE)) AS y FROM cum),
        |q AS (SELECT source, CAST(x AS DECIMAL(30,12)) AS xq, CAST(y AS DECIMAL(30,12)) AS yq,
        |   CAST(x * x AS DECIMAL(30,12)) AS xxq, CAST(x * y AS DECIMAL(30,12)) AS xyq FROM pt),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_points, sum(xq) AS sx,
        |   sum(yq) AS sy, sum(xxq) AS sxx, sum(xyq) AS sxy FROM q GROUP BY 1)
        |SELECT source, n_points,
        | round((n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
        | round(exp((CAST(sy AS DOUBLE) -
        |   ((n_points * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (n_points * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |   * CAST(sx AS DOUBLE)) / n_points), 6) AS k
        |FROM s ORDER BY source""".stripMargin)),

    // Custom DataSource V2 connector: documents written to GLPR (a
    // WARC-shaped length-prefixed record format, one shard per writer
    // partition) and read BACK through the connector — column pruning
    // byte-skips unread fields, doc_id range filters push into the scan.
    // Hash equality with the parquet originals certifies the whole
    // source layer; pushdown/pruning plans pinned in GlprSpec.
    "q284_glpr_source" -> Entry((s, d) =>
      graft.io.GlprSource.documentsVia(s, d).orderBy("doc_id"), Some(
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin)),

    // The GLPR connector consumed as a STREAM (MicroBatchStream: name-
    // interval offsets, per-trigger shard planning, same pruning reader)
    // rolled into a per-language profile; settled == the identical batch
    // oracle. Incremental shard arrival is MemoryStream-style pinned in
    // GlprSpec.
    "q285_glpr_stream" -> Entry((s, d) =>
      graft.io.GlprSource.streamedLangProfile(s, d).orderBy("lang"), Some(
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 3-way IPF raking, one sweep: the reference's 2-marginal step
    // generalized to three marginals (row, then col, then layer fit,
    // each re-normalizing the last) — the statistical-agency raking
    // shape. DECIMAL(38,6) denominator sums, 6dp per fit (q94 rules).
    "q286_rake3_sweep" -> Entry((s, d) =>
      Queries.rake3Sweep(s, d).orderBy("mrow", "mcol", "mlay"), Some(
      """WITH m0 AS (SELECT l_partkey AS mrow, CAST(month(l_shipdate) AS BIGINT) AS mcol,
        |  l_returnflag AS mlay,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS mval
        | FROM lineitem GROUP BY 1, 2, 3),
        |x AS (SELECT l_partkey AS mrow,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS tval
        | FROM lineitem GROUP BY 1),
        |y AS (SELECT CAST(month(l_shipdate) AS BIGINT) AS mcol,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS tval
        | FROM lineitem GROUP BY 1),
        |z AS (SELECT l_returnflag AS mlay,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS tval
        | FROM lineitem GROUP BY 1),
        |rs AS (SELECT mrow, CAST(sum(CAST(mval AS DECIMAL(38,6))) AS DOUBLE) AS dsum
        | FROM m0 GROUP BY 1),
        |f1 AS (SELECT m0.mrow, m0.mcol, m0.mlay,
        |  round(m0.mval * (x.tval / rs.dsum), 6) AS mval
        | FROM m0 JOIN rs USING (mrow) JOIN x USING (mrow)),
        |cs AS (SELECT mcol, CAST(sum(CAST(mval AS DECIMAL(38,6))) AS DOUBLE) AS dsum
        | FROM f1 GROUP BY 1),
        |f2 AS (SELECT f1.mrow, f1.mcol, f1.mlay,
        |  round(f1.mval * (y.tval / cs.dsum), 6) AS mval
        | FROM f1 JOIN cs USING (mcol) JOIN y USING (mcol)),
        |ls AS (SELECT mlay, CAST(sum(CAST(mval AS DECIMAL(38,6))) AS DOUBLE) AS dsum
        | FROM f2 GROUP BY 1),
        |f3 AS (SELECT f2.mrow, f2.mcol, f2.mlay,
        |  round(f2.mval * (z.tval / ls.dsum), 6) AS mval
        | FROM f2 JOIN ls USING (mlay) JOIN z USING (mlay))
        |SELECT mrow, mcol, mlay, mval FROM f3 ORDER BY 1, 2, 3""".stripMargin)),

    // Per-group top-k as a CUSTOM PHYSICAL OPERATOR (logical node +
    // injected SparkStrategy + TopKPerGroupExec): bounded per-group
    // heaps after one hash exchange — O(n log k), O(groups*k) memory,
    // no Sort, no Window, no spill path. Oracle runs the row_number
    // window spelling; hash equality certifies the operator. Plan shape
    // pinned in TopKPerGroupSpec.
    "q287_topk_operator" -> Entry((s, d) =>
      graft.plans.TopKPerGroup.topOrdersPerCustomer(s, d)
        .orderBy("custkey", "orderkey"), Some(
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        | o_totalprice AS totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY custkey, orderkey""".stripMargin)),

    // GLPR backfill ("catch up then stop"): the staged shards drained
    // via Trigger.AvailableNow under maxShardsPerTrigger admission
    // control (SupportsTriggerAvailableNow) — the listing snapshotted up
    // front, the backlog consumed in ceil(N/limit) BOUNDED micro-batches
    // (never the whole corpus in one, the round-14 scale hole), the
    // query self-terminating; settles to the identical batch oracle.
    // The trigger-count contract itself is pinned in GlprSpec.
    "q288_glpr_backfill" -> Entry((s, d) =>
      graft.io.GlprSource.backfillLangProfile(s, d).orderBy("lang"), Some(
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Statistics-driven planning: the GLPR scan reports real commit-time
    // sidecar stats (SupportsReportStatistics), so Catalyst sees the
    // ~500-row dimension's true size and auto-broadcasts it against the
    // lineitem facts with NO hint — a stat-less DSv2 relation reports
    // defaultSizeInBytes (effectively infinite) and would shuffle both
    // sides forever. BroadcastHashJoin plan-asserted in GlprSpec.
    "q289_glpr_stats_join" -> Entry((s, d) => {
      val dim = graft.io.GlprSource.documentsVia(s, d)
        .select(col("doc_id"), col("lang"))
      val facts = Tables(s, d, "lineitem")
        .select((col("l_partkey") % 500).cast("long").as("k"))
      facts.join(dim, col("k") === col("doc_id"))
        .groupBy("lang").agg(count(lit(1)).as("n_items"))
        .orderBy("lang")
    }, Some(
      """SELECT d.lang, CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l JOIN documents d ON l.l_partkey % 500 = d.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Runtime (DPP-style) shard pruning on the DSv2 connector: GLPR
    // facts x selectively-filtered broadcast dim on doc_id — the dim
    // filter (s_nationkey) is opaque to static pushdown, so only the
    // materialized broadcast key set handed to GlprScan.filter
    // (SupportsRuntimeFiltering) can skip shards; the range-disjoint
    // staging makes sidecar bounds tight. Shard-skip + equality pinned
    // in GlprSpec.
    "q295_glpr_runtime_prune" -> Entry((s, d) =>
      graft.io.GlprSource.runtimePrunedDimJoin(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents d JOIN supplier s ON d.doc_id = s.s_suppkey
        |WHERE s.s_nationkey = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Metadata-only aggregate pushdown on the DSv2 connector
    // (SupportsPushDownAggregates, COMPLETE): ungrouped count/min/max
    // over GLPR answered from commit-time sidecars — zero shards
    // planned, no aggregate exec in the plan (the parquet row-group
    // statistics trick). Zero-shards + decline paths pinned in GlprSpec.
    "q296_glpr_agg_pushdown" -> Entry((s, d) =>
      graft.io.GlprSource.documentsVia(s, d)
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id")), Some(
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_id,
        | max(doc_id) AS max_id FROM documents""".stripMargin)),

    // Limit pushdown on the DSv2 connector (SupportsPushDownLimit,
    // partial): the reader stops decoding at the cap and — with no
    // filters in play — planInputPartitions opens only the shards whose
    // sidecar row counts cover the limit (LIMIT 10 on a million-shard
    // corpus opens one file). The count over the limited subquery is
    // the deterministic contract; shard-cap + filter-decline pinned in
    // GlprSpec.
    "q297_glpr_limit_pushdown" -> Entry((s, d) =>
      graft.io.GlprSource.documentsVia(s, d).limit(100)
        .agg(count(lit(1)).as("n_rows")), Some(
      """SELECT CAST(count(*) AS BIGINT) AS n_rows
        |FROM (SELECT * FROM documents LIMIT 100)""".stripMargin)),

    // DSv2 TableCatalog SQL front door (graft.io.GlprCatalog): CREATE
    // TABLE -> INSERT INTO ... SELECT -> SELECT aggregate, all through
    // catalog identifiers (glpr_cat.corpus.docs) with zero DataFrame-API
    // reads/writes — the SQL-only-consumer contract. DDL lifecycle
    // (create/list/drop/rename/alter, identifier hygiene, schema gate)
    // pinned in GlprCatalogSpec.
    "q298_glpr_catalog_sql" -> Entry((s, d) =>
      graft.io.GlprSource.catalogSqlPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // GLPR-to-GLPR streaming relay: custom SOURCE (admission-controlled)
    // -> in-flight filter -> custom streaming SINK (epoch-idempotent
    // shards) under AvailableNow, read back through the batch scan —
    // the full connector loop in one streaming query. Epoch naming +
    // replay-idempotency pinned in GlprSpec.
    "q300_glpr_stream_relay" -> Entry((s, d) =>
      graft.io.GlprSource.streamRelayPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE strlen(text) >= 50
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ingest front-door capstone: GLPR shards streamed under
    // maxShardsPerTrigger admission control (MULTIPLE micro-batches —
    // the cross-batch case q268's single-batch file source can't reach)
    // through a foreachBatch keep-first dedup MERGE (min-keeper /
    // sum-count folds: associative, so any batch partitioning compacts
    // to the same state), batchId-pointer replay no-op, atomic snapshot
    // publish; read-back hash-matches the one-shot batch dedup oracle.
    // Cross-batch keeper/count split pinned in GlprSpec.
    "q292_glpr_ingest_merge" -> Entry((s, d) =>
      graft.io.GlprSource.ingestDedupMerge(s, d).orderBy("content_hash"), Some(
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
        | CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Prefix-filtered set-similarity join (ppjoin family): all pairs
    // sharing >= 30 distinct tokens, EXACT output via LOSSLESS prefix
    // pruning — rarest-(df)-first global token order; if |A∩B| >= c the
    // first |A|-c+1 tokens of each side must intersect, so the prefix
    // equi-join generates every qualifying pair (438 candidates vs
    // 124,745 all-pairs token-join pairs at sf0.01, zero missed). The
    // oracle IS the unfiltered exact join — hash equality certifies the
    // pruning lossless. Third candidate-generation family beside
    // MinHash-LSH (probabilistic) and inverted-index df-prune.
    "q290_prefix_filter_join" -> Entry((s, d) =>
      Dedup.prefixFilterOverlapJoin(docsSpread(s, d)).orderBy("da", "db"), Some(
      """WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents)
        |SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS overlap
        |FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 30 ORDER BY 1, 2""".stripMargin)),

    // KMV (bottom-k) distinct-count sketch as a native Catalyst
    // TypedImperativeAggregate (graft.functions.KmvSketch) — the
    // mergeable-aggregate slot of the custom-Catalyst surface. The
    // sketch itself (k smallest distinct md5 values per lang) is
    // hash-checked against DuckDB's list_sort(list(DISTINCT md5))[1:k]
    // — cross-engine certification of the sketch CONTENTS, not just an
    // estimate envelope. est_distinct derives from the k-th hash's 13
    // leading hex digits (52 bits: exactly double-representable, so
    // both engines compute bit-identical estimates).
    "q293_kmv_sketch" -> Entry((s, d) => {
      val k = 16
      val sk = docs(s, d).groupBy(col("lang"))
        .agg(graft.functions.KmvSketch.kmv(col("text"), k).as("ks"))
      sk.select(col("lang"), col("ks"),
          posexplode(col("ks")).as(Seq("pos", "kmv_hash")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
          col("kmv_hash"),
          coalesce(round(
            lit((k - 1).toDouble) /
              (conv(substring(get(col("ks"), lit(k - 1)), 1, 13), 16, 10)
                .cast("long").cast("double") / lit(4503599627370496.0)), 6),
            lit(-1.0)).as("est_distinct"))
        .orderBy("lang", "rank")
    }, Some(
      """WITH s AS (SELECT lang, list_sort(list(DISTINCT md5(text)))[1:16] AS ks
        |  FROM documents GROUP BY 1)
        |SELECT lang, CAST(r AS INT) AS rank, ks[CAST(r AS INT)] AS kmv_hash,
        |  COALESCE(ROUND(CAST(15 AS DOUBLE) /
        |    (CAST(CONCAT('0x', substr(ks[16], 1, 13)) AS UBIGINT) /
        |     CAST(4503599627370496 AS DOUBLE)), 6), CAST(-1 AS DOUBLE)) AS est_distinct
        |FROM s, range(1, 17) u(r) WHERE CAST(r AS INT) <= len(ks)
        |ORDER BY lang, rank""".stripMargin)),

    // KMV SET ALGEBRA over the q293 sketch: mergeable distinct sketches
    // are the 100 TB way to ask "how much do two corpora overlap" —
    // bottom-k sketches of the even/odd doc slices OR-merge into the
    // union sketch (bottom-k of the concatenation), and
    // inclusion-exclusion turns three O(k) estimates into intersection
    // and Jaccard, never materializing a join. Every value is a
    // deterministic function of md5 order statistics, so the DuckDB twin
    // reproduces the doubles bit-for-bit (same rounding sequence).
    "q321_kmv_set_algebra" -> Entry((s, d) => {
      val k = 16
      def est(ks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(size(ks) < k, lit(-1.0)).otherwise(round(
          lit((k - 1).toDouble) /
            (conv(substring(element_at(ks, k), 1, 13), 16, 10)
              .cast("long").cast("double") / lit(4503599627370496.0)), 6))
      val a = docs(s, d).filter(col("doc_id") % 2 === 0)
        .agg(graft.functions.KmvSketch.kmv(col("text"), k).as("ka"))
      val b = docs(s, d).filter(col("doc_id") % 2 === 1)
        .agg(graft.functions.KmvSketch.kmv(col("text"), k).as("kb"))
      a.crossJoin(broadcast(b)) // two 1-row sketch frames
        .withColumn("ku", slice(array_sort(array_distinct(
          concat(col("ka"), col("kb")))), 1, k))
        .select(est(col("ka")).as("est_a"), est(col("kb")).as("est_b"),
          est(col("ku")).as("est_union"))
        .withColumn("est_inter",
          when(col("est_a") === -1.0 || col("est_b") === -1.0 ||
            col("est_union") === -1.0, lit(-1.0))
            .otherwise(round(col("est_a") + col("est_b") - col("est_union"), 6)))
        // gate on the COMPONENT sentinels, exactly like the oracle's
        // CASE arms: an inclusion-exclusion estimate that legitimately
        // rounds to -1.000000 must not trip the undersized-sketch path
        // (round-16 ADVICE)
        .withColumn("jaccard",
          when(col("est_a") === -1.0 || col("est_b") === -1.0 ||
            col("est_union") === -1.0, lit(-1.0))
            .otherwise(round(col("est_inter") / col("est_union"), 6)))
    }, Some(
      """WITH a AS (SELECT list_sort(list(DISTINCT md5(text)))[1:16] AS ks
        |  FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT list_sort(list(DISTINCT md5(text)))[1:16] AS ks
        |  FROM documents WHERE doc_id % 2 = 1),
        |u AS (SELECT list_sort(list_distinct(list_concat(a.ks, b.ks)))[1:16] AS ks
        |  FROM a, b),
        |e AS (SELECT
        |  CASE WHEN len(a.ks) < 16 THEN CAST(-1 AS DOUBLE) ELSE ROUND(CAST(15 AS DOUBLE) /
        |    (CAST(CONCAT('0x', substr(a.ks[16], 1, 13)) AS UBIGINT) /
        |     CAST(4503599627370496 AS DOUBLE)), 6) END AS est_a,
        |  CASE WHEN len(b.ks) < 16 THEN CAST(-1 AS DOUBLE) ELSE ROUND(CAST(15 AS DOUBLE) /
        |    (CAST(CONCAT('0x', substr(b.ks[16], 1, 13)) AS UBIGINT) /
        |     CAST(4503599627370496 AS DOUBLE)), 6) END AS est_b,
        |  CASE WHEN len(u.ks) < 16 THEN CAST(-1 AS DOUBLE) ELSE ROUND(CAST(15 AS DOUBLE) /
        |    (CAST(CONCAT('0x', substr(u.ks[16], 1, 13)) AS UBIGINT) /
        |     CAST(4503599627370496 AS DOUBLE)), 6) END AS est_union
        |  FROM a, b, u)
        |SELECT est_a, est_b, est_union,
        |  CASE WHEN est_a = -1 OR est_b = -1 OR est_union = -1 THEN CAST(-1 AS DOUBLE)
        |    ELSE ROUND(est_a + est_b - est_union, 6) END AS est_inter,
        |  CASE WHEN est_a = -1 OR est_b = -1 OR est_union = -1 THEN CAST(-1 AS DOUBLE)
        |    ELSE ROUND(ROUND(est_a + est_b - est_union, 6) / est_union, 6) END AS jaccard
        |FROM e""".stripMargin)),

    // The custom TopKPerGroupExec on the TEXT path: top-5 tokens per
    // language from an exploded token count agg — the operator's
    // required clustered distribution re-keys (lang, token) -> (lang)
    // with one exchange and bounded heaps replace a full per-lang
    // vocabulary Sort+Window. Oracle runs the row_number spelling.
    "q291_topk_tokens" -> Entry((s, d) =>
      graft.plans.TopKPerGroup.topTokensPerLang(s, d)
        .orderBy("lang", "token"), Some(
      """WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |n AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |   ORDER BY n DESC, token) AS rn FROM n)
        |SELECT lang, token, n FROM r WHERE rn <= 5 ORDER BY lang, token""".stripMargin)),

    // METADATA-ONLY DELETE through the catalog SQL front door: the
    // corpus INSERTed slice-clustered (fixed id cuts 100/300, so each
    // range is one shard with tight sidecar bounds), DELETE WHERE
    // doc_id < 100 executed as whole-shard unlinks (zero bytes
    // rewritten), survivors aggregated back. Oracle = the same rollup
    // over documents WHERE doc_id >= 100; the straddling-decline side
    // is GlprCatalogSpec-pinned.
    "q301_glpr_delete" -> Entry((s, d) =>
      graft.io.GlprSource.deleteSqlPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id >= 100
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // INSERT OVERWRITE through the catalog SQL front door
    // (SupportsTruncate: truncate-then-append): full corpus INSERTed,
    // then OVERWRITTEN by its de/zh subset, then aggregated. Oracle
    // aggregates only the subset — a surviving pre-overwrite row (append
    // masquerading as overwrite) or a lost subset row breaks the hash.
    "q302_glpr_overwrite" -> Entry((s, d) =>
      graft.io.GlprSource.overwriteSqlPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE lang IN ('de', 'zh')
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // _shard provenance metadata column: the slice-clustered corpus read
    // back with _shard and rolled up BY SHARD FILE (the quarantine /
    // re-crawl inventory), shard names dropped after grouping. Because
    // each fixed id slice is exactly one shard, the oracle is the same
    // rollup grouped by the slice expression — agreement certifies that
    // _shard really partitions records by their file.
    "q303_glpr_shard_provenance" -> Entry((s, d) =>
      graft.io.GlprSource.shardProvenanceRollup(s, d).orderBy("min_id"), Some(
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents
        |GROUP BY (CASE WHEN doc_id < 100 THEN 0 WHEN doc_id < 300 THEN 1 ELSE 2 END)
        |ORDER BY min_id""".stripMargin)),

    // Partitioned catalog tables: CREATE TABLE ... PARTITIONED BY
    // (lang) through the SQL front door (identity transform), the
    // INSERT clustered by lang via the write's required distribution,
    // per-shard partition-value sets committed in the sidecars, and the
    // WHERE lang='en' read pruning non-en shards from the plan (shard
    // skip pinned in GlprCatalogSpec). Oracle certifies the residual
    // row filter above the pruned scan.
    "q304_glpr_partitioned" -> Entry((s, d) =>
      graft.io.GlprSource.partitionedCatalogPipeline(s, d).orderBy("source"), Some(
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE lang = 'en'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Shard-pruned STREAMING: the range-disjoint staged corpus consumed
    // as a stream with an OPTION-seeded doc_id bound (maxDocId — the
    // Kafka startingOffsets idiom; streaming scans never run Catalyst
    // pushdown), so every micro-batch plans only the shards whose
    // sidecar bounds intersect the range — the streaming twin of q295's
    // batch pruning (backfilling one id slice reads the slice, not the
    // corpus). Shard-skip pinned in GlprSpec; settles to the identical
    // filtered batch oracle.
    "q305_glpr_stream_pruned" -> Entry((s, d) =>
      graft.io.GlprSource.streamedPrunedProfile(s, d).orderBy("lang"), Some(
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 250
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // GROUPED metadata-only aggregate on the partitioned table:
    // count(*) GROUP BY lang answered entirely from the sidecars'
    // (rows, partition-value) pairs — the hive-metastore partition-
    // count trick, sound because clustered partitioned writes leave
    // every shard single-valued in lang (certified per shard by its
    // sidecar value set; multi-valued shards decline to the ordinary
    // plan). Zero-shards pin in GlprCatalogSpec.
    "q306_glpr_partitioned_count" -> Entry((s, d) =>
      graft.io.GlprSource.partitionedMetadataCount(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // BLOOM runtime pruning on an UNCLUSTERED corpus: q295's broadcast
    // dim join, but over hash-distributed staging where every shard's
    // id bounds span the corpus — min/max is blind, and any shard skip
    // is attributable to the commit-time sidecar doc_id blooms alone
    // (the Delta/parquet bloom-index trick). Bloom-skip + stripped-
    // bloom decline pinned in GlprSpec; oracle = plain parquet join.
    "q307_glpr_bloom_prune" -> Entry((s, d) =>
      graft.io.GlprSource.bloomPrunedDimJoin(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents d JOIN supplier s ON d.doc_id = s.s_suppkey
        |WHERE s.s_nationkey = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // PARTITION-VALUE metadata DELETE: on a fresh PARTITIONED BY (lang)
    // table, DELETE WHERE lang IN ('de','zh') accepted because every
    // lang-clustered shard's sidecar value set falls entirely inside or
    // outside the wanted set — dropping partitions is unlinking their
    // shards (zero bytes rewritten), the first DELETE a partitioned-
    // table user runs. Mixed-predicate / straddling declines pinned in
    // GlprCatalogSpec; oracle = the complement rollup.
    "q308_glpr_partition_delete" -> Entry((s, d) =>
      graft.io.GlprSource.partitionDeletePipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE lang NOT IN ('de', 'zh')
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Shard COMPACTION (OPTIMIZE, the small-files maintenance rung):
    // the corpus written as 16 deliberately-small shards, merged by
    // byte CONCATENATION (the record stream is self-delimiting — no
    // decode, no Spark job) with sidecars merged from sidecars (rows/
    // bytes sum, bounds min/max, pvals union, blooms folded to the
    // smallest size and OR'd — membership-exact), then read back and
    // aggregated. Oracle = plain documents rollup: hash equality
    // certifies every row moved exactly once. File-count collapse +
    // sidecar preservation + post-compaction pruning pinned in
    // GlprSpec.
    "q309_glpr_compact" -> Entry((s, d) =>
      graft.io.GlprMaintenance.compactionPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // COMPACTION OVER LIVE MASKS (round-18 verdict #3): id-range + value
    // MoR deletes layered onto 16 range-clustered shards, then ONE
    // compact() — masked members rewritten with their mask folded
    // in-flight, byte-concat for the rest, members retired WITH their
    // dv tokens in the same flip: the live view ends mask-free. Oracle
    // = the double-complement rollup (fold exactness + move-once).
    "q348_glpr_masked_compact" -> Entry((s, d) =>
      graft.io.GlprMaintenance.maskedCompactionPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents
        |WHERE NOT (doc_id BETWEEN 100 AND 219) AND lang <> 'de'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Z-ORDER RECLUSTER through the catalog (round-18 verdict #5):
    // CALL sys.recluster(t, 8, 'lang') rewrites a hash-scattered corpus
    // Morton-interleaved over (doc_id, lang) — each shard a compact
    // rectangle, so id bounds AND sidecar lang sets both prune (probe
    // required in-pipeline; pre/post boxes pinned in GlprCatalogSpec).
    // Oracle = the full-table rollup: the rewrite moved every row once.
    "q350_glpr_zorder_recluster" -> Entry((s, d) =>
      graft.io.GlprMaintenance.zorderReclusterPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(min(doc_id) AS BIGINT) AS min_id,
        | CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // AUTOMATIC PER-SHARD VALUE STATISTICS: every writer records its
    // shard's distinct lang/source sets (vlang/vsource sidecar tokens —
    // per-file column stats for categorical columns), so a two-source
    // probe prunes 3/4 of an UNPARTITIONED per-feed ingest (required
    // in-pipeline; legacy no-token fallback pinned in GlprCatalogSpec).
    // Oracle = the probe rollup (residual filter keeps rows exact).
    "q352_glpr_value_stats" -> Entry((s, d) =>
      graft.io.GlprSource.valueStatsPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE source IN ('src2', 'src6')
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // BUCKET-TRANSFORM STORAGE-PARTITIONED JOIN: both tables
    // PARTITIONED BY (bucket(8, doc_id)) — writer-side clustering +
    // per-value shard rolling keep every shard single-bucket — so the
    // doc_id equi-join plans ZERO join exchanges (KeyGroupedPartitioning
    // over the catalog's V2 bucket function; required in-pipeline,
    // broadcast disabled). The corpus⋈corpus join that moves no bytes
    // at 100 TB. Oracle = the relational join rollup.
    "q353_glpr_bucket_spj" -> Entry((s, d) =>
      graft.io.GlprMaintenance.bucketSpjPipeline(s, d).orderBy("lang"), Some(
      """SELECT f.lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(f.doc_id) AS BIGINT) AS id_sum
        |FROM documents f JOIN documents d ON f.doc_id = d.doc_id
        |WHERE d.doc_id % 3 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // IMMUTABLE TAGS as retention overrides (the Iceberg tag idiom):
    // tag the ingest snapshot, copy-on-write DELETE a slice, then the
    // FULL retention cycle (expire_versions(1) + vacuum) — the tagged
    // snapshot survives (expire skips tagged versions; vacuum keeps
    // their shards) and VERSION AS OF 'shipped' reads the exact
    // pre-delete corpus while main reads the post-delete one. Oracle =
    // both sides relationally; lifecycle pins in GlprCatalogSpec.
    "q354_glpr_tags" -> Entry((s, d) =>
      graft.io.GlprMaintenance.tagsPipeline(s, d).orderBy("side", "lang"), Some(
      """SELECT 'live' AS side, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents WHERE NOT (doc_id BETWEEN 100 AND 199) GROUP BY 2
        |UNION ALL
        |SELECT 'tagged', lang, CAST(count(*) AS BIGINT),
        | CAST(sum(doc_id) AS BIGINT)
        |FROM documents GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // GREEDY SEQUENCE PACKING (the T5/LLM-pipeline batching step): fill
    // fixed-budget training sequences with documents, first-fit in
    // doc_id order per language, new bin on overflow — one shuffle, one
    // local sort, one O(n) pass per group; groups pack in parallel.
    // Oracle = the SAME greedy recurrence as a DuckDB recursive CTE, so
    // hash equality certifies every bin boundary, not just totals.
    "q357_seq_packing" -> Entry((s, d) =>
      graft.llmdata.Packing.packingReport(docs(s, d), 4096L)
        .orderBy("lang", "bin"), Some(
      """WITH RECURSIVE d AS (
        |  SELECT lang, doc_id, CAST(strlen(text) AS BIGINT) AS cost,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents),
        |packed AS (
        |  SELECT lang, doc_id, cost, rn, CAST(0 AS BIGINT) AS bin, cost AS acc
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.lang, d.doc_id, d.cost, d.rn,
        |         CASE WHEN p.acc + d.cost > 4096 THEN p.bin + 1 ELSE p.bin END,
        |         CASE WHEN p.acc + d.cost > 4096 THEN d.cost ELSE p.acc + d.cost END
        |  FROM d JOIN packed p ON d.lang = p.lang AND d.rn = p.rn + 1)
        |SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(cost) AS BIGINT) AS bin_bytes,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // METADATA TABLES from plain SQL (the Iceberg db.table.history
    // idiom): SELECT version, n_rows FROM cat.ns.t.history — the sys
    // procedures' introspection served as real read-only TABLES, so it
    // composes with the rest of SQL. Oracle recomputes both snapshots'
    // cumulative counts from the data.
    "q360_glpr_metadata_tables" -> Entry((s, d) =>
      graft.io.GlprMaintenance.metadataTablesPipeline(s, d), Some(
      """SELECT CAST(1 AS BIGINT) AS version,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM documents
        |ORDER BY 1""".stripMargin)),

    // MERGE-ON-READ UPDATE (round-19 verdict #1): UPDATE priced by the
    // MATCHED rows — victims masked by fresh dv generations,
    // replacements (assignment applied) appended distributed, ONE
    // versioned commit for both (the Iceberg/Delta MoR-update shape;
    // the COW q326 rewrites every touched shard whole). Rolled up BY
    // the updated column so rows MOVE groups: a lost replacement, an
    // unmasked victim or a double-appear breaks the hash. COW-equality
    // and bytes-bounded pins in GlprDvIntegritySpec.
    "q361_glpr_mor_update" -> Entry((s, d) =>
      graft.io.GlprSource.updateMorPipeline(s, d).orderBy("lang"), Some(
      """SELECT CASE WHEN lang IN ('de', 'zh') THEN 'und' ELSE lang END
        |  AS lang,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TYPE-WIDENING ALTER COLUMN (round-19 verdict #3): narrow era
    // (INT/FLOAT extras) → widen (metadata-only: the marker token's
    // type changes, shards keep their write-time type) → wide era with
    // values only the wide types hold → ONE aggregate spanning both.
    // Readers parse each shard's decimal text to the DECLARED (widest)
    // type; the text serialization makes the promotion value-exact.
    "q362_glpr_type_widening" -> Entry((s, d) =>
      graft.io.GlprSource.typeWideningPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(score) AS BIGINT) AS score_sum,
        | CAST(sum(conf) AS DOUBLE) AS conf_sum
        |FROM (
        | SELECT lang, CAST(doc_id % 100 AS BIGINT) AS score,
        |  CAST(doc_id % 8 AS DOUBLE) / 4 AS conf FROM documents
        | UNION ALL
        | SELECT lang, doc_id + 4000000000 AS score,
        |  CAST(doc_id % 16 AS DOUBLE) / 8 AS conf
        | FROM documents WHERE doc_id < 100
        |) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ADD COLUMN ... DEFAULT (round-19 verdict #6, the Iceberg
    // INITIAL-default): a marker-stored literal served at read to every
    // shard that PREDATES the column — zero shard touches — while
    // post-evolution rows carry their own bytes and a no-default column
    // keeps the q332 null compat. Three eras, one aggregate.
    "q363_glpr_add_default" -> Entry((s, d) =>
      graft.io.GlprSource.addDefaultPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(tier) AS BIGINT) AS n_tier,
        | CAST(sum(rank) AS BIGINT) AS rank_sum
        |FROM (
        | SELECT lang, NULL AS tier, 7 AS rank FROM documents
        | UNION ALL
        | SELECT lang, 't' || CAST(doc_id % 3 AS VARCHAR), 7
        | FROM documents WHERE doc_id < 200
        | UNION ALL
        | SELECT lang, 't' || CAST(doc_id % 3 AS VARCHAR), doc_id % 5
        | FROM documents WHERE doc_id < 100
        |) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // AGE-BASED RETENTION (round-19 verdict #7): expire_versions by
    // the q335 durable commit clock ("retain 7 days"), pinned to a
    // deterministic day-apart schedule — the middle version expires,
    // the TAGGED snapshot is exempt (q354), the young head survives,
    // vacuum reclaims. Live + tagged reads certify both outcomes.
    "q364_glpr_age_retention" -> Entry((s, d) =>
      graft.io.GlprMaintenance.ageRetentionPipeline(s, d)
        .orderBy("side", "lang"), Some(
      """SELECT 'live' AS side, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (
        | SELECT lang, doc_id FROM documents
        |  WHERE doc_id NOT BETWEEN 100 AND 199
        | UNION ALL
        | SELECT lang, doc_id + 1000000 FROM documents WHERE doc_id < 50
        |) GROUP BY 2
        |UNION ALL
        |SELECT 'tagged', lang, CAST(count(*) AS BIGINT),
        | CAST(sum(doc_id) AS BIGINT)
        |FROM documents GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // WAP AUDIT-FIX-PUBLISH with a branch-scoped MoR UPDATE: the
    // staged slice's planted mislabels are fixed IN PLACE on the
    // branch (masks in the branch dv namespace + relabeled
    // replacements on the branch chain, one commit), re-audited, then
    // published — q346's loop for the far more common "fix the label,
    // keep the row". Oracle = slice 1 + the relabeled slice 2 exactly.
    "q366_glpr_branch_mor_update" -> Entry((s, d) =>
      graft.io.GlprSource.branchUpdateFixPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM (
        | SELECT lang, doc_id, text FROM documents WHERE doc_id < 100
        | UNION ALL
        | SELECT CASE WHEN doc_id % 10 = 0 THEN 'und' ELSE lang END,
        |  doc_id, text
        | FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MERGE-ON-READ MERGE (CDC-apply priced by the changeset): source
    // [100,500) upserted into target [0,300) — matched rows masked +
    // replaced (re-cased text), new keys inserted, one versioned
    // commit. Oracle recomputes the merged state: matched rows appear
    // exactly once with NEW text, kept rows once with old, inserts once.
    "q365_glpr_mor_merge" -> Entry((s, d) =>
      graft.io.GlprSource.mergeMorPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(CASE WHEN doc_id >= 100 THEN upper(text)
        |   ELSE text END)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 500
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ZERO-SHUFFLE EXACT-DEDUP AUDIT — the other half of the bucket-SPJ
    // dividend (q353): GROUP BY doc_id over a bucket-clustered corpus
    // plans NO exchange at all (the key-grouped report satisfies the
    // aggregate's clustered distribution), so the cross-ingest "which
    // ids appear twice?" audit moves zero bytes at 100 TB. Required
    // in-pipeline. Oracle = the duplicated slice relationally.
    "q358_glpr_dedup_audit" -> Entry((s, d) =>
      graft.io.GlprMaintenance.dedupAuditPipeline(s, d).orderBy("doc_id"), Some(
      """SELECT doc_id, CAST(2 AS BIGINT) AS copies FROM documents
        |WHERE doc_id % 5 = 0 ORDER BY 1""".stripMargin)),

    // SHARD INTROSPECTION (the Iceberg `files` metadata table / Delta
    // DESCRIBE DETAIL move): CALL sys.files lists every live shard's
    // sidecar statistics — zero data bytes opened; the pipeline returns
    // the METADATA-derived corpus invariants and the oracle recomputes
    // them FROM THE DATA, so hash equality certifies the statistics the
    // planner prunes/estimates with are exactly right.
    "q356_glpr_files" -> Entry((s, d) =>
      graft.io.GlprMaintenance.filesPipeline(s, d).orderBy("metric"), Some(
      """SELECT 'max_id' AS metric, CAST(max(doc_id) AS BIGINT) AS value
        |FROM documents
        |UNION ALL SELECT 'min_id', CAST(min(doc_id) AS BIGINT) FROM documents
        |UNION ALL SELECT 'n_rows', CAST(count(*) AS BIGINT) FROM documents
        |ORDER BY 1""".stripMargin)),

    // CHECK CONSTRAINTS (the Delta ALTER TABLE ADD CONSTRAINT idea):
    // a SQL boolean stored in the table marker, compiled once per write
    // job and evaluated per row in the writer — a violating row fails
    // its task before any bytes land, so a refused write lands NOTHING
    // (required in-pipeline). add_constraint audits existing data first.
    // Oracle = the plain corpus rollup: a gate admitting clean data is
    // invisible in the result.
    "q355_glpr_constraints" -> Entry((s, d) =>
      graft.io.GlprMaintenance.constraintsPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ZERO-COPY CLONE (the Delta shallow-clone move): live shards +
    // sidecars + dv masks HARD-LINKED into the destination, fresh
    // manifest v1 from the live lines — O(shards) metadata, zero data
    // I/O; the tables then diverge independently over shared immutable
    // bytes (a MoR delete in the clone only). Oracle = both sides'
    // rollups; inode sharing/vacuum independence in GlprCatalogSpec.
    "q351_glpr_clone" -> Entry((s, d) =>
      graft.io.GlprMaintenance.clonePipeline(s, d).orderBy("side", "lang"), Some(
      """WITH src AS (SELECT lang, doc_id FROM documents
        | WHERE NOT (doc_id BETWEEN 40 AND 49))
        |SELECT 'src' AS side, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM src GROUP BY 2
        |UNION ALL
        |SELECT 'clone', lang, CAST(count(*) AS BIGINT),
        | CAST(sum(doc_id) AS BIGINT)
        |FROM src WHERE lang <> 'de' GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // MANIFEST commit-point visibility: the corpus written through the
    // job-committed path (the _manifest shard log — job-level atomic
    // visibility + O(1) listing for million-shard dirs), then a crashed
    // foreign job simulated: its task renamed a shard in but the job
    // never reached the manifest commit. The orphan is on disk and
    // INVISIBLE; the aggregate hash-matches the corpus oracle without
    // it. rebuildManifest recovery pinned in GlprSpec.
    "q310_glpr_manifest" -> Entry((s, d) =>
      graft.io.GlprSource.manifestVisibilityPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | min(doc_id) AS min_id,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TIME TRAVEL (VERSION AS OF): every manifest commit snapshots
    // `_manifest.v<n>`; the corpus staged in three successive appends
    // (doc_id slices <100, [100,300), >=300 — appends take fresh,
    // strictly increasing shard names), then read pinned to VERSION 2.
    // The oracle sees only the first two appends: rows landed later are
    // invisible to the historical read. SQL `VERSION AS OF`, loud
    // unknown-version/unlinked-shard/streaming rejections pinned in
    // GlprSpec/GlprCatalogSpec.
    "q311_glpr_time_travel" -> Entry((s, d) =>
      graft.io.GlprSource.timeTravelPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(max(doc_id) AS BIGINT) AS max_id,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // INCREMENTAL READ (append-only CDF): changesFromVersion=1 +
    // versionAsOf=2 over the q311 staging plans ONLY the second
    // append's shards — "what landed since my last sync" costs the new
    // shards' bytes, never a corpus rescan. The oracle is the documents
    // slice [100, 300): a hash match proves no old row leaks in and no
    // new row is missed. Non-append histories refuse loudly
    // (GlprSpec-pinned).
    "q312_glpr_changes" -> Entry((s, d) =>
      graft.io.GlprSource.changesPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(min(doc_id) AS BIGINT) AS min_id,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // RESTORE TO VERSION (rollback): three appends, then
    // restoreToVersion(2) re-points the LIVE manifest at the first two —
    // the third append's rows drop out of the live view (oracle:
    // doc_id < 300) while staying readable through version 3. The
    // restore mints a new version; history never rewrites
    // (GlprSpec-pinned).
    "q313_glpr_restore" -> Entry((s, d) =>
      graft.io.GlprSource.restorePipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(min(doc_id) AS BIGINT) AS min_id
        |FROM documents WHERE doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // COPY-ON-WRITE row-level DELETE: the corpus staged HASH-partitioned
    // (every shard straddles everything — the layout where the
    // metadata-only SQL DELETE refuses), then deleteIdRange(100, 299)
    // rewrites survivors under fresh names behind one atomic manifest
    // commit. Oracle: documents with the range cut out — row-exact
    // deletion through the rewrite path.
    "q314_glpr_row_delete" -> Entry((s, d) =>
      graft.io.GlprMaintenance.rowDeletePipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(max(doc_id) AS BIGINT) AS max_id,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 100 OR doc_id > 299
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DSv2 FunctionCatalog: connector-shipped SQL functions under the
    // reserved sys namespace — the MAGIC_METHOD scalar nfc_bytes
    // (codegen'd Invoke) and the V2 aggregate bytes_sum (map-side
    // partials via V2Aggregator), called by catalog-qualified name from
    // plain SQL. The oracle recomputes with DuckDB's own nfc_normalize:
    // cross-engine agreement certifies semantics AND wiring.
    "q315_glpr_sql_functions" -> Entry((s, d) =>
      graft.io.GlprSource.functionCatalogPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang,
        | CAST(sum(strlen(nfc_normalize(text))) AS BIGINT) AS nfc_bytes,
        | CAST(sum(strlen(text)) AS BIGINT) AS raw_bytes,
        | CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ProcedureCatalog, introspection half: CALL sys.history('ns.table')
    // = DESCRIBE HISTORY. One row per manifest version with the
    // CUMULATIVE row count a versionAsOf read of it returns; the oracle
    // derives the version rows from the NONEMPTY slices (empty slices
    // mint no version — the pipeline skips them; round-16 ADVICE), so
    // the entry stays oracle-deterministic at degenerate SFs. Agreement
    // certifies exactly-one-version-per-commit and correct snapshots.
    "q316_glpr_history" -> Entry((s, d) =>
      graft.io.GlprSource.historyPipeline(s, d).orderBy("version"), Some(
      """WITH s AS (
        | SELECT 1 AS slice,
        |  (SELECT count(*) FROM documents WHERE doc_id < 100) AS inc,
        |  (SELECT count(*) FROM documents WHERE doc_id < 100) AS cum
        | UNION ALL SELECT 2,
        |  (SELECT count(*) FROM documents WHERE doc_id >= 100 AND doc_id < 300),
        |  (SELECT count(*) FROM documents WHERE doc_id < 300)
        | UNION ALL SELECT 3,
        |  (SELECT count(*) FROM documents WHERE doc_id >= 300),
        |  (SELECT count(*) FROM documents)
        |)
        |SELECT CAST(row_number() OVER (ORDER BY slice) AS BIGINT) AS version,
        |  CAST(cum AS BIGINT) AS n_rows
        |FROM s WHERE inc > 0 ORDER BY 1""".stripMargin)),

    // ProcedureCatalog, maintenance half: CALL restore(2) -> compact ->
    // vacuum through plain SQL, then the live rollup. Oracle = documents
    // WHERE doc_id < 300: restore dropped exactly the third slice and
    // compaction moved every surviving row exactly once.
    "q317_glpr_sql_maintenance" -> Entry((s, d) =>
      graft.io.GlprSource.maintenanceSqlPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents WHERE doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MERGE-ON-READ delete vectors: the other half of the delete ladder
    // (q314 = copy-on-write). DELETE writes one tiny .dv sidecar per
    // affected shard — zero data bytes moved — and every reader applies
    // the mask at its id gate; metadata paths that would lie decline.
    // Oracle = the complement rollup through the masked read.
    "q322_glpr_dv_delete" -> Entry((s, d) =>
      graft.io.GlprMaintenance.dvDeletePipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents WHERE doc_id < 150 OR doc_id > 349
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DV materialization: rewrite the masked shards through the standard
    // reader (mask applied), fresh names behind ONE manifest flip,
    // vectors unlinked — reads unchanged, metadata paths and time travel
    // re-armed. Oracle = the same complement through the materialized
    // corpus.
    "q323_glpr_dv_materialize" -> Entry((s, d) =>
      graft.io.GlprMaintenance.dvMaterializePipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(min(doc_id) AS BIGINT) AS min_id,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 150 OR doc_id > 349
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // COPY-ON-WRITE row-level UPDATE (redaction): every shard holding a
    // blocklist hit is rewritten with the patterns replaced by the mask
    // token — PII removal FROM STORAGE, not a read-time filter;
    // untouched shards detected and kept without a write. Oracle runs
    // the same replace chain over the original documents: byte sums
    // certify the storage holds exactly the redacted bytes.
    "q324_glpr_redact" -> Entry((s, d) =>
      graft.io.GlprMaintenance.redactionPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(
        |   replace(replace(replace(replace(replace(text,
        |     'customer query', '[REDACTED]'),
        |     'merge batch', '[REDACTED]'),
        |     'slow fast', '[REDACTED]'),
        |     'spark', '[REDACTED]'),
        |     'table table', '[REDACTED]'))) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DYNAMIC PARTITION OVERWRITE: INSERT OVERWRITE under
    // partitionOverwriteMode=dynamic replaces ONLY the partitions
    // present in the incoming data, behind one atomic manifest flip —
    // the per-partition commit the round-15 doc said the format lacked.
    // Oracle applies the same per-partition replacement relationally.
    "q325_glpr_dynamic_overwrite" -> Entry((s, d) =>
      graft.io.GlprSource.dynamicOverwritePipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM documents
        |WHERE lang NOT IN ('de', 'zh') OR doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // FULL CHANGE DATA CAPTURE across a DELETE (round-17 retention):
    // changeMode=cdf plans BOTH sides of the manifest diff — the
    // retired slice shards as _change_type='delete' rows (readable
    // because DELETE retires instead of unlinking) and the re-appended
    // slice as 'insert' rows. Oracle derives the identical change set
    // relationally, gated on the same all-slices-nonempty condition the
    // staging mutates under.
    "q328_glpr_cdf" -> Entry((s, d) =>
      graft.io.GlprSource.cdfPipeline(s, d).orderBy("_change_type", "lang"), Some(
      """WITH f AS (SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id < 100) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 100 AND doc_id < 300) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 300) AS ok)
        |SELECT * FROM (
        | SELECT 'delete' AS _change_type, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        | FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |  AND (SELECT ok FROM f) > 0 GROUP BY 2
        | UNION ALL
        | SELECT 'insert', lang, CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT)
        | FROM documents WHERE doc_id < 100
        |  AND (SELECT ok FROM f) > 0 GROUP BY 2
        |) ORDER BY 1, 2""".stripMargin)),

    // TIME TRAVEL ACROSS A DELETE (round-17 retention): the pre-delete
    // version still reads the FULL corpus — the DELETE retired its
    // shards for the versions that own them instead of unlinking.
    // Oracle = the plain full rollup.
    "q329_glpr_tt_across_delete" -> Entry((s, d) =>
      graft.io.GlprSource.timeTravelAcrossDeletePipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(max(doc_id) AS BIGINT) AS max_id,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SCHEMA EVOLUTION: ALTER TABLE ADD COLUMN note STRING, then an
    // aggregate across MIXED shards — pre-evolution shards surface the
    // column as NULL (default-null read compat via the sidecar cols=
    // channel), post-evolution shards carry values. Oracle rebuilds the
    // mixed table relationally.
    "q332_glpr_add_column" -> Entry((s, d) =>
      graft.io.GlprSource.addColumnPipeline(s, d).orderBy("lang"), Some(
      """WITH t AS (
        | SELECT lang, CAST(NULL AS VARCHAR) AS note, text FROM documents
        | UNION ALL
        | SELECT lang, concat('tag-', source), text FROM documents
        | WHERE doc_id < 100)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(note) AS BIGINT) AS n_notes,
        | CAST(sum(strlen(coalesce(note, ''))) AS BIGINT) AS note_bytes,
        | CAST(sum(strlen(text)) AS BIGINT) AS text_bytes
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TYPED SCHEMA EVOLUTION + METADATA-ONLY RENAME (round-17 verdict
    // #2): ADD COLUMN n_tokens BIGINT / score DOUBLE, a typed slice
    // INSERTed, then RENAME COLUMN n_tokens TO tok_count — zero shard
    // touches (the marker re-labels; sidecars keep the immutable
    // physical name). Aggregates read the mixed layout under the
    // renamed name: typed NULLs from pre-evolution shards, parsed
    // BIGINT/DOUBLE from evolved ones (string byte layout, toString
    // round-trip). Oracle rebuilds the mixed typed table relationally.
    "q339_glpr_typed_evolution" -> Entry((s, d) =>
      graft.io.GlprSource.typedEvolutionPipeline(s, d).orderBy("lang"), Some(
      """WITH t AS (
        | SELECT lang, CAST(NULL AS BIGINT) AS tok_count,
        |   CAST(NULL AS DOUBLE) AS score FROM documents
        | UNION ALL
        | SELECT lang, CAST(strlen(text) AS BIGINT),
        |   CAST(doc_id + 1000000 AS DOUBLE) / 4.0 FROM documents
        | WHERE doc_id < 100)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(tok_count) AS BIGINT) AS n_typed,
        | coalesce(CAST(sum(tok_count) AS BIGINT), 0) AS tok_sum,
        | coalesce(round(sum(score), 6), CAST(0.0 AS DOUBLE)) AS score_sum
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DROP COLUMN as a metadata tombstone (round-18 verdict #2): the
    // extra's marker token leaves, its physical name burns (re-add
    // rejected — asserted in-pipeline), scans exclude it on MIXED
    // shards (carrying shards byte-skip via their sidecar layout), the
    // surviving extra keeps reading, post-drop inserts carry the
    // narrowed schema. Oracle rebuilds the three-era table.
    "q347_glpr_drop_column" -> Entry((s, d) =>
      graft.io.GlprSource.dropColumnPipeline(s, d).orderBy("lang"), Some(
      """WITH t AS (
        | SELECT lang, CAST(NULL AS BIGINT) AS keep FROM documents
        | UNION ALL
        | SELECT lang, CAST(strlen(text) AS BIGINT) FROM documents
        | WHERE doc_id < 100
        | UNION ALL
        | SELECT lang, CAST(doc_id AS BIGINT) FROM documents
        | WHERE doc_id >= 100 AND doc_id < 200)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(keep) AS BIGINT) AS n_keep,
        | coalesce(CAST(sum(keep) AS BIGINT), 0) AS keep_sum
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SIDECAR STATS → broadcast decision (round-17 verdict #3):
    // column stats (doc_id min/max/NDV, avg lengths) surface as
    // Catalyst attributeStats AND the scan's sizeInBytes/numRows are
    // PUSHDOWN-AWARE (per-shard bounds-overlap scaling + static-prune
    // drops), so the selective range probe estimates ~50 rows and the
    // corpus⋈events join plans as BHJ at every SF (asserted
    // in-pipeline; estimates + no-broadcast control pinned in
    // GlprSpec). Oracle certifies the join result.
    "q340_glpr_cbo_stats_join" -> Entry((s, d) =>
      graft.io.GlprSource.cboStatsJoinPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents d JOIN events e ON d.doc_id = e.user_id
        |WHERE d.doc_id < 50
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DATE PARTITIONING: days(ts) over an ISO string column — a
    // two-day window read prunes to the window's shards via sidecar
    // day sets (plan pin in GlprCatalogSpec). Oracle derives the same
    // deterministic days.
    "q333_glpr_days_partition" -> Entry((s, d) =>
      graft.io.GlprSource.daysPartitionPipeline(s, d).orderBy("day", "lang"), Some(
      """WITH t AS (SELECT lang, doc_id,
        |  strftime(DATE '2024-01-01' + to_days(CAST(doc_id % 7 AS INT)),
        |    '%Y-%m-%d') AS day
        | FROM documents)
        |SELECT day, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM t WHERE day IN ('2024-01-03', '2024-01-04')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // MONTH PARTITIONING: months(ts) — the same prefix-transform
    // sidecar channel as q333's days (first 7 ISO chars); a one-month
    // window read prunes to the month's shards (pin in
    // GlprCatalogSpec). Oracle derives the same deterministic months.
    "q341_glpr_months_partition" -> Entry((s, d) =>
      graft.io.GlprSource.monthsPartitionPipeline(s, d).orderBy("month", "lang"), Some(
      """WITH t AS (SELECT lang, doc_id,
        |  substr(strftime(DATE '2024-01-15' +
        |    to_days(CAST((doc_id % 4) * 20 AS INT)), '%Y-%m-%d'), 1, 7) AS month
        | FROM documents)
        |SELECT month, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM t WHERE month = '2024-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // PARTITION-SPEC EVOLUTION (round-18 verdict #4): days(ts) era 1,
    // CALL sys.set_partition_spec -> months(ts), era 2 — one straddling
    // window prunes BOTH eras (each shard prunes under its own recorded
    // spec; raw bounds truncate to each shard's prefix width). Pruning
    // required in-pipeline; per-era skip pins in GlprCatalogSpec.
    "q349_glpr_spec_evolution" -> Entry((s, d) =>
      graft.io.GlprSource.specEvolutionPipeline(s, d).orderBy("month"), Some(
      """WITH t AS (
        | SELECT doc_id,
        |  strftime(DATE '2024-01-01' + to_days(CAST(doc_id % 7 AS INT)),
        |    '%Y-%m-%d') || 'T12:00:00' AS ts
        | FROM documents WHERE doc_id < 250
        | UNION ALL
        | SELECT doc_id,
        |  strftime(DATE '2024-03-15' + to_days(CAST((doc_id % 4) * 20 AS INT)),
        |    '%Y-%m-%d') || 'T08:00:00' AS ts
        | FROM documents WHERE doc_id >= 250)
        |SELECT substr(ts, 1, 7) AS month, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM t WHERE ts >= '2024-01-03' AND ts < '2024-04-20'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TRUNCATE PARTITIONING: truncate(4, source) — a raw-column IN
    // probe relaxes to its prefix image for shard pruning ('src1'
    // covers src1/src10..19), the residual row filter keeps it exact
    // (pin in GlprCatalogSpec). Oracle is the plain probe rollup.
    "q342_glpr_truncate_partition" -> Entry((s, d) =>
      graft.io.GlprSource.truncatePartitionPipeline(s, d).orderBy("source", "lang"), Some(
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents WHERE source IN ('src7', 'src12')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // HASH-BUCKET PARTITIONING: bucket(8, doc_id) point lookups prune
    // to the probed buckets' shards on an arbitrary id layout (pin in
    // GlprCatalogSpec). Oracle is the plain point lookup.
    "q334_glpr_bucket_partition" -> Entry((s, d) =>
      graft.io.GlprSource.bucketPartitionPipeline(s, d).orderBy("doc_id"), Some(
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id IN (0, 8, 17, 42, 97) ORDER BY 1""".stripMargin)),

    // STREAMING CDF: the whole manifest history consumed as a change
    // stream — one micro-batch per version, in commit order (offsets
    // ARE the version numbers), appends/retires/dv-deltas as
    // insert/delete records, settled under Trigger.AvailableNow.
    // Oracle derives the same change totals relationally (q328's gate).
    "q337_glpr_cdf_stream" -> Entry((s, d) =>
      graft.io.GlprSource.cdfStreamPipeline(s, d).orderBy("_change_type", "lang"), Some(
      """WITH f AS (SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id < 100) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 100 AND doc_id < 300) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 300) AS ok)
        |SELECT * FROM (
        | SELECT 'insert' AS _change_type, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        | FROM (SELECT lang, doc_id FROM documents
        |       UNION ALL
        |       SELECT lang, doc_id FROM documents
        |       WHERE doc_id < 100 AND (SELECT ok FROM f) > 0)
        | GROUP BY 2
        | UNION ALL
        | SELECT 'delete', lang, CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id) AS BIGINT)
        | FROM documents
        | WHERE doc_id >= 100 AND doc_id < 300 AND (SELECT ok FROM f) > 0
        | GROUP BY 2
        |) ORDER BY 1, 2""".stripMargin)),

    // TIMESTAMP AS OF through the SQL front door: the version files'
    // mtimes are the commit clock (immutable once CAS-linked), pinned
    // to a fixed schedule so the wall-time-addressed read is
    // deterministic — the pin lands between the 2nd and 3rd commits.
    // Oracle gates like q328: the first-two-slices state when all three
    // slices are nonempty, the full state otherwise (fewer commits =
    // the pin resolves to the newest).
    "q335_glpr_timestamp_as_of" -> Entry((s, d) =>
      graft.io.GlprSource.timestampAsOfPipeline(s, d).orderBy("lang"), Some(
      """WITH f AS (SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id < 100) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 100 AND doc_id < 300) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 300) AS ok)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM documents
        |WHERE doc_id < 300 OR (SELECT ok FROM f) = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // RECLUSTER (OPTIMIZE): a hash-ingested corpus rewritten
    // range-clustered by one shuffle job behind one manifest flip —
    // bounds pruning re-arms (plan pin in GlprCatalogSpec). Oracle =
    // the range rollup: every row moved exactly once.
    "q336_glpr_recluster" -> Entry((s, d) =>
      graft.io.GlprSource.reclusterPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SQL UPDATE through SupportsRowLevelOperations: group-based
    // copy-on-write ReplaceData — scanned shards rewritten under fresh
    // names, one manifest flip. Oracle applies the same assignments
    // relationally; hash equality certifies the copied (non-matching)
    // rows of replaced shards survive and nothing double-updates.
    "q326_glpr_sql_update" -> Entry((s, d) =>
      graft.io.GlprSource.sqlUpdatePipeline(s, d).orderBy("lang", "source"), Some(
      """SELECT lang,
        | CASE WHEN doc_id < 100 THEN 'curated' ELSE source END AS source,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(strlen(CASE WHEN doc_id < 100
        |   THEN concat(text, ' [ok]') ELSE text END)) AS BIGINT) AS n_bytes
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // SQL MERGE INTO (the lakehouse upsert), one group-based COW
    // commit: matched rows [100,300) re-sourced + uppercased, rows < 50
    // re-keyed +1000000 inserted. Oracle recomputes the merged state.
    "q327_glpr_sql_merge" -> Entry((s, d) =>
      graft.io.GlprSource.sqlMergePipeline(s, d).orderBy("source", "lang"), Some(
      """SELECT * FROM (
        | SELECT CASE WHEN doc_id >= 100 AND doc_id < 300 THEN 'merged'
        |   ELSE source END AS source, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(strlen(CASE WHEN doc_id >= 100 AND doc_id < 300
        |    THEN upper(text) ELSE text END)) AS BIGINT) AS n_bytes
        | FROM documents GROUP BY 1, 2
        | UNION ALL
        | SELECT 'inserted', lang, CAST(count(*) AS BIGINT),
        |  CAST(sum(doc_id + 1000000) AS BIGINT),
        |  CAST(sum(strlen(text)) AS BIGINT)
        | FROM documents WHERE doc_id < 50 GROUP BY 2
        |) ORDER BY 1, 2""".stripMargin)),

    // CDC-APPLY as ONE SQL MERGE (round-17 verdict #1): the changelog
    // split at its temporal midpoint — the first half compacted as the
    // seeded table state (plus sentinel rows the changelog never
    // references), the second half applied by a single MERGE that
    // exercises every clause class: WHEN MATCHED + tombstone DELETE,
    // WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT, WHEN NOT MATCHED BY
    // SOURCE DELETE (sentinel purge). Latest-wins makes split-apply
    // equal whole-changelog compaction, so the SAME q207 window-rank
    // oracle certifies the statement end to end. Clause-routing pins in
    // GlprCatalogSpec.
    "q338_glpr_cdc_merge" -> Entry((s, d) =>
      graft.io.GlprSource.cdcMergeSqlPipeline(s, d).orderBy("user_id"),
      Some(cdcCompactSql)),

    // STREAMING MERGE through the SQL front door (round-17 verdict #8):
    // the q337 CDF stream (one version per micro-batch — inserts, CoW
    // remove+re-add, MoR dv-deltas) applied to a catalog target by ONE
    // SQL MERGE per batch (netted to one row per key first), the Delta
    // readChangeFeed→MERGE idiom. The drained target must equal the
    // source's live view — the batch oracle, under the q335/q337
    // empty-slice determinism gate.
    "q343_glpr_stream_merge" -> Entry((s, d) =>
      graft.io.GlprSource.streamCdfMergePipeline(s, d).orderBy("lang"), Some(
      """WITH f AS (SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id < 100) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 100 AND doc_id < 300) *
        |  (SELECT count(*) FROM documents WHERE doc_id >= 300) AS ok)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |WHERE ((doc_id >= 50 AND doc_id < 100) OR doc_id >= 300)
        |   OR (SELECT ok FROM f) = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MERGE-ON-READ PREDICATE DELETE: DELETE WHERE lang IN (...) at
    // zero data movement — one matching job, dv generations of the
    // matched ids, ONE versioned commit (the Iceberg equality-delete
    // trade as position masks; capped toward COW past 1M rows). Oracle
    // is the complement rollup — the mask must be row-exact at read.
    "q344_glpr_value_mor_delete" -> Entry((s, d) =>
      graft.io.GlprSource.valueDeleteMorPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE lang NOT IN ('de', 'zh')
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // WRITE-AUDIT-PUBLISH: a branch forked from main, a slice STAGED
    // onto it (branch writer option — invisible to main), AUDITED
    // (branch reader option), PUBLISHED in one main commit; a garbage
    // branch fails its audit, drops, and vacuums away. Oracle = the two
    // published slices exactly. Isolation/vacuum-safety pins in
    // GlprDvIntegritySpec.
    "q345_glpr_wap" -> Entry((s, d) =>
      graft.io.GlprSource.wapPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // WAP AUDIT-FIX-PUBLISH (round-18 verdict #1): garbage staged onto
    // a branch is FIXED IN PLACE by branch-scoped MoR deletes — dv
    // masks in the branch's own namespace via sys.delete_where_mor's
    // branch arg + the id-range variant — re-audited through
    // `VERSION AS OF 'fixup'`, then published (masks translated to
    // shared dv generations in the same flip). Oracle = slice 1 + the
    // fixed slice 2 exactly.
    "q346_glpr_branch_fix" -> Entry((s, d) =>
      graft.io.GlprSource.branchFixPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum,
        | CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM documents WHERE doc_id < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TIME TRAVEL OVER DELETE-VECTOR MASKS: MoR deletes are versioned
    // commits since round 17 — each affected shard's immutable .dv.<gen>
    // file rides its manifest line, so the pre-delete version reads
    // unmasked and the delete's own version applies exactly the
    // recorded generation. Oracle computes both rollups relationally.
    "q331_glpr_dv_time_travel" -> Entry((s, d) =>
      graft.io.GlprSource.dvTimeTravelPipeline(s, d).orderBy("phase", "lang"), Some(
      """SELECT 'pre' AS phase, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 2
        |UNION ALL
        |SELECT 'post', lang, CAST(count(*) AS BIGINT),
        | CAST(sum(doc_id) AS BIGINT)
        |FROM documents WHERE doc_id < 150 OR doc_id > 349 GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // RETENTION HORIZON end to end: DELETE retires, expire_versions
    // releases the old snapshots, vacuum physically reclaims — the
    // staging REQUIRES reclaim happened and the expired version turned
    // loud; the oracle certifies the live view was untouched.
    "q330_glpr_expire_vacuum" -> Entry((s, d) =>
      graft.io.GlprSource.expireVacuumPipeline(s, d).orderBy("lang"), Some(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(min(doc_id) AS BIGINT) AS min_id,
        | CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id < 100 OR doc_id >= 300
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STORAGE-PARTITIONED JOIN: two PARTITIONED BY (lang) GLPR tables
    // joined on the partition key — both scans report
    // KeyGroupedPartitioning with HasPartitionKey shard partitions, so
    // the join AND the following rollup run with ZERO exchanges
    // (broadcast disabled, v2 bucketing on). Oracle recomputes the
    // join+rollup; the no-Exchange plan pin lives in GlprCatalogSpec.
    "q319_glpr_spj" -> Entry((s, d) =>
      graft.io.GlprSource.storagePartitionedJoinPipeline(s, d).orderBy("lang"), Some(
      """SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(min(m.doc_id) AS BIGINT) AS dim_min_id
        |FROM documents d JOIN
        | (SELECT lang, min(doc_id) AS doc_id FROM documents GROUP BY lang) m
        |ON d.lang = m.lang GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Blocklist/PII screening: K patterns (tokens AND cross-token
    // phrases, incl. a self-overlap case) counted per document in ONE
    // codegen'd Aho-Corasick pass — K-independent, vs K rescans for
    // contains/regex. Greedy non-overlap = replace-counting semantics,
    // which is exactly what the DuckDB oracle computes: agreement
    // certifies the automaton end to end.
    "q320_blocklist_scan" -> Entry((s, d) =>
      graft.functions.MultiPatternCounts.blocklistScan(s, d).orderBy("pattern"), Some(
      """SELECT p.pattern,
        | CAST(count(*) FILTER (WHERE strlen(d.text) - strlen(replace(d.text, p.pattern, '')) > 0) AS BIGINT) AS n_docs_hit,
        | CAST(sum((strlen(d.text) - strlen(replace(d.text, p.pattern, ''))) // strlen(p.pattern)) AS BIGINT) AS total_hits
        |FROM documents d CROSS JOIN (VALUES ('customer query'), ('merge batch'),
        | ('slow fast'), ('spark'), ('table table')) p(pattern)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Observed pipeline metrics: a two-stage quality gate instrumented
    // with observe/Observation (CollectMetrics accumulators) — per-stage
    // rows/bytes/selectivity from the SAME pass over the data, zero
    // extra scans. The oracle recomputes all stages relationally:
    // agreement certifies the observability channel is value-exact.
    "q318_observed_metrics" -> Entry((s, d) =>
      graft.relational.Observe.observedQualityGate(s, d), Some(
      """SELECT CAST(count(*) AS BIGINT) AS n_in,
        | CAST(coalesce(sum(strlen(text)), 0) AS BIGINT) AS bytes_in,
        | CAST(count(*) FILTER (WHERE strlen(text) >= 200) AS BIGINT) AS n_out,
        | CAST(coalesce(sum(strlen(text)) FILTER (WHERE strlen(text) >= 200), 0) AS BIGINT) AS bytes_out,
        | CAST(CASE WHEN count(*) = 0 THEN 0 ELSE
        |   (count(*) FILTER (WHERE strlen(text) >= 200)) * 10000 // count(*)
        | END AS BIGINT) AS survival_bp
        |FROM documents""".stripMargin)),

    // Curation drop-waterfall: per-stage survivor counts + drop
    // attribution (exact dedup -> near-dup reps -> length gate -> token
    // floor); the capstones certify the OUTPUT, this certifies the
    // ATTRIBUTION a shrinking release gets debugged with.
    "q250_curation_waterfall" -> Entry((s, d) =>
      Curation.curationWaterfall(s, d).orderBy("stage_idx"), Some(
      """WITH RECURSIVE k1 AS (SELECT min(doc_id) AS doc_id FROM
        |  (SELECT doc_id, md5(text) AS m FROM documents) GROUP BY m),
        |d1 AS (SELECT d.* FROM documents d JOIN k1 USING (doc_id)),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM s a JOIN s b
        |  ON a.doc_id <> b.doc_id
        |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.5),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON reach.node = e.src),
        |comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
        |reps AS (SELECT min(d1.doc_id) AS doc_id FROM d1 JOIN comp USING (doc_id)
        |  GROUP BY comp.component),
        |d2 AS (SELECT d1.* FROM d1 JOIN reps USING (doc_id)),
        |d3 AS (SELECT * FROM d2 WHERE n_chars BETWEEN 100 AND 2000),
        |d4 AS (SELECT * FROM d3 WHERE len(string_split(text, ' ')) >= 20),
        |c AS (SELECT 0 AS stage_idx, 'all' AS stage, count(*) AS n FROM documents
        | UNION ALL SELECT 1, 'exact_dedup', count(*) FROM d1
        | UNION ALL SELECT 2, 'near_dedup', count(*) FROM d2
        | UNION ALL SELECT 3, 'length_gate', count(*) FROM d3
        | UNION ALL SELECT 4, 'min_tokens', count(*) FROM d4)
        |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
        | CAST(n AS BIGINT) AS n_docs,
        | CAST(coalesce(lag(n) OVER (ORDER BY stage_idx) - n, 0) AS BIGINT) AS n_dropped_here
        |FROM c ORDER BY stage_idx""".stripMargin)),

    // Content-defined chunking dedup (the rsync/restic primitive at token
    // grain): boundaries where the rolling 4-token hash = 0 mod 64
    // (codegen'd WindowHashes), chunk identity = md5 of the span, sharing
    // = one hash agg on the digest; oracle re-derives identical rolling
    // hashes (the q198 double-modulus Horner) and chunk assembly.
    "q251_content_chunks" -> Entry((s, d) =>
      Dedup.contentChunkReport(docsSpread(s, d)).orderBy("doc_id"), Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tv AS (SELECT doc_id, t,
        |   list_transform(t, tok ->
        |     CAST(list_reduce(list_prepend('0', string_split(tok, '')),
        |       (acc, c) -> CAST((CAST(acc AS BIGINT) * 31 + ascii(c)) % 1000000007 AS VARCHAR)) AS BIGINT)) AS v1,
        |   list_transform(t, tok ->
        |     CAST(list_reduce(list_prepend('0', string_split(tok, '')),
        |       (acc, c) -> CAST((CAST(acc AS BIGINT) * 131 + ascii(c)) % 998244353 AS VARCHAR)) AS BIGINT)) AS v2
        | FROM toks WHERE len(t) >= 4),
        |wh AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |   list_reduce(list_prepend(CAST(0 AS BIGINT), v1[i:i+3]),
        |     (acc, x) -> (acc * 1000003 + x) % 1000000007) * 2147483648
        | + list_reduce(list_prepend(CAST(0 AS BIGINT), v2[i:i+3]),
        |     (acc, x) -> (acc * 1000033 + x) % 998244353) AS h
        |  FROM tv, unnest(range(1, len(t) - 4 + 2)) AS u(i)),
        |b AS (SELECT doc_id, pos FROM wh WHERE h % 64 = 0 AND pos > 1),
        |tk AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[CAST(i AS INT)] AS tok
        |  FROM tv, unnest(range(1, len(t) + 1)) AS u(i)),
        |a AS (SELECT tk.doc_id, tk.pos, tk.tok,
        |  sum(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
        |    OVER (PARTITION BY tk.doc_id ORDER BY tk.pos) AS chunk_seq
        | FROM tk LEFT JOIN b ON b.doc_id = tk.doc_id AND b.pos = tk.pos),
        |ch AS (SELECT doc_id, chunk_seq, count(*) AS chunk_tokens,
        |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
        | FROM a GROUP BY 1, 2),
        |sh2 AS (SELECT chunk_md5, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
        |SELECT ch.doc_id, count(*) AS n_chunks,
        | CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
        | CAST(sum(CASE WHEN nd > 1 THEN chunk_tokens ELSE 0 END) AS BIGINT) AS shared_tokens
        |FROM ch JOIN sh2 USING (chunk_md5)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Layout bake-off: the same scale-free predicate box against the
    // 2-D Morton clustering vs a single-dimension sort — the x-sorted
    // buckets span ALL of y, so the y predicate prunes nothing there;
    // the measured gap is a layout migration's justification.
    "q252_layout_comparison" -> Entry((s, d) =>
      graft.io.ZOrder.layoutComparison(s, d).orderBy("layout"), Some(
      """WITH d AS (SELECT l_partkey AS x, l_suppkey AS y FROM lineitem),
        |e AS (SELECT max(x) AS xmax, max(y) AS ymax FROM d),
        |box AS (SELECT (xmax + 1) * 2 // 16 AS x_lo, (xmax + 1) * 5 // 16 AS x_hi,
        |  (ymax + 1) * 2 // 16 AS y_lo, (ymax + 1) * 5 // 16 AS y_hi FROM e),
        |b0 AS (SELECT x, y, (x * 16) // (xmax + 1) AS xs, (y * 16) // (ymax + 1) AS ys
        |  FROM d CROSS JOIN e),
        |b1 AS (SELECT x, y, (xs | (xs << 8)) & 16711935 AS xs, (ys | (ys << 8)) & 16711935 AS ys FROM b0),
        |b2 AS (SELECT x, y, (xs | (xs << 4)) & 252645135 AS xs, (ys | (ys << 4)) & 252645135 AS ys FROM b1),
        |b3 AS (SELECT x, y, (xs | (xs << 2)) & 858993459 AS xs, (ys | (ys << 2)) & 858993459 AS ys FROM b2),
        |b4 AS (SELECT x, y, (xs | (xs << 1)) & 1431655765 AS xs, (ys | (ys << 1)) & 1431655765 AS ys FROM b3),
        |z AS (SELECT x, y, xs | (ys << 1) AS zval FROM b4),
        |zs AS (SELECT zval // 4 AS bkt, count(*) AS n_rows,
        |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
        | FROM z GROUP BY 1),
        |xs AS (SELECT (x * 16) // (xmax + 1) AS bkt, count(*) AS n_rows,
        |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
        | FROM d CROSS JOIN e GROUP BY 1),
        |rz AS (SELECT 'zorder' AS layout, CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |  CAST(sum(CASE WHEN x_min <= x_hi AND x_max >= x_lo AND y_min <= y_hi AND y_max >= y_lo
        |       THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
        | FROM zs CROSS JOIN box),
        |rx AS (SELECT 'x_sorted', CAST(sum(n_rows) AS BIGINT),
        |  CAST(sum(CASE WHEN x_min <= x_hi AND x_max >= x_lo AND y_min <= y_hi AND y_max >= y_lo
        |       THEN n_rows ELSE 0 END) AS BIGINT)
        | FROM xs CROSS JOIN box)
        |SELECT layout, rows_total, rows_scanned,
        | round(1.0 - CAST(rows_scanned AS DOUBLE) / CAST(rows_total AS DOUBLE), 6) AS skip_ratio
        |FROM (SELECT * FROM rz UNION ALL SELECT * FROM rx)
        |ORDER BY layout""".stripMargin)),

    // File-sizing audit: hive-partitioned write under an explicit
    // maxRecordsPerFile budget, read back and audited at the FILE grain
    // (input_file_name). The writer's roll-over split is deterministic
    // (ceil(n/R) files: R-row fulls + a remainder), so DuckDB reproduces
    // the file-level audit from count(*) arithmetic alone — the oracle
    // certifies the physical layout, not just the data.
    "q253_file_sizing" -> Entry((s, d) =>
      Queries.fileSizingAudit(s, d).orderBy("ship_month", "file_seq"), Some(
      """WITH m AS (SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month, count(*) AS n
        |  FROM lineitem GROUP BY 1),
        |k AS (SELECT ship_month, n, CAST(ceil(n / 2000.0) AS BIGINT) AS nf FROM m),
        |f AS (SELECT ship_month, n, nf, unnest(range(1, nf + 1)) AS i FROM k)
        |SELECT ship_month, CAST(i AS BIGINT) AS file_seq,
        |  CAST(CASE WHEN i < nf THEN 2000 ELSE n - (nf - 1) * 2000 END AS BIGINT) AS n_rows
        |FROM f ORDER BY 1, 2""".stripMargin)),

    // Margin-based bitext mining (Artetxe & Schwenk 2019): cross-set
    // cosine grid -> bilateral k-NN neighborhood means -> ratio margin ->
    // best-margin target per source. label 0 / label 1 stand in for the
    // two languages; the blocked bipartite equi-join supplies the grid.
    "q254_bitext_margin" -> Entry((s, d) =>
      Similarity.bitextMarginMining(emb(s, d)).orderBy("src_id"), Some(
      """WITH s AS (SELECT vec_id AS src_id, embedding AS se FROM embeddings WHERE label = 0),
        |t AS (SELECT vec_id AS tgt_id, embedding AS te FROM embeddings WHERE label = 1),
        |px AS (SELECT src_id, tgt_id, CAST(unnest(se) AS DOUBLE) AS sv,
        |        CAST(unnest(te) AS DOUBLE) AS tv
        |       FROM s CROSS JOIN t),
        |dots AS (SELECT src_id, tgt_id, sum(sv * tv) AS dp,
        |          sqrt(sum(sv * sv)) AS ns, sqrt(sum(tv * tv)) AS nt
        |         FROM px GROUP BY 1, 2),
        |scored AS (SELECT src_id, tgt_id, round(dp / (ns * nt), 6) AS cosine FROM dots),
        |fr AS (SELECT src_id, cosine,
        |        row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, tgt_id) AS rn
        |       FROM scored),
        |fwd AS (SELECT src_id, CAST(sum(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS fwd_mean
        |        FROM fr WHERE rn <= 4 GROUP BY 1),
        |br AS (SELECT tgt_id, cosine,
        |        row_number() OVER (PARTITION BY tgt_id ORDER BY cosine DESC, src_id) AS rn
        |       FROM scored),
        |bwd AS (SELECT tgt_id, CAST(sum(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS bwd_mean
        |        FROM br WHERE rn <= 4 GROUP BY 1),
        |mg AS (SELECT sc.src_id, sc.tgt_id, sc.cosine,
        |        round(sc.cosine / ((fwd.fwd_mean + bwd.bwd_mean) / 2.0), 6) AS margin
        |       FROM scored sc JOIN fwd ON sc.src_id = fwd.src_id
        |         JOIN bwd ON sc.tgt_id = bwd.tgt_id),
        |rk AS (SELECT src_id, tgt_id, cosine, margin,
        |        row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rk
        |       FROM mg)
        |SELECT src_id, tgt_id, cosine, margin FROM rk
        |WHERE rk = 1 AND margin > 1.0 ORDER BY src_id""".stripMargin)),

    // ANN-backed bitext margin mining: q254's exact score grid swapped
    // for bidirectional IVF candidate neighborhoods (the production form
    // its scaladoc promises), margin arithmetic unchanged. Rows-only
    // (KMeans centroids are iterative floats); pair-agreement envelope vs
    // the exact q254 output pinned in Round14OpsSpec.
    "q269_bitext_ann" -> Entry((s, d) =>
      Similarity.bitextMarginMiningAnnOn(s, d).orderBy("src_id"), None),

    // Canonical-form dedup groups: NFC (native codegen'd expression) →
    // casefold → whitespace collapse, then md5-keyed group sizes. The
    // oracle runs DuckDB's own nfc_normalize — hash equality certifies
    // cross-engine Unicode-normalization agreement on the corpus.
    "q208_canonical_dedup" -> Entry((s, d) =>
      Dedup.canonicalDedupGroups(docs(s, d)).orderBy("doc_id"), Some(
      """WITH c AS (SELECT doc_id,
        |  md5(regexp_replace(trim(lower(nfc_normalize(text))), '\s+', ' ', 'g')) AS canon_md5
        | FROM documents),
        |g AS (SELECT canon_md5, count(*) AS group_size FROM c GROUP BY 1)
        |SELECT c.doc_id, c.canon_md5, g.group_size
        |FROM c JOIN g USING (canon_md5) ORDER BY c.doc_id""".stripMargin)),

    // Bloom-filter pre-filtered join: the fact side is pruned by a
    // broadcast word-map bloom BEFORE the join; the oracle is the PLAIN
    // join — hash equality certifies the prune is lossless (no false
    // negatives by construction).
    "q206_bloom_join" -> Entry((s, d) =>
      graft.relational.BloomPrune.segmentOrderStats(s, d).orderBy("c_custkey"), Some(
      """SELECT c_custkey, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The classifier's deterministic half, hash-certified: weak tercile
    // labels (q169's rank rule) + the md5 80/20 split — the training-set
    // construction q186 consumes, minus the solver.
    "q193_quality_labels" -> Entry((s, d) =>
      graft.ml.QualityClassifier.labeledSplits(docs(s, d)).orderBy("doc_id"), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |wc AS (SELECT term, count(*) AS n_tok FROM tok GROUP BY 1),
        |tot AS (SELECT sum(n_tok) AS n_total FROM wc),
        |lp AS (SELECT doc_id, round(CAST(sum(CAST(ln(CAST(n_tok AS DOUBLE) / CAST(n_total AS DOUBLE))
        |      AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS avg_logprob
        | FROM tok JOIN wc USING (term) CROSS JOIN tot GROUP BY doc_id),
        |b AS (SELECT lp.doc_id, d.lang,
        |  ntile(3) OVER (PARTITION BY d.lang ORDER BY lp.avg_logprob DESC, lp.doc_id) AS t
        | FROM lp JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, CAST(CASE WHEN t = 1 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label,
        | CASE WHEN CAST(list_reduce(list_prepend('0',
        |    string_split(substr(md5(CAST(doc_id AS VARCHAR) || ':qc'), 1, 6), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) % 5 = 0
        |  THEN 'heldout' ELSE 'train' END AS split
        |FROM b WHERE t <> 2 ORDER BY doc_id""".stripMargin)),

    "q61_als_eval" -> Entry((s, d) => {
      // Held-out fit quality as a 1-row result (rows-only for the driver;
      // the pinned quality envelope is asserted in AlsSpec).
      val rmse = AlsRecommender.evalRmse(s, d)
      import s.implicits._
      Seq(rmse).toDF("rmse").select(round(col("rmse"), 4).as("rmse"))
    }, None),

    // ---- multimodal ------------------------------------------------------
    "q70_multimodal_meta" -> Entry(
      (s, d) => Multimodal.payloadMetadata(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
        | sha256(text) AS payload_sha256, 'application/octet-stream' AS mime_type
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Hash-checked since round 10: every feature is either an integer
    // header field or an integer-ratio mean (pixel sum / (w·h), both exact
    // BIGINTs), so the oracle re-derives the text→PPM construction like
    // q122 and mirrors the division bit-for-bit — no float accumulation
    // anywhere.
    "q71_decode_features" -> Entry(
      (s, d) => Multimodal.featureTable(docs(s, d)).orderBy("doc_id", "feature_pos"), Some(
      """WITH p AS (SELECT doc_id,
        |  greatest(1, CAST(ceil(octet_length(encode(text)) / 24.0) AS BIGINT)) AS h,
        |  octet_length(encode(text)) AS nb, text FROM documents),
        |pad AS (SELECT doc_id, h, text || repeat(' ', CAST(h * 24 - nb AS INT)) AS t FROM p),
        |px AS (SELECT doc_id, h,
        |  list_transform(range(0, h * 8), i -> ascii(substr(t, CAST(3*i + 1 AS INT), 1))) AS r,
        |  list_transform(range(0, h * 8), i -> ascii(substr(t, CAST(3*i + 2 AS INT), 1))) AS g,
        |  list_transform(range(0, h * 8), i -> ascii(substr(t, CAST(3*i + 3 AS INT), 1))) AS b
        | FROM pad)
        |SELECT doc_id, CAST(feature_pos AS BIGINT) AS feature_pos, feature_val FROM (
        | SELECT doc_id, 0 AS feature_pos, 8.0 AS feature_val FROM px
        | UNION ALL SELECT doc_id, 1, CAST(h AS DOUBLE) FROM px
        | UNION ALL SELECT doc_id, 2, 255.0 FROM px
        | UNION ALL SELECT doc_id, 3, round(CAST(list_sum(r) AS DOUBLE) / (8 * h), 6) FROM px
        | UNION ALL SELECT doc_id, 4, round(CAST(list_sum(g) AS DOUBLE) / (8 * h), 6) FROM px
        | UNION ALL SELECT doc_id, 5, round(CAST(list_sum(b) AS DOUBLE) / (8 * h), 6) FROM px)
        |ORDER BY doc_id, feature_pos""".stripMargin)),

    // Hash-checked twin of q71: the SAME PpmDecoder.parse runs per payload
    // but emits integer header fields + per-channel pixel sum/min/max, and
    // the oracle re-derives the deterministic text→PPM construction
    // (raster = text bytes space-padded to 3·8·h, h = ceil(bytes/24)) in
    // DuckDB string functions — no float arithmetic on either side, so the
    // real codec's header parse, channel interleave, and padding are all
    // cross-engine certified. (The documents fixture is all-ASCII, so the
    // oracle's char-indexed substr/ascii walk equals the byte walk; the
    // Spark side is byte-correct for any content.)
    "q122_decode_stats" -> Entry(
      (s, d) => Multimodal.decodeStats(docs(s, d)).orderBy("doc_id"), Some(
      """WITH p AS (SELECT doc_id,
        |  greatest(1, CAST(ceil(octet_length(encode(text)) / 24.0) AS BIGINT)) AS h,
        |  octet_length(encode(text)) AS nb, text FROM documents),
        |pad AS (SELECT doc_id, h, text || repeat(' ', CAST(h * 24 - nb AS INT)) AS t FROM p),
        |px AS (SELECT doc_id, h,
        |  list_transform(range(0, h * 8), i -> ascii(substr(t, CAST(3*i + 1 AS INT), 1))) AS r,
        |  list_transform(range(0, h * 8), i -> ascii(substr(t, CAST(3*i + 2 AS INT), 1))) AS g,
        |  list_transform(range(0, h * 8), i -> ascii(substr(t, CAST(3*i + 3 AS INT), 1))) AS b
        | FROM pad)
        |SELECT doc_id, CAST(8 AS BIGINT) AS width, h AS height, CAST(255 AS BIGINT) AS maxval,
        | CAST(list_sum(r) AS BIGINT) AS sum_r, CAST(list_sum(g) AS BIGINT) AS sum_g,
        | CAST(list_sum(b) AS BIGINT) AS sum_b,
        | CAST(list_min(r) AS BIGINT) AS min_r, CAST(list_min(g) AS BIGINT) AS min_g,
        | CAST(list_min(b) AS BIGINT) AS min_b,
        | CAST(list_max(r) AS BIGINT) AS max_r, CAST(list_max(g) AS BIGINT) AS max_g,
        | CAST(list_max(b) AS BIGINT) AS max_b
        |FROM px ORDER BY doc_id""".stripMargin)),

    // The decoder on REAL binary rasters (classpath P6 fixtures: maxval 200
    // and 1, dims unrelated to text, pixels spanning 0-255, comments inside
    // the header). The oracle carries literal expected rows computed from
    // the intended pixel arrays by an independent generator script — not by
    // re-parsing the files — so equality certifies header skip, comment
    // handling, channel interleave and raster walk on non-text payloads.
    "q149_static_ppm_decode" -> Entry(
      (s, _) => Multimodal.decodeStatsPayloads(Multimodal.staticPpmFrame(s))
        .orderBy("doc_id"), Some(
      """SELECT CAST(c0 AS BIGINT) AS doc_id, CAST(c1 AS BIGINT) AS width,
        | CAST(c2 AS BIGINT) AS height, CAST(c3 AS BIGINT) AS maxval,
        | CAST(c4 AS BIGINT) AS sum_r, CAST(c5 AS BIGINT) AS sum_g, CAST(c6 AS BIGINT) AS sum_b,
        | CAST(c7 AS BIGINT) AS min_r, CAST(c8 AS BIGINT) AS min_g, CAST(c9 AS BIGINT) AS min_b,
        | CAST(c10 AS BIGINT) AS max_r, CAST(c11 AS BIGINT) AS max_g, CAST(c12 AS BIGINT) AS max_b
        |FROM (VALUES
        | (0, 4, 3, 200, 318, 1674, 612, 0, 86, 5, 53, 193, 164),
        | (1, 1, 1, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1),
        | (2, 8, 2, 255, 2040, 2064, 1664, 0, 3, 0, 255, 255, 252))
        | AS t(c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12)
        |ORDER BY 1""".stripMargin)),

    // The resized payload is compared as a hex byte-prefix: DuckDB (this
    // build) cannot slice or sha256 BLOBs, and a varchar substr counts
    // *characters* — it only agrees with the byte slice on pure-ASCII text.
    // hex(encode(text)) is byte-faithful on both engines for any content.
    "q75_payload_resize" -> Entry(
      (s, d) => Multimodal.resizePayload(docs(s, d))
        .select(col("doc_id"), col("orig_bytes"), col("resized_bytes"),
          hex(col("resized")).as("resized_hex")).orderBy("doc_id"), Some(
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
        | CAST(least(octet_length(encode(text)), 64) AS BIGINT) AS resized_bytes,
        | substr(hex(encode(text)), 1, 128) AS resized_hex
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "q72_frame_sample" -> Entry(
      (s, d) => Multimodal.sampleFrames(docs(s, d)).orderBy("doc_id", "frame_id"), Some(
      """SELECT doc_id, CAST(f.frame_id AS BIGINT) AS frame_id,
        | CAST((f.frame_id * length(text)) // 4 AS BIGINT) AS frame_offset,
        | md5(substr(text, CAST((f.frame_id * length(text)) // 4 AS INT) + 1, 16)) AS frame_md5
        |FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS frame_id) f
        |ORDER BY doc_id, frame_id""".stripMargin)),

    // ---- corpus curation -------------------------------------------------
    // Hash-based decisions are md5-prefix comparisons — bit-identical
    // across engines (DuckDB runs the same expression), runs, and cluster
    // layouts; no engine RNG anywhere.
    "q78_hash_sample" -> Entry(
      (s, d) => Curation.hashSample(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 2) < '29'
        |ORDER BY doc_id""".stripMargin)),

    "q79_split_assign" -> Entry(
      (s, d) => Curation.assignSplits(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id,
        | CASE WHEN p < 'cd' THEN 'train' WHEN p < 'e6' THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |       substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) AS p
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin)),

    "q80_quota_cap" -> Entry(
      (s, d) => Curation.quotaCap(docs(s, d)).orderBy("source", "rank"), Some(
      """WITH r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank
        | FROM documents)
        |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id FROM r
        |WHERE rank <= 3 ORDER BY source, rank""".stripMargin)),

    "q81_length_quantiles" -> Entry(
      (s, d) => Curation.lengthQuantiles(docs(s, d)).orderBy("lang", "q_pos"), Some(
      """WITH g AS (SELECT lang, quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.95]) AS qs
        | FROM documents GROUP BY lang)
        |SELECT lang, CAST(i AS BIGINT) AS q_pos, round(qs[i], 6) AS quantile
        |FROM g CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS i)
        |ORDER BY lang, q_pos""".stripMargin)),

    // HLL sketch internals are engine-specific — rows-only for the driver;
    // CurationSpec pins the estimate against the exact distinct count.
    "q82_approx_distinct" -> Entry(
      (s, d) => Curation.approxDistinctTexts(docs(s, d)), None),

    // GK-sketch internals are engine-specific — rows-only; CurationSpec
    // pins the rank-error envelope against the exact quantiles (q81).
    "q93_approx_quantiles" -> Entry(
      (s, d) => Curation.approxLengthQuantiles(docs(s, d)).orderBy("lang", "q_pos"), None),

    "q83_tfidf_topk" -> Entry(
      (s, d) => TextAnalysis.tfIdfTopK(docsSpread(s, d)).orderBy("doc_id", "rank"), Some(
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf,
        |       tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score,
        |       row_number() OVER (PARTITION BY tf.doc_id
        |         ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) DESC,
        |                  tf.term) AS rnk
        |      FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, CAST(tf AS BIGINT) AS tf,
        | round(score, 6) AS tfidf
        |FROM s WHERE rnk <= 5 ORDER BY doc_id, rank""".stripMargin)),

    "q84_sequence_pack" -> Entry(
      (s, d) => Curation.packSequences(docs(s, d)).orderBy("source", "doc_id"), Some(
      """WITH t AS (SELECT source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens AS BIGINT) AS start_offset
        | FROM t)
        |SELECT source, doc_id, n_tokens, start_offset,
        | CAST(start_offset // 2048 AS BIGINT) AS seq_id
        |FROM c ORDER BY source, doc_id""".stripMargin)),

    // Bucketed co-located join: same numbers as a plain join (bucketing is
    // layout, not semantics) — the exchange-free plan is what's new, and
    // BucketingSpec asserts it.
    "q88_bucketed_join" -> Entry(
      (s, d) => graft.io.Bucketing.revenueByPriority(s, d), Some(
      """SELECT o_orderpriority,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q85_contamination" -> Entry(
      (s, d) => TextAnalysis.contaminationCheck(docsSpread(s, d)).orderBy("doc_id"), Some(
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
        |       FROM tok WHERE len(t) >= 3),
        |probe AS (SELECT DISTINCT s FROM sh
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':probe'), 1, 2) < '15')
        |SELECT sh.doc_id, CAST(count(DISTINCT sh.s) AS BIGINT) AS n_overlap
        |FROM sh JOIN probe ON sh.s = probe.s
        |WHERE substr(md5(CAST(sh.doc_id AS VARCHAR) || ':probe'), 1, 2) >= '15'
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin)),

    // Mixture weights: en halved, de 2.25x, rest unchanged — base copies +
    // an md5-prefix-gated extra copy ('80' = 128/256 = .5, '40' = 64/256 = .25).
    "q86_corpus_mix" -> Entry(
      (s, d) => Curation.mixCorpus(docs(s, d)).orderBy("doc_id", "copy"), Some(
      """WITH w AS (SELECT doc_id, lang, source,
        |  (CASE WHEN lang = 'en' THEN 0 WHEN lang = 'de' THEN 2 ELSE 1 END)
        |  + (CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 2) <
        |       (CASE WHEN lang = 'en' THEN '80' WHEN lang = 'de' THEN '40' ELSE '00' END)
        |     THEN 1 ELSE 0 END) AS n_copies
        | FROM documents)
        |SELECT doc_id, lang, source, unnest(range(1, n_copies + 1)) AS copy
        |FROM w WHERE n_copies > 0 ORDER BY doc_id, copy""".stripMargin)),

    // Composed pipeline: dedup keep-first -> token-length gate -> train
    // split -> sequence pack. One lazy plan end to end.
    "q87_curation_pipeline" -> Entry(
      (s, d) => Curation.curationPipeline(docs(s, d)).orderBy("source", "doc_id"), Some(
      """WITH keep AS (SELECT doc_id, text, source FROM
        |   (SELECT doc_id, text, source,
        |     row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |    FROM documents)
        |  WHERE rn = 1),
        |g AS (SELECT doc_id, text, source FROM keep
        |  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 85),
        |tr AS (SELECT doc_id, text, source FROM g
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cd'),
        |t AS (SELECT source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM tr),
        |c AS (SELECT source, doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens AS BIGINT) AS start_offset
        | FROM t)
        |SELECT source, doc_id, n_tokens, start_offset,
        | CAST(start_offset // 2048 AS BIGINT) AS seq_id
        |FROM c ORDER BY source, doc_id""".stripMargin)),

    // Streaming exactly-once FILE sink: stream -> checkpointed parquet
    // sink -> batch read-back; agg equality with the batch oracle
    // certifies the egress (no drops, no double commits).
    "q199_streaming_file_sink" -> Entry((s, d) =>
      Events.streamingFileSink(s, d).orderBy("user_id", "event_type"), Some(
      """SELECT user_id, event_type, count(*) AS n_events,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Streaming ingest dedup: the settled result of the watermark-evictable
    // dropDuplicatesWithinWatermark state is exactly the distinct key set.
    "q89_streaming_dedup" -> Entry(
      (s, d) => Events.streamingDedupKeys(s, d).orderBy("user_id", "event_type"), Some(
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin)),

    "q90_repetition" -> Entry(
      (s, d) => TextAnalysis.repetitionScore(docs(s, d)).orderBy("doc_id"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS sh
        |      FROM t WHERE len(t) >= 3)
        |SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
        | CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct_shingles,
        | round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE), 6)
        |   AS repetition
        |FROM s ORDER BY doc_id""".stripMargin)),

    // Priority = integer value of a 15-hex-char (60-bit) salted md5 prefix —
    // Spark's conv(hex,16,10) and DuckDB's '0x' cast parse the same digits.
    "q91_stratified_sample" -> Entry(
      (s, d) => Curation.stratifiedSample(docs(s, d))
        .orderBy("lang", "priority", "doc_id"), Some(
      """WITH h AS (SELECT lang, doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 15)) AS BIGINT)
        |    AS priority
        | FROM documents),
        |r AS (SELECT lang, doc_id, priority,
        |  row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn FROM h)
        |SELECT lang, priority, doc_id FROM r WHERE rn <= 50
        |ORDER BY lang, priority, doc_id""".stripMargin)),

    // Sliding-window chunking: starts at 1, 1+24, ... <= n; short tails
    // allowed (len = min(32, n-s+1)); list_slice/slice both clamp at the
    // array end so the md5'd chunk text agrees on partial windows.
    "q96_chunk_documents" -> Entry(
      (s, d) => Curation.chunkDocuments(docs(s, d)).orderBy("doc_id", "chunk_id"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks, len(toks) AS n,
        |        unnest(range(1, len(toks) + 1, 24)) AS s
        |      FROM t)
        |SELECT doc_id, CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
        | CAST(s AS BIGINT) AS start_pos,
        | CAST(least(32, n - s + 1) AS BIGINT) AS n_chunk_tokens,
        | md5(array_to_string(list_slice(toks, s, s + 31), ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    "q97_vocab_topk" -> Entry(
      (s, d) => TextAnalysis.vocabTopK(docs(s, d)).orderBy("token_id"), Some(
      """WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        |      FROM documents),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |r AS (SELECT row_number() OVER (ORDER BY df DESC, term) AS token_id, term, df FROM d)
        |SELECT CAST(token_id AS BIGINT) AS token_id, term, df FROM r
        |WHERE token_id <= 100 ORDER BY token_id""".stripMargin)),

    // PII redaction: this corpus is clean (no emails / long digit runs), so
    // the oracle proves the no-false-positive side — identical match counts
    // (zero) and identical redacted digests; RedactionSpec pins the positive
    // path (real emails/digit runs actually replaced) on a fixture corpus.
    "q98_pii_redact" -> Entry(
      (s, d) => TextAnalysis.redactPii(docs(s, d)).orderBy("doc_id"), Some(
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS BIGINT) AS n_long_digit_runs,
        | md5(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{4,}', '<NUM>', 'g')) AS redacted_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Connected components over the exact-Jaccard>=0.5 near-dup graph; the
    // oracle walks the same edges with a recursive CTE (min reachable id).
    // Spark's edge set is the LSH candidates→verify path — identical to the
    // oracle's exact threshold join at this corpus's similarity margin
    // (q43/q95 argument).
    "q99_neardup_components" -> Entry(
      (s, d) => Dedup.componentLabelsOn(s, d).orderBy("doc_id"), Some(
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM s a JOIN s b
        |  ON a.doc_id <> b.doc_id
        |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.5),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON reach.node = e.src)
        |SELECT node AS doc_id, min(r) AS component FROM reach
        |GROUP BY node ORDER BY doc_id""".stripMargin)),

    // Per-term KL contributions are doubles (identical expression tree on
    // both engines); the SUM rides DECIMAL(30,18) so addition is exact and
    // partitioning/order-independent (the q01 decimal-sum rule).
    "q100_source_divergence" -> Entry(
      (s, d) => TextAnalysis.sourceDivergence(docsSpread(s, d)).orderBy("source"), Some(
      """WITH tc AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT source, term, count(*) AS tf FROM tc GROUP BY 1, 2),
        |st AS (SELECT source, sum(tf) AS n_src FROM tf GROUP BY 1),
        |ct AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY 1),
        |n AS (SELECT sum(ctf) AS n_corpus FROM ct),
        |px AS (SELECT tf.source,
        |  CAST((CAST(tf.tf AS DOUBLE) / CAST(st.n_src AS DOUBLE)) *
        |    ln((CAST(tf.tf AS DOUBLE) / CAST(st.n_src AS DOUBLE)) /
        |       (CAST(ct.ctf AS DOUBLE) / CAST(n.n_corpus AS DOUBLE)))
        |    AS DECIMAL(30,18)) AS contrib
        | FROM tf JOIN st USING (source) JOIN ct USING (term) CROSS JOIN n)
        |SELECT source, round(CAST(sum(contrib) AS DOUBLE), 6) AS kl_divergence
        |FROM px GROUP BY source ORDER BY source""".stripMargin)),

    // The filtered corpus after fuzzy dedup: q99's component labels applied
    // as a keep-min-doc_id filter. The oracle re-walks the same recursive
    // closure, then keeps rows whose id IS the component minimum.
    "q101_neardup_dedup" -> Entry(
      (s, d) => Dedup.nearDupRepresentativesFrom(
        Dedup.componentLabelsOn(s, d), docs(s, d)).orderBy("doc_id"), Some(
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM s a JOIN s b
        |  ON a.doc_id <> b.doc_id
        |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.5),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON reach.node = e.src),
        |comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node)
        |SELECT d.doc_id, d.source, d.lang, d.n_chars, md5(d.text) AS text_md5
        |FROM documents d JOIN comp ON d.doc_id = comp.doc_id
        |WHERE comp.doc_id = comp.component ORDER BY d.doc_id""".stripMargin)),

    // Chained-min funnel: each stage's min is constrained to fall strictly
    // after the previous stage's — three CTEs, not three independent mins.
    "q102_funnel" -> Entry(
      (s, d) => Events.funnel(s, d).orderBy("user_id"), Some(
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |t1 AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND ms > t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(ms) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ms > t2 GROUP BY 1)
        |SELECT t1.user_id, t1.t1 AS first_stage1_ms,
        | coalesce(t2.t2, -1) AS first_stage2_ms,
        | coalesce(t3.t3, -1) AS first_stage3_ms,
        | CAST(1 + (CASE WHEN t2.t2 IS NULL THEN 0 ELSE 1 END)
        |        + (CASE WHEN t3.t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS stage
        |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        | LEFT JOIN t3 ON t1.user_id = t3.user_id
        |ORDER BY t1.user_id""".stripMargin)),

    // Epoch-week arithmetic (ms // 604800000) on both engines — no
    // calendar/locale week definitions to disagree on.
    "q103_cohort_retention" -> Entry(
      (s, d) => Events.cohortRetention(s, d).orderBy("cohort_week", "week_offset"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, wk FROM e)
        |SELECT cohort_week, wk - cohort_week AS week_offset, count(*) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Squared-sum is a sequential left fold in both engines (Spark
    // `aggregate`, DuckDB list_aggregate 'sum') — bit-identical doubles.
    "q104_normalize_embeddings" -> Entry(
      (s, d) => Similarity.normalizeEmbeddings(emb(s, d)).orderBy("vec_id", "pos"), Some(
      """WITH n AS (SELECT vec_id, embedding,
        |  sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
        | FROM embeddings),
        |px AS (SELECT vec_id, nrm, CAST(unnest(embedding) AS DOUBLE) AS x,
        |        unnest(range(0, len(embedding))) AS pos FROM n)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        | round(CASE WHEN nrm > 0 THEN x / nrm ELSE 0.0 END, 6) AS unit,
        | round(nrm, 6) AS norm
        |FROM px ORDER BY vec_id, pos""".stripMargin)),

    // Vocabulary = q97's top-100 by document frequency; coverage counts
    // token OCCURRENCES (not distinct terms) against it.
    "q105_vocab_coverage" -> Entry(
      (s, d) => TextAnalysis.vocabCoverage(docs(s, d)).orderBy("doc_id"), Some(
      """WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        |      FROM documents),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |v AS (SELECT term FROM (SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rn
        |      FROM d) WHERE rn <= 100),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        | round(CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*), 6) AS coverage
        |FROM tok LEFT JOIN v ON tok.term = v.term
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // α fixed at 0.5 so the power is IEEE-exact sqrt on both engines (libm
    // pow can drift a ulp); see Curation.temperatureMix.
    "q106_temperature_mix" -> Entry(
      (s, d) => Curation.temperatureMix(docs(s, d)).orderBy("source"), Some(
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS sc FROM c),
        |z AS (SELECT sum(sc) AS z, sum(n) AS tot FROM t)
        |SELECT source, n, round(sc / z, 6) AS p,
        | round((sc / z) / (CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)), 6) AS boost
        |FROM t CROSS JOIN z ORDER BY source""".stripMargin)),

    "q107_length_outlier_filter" -> Entry(
      (s, d) => Curation.lengthOutlierFilter(docs(s, d)).orderBy("doc_id"), Some(
      """WITH b AS (SELECT lang, quantile_cont(n_chars, 0.05) AS lo,
        |    quantile_cont(n_chars, 0.95) AS hi
        |  FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN b USING (lang)
        |WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
        |ORDER BY d.doc_id""".stripMargin)),

    "q108_source_lang_profile" -> Entry(
      (s, d) => Curation.sourceLangProfile(docs(s, d)).orderBy("source"), Some(
      """SELECT source,
        | CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
        | CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        | CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
        | CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
        | CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // lead() past the partition end is NULL; Spark's concat and DuckDB's ||
    // both propagate it, so each user's tail windows drop on both engines.
    "q109_event_paths" -> Entry(
      (s, d) => Events.eventPaths(s, d).orderBy(col("n").desc, col("path")), Some(
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
        |  FROM events),
        |s AS (SELECT event_type || '>' || lead(event_type, 1) OVER w
        |        || '>' || lead(event_type, 2) OVER w AS path
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
        |SELECT path, count(*) AS n FROM s WHERE path IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    "q110_bigram_vocab" -> Entry(
      (s, d) => TextAnalysis.ngramVocab(docs(s, d)).orderBy("gram_id"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |d AS (SELECT gram, count(*) AS df FROM s GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY df DESC, gram) AS BIGINT) AS gram_id,
        | gram, df
        |FROM d ORDER BY df DESC, gram LIMIT 100""".stripMargin)),

    "q111_token_spectrum" -> Entry(
      (s, d) => TextAnalysis.tokenSpectrum(docs(s, d)).orderBy("occurrences"), Some(
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |wc AS (SELECT term, count(*) AS occ FROM tok GROUP BY 1)
        |SELECT occ AS occurrences, count(*) AS n_terms
        |FROM wc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Moments from DECIMAL-cast sums on both engines — see
    // Events.valueOutliers; the z-threshold compare is then pure IEEE.
    "q112_value_outliers" -> Entry(
      (s, d) => Events.valueOutliers(s, d).orderBy("event_type"), Some(
      """WITH s AS (SELECT event_type, count(*) AS n,
        |   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |   CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |st AS (SELECT event_type, n, s1 / n AS mean,
        |   sqrt(s2 / n - (s1 / n) * (s1 / n)) AS std FROM s)
        |SELECT e.event_type, max(st.n) AS n, round(max(st.mean), 6) AS mean,
        | round(max(st.std), 6) AS std,
        | CAST(sum(CASE WHEN abs(e.value - st.mean) > 3 * st.std THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_outliers
        |FROM events e JOIN st USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q113_stream_enrich" -> Entry(
      (s, d) => Events.streamingEnrichedCounts(s, d).orderBy("ws_epoch", "mktsegment"), Some(
      """SELECT CAST(floor(epoch(date_trunc('hour', e.ts))) AS BIGINT) AS ws_epoch,
        | c.c_mktsegment AS mktsegment, count(*) AS n
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    "q114_top_order_per_customer" -> Entry(
      (s, d) => Queries.topOrderPerCustomer(s, d).orderBy("custkey"), Some(
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        | o_totalprice AS totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY custkey""".stripMargin)),

    "q115_corpus_cube" -> Entry(
      (s, d) => Curation.corpusCube(docs(s, d)).orderBy("lang", "source"), Some(
      """SELECT COALESCE(lang, '<all>') AS lang, COALESCE(source, '<all>') AS source,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY lang, source""".stripMargin)),

    "q116_acctbal_quartiles" -> Entry(
      (s, d) => Queries.acctbalQuartiles(s, d).orderBy("nationkey", "quartile"), Some(
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, CAST(q AS BIGINT) AS quartile,
        | count(*) AS n, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        |FROM (SELECT c_nationkey, c_acctbal,
        |   ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS q
        |  FROM customer)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Certifies the SimHash vote/signature logic cross-engine with a
    // 60-bit md5 hash family (q44 keeps the fast xxhash64 family,
    // rows-only). The oracle rebuilds the per-bit votes with an explicit
    // bit unnest; the md5-prefix parse is the q35 list_reduce fold in
    // base 16.
    "q117_simhash_md5" -> Entry(
      (s, d) => Dedup.simhashMd5(docs(s, d)).orderBy("doc_id"), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(tok), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16
        |     + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM tok),
        |votes AS (SELECT doc_id, i,
        |   sum(CASE WHEN (h // (CAST(1 AS BIGINT) << i)) % 2 = 1
        |     THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(60)) AS i) bits
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(CASE WHEN v > 0
        |   THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        |FROM votes GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q118_source_overlap" -> Entry(
      (s, d) => Dedup.sourceOverlap(docsSpread(s, d)).orderBy("src_a", "src_b"), Some(
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT source, x.s AS sh FROM (
        |   SELECT source, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common,
        | round(CAST(n_common AS DOUBLE) /
        |   CAST(sa.n + sb.n - n_common AS DOUBLE), 6) AS jaccard
        |FROM inter JOIN sizes sa ON src_a = sa.source
        | JOIN sizes sb ON src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin)),

    // Each token's ln(n/N) is one IEEE divide + ln (bit-identical libm);
    // the per-doc sum rides DECIMAL(28,12) so partition order can't move
    // it — see TextAnalysis.unigramLogprob.
    "q119_unigram_logprob" -> Entry(
      (s, d) => TextAnalysis.unigramLogprob(docs(s, d)).orderBy("doc_id"), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |wc AS (SELECT term, count(*) AS n_tok FROM tok GROUP BY 1),
        |tot AS (SELECT sum(n_tok) AS n_total FROM wc)
        |SELECT doc_id, count(*) AS n_tokens,
        | round(CAST(sum(CAST(ln(CAST(n_tok AS DOUBLE) / CAST(n_total AS DOUBLE))
        |     AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS avg_logprob
        |FROM tok JOIN wc USING (term) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // First-order (bigram) LM score with Laplace smoothing — the
    // word-ORDER-sensitive upgrade of q119's bag model.
    "q189_bigram_logprob" -> Entry(
      (s, d) => TextAnalysis.bigramLogprob(docs(s, d)).orderBy("doc_id"), Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, t[i-1] AS a, t[i] AS b
        |  FROM toks, unnest(range(2, len(t) + 1)) u(i) WHERE len(t) >= 2),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |ca AS (SELECT a, sum(c_ab) AS c_a FROM cab GROUP BY 1),
        |v AS (SELECT count(DISTINCT term) AS v FROM
        |  (SELECT unnest(string_split(text, ' ')) AS term FROM documents))
        |SELECT doc_id, count(*) AS n_bigrams,
        | round(CAST(sum(CAST(ln((c_ab + 1.0) / (c_a + v)) AS DECIMAL(28,12)))
        |     AS DOUBLE) / count(*), 6) AS avg_logprob
        |FROM bg JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // bucket = binary-digit count - 1 (integer-exact floor(log2); a libm
    // log2 could flip the floor at power-of-two boundaries).
    "q120_length_histogram" -> Entry(
      (s, d) => TextAnalysis.lengthHistogram(docs(s, d)).orderBy("lang", "bucket"), Some(
      """SELECT lang, CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
        | count(*) AS n, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    "q92_quantize_embeddings" -> Entry(
      (s, d) => Similarity.quantizeEmbeddings(emb(s, d)).orderBy("vec_id", "pos"), Some(
      """WITH m AS (SELECT vec_id,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        | FROM embeddings),
        |s AS (SELECT vec_id, CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale FROM m),
        |px AS (SELECT e.vec_id, s.scale, CAST(unnest(e.embedding) AS DOUBLE) AS x,
        |        unnest(range(0, len(e.embedding))) AS pos
        |       FROM embeddings e JOIN s USING (vec_id))
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        | CAST(floor(x * scale + 0.5) AS BIGINT) AS q, round(scale, 6) AS scale
        |FROM px ORDER BY vec_id, pos""".stripMargin)),

    // md5-family MinHash signatures: every byte engine-reproducible (the
    // q117 hex-prefix trick), certifying the min-over-shingle-set algebra
    // that MinHashLSH's private coefficients keep rows-only in q43.
    "q123_minhash_md5" -> Entry(
      (s, d) => Dedup.minhashMd5Signatures(docsSpread(s, d)).orderBy("doc_id", "seed"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds)
        |SELECT doc_id, CAST(seed AS BIGINT) AS seed, min(h) AS minhash
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // The full LSH dedup pipeline — signature → band keys → bucket join →
    // exact-Jaccard verify — hash-checked end to end on the md5 family.
    // Finds exactly q43's 25 near-dup pairs at sf0.01.
    "q124_minhash_md5_pairs" -> Entry(
      (s, d) => Dedup.minhashMd5PairsOn(s, d).orderBy("doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b, n_common,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin)),

    // PageRank over the verified near-dup graph, 2 power iterations
    // unrolled (the q94/q121 chained-certification pattern on a graph
    // kernel): boilerplate centrality. Oracle re-derives the md5-family
    // pair graph (q124's CTEs) then runs the same two decimal-quantized
    // mass propagations.
    "q200_dup_pagerank" -> Entry((s, d) =>
      Dedup.dupCentrality(s, d).orderBy("doc_id"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |c1 AS (SELECT e.dst AS doc_id,
        |   sum(CAST(round(1.0 / d.deg, 12) AS DECIMAL(28,12))) AS s
        |  FROM edges e JOIN deg d USING (src) GROUP BY 1),
        |pr1 AS (SELECT d.doc_id,
        |   CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce(CAST(c1.s AS DOUBLE), 0.0) AS pr
        |  FROM documents d LEFT JOIN c1 USING (doc_id)),
        |c2 AS (SELECT e.dst AS doc_id,
        |   sum(CAST(round(p.pr / d.deg, 12) AS DECIMAL(28,12))) AS s
        |  FROM edges e JOIN deg d USING (src) JOIN pr1 p ON p.doc_id = e.src GROUP BY 1),
        |pr2 AS (SELECT d.doc_id,
        |   CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * coalesce(CAST(c2.s AS DOUBLE), 0.0) AS pr
        |  FROM documents d LEFT JOIN c2 USING (doc_id))
        |SELECT doc_id, pr FROM pr2 ORDER BY doc_id""".stripMargin)),

    // Triangle census on the near-dup graph: per-node triangle counts +
    // local clustering coefficient — chain-vs-clique cohesion diagnostic
    // for dedup components. Oracle re-derives the md5-family pair graph
    // (q124's CTEs, as in q200) then closes ordered wedges with a third
    // edge join.
    "q255_dup_triangles" -> Entry((s, d) =>
      Dedup.dupTrianglesOn(s, d).orderBy("doc_id"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |tri AS (SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
        |  FROM pairs ab JOIN pairs bc ON ab.doc_b = bc.doc_a
        |  JOIN pairs ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
        |tn AS (SELECT doc_id, count(*) AS tcnt FROM (
        |   SELECT a AS doc_id FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri) GROUP BY 1),
        |deg AS (SELECT doc_id, count(*) AS degree FROM (
        |   SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs) GROUP BY 1)
        |SELECT deg.doc_id, CAST(deg.degree AS BIGINT) AS degree,
        |  CAST(coalesce(tn.tcnt, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN deg.degree >= 2
        |    THEN round(2.0 * coalesce(tn.tcnt, 0) / (deg.degree * (deg.degree - 1)), 6)
        |    ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN tn USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Day-grain temporal holdout: cutoff = earliest day whose cumulative
    // event count reaches 80%; per-user train (<= cutoff) / test (after)
    // counts. The quantile runs on the bounded day histogram, never a
    // global event sort.
    "q256_temporal_split" -> Entry((s, d) =>
      Events.temporalHoldoutSplit(s, d).orderBy("user_id"), Some(
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |dc AS (SELECT d, count(*) AS n FROM e GROUP BY 1),
        |tot AS (SELECT sum(n) AS n_total FROM dc),
        |cum AS (SELECT d, sum(n) OVER (ORDER BY d) AS c FROM dc),
        |cut AS (SELECT min(d) AS cut_day FROM cum CROSS JOIN tot
        |        WHERE c >= 0.8 * n_total)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN e.d <= cut.cut_day THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN e.d > cut.cut_day THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |FROM e CROSS JOIN cut GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-column data-quality profile of the documents table: one scan,
    // exact distinct counts (the honest tier; q82 is the HLL tier),
    // native-type min/max cast to string for the uniform report schema.
    "q202_table_profile" -> Entry((s, d) =>
      graft.relational.Profile.tableProfile(docs(s, d),
        Seq("doc_id", "text", "lang", "source", "n_chars")).orderBy("column_name"), Some(
      """WITH m AS (SELECT count(*) AS n_rows,
        |  count(doc_id) AS nn1, count(DISTINCT doc_id) AS nd1,
        |   CAST(min(doc_id) AS VARCHAR) AS mn1, CAST(max(doc_id) AS VARCHAR) AS mx1,
        |  count(text) AS nn2, count(DISTINCT text) AS nd2,
        |   CAST(min(text) AS VARCHAR) AS mn2, CAST(max(text) AS VARCHAR) AS mx2,
        |  count(lang) AS nn3, count(DISTINCT lang) AS nd3,
        |   CAST(min(lang) AS VARCHAR) AS mn3, CAST(max(lang) AS VARCHAR) AS mx3,
        |  count(source) AS nn4, count(DISTINCT source) AS nd4,
        |   CAST(min(source) AS VARCHAR) AS mn4, CAST(max(source) AS VARCHAR) AS mx4,
        |  count(n_chars) AS nn5, count(DISTINCT n_chars) AS nd5,
        |   CAST(min(n_chars) AS VARCHAR) AS mn5, CAST(max(n_chars) AS VARCHAR) AS mx5
        | FROM documents)
        |SELECT column_name, n_rows, n_rows - n_non_null AS n_nulls, n_distinct, min_value, max_value
        |FROM (
        | SELECT 'doc_id' AS column_name, n_rows, nn1 AS n_non_null, nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value FROM m
        | UNION ALL SELECT 'text', n_rows, nn2, nd2, mn2, mx2 FROM m
        | UNION ALL SELECT 'lang', n_rows, nn3, nd3, mn3, mx3 FROM m
        | UNION ALL SELECT 'source', n_rows, nn4, nd4, mn4, mx4 FROM m
        | UNION ALL SELECT 'n_chars', n_rows, nn5, nd5, mn5, mx5 FROM m)
        |ORDER BY column_name""".stripMargin)),

    // Quarantine router: every doc gets decision + first-matching reason
    // under a fixed rule priority — the audit surface ("why was this doc
    // dropped") the silent q87 gates cannot answer.
    "q203_quarantine_reasons" -> Entry((s, d) =>
      Curation.quarantineRouter(docs(s, d)).orderBy("doc_id"), Some(
      """WITH k AS (SELECT doc_id, sha256(text) AS ch, lang,
        |   len(string_split(text, ' ')) AS nt,
        |   min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper_id
        |  FROM documents)
        |SELECT doc_id,
        | CASE WHEN reason = 'ok' THEN 'keep' ELSE 'drop' END AS decision, reason
        |FROM (SELECT doc_id,
        |  CASE WHEN doc_id <> keeper_id THEN 'exact_dup'
        |       WHEN lang NOT IN ('en', 'de', 'es', 'fr') THEN 'lang_blocked'
        |       WHEN nt < 20 THEN 'too_short'
        |       WHEN nt > 85 THEN 'too_long'
        |       ELSE 'ok' END AS reason
        | FROM k)
        |ORDER BY doc_id""".stripMargin)),

    // Contrastive negative sampling over the verified near-dup pairs:
    // deterministic md5-gate draws, accidental false negatives flagged
    // (not re-drawn — a flag is engine-reproducible, a loop is not).
    "q201_contrastive_negatives" -> Entry((s, d) =>
      Dedup.contrastiveNegatives(s, d).orderBy("doc_a", "doc_b", "neg_rank"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |nn AS (SELECT count(*) AS n_docs FROM documents),
        |drawn AS (SELECT doc_a, doc_b, r AS neg_rank,
        |   CAST(list_reduce(list_prepend('0', string_split(substr(
        |       md5('neg:' || CAST(doc_a AS VARCHAR) || ':' || CAST(doc_b AS VARCHAR) || ':' || CAST(r AS VARCHAR)),
        |       1, 15), '')),
        |     (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT)
        |     % nn.n_docs AS neg_id
        |  FROM pairs CROSS JOIN nn CROSS JOIN (SELECT unnest(range(1, 4)) AS r)),
        |edge AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        |         UNION ALL SELECT doc_b, doc_a FROM pairs)
        |SELECT d.doc_a, d.doc_b, CAST(d.neg_rank AS BIGINT) AS neg_rank, d.neg_id,
        | (d.neg_id = d.doc_a OR d.neg_id = d.doc_b OR e.u IS NOT NULL) AS is_degenerate
        |FROM drawn d LEFT JOIN edge e ON e.u = d.doc_a AND e.v = d.neg_id
        |ORDER BY doc_a, doc_b, neg_rank""".stripMargin)),

    // The salt never reaches the output: the oracle is the PLAIN join,
    // certifying the salting rewrite is result-identical.
    "q125_salted_join" -> Entry(
      (s, d) => Queries.saltedSkewJoin(s, d), Some(
      """SELECT n_name, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Integer-exact dot/norms (raw TF counts) — the only float ops are two
    // sqrts and a divide, so the df-pruned inverted-index similarity
    // search hash-checks end to end.
    "q126_inverted_cosine" -> Entry(
      (s, d) => Dedup.invertedCosinePairs(docs(s, d)).orderBy("doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tf AS (SELECT doc_id, x.s, count(*) AS tf FROM (
        |   SELECT doc_id, unnest(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |   FROM t WHERE len(toks) >= 3) x GROUP BY 1, 2),
        |rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM tf GROUP BY 1) WHERE df BETWEEN 2 AND 20),
        |cand AS (SELECT doc_a, doc_b FROM (
        |   SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |   FROM tf a JOIN rare USING (s) JOIN tf b ON b.s = a.s AND a.doc_id < b.doc_id
        |   GROUP BY 1, 2) WHERE n_shared >= 2),
        |norms AS (SELECT doc_id, sum(tf*tf) AS n2 FROM tf GROUP BY 1),
        |dot AS (SELECT doc_a, doc_b, sum(ta.tf * tb.tf) AS dot
        |  FROM cand JOIN tf ta ON ta.doc_id = doc_a JOIN tf tb ON tb.doc_id = doc_b AND tb.s = ta.s
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot,
        |   round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
        |  FROM dot JOIN norms na ON doc_a = na.doc_id JOIN norms nb ON doc_b = nb.doc_id)
        |WHERE cosine >= 0.3 ORDER BY doc_a, doc_b""".stripMargin)),

    // OLS moments ride DECIMAL(38,18) (order-independent), ONE cast to
    // double each, slope arithmetic all-double — see TextAnalysis.zipfSlope.
    "q127_zipf_slope" -> Entry(
      (s, d) => TextAnalysis.zipfSlope(docs(s, d)), Some(
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, len(toks)),
        |   i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t WHERE len(toks) >= 2),
        |c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY 1),
        |r AS (SELECT row_number() OVER (ORDER BY n DESC, bigram) AS rk, n FROM c QUALIFY rk <= 100),
        |pts AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM r),
        |m AS (SELECT count(*) AS n_points,
        |   CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |   CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |   CAST(sum(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |   CAST(sum(CAST(x*x AS DECIMAL(38,18))) AS DOUBLE) AS sxx FROM pts)
        |SELECT n_points,
        | round((CAST(n_points AS DOUBLE)*sxy - sx*sy) / (CAST(n_points AS DOUBLE)*sxx - sx*sx), 6) AS slope,
        | round((sy - ((CAST(n_points AS DOUBLE)*sxy - sx*sy) / (CAST(n_points AS DOUBLE)*sxx - sx*sx)) * sx) / CAST(n_points AS DOUBLE), 6) AS intercept
        |FROM m""".stripMargin)),

    // H = ln(T) − (Σ n·ln n)/T; the oracle sums ln(n) per OCCURRENCE in
    // DECIMAL(28,12) — exactly the Spark side's decimal×integer product
    // (the q119 rule), so the sums are equal term for term.
    "q128_source_entropy" -> Entry(
      (s, d) => TextAnalysis.sourceEntropy(docs(s, d)).orderBy("source"), Some(
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2)
        |SELECT t.source, count(*) AS n_tokens,
        | round(ln(CAST(count(*) AS DOUBLE)) -
        |   CAST(sum(CAST(ln(CAST(c.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS entropy
        |FROM tok t JOIN c ON t.source = c.source AND t.term = c.term
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The oracle runs the BNLJ range-join form; the operator runs the
    // equi-join-on-computed-bucket rewrite — equality certifies the rewrite.
    "q129_range_bucket_join" -> Entry(
      (s, d) => Events.rangeBucketJoin(s, d), Some(
      """WITH tiers AS (SELECT CAST(i AS BIGINT) AS tier_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
        |  FROM (SELECT unnest(range(10)) AS i))
        |SELECT tier_id, lo, hi, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN tiers ON value >= lo AND value < hi
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)),

    "q130_timebound_conversion" -> Entry(
      (s, d) => Events.timeboundConversion(s, d).orderBy("user_id"), Some(
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |f AS (SELECT user_id, min(ms) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ms) AS t_conv FROM e JOIN f USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > t0 AND ms <= t0 + 1800000 GROUP BY 1)
        |SELECT f.user_id, t0 AS first_ms,
        | CAST(t_conv IS NOT NULL AS BIGINT) AS converted,
        | coalesce(t_conv - t0, -1) AS lag_ms
        |FROM f LEFT JOIN c ON f.user_id = c.user_id ORDER BY 1""".stripMargin)),

    // row_number selection, not interpolation: the quantile values are
    // input values, so the operator hash-checks exactly.
    "q131_exact_quantiles" -> Entry(
      (s, d) => Events.exactValueQuantiles(s, d).orderBy("event_type"), Some(
      """WITH e AS (SELECT event_type, value, event_id FROM events),
        |r AS (SELECT event_type, value,
        |   row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn FROM e),
        |s AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1)
        |SELECT event_type, n,
        | min(CASE WHEN rn = ceil(n / 2.0) THEN value END) AS median,
        | min(CASE WHEN rn = ceil(n * 0.9) THEN value END) AS p90
        |FROM r JOIN s USING (event_type)
        |WHERE rn = ceil(n / 2.0) OR rn = ceil(n * 0.9)
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // Spark's grouping_id bit order matches DuckDB's GROUPING(lang, source).
    "q132_grouping_sets" -> Entry(
      (s, d) => TextAnalysis.corpusGroupingSets(docs(s, d))
        .orderBy("grain", "lang", "source"), Some(
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        | CAST(GROUPING(lang, source) AS BIGINT) AS grain,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY GROUPING SETS ((lang, source), (lang), ())
        |ORDER BY grain, lang, source""".stripMargin)),

    "q133_debounce" -> Entry(
      (s, d) => Events.debounceEvents(s, d).orderBy("event_id"), Some(
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT *, lag(ms) OVER (PARTITION BY user_id, event_type ORDER BY ms, event_id) AS prev_ms FROM e)
        |SELECT event_id, user_id, event_type, ms FROM l
        |WHERE prev_ms IS NULL OR ms - prev_ms >= 600000 ORDER BY event_id""".stripMargin)),

    // dense_rank keeps tied parts AND does not consume the next rank —
    // the tie contract q114's row_number top-1 deliberately avoids.
    "q134_dense_rank_topk" -> Entry(
      (s, d) => Queries.denseRankTopParts(s, d).orderBy("p_brand", "rnk", "p_partkey"), Some(
      """WITH q AS (SELECT p_brand, p_partkey,
        |   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        |r AS (SELECT p_brand, p_partkey, qty,
        |   CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY qty DESC) AS BIGINT) AS rnk
        |  FROM q)
        |SELECT p_brand, rnk, p_partkey, qty FROM r WHERE rnk <= 3
        |ORDER BY p_brand, rnk, p_partkey""".stripMargin)),

    // Monthly revenue is decimal-exact per group; the running sum
    // re-aggregates those doubles through DECIMAL(28,6) so the cumulative
    // frame is engine- and order-independent.
    "q135_running_revenue" -> Entry(
      (s, d) => Queries.runningRevenue(s, d).orderBy("n_name", "ship_month"), Some(
      """WITH m AS (SELECT n_name, CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2)
        |SELECT n_name, ship_month, revenue,
        | CAST(sum(CAST(revenue AS DECIMAL(28,6))) OVER (PARTITION BY n_name ORDER BY ship_month
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
        |FROM m ORDER BY n_name, ship_month""".stripMargin)),

    // Dataset.unpivot (single-scan Expand) vs the oracle's UNION-of-scans
    // — equality certifies the melt rewrite.
    "q136_unpivot_stats" -> Entry(
      (s, d) => TextAnalysis.tokenStatsLong(docs(s, d)).orderBy("doc_id", "metric"), Some(
      """WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |   CAST(length(text) AS BIGINT) AS n_chars_obs,
        |   CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha_chars FROM documents)
        |SELECT doc_id, 'n_tokens' AS metric, n_tokens AS value FROM s
        |UNION ALL SELECT doc_id, 'n_chars_obs', n_chars_obs FROM s
        |UNION ALL SELECT doc_id, 'n_alpha_chars', n_alpha_chars FROM s
        |ORDER BY doc_id, metric""".stripMargin)),

    // Settled streaming sliding windows vs the batch q51 oracle — each
    // event in exactly two panes, state bounded by open panes × types.
    "q137_streaming_sliding" -> Entry(Events.streamingSlidingCounts, Some(
      """WITH b AS (SELECT event_type, (epoch_ms(ts) // 1000 // 1800) * 1800 AS b0 FROM events),
        |w AS (SELECT event_type, unnest([b0, b0 - 1800]) AS ws_epoch FROM b)
        |SELECT ws_epoch, event_type, count(*) AS n FROM w
        |GROUP BY 1, 2 ORDER BY ws_epoch, event_type""".stripMargin)),

    "q138_session_stats" -> Entry(
      (s, d) => Events.sessionStats(s, d).orderBy("user_id"), Some(
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |l AS (SELECT user_id, ts_ms, event_id,
        |  lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM e),
        |f AS (SELECT user_id, ts_ms, event_id,
        |  CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 300000 THEN 1 ELSE 0 END AS new_session FROM l),
        |g AS (SELECT user_id, ts_ms,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS BIGINT) AS session_seq
        | FROM f),
        |sess AS (SELECT user_id, session_seq, min(ts_ms) AS session_start_ms,
        |  max(ts_ms) - min(ts_ms) AS duration_ms, count(*) AS n_events FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
        | max(duration_ms) AS max_duration_ms, min(session_start_ms) AS first_start_ms
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The dedup-before-split audit: off-diagonal rows are benchmark
    // leakage (a near-dup of a test doc inside train). Composes the q124
    // LSH pipeline with q79's hash split — both already hash-certified.
    "q140_split_leakage" -> Entry(
      (s, d) => Dedup.splitLeakageFrom(
        Dedup.minhashMd5PairsOn(s, d), docs(s, d)).orderBy("split_lo", "split_hi"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |sp AS (SELECT doc_id,
        |  CASE WHEN p < 'cd' THEN 'train' WHEN p < 'e6' THEN 'val' ELSE 'test' END AS split
        | FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) AS p FROM documents))
        |SELECT least(sa.split, sb.split) AS split_lo, greatest(sa.split, sb.split) AS split_hi,
        | count(*) AS n_pairs
        |FROM pairs JOIN sp sa ON doc_a = sa.doc_id JOIN sp sb ON doc_b = sb.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Order-sensitive keyed state: one long per (user, type), settled
    // output identical to the batch q133 oracle.
    "q142_streaming_debounce" -> Entry(
      (s, d) => Events.streamingDebounce(s, d).orderBy("event_id"), Some(
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT *, lag(ms) OVER (PARTITION BY user_id, event_type ORDER BY ms, event_id) AS prev_ms FROM e)
        |SELECT event_id, user_id, event_type, ms FROM l
        |WHERE prev_ms IS NULL OR ms - prev_ms >= 600000 ORDER BY event_id""".stripMargin)),

    // Keep-longest retention policy per near-dup component (ties -> min
    // doc_id) atop the q99 component labels.
    "q141_keep_longest" -> Entry(
      (s, d) => Dedup.keepLongestRepresentativesFrom(
        Dedup.componentLabelsOn(s, d), docs(s, d)).orderBy("component"), Some(
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM s a JOIN s b
        |  ON a.doc_id <> b.doc_id
        |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.5),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON reach.node = e.src),
        |comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
        |j AS (SELECT c.component, c.doc_id, d.n_chars FROM comp c JOIN documents d USING (doc_id)),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY component
        |   ORDER BY n_chars DESC, doc_id) AS rn FROM j)
        |SELECT component, doc_id AS kept_doc, n_chars FROM r2 WHERE rn = 1
        |ORDER BY component""".stripMargin)),

    // Per-source dedup retention — kept docs counted under the
    // REPRESENTATIVE's source; sources fully absorbed elsewhere stay
    // visible via left join + zero-fill.
    "q143_dedup_rate" -> Entry(
      (s, d) => Dedup.dedupRateBySourceFrom(
        Dedup.componentLabelsOn(s, d), docs(s, d)).orderBy("source"), Some(
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM s a JOIN s b
        |  ON a.doc_id <> b.doc_id
        |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.5),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON reach.node = e.src),
        |comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
        |total AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |kept AS (SELECT d.source, count(*) AS n_kept FROM comp c
        |  JOIN documents d ON c.doc_id = d.doc_id
        |  WHERE c.doc_id = c.component GROUP BY 1)
        |SELECT t.source, t.n_docs, CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        | round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / CAST(t.n_docs AS DOUBLE), 6) AS retention
        |FROM total t LEFT JOIN kept k ON t.source = k.source ORDER BY 1""".stripMargin)),

    // "Take documents best-first until the token budget" as one frame —
    // integer running sum over the q119 naturalness ranking.
    "q144_token_budget" -> Entry(
      (s, d) => TextAnalysis.tokenBudgetCurve(docs(s, d)).orderBy("rank"), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |wc AS (SELECT term, count(*) AS n_tok FROM tok GROUP BY 1),
        |tot AS (SELECT sum(n_tok) AS n_total FROM wc),
        |lp AS (SELECT doc_id, count(*) AS n_tokens,
        | round(CAST(sum(CAST(ln(CAST(n_tok AS DOUBLE) / CAST(n_total AS DOUBLE))
        |     AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS avg_logprob
        | FROM tok JOIN wc USING (term) CROSS JOIN tot GROUP BY doc_id),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY avg_logprob DESC, doc_id) AS BIGINT) AS rank FROM lp)
        |SELECT rank, doc_id, avg_logprob, n_tokens,
        | CAST(sum(n_tokens) OVER (ORDER BY avg_logprob DESC, doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |FROM r ORDER BY rank""".stripMargin)),

    // Incremental novelty under ingestion order: a near-dup of an earlier
    // doc scores ~0 (its bigrams' first_doc precede it).
    "q145_doc_novelty" -> Entry(
      (s, d) => TextAnalysis.docNovelty(docsSpread(s, d)).orderBy("doc_id"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT DISTINCT doc_id, x.b FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)),
        |     i -> toks[i] || ' ' || toks[i+1]))) AS b
        |   FROM t WHERE len(toks) >= 2) x),
        |fs AS (SELECT b, min(doc_id) AS first_doc FROM bg GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        | CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        | round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty
        |FROM bg JOIN fs USING (b)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact distinct count WITHOUT a distinct-shuffle: n_types is a COUNT
    // over the (source, term) agg, n_tokens its sum.
    "q146_type_token_ratio" -> Entry(
      (s, d) => TextAnalysis.typeTokenRatio(docs(s, d)).orderBy("source"), Some(
      """WITH c AS (SELECT source, term, count(*) AS n FROM
        |  (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents) GROUP BY 1, 2)
        |SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens, count(*) AS n_types,
        | round(CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS ttr
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q128's entropy at the (ingestion-batch, source) time-series grain —
    // batch key = doc_id div 100 (arrival order; the fixture has no
    // ingestion date column).
    "q147_windowed_entropy" -> Entry(
      (s, d) => TextAnalysis.sourceEntropyByBatch(docs(s, d))
        .orderBy("ingest_batch", "source"), Some(
      """WITH tok AS (SELECT doc_id // 100 AS ingest_batch, source,
        |  unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT ingest_batch, source, term, count(*) AS n FROM tok GROUP BY 1, 2, 3)
        |SELECT t.ingest_batch, t.source, count(*) AS n_tokens,
        | round(ln(CAST(count(*) AS DOUBLE)) -
        |   CAST(sum(CAST(ln(CAST(c.n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS entropy
        |FROM tok t JOIN c ON t.ingest_batch = c.ingest_batch AND t.source = c.source AND t.term = c.term
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // q146's TTR at the same (ingestion-batch, source) grain.
    "q148_windowed_ttr" -> Entry(
      (s, d) => TextAnalysis.typeTokenRatioByBatch(docs(s, d))
        .orderBy("ingest_batch", "source"), Some(
      """WITH c AS (SELECT doc_id // 100 AS ingest_batch, source, term, count(*) AS n FROM
        |  (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2, 3)
        |SELECT ingest_batch, source, CAST(sum(n) AS BIGINT) AS n_tokens, count(*) AS n_types,
        | round(CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS ttr
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Dedup health headline: cluster-size distribution over the shared
    // q99 labels; the oracle re-walks the recursive closure and rolls up.
    "q150_component_sizes" -> Entry(
      (s, d) => Dedup.componentSizeHistogramFrom(Dedup.componentLabelsOn(s, d))
        .orderBy("csize"), Some(
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |e AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM s a JOIN s b
        |  ON a.doc_id <> b.doc_id
        |  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.5),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON reach.node = e.src),
        |comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
        |sz AS (SELECT component, count(*) AS csize FROM comp GROUP BY 1)
        |SELECT csize, count(*) AS n_components FROM sz GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental dedup: per ingestion batch (doc_id div 100), how many of
    // its docs near-dup a STRICTLY earlier batch — over the shared q124
    // md5-certified pair frame (doc_a is always the older side).
    "q151_history_dup_rate" -> Entry(
      (s, d) => Dedup.historyDupRateFrom(
        Dedup.minhashMd5PairsOn(s, d), docs(s, d)).orderBy("ingest_batch"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |stale AS (SELECT ingest_batch, count(*) AS n_dup FROM (
        |  SELECT DISTINCT doc_b // 100 AS ingest_batch, doc_b FROM pairs
        |  WHERE doc_a // 100 < doc_b // 100) GROUP BY 1),
        |tot AS (SELECT doc_id // 100 AS ingest_batch, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT t.ingest_batch, t.n_docs,
        | CAST(coalesce(st.n_dup, 0) AS BIGINT) AS n_dup_of_history,
        | round(CAST(coalesce(st.n_dup, 0) AS DOUBLE) / CAST(t.n_docs AS DOUBLE), 6) AS dup_rate
        |FROM tot t LEFT JOIN stale st USING (ingest_batch) ORDER BY 1""".stripMargin)),

    // Collocations by PMI over the corpus bigram/unigram totals; ordering
    // on the ROUNDED pmi (ties -> bigram) reproduces the oracle exactly.
    "q154_pmi_bigrams" -> Entry(
      (s, d) => TextAnalysis.pmiBigrams(docs(s, d)), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |uc AS (SELECT w, count(*) AS c FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
        |bg AS (SELECT x.bg FROM (SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t WHERE len(toks) >= 2) x),
        |n2 AS (SELECT count(*) AS n FROM bg),
        |bc AS (SELECT bg, count(*) AS c FROM bg GROUP BY 1),
        |j AS (SELECT bc.bg, bc.c AS c_ab, ua.c AS c_a, ub.c AS c_b
        | FROM bc JOIN uc ua ON ua.w = string_split(bc.bg, ' ')[1]
        | JOIN uc ub ON ub.w = string_split(bc.bg, ' ')[2]
        | WHERE bc.c >= 5)
        |SELECT bg AS bigram, c_ab, round(ln((CAST(c_ab AS DOUBLE) / CAST(n2.n AS DOUBLE)) /
        |  ((CAST(c_a AS DOUBLE) / CAST(n1.n AS DOUBLE)) * (CAST(c_b AS DOUBLE) / CAST(n1.n AS DOUBLE)))), 6) AS pmi
        |FROM j CROSS JOIN n1 CROSS JOIN n2
        |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin)),

    // Two-sample KS distance of each batch's length ECDF vs the rest of
    // the corpus — c_all recovered by summing per-batch cumulatives over
    // the complete grid, so neither engine runs a global window.
    "q153_length_drift_ks" -> Entry(
      (s, d) => TextAnalysis.lengthDriftKs(docs(s, d)).orderBy("ingest_batch"), Some(
      """WITH d AS (SELECT doc_id // 100 AS b, n_chars FROM documents),
        |cnt AS (SELECT b, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
        |nb AS (SELECT b, count(*) AS n_b FROM d GROUP BY 1),
        |nt AS (SELECT count(*) AS n_tot FROM d),
        |xs AS (SELECT DISTINCT n_chars FROM d),
        |grid AS (SELECT nb.b, nb.n_b, xs.n_chars FROM nb CROSS JOIN xs),
        |cum AS (SELECT g.b, g.n_b, g.n_chars,
        |  sum(coalesce(c.c, 0)) OVER (PARTITION BY g.b ORDER BY g.n_chars) AS c_batch
        | FROM grid g LEFT JOIN cnt c ON c.b = g.b AND c.n_chars = g.n_chars),
        |call AS (SELECT n_chars, sum(c_batch) AS c_all FROM cum GROUP BY 1)
        |SELECT b AS ingest_batch,
        | round(max(abs(CAST(c_batch AS DOUBLE) / n_b -
        |   CAST(c_all - c_batch AS DOUBLE) / (n_tot - n_b))), 6) AS ks_stat
        |FROM cum JOIN call USING (n_chars) CROSS JOIN nt
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The reference's IPF applied to the curation problem: one sweep of
    // biproportional fitting on the (source x lang) count matrix toward
    // uniform marginals -> per-cell sampling weights (q76 determinism
    // recipe: round between fits, decimal-exact column sums).
    "q160_rebalance_mixture" -> Entry(
      (s, d) => Curation.rebalanceMixture(docs(s, d)).orderBy("source", "lang"), Some(
      """WITH cells AS (SELECT source, lang, count(*) AS n_docs FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_tot,
        |  CAST(count(DISTINCT source) AS DOUBLE) AS n_src,
        |  CAST(count(DISTINCT lang) AS DOUBLE) AS n_lang FROM documents),
        |rs AS (SELECT source, sum(CAST(n_docs AS DOUBLE)) AS rsum FROM cells GROUP BY 1),
        |f1 AS (SELECT cells.source, lang, round(CAST(n_docs AS DOUBLE) * ((n_tot / n_src) / rsum), 6) AS v
        |  FROM cells JOIN rs USING (source) CROSS JOIN tot),
        |cs AS (SELECT lang, CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS csum FROM f1 GROUP BY 1),
        |f2 AS (SELECT source, f1.lang, round(v * ((n_tot / n_lang) / csum), 6) AS fitted
        |  FROM f1 JOIN cs USING (lang) CROSS JOIN tot)
        |SELECT f2.source, f2.lang, n_docs, fitted, round(fitted / n_docs, 6) AS weight
        |FROM f2 JOIN cells USING (source, lang) ORDER BY 1, 2""".stripMargin)),

    // Efraimidis-Spiliopoulos A-ES keys: ln(u)/w ranking == u^(1/w)
    // (monotone), u from the salted 60-bit md5 prefix -> deterministic
    // weight-proportional sample without replacement, both engines
    // computing identical integers into one log + one divide.
    "q161_weighted_sample" -> Entry(
      (s, d) => Curation.weightedSample(docs(s, d)), Some(
      """WITH h AS (SELECT doc_id, lang, source, n_chars,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsamp'), 1, 15)) AS BIGINT) AS u_int
        | FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
        |  round(ln((CAST(u_int AS DOUBLE) + 1.0) / 1152921504606846976.0)
        |        / CAST(n_chars AS DOUBLE), 6) AS es_key
        | FROM h)
        |SELECT * FROM k ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin)),

    // Streaming ingest vs static history: map-only band keys on the
    // stream, two stateless stream-static joins; oracle = the q124 batch
    // chain restricted to (history, final-batch) pairs. Band keys are
    // per-document, so indexing history separately changes nothing.
    "q162_streaming_history_neardup" -> Entry(
      (s, d) => Dedup.streamingHistoryNearDup(s, d).orderBy("doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |maxb AS (SELECT max(doc_id // 100) AS b FROM documents),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |  CROSS JOIN maxb
        |  WHERE a.doc_id // 100 < maxb.b AND b.doc_id // 100 = maxb.b),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT doc_a, doc_b, n_common,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin)),

    // Per-source A-ES top-n: selection by the UNROUNDED key through the
    // bounded aggregator (DoubleSortableBits embedding); the oracle's
    // row_number over the raw double agrees exactly — identical md5
    // integers -> identical doubles -> identical order.
    "q163_weighted_stratified" -> Entry(
      (s, d) => Curation.weightedStratified(docs(s, d)), Some(
      """WITH h AS (SELECT doc_id, source, n_chars,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wstrat'), 1, 15)) AS BIGINT) AS u_int
        | FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
        |  ln((CAST(u_int AS DOUBLE) + 1.0) / 1152921504606846976.0)
        |    / CAST(n_chars AS DOUBLE) AS es_raw
        | FROM h),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY es_raw DESC, doc_id) AS rn FROM k)
        |SELECT source, CAST(rn AS BIGINT) AS rank, doc_id, n_chars, round(es_raw, 6) AS es_key
        |FROM r WHERE rn <= 20 ORDER BY source, rank""".stripMargin)),

    // Duplicated-shingle ratio: df>1 prunes the join build side to the
    // duplicated set; one agg computes denominator and numerator.
    "q164_dup_shingle_ratio" -> Entry(
      (s, d) => TextAnalysis.dupShingleRatio(docs(s, d)), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1),
        |j AS (SELECT sh.doc_id, CASE WHEN dup.s IS NULL THEN 0 ELSE 1 END AS is_dup
        |  FROM sh LEFT JOIN dup ON sh.s = dup.s)
        |SELECT doc_id, count(*) AS n_shingles, CAST(sum(is_dup) AS BIGINT) AS n_shared,
        | round(CAST(sum(is_dup) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Contrastive importance weights (target = 'en' slice vs raw corpus),
    // Laplace-smoothed unigram LLR; per-term DECIMAL(28,12) x tf keeps the
    // per-doc sum order-independent (q119 rule).
    "q165_importance_weights" -> Entry(
      (s, d) => Curation.importanceWeights(docs(s, d)), Some(
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
        |raw AS (SELECT term, count(*) AS n_r FROM tok GROUP BY 1),
        |tgt AS (SELECT term, count(*) AS n_t FROM tok WHERE lang = 'en' GROUP BY 1),
        |consts AS (SELECT (SELECT sum(n_r) FROM raw) AS nr_tot,
        |           (SELECT COALESCE(sum(n_t), 0) FROM tgt) AS nt_tot,
        |           (SELECT count(*) FROM raw) AS v),
        |lr AS (SELECT r.term,
        |   CAST(ln((CAST(COALESCE(t.n_t, 0) AS DOUBLE) + 1.0) / CAST(nt_tot + v AS DOUBLE))
        |      - ln((CAST(r.n_r AS DOUBLE) + 1.0) / CAST(nr_tot + v AS DOUBLE)) AS DECIMAL(28,12)) AS llr
        |  FROM raw r LEFT JOIN tgt t USING (term) CROSS JOIN consts)
        |SELECT doc_id, count(*) AS n_tokens,
        | round(CAST(sum(llr) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS importance
        |FROM tok JOIN lr USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Okapi BM25 with Lucene idf: one double expression per (doc, term)
    // over exact integers + the shared avgdl scalar, DECIMAL(28,12) sums,
    // rounded-score top-k (the q158 retrieval shape + saturation/length
    // normalization).
    "q166_bm25_search" -> Entry(
      (s, d) => TextAnalysis.bm25Search(docs(s, d)), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |consts AS (SELECT count(*) AS n,
        |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        | FROM documents),
        |q AS (SELECT unnest(['spark', 'shuffle', 'hash']) AS term),
        |sc AS (SELECT tf.doc_id, count(*) AS n_matched,
        |  CAST(sum(CAST(
        |    ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |    (CAST(tf AS DOUBLE) * 2.2) /
        |    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |   AS DECIMAL(28,12))) AS DOUBLE) AS score
        | FROM tf JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN consts
        | GROUP BY 1)
        |SELECT doc_id, n_matched, round(score, 6) AS score
        |FROM sc ORDER BY round(score, 6) DESC, doc_id LIMIT 20""".stripMargin)),

    // One deterministic-seed Lloyd sweep: the hash-certifiable twin of the
    // IVF k-means training iteration (q159 assignment rule, per-cluster
    // element-wise means).
    "q167_lloyd_step" -> Entry(
      (s, d) => Similarity.lloydStep(emb(s, d)), Some(
      """WITH seeds AS (SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM embeddings WHERE vec_id < 8),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe FROM embeddings),
        |scored AS (SELECT vec_id, c_id,
        |  round(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) /
        |    (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |     sqrt(list_sum(list_transform(ce, x -> x * x)))), 6) AS cosine
        | FROM e CROSS JOIN seeds),
        |best AS (SELECT vec_id, c_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn FROM scored),
        |assign AS (SELECT vec_id, c_id FROM best WHERE rn = 1),
        |members AS (SELECT c_id, count(*) AS n FROM assign GROUP BY 1),
        |pts AS (SELECT a.c_id, x.pos, x.v FROM assign a JOIN embeddings em ON a.vec_id = em.vec_id,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
        |           unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS v) x)
        |SELECT CAST(p.c_id AS BIGINT) AS cluster, CAST(p.pos AS BIGINT) AS pos,
        |  round(avg(p.v), 6) AS centroid_v, CAST(any_value(m.n) AS BIGINT) AS n_members
        |FROM pts p JOIN members m ON p.c_id = m.c_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Two chained Lloyd sweeps (the q94 unroll pattern on q167): sweep 2
    // re-assigns against sweep 1's 6dp centroids and recomputes means,
    // certifying the repeated composition the k-means loop iterates.
    "q187_lloyd_two_step" -> Entry(
      (s, d) => Similarity.lloydTwoStep(emb(s, d)), Some(
      """WITH seeds AS (SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM embeddings WHERE vec_id < 8),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe FROM embeddings),
        |scored AS (SELECT vec_id, c_id,
        |  round(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) /
        |    (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |     sqrt(list_sum(list_transform(ce, x -> x * x)))), 6) AS cosine
        | FROM e CROSS JOIN seeds),
        |best AS (SELECT vec_id, c_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn FROM scored),
        |assign AS (SELECT vec_id, c_id FROM best WHERE rn = 1),
        |pts AS (SELECT a.c_id, x.pos, x.v FROM assign a JOIN embeddings em ON a.vec_id = em.vec_id,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
        |           unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS v) x),
        |cents1 AS (SELECT c_id, list(round(avg_v, 6) ORDER BY pos) AS ce FROM (
        |  SELECT c_id, pos, avg(v) AS avg_v FROM pts GROUP BY 1, 2) GROUP BY 1),
        |scored2 AS (SELECT e.vec_id, c.c_id,
        |  round(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) /
        |    (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |     sqrt(list_sum(list_transform(ce, x -> x * x)))), 6) AS cosine
        | FROM e CROSS JOIN cents1 c),
        |best2 AS (SELECT vec_id, c_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn FROM scored2),
        |assign2 AS (SELECT vec_id, c_id FROM best2 WHERE rn = 1),
        |members2 AS (SELECT c_id, count(*) AS n FROM assign2 GROUP BY 1),
        |pts2 AS (SELECT a.c_id, x.pos, x.v FROM assign2 a JOIN embeddings em ON a.vec_id = em.vec_id,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
        |           unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS v) x)
        |SELECT CAST(p.c_id AS BIGINT) AS cluster, CAST(p.pos AS BIGINT) AS pos,
        |  round(avg(p.v), 6) AS centroid_v, CAST(any_value(m.n) AS BIGINT) AS n_members
        |FROM pts2 p JOIN members2 m ON p.c_id = m.c_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // SemDeDup: cluster-bounded cosine pairs, keep-lowest-id drop rule.
    // The oracle replays assignment -> within-cluster pairs -> drop.
    "q168_semantic_dedup" -> Entry(
      (s, d) => Similarity.semanticDedup(emb(s, d)), Some(
      """WITH seeds AS (SELECT vec_id AS c_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM embeddings WHERE vec_id < 8),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe FROM embeddings),
        |scored AS (SELECT vec_id, c_id,
        |  round(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) /
        |    (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |     sqrt(list_sum(list_transform(ce, x -> x * x)))), 6) AS cosine
        | FROM e CROSS JOIN seeds),
        |best AS (SELECT vec_id, c_id,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn FROM scored),
        |assign AS (SELECT vec_id, c_id FROM best WHERE rn = 1),
        |m AS (SELECT a.c_id, a.vec_id, e.qe FROM assign a JOIN e ON a.vec_id = e.vec_id),
        |pairs AS (SELECT x.c_id, x.vec_id AS va, y.vec_id AS vb,
        |  round(list_sum(list_transform(range(1, len(x.qe) + 1), i -> x.qe[i] * y.qe[i])) /
        |    (sqrt(list_sum(list_transform(x.qe, v -> v * v))) *
        |     sqrt(list_sum(list_transform(y.qe, v -> v * v)))), 6) AS cosine
        | FROM m x JOIN m y ON x.c_id = y.c_id AND x.vec_id < y.vec_id)
        |SELECT CAST(c_id AS BIGINT) AS cluster, vb AS vec_id, min(va) AS dup_of,
        |  max(cosine) AS max_cos
        |FROM pairs WHERE cosine >= 0.35 GROUP BY 1, 2 ORDER BY vec_id""".stripMargin)),

    // CCNet-style head/middle/tail terciles of the unigram LM score per
    // lang; bucket stats are order-independent (count/sum/min/max).
    "q169_perplexity_buckets" -> Entry(
      (s, d) => TextAnalysis.perplexityBuckets(docs(s, d)), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |wc AS (SELECT term, count(*) AS n_tok FROM tok GROUP BY 1),
        |tot AS (SELECT sum(n_tok) AS n_total FROM wc),
        |lp AS (SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(sum(CAST(ln(CAST(n_tok AS DOUBLE) / CAST(n_total AS DOUBLE))
        |      AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS avg_logprob
        | FROM tok JOIN wc USING (term) CROSS JOIN tot GROUP BY doc_id),
        |b AS (SELECT d.lang, lp.n_tokens, lp.avg_logprob,
        |  ntile(3) OVER (PARTITION BY d.lang ORDER BY lp.avg_logprob DESC, lp.doc_id) AS t
        | FROM lp JOIN documents d USING (doc_id))
        |SELECT lang, CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        | round(min(avg_logprob), 6) AS min_lp, round(max(avg_logprob), 6) AS max_lp
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Order-sensitive streaming admission quota: first 20 events per user
    // by event time; settled output = the batch row_number oracle.
    "q170_streaming_quota" -> Entry(
      (s, d) => Events.streamingQuota(s, d).orderBy("event_id"), Some(
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ms, event_id) AS rank
        |  FROM e)
        |SELECT event_id, user_id, ms, CAST(rank AS BIGINT) AS rank FROM r
        |WHERE rank <= 20 ORDER BY event_id""".stripMargin)),

    // Nearest-in-time view per purchase within ±14d; argmin via
    // min(struct) — ties on |dt| break to the smaller view_id.
    "q171_nearest_event_join" -> Entry(
      (s, d) => Events.nearestEventJoin(s, d), Some(
      """WITH p AS (SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS v_id, epoch_ms(ts) AS v_ms FROM events
        |  WHERE event_type = 'view'),
        |j AS (SELECT p.user_id, p_id, v_id, abs(p_ms - v_ms) AS adt,
        |  row_number() OVER (PARTITION BY p_id ORDER BY abs(p_ms - v_ms), v_id) AS rn
        | FROM p JOIN v USING (user_id) WHERE abs(p_ms - v_ms) <= 1209600000)
        |SELECT user_id, p_id AS purchase_id, v_id AS view_id, CAST(adt AS BIGINT) AS abs_dt_ms
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin)),

    // Overlap@k between the TF-IDF and BM25 top lists — both rankers are
    // independently oracle-certified (q158, q166); this certifies their
    // set-level agreement.
    "q172_ranker_agreement" -> Entry(
      (s, d) => TextAnalysis.rankerAgreement(docs(s, d)), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |consts AS (SELECT count(*) AS n,
        |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        | FROM documents),
        |q AS (SELECT unnest(['spark', 'shuffle', 'hash']) AS term),
        |ts AS (SELECT tf.doc_id,
        |  round(CAST(sum(CAST(tf AS DECIMAL(9,0)) *
        |    CAST(ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        | FROM tf JOIN q USING (term) JOIN df USING (term) CROSS JOIN consts GROUP BY 1),
        |tr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_t
        |  FROM ts ORDER BY score DESC, doc_id LIMIT 20),
        |bs AS (SELECT tf.doc_id,
        |  round(CAST(sum(CAST(
        |    ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |    (CAST(tf AS DOUBLE) * 2.2) /
        |    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |   AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        | FROM tf JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN consts
        | GROUP BY 1),
        |br AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_b
        |  FROM bs ORDER BY score DESC, doc_id LIMIT 20),
        |fj AS (SELECT COALESCE(tr.doc_id, br.doc_id) AS doc_id, r_t, r_b
        |  FROM tr FULL JOIN br ON tr.doc_id = br.doc_id),
        |k AS (SELECT unnest([5, 10, 20]) AS k),
        |g AS (SELECT k.k,
        |  sum(CASE WHEN r_t <= k.k THEN 1 ELSE 0 END) AS n_tfidf,
        |  sum(CASE WHEN r_b <= k.k THEN 1 ELSE 0 END) AS n_bm25,
        |  sum(CASE WHEN r_t <= k.k AND r_b <= k.k THEN 1 ELSE 0 END) AS n_common
        | FROM fj CROSS JOIN k GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n_tfidf AS BIGINT) AS n_tfidf,
        | CAST(n_bm25 AS BIGINT) AS n_bm25, CAST(n_common AS BIGINT) AS n_common,
        | round(CAST(n_common AS DOUBLE) / CAST(n_tfidf + n_bm25 - n_common AS DOUBLE), 6) AS jaccard
        |FROM g ORDER BY k""".stripMargin)),

    // Exact-integer moment sums -> one closed-form double expression; the
    // reason it's not corr(): single-pass double covariance is
    // partition-order-dependent in both engines.
    "q173_source_corr" -> Entry(
      (s, d) => TextAnalysis.sourceLengthTokenCorr(docs(s, d)), Some(
      """WITH t AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS y FROM documents),
        |g AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |  sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM t GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        | round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |   (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS corr
        |FROM g ORDER BY source""".stripMargin)),

    // MinHash estimator calibration: the q124 chain + the sketch's own
    // agreement-fraction estimate per verified pair.
    "q174_minhash_error" -> Entry(
      (s, d) => Dedup.minhashErrorAuditOn(s, d), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |ver AS (SELECT * FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        |  WHERE jaccard >= 0.5),
        |est AS (SELECT v.doc_a, v.doc_b,
        |   CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / 8.0 AS est
        |  FROM ver v JOIN sig sa ON sa.doc_id = v.doc_a
        |   JOIN sig sb ON sb.doc_id = v.doc_b AND sb.seed = sa.seed
        |  GROUP BY 1, 2)
        |SELECT v.doc_a, v.doc_b, v.jaccard, round(e.est, 6) AS est_jaccard,
        | round(abs(e.est - v.jaccard), 6) AS abs_err
        |FROM ver v JOIN est e ON v.doc_a = e.doc_a AND v.doc_b = e.doc_b
        |ORDER BY v.doc_a, v.doc_b""".stripMargin)),

    // Rolling z on hourly counts: integer moments, one closed-form double
    // expression, full-lookback rows only.
    "q175_event_anomalies" -> Entry(
      (s, d) => Events.eventRateAnomalies(s, d), Some(
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h FROM events),
        |hr AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
        |w AS (SELECT event_type, h, n,
        |  count(n) OVER win AS w_n, sum(n) OVER win AS s1, sum(n*n) OVER win AS s2
        | FROM hr WINDOW win AS (PARTITION BY event_type ORDER BY h
        |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, h, CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 24.0) /
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 24.0) / 23.0), 6) AS z
        | FROM w WHERE w_n = 24 AND s2 * 24 > s1 * s1)
        |SELECT event_type, h, n, z FROM z WHERE abs(z) >= 2.0
        |ORDER BY event_type, h""".stripMargin)),

    // Deterministic shard assignment + chi-square balance vs the corpus
    // mixture over the densified shard x source grid.
    "q176_shard_balance" -> Entry(
      (s, d) => Curation.shardBalance(docs(s, d)), Some(
      """WITH sh AS (SELECT source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 15)) AS BIGINT) % 16 AS shard
        | FROM documents),
        |obs AS (SELECT shard, source, count(*) AS obs FROM sh GROUP BY 1, 2),
        |st AS (SELECT source, count(*) AS n_src FROM sh GROUP BY 1),
        |sht AS (SELECT shard, count(*) AS n_shard FROM sh GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM sh),
        |g AS (SELECT sht.shard, sht.n_shard, st.source, st.n_src, tot.n_total,
        |  COALESCE(obs.obs, 0) AS obs
        | FROM sht CROSS JOIN st CROSS JOIN tot
        | LEFT JOIN obs ON obs.shard = sht.shard AND obs.source = st.source)
        |SELECT shard, CAST(any_value(n_shard) AS BIGINT) AS n_shard,
        | round(CAST(sum(CAST(
        |   (CAST(obs AS DOUBLE) - CAST(n_shard AS DOUBLE) * CAST(n_src AS DOUBLE) / CAST(n_total AS DOUBLE)) *
        |   (CAST(obs AS DOUBLE) - CAST(n_shard AS DOUBLE) * CAST(n_src AS DOUBLE) / CAST(n_total AS DOUBLE)) /
        |   (CAST(n_shard AS DOUBLE) * CAST(n_src AS DOUBLE) / CAST(n_total AS DOUBLE))
        |  AS DECIMAL(28,12))) AS DOUBLE), 6) AS chi2
        |FROM g GROUP BY shard ORDER BY shard""".stripMargin)),

    // Quantizer QA: replay q92's exact scale + rounding, report per-vector
    // max/mean reconstruction error.
    "q177_quantization_error" -> Entry(
      (s, d) => Similarity.quantizationError(emb(s, d)), Some(
      """WITH m AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs FROM embeddings),
        |s AS (SELECT vec_id, xs, list_max(list_transform(xs, x -> abs(x))) AS mx FROM m),
        |sc AS (SELECT vec_id, xs, mx, CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale FROM s),
        |px AS (SELECT vec_id, mx, scale, unnest(xs) AS x FROM sc),
        |er AS (SELECT vec_id, mx,
        |  CASE WHEN scale > 0 THEN abs(x - floor(x * scale + 0.5) / scale) ELSE abs(x) END AS err
        | FROM px)
        |SELECT vec_id, round(max(mx), 6) AS mx, round(max(err), 9) AS max_err,
        | round(CAST(sum(CAST(err AS DECIMAL(28,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9) AS mean_err
        |FROM er GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // Live metric alarm: z-scores emitted as hours CLOSE; settled output
    // = the batch q175 scorer minus each type's final (still-open) hour.
    "q178_streaming_anomalies" -> Entry(
      (s, d) => Events.streamingAnomalies(s, d).orderBy("event_type", "h"), Some(
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h FROM events),
        |hr AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
        |mx AS (SELECT event_type, max(h) AS max_h FROM hr GROUP BY 1),
        |w AS (SELECT event_type, h, n,
        |  count(n) OVER win AS w_n, sum(n) OVER win AS s1, sum(n*n) OVER win AS s2
        | FROM hr WINDOW win AS (PARTITION BY event_type ORDER BY h
        |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, h, CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 24.0) /
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 24.0) / 23.0), 6) AS z
        | FROM w WHERE w_n = 24 AND s2 * 24 > s1 * s1)
        |SELECT z.event_type, z.h, z.n, z.z FROM z JOIN mx USING (event_type)
        |WHERE z.h < mx.max_h AND abs(z.z) >= 2.0
        |ORDER BY z.event_type, z.h""".stripMargin)),

    // Per-user lead() sequence -> |types|^2 transition counts + exact
    // conditional probabilities.
    "q179_event_transitions" -> Entry(
      (s, d) => Events.eventTransitions(s, d), Some(
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |t AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type FROM e),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM t
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
        | round(CAST(c.n AS DOUBLE) / CAST(n_from AS DOUBLE), 6) AS p
        |FROM c JOIN ft USING (from_type) ORDER BY 1, 2""".stripMargin)),

    // Shingles seen under >= 2 languages flag cross-lang boilerplate; the
    // df-style prune keeps the join build side to the multi-lang set.
    "q180_crosslang_shingles" -> Entry(
      (s, d) => TextAnalysis.crossLangShingleRatio(docs(s, d)), Some(
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang, x.s FROM (
        |   SELECT doc_id, lang, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |m AS (SELECT s FROM sh GROUP BY s HAVING count(DISTINCT lang) >= 2),
        |j AS (SELECT sh.doc_id, CASE WHEN m.s IS NULL THEN 0 ELSE 1 END AS f
        | FROM sh LEFT JOIN m ON sh.s = m.s)
        |SELECT doc_id, count(*) AS n_shingles, CAST(sum(f) AS BIGINT) AS n_crosslang,
        | round(CAST(sum(f) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS xlang_ratio
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Reciprocal-rank fusion of the two certified rankers; <=2 double
    // contributions per doc, 0 sentinel for absent ranks.
    "q181_rrf_fusion" -> Entry(
      (s, d) => TextAnalysis.rrfFusion(docs(s, d)), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |consts AS (SELECT count(*) AS n,
        |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        | FROM documents),
        |q AS (SELECT unnest(['spark', 'shuffle', 'hash']) AS term),
        |ts AS (SELECT tf.doc_id,
        |  round(CAST(sum(CAST(tf AS DECIMAL(9,0)) *
        |    CAST(ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        | FROM tf JOIN q USING (term) JOIN df USING (term) CROSS JOIN consts GROUP BY 1),
        |tr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_t
        |  FROM ts ORDER BY score DESC, doc_id LIMIT 20),
        |bs AS (SELECT tf.doc_id,
        |  round(CAST(sum(CAST(
        |    ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |    (CAST(tf AS DOUBLE) * 2.2) /
        |    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |   AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        | FROM tf JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN consts
        | GROUP BY 1),
        |br AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_b
        |  FROM bs ORDER BY score DESC, doc_id LIMIT 20),
        |fj AS (SELECT COALESCE(tr.doc_id, br.doc_id) AS doc_id,
        |  CAST(COALESCE(r_t, 0) AS BIGINT) AS r_tfidf,
        |  CAST(COALESCE(r_b, 0) AS BIGINT) AS r_bm25
        | FROM tr FULL JOIN br ON tr.doc_id = br.doc_id),
        |sc AS (SELECT doc_id, r_tfidf, r_bm25,
        |  round((CASE WHEN r_tfidf > 0 THEN 1.0 / (60.0 + CAST(r_tfidf AS DOUBLE)) ELSE 0.0 END) +
        |        (CASE WHEN r_bm25 > 0 THEN 1.0 / (60.0 + CAST(r_bm25 AS DOUBLE)) ELSE 0.0 END), 6) AS rrf
        | FROM fj)
        |SELECT doc_id, r_tfidf, r_bm25, rrf FROM sc
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // As-of backward latency per purchase -> exact interpolated quantiles
    // per market segment (the q81 percentile contract).
    "q182_purchase_latency" -> Entry(
      (s, d) => Events.purchaseLatency(s, d), Some(
      """WITH p AS (SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_ms(ts) AS v_ms FROM events WHERE event_type = 'view'),
        |l AS (SELECT p.user_id, p_id, p_ms - max(v_ms) AS latency
        |  FROM p JOIN v USING (user_id)
        |  WHERE v_ms <= p_ms AND v_ms >= p_ms - 1209600000
        |  GROUP BY p.user_id, p_id, p_ms),
        |s AS (SELECT c.c_mktsegment AS segment, l.latency
        |  FROM l JOIN customer c ON l.user_id = c.c_custkey),
        |g AS (SELECT segment, quantile_cont(latency, [0.5, 0.9, 0.99]) AS qs FROM s GROUP BY 1)
        |SELECT segment, CAST(i AS BIGINT) AS q_pos, round(qs[i], 6) AS latency_q
        |FROM g CROSS JOIN (SELECT unnest(range(1, 4)) AS i)
        |ORDER BY segment, q_pos""".stripMargin)),

    // Per-source term-distribution vitals: exact integer counts, one
    // double division per ratio.
    "q183_vocab_health" -> Entry(
      (s, d) => TextAnalysis.vocabHealth(docs(s, d)), Some(
      """WITH tf AS (SELECT source, term, count(*) AS tf FROM
        |  (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
        | GROUP BY 1, 2)
        |SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens, count(*) AS n_terms,
        | round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        |   CAST(count(*) AS DOUBLE), 6) AS hapax_ratio,
        | round(CAST(max(tf) AS DOUBLE) / CAST(sum(tf) AS DOUBLE), 6) AS top_term_share
        |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Label-quality audit: nearest-centroid assignment cross-tabulated
    // against the stored label (diagonal-dominant when labels separate).
    "q159_centroid_confusion" -> Entry(
      (s, d) => Similarity.centroidConfusion(emb(s, d)).orderBy("label", "assigned"), Some(
      """WITH pts AS (SELECT label, x.pos, x.v FROM embeddings,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
        |           unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS v) x),
        |cent AS (SELECT label AS c_label, list(round(avg_v, 6) ORDER BY pos) AS ce FROM (
        |  SELECT label, pos, avg(v) AS avg_v FROM pts GROUP BY 1, 2) GROUP BY 1),
        |e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe FROM embeddings),
        |scored AS (SELECT vec_id, e.label, c.c_label,
        |  round(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * ce[i])) /
        |    (sqrt(list_sum(list_transform(qe, x -> x * x))) *
        |     sqrt(list_sum(list_transform(ce, x -> x * x)))), 6) AS cosine
        | FROM e CROSS JOIN cent c),
        |best AS (SELECT vec_id, label, c_label,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_label) AS rn FROM scored)
        |SELECT CAST(label AS BIGINT) AS label, CAST(c_label AS BIGINT) AS assigned, count(*) AS n
        |FROM best WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Median/MAD outlier report — the robust rule that survives the
    // outliers it hunts; percentile == quantile_cont (the q81 rule).
    "q157_robust_outliers" -> Entry(
      (s, d) => Curation.robustLengthOutliers(docs(s, d)).orderBy("source"), Some(
      """WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS med FROM documents GROUP BY 1),
        |dev AS (SELECT d.source, d.n_chars, abs(d.n_chars - m.med) AS adev, m.med
        | FROM documents d JOIN med m USING (source)),
        |madt AS (SELECT source, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT v.source, round(max(v.med), 6) AS median_chars, round(max(t.mad), 6) AS mad,
        | CAST(sum(CASE WHEN t.mad > 0 AND abs(v.n_chars - v.med) > 2.0 * 1.4826 * t.mad
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev v JOIN madt t USING (source)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Inverted-index probe: only the query terms' postings leave the scan;
    // per-doc score sum rides decimal x integer (the q119 rule).
    "q158_tfidf_search" -> Entry(
      (s, d) => TextAnalysis.tfidfSearch(docsSpread(s, d)), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |q AS (SELECT unnest(['spark', 'shuffle', 'hash']) AS term),
        |sc AS (SELECT tf.doc_id,
        |  CAST(sum(CAST(tf.tf AS DECIMAL(9,0)) *
        |    CAST(ln(CAST(n.n AS DOUBLE) / df.df) AS DECIMAL(28,12))) AS DOUBLE) AS score,
        |  count(*) AS n_matched
        | FROM tf JOIN q USING (term) JOIN df USING (term) CROSS JOIN n GROUP BY 1)
        |SELECT doc_id, n_matched, round(score, 6) AS score
        |FROM sc ORDER BY round(score, 6) DESC, doc_id LIMIT 20""".stripMargin)),

    // Subset/quote detection Jaccard misses: containment |A∩B|/min(|A|,|B|)
    // over the q126 df-pruned candidate generator; verify is pure integers.
    "q155_containment_pairs" -> Entry(
      (s, d) => Dedup.containmentPairs(docs(s, d)).orderBy("doc_a", "doc_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sets AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |rare AS (SELECT s FROM (SELECT s, count(*) AS df FROM sets GROUP BY 1)
        |  WHERE df BETWEEN 2 AND 20),
        |posting AS (SELECT doc_id, s FROM sets JOIN rare USING (s)),
        |cand AS (SELECT doc_a, doc_b FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |  FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2) WHERE n_shared >= 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sets sa ON sa.doc_id = doc_a
        |  JOIN sets sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common, na.n AS n_a, nb.n AS n_b,
        | round(CAST(n_common AS DOUBLE) / least(na.n, nb.n), 6) AS containment
        |FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id
        |WHERE round(CAST(n_common AS DOUBLE) / least(na.n, nb.n), 6) >= 0.8
        |ORDER BY 1, 2""".stripMargin)),

    // Embedding-space drift per ingestion batch: cosine(batch centroid,
    // corpus centroid); centroids rounded then DECIMAL so the reduction is
    // order-independent on both engines.
    "q156_centroid_drift" -> Entry(
      (s, d) => Similarity.batchCentroidDrift(emb(s, d)).orderBy("ingest_batch"), Some(
      """WITH pts AS (SELECT vec_id // 100 AS b, x.pos - 1 AS pos, x.v FROM embeddings,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
        |           unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS v) x),
        |cb AS (SELECT b, pos, CAST(round(avg(v), 6) AS DECIMAL(12,6)) AS cb FROM pts GROUP BY 1, 2),
        |ca AS (SELECT pos, CAST(round(avg(v), 6) AS DECIMAL(12,6)) AS ca FROM pts GROUP BY 1)
        |SELECT b AS ingest_batch,
        | round(CAST(sum(cb * ca) AS DOUBLE) /
        |   (sqrt(CAST(sum(cb * cb) AS DOUBLE)) * sqrt(CAST(sum(ca * ca) AS DOUBLE))), 6) AS centroid_cosine
        |FROM cb JOIN ca USING (pos) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Rank-based length calibration: within-source percent_rank deciles
    // (ties broken by doc_id, so pr = (rank-1)/(n-1) on identical integers
    // is bit-equal across engines).
    "q152_length_deciles" -> Entry(
      (s, d) => Curation.lengthDeciles(docs(s, d)).orderBy("doc_id"), Some(
      """WITH p AS (SELECT doc_id, source, n_chars,
        |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS pr FROM documents)
        |SELECT doc_id, source, n_chars,
        | CAST(least(9, CAST(floor(pr * 10) AS BIGINT)) AS BIGINT) AS decile
        |FROM p ORDER BY doc_id""".stripMargin)),

    // Expanding COUNT DISTINCT rewritten as first-touch + running sum —
    // the growth-curve rewrite that avoids per-day distinct sets.
    "q139_cumulative_users" -> Entry(
      (s, d) => Events.cumulativeUsers(s, d).orderBy("day"), Some(
      """WITH f AS (SELECT user_id, min(epoch_ms(ts) // 86400000) AS first_day FROM events GROUP BY 1),
        |d AS (SELECT first_day AS day, count(*) AS n_new FROM f GROUP BY 1)
        |SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin)),

    // Exact substring-level dedup (Lee et al. 2022): maximal runs of >= 50
    // consecutive tokens duplicated verbatim across documents, via stride-1
    // 8-token window digests -> kept-if-in->1-docs -> per-doc
    // gaps-and-islands span merge. The chained-CTE oracle replays every
    // stage; span_tokens is exact (see Dedup.duplicatedSpans scaladoc).
    "q184_dup_spans" -> Entry(
      (s, d) => Dedup.duplicatedSpans(docsSpread(s, d)).orderBy("doc_id", "span_start"), Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, CAST(i AS BIGINT) AS start_pos,
        |    md5(array_to_string(t[i:i+7], ' ')) AS h
        |  FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i) WHERE len(t) >= 8),
        |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) > 1),
        |d AS (SELECT w.doc_id, w.start_pos,
        |    row_number() OVER (PARTITION BY w.doc_id ORDER BY w.start_pos) AS rn
        |  FROM w JOIN dup USING (h)),
        |g AS (SELECT doc_id, start_pos - rn AS grp, min(start_pos) AS span_start,
        |    max(start_pos) AS span_last, count(*) AS n_windows
        |  FROM d GROUP BY doc_id, start_pos - rn)
        |SELECT doc_id, span_start, span_last - span_start + 8 AS span_tokens, n_windows
        |FROM g WHERE span_last - span_start + 8 >= 50
        |ORDER BY doc_id, span_start""".stripMargin)),

    // duplicatedSpans with the codegen'd rolling Karp-Rabin digest stage
    // (WindowHashes expression): the oracle re-derives the identical
    // double-modulus packed hashes per window (non-rolling Horner — same
    // values, O(n*w) is fine at oracle scale), then runs q184's islands.
    "q198_dup_spans_rolling" -> Entry(
      (s, d) => Dedup.duplicatedSpansRolling(docsSpread(s, d)).orderBy("doc_id", "span_start"), Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tv AS (SELECT doc_id, t,
        |   list_transform(t, tok ->
        |     CAST(list_reduce(list_prepend('0', string_split(tok, '')),
        |       (acc, c) -> CAST((CAST(acc AS BIGINT) * 31 + ascii(c)) % 1000000007 AS VARCHAR)) AS BIGINT)) AS v1,
        |   list_transform(t, tok ->
        |     CAST(list_reduce(list_prepend('0', string_split(tok, '')),
        |       (acc, c) -> CAST((CAST(acc AS BIGINT) * 131 + ascii(c)) % 998244353 AS VARCHAR)) AS BIGINT)) AS v2
        | FROM toks WHERE len(t) >= 8),
        |w AS (SELECT doc_id, CAST(i AS BIGINT) AS start_pos,
        |   list_reduce(list_prepend(CAST(0 AS BIGINT), v1[i:i+7]),
        |     (acc, x) -> (acc * 1000003 + x) % 1000000007) * 2147483648
        | + list_reduce(list_prepend(CAST(0 AS BIGINT), v2[i:i+7]),
        |     (acc, x) -> (acc * 1000033 + x) % 998244353) AS h
        |  FROM tv, unnest(range(1, len(t) - 8 + 2)) AS u(i)),
        |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) > 1),
        |d AS (SELECT w.doc_id, w.start_pos,
        |    row_number() OVER (PARTITION BY w.doc_id ORDER BY w.start_pos) AS rn
        |  FROM w JOIN dup USING (h)),
        |g AS (SELECT doc_id, start_pos - rn AS grp, min(start_pos) AS span_start,
        |    max(start_pos) AS span_last, count(*) AS n_windows
        |  FROM d GROUP BY doc_id, start_pos - rn)
        |SELECT doc_id, span_start, span_last - span_start + 8 AS span_tokens, n_windows
        |FROM g WHERE span_last - span_start + 8 >= 50
        |ORDER BY doc_id, span_start""".stripMargin)),

    // BPE vocabulary learning, 2 merge iterations unrolled (the q94 chained
    // certification pattern): each step's argmax pair depends on the full
    // merge application of every preceding step, so a hash match certifies
    // pair counting, deterministic tiebreak, and the left-to-right
    // non-overlapping replace. Both engines run the same string fold
    // (TextAnalysis.bpeMerges scaladoc).
    "q185_bpe_merges" -> Entry(
      (s, d) => TextAnalysis.bpeMerges(docs(s, d), steps = 2).orderBy("step"), Some(
      """WITH v0 AS (
        |  SELECT piece, count(*) AS freq,
        |    trim(regexp_replace(piece, '(.)', '\1 ', 'g')) AS symstr
        |  FROM (SELECT unnest(regexp_extract_all(text,
        |          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS piece FROM documents)
        |  GROUP BY piece),
        |p1 AS (
        |  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(symstr, ' ') AS s FROM v0),
        |       unnest(range(1, len(s))) u(i)
        |  GROUP BY 1, 2),
        |b1 AS (SELECT sym_a, sym_b, pair_count FROM p1
        |       ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
        |v1 AS (
        |  SELECT piece, freq,
        |    list_reduce(string_split(symstr, ' '), (acc, x) ->
        |      CASE WHEN regexp_extract(acc, '[^ ]*$') = sym_a AND x = sym_b
        |        THEN regexp_replace(acc, '[^ ]*$', '') || sym_a || sym_b
        |        ELSE acc || ' ' || x END) AS symstr
        |  FROM v0 CROSS JOIN b1),
        |p2 AS (
        |  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(symstr, ' ') AS s FROM v1),
        |       unnest(range(1, len(s))) u(i)
        |  GROUP BY 1, 2),
        |b2 AS (SELECT sym_a, sym_b, pair_count FROM p2
        |       ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS step, sym_a, sym_b, pair_count FROM b1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT) AS step, sym_a, sym_b, pair_count FROM b2
        |ORDER BY step""".stripMargin)),

    // Tokenizer application: encode the corpus with q185's learned
    // 2-merge vocabulary — per doc, pre-split piece count and post-merge
    // BPE token count. One vocab equi-join + one hash agg; the oracle
    // replays the full train-then-encode chain.
    "q188_bpe_encode" -> Entry(
      (s, d) => TextAnalysis.bpeEncode(docs(s, d), steps = 2).orderBy("doc_id"), Some(
      """WITH v0 AS (
        |  SELECT piece, count(*) AS freq,
        |    trim(regexp_replace(piece, '(.)', '\1 ', 'g')) AS symstr
        |  FROM (SELECT unnest(regexp_extract_all(text,
        |          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS piece FROM documents)
        |  GROUP BY piece),
        |p1 AS (
        |  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(symstr, ' ') AS s FROM v0),
        |       unnest(range(1, len(s))) u(i)
        |  GROUP BY 1, 2),
        |b1 AS (SELECT sym_a, sym_b FROM p1
        |       ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
        |v1 AS (
        |  SELECT piece, freq,
        |    list_reduce(string_split(symstr, ' '), (acc, x) ->
        |      CASE WHEN regexp_extract(acc, '[^ ]*$') = sym_a AND x = sym_b
        |        THEN regexp_replace(acc, '[^ ]*$', '') || sym_a || sym_b
        |        ELSE acc || ' ' || x END) AS symstr
        |  FROM v0 CROSS JOIN b1),
        |p2 AS (
        |  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(symstr, ' ') AS s FROM v1),
        |       unnest(range(1, len(s))) u(i)
        |  GROUP BY 1, 2),
        |b2 AS (SELECT sym_a, sym_b FROM p2
        |       ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
        |v2 AS (
        |  SELECT piece,
        |    list_reduce(string_split(symstr, ' '), (acc, x) ->
        |      CASE WHEN regexp_extract(acc, '[^ ]*$') = sym_a AND x = sym_b
        |        THEN regexp_replace(acc, '[^ ]*$', '') || sym_a || sym_b
        |        ELSE acc || ' ' || x END) AS symstr
        |  FROM v1 CROSS JOIN b2),
        |d AS (SELECT doc_id, unnest(regexp_extract_all(text,
        |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS piece FROM documents)
        |SELECT doc_id, count(*) AS n_pieces,
        |  CAST(sum(len(string_split(v2.symstr, ' '))) AS BIGINT) AS n_bpe_tokens
        |FROM d JOIN v2 USING (piece)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Tokenizer fertility per language on the LEARNED q185/q188 BPE
    // vocab: BPE tokens per word + chars per BPE token — the
    // multilingual tokenizer-quality statistic (under-represented
    // languages fragment into more pieces). q188's per-doc encode joined
    // to lang; integer sums, two final divisions.
    "q262_bpe_fertility" -> Entry(
      (s, d) => TextAnalysis.bpeFertility(docs(s, d), steps = 2).orderBy("lang"), Some(
      """WITH v0 AS (
        |  SELECT piece, count(*) AS freq,
        |    trim(regexp_replace(piece, '(.)', '\1 ', 'g')) AS symstr
        |  FROM (SELECT unnest(regexp_extract_all(text,
        |          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS piece FROM documents)
        |  GROUP BY piece),
        |p1 AS (
        |  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(symstr, ' ') AS s FROM v0),
        |       unnest(range(1, len(s))) u(i)
        |  GROUP BY 1, 2),
        |b1 AS (SELECT sym_a, sym_b FROM p1
        |       ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
        |v1 AS (
        |  SELECT piece, freq,
        |    list_reduce(string_split(symstr, ' '), (acc, x) ->
        |      CASE WHEN regexp_extract(acc, '[^ ]*$') = sym_a AND x = sym_b
        |        THEN regexp_replace(acc, '[^ ]*$', '') || sym_a || sym_b
        |        ELSE acc || ' ' || x END) AS symstr
        |  FROM v0 CROSS JOIN b1),
        |p2 AS (
        |  SELECT s[i] AS sym_a, s[i+1] AS sym_b, CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(symstr, ' ') AS s FROM v1),
        |       unnest(range(1, len(s))) u(i)
        |  GROUP BY 1, 2),
        |b2 AS (SELECT sym_a, sym_b FROM p2
        |       ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
        |v2 AS (
        |  SELECT piece,
        |    list_reduce(string_split(symstr, ' '), (acc, x) ->
        |      CASE WHEN regexp_extract(acc, '[^ ]*$') = sym_a AND x = sym_b
        |        THEN regexp_replace(acc, '[^ ]*$', '') || sym_a || sym_b
        |        ELSE acc || ' ' || x END) AS symstr
        |  FROM v1 CROSS JOIN b2),
        |d AS (SELECT doc_id, unnest(regexp_extract_all(text,
        |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS piece FROM documents),
        |pd AS (SELECT doc_id, count(*) AS n_pieces,
        |    CAST(sum(len(string_split(v2.symstr, ' '))) AS BIGINT) AS n_bpe
        |  FROM d JOIN v2 USING (piece) GROUP BY doc_id),
        |c AS (SELECT doc_id, lang, length(replace(text, ' ', '')) AS chars
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_pieces) AS BIGINT) AS n_words,
        | CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
        | round(CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_pieces) AS DOUBLE), 6) AS fertility,
        | round(CAST(sum(chars) AS DOUBLE) / CAST(sum(n_bpe) AS DOUBLE), 6) AS chars_per_token
        |FROM c JOIN pd USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Lead-lag cross-correlation between the view and purchase daily
    // series on the q227 zero-filled spine: exact integer moment sums per
    // lag (the pairing self-joins run on the <=|calendar|-row frame),
    // one closed-form Pearson division at the end.
    "q263_lead_lag_corr" -> Entry(
      (s, d) => Events.leadLagCorr(s, d).orderBy("lag"), Some(
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
        |c AS (SELECT day,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        | FROM e GROUP BY 1),
        |mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM mm),
        |daily AS (SELECT spine.day, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
        | FROM spine LEFT JOIN c USING (day)),
        |m AS (SELECT l.lag, count(*) AS n_days,
        |  CAST(sum(a.x) AS BIGINT) AS sx, CAST(sum(b.y) AS BIGINT) AS sy,
        |  CAST(sum(a.x * b.y) AS BIGINT) AS sxy,
        |  CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
        |  CAST(sum(b.y * b.y) AS BIGINT) AS syy
        | FROM (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS lag) l
        | JOIN daily a ON true
        | JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
        | GROUP BY 1)
        |SELECT lag, n_days,
        | round(CAST(n_days * sxy - sx * sy AS DOUBLE) /
        |   sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE) *
        |        CAST(n_days * syy - sy * sy AS DOUBLE)), 6) AS r
        |FROM m ORDER BY lag""".stripMargin)),

    // DoReMi-style one-step mixture reweighting (Xie et al. 2023) over the
    // q189 corpus bigram LM: per-source excess loss vs the corpus mean
    // exponentiates into new mixture weights — sources the LM finds HARDER
    // gain weight. Per-bigram ln() quantizes to DECIMAL(28,12) before the
    // per-source sums (q189 rule); the exp() scores quantize to
    // DECIMAL(30,18) before the normalizing sum (q219 rule).
    "q265_doremi_step" -> Entry(
      (s, d) => TextAnalysis.doremiStep(docs(s, d)).orderBy("source"), Some(
      """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT source, t[i-1] AS a, t[i] AS b
        |  FROM toks, unnest(range(2, len(t) + 1)) u(i) WHERE len(t) >= 2),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2),
        |ca AS (SELECT a, sum(c_ab) AS c_a FROM cab GROUP BY 1),
        |v AS (SELECT count(DISTINCT term) AS v FROM
        |  (SELECT unnest(string_split(text, ' ')) AS term FROM documents)),
        |scored AS (SELECT source, count(*) AS n_bigrams,
        |  sum(CAST(ln((c_ab + 1.0) / (c_a + v)) AS DECIMAL(28,12))) AS lp
        | FROM bg JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v
        | GROUP BY source),
        |tot AS (SELECT CAST(sum(n_bigrams) AS BIGINT) AS n_all, sum(lp) AS lp_all FROM scored),
        |base AS (SELECT source, n_bigrams,
        |  -CAST(lp AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS loss,
        |  (-CAST(lp AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
        |    - (-CAST(lp_all AS DOUBLE) / CAST(n_all AS DOUBLE)) AS excess,
        |  CAST(n_bigrams AS DOUBLE) / CAST(n_all AS DOUBLE) AS w_old
        | FROM scored CROSS JOIN tot),
        |sc AS (SELECT source, n_bigrams, loss, excess, w_old,
        |  CAST(w_old * exp(1.0 * excess) AS DECIMAL(30,18)) AS score FROM base),
        |z AS (SELECT sum(score) AS z FROM sc)
        |SELECT source, n_bigrams, round(loss, 6) AS loss,
        | round(excess, 6) AS excess, round(w_old, 6) AS weight_old,
        | round(CAST(score AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight_new
        |FROM sc CROSS JOIN z ORDER BY source""".stripMargin)),

    // Cross-source contamination matrix: the md5-family verified near-dup
    // pairs (q124's shared cache) rolled up to unordered source-pair
    // cells — pair counts + DECIMAL-exact mean Jaccard. The between-
    // dataset overlap report a corpus assembler reads before mixing.
    "q270_source_contamination" -> Entry((s, d) =>
      Dedup.sourceContamination(s, d).orderBy("source_a", "source_b"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |h AS (SELECT doc_id, seed, CAST(list_reduce(
        |   list_prepend('0', string_split(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15), '')),
        |   (acc, c) -> CAST(CAST(acc AS BIGINT) * 16 + strpos('0123456789abcdef', c) - 1 AS VARCHAR)) AS BIGINT) AS h
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS minhash FROM h GROUP BY 1, 2),
        |banded AS (SELECT doc_id, seed // 2 AS band_id,
        |   string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|' ORDER BY seed) AS band_key
        |  FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_key = b.band_key
        |    AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        |  FROM cand JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b AND sb.s = sa.s
        |  GROUP BY 1, 2),
        |vp AS (SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT doc_a, doc_b,
        |   round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
        |  FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id)
        | WHERE jaccard >= 0.5),
        |lab AS (SELECT vp.jaccard, da.source AS src_a, db.source AS src_b
        |  FROM vp JOIN documents da ON da.doc_id = vp.doc_a
        |    JOIN documents db ON db.doc_id = vp.doc_b)
        |SELECT least(src_a, src_b) AS source_a, greatest(src_a, src_b) AS source_b,
        | count(*) AS n_pairs,
        | round(CAST(sum(CAST(jaccard AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_jaccard
        |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Gopher repetition metrics: per-doc duplicate 2-/3-gram fractions +
    // top-2-gram occupancy share, gate verdict by integer basis-point
    // cross-multiplication (q260 rule).
    "q271_repetition_gate" -> Entry((s, d) =>
      TextAnalysis.repetitionMetrics(docs(s, d)).orderBy("doc_id"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        |  FROM t, unnest(range(1, len(toks))) u(i)),
        |tg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
        |  FROM t, unnest(range(1, len(toks) - 1)) u(i)),
        |b2 AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
        |a2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2, count(*) AS d2,
        |  CAST(max(c) AS BIGINT) AS top2 FROM b2 GROUP BY 1),
        |b3 AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
        |a3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3, count(*) AS d3
        |  FROM b3 GROUP BY 1)
        |SELECT a2.doc_id, n2 AS n_2grams,
        | round(CAST(n2 - d2 AS DOUBLE) / n2, 6) AS dup_2gram_frac,
        | n3 AS n_3grams,
        | round(CAST(n3 - d3 AS DOUBLE) / n3, 6) AS dup_3gram_frac,
        | round(CAST(top2 AS DOUBLE) / n2, 6) AS top_2gram_share,
        | ((n3 - d3) * 10000 <= 2500 * n3 AND top2 * 10000 <= 2000 * n2) AS pass
        |FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id ORDER BY a2.doc_id""".stripMargin)),

    // Shingle-novelty curve across ingest batches: per arrival batch, the
    // fraction of its distinct 3-shingles never seen earlier — the
    // mined-out signal. Real window(ingest_ts) grouping; the oracle's
    // doc_id // batchSize arithmetic is exact (Ingest convention).
    "q272_shingle_novelty" -> Entry((s, d) =>
      TextAnalysis.shingleNovelty(docsSpread(s, d)).orderBy("batch"), Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id // 100 AS batch, x.s FROM (
        |   SELECT doc_id, unnest(list_distinct(list_transform(
        |     range(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |   FROM t WHERE len(toks) >= 3) x),
        |f AS (SELECT s, min(batch) AS fb FROM sh GROUP BY 1)
        |SELECT batch, count(*) AS n_shingles,
        | CAST(sum(CASE WHEN fb = batch THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        | round(CAST(sum(CASE WHEN fb = batch THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS novelty
        |FROM sh JOIN f USING (s) GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, e) => n -> e.fn }.toMap

  val oracleSql: Map[String, String] =
    all.collect { case (n, Entry(_, Some(sql))) => n -> sql }.toMap
}
