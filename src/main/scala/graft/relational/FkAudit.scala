package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Referential-integrity audit over the warehouse's foreign-key graph —
  * the data-quality gate a 100 TB ingest runs before anything joins:
  * per FK edge, the child row count and the orphan count (child rows whose
  * key matches no parent). A silent orphan doesn't fail a join — it
  * silently DROPS revenue from every inner join downstream, which is why
  * the audit surfaces counts instead of trusting constraints that parquet
  * lakes don't enforce.
  *
  * Shape: one left join + conditional count per edge (the parent side is
  * a dimension — broadcastable; the child scan reads only the key column,
  * so each audit is a column-pruned pass), unioned into the report frame.
  * All seven edges of the TPC-H-ish fixture graph are audited; hash
  * equality with the DuckDB oracle (same LEFT JOINs) certifies the counts
  * exactly (q213).
  */
object FkAudit {

  /** One FK edge's audit row; public so callers can audit their own
    * parent/child pairs (and the spec can plant orphans). */
  def edge(name: String, child: DataFrame, ck: String,
      parent: DataFrame, pk: String): DataFrame =
    child.select(col(ck))
      .join(parent.select(col(pk).as(ck), lit(1).as("__hit")), Seq(ck), "left")
      .agg(count(lit(1)).as("n_child_rows"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_orphans"))
      .select(lit(name).as("relationship"), col("n_child_rows"),
        col("n_orphans"))

  def audit(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables(spark, dir, n)
    Seq(
      edge("customer.c_nationkey->nation", t("customer"), "c_nationkey", t("nation"), "n_nationkey"),
      edge("lineitem.l_orderkey->orders", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey"),
      edge("lineitem.l_partkey->part", t("lineitem"), "l_partkey", t("part"), "p_partkey"),
      edge("lineitem.l_suppkey->supplier", t("lineitem"), "l_suppkey", t("supplier"), "s_suppkey"),
      edge("nation.n_regionkey->region", t("nation"), "n_regionkey", t("region"), "r_regionkey"),
      edge("orders.o_custkey->customer", t("orders"), "o_custkey", t("customer"), "c_custkey"),
      edge("supplier.s_nationkey->nation", t("supplier"), "s_nationkey", t("nation"), "n_nationkey")
    ).reduce(_.unionAll(_))
  }

  /** q214: cascading-delete impact analysis — the right-to-be-forgotten
    * dry run. Given a deterministic tombstone predicate on customers
    * (`c_custkey % modulus = 0` stands in for the deletion list), report
    * how many rows each downstream table loses when the delete cascades
    * along the FK graph: customer → orders → lineitem. Each hop is a
    * semi-join on the previous hop's keys (hash-partitioned, the delete
    * list side is small and broadcastable) — the impact report a lake
    * without enforced constraints must compute BEFORE rewriting 100 TB of
    * files, because the cascade's cost, not the tombstone count, is the
    * write amplification. */
  def cascadeDeleteImpact(spark: SparkSession, dir: String,
      modulus: Long = 37L): DataFrame = {
    def t(n: String) = Tables(spark, dir, n)
    val custs = t("customer").filter(pmod(col("c_custkey"), lit(modulus)) === 0L)
      .select(col("c_custkey"))
    val orders = t("orders").join(custs,
      col("o_custkey") === col("c_custkey"), "left_semi")
    val lineitems = t("lineitem").join(orders.select(col("o_orderkey")),
      Seq("o_orderkey").map(c => col(c) === col("l_orderkey")).head, "left_semi")
    Seq(
      custs.agg(count(lit(1)).as("n_rows_deleted"))
        .select(lit("customer").as("table_name"), col("n_rows_deleted")),
      orders.agg(count(lit(1)).as("n_rows_deleted"))
        .select(lit("orders").as("table_name"), col("n_rows_deleted")),
      lineitems.agg(count(lit(1)).as("n_rows_deleted"))
        .select(lit("lineitem").as("table_name"), col("n_rows_deleted"))
    ).reduce(_.unionAll(_))
  }
}
