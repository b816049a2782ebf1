package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a WHOLE custom operator — the one Catalyst
  * extension mechanism the repo's expression/rule work doesn't exercise:
  * a logical node ([[TopKPerGroupNode]]) planned by an injected
  * [[SparkStrategy]] into a physical [[TopKPerGroupExec]].
  *
  * Why an operator and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY o) <= k` SORTS every group completely — per-partition
  * O(n log n) work and O(group) memory (spilling at 100 TB) to keep k
  * rows. The exec instead folds each partition once through per-group
  * BOUNDED HEAPS: O(n log k) work, O(groups·k) memory, no sort, no spill
  * path. `requiredChildDistribution = ClusteredDistribution(group)` lets
  * Spark insert the one hash exchange (or reuse an existing
  * partitioning); output order within a group is deliberately
  * unspecified, exactly like an aggregation.
  *
  * The q80 quota Aggregator already proves the bounded-buffer idea at
  * the AGGREGATE level (map-side combinable, but its buffer rides
  * serialized agg state); this is the same idea as a first-class
  * physical operator on raw rows — full rows out, no re-join, plan
  * shows `TopKPerGroupExec` where the window form shows Sort+Window.
  * Certified output-identical to the window spelling by the q287 oracle
  * (ties broken inside the SortOrder list, so top-k is unique) and a
  * brute-force property spec.
  *
  * Install via [[TopKPerGroup.installedIn]]
  * (`spark.experimental.extraStrategies`) or
  * [[graft.functions.GraftExtensions]]. */
final case class TopKPerGroupNode(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, child.output)
      // total order over full rows (ties resolved by later SortOrders);
      // heap head = the WORST retained row, for O(log k) replacement
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(order, output)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < k) h.enqueue(row.copy())
            else if (ord.lt(row, h.head)) { h.dequeue(); h.enqueue(row.copy()) }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** Idempotently install the planning strategy into a session. */
  def installedIn(spark: SparkSession): SparkSession = {
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    spark
  }

  /** Top `k` rows per group of `df`, ordered by `orderSpec` —
    * `(columnName, ascending)` pairs evaluated lexicographically (supply
    * a unique tie-break column last for deterministic output). */
  def topK(df: DataFrame, groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "topK needs >=1 group column (global top-k is orderBy.limit — already optimal as TakeOrdered)")
    require(orderSpec.nonEmpty, "topK needs an ordering")
    val spark = df.sparkSession
    installedIn(spark)
    val child = df.queryExecution.analyzed
    // resolve like Spark does: honor spark.sql.caseSensitive (the session
    // resolver) and FAIL on ambiguity instead of silently taking the
    // first of two duplicate-named columns
    val resolver = spark.sessionState.conf.resolver
    def attr(name: String): Attribute =
      child.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() =>
          throw new IllegalArgumentException(s"no column $name in ${child.output}")
        case many =>
          throw new IllegalArgumentException(
            s"ambiguous column $name: matches ${many.mkString(", ")}")
      }
    val order = orderSpec.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(spark,
      TopKPerGroupNode(k, groupCols.map(attr), order, child))
  }

  /** q291: top-k tokens per language through the custom operator, on the
    * TEXT path — explode → (lang, token) hash count agg → TopKPerGroupExec
    * clustered on lang. Complements q287 (raw fact rows) by certifying the
    * operator downstream of an aggregation: the exec's required clustered
    * distribution re-keys the agg output from (lang, token) to (lang) with
    * one exchange, and the bounded heaps replace what would otherwise be a
    * full per-lang Sort+Window over the whole vocabulary — the "top terms
    * per stratum" report every corpus card needs, at vocabulary scale.
    * Count-desc with token tie-break makes top-k unique (hash-checkable). */
  def topTokensPerLang(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = graft.io.Tables(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n"))
    topK(counts, Seq("lang"), Seq(("n", false), ("token", true)), k)
  }

  /** q287: top-3 orders per customer by price through the custom
    * operator — output-identical to the `row_number` window spelling
    * (the oracle), but the plan is hash-exchange → TopKPerGroupExec
    * with NO Sort and NO Window (plan-asserted in TopKPerGroupSpec). */
  def topOrdersPerCustomer(spark: SparkSession, dir: String,
      k: Int = 3): DataFrame = {
    val o = graft.io.Tables(spark, dir, "orders")
      .select(org.apache.spark.sql.functions.col("o_custkey").as("custkey"),
        org.apache.spark.sql.functions.col("o_orderkey").as("orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice").as("totalprice"))
    topK(o, Seq("custkey"), Seq(("totalprice", false), ("orderkey", true)), k)
  }
}
