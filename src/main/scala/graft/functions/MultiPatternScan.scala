package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring scan (Aho–Corasick) as a native codegen'd
  * expression — the blocklist/PII screening primitive of a corpus
  * pipeline: "how often does each of these K phrases occur in each
  * document" in ONE O(bytes) pass per document, independent of K.
  * The naive alternative (`K × contains/indexOf`, or a regex
  * alternation) rescans every document K times or backtracks; at 100 TB
  * with a thousand-entry blocklist that is the difference between one
  * corpus pass and a thousand.
  *
  * The automaton is built ONCE on the driver (goto/fail links, BFS;
  * per-node output sets pre-flattened through the fail chain so the
  * scan never walks links), ships to executors as a codegen reference
  * object, and matches on raw UTF-8 BYTES — correct for any byte-exact
  * pattern, and what keeps the scan allocation-free. Counting is
  * per-pattern GREEDY NON-OVERLAPPING (left to right), the same
  * semantics as SQL `replace`-based counting — which is exactly what
  * the q320 DuckDB oracle uses, so cross-engine agreement certifies the
  * automaton end to end. Matches BETWEEN different patterns may overlap
  * freely (each pattern counts independently). */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_multi_pattern_counts needs at least one non-empty pattern")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_pattern_counts"

  @transient private lazy val automaton =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")).toArray)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      automaton.countNonOverlapping(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("graftAc",
      new AhoCorasick(patterns.map(_.getBytes("UTF-8")).toArray),
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$ac.countNonOverlapping($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}

object MultiPatternCounts {
  /** Column-API entry point: per-pattern non-overlapping occurrence
    * counts, aligned with `patterns`. */
  def counts(c: org.apache.spark.sql.Column, patterns: Seq[String]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(MultiPatternCounts(
      org.apache.spark.sql.GraftColumnBridge.expression(c), patterns))

  /** q320's fixed blocklist: single tokens AND multi-word phrases
    * (cross-token matching), including a self-overlap case
    * ("table table" in "table table table" counts ONCE under greedy
    * non-overlap — the replace-counting semantics both engines share). */
  val BlocklistPatterns: Seq[String] = Seq(
    "customer query", "merge batch", "slow fast", "spark", "table table")

  /** q320 — blocklist screening rollup: ONE automaton pass per document
    * (codegen'd, K-independent), per-pattern hit attribution via
    * posexplode against the pinned pattern list (no discovery scan),
    * then docs-hit / total-hits per pattern. The oracle recomputes every
    * count with DuckDB's replace-trick — cross-engine agreement
    * certifies the automaton (goto/fail/output construction, byte-level
    * matching, greedy non-overlap) end to end. */
  def blocklistScan(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.io.Tables(spark, dir, "documents")
      .select(counts(col("text"), BlocklistPatterns).as("counts"))
      .select(posexplode(col("counts")).as(Seq("pid", "hits")))
      .withColumn("pattern", element_at(
        lit(BlocklistPatterns.toArray), col("pid").cast("int") + 1))
      .groupBy("pattern")
      .agg(count(when(col("hits") > 0L, 1)).as("n_docs_hit"),
        sum("hits").as("total_hits"))
  }
}

/** Byte-level Aho–Corasick automaton. Dense 256-way goto per node —
  * memory is 1 KiB/node, the right trade for blocklist-sized pattern
  * sets (a production million-pattern set would use double-array or
  * sparse nodes; the algorithmic shape is identical). Serializable:
  * built on the driver, shipped inside the expression. */
final class AhoCorasick(patterns: Array[Array[Byte]]) extends Serializable {
  private val patLen: Array[Int] = patterns.map(_.length)

  // --- trie construction ---
  private val gotoTbl = scala.collection.mutable.ArrayBuffer(newNode())
  private val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  private def newNode(): Array[Int] = Array.fill(256)(-1)
  for ((p, pid) <- patterns.zipWithIndex) {
    var s = 0
    for (b <- p) {
      val c = b & 0xff
      if (gotoTbl(s)(c) == -1) {
        gotoTbl += newNode(); ownOut += Nil
        gotoTbl(s)(c) = gotoTbl.length - 1
      }
      s = gotoTbl(s)(c)
    }
    ownOut(s) ::= pid
  }

  // --- BFS fail links; outputs pre-flattened through the fail chain ---
  private val fail = new Array[Int](gotoTbl.length)
  private val outs: Array[Array[Int]] = new Array(gotoTbl.length)
  locally {
    outs(0) = ownOut(0).toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256; n = gotoTbl(0)(c) if n != -1) {
      fail(n) = 0
      outs(n) = ownOut(n).toArray
      queue += n
    }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      for (c <- 0 until 256; n = gotoTbl(r)(c) if n != -1) {
        queue += n
        var f = fail(r)
        while (f != 0 && gotoTbl(f)(c) == -1) f = fail(f)
        fail(n) = if (gotoTbl(f)(c) != -1 && gotoTbl(f)(c) != n) gotoTbl(f)(c) else 0
        outs(n) = (ownOut(n).toArray ++ outs(fail(n))).sorted
      }
    }
  }

  /** Per-pattern greedy non-overlapping occurrence counts over the
    * string's UTF-8 bytes (`replace`-counting semantics). */
  def countNonOverlapping(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val res = new Array[Long](patterns.length)
    val nextStart = new Array[Int](patterns.length)
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      while (state != 0 && gotoTbl(state)(c) == -1) state = fail(state)
      val g = gotoTbl(state)(c)
      state = if (g != -1) g else 0
      val out = outs(state)
      var j = 0
      while (j < out.length) {
        val pid = out(j)
        val start = i - patLen(pid) + 1
        if (start >= nextStart(pid)) { res(pid) += 1L; nextStart(pid) = i + 1 }
        j += 1
      }
      i += 1
    }
    res
  }
}
