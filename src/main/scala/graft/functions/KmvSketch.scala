package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values (KMV / bottom-k) distinct-count sketch as a native
  * Catalyst `TypedImperativeAggregate` — the mergeable-aggregate slot of
  * the custom-Catalyst surface (scalar expressions, optimizer rule,
  * planner strategy + exec, and the DSv2 connector cover the others).
  *
  * The sketch (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream") keeps the k smallest DISTINCT hash values seen; because
  * `min_k` is a commutative, associative fold, the aggregate supports
  * map-side PARTIAL aggregation and lossless MERGE — at 100 TB each
  * executor reduces its partitions to a k-entry buffer and only k·groups
  * values cross the shuffle, the same contract as Spark's own
  * `approx_count_distinct` (HLL++) but with a sketch whose contents are
  * EXACTLY reproducible in any engine with the same hash (md5 here), so
  * the driver's DuckDB oracle can hash-check the sketch itself, not just
  * an estimate envelope:
  *
  * DuckDB twin of `graft_kmv(x, k)`:
  * {{{ list_sort(list(DISTINCT md5(x)))[1:k] }}}
  *
  * The classic estimator is `(k-1) / frac(h_k)` with `frac` mapping the
  * k-th smallest hash into [0,1). Registry q293 derives it from the
  * sketch's 13 leading hex digits (52 bits — exactly representable in an
  * IEEE double, so Spark and DuckDB compute bit-identical estimates with
  * no integer→double rounding divergence).
  *
  * Buffer is a bounded `java.util.TreeSet` (ascending md5 hex strings):
  * O(k) memory per group, O(log k) insert with an O(1) `last()` reject
  * test for values above the current k-th minimum — after warm-up almost
  * every row short-circuits on the string compare. Serialization is the
  * trivial fixed-width concatenation (32 hex chars per entry). The
  * aggregate is an object-buffer aggregate, so plans land on
  * `ObjectHashAggregate` (partial + final), asserted in KmvSketchSpec.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 1 && k <= 65536, s"graft_kmv k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  override def update(buffer: java.util.TreeSet[String],
      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      KmvSketch.insertBounded(buffer,
        KmvSketch.md5Hex(v.asInstanceOf[UTF8String].getBytes), k)
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) KmvSketch.insertBounded(buffer, it.next(), k)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buffer.size)
    val it = buffer.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(buffer.size * 32)
    val it = buffer.iterator()
    while (it.hasNext) sb.append(it.next())
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
    val set = new java.util.TreeSet[String]()
    var i = 0
    while (i + 32 <= s.length) { set.add(s.substring(i, i + 32)); i += 32 }
    set
  }
}

object KmvSketch {
  /** Column-API entry point: `Kmv.kmv($"text", 16)`. */
  def kmv(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      KmvSketch(org.apache.spark.sql.GraftColumnBridge.expression(c), k)
        .toAggregateExpression())

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 — byte-identical to DuckDB's and Spark's `md5()`. */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((h(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Keep the k smallest distinct values; O(1) reject above the k-th. */
  def insertBounded(set: java.util.TreeSet[String], h: String, k: Int): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h.compareTo(set.last()) < 0 && set.add(h)) { set.pollLast(); () }
  }
}
