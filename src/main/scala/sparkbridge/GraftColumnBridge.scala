package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge into the `private[sql]` Column⇄Expression converters so graft's
  * custom Catalyst expressions (e.g. [[graft.functions.ArrayDotProduct]])
  * can be used as ordinary `Column`s on any session, without per-session
  * function registration. This is the conventional extension-library
  * pattern for Spark 4's ColumnNode API; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Register graft's SQL functions on an already-running session (the
    * runtime counterpart of `graft.functions.GraftExtensions`, which only
    * applies at session build time). Idempotent. */
  def registerGraftFunctions(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => graft.functions.ArrayDotProduct(exprs.head, exprs(1)),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_sortable_bits",
      exprs => graft.functions.DoubleSortableBits(exprs.head),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_window_hashes",
      exprs => graft.functions.WindowHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_signed_project",
      exprs => graft.functions.SignedProjection(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_kmv",
      exprs => graft.functions.KmvSketch(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_nfc",
      exprs => graft.functions.NfcNormalize(exprs.head),
      "built-in")
  }
}
