package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's custom Catalyst expressions as SQL
  * functions (`SELECT graft_dot(a, b)`), via the public
  * `SparkSessionExtensions.injectFunction` hook:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *     // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * DataFrame-API callers don't need this — [[VectorOps.dot]] builds the
  * expression Column directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rule: |l − r| <= T θ-joins become bucketed equi-joins
    // (see graft.plans.RangeJoinBucketRule; also installable at runtime
    // via spark.experimental.extraOptimizations).
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBucketRule)
    // Planner strategy for the custom per-group top-k physical operator
    // (see graft.plans.TopKPerGroup; also installable at runtime via
    // spark.experimental.extraStrategies).
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        ArrayDotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_window_hashes"),
      new ExpressionInfo(classOf[WindowHashes].getName, "graft_window_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_window_hashes takes (array<string>, constant window size)")
        WindowHashes(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_signed_project"),
      new ExpressionInfo(classOf[SignedProjection].getName, "graft_signed_project"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_signed_project takes (array<float|double>, constant k)")
        SignedProjection(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sortable_bits"),
      new ExpressionInfo(classOf[DoubleSortableBits].getName, "graft_sortable_bits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "graft_sortable_bits takes exactly 1 argument")
        DoubleSortableBits(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_kmv takes (string, constant k)")
        // returning the bare AggregateFunction is the registry contract:
        // the analyzer wraps it in AggregateExpression(Complete)
        KmvSketch(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, "graft_nfc takes exactly 1 argument")
        NfcNormalize(exprs.head)
      }))
  }
}
