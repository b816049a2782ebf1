package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * the whole expression stays inside whole-stage codegen and the fold order
  * is the deterministic left-to-right array order on every engine run.
  */
object VectorOps {

  /** Elements cast to double before arithmetic (float inputs promote
    * exactly; all subsequent IEEE ops are then engine-independent). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Σ aᵢ·bᵢ as a left fold over the zipped arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** a + b element-wise. */
  def add(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x + y)

  def scale(a: Column, k: Column): Column =
    transform(asDouble(a), x => x * k)
}
