package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns. No UDFs: the
  * hot dot product is a native codegen'd Catalyst expression
  * ([[ArrayDotProduct]]); everything else is built-in functions, so the
  * fold order is the deterministic left-to-right array order on every
  * engine run.
  */
object VectorOps {

  /** Elements cast to double before arithmetic (float inputs promote
    * exactly; all subsequent IEEE ops are then engine-independent). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Σ aᵢ·bᵢ — native codegen'd expression; bit-identical to [[hofDot]]
    * (same promotion, same left-to-right accumulation). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(ArrayDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Total-order-preserving double → long embedding ([[DoubleSortableBits]]) —
    * the adapter that lets double sort keys ride integer bounded
    * aggregators. */
  def sortableBits(x: Column): Column =
    GraftColumnBridge.column(DoubleSortableBits(GraftColumnBridge.expression(x)))

  /** All stride-1 `w`-token rolling Karp–Rabin window digests of a token
    * array ([[WindowHashes]]) — the codegen'd O(len) digest stage of the
    * substring-dedup scale path (q198). */
  def windowHashes(toks: Column, w: Int): Column =
    GraftColumnBridge.column(WindowHashes(GraftColumnBridge.expression(toks), w))

  /** All k JL-reduced components of an embedding in one narrow pass
    * ([[SignedProjection]]) — q194's shuffle-free form. */
  def signedProject(emb: Column, k: Int): Column =
    GraftColumnBridge.column(SignedProjection(GraftColumnBridge.expression(emb), k))

  /** The higher-order-function formulation of [[dot]] — kept as the
    * cross-check oracle for the codegen expression (see VectorOpsSpec).
    * ~100× slower on the all-pairs path: allocates an intermediate array
    * per evaluation and is excluded from whole-stage codegen. */
  private[graft] def hofDot(a: Column, b: Column): Column =
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
