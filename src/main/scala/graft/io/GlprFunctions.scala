package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** V2 functions the [[GlprCatalog]] serves under the reserved `sys`
  * namespace (q315) — the DSv2 `FunctionCatalog` surface: SQL-only
  * consumers call connector-shipped functions by catalog-qualified name
  * (`SELECT glpr_cat.sys.nfc_bytes(text) …`) with no session
  * registration and no UDF. `nfc_bytes` carries the MAGIC_METHOD
  * `invoke` overload, so Catalyst plans it as a codegen'd `Invoke` —
  * primitive in/out, no InternalRow boxing on the hot path
  * (`produceResult` stays as the contractual fallback). `bytes_sum` is
  * a V2 `AggregateFunction`: Spark wraps it in `V2Aggregator` with
  * map-side partials and a merge — the same partial/final shape as any
  * built-in aggregate, so it scales like one. Public FunctionCatalog
  * API only; engine surface, no reference counterpart. */
object GlprFunctions {
  val Namespace = "sys"
  def names: Seq[String] = Seq("nfc_bytes", "bytes_sum")
  def load(name: String): Option[UnboundFunction] = name match {
    case "nfc_bytes" => Some(NfcBytesFn)
    case "bytes_sum" => Some(BytesSumFn)
    case _ => None
  }
}

/** `nfc_bytes(s STRING): BIGINT` — UTF-8 byte length of the NFC
  * normalization of `s` (the canonicalized corpus's cost metric). Shares
  * [[graft.functions.NfcNormalize]]'s normalizer, so the SQL front door
  * and the DataFrame expression can never disagree. */
object NfcBytesFn extends UnboundFunction {
  override def name(): String = "nfc_bytes"
  override def description(): String =
    "nfc_bytes(s STRING): BIGINT — UTF-8 bytes of NFC(s); null in, null out"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == StringType,
      s"nfc_bytes takes exactly one STRING argument, got ${inputType.simpleString}")
    NfcBytesBound
  }
}
object NfcBytesBound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType
  override def name(): String = "nfc_bytes"
  override def canonicalName(): String = "glpr.sys.nfc_bytes"
  override def isResultNullable: Boolean = true
  /** The MAGIC_METHOD overload: resolved reflectively by Catalyst and
    * planned as a codegen'd Invoke. Per the ScalarFunction contract the
    * magic method handles null inputs ITSELF (the Invoke path does not
    * null-propagate), so the signature is boxed both ways. */
  def invoke(s: UTF8String): java.lang.Long =
    if (s == null) null
    else java.lang.Long.valueOf(
      graft.functions.NfcNormalize.nfc(s).numBytes().toLong)
  override def produceResult(input: InternalRow): java.lang.Long =
    invoke(if (input.isNullAt(0)) null else input.getUTF8String(0))
}

/** `bytes_sum(s STRING): BIGINT` — Σ UTF-8 byte lengths per group, SQL
  * SUM semantics (null rows contribute nothing; an all-null or empty
  * group yields NULL). */
object BytesSumFn extends UnboundFunction {
  override def name(): String = "bytes_sum"
  override def description(): String =
    "bytes_sum(s STRING): BIGINT — sum of UTF-8 byte lengths per group"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == StringType,
      s"bytes_sum takes exactly one STRING argument, got ${inputType.simpleString}")
    BytesSumBound
  }
}
object BytesSumBound extends AggregateFunction[java.lang.Long, java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType
  override def name(): String = "bytes_sum"
  override def canonicalName(): String = "glpr.sys.bytes_sum"
  override def newAggregationState(): java.lang.Long = null
  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state
    else java.lang.Long.valueOf(
      (if (state == null) 0L else state.longValue()) +
        input.getUTF8String(0).numBytes().toLong)
  override def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
    if (a == null) b else if (b == null) a
    else java.lang.Long.valueOf(a.longValue() + b.longValue())
  override def produceResult(state: java.lang.Long): java.lang.Long = state
}
