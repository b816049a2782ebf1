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

  /** PARTITION-TRANSFORM functions served at the EMPTY namespace
    * (round 18) — the lookups `V2ExpressionUtils` makes when resolving
    * a transform inside a write's required distribution (Iceberg serves
    * the same names the same way): with these bound, a `PARTITIONED BY
    * (bucket(8, doc_id))` / `days(ts)` / `months(ts)` / `truncate(w,
    * col)` table can REQUIRE `Distributions.clustered(<transform>)` and
    * Spark inserts the clustering shuffle itself — ingest discipline
    * enforced by the connector instead of trusted to the caller's
    * DISTRIBUTE BY. Each function computes EXACTLY the sidecar
    * transform ([[GlprSource.PartSpec.valueOf]]), so write clustering
    * and read pruning can never disagree. */
  def loadTransform(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketTransformFn)
    case "days" => Some(PrefixTransformFn("days", 10))
    case "months" => Some(PrefixTransformFn("months", 7))
    case "truncate" => Some(TruncateTransformFn)
    case _ => None
  }
}

/** `bucket(n INT, id BIGINT): INT` = floorMod(id, n) — the GLPR bucket
  * transform ([[GlprSource.BucketPart]]). */
object BucketTransformFn extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n INT, id BIGINT): INT — floorMod(id, n), the GLPR bucket transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      (inputType.fields(0).dataType == IntegerType ||
        inputType.fields(0).dataType == LongType) &&
      inputType.fields(1).dataType == LongType,
      s"bucket takes (INT, BIGINT), got ${inputType.simpleString}")
    new ScalarFunction[java.lang.Integer] {
      override def inputTypes(): Array[DataType] =
        Array(inputType.fields(0).dataType, LongType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "glpr.bucket"
      override def produceResult(input: InternalRow): java.lang.Integer = {
        val n = inputType.fields(0).dataType match {
          case IntegerType => input.getInt(0).toLong
          case _ => input.getLong(0)
        }
        java.lang.Integer.valueOf(
          java.lang.Math.floorMod(input.getLong(1), n).toInt)
      }
    }
  }
}

/** `days/months(s STRING): STRING` — the leading ISO prefix (10 / 7
  * chars), the GLPR prefix transforms ([[GlprSource.PrefixPart]]). */
final case class PrefixTransformFn(fnName: String, len: Int)
    extends UnboundFunction {
  override def name(): String = fnName
  override def description(): String =
    s"$fnName(s STRING): STRING — first $len chars (GLPR prefix transform)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == StringType,
      s"$fnName takes one STRING argument, got ${inputType.simpleString}")
    new ScalarFunction[UTF8String] {
      override def inputTypes(): Array[DataType] = Array(StringType)
      override def resultType(): DataType = StringType
      override def name(): String = fnName
      override def canonicalName(): String = s"glpr.$fnName"
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): UTF8String =
        if (input.isNullAt(0)) null
        else input.getUTF8String(0).substring(0, len)
    }
  }
}

/** `truncate(w INT, s STRING): STRING` — first `w` chars, the GLPR
  * truncate transform ([[GlprSource.TruncatePart]]). */
object TruncateTransformFn extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w INT, s STRING): STRING — first w chars (GLPR transform)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      (inputType.fields(0).dataType == IntegerType ||
        inputType.fields(0).dataType == LongType) &&
      inputType.fields(1).dataType == StringType,
      s"truncate takes (INT, STRING), got ${inputType.simpleString}")
    new ScalarFunction[UTF8String] {
      override def inputTypes(): Array[DataType] =
        Array(inputType.fields(0).dataType, StringType)
      override def resultType(): DataType = StringType
      override def name(): String = "truncate"
      override def canonicalName(): String = "glpr.truncate"
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): UTF8String = {
        if (input.isNullAt(1)) return null
        val w = inputType.fields(0).dataType match {
          case IntegerType => input.getInt(0)
          case _ => input.getLong(0).toInt
        }
        input.getUTF8String(1).substring(0, w)
      }
    }
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
