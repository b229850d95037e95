package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 FunctionCatalog surface: graft's native functions exposed as
  * catalog-qualified SQL functions (`SELECT cat.ns.dot_product(a, b)`),
  * the way Iceberg exposes `system.bucket` — discoverable via `SHOW
  * FUNCTIONS`, resolvable by any session that registered the catalog,
  * no `GraftFunctions.register` / extension injection needed.
  *
  * Each function pins the SAME semantics as its engine twin, so results
  * are interchangeable:
  *
  *  - `dot_product(array<double>, array<double>) → double`: index-order
  *    fold, bit-identical to [[graft.functions.DotProduct]] (and the HOF
  *    formulation the oracles replay);
  *  - `graft_bucket(bigint, int) → int`: `pmod(murmur3(key), n)` with
  *    Spark's seed-42 hash — the bucketed-table layout rule, so users can
  *    compute which bucket a key lands in (and pre-cluster batches to
  *    match a table's layout) from plain SQL;
  *  - `ws_token_count(string) → int`: whitespace token count, identical
  *    to `size(split(trim(s), '\\s+'))` — the tokenization every text
  *    operator in graft.ext uses.
  *
  * These run through the V2 `produceResult` path (row-at-a-time); the
  * codegen'd Catalyst expressions in `graft.functions` remain the hot-path
  * route for engine internals. The catalog surface is about SQL
  * discoverability and session-independence, not about replacing them.
  */
object GraftV2Functions {

  val names: Seq[String] = Seq("dot_product", "graft_bucket", "ws_token_count")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "dot_product" => Some(DotProductFn)
    case "graft_bucket" => Some(GraftBucketFn)
    case "ws_token_count" => Some(WsTokenCountFn)
    case _ => None
  }

  private def fail(fn: String, got: StructType, want: String): Nothing =
    throw new UnsupportedOperationException(
      s"$fn expects $want, got (${got.fields.map(_.dataType.simpleString).mkString(", ")})")

  object DotProductFn extends UnboundFunction {
    override def name(): String = "dot_product"
    override def description(): String =
      "dot_product(array<double>, array<double>) -> double: index-order fold"
    override def bind(inputType: StructType): BoundFunction = inputType.fields match {
      case Array(a, b) if a.dataType == ArrayType(DoubleType) ||
          a.dataType == ArrayType(DoubleType, containsNull = false) =>
        (b.dataType match {
          case ArrayType(DoubleType, _) => ()
          case _ => fail(name(), inputType, "two array<double> args")
        })
        DotProductBound
      case _ => fail(name(), inputType, "two array<double> args")
    }
  }

  object DotProductBound extends ScalarFunction[java.lang.Double] {
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(DoubleType), ArrayType(DoubleType))
    override def resultType(): DataType = DoubleType
    override def name(): String = "dot_product"
    override def canonicalName(): String = "graft.dot_product"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Double = {
      if (input.isNullAt(0) || input.isNullAt(1)) return null
      val x = input.getArray(0)
      val y = input.getArray(1)
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0d
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  object GraftBucketFn extends UnboundFunction {
    override def name(): String = "graft_bucket"
    override def description(): String =
      "graft_bucket(key bigint, n int) -> int: pmod(murmur3(key), n), the bucketed-table layout rule"
    override def bind(inputType: StructType): BoundFunction = inputType.fields match {
      case Array(k, n) if k.dataType == LongType && n.dataType == IntegerType =>
        GraftBucketBound
      case _ => fail(name(), inputType, "(key bigint, n int)")
    }
  }

  object GraftBucketBound extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(LongType, IntegerType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "graft_bucket"
    override def canonicalName(): String = "graft.graft_bucket"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer = {
      if (input.isNullAt(0) || input.isNullAt(1)) return null
      val n = input.getInt(1)
      if (n <= 0) return null
      val h = Murmur3HashFunction.hash(input.getLong(0), LongType, 42L).toInt
      ((h % n) + n) % n
    }
  }

  object WsTokenCountFn extends UnboundFunction {
    override def name(): String = "ws_token_count"
    override def description(): String =
      "ws_token_count(string) -> int: whitespace tokens, = size(split(trim(s), '\\s+'))"
    override def bind(inputType: StructType): BoundFunction = inputType.fields match {
      case Array(s) if s.dataType == StringType => WsTokenCountBound
      case _ => fail(name(), inputType, "(string)")
    }
  }

  object WsTokenCountBound extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "ws_token_count"
    override def canonicalName(): String = "graft.ws_token_count"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer = {
      if (input.isNullAt(0)) return null
      // exactly size(split(trim(s), '\s+')): an all-whitespace / empty
      // string trims to "" and splits to [""] — one element
      input.getUTF8String(0).toString.trim.split("\\s+").length
    }
  }
}
