package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** int8 vector storage for the similarity scale path: a quantized embedding
  * packs to one signed byte per dimension (4× smaller than float32, 8× than
  * float64), and candidate scoring becomes an integer multiply-add loop —
  * pure memory-bandwidth, no FP in the hot path. Quantization itself stays
  * declarative (builtin `round`/`cast`, index-build time); only the two
  * per-pair hot ops are native codegen'd expressions.
  */
object Int8Ops {

  /** `array<int>` (each value in [-128, 127]) → `binary`, one byte each. */
  def pack(a: Column): Column =
    GraftExpressionBridge.column(PackInt8(GraftExpressionBridge.expression(a)))

  /** Integer dot product over two packed int8 vectors → long. */
  def dotInt8(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotInt8(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** Product-quantization ADC lookup: `codes` is one packed byte per
    * subspace, `lut` a flattened (subspace-major) table of `ks` doubles per
    * subspace; the result is Σ_j lut[j·ks + codes[j]], accumulated in
    * ascending subspace order (FP-order-pinned so oracles replay it). */
  def adc(codes: Column, lut: Column, ks: Int): Column =
    GraftExpressionBridge.column(AdcScore(
      GraftExpressionBridge.expression(codes), GraftExpressionBridge.expression(lut), ks))
}

case class PackInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pack_int8 needs array<int>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = a.getInt(i).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) $x.getInt($i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class DotInt8(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"dot_int8 needs binary args, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.length, $y.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x[$i] * $y[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The per-candidate hot loop of PQ search: m table lookups and adds over
  * the m-byte code — no per-dimension FP work at all, which is the whole
  * point of product quantization at 100 TB (memory traffic ∝ code bytes,
  * not vector bytes). */
case class AdcScore(left: Expression, right: Expression, ks: Int) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(org.apache.spark.sql.types.DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"adc needs (binary, array<double>), got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    var acc = 0.0d
    var j = 0
    while (j < codes.length) {
      acc += lut.getDouble(j * ks + (codes(j) & 0xff))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0d;
         |for (int $j = 0; $j < $c.length; $j++) {
         |  $acc += $l.getDouble($j * $ks + ($c[$j] & 0xff));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
