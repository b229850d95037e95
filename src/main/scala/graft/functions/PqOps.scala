package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Query-side LUT construction for PQ/ADC search.
  *
  * Semantics are EXACTLY the literal-chain formulation
  * `array(for (j, c) yield dot(slice(qv, j·sub+1, sub), lit(codeword)))`:
  * entry `j·ks + c` is the sequential index-order dot of the query's j-th
  * subvector with codeword (j, c), accumulated from 0.0 — the same FP op
  * sequence as [[DotProduct]] over a [[org.apache.spark.sql.functions.slice]],
  * so scores (and oracle hashes) are bit-identical to the old expansion.
  *
  * The reason this is a native expression instead of that expansion: the
  * literal chain generates m·ks dot-loops of codegen per query column
  * (m=8, ks=16 → 128 inlined loops plus m·ks·sub literals), so generated
  * class size scales with the codebook. Janino compile time and JIT
  * code-cache footprint grow with it — in a long-lived session (the bench
  * JVM, a real driver) that pollutes the code cache for every later query.
  * Here the codebook rides along as ONE reference object (the
  * [[UnigramEncodeExpr]] `addReferenceObj` pattern) and the generated code
  * is a constant-size triple loop, whatever m·ks·sub is.
  */
case class PqLut(child: Expression, codewords: Seq[Double], m: Int, ks: Int,
    sub: Int) extends UnaryExpression {

  require(codewords.length == m * ks * sub,
    s"pq_lut: codebook length ${codewords.length} != m·ks·sub = ${m * ks * sub}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_lut needs array<double>, got $t")
  }

  @transient private lazy val cw: Array[Double] = codewords.toArray

  override def nullSafeEval(v: Any): Any =
    PqLutRuntime.lut(v.asInstanceOf[ArrayData], cw, m, ks, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cwRef = ctx.addReferenceObj("pqCodewords", cw, "double[]")
    nullSafeCodeGen(ctx, ev, q => {
      s"${ev.value} = graft.functions.PqLutRuntime.lut($q, $cwRef, $m, $ks, $sub);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static bridge for generated code (same shape as [[UnigramExprRuntime]]). */
object PqLutRuntime {
  /** codewords is flattened (j, c, rel)-major: cw[((j·ks)+c)·sub + rel]. */
  def lut(qv: ArrayData, cw: Array[Double], m: Int, ks: Int, sub: Int): ArrayData = {
    val out = new Array[Double](m * ks)
    val n = qv.numElements()
    var j = 0
    while (j < m) {
      // a short (wrong-dim/corrupt) vector contributes a PARTIAL dot, the
      // exact semantics of the dot(slice(...)) literal chain this
      // expression replaced — never an index crash inside generated code
      val lim = math.min(sub, math.max(0, n - j * sub))
      var c = 0
      while (c < ks) {
        var acc = 0.0d
        var rel = 0
        val base = (j * ks + c) * sub
        while (rel < lim) {
          acc += qv.getDouble(j * sub + rel) * cw(base + rel)
          rel += 1
        }
        out(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** All-subspace argmin encode; see [[PqEncode]] for the tie/NaN contract. */
  def encode(qv: ArrayData, cw: Array[Double], cn: Array[Double], m: Int,
      ks: Int, sub: Int): ArrayData = {
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val lim = math.min(sub, math.max(0, qv.numElements() - j * sub))
      var bestI = 0
      var bestD = Double.NaN
      var c = 0
      while (c < ks) {
        var acc = 0.0d
        var rel = 0
        val base = (j * ks + c) * sub
        while (rel < lim) {
          acc += qv.getDouble(j * sub + rel) * cw(base + rel)
          rel += 1
        }
        val d = cn(j * ks + c) - 2.0d * acc
        // strict < keeps the lowest code on ties; NaN never wins (Spark
        // double ordering treats NaN as greatest) — but a NaN incumbent
        // (c == 0) must yield to any real distance
        if (c == 0 || d < bestD || (bestD.isNaN && !d.isNaN)) { bestD = d; bestI = c }
        c += 1
      }
      out(j) = bestI
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** All-subspace PQ encode: code j = `argmin_c ‖s_j − c‖²` via the
  * `‖c‖² − 2·s_j·c` expansion, exactly the [[graft.ext.Similarity.pqCode]]
  * literal-chain semantics (sequential index-order dot, strict-< argmin so
  * ties keep the LOWEST code — `array_min` over `struct(d, i)` ordering —
  * and a NaN distance never displaces the incumbent, matching Spark's
  * NaN-greatest double ordering). Native for the same reason as [[PqLut]]:
  * the expansion inlines m·ks dot-loops of generated code per encode
  * column; here the codebook is one reference object and the generated
  * code is constant-size. */
case class PqEncode(child: Expression, codewords: Seq[Double],
    cnorms: Seq[Double], m: Int, ks: Int, sub: Int) extends UnaryExpression {

  require(codewords.length == m * ks * sub && cnorms.length == m * ks,
    s"pq_encode: codebook ${codewords.length}/${cnorms.length} != ${m * ks * sub}/${m * ks}")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode needs array<double>, got $t")
  }

  @transient private lazy val cw: Array[Double] = codewords.toArray
  @transient private lazy val cn: Array[Double] = cnorms.toArray

  override def nullSafeEval(v: Any): Any =
    PqLutRuntime.encode(v.asInstanceOf[ArrayData], cw, cn, m, ks, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cwRef = ctx.addReferenceObj("pqCodewords", cw, "double[]")
    val cnRef = ctx.addReferenceObj("pqCnorms", cn, "double[]")
    nullSafeCodeGen(ctx, ev, q => {
      s"${ev.value} = graft.functions.PqLutRuntime.encode($q, $cwRef, $cnRef, $m, $ks, $sub);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqOps {
  /** `pq_lut(qv)` — flattened m×ks ADC lookup table for a query vector
    * against the (driver-held) codebook `codewords(j)(c): Seq[Double]`. */
  def lut(qv: Column, codewords: Array[Array[Seq[Double]]], ks: Int,
      sub: Int): Column = {
    val m = codewords.length
    val flat = codewords.flatMap(_.flatMap(_.toArray)).toSeq
    GraftExpressionBridge.column(
      PqLut(GraftExpressionBridge.expression(qv), flat, m, ks, sub))
  }

  /** `pq_encode(v)` — the m argmin codes (array<int>, each in [0, ks)) of a
    * vector against the codebook; feed to [[Int8Ops.pack]] for storage. */
  def encode(v: Column, codewords: Array[Array[Seq[Double]]],
      cnorms: Seq[Double], ks: Int, sub: Int): Column = {
    val m = codewords.length
    val flat = codewords.flatMap(_.flatMap(_.toArray)).toSeq
    GraftExpressionBridge.column(
      PqEncode(GraftExpressionBridge.expression(v), flat, cnorms, m, ks, sub))
  }
}
