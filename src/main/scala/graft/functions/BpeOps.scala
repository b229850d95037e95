package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge/encode hot loops as native expressions. The loops are plain
  * static JVM methods ([[BpeUtil]]) invoked from generated code, so rows
  * stay inside whole-stage codegen (no UDF SerDe boundary) while the
  * logic stays debuggable Scala.
  */
object BpeUtil {

  /** One BPE merge round over a symbol sequence: non-overlapping,
    * left-to-right — the canonical semantics ("a a a" merges (0,1) only). */
  def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy BPE encode of one WORD (symbols = chars, last char carries the
    * end-of-word tag): repeatedly apply the lowest-rank applicable merge. */
  def encodeWord(word: String, eow: String,
      rank: java.util.HashMap[String, Integer]): Array[String] = {
    var syms: Array[String] = {
      val cs = word.toCharArray
      val a = new Array[String](cs.length)
      var i = 0
      while (i < cs.length) {
        a(i) = if (i == cs.length - 1) cs(i).toString + eow else cs(i).toString
        i += 1
      }
      a
    }
    var done = syms.length < 2
    while (!done) {
      var best = -1
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = rank.get(syms(i) + " " + syms(i + 1))
        if (rk != null && (best == -1 || rk < best)) { best = rk; bestAt = i }
        i += 1
      }
      if (best == -1) done = true
      else {
        // merge EVERY non-overlapping occurrence of the winning pair
        val p = syms(bestAt); val q = syms(bestAt + 1)
        syms = mergePair(syms, p, q)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Encode full text: whitespace-split, lowercase, per-word BPE. */
  def encodeText(text: String, eow: String,
      rank: java.util.HashMap[String, Integer]): Array[String] = {
    val words = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[String](words.length * 2)
    words.foreach { w => if (w.nonEmpty) out ++= encodeWord(w, eow, rank) }
    out.toArray
  }
}

/** `bpe_merge_pair(syms, pair)` — one training merge round over a vocab
  * row's symbol array; `pair` is a 2-element array literal (l, r). */
case class BpeMergePair(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"bpe_merge_pair needs array<string>, got $l / $r")
    }

  override def nullSafeEval(symsAny: Any, pairAny: Any): Any = {
    val syms = symsAny.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString)
    val pair = pairAny.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString)
    new GenericArrayData(
      BpeUtil.mergePair(syms, pair(0), pair(1)).map(UTF8String.fromString(_)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) => {
      val cls = "graft.functions.BpeExprRuntime"
      s"${ev.value} = $cls.mergePair($s, $p);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `bpe_encode(text)` with a bound merge-rank table: array of BPE tokens. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)], eow: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_encode needs string, got $t")
  }

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, i)
    }
    m
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      BpeUtil.encodeText(v.asInstanceOf[UTF8String].toString, eow, rank)
        .map(UTF8String.fromString(_)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rankRef = ctx.addReferenceObj("bpeRank", rank, "java.util.HashMap")
    val eowRef = ctx.addReferenceObj("bpeEow", eow, "java.lang.String")
    nullSafeCodeGen(ctx, ev, s => {
      val cls = "graft.functions.BpeExprRuntime"
      s"${ev.value} = $cls.encodeText($s, $eowRef, $rankRef);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static bridge the generated Java calls (codegen can't call Scala
  * methods with rich types directly without boxing surprises — keep the
  * boundary on ArrayData/UTF8String). */
object BpeExprRuntime {
  def mergePair(syms: ArrayData, pair: ArrayData): ArrayData = {
    val s = syms.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString)
    val p = pair.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString)
    new GenericArrayData(BpeUtil.mergePair(s, p(0), p(1)).map(UTF8String.fromString(_)))
  }

  def encodeText(text: UTF8String, eow: String,
      rank: java.util.HashMap[String, Integer]): ArrayData =
    new GenericArrayData(
      BpeUtil.encodeText(text.toString, eow, rank).map(UTF8String.fromString(_)))
}

object BpeOps {
  def mergePair(syms: Column, pair: Column): Column =
    GraftExpressionBridge.column(BpeMergePair(
      GraftExpressionBridge.expression(syms), GraftExpressionBridge.expression(pair)))

  def encode(text: Column, merges: Seq[(String, String)], eow: String): Column =
    GraftExpressionBridge.column(BpeEncodeExpr(
      GraftExpressionBridge.expression(text), merges, eow))
}
