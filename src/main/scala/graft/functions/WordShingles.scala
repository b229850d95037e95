package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles as a native expression.
  *
  * The builtin formulation (`array_distinct(transform(sequence(...),
  * i => concat_ws(" ", element_at(tokens, i), ...)))`) is semantically
  * identical but pays Catalyst interpreted-eval overhead per element —
  * measured ~5s for 100k shingles; this one-loop-per-row version does the
  * same work in milliseconds. Semantics matched exactly (incl. the
  * shorter-than-k clip, which the HOF version gets from concat_ws skipping
  * nulls) and pinned against the HOF version in tests.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  /** Called from generated code — keep signature stable. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    val n = toks.length
    val out = new mutable.LinkedHashSet[String]
    val last = math.max(n - k, 0)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }

  def shingles(text: Column, k: Int): Column =
    GraftExpressionBridge.column(WordShingles(GraftExpressionBridge.expression(text), k))
}
