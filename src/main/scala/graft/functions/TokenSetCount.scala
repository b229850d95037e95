package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace tokens contained in a fixed word set — the hot loop
  * of stopword-ratio and language-marker scoring. The builtin formulation
  * (`size(filter(split(...), t => array_contains(set, t)))`) runs the
  * lambda interpreted per token; this evaluates one hash-set probe loop per
  * row. Tokenization matches `split(trim(text), "\\s+")` exactly (the
  * oracle contract), with optional lowercasing for the language markers.
  */
case class TokenSetCount(child: Expression, words: Seq[String], lowercase: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(w => s.add(w))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenSetCount.count(input.asInstanceOf[UTF8String], set, lowercase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenSetCount.count($c, $setRef, $lowercase)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSetCount {

  /** Called from generated code — keep signature stable. */
  def count(text: UTF8String, set: java.util.HashSet[String], lowercase: Boolean): Int = {
    val s = if (lowercase) text.toString.toLowerCase else text.toString
    val toks = s.trim.split("\\s+")
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  def tokenSetCount(text: Column, words: Seq[String], lowercase: Boolean = false): Column =
    GraftExpressionBridge.column(
      TokenSetCount(GraftExpressionBridge.expression(text), words, lowercase))
}
