package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression —
  * the standard first step of a text-curation pipeline (canonically
  * equivalent byte sequences must fingerprint/dedup/tokenize identically,
  * e.g. "é" as U+00E9 vs "e"+U+0301). Spark ships no builtin for it; a
  * Scala UDF would break whole-stage codegen on the corpus scan.
  *
  * Scale posture: per-row, no shuffle; the already-normalized fast path
  * (all of ASCII, and most real NFC text) is a quick-check scan that
  * allocates nothing, so a 100 TB mostly-ASCII corpus pays ~zero.
  * Engine-portable: the computation is the Unicode standard's — DuckDB's
  * `nfc_normalize` replays it exactly (pinned by the q153 oracle).
  */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNorm.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNorm {

  private val Forms: Map[String, Normalizer.Form] =
    Normalizer.Form.values().map(f => f.name -> f).toMap

  /** Called from generated code — keep signature stable. */
  def normalize(text: UTF8String, form: String): UTF8String = {
    val f = Forms.getOrElse(form,
      throw new IllegalArgumentException(s"unknown normalization form: $form"))
    val s = text.toString
    // quick-check fast path: ASCII (and most NFC text) returns the input
    // UTF8String untouched — no new allocation on the common case
    if (Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }

  def unicodeNorm(text: Column, form: String = "NFC"): Column = {
    require(Forms.contains(form), s"unknown normalization form: $form")
    GraftExpressionBridge.column(
      UnicodeNorm(GraftExpressionBridge.expression(text), form))
  }
}
