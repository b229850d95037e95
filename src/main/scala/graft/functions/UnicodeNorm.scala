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
  * Scale posture: per-row, no shuffle; the `form` resolves to its enum
  * ONCE at expression construction (a reference object in generated
  * code, not a per-row lookup), and ASCII input — normal under every
  * form — short-circuits on the raw UTF8 bytes without materializing a
  * String, so a 100 TB mostly-ASCII corpus scans allocation-free.
  * Engine-portable: the computation is the Unicode standard's — DuckDB's
  * `nfc_normalize` replays it exactly (pinned by the q153 oracle).
  */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {

  @transient private lazy val nform: Normalizer.Form = UnicodeNorm.formOf(form)

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], nform)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nform", nform, classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.normalize($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNorm {

  private val Forms: Map[String, Normalizer.Form] =
    Normalizer.Form.values().map(f => f.name -> f).toMap

  def formOf(form: String): Normalizer.Form = Forms.getOrElse(form,
    throw new IllegalArgumentException(s"unknown normalization form: $form"))

  /** Called from generated code — keep signature stable. */
  def normalize(text: UTF8String, form: Normalizer.Form): UTF8String = {
    // ASCII is normalized under every form: check the raw bytes and
    // return the input untouched — no String materialized, no allocation
    val n = text.numBytes()
    var i = 0
    while (i < n && text.getByte(i) >= 0) i += 1
    if (i == n) return text
    val s = text.toString
    // quick-check second chance: most non-ASCII real text is already NFC
    if (Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  def unicodeNorm(text: Column, form: String = "NFC"): Column = {
    formOf(form) // reject unknown forms at column construction
    GraftExpressionBridge.column(
      UnicodeNorm(GraftExpressionBridge.expression(text), form))
  }
}
