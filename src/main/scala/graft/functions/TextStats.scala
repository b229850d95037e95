package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All corpus text statistics in ONE pass over each document, emitted as a
  * struct — the single-expression replacement for the ~7 independent
  * tokenizations the builtin-column formulation runs per row (split for
  * ws_tokens, TokenSetCount for stopwords, quality recomputing both, 4 more
  * probes for language ID, plus regexp passes for bpe/punct/fingerprint).
  *
  * Semantics are bit-for-bit those of the legacy [[graft.ext.TextAnalysis]]
  * columns (cross-checked in TextStatsSpec and by the q30/q38 DuckDB
  * oracles): tokenization is `split(trim(text), "\\s+")` with Spark's
  * space-only `trim` and trailing-empty-preserving split; `quality` repeats
  * the exact double arithmetic; `fingerprint` is md5 of
  * `lower(trim(regexp_replace(text, "\\s+", " ")))`; `lang_guess` is the
  * alphabetical-priority argmax over the marker sets.
  *
  * Scale posture: codegen'd, no shuffle, one String materialization and one
  * token array per row — a corpus scan runs at parquet-read speed and
  * parallelizes embarrassingly.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("fingerprint", StringType, nullable = false),
    StructField("lang_guess", StringType, nullable = false)))

  private val WS = Pattern.compile("\\s+")
  private val BPE = Pattern.compile("\\w+|[^\\w\\s]")

  private val STOP: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.ext.TextAnalysis.stopwords.foreach(s.add)
    s
  }
  // alphabetical language order = the deterministic argmax tiebreak
  private val LANGS: Array[String] = Array("de", "en", "es", "fr")
  private val LANG_SETS: Array[java.util.HashSet[String]] =
    LANGS.map { l =>
      val s = new java.util.HashSet[String]()
      graft.ext.TextAnalysis.langMarkers(l).foreach(s.add)
      s
    }

  private val PUNCT: Array[Boolean] = {
    val a = new Array[Boolean](128)
    ".,!?;:'\"()[]-".foreach(c => a(c) = true)
    a
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** Space-only trim, matching Spark's `trim()` (UTF8String.trim). */
  private def spaceTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  private def lowerAscii(s: String): String = {
    var i = 0
    var ascii = true
    var hasUpper = false
    while (i < s.length && ascii) {
      val c = s.charAt(i)
      if (c >= 0x80) ascii = false
      else if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    // Locale.ROOT: Spark's lower() is locale-independent; the JVM default
    // locale would diverge (e.g. Turkish 'I' → 'ı') and break the
    // documented bit-for-bit equivalence with the builtin columns.
    if (!ascii) s.toLowerCase(java.util.Locale.ROOT)
    else if (!hasUpper) s
    else {
      val a = s.toCharArray
      var j = 0
      while (j < a.length) {
        val c = a(j)
        if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
        j += 1
      }
      new String(a)
    }
  }

  /** Called from generated code — keep signature stable. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val trimmed = spaceTrim(s)
    // -1 keeps trailing empty tokens, matching Spark's StringSplit
    val toks = WS.split(trimmed, -1)

    var nStop = 0
    val langCounts = new Array[Int](LANGS.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (STOP.contains(t)) nStop += 1
      val lt = lowerAscii(t)
      var l = 0
      while (l < LANG_SETS.length) {
        if (LANG_SETS(l).contains(lt)) langCounts(l) += 1
        l += 1
      }
      i += 1
    }

    var bpe = 0
    val m = BPE.matcher(s)
    while (m.find()) bpe += 1

    var nPunct = 0
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (c < 128 && PUNCT(c)) nPunct += 1
      j += 1
    }

    val nTok = toks.length.toDouble
    val lenScore = Math.min(1.0, nTok / 50.0)
    val stopScore = Math.min(1.0, (nStop.toDouble / Math.max(nTok, 1.0)) * 5.0)
    val nChars = s.codePointCount(0, s.length).toDouble
    val punctRatio = nPunct.toDouble / Math.max(nChars, 1.0)
    val quality =
      lenScore * (0.5 + 0.5 * stopScore) * (1.0 - Math.min(1.0, punctRatio * 2.0))

    // normalized = lower(trim(regexp_replace(text, "\s+", " "))) — the
    // token array IS that normalization: single-space join of ws tokens
    val sb = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < toks.length) {
      if (i > 0) sb.append(' ')
      sb.append(toks(i))
      i += 1
    }
    // edge \t/\n runs survive the space-only trim as empty tokens; the
    // join turns each into one edge space, which regexp+trim would drop
    val digest = md5Local.get()
    digest.reset()
    val bytes = digest.digest(
      lowerAscii(spaceTrim(sb.toString)).getBytes(StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    j = 0
    while (j < 16) {
      hex(j * 2) = HEX((bytes(j) >> 4) & 0xf)
      hex(j * 2 + 1) = HEX(bytes(j) & 0xf)
      j += 1
    }

    var best = 0
    var l = 0
    while (l < langCounts.length) {
      if (langCounts(l) > best) best = langCounts(l)
      l += 1
    }
    var lang = "und"
    if (best > 0) {
      l = 0
      var found = false
      while (l < langCounts.length && !found) {
        if (langCounts(l) == best) { lang = LANGS(l); found = true }
        l += 1
      }
    }

    new GenericInternalRow(Array[Any](
      toks.length, bpe, nStop, nPunct, quality,
      UTF8String.fromString(new String(hex)), UTF8String.fromString(lang)))
  }

  def textStats(text: Column): Column =
    GraftExpressionBridge.column(TextStats(GraftExpressionBridge.expression(text)))
}
