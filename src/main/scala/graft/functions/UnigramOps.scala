package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family) Viterbi segmentation as a native
  * expression — the hot loop is a static JVM method invoked from generated
  * code, so rows stay inside whole-stage codegen (no UDF boundary).
  *
  * Scores are QUANTIZED INTEGERS (fixed-point log-probs, stamped at train
  * time and carried as data), so the DP is pure integer arithmetic with a
  * pinned tie rule — bit-replayable by any engine that can read the
  * persisted vocabulary, with no floating point anywhere in the encode
  * path.
  */
object UnigramUtil {

  /** Score of an out-of-vocabulary single character — far below any real
    * piece so known pieces always win, but finite so every word segments
    * (full coverage). Mirrored verbatim in the DuckDB oracle. */
  val UNK_SCORE: Long = -100000000L

  /** Viterbi-best segmentation of one word under integer piece scores.
    *
    * DP over prefix lengths IN CODEPOINTS: `best(i) = max over piece
    * lengths l` of `best(i-l) + score(word[i-l, i))`; candidate pieces
    * are vocabulary entries up to `maxLen` codepoints, plus ANY single
    * CODEPOINT at [[UNK_SCORE]] when it is not in the vocabulary
    * (coverage). Ties break toward the LONGER last piece — fixed,
    * engine-replayable. Codepoint indexing (not UTF-16 units) matches
    * both the Spark-side training (UTF8String substring/length count
    * codepoints) and the DuckDB oracle's substr/len — a non-BMP char
    * (emoji, CJK extension) is one UNK unit, never a split surrogate
    * pair (pinned in UnigramSpec). */
  def encodeWord(word: String, scores: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): Array[String] = {
    if (word.isEmpty) return Array.empty
    // char offset of each codepoint boundary: off(0)=0 .. off(n)=word.length
    val off = new Array[Int](word.codePointCount(0, word.length) + 1)
    val n = off.length - 1
    var k = 0; var ci = 0
    while (k < n) { off(k) = ci; ci = word.offsetByCodePoints(ci, 1); k += 1 }
    off(n) = word.length
    val best = new Array[Long](n + 1)
    val choice = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestScore = Long.MinValue
      var bestL = 0
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val piece = word.substring(off(i - l), off(i))
        val s = scores.get(piece)
        val pieceScore: java.lang.Long =
          if (s != null) s
          else if (l == 1) UNK_SCORE
          else null
        if (pieceScore != null) {
          val cand = best(i - l) + pieceScore
          if (cand > bestScore || (cand == bestScore && l > bestL)) {
            bestScore = cand; bestL = l
          }
        }
        l += 1
      }
      best(i) = bestScore
      choice(i) = bestL
      i += 1
    }
    // backtrack
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var pos = n
    while (pos > 0) {
      val l = choice(pos)
      out += word.substring(off(pos - l), off(pos))
      pos -= l
    }
    out.reverseIterator.toArray
  }

  /** Encode full text: whitespace-split, lowercase, per-word Viterbi. */
  def encodeText(text: String, scores: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): Array[String] = {
    val words = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[String](words.length * 2)
    words.foreach { w => if (w.nonEmpty) out ++= encodeWord(w, scores, maxLen) }
    out.toArray
  }
}

/** `unigram_encode(text)` with a bound (piece → quantized score) table:
  * array of unigram-LM tokens. */
case class UnigramEncodeExpr(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"unigram_encode needs string, got $t")
  }

  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, s) => m.putIfAbsent(p, s) }
    m
  }
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1
    else math.max(1, vocab.map(p => p._1.codePointCount(0, p._1.length)).max)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      UnigramUtil.encodeText(v.asInstanceOf[UTF8String].toString, scores, maxLen)
        .map(UTF8String.fromString(_)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scoresRef = ctx.addReferenceObj("ugScores", scores, "java.util.HashMap")
    val maxLenRef = ctx.addReferenceObj("ugMaxLen", Integer.valueOf(maxLen),
      "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, s => {
      val cls = "graft.functions.UnigramExprRuntime"
      s"${ev.value} = $cls.encodeText($s, $scoresRef, $maxLenRef);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static bridge for generated code (same shape as [[BpeExprRuntime]]). */
object UnigramExprRuntime {
  def encodeText(text: UTF8String,
      scores: java.util.HashMap[String, java.lang.Long],
      maxLen: java.lang.Integer): org.apache.spark.sql.catalyst.util.ArrayData =
    new GenericArrayData(
      UnigramUtil.encodeText(text.toString, scores, maxLen.intValue())
        .map(UTF8String.fromString(_)))
}

object UnigramOps {
  def encode(text: Column, vocab: Seq[(String, Long)]): Column =
    GraftExpressionBridge.column(UnigramEncodeExpr(
      GraftExpressionBridge.expression(text), vocab))
}
