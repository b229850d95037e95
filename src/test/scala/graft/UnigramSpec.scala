package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Unigram
import graft.functions.UnigramUtil

/** Unigram-LM tokenizer: deterministic training, full coverage, Viterbi
  * semantics pinned against an independent reference DP, artifact
  * round-trip. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")

  test("training is deterministic and the artifact round-trips the lake table") {
    val d = docs.filter(col("doc_id") < 300)
    val v1 = Unigram.train(d, vocabSize = 200, seedSize = 800, maxPieceLen = 4, emIters = 2)
    val v2 = Unigram.train(d, vocabSize = 200, seedSize = 800, maxPieceLen = 4, emIters = 2)
    assert(v1.pieces == v2.pieces, "training must be deterministic")
    assert(v1.pieces.nonEmpty && v1.pieces.exists(_._1.length > 1),
      "a trained vocab must contain multi-char pieces")
    val path = Files.createTempDirectory("graft_ug").toString
    Unigram.save(spark, path, v1)
    assert(Unigram.loadVocab(spark, path).pieces == v1.pieces)
  }

  test("encoding covers every character: token concatenation rebuilds the text") {
    val d = docs.filter(col("doc_id") < 300)
    val v = Unigram.train(d, vocabSize = 200, seedSize = 800, maxPieceLen = 4, emIters = 1)
    // also encode docs OUTSIDE the training set — unknown chars must pass
    // through as UNK singles, never vanish
    val enc = docs.filter(col("doc_id") < 600)
      .select(col("doc_id"),
        array_join(Unigram.encode(v, col("text")), "").as("glued"),
        regexp_replace(lower(trim(col("text"))), "\\s+", "").as("want"))
    assert(enc.filter(col("glued") =!= col("want")).isEmpty,
      "every word must segment into pieces that concatenate back to it")
  }

  test("a dominant word becomes one piece and Viterbi emits it whole") {
    val corpus = (Seq.fill(500)("zqxjwv") ++ Seq.fill(3)("other words here"))
      .toDF("text")
    val v = Unigram.train(corpus, vocabSize = 64, seedSize = 200,
      maxPieceLen = 6, emIters = 2)
    assert(v.pieces.exists(_._1 == "zqxjwv"), "the dominant word must survive as a piece")
    val toks = Seq("zqxjwv").toDF("text")
      .select(Unigram.encode(v, col("text"))).head().getSeq[String](0)
    assert(toks == Seq("zqxjwv"), s"must encode as one piece, got $toks")
  }

  test("native Viterbi matches an independent reference DP, tie rule included") {
    val d = docs.filter(col("doc_id") < 300)
    val v = Unigram.train(d, vocabSize = 200, seedSize = 800, maxPieceLen = 4, emIters = 1)
    val scores = v.pieces.toMap
    val maxLen = v.pieces.map(_._1.length).max
    // reference DP, written independently of UnigramUtil
    def reference(word: String): Seq[String] = {
      val n = word.length
      val best = Array.fill(n + 1)(Long.MinValue); best(0) = 0L
      val pick = Array.fill(n + 1)(0)
      for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
        val piece = word.substring(i - l, i)
        val s = scores.get(piece)
          .orElse(if (l == 1) Some(UnigramUtil.UNK_SCORE) else None)
        s.foreach { sc =>
          if (best(i - l) != Long.MinValue) {
            val cand = best(i - l) + sc
            if (cand > best(i) || (cand == best(i) && l > pick(i))) {
              best(i) = cand; pick(i) = l
            }
          }
        }
      }
      var pos = n
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (pos > 0) { out.prepend(word.substring(pos - pick(pos), pos)); pos -= pick(pos) }
      out.toList
    }
    val words = d.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(200)
      .collect().map(_.getString(0))
    val got = words.toSeq.toDF("text")
      .select(col("text"), Unigram.encode(v, col("text")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(got(w) == reference(w), s"Viterbi diverged on '$w'")
    }
  }

  test("non-BMP text segments by CODEPOINT: an emoji is one UNK unit, never a split surrogate pair") {
    // vocab with only ASCII pieces; the word mixes in supplementary-plane
    // chars (2 UTF-16 units each) — a UTF-16-indexed DP would emit
    // unpaired surrogates as separate UNK "chars"
    val v = Unigram.Vocab(Seq(("ab", -100L), ("c", -200L)))
    val word = "ab😀c🤓" // ab😀c🤓
    val got = Seq(word).toDF("text")
      .select(Unigram.encode(v, col("text"))).head().getSeq[String](0)
    assert(got == Seq("ab", "😀", "c", "🤓"),
      s"expected codepoint-aligned tokens, got $got")
    // concatenation must rebuild the text exactly (no lost/duplicated units)
    assert(got.mkString == word)
    // and the scorer side: maxLen is counted in codepoints, so a 1-codepoint
    // non-BMP piece in the vocab is matchable
    val v2 = Unigram.Vocab(Seq(("😀", -50L), ("a", -100L)))
    val got2 = Seq("a😀a").toDF("text")
      .select(Unigram.encode(v2, col("text"))).head().getSeq[String](0)
    assert(got2 == Seq("a", "😀", "a"))
  }
}
