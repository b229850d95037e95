package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramOps

/** Unigram-LM tokenizer TRAINING and encoding on Spark — the SentencePiece
  * unigram model family (Kudo 2018, public algorithm), the other major
  * tokenizer besides [[Bpe]] a training-data pipeline trains on its corpus.
  *
  * Simplified-but-faithful training:
  *
  *  1. SEED: one corpus-scale pass extracts distinct-word frequencies
  *     (the q52 shape — the ONLY corpus-∝ work); candidate pieces are
  *     every substring of every distinct word up to `maxPieceLen` chars,
  *     counted with occurrence multiplicity × word frequency, pruned to
  *     the `seedSize` most frequent plus ALL single characters (coverage).
  *     From here on everything operates on the bounded piece set and the
  *     distinct-word vocabulary — nothing grows with corpus size.
  *  2. HARD-EM rounds: piece counts quantize to integer log-prob scores
  *     (`floor(ln(count/total)·1e6)` — stamped ONCE on the JVM, then pure
  *     integer data); the E-step Viterbi-segments every distinct word
  *     under those scores ([[graft.functions.UnigramEncodeExpr]], a native
  *     codegen'd DP — no UDF) and re-counts pieces along the best
  *     segmentations weighted by word frequency (exact longs); the M-step
  *     re-quantizes. Pieces that attract no counts drop; single chars
  *     persist at a count floor of 1 so coverage never breaks.
  *  3. PRUNE to `vocabSize` pieces by final count (single chars always
  *     kept), with scores re-quantized over the kept set.
  *
  * Everything after the one JVM `ln` quantization is exact integer
  * arithmetic with a pinned Viterbi tie rule (longer last piece wins), so
  * ENCODING is bit-replayable by any engine that reads the persisted
  * vocabulary — the q147 DuckDB oracle replays the full DP from the
  * stored (piece, qscore) table, exactly like q143 replays BPE encode
  * from the stored merges.
  */
object Unigram {

  /** A trained vocabulary: (piece, quantized log-prob score). */
  case class Vocab(pieces: Seq[(String, Long)])

  /** Distinct-word frequencies — the one corpus-scale pass (shared shape
    * with [[Bpe.wordFrequencies]]). */
  private def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(sum(lit(1L)).as("freq"))

  /** floor(ln(c/T)·1e6) per piece — the ONE floating-point moment, stamped
    * on the driver at train time; results are data from then on. */
  private def quantize(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) =>
      p -> math.floor(math.log(c.toDouble / total) * 1e6).toLong
    }
  }

  /** Train a unigram-LM vocabulary. `seedSize` bounds the candidate piece
    * set (driver-artifact-sized, like BPE merge tables or PQ codebooks);
    * `emIters` hard-EM refinement rounds; final size ≤ `vocabSize` + the
    * corpus character set. */
  def train(df: DataFrame, vocabSize: Int = 512, seedSize: Int = 2000,
      maxPieceLen: Int = 6, emIters: Int = 2,
      textCol: String = "text"): Vocab = {
    require(vocabSize > 0 && seedSize > 0 && maxPieceLen >= 1 && emIters >= 0,
      "positive unigram training parameters")
    val words = wordFreqs(df, textCol)
      .localCheckpoint(true) // reused every EM round
    val subs = words.select(col("freq"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), " +
          s"i -> transform(sequence(1, least($maxPieceLen, length(word) - i + 1)), " +
          s"l -> substring(word, i, l))))")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .localCheckpoint(true)
    // bounded collects: top-seedSize pieces + the full character set
    val top = subs.orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val chars = subs.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var counts: Map[String, Long] = (chars ++ top).toMap

    for (_ <- 1 to emIters) {
      val scores = quantize(counts.toSeq.sortBy(_._1))
      // E-step: Viterbi-segment every distinct word, re-count pieces along
      // the best segmentations (exact integer counts, freq-weighted)
      val seg = words.select(col("freq"),
          explode(UnigramOps.encode(col("word"), scores)).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // pieces with no mass drop; single chars persist at a floor of 1
      counts = counts.keysIterator.flatMap { p =>
        seg.get(p) match {
          case Some(c) => Some(p -> c)
          case None if p.length == 1 => Some(p -> 1L)
          case None => None
        }
      }.toMap
    }

    // prune to vocabSize by (count desc, piece asc); chars always survive
    val kept = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      .toMap ++ counts.filter(_._1.length == 1)
    Vocab(quantize(kept.toSeq.sortBy(_._1)))
  }

  /** Encode `c` with a trained vocabulary: one array<string> of tokens per
    * row (per-word integer Viterbi, longer-piece tiebreak). */
  def encode(vocab: Vocab, c: Column): Column =
    UnigramOps.encode(c, vocab.pieces)

  /** Persist a vocabulary as a lake table `(piece, qscore)` — the
    * tokenizer-ARTIFACT lifecycle ([[Bpe.save]]'s idea): version it like
    * any table, reload from any session or engine. */
  def save(spark: org.apache.spark.sql.SparkSession, path: String,
      vocab: Vocab): graft.lake.LakeTable = {
    require(vocab.pieces.nonEmpty, "nothing to save: empty vocabulary")
    val df = spark.createDataFrame(vocab.pieces).toDF("piece", "qscore")
    if (graft.lake.CommitLog.latestVersion(path,
        spark.sessionState.newHadoopConf()).isDefined) {
      val t = graft.lake.LakeTable.load(spark, path)
      t.overwrite(df)
      t
    } else graft.lake.LakeTable.create(spark, path,
      graft.lake.TableSpec("piece", "qscore"), df)
  }

  /** Reload a persisted vocabulary (optionally a past version). Bounded —
    * a driver-side artifact like BPE merges or PQ codebooks. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String,
      versionAsOf: Option[Long] = None): Vocab = {
    val rows = graft.lake.LakeTable.load(spark, path).read(versionAsOf)
      .select("piece", "qscore").orderBy("piece").collect()
    require(rows.nonEmpty, s"no vocabulary stored at $path")
    Vocab(rows.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  /** Per-document token statistics under the trained tokenizer. */
  def tokenStats(df: DataFrame, vocab: Vocab, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), encode(vocab, col(textCol)).as("ug"))
      .select(col(idCol), size(col("ug")).cast("long").as("n_ug_tokens"), col("ug"))
}
