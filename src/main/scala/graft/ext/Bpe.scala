package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeOps

/** Byte-pair-encoding tokenizer TRAINING and encoding on Spark — the
  * "train the tokenizer on the corpus" step of a training-data pipeline
  * (Sennrich et al. 2016, public algorithm).
  *
  * Scale shape: the only corpus-scale work is the word-frequency
  * extraction — one explode + hash aggregate over the tokens, exactly the
  * word-frequency query shape (q52), done ONCE. Every merge round after
  * that operates on the distinct-word VOCABULARY (orders of magnitude
  * smaller than the corpus) as one narrow aggregate: adjacent-pair counts
  * (explode, weighted by word frequency, partial-agg sum) plus a
  * driver-side argmax with a deterministic lexicographic tiebreak; the
  * winning pair is folded into the vocabulary by a native expression with
  * exact left-to-right non-overlapping semantics
  * ([[graft.functions.BpeMergePair]]). Nothing in the loop grows with
  * corpus size.
  *
  * Encoding applies the learned merges greedily (lowest rank first) via
  * [[graft.functions.BpeEncodeExpr]] — a native expression whose hot loop
  * runs as a static JVM method inside whole-stage codegen, not a UDF.
  */
object Bpe {

  /** A learned merge table: ranked (left, right) symbol pairs. */
  case class Merges(pairs: Seq[(String, String)])

  /** End-of-word sentinel appended to each word's last symbol so merges
    * never cross word boundaries (standard BPE practice). */
  val EOW = "·"

  /** Distinct-word frequencies of a corpus — the one corpus-scale pass. */
  def wordFrequencies(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train up to `numMerges` BPE merges from the corpus. Deterministic:
    * ties on pair frequency break lexicographically on (left, right);
    * training stops early when no adjacent pair is left. */
  def train(df: DataFrame, numMerges: Int, textCol: String = "text"): Merges = {
    // each round rewrites the vocab: localCheckpoint (eager) both caches it
    // AND truncates the logical plan — without that the lineage nests one
    // projection per merge and plan analysis blows up long before the data
    // does (the vocab itself is tiny)
    var vocab = wordFrequencies(df, textCol)
      // split('') can emit a trailing '' depending on regex semantics —
      // filter first, THEN tag the last real character with the EOW mark
      .withColumn("cs", expr("filter(split(word, ''), c -> c <> '')"))
      .withColumn("syms", expr(
        s"transform(cs, (c, i) -> if (i = size(cs) - 1, concat(c, '$EOW'), c))"))
      .select("syms", "freq")
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = vocab
        // single-symbol words have no pairs (sequence(0,-1) would DESCEND
        // and index out of bounds under ANSI)
        .select(col("freq"), explode(expr(
          "CASE WHEN size(syms) < 2 THEN array() ELSE " +
            "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i+1] AS r)) END"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r))
        vocab = vocab
          .withColumn("syms", BpeOps.mergePair(col("syms"), array(lit(l), lit(r))))
          .localCheckpoint(true)
        round += 1
      }
    }
    Merges(merges.toSeq)
  }

  /** Encode `c` with a learned merge table: one array<string> of BPE
    * tokens per row (greedy lowest-rank-first merging per word). */
  def encode(merges: Merges, c: Column): Column =
    BpeOps.encode(c, merges.pairs, EOW)

  /** Per-document token statistics under the learned tokenizer. */
  def tokenStats(df: DataFrame, merges: Merges, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), encode(merges, col(textCol)).as("bpe"))
      .select(col(idCol), size(col("bpe")).cast("long").as("n_bpe_tokens"), col("bpe"))
}
