package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeOps, BpeUtil}

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

  /** Per-merge-round training telemetry: the chosen pair, its count, and
    * how many vocabulary words actually contained it — the round's true
    * work set (everything exploded/re-aggregated that round is ∝ this,
    * never ∝ the vocabulary). */
  case class RoundStat(l: String, r: String, n: Long, affectedWords: Long)

  /** Adjacent symbol pairs of `symsCol`, weighted by word frequency.
    * Single-symbol words emit nothing (sequence(0,-1) would DESCEND and
    * index out of bounds under ANSI). */
  private def pairsOf(df: DataFrame, symsCol: String): DataFrame =
    df.select(col("freq"), explode(expr(
      s"CASE WHEN size($symsCol) < 2 THEN array() ELSE " +
        s"transform(sequence(0, size($symsCol) - 2), " +
        s"i -> struct($symsCol[i] AS l, $symsCol[i+1] AS r)) END")).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("freq"))

  /** Does `syms` contain (l, r) adjacent? A word contains the pair iff
    * merging it changes the array — the check IS the native merge
    * expression (codegen'd, zero per-row allocation beyond the candidate
    * merge), so detection can never disagree with what the fold does.
    * Typed columns, not SQL text — symbols are corpus-derived and may
    * contain quote characters. */
  private def containsPair(syms: Column, l: String, r: String): Column =
    BpeOps.mergePair(syms, array(lit(l), lit(r))) =!= syms

  /** Initial symbol vocabulary: one row per distinct word, chars split out
    * with the EOW mark on the last. */
  private def initialVocab(df: DataFrame, textCol: String): DataFrame =
    wordFrequencies(df, textCol)
      // split('') can emit a trailing '' depending on regex semantics —
      // filter first, THEN tag the last real character with the EOW mark
      .withColumn("cs", expr("filter(split(word, ''), c -> c <> '')"))
      .withColumn("syms", expr(
        s"transform(cs, (c, i) -> if (i = size(cs) - 1, concat(c, '$EOW'), c))"))
      .select("syms", "freq")

  /** Train up to `numMerges` BPE merges from the corpus. Deterministic:
    * ties on pair frequency break lexicographically on (left, right) in
    * UTF-8 binary order (Spark's string collation); training stops early
    * when no adjacent pair is left. */
  def train(df: DataFrame, numMerges: Int, textCol: String = "text"): Merges =
    trainWithStats(df, numMerges, textCol)._1

  /** Incremental, BATCHED training loop. Pair counts are computed from
    * the corpus ONCE; after that merges are accepted in speculative
    * batches of up to `maxBatch`, each batch costing a CONSTANT number of
    * Spark jobs (~6) instead of one scheduler round-trip per merge:
    *
    *  1. a driver-side SAMPLE of the highest-frequency words simulates
    *     sequential BPE to PROPOSE the next B merges (heuristic — it can
    *     only cost performance, never correctness);
    *  2. one distributed pass chains the B proposed merges over the
    *     vocabulary (`s0 → s1 → … → sB`, each step a native
    *     [[graft.functions.BpeMergePair]] call) and aggregates the EXACT
    *     per-round pair-count deltas plus per-round affected-word counts
    *     from only the words the batch touches;
    *  3. a driver-side CERTIFICATE replays the argmax recurrence over
    *     (exact snapshot top-M counts) + (exact per-round deltas) and
    *     accepts the longest proposal prefix provably identical to what
    *     one-merge-at-a-time sequential training would have chosen —
    *     count AND (left, right) UTF-8 tie-break. Pairs outside the
    *     certified knowledge set are bounded above by the M-th snapshot
    *     count, so a pass can never be a false positive; a truncation
    *     just shrinks the next batch (adaptive B);
    *  4. the count table is delta-merged and the vocabulary spliced as a
    *     lazy filter+union overlay, consolidated every few rounds.
    *
    * At 32k–100k merges on a 100 TB corpus this is the difference
    * between `rounds × (scheduler round-trip + full-vocab recount)` and
    * `one corpus pass + rounds/B job groups of Σ affected-word work`.
    * Exact: longs in, longs out, and every accepted merge carries a
    * certificate, so the sequence (tie-break included) equals the
    * one-at-a-time loop bit-for-bit (pinned in BpeSpec). */
  def trainWithStats(df: DataFrame, numMerges: Int,
      textCol: String = "text", maxBatch: Int = 32): (Merges, Seq[RoundStat]) = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    var vocab = initialVocab(df, textCol).localCheckpoint(true)
    // the last MATERIALIZED vocab (the overlay between consolidations is
    // lazy and references it); superseded checkpoints are freed eagerly —
    // see [[freeCheckpoint]]
    var vocabCkpt = vocab
    // affected-set checkpoints the current overlay still references;
    // freed at the next consolidation
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // the ONE corpus/vocab-scale pair aggregation
    var pairCounts = pairsOf(vocab, "syms")
      .groupBy("l", "r").agg(sum("freq").as("n"))
      .localCheckpoint(true)
    def replacePairCounts(next: DataFrame): Unit = {
      val old = pairCounts
      pairCounts = next.localCheckpoint(true)
      freeCheckpoint(old)
    }

    // speculation sample: top-K words by frequency, evolved driver-side as
    // merges are accepted. Its tiebreak/coverage is deliberately
    // uncertified — proposals it produces are checked before acceptance.
    val sample = if (maxBatch > 1) fetchSample(vocab)
      else scala.collection.mutable.ArrayBuffer.empty[(Array[String], Long)]

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStat]
    var sinceConsolidate = 0
    var exhausted = false
    var batchSize = math.min(8, math.max(1, maxBatch))
    // snapshot horizon: how many exact top counts the certificate sees.
    // Grows (capped) whenever a batch truncates ONLY because a proposed
    // count tied/undercut the M-th — flat count tails need a deeper
    // exact region, not a smaller batch. A 64k-row driver fetch of
    // (l, r, n) is trivially bounded at any corpus scale.
    var horizon = 1024
    // tie-plateau backoff: when certification fails at round 1 with the
    // horizon ALREADY capped (a count tie that 64k exact rows cannot
    // break), batching cannot help — stop paying failed speculative
    // passes and run single-merge for a stretch, then probe again
    var singleUntil = 0

    def consolidate(accepted: Int): Unit = {
      sinceConsolidate += accepted
      if (sinceConsolidate >= CONSOLIDATE_EVERY) {
        // bound the filter/union lineage chain; one vocab-sized write per
        // CONSOLIDATE_EVERY merges (coalesced so the union-accumulated
        // partitions reset too — a checkpoint that kept them would grow
        // the next union's task count exponentially). The new checkpoint
        // is a materialized copy, so the old one and every affected-set
        // checkpoint the overlay referenced can be freed now.
        vocab = vocab.coalesce(par).localCheckpoint(true)
        freeCheckpoint(vocabCkpt)
        retired.foreach(freeCheckpoint)
        retired.clear()
        vocabCkpt = vocab
        sinceConsolidate = 0
      }
    }

    /** One exact single-merge round with `(l, r, n)` already known to be
      * the argmax of the exact count table. */
    def singleMerge(l: String, r: String, n: Long): Unit = {
      merges += ((l, r))
      // the round's work set: only words containing (l, r) — eagerly
      // materialized (it is small) with old AND new symbols side by side
      val affected = vocab.filter(containsPair(col("syms"), l, r))
        .withColumn("new_syms", BpeOps.mergePair(col("syms"), array(lit(l), lit(r))))
        .coalesce(par)
        .localCheckpoint(true)
      retired += affected
      stats += RoundStat(l, r, n, affected.count())
      // delta = (new adjacencies) − (old adjacencies) of the affected
      // words only; merged into the persisted count table by key
      val delta = pairsOf(affected, "new_syms").withColumn("d", col("freq"))
        .unionByName(pairsOf(affected, "syms").withColumn("d", -col("freq")))
        .groupBy("l", "r").agg(sum("d").as("d"))
      replacePairCounts(pairCounts.join(delta, Seq("l", "r"), "full_outer")
        .select(col("l"), col("r"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("d"), lit(0L))).as("n"))
        .filter(col("n") > 0))
      vocab = vocab.filter(!containsPair(col("syms"), l, r))
        .unionByName(affected.select(col("new_syms").as("syms"), col("freq")))
      applyToSample(sample, Seq((l, r)))
      consolidate(1)
    }

    while (merges.length < numMerges && !exhausted) {
      val plateau = merges.length < singleUntil
      val want = if (plateau) 1 else math.min(batchSize, numMerges - merges.length)
      val mTop = math.max(4 * want + 64, horizon)
      val top = pairCounts
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(mTop).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val proposal =
        if (top.isEmpty || want <= 1) Seq.empty else simulate(sample, want, top)
      if (top.isEmpty) exhausted = true
      else if (proposal.length <= 1) {
        val (l, r, n) = top.head
        singleMerge(l, r, n)
        if (!plateau) batchSize = math.min(maxBatch, batchSize * 2)
      } else {
        val b = proposal.length
        // exact base counts for proposed pairs that sit below the top-M
        // horizon (absent row = count 0): the certificate needs the
        // proposal's own counts exactly, never as a bound
        val needBase = proposal.toSet
          .diff(top.map(t => (t._1, t._2)).toSet).toSeq
        val baseMap: Map[(String, String), Long] =
          if (needBase.isEmpty) Map.empty
          else pairCounts.filter(
              needBase.map(p => col("l") === lit(p._1) && col("r") === lit(p._2))
                .reduce(_ || _))
            .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        // chain the proposed merges: s0 = syms, sk = merge k applied to
        // s(k-1). A word is touched by the batch iff sB != s0 (merging
        // only ever shortens the array, so any intermediate change
        // survives to sB)
        var chained = vocab.withColumn("_s0", col("syms"))
        for (k <- 1 to b) chained = chained.withColumn(s"_s$k",
          BpeOps.mergePair(col(s"_s${k - 1}"),
            array(lit(proposal(k - 1)._1), lit(proposal(k - 1)._2))))
        val aff = chained.filter(col(s"_s$b") =!= col("_s0"))
          .coalesce(par).localCheckpoint(true)
        retired += aff
        // per-round work set + exact count deltas from ONE compact plan:
        // the chained columns pack into an array, one explode emits
        // (round, cur, prev) for the rounds that changed a word, a second
        // emits signed adjacent pairs. Replaces a 2B-branch filter+union
        // plan (B per-round frames × ±pairsOf each) whose ANALYSIS, not
        // execution, dominated batch wall time — the round-13 job profile
        // showed 1-2 s driver gaps between sub-second jobs at every
        // batch, growing with B. Algebra unchanged: same signed adjacent
        // pairs, same groupBy(round, l, r) sums.
        val rounds = aff
          .withColumn("_chain", array((0 to b).map(k => col(s"_s$k")): _*))
          .select(col("freq"), explode(expr(
            s"transform(sequence(1, $b), k -> " +
              "struct(k AS round, _chain[k] AS cur, _chain[k-1] AS prev))")).as("r"))
          .filter(col("r.cur") =!= col("r.prev"))
          .select(col("r.round").as("round"), col("r.cur").as("cur"),
            col("r.prev").as("prev"), col("freq"))
        // per-round affected-word counts (rounds absent from the map
        // touched zero words)
        val affCount: Map[Int, Long] = rounds.groupBy("round")
          .agg(count(lit(1)).as("a")).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        def pairD(s: String, sign: String): String =
          s"CASE WHEN size($s) < 2 THEN array() ELSE " +
            s"transform(sequence(0, size($s) - 2), " +
            s"i -> struct($s[i] AS l, $s[i+1] AS r, ${sign}freq AS d)) END"
        val deltas = rounds
          .select(col("round"),
            explode(concat(expr(pairD("cur", "")), expr(pairD("prev", "-")))).as("p"))
          .select(col("round"), col("p.l"), col("p.r"), col("p.d"))
          .groupBy("round", "l", "r").agg(sum("d").as("d"))
          .filter(col("d") =!= 0)
          .collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        val byRound = deltas.groupBy(_._1)
          .map { case (k, rs) => k -> rs.map(t => (t._2, t._3, t._4)).toSeq }
        val (accepted, roundNs, horizonLimited) =
          certify(top, top.length == mTop, proposal, baseMap, byRound)
        if (horizonLimited) {
          val grown = math.min(horizon * 4, 1 << 16)
          if (grown == horizon && accepted == 0)
            singleUntil = merges.length + 32
          horizon = grown
        }
        if (accepted == 0) {
          // proposal's very first pair wasn't the exact argmax — fall
          // back to one certain merge; shrink the batch only on a REAL
          // mismatch (a horizon-limited failure retries at full size
          // with a deeper exact region)
          val (l, r, n) = top.head
          singleMerge(l, r, n)
          if (!horizonLimited) batchSize = 2
        } else {
          val t = accepted
          for (k <- 1 to t) {
            val (l, r) = proposal(k - 1)
            merges += ((l, r))
            stats += RoundStat(l, r, roundNs(k - 1), affCount.getOrElse(k, 0L))
          }
          // count-table update: the accepted rounds' deltas, summed by
          // pair (driver-built — the delta set is bounded by pairs
          // adjacent to merged occurrences, O(symbol vocabulary) rows)
          val acceptedDelta = deltas.filter(_._1 <= t)
            .groupBy(d => (d._2, d._3))
            .map { case ((l, r), rs) => (l, r, rs.map(_._4).sum) }
            .filter(_._3 != 0).toSeq
          if (acceptedDelta.nonEmpty) {
            val deltaDf = df.sparkSession.createDataFrame(acceptedDelta)
              .toDF("l", "r", "d")
            replacePairCounts(pairCounts.join(deltaDf, Seq("l", "r"), "full_outer")
              .select(col("l"), col("r"),
                (coalesce(col("n"), lit(0L)) + coalesce(col("d"), lit(0L))).as("n"))
              .filter(col("n") > 0))
          }
          // vocabulary overlay: words unchanged through round t pass a
          // narrow recomputed-chain filter; rewritten words union in
          // from the checkpointed touched set
          var keepChain = vocab.withColumn("_k0", col("syms"))
          for (k <- 1 to t) keepChain = keepChain.withColumn(s"_k$k",
            BpeOps.mergePair(col(s"_k${k - 1}"),
              array(lit(proposal(k - 1)._1), lit(proposal(k - 1)._2))))
          vocab = keepChain.filter(col(s"_k$t") === col("syms"))
            .select("syms", "freq")
            .unionByName(aff.filter(col(s"_s$t") =!= col("_s0"))
              .select(col(s"_s$t").as("syms"), col("freq")))
          applyToSample(sample, proposal.take(t))
          consolidate(t)
          batchSize =
            if (t == want) math.min(maxBatch, batchSize * 2)
            else if (horizonLimited) batchSize // deeper horizon, same size
            else math.max(2, t)
        }
      }
    }
    // release every block the loop pinned: the returned values are plain
    // driver objects, so nothing of the distributed state survives the call
    freeCheckpoint(vocabCkpt)
    retired.foreach(freeCheckpoint)
    freeCheckpoint(pairCounts)
    (Merges(merges.toSeq), stats.toSeq)
  }

  /** Overlay consolidation cadence — see [[trainWithStats]] step 4. */
  private val CONSOLIDATE_EVERY = 16

  /** Free a superseded localCheckpoint's cached blocks NOW instead of
    * waiting for the ContextCleaner to notice the DataFrame is garbage.
    * A 30k-merge training run retires thousands of checkpoints; left to
    * GC timing they pile up in the BlockManager and degrade everything
    * scheduled after the loop (the same block-accumulation failure mode
    * as an unpaired persist). */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))

  /** Speculation-sample size ([[trainWithStats]] step 1). Coverage-mass
    * heuristic: the top words by frequency dominate every top pair count,
    * so the sample's sequential simulation predicts the true merge order
    * far beyond the certificate's batch horizon. */
  private val SAMPLE_WORDS = 8192

  private def fetchSample(vocab: DataFrame)
      : scala.collection.mutable.ArrayBuffer[(Array[String], Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Array[String], Long)]
    vocab.orderBy(col("freq").desc).limit(SAMPLE_WORDS).collect()
      .foreach(r => out += ((r.getSeq[String](0).toArray, r.getLong(1))))
    out
  }

  /** UTF-8 binary (l, r) order — identical to Spark's `orderBy` on the
    * count table, so driver-side tie-breaks replay the engine's. */
  private def pairLess(a: (String, String), b: (String, String)): Boolean = {
    val c = org.apache.spark.unsafe.types.UTF8String.fromString(a._1)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b._1))
    c < 0 || (c == 0 &&
      org.apache.spark.unsafe.types.UTF8String.fromString(a._2)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b._2)) < 0)
  }

  /** Sequential BPE proposal over the driver sample, ANCHORED to the
    * exact snapshot: round k's counts are estimated as
    *
    *   est_k(p) = exactSnapshot(p) + (sampleCount_k(p) − sampleCount_0(p))
    *
    * — the sample predicts only the DELTAS its speculative merges cause,
    * never absolute counts. Raw sample counts break on corpora where the
    * top-K words are unrepresentative (near-uniform synthetic
    * frequencies): every round-1 proposal missed the exact argmax, the
    * certificate rejected whole batches, and training collapsed to
    * ~1 merge per round with the failed speculation paid on top. With
    * the anchor, round 1 IS the snapshot argmax by construction and
    * later rounds drift only where an unsampled word's delta decides a
    * tie. Proposals stay uncertified — the certificate decides.
    * Never mutates the sample (mergePair copies). */
  private def simulate(sample: scala.collection.mutable.ArrayBuffer[(Array[String], Long)],
      rounds: Int, exact: Array[(String, String, Long)]): Seq[(String, String)] = {
    def countsOf(ws: Array[(Array[String], Long)]): java.util.HashMap[(String, String), Long] = {
      val m = new java.util.HashMap[(String, String), Long]()
      ws.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          m.merge((syms(i), syms(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      m
    }
    val exactMap = new java.util.HashMap[(String, String), Long]()
    exact.foreach { case (l, r, n) => exactMap.put((l, r), n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // pairs already merged this simulation: merging eliminates every
    // (l, r) adjacency (mergePair merges all occurrences, and merging
    // never splits a symbol back apart), so a merged pair's true count is
    // 0 from then on. Its estimate, however, stays ≈ exact(p) whenever
    // its occurrences live mostly OUTSIDE the sampled words (corpus-scale
    // anchor, sample-scale drift) — without this exclusion the argmax can
    // re-propose p forever and the batch degenerates to [p, p, …] that
    // the certificate rejects one costly round at a time.
    val mergedSet = new java.util.HashSet[(String, String)]()
    var words = sample.toArray
    val c0 = countsOf(words)
    var k = 0
    var stop = false
    while (k < rounds && !stop) {
      val ck = countsOf(words)
      var best: (String, String) = null
      var bestN = Long.MinValue
      def offer(p: (String, String)): Unit = {
        if (mergedSet.contains(p)) return
        val est = exactMap.getOrDefault(p, 0L) +
          ck.getOrDefault(p, 0L) - c0.getOrDefault(p, 0L)
        if (est > 0 &&
            (est > bestN || (est == bestN && pairLess(p, best)))) {
          best = p; bestN = est
        }
      }
      // candidate union: exactly-known pairs ∪ pairs the sample currently
      // holds (new merged-symbol pairs live only in ck; vanished pairs'
      // negative drift is reached through exactMap/c0 keys)
      exactMap.forEach((p, _) => offer(p))
      ck.forEach((p, _) => if (!exactMap.containsKey(p)) offer(p))
      if (best == null) stop = true
      else {
        out += best
        mergedSet.add(best)
        words = words.map { case (syms, f) =>
          (BpeUtil.mergePair(syms, best._1, best._2), f)
        }
        k += 1
      }
    }
    out.toSeq
  }

  /** Evolve the driver sample through accepted merges, in order. */
  private def applyToSample(
      sample: scala.collection.mutable.ArrayBuffer[(Array[String], Long)],
      pairs: Seq[(String, String)]): Unit = {
    var i = 0
    while (i < sample.length) {
      var syms = sample(i)._1
      pairs.foreach(p => syms = BpeUtil.mergePair(syms, p._1, p._2))
      sample(i) = (syms, sample(i)._2)
      i += 1
    }
  }

  /** The acceptance certificate ([[trainWithStats]] step 3): replay the
    * sequential argmax recurrence driver-side over exact knowledge and
    * upper bounds, returning the longest proposal prefix that provably
    * equals sequential training, plus each accepted round's exact count.
    *
    * Knowledge sets: `top` (exact snapshot counts of the M best pairs),
    * `base` (exact snapshot counts of proposed pairs below the horizon),
    * per-round deltas (exact). A pair outside all three has snapshot
    * count ≤ the M-th count `nM`; once delta'd its intermediate count is
    * bounded by `nM + cumulative delta`. Round k certifies iff the
    * proposed pair's exact intermediate count beats every known count
    * and every bound (ties resolved by UTF-8 (l, r) order where the
    * competitor is known; an unknown-identity tie fails the round). A
    * failed round truncates the batch — never accepts — so the output
    * sequence is exact regardless of proposal quality. */
  private def certify(top: Array[(String, String, Long)], horizonFull: Boolean,
      proposal: Seq[(String, String)], base: Map[(String, String), Long],
      deltasByRound: Map[Int, Seq[(String, String, Long)]])
      : (Int, Seq[Long], Boolean) = {
    val nM = top.last._3
    val cur = scala.collection.mutable.Map.empty[(String, String), Long]
    top.foreach { case (l, r, n) => cur((l, r)) = n }
    base.foreach { case (p, n) => cur.getOrElseUpdate(p, n) }
    proposal.foreach(p => cur.getOrElseUpdate(p, 0L))
    // delta'd pairs with unknown snapshot count: cumulative delta only.
    // Only possible under a truncated horizon — with the complete table
    // fetched, an absent pair has snapshot count exactly 0 and stays in
    // `cur` as exact knowledge.
    val unk = scala.collection.mutable.Map.empty[(String, String), Long]
    val ns = scala.collection.mutable.ArrayBuffer.empty[Long]
    var accepted = 0
    var horizonLimited = false
    var k = 1
    var stop = false
    while (k <= proposal.length && !stop) {
      val pk = proposal(k - 1)
      val nk = cur(pk)
      def beats(q: (String, String), nq: Long): Boolean =
        q == pk || nq < nk || (nq == nk && pairLess(pk, q))
      val okExact = nk > 0 && cur.forall { case (q, nq) => beats(q, nq) }
      val okBounds =
        unk.forall { case (q, dq) => beats(q, nM + dq) } &&
        // pairs below the horizon never delta'd: count ≤ nM, identity
        // unknown (a tie there is uncertifiable)
        (!horizonFull || nk > nM)
      if (!(okExact && okBounds)) {
        stop = true
        // exact knowledge says the proposal was right but an unknown
        // MIGHT tie/beat it — a deeper horizon would decide
        horizonLimited = okExact
      } else {
        accepted = k
        ns += nk
        deltasByRound.getOrElse(k, Nil).foreach { case (l, r, d) =>
          val q = (l, r)
          if (cur.contains(q)) cur(q) += d
          else if (!horizonFull) cur(q) = d
          else unk(q) = unk.getOrElse(q, 0L) + d
        }
        k += 1
      }
    }
    (accepted, ns.toSeq, horizonLimited)
  }

  /** Reference implementation: full pair recount every round (the
    * pre-incremental loop). Kept for the equivalence spec — incremental
    * training must reproduce this merge sequence exactly. */
  private[graft] def trainRecount(df: DataFrame, numMerges: Int,
      textCol: String = "text"): Merges = {
    var vocab = initialVocab(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = pairsOf(vocab, "syms")
        .groupBy("l", "r").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r))
        vocab = vocab
          .withColumn("syms", BpeOps.mergePair(col("syms"), array(lit(l), lit(r))))
          .localCheckpoint(true)
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

  /** Persist a learned merge table as a lake table `(rank, left, right)` —
    * the tokenizer-ARTIFACT lifecycle (the [[VectorIndex]] idea for
    * tokenizers): train once, version the merges like any table (ACID,
    * OCC, history, time travel), reload from any session or engine. A
    * re-save after retraining overwrites in place, becoming the next
    * version — consumers pinned to `versionAsOf` keep the old tokenizer,
    * which is exactly what a reproducible training run needs. */
  def save(spark: org.apache.spark.sql.SparkSession, path: String,
      merges: Merges): graft.lake.LakeTable = {
    require(merges.pairs.nonEmpty, "nothing to save: empty merge table")
    val rows = merges.pairs.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
    val df = spark.createDataFrame(rows).toDF("rank", "left", "right")
    if (graft.lake.CommitLog.latestVersion(path,
        spark.sessionState.newHadoopConf()).isDefined) {
      val t = graft.lake.LakeTable.load(spark, path)
      t.overwrite(df)
      t
    } else graft.lake.LakeTable.create(spark, path,
      graft.lake.TableSpec("rank", "rank"), df)
  }

  /** Reload a persisted merge table (optionally a past version). The
    * merge list is rank-ordered and bounded (32k–100k rows for real
    * tokenizers) — a driver-side artifact by nature, like the PQ
    * codebooks. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String,
      versionAsOf: Option[Long] = None): Merges = {
    val rows = graft.lake.LakeTable.load(spark, path).read(versionAsOf)
      .select("rank", "left", "right").orderBy("rank").collect()
    require(rows.nonEmpty, s"no merges stored at $path")
    Merges(rows.map(r => (r.getString(1), r.getString(2))).toSeq)
  }
}
