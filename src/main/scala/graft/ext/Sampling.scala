package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting and sampling for training pipelines.
  *
  * The split must be DETERMINISTIC and KEY-STABLE: a document keeps its
  * split across reruns and across machines (no Bernoulli sampling, whose
  * assignment depends on partitioning), so train/test contamination can't
  * creep in when the corpus is re-partitioned or appended to. Assignment
  * hashes the KEY, not the row: pure map-side expression, no shuffle, no
  * state — at 100 TB the split is free.
  */
object Sampling {

  /** Named split fractions in 16ths (hex-prefix buckets): e.g.
    * `Seq(("train", 12), ("val", 2), ("test", 2))` = 75/12.5/12.5. The
    * md5-hex first character of the key is uniform over [0-9a-f]; each
    * split takes a contiguous range. md5 (not xxhash) keeps assignment
    * engine-portable — any system with md5 reproduces the same split. */
  def splitColumn(key: Column, fractions16: Seq[(String, Int)]): Column = {
    require(fractions16.map(_._2).sum == 16, "fractions must sum to 16 sixteenths")
    val hexDigits = "0123456789abcdef"
    val c = substring(md5(key.cast("string")), 1, 1)
    var offset = 0
    val assigned = fractions16.map { case (name, n) =>
      val range = hexDigits.substring(offset, offset + n)
      offset += n
      (name, range)
    }
    assigned.tail.foldLeft(when(
        c.isin(assigned.head._2.map(_.toString): _*), lit(assigned.head._1))) {
      case (acc, (name, range)) =>
        acc.when(c.isin(range.map(_.toString): _*), lit(name))
    }
  }

  /** Attach a `split` column; default 75/12.5/12.5 train/val/test. */
  def deterministicSplit(df: DataFrame, keyCol: String = "doc_id",
      fractions16: Seq[(String, Int)] = Seq(("train", 12), ("val", 2), ("test", 2))): DataFrame =
    df.withColumn("split", splitColumn(col(keyCol), fractions16))

  /** Select documents up to a TOKEN BUDGET, deterministically — the
    * dataset-mixing primitive ("give me ~1B tokens of this source"). Docs
    * are consumed in md5-of-key order (uniform, engine-portable, stable
    * under repartitioning), so the selection is a fixed prefix of a fixed
    * permutation: reruns and incremental re-mixes agree on every doc.
    *
    * Scale shape: a global running sum would be a single-partition window.
    * Instead the md5 order is split into 256 hash buckets (first hex
    * pair): one partial-agg pass sums tokens per bucket (256 rows to the
    * driver), a prefix sum picks the boundary bucket, whole buckets before
    * it are taken with a map-side filter, and only the boundary bucket —
    * 1/256th of the corpus — runs the exact running-sum window. The
    * boundary doc that crosses the budget is included iff it starts under
    * it (so the budget is always reached when the corpus allows). */
  /** Deterministic global shuffle for reproducible training order: every
    * row gets `shuffle_pos`, its 0-based position in the md5(seed ":" key)
    * permutation — a fixed, engine-replayable pseudo-random order, so any
    * shard of the training stream can be re-materialized identically
    * (change `seed` for a fresh epoch permutation).
    *
    * Scale shape: the global rank is computed two-phase like
    * [[tokenBudget]] — one partial-agg pass counts rows per 256 hash
    * buckets (256 rows to the driver), exclusive bucket offsets broadcast
    * back as a literal map, and each bucket ranks only itself — no
    * single-partition global window ever exists. */
  def deterministicShuffle(df: DataFrame, seed: Long = 42L,
      keyCol: String = "doc_id"): DataFrame = {
    val tagged = df
      .withColumn("_h", md5(concat_ws(":", lit(seed), col(keyCol).cast("string"))))
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val perBucket = tagged.groupBy("_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 until 256).scanLeft(0L)((acc, b) => acc + perBucket.getOrElse(b, 0L))
    val offsetOf = typedLit((0 until 256).map(b => b -> offsets(b)).toMap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_b").orderBy(col("_h").asc, col(keyCol).asc)
    tagged
      .withColumn("shuffle_pos",
        row_number().over(w).cast("long") - 1L + element_at(offsetOf, col("_b")))
      .drop("_h", "_b")
  }

  def tokenBudget(df: DataFrame, budget: Long, textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    val toks = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val h = md5(col(keyCol).cast("string"))
    val tagged = df.withColumn("_tok", toks)
      .withColumn("_h", h)
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val perBucket = tagged.groupBy("_b").agg(sum(col("_tok")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    var acc = 0L
    var boundary = 256 // first bucket that does NOT fit entirely
    var before = 0L
    var i = 0
    while (i < 256 && boundary == 256) {
      val t = perBucket.getOrElse(i, 0L)
      if (acc + t > budget) { boundary = i; before = acc } else acc += t
      i += 1
    }
    if (boundary == 256) return df // whole corpus fits
    val whole = tagged.filter(col("_b") < boundary)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_b").orderBy(col("_h").asc, col(keyCol).asc)
    val partial = tagged.filter(col("_b") === boundary)
      .withColumn("_run", sum(col("_tok")).over(w) - col("_tok"))
      .filter(col("_run") + lit(before) < budget) // doc STARTS under budget
      .drop("_run")
    whole.unionByName(partial).drop("_tok", "_h", "_b")
  }

  /** GPT-style sequence packing: documents are concatenated in md5-of-key
    * order and the token stream is chunked into fixed `seqLen` windows.
    * Each doc gets `seq_id` (the training sequence its first token lands
    * in) and `seq_offset` (its position inside that sequence) — the
    * assignment a trainer needs to build fixed-length batches with zero
    * padding waste. Deterministic and key-stable like [[tokenBudget]]:
    * the order is a fixed permutation, so shards can be re-materialized
    * reproducibly on any engine.
    *
    * Scale shape: the global running sum is computed two-phase — one
    * partial-agg pass sums tokens per 256 hash buckets (256 rows to the
    * driver), exclusive bucket offsets are broadcast back as a literal
    * map, and each bucket runs its own window — so no single-partition
    * global window ever exists. */
  def packSequences(df: DataFrame, seqLen: Long, textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val toks = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val tagged = df.withColumn("_tok", toks)
      .withColumn("_h", md5(col(keyCol).cast("string")))
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val perBucket = tagged.groupBy("_b").agg(sum(col("_tok")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 until 256).scanLeft(0L)((acc, b) => acc + perBucket.getOrElse(b, 0L))
    val offsetOf = typedLit((0 until 256).map(b => b -> offsets(b)).toMap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_b").orderBy(col("_h").asc, col(keyCol).asc)
    tagged
      .withColumn("_run",
        sum(col("_tok")).over(w) - col("_tok") + element_at(offsetOf, col("_b")))
      .withColumn("seq_id", expr(s"_run div ${seqLen}L"))
      .withColumn("seq_offset", col("_run") % seqLen)
      .drop("_tok", "_h", "_b", "_run")
  }

  /** Domain-mixture sampling (the DoReMi-style remix primitive): draw a
    * corpus whose token mass follows `weights` per domain — "50% web, 25%
    * code, 25% books at 1B tokens total". Each domain contributes a
    * deterministic md5-order token-budget prefix of itself
    * ([[tokenBudget]]'s rule: a doc is taken iff its running sum STARTS
    * under the domain's budget), so remixes are reproducible doc-for-doc
    * and a weight change only grows/shrinks each domain's prefix instead
    * of reshuffling it. Domains outside `weights` are excluded; a domain
    * smaller than its budget contributes all of itself (the usual
    * up-weighting caveat applies — log it, don't silently repeat).
    *
    * Scale shape: ONE partial-agg pass over (domain × 256 md5 buckets)
    * drives all per-domain prefix sums (≤ 256·|domains| rows to the
    * driver); whole buckets pass with a map-side filter and only each
    * domain's boundary bucket — 1/256th of that domain — runs an exact
    * window. No global or single-domain-partition window ever exists, so
    * domain skew (one domain being 90% of the corpus) cannot bottleneck. */
  def mixture(df: DataFrame, weights: Map[String, Double], totalTokens: Long,
      domainCol: String = "source", textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture needs positive domain weights")
    val wsum = weights.values.sum
    val budgets: Map[String, Long] =
      weights.map { case (d, w) => d -> (totalTokens * w / wsum).toLong }
    budgeted(df, budgets, domainCol, textCol, keyCol)
  }

  /** Temperature-scaled domain mixture (the mT5/XLM-R "α-sampling" rule):
    * domain token budgets ∝ `T_d^α` for corpus token totals `T_d`, so
    * α ∈ (0,1) flattens the domain distribution — low-resource domains are
    * upsampled relative to their share, α→0 approaches uniform, α=1 is
    * proportional. Budgets then cut each domain deterministically in
    * md5-of-key order via the two-phase [[budgeted]] plan.
    *
    * Engine-portable by construction at the default α=0.5: the α-power is
    * quantized driver-side to fixed point, `floor(sqrt(T_d)·10^6)`, and
    * IEEE 754 requires sqrt (unlike pow) to be EXACTLY rounded — so any
    * engine replays the weights bit-for-bit, and the budget division is
    * exact integer arithmetic (BigInt here, HUGEINT in the oracle). Other
    * α values go through `Math.pow` (deterministic on the JVM, but only
    * faithfully — not correctly — rounded in general, so cross-engine
    * replay is not guaranteed off the default).
    *
    * Scale shape: ONE |domains|-row aggregate for the totals (driver-side
    * weights), then [[budgeted]]'s single-pass bucket plan — no global
    * windows, nothing ∝ corpus size on the driver. */
  def temperatureMixture(df: DataFrame, totalTokens: Long,
      alpha: Double = 0.5, domainCol: String = "source",
      textCol: String = "text", keyCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(totalTokens > 0, "totalTokens must be positive")
    val toks = size(split(trim(col(textCol)), "\\s+")).cast("long")
    // guard the driver-side map build: a NULL domain key or an all-null
    // token sum would NPE out of getString/getLong with no context
    val totals = df.groupBy(domainCol)
      .agg(coalesce(sum(toks), lit(0L)).as("t"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"temperatureMixture: column '$domainCol' contains NULL domain keys")
        r.getString(0) -> r.getLong(1)
      }.toMap
    require(totals.nonEmpty, "temperatureMixture needs at least one domain")
    val qw: Map[String, Long] = totals.map { case (d, t) =>
      val p = if (alpha == 0.5) math.sqrt(t.toDouble)
              else math.pow(t.toDouble, alpha)
      d -> math.floor(p * 1e6).toLong
    }
    val wsum = qw.values.map(BigInt(_)).sum
    val budgets = qw.map { case (d, w) =>
      d -> (BigInt(totalTokens) * w / wsum).toLong }
    budgeted(df, budgets, domainCol, textCol, keyCol)
  }

  /** UniMax domain sampling (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling"): split the token budget UNIFORMLY
    * across domains, but cap every domain at `maxEpochs` passes over its
    * own corpus — the leftover from capped (small) domains redistributes
    * uniformly among the rest. Kills both failure modes of proportional
    * sampling (big domains swallow the budget) and naive uniform
    * (tiny domains repeat for dozens of epochs).
    *
    * The waterfill is EXACT integer arithmetic on the |domains|-row totals
    * (driver-side): with caps sorted ascending (domain-name tiebreak),
    * domain i is capped iff `cap_i · (n−i+1) ≤ B − prefix_{i−1}` — the
    * multiplication form avoids division-rounding ambiguity — and the
    * uncapped remainder R spreads as `R div m` each with the `R mod m`
    * extra tokens going to the LAST `R mod m` uncapped domains. Every
    * step replays bit-for-bit in SQL window functions, so the oracle
    * recomputes the budgets, not just the cut.
    *
    * Scale shape: one |domains|-row aggregate, then the [[budgeted]]
    * two-phase bucket plan. */
  def unimax(df: DataFrame, totalTokens: Long, maxEpochs: Int = 4,
      domainCol: String = "source", textCol: String = "text",
      keyCol: String = "doc_id"): DataFrame = {
    require(totalTokens > 0 && maxEpochs > 0, "positive budget and epochs")
    val toks = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val totals = df.groupBy(domainCol)
      .agg(coalesce(sum(toks), lit(0L)).as("t"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"unimax: column '$domainCol' contains NULL domain keys")
        r.getString(0) -> r.getLong(1)
      }
    require(totals.nonEmpty, "unimax needs at least one domain")
    val sorted = totals.map { case (d, t) => (d, t * maxEpochs) }
      .sortBy { case (d, cap) => (cap, d) }
    val n = sorted.length
    var prefix = 0L
    var j = 0 // number of capped domains (a prefix of the sorted order)
    while (j < n &&
        BigInt(sorted(j)._2) * (n - j) <= BigInt(totalTokens) - prefix) {
      prefix += sorted(j)._2; j += 1
    }
    val m = n - j
    val r = totalTokens - prefix
    val budgets: Map[String, Long] = sorted.zipWithIndex.map { case ((d, cap), i) =>
      if (i < j) d -> cap
      else {
        val q = i - j + 1 // 1-based position among the uncapped
        d -> (r / m + (if (q > m - (r % m)) 1L else 0L))
      }
    }.toMap
    budgeted(df, budgets, domainCol, textCol, keyCol)
  }

  /** Cut each domain to its token budget deterministically in md5-of-key
    * order — the shared engine under [[mixture]] and [[temperatureMixture]].
    * Two-phase plan: one (domain × 256 md5-bucket) partial aggregate gives
    * the driver every bucket's token mass (≤ 256·|domains| rows); whole
    * buckets below the boundary pass MAP-SIDE, and only each domain's
    * single boundary bucket (1/256th of the domain) runs an exact
    * running-sum window — a domain with a billion documents never sees a
    * domain-wide window. */
  private def budgeted(df: DataFrame, budgets: Map[String, Long],
      domainCol: String, textCol: String, keyCol: String): DataFrame = {
    val toks = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val tagged = df.filter(col(domainCol).isin(budgets.keys.toSeq: _*))
      .withColumn("_tok", toks)
      .withColumn("_h", md5(col(keyCol).cast("string")))
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val per = tagged.groupBy(domainCol, "_b").agg(sum(col("_tok")).as("t"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    // per-domain boundary bucket + mass before it (driver prefix sums)
    val bounds: Map[String, (Int, Long)] = budgets.map { case (d, budget) =>
      var acc = 0L; var boundary = 256; var before = 0L; var i = 0
      while (i < 256 && boundary == 256) {
        val t = per.getOrElse((d, i), 0L)
        if (acc + t > budget) { boundary = i; before = acc } else acc += t
        i += 1
      }
      d -> (boundary, before)
    }
    val boundaryOf = typedLit(bounds.map { case (d, (b, _)) => d -> b })
    val beforeOf = typedLit(bounds.map { case (d, (_, p)) => d -> p })
    val budgetOf = typedLit(budgets)
    val whole = tagged.filter(col("_b") < element_at(boundaryOf, col(domainCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domainCol, "_b").orderBy(col("_h").asc, col(keyCol).asc)
    val partial = tagged
      .filter(col("_b") === element_at(boundaryOf, col(domainCol)))
      .withColumn("_run", sum(col("_tok")).over(w) - col("_tok"))
      .filter(col("_run") + element_at(beforeOf, col(domainCol)) <
        element_at(budgetOf, col(domainCol)))
      .drop("_run")
    whole.unionByName(partial).drop("_tok", "_h", "_b")
  }

  /** Per-domain document cap (the crawl-pipeline "at most N pages per
    * host/domain" rule — C4 and RefinedWeb both apply one to stop a
    * single boilerplate-heavy site from dominating the corpus): keep at
    * most `cap` documents per domain, chosen DETERMINISTICALLY in
    * md5-of-key order, so reruns and incremental re-crawls keep the same
    * representatives.
    *
    * Scale shape (the [[mixture]] two-phase plan, count-mass instead of
    * token-mass): ONE partial-agg pass over (domain × 256 md5 buckets)
    * gives the driver every per-bucket count (≤ 256·|domains| rows);
    * whole buckets under the boundary pass MAP-SIDE with no shuffle, and
    * only each domain's single boundary bucket — 1/256th of that domain —
    * runs an exact rank window partitioned by (domain, bucket). A domain
    * with a billion documents never sees a domain-wide window, so domain
    * skew cannot bottleneck: the cap costs one aggregation regardless of
    * how lopsided the crawl is. */
  def perDomainCap(df: DataFrame, cap: Long,
      domainCol: String = "source", keyCol: String = "doc_id"): DataFrame = {
    require(cap > 0, "cap must be positive")
    val tagged = df
      .withColumn("_h", md5(col(keyCol).cast("string")))
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val per = tagged.groupBy(domainCol, "_b").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val domains = per.keys.map(_._1).toSeq.distinct
    // per-domain boundary bucket + docs before it (driver prefix sums)
    val bounds: Map[String, (Int, Long)] = domains.map { d =>
      var acc = 0L; var boundary = 256; var before = 0L; var i = 0
      while (i < 256 && boundary == 256) {
        val n = per.getOrElse((d, i), 0L)
        if (acc + n > cap) { boundary = i; before = acc } else acc += n
        i += 1
      }
      d -> (boundary, before)
    }.toMap
    val boundaryOf = typedLit(bounds.map { case (d, (b, _)) => d -> b })
    val beforeOf = typedLit(bounds.map { case (d, (_, p)) => d -> p })
    val whole = tagged.filter(col("_b") < element_at(boundaryOf, col(domainCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domainCol, "_b").orderBy(col("_h").asc, col(keyCol).asc)
    val partial = tagged
      .filter(col("_b") === element_at(boundaryOf, col(domainCol)))
      .withColumn("_rk", row_number().over(w).cast("long"))
      .filter(element_at(beforeOf, col(domainCol)) + col("_rk") <= cap)
      .drop("_rk")
    whole.unionByName(partial).drop("_h", "_b")
  }

  /** DSIR-style hashed n-gram importance scoring (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score each
    * candidate document by how much more likely its tokens are under a
    * small in-domain TARGET sample than under the general SOURCE pool,
    * with both distributions estimated over `buckets` hashed unigram
    * buckets (vocabulary-free, fixed memory).
    *
    * Deviation from the paper, for engine-reproducibility: instead of
    * summing log-likelihood ratios (transcendental — JVM vs libm differ in
    * the last ulp, so scores would not replay), the per-token likelihood
    * ratio is computed as an EXACT fixed-point integer —
    * `((ct+1) · (totS+B) · scale) div ((cs+1) · (totT+B))`, Laplace
    * smoothed — then CENTERED at the SOURCE-WEIGHTED MEAN ratio
    * (`Σ cs·r div Σ cs`), so the average pool token scores exactly zero by
    * construction. Centering at the data-driven mean rather than at the
    * ratio-1 point matters twice: a small target sample tilts every
    * smoothed ratio above 1 (its Laplace mass is proportionally huge), and
    * linear-space ratios are rare-token-skewed where log-space would
    * compress them — both cancel in the mean. Target-leaning tokens push
    * up, typical tokens cancel, and a long out-of-domain document cannot
    * win on bulk. All-integer, bit-identical on any engine (the q97
    * Stupid-Backoff trick).
    *
    * Scale shape: one explode + one hash-agg builds the ≤ `buckets`-row
    * ratio table (the totals fold in via a broadcast 1-row join, never a
    * driver collect); scoring joins tokens to that BROADCAST table and
    * hash-aggregates per document — two shuffles total, both ∝ corpus
    * tokens, nothing ∝ vocabulary. */
  def importanceScores(df: DataFrame, isTarget: Column, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 1024,
      scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scale > 0, "buckets and scale must be positive")
    val toks = df.select(col(idCol).as("_id"),
        coalesce(isTarget.cast("boolean"), lit(false)).as("_tgt"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("_tok"))
      .filter(length(col("_tok")) > 0)
      // portable md5 bucket (engine-replayable, like the LSH family)
      .withColumn("_b", pmod(
        conv(substring(md5(col("_tok")), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong)))
    val counts = toks.groupBy("_b").agg(
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
      sum(when(!col("_tgt"), 1L).otherwise(0L)).as("_cs"))
    val totals = counts.agg(
      (sum("_ct") + buckets).as("_totT"), (sum("_cs") + buckets).as("_totS"))
    val raw = counts.withColumn("_j", lit(1))
      .join(broadcast(totals.withColumn("_j", lit(1))), "_j")
      .withColumn("_rr", expr(s"((_ct + 1) * _totS * $scale) div ((_cs + 1) * _totT)"))
    val baseline = raw.agg(
      expr("sum(_cs * _rr) div greatest(sum(_cs), 1)").as("_r0"))
    val ratio = raw.join(broadcast(baseline.withColumn("_j", lit(1))), "_j")
      .withColumn("_r", col("_rr") - col("_r0"))
      .select("_b", "_r")
    toks.filter(!col("_tgt"))
      .join(broadcast(ratio), Seq("_b"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("_r")).as("dsir_score"))
      // when the target sample is small, Laplace mass tilts EVERY token
      // slightly positive and the raw sum re-acquires a length bias — the
      // per-token mean (exact integer div) is the length-free ranking key
      .withColumn("per_tok_score", expr("dsir_score div n_toks"))
      .withColumnRenamed("_id", idCol)
  }

  /** Deterministic importance resampling: the `k` candidates with the
    * highest per-token importance ([[importanceScores]]), ties broken by
    * id — a distributed top-k (TakeOrdered), never a global sort. */
  def importanceResample(df: DataFrame, isTarget: Column, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 1024): DataFrame =
    importanceScores(df, isTarget, idCol, textCol, buckets)
      .orderBy(col("per_tok_score").desc, col(idCol)).limit(k)

  /** Stratified proportional sample: per-stratum Bernoulli with a fixed
    * seed (stock `sampleBy`) — for class-balanced subsets where exact
    * key-stability is not required. */
  def stratified(df: DataFrame, stratumCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    val strata = df.select(stratumCol).distinct().collect().map(_.get(0))
    df.stat.sampleBy(stratumCol, strata.map(s => s -> fraction).toMap, seed)
  }

  /** LENGTH-GROUPED BATCHING (the dynamic-batching / bucketed-padding
    * trick every training loader wants): deterministically shard the
    * corpus (md5 buckets — the parallel unit), order each shard by token
    * count (md5 tiebreak), and cut consecutive runs of `batchSize` docs
    * into batches. Documents inside a batch then have near-equal lengths,
    * so per-batch padding waste collapses versus random batching.
    *
    * Scale shape: one hash shuffle on the shard id, then a per-SHARD
    * window — never a global sort; shards are the parallelism knob and
    * each is a bounded slice of the corpus. Fully deterministic in
    * (doc_id, shards, batchSize). Returns (idCol, n_tok, shard,
    * batch_id). */
  def lengthGroupedBatches(df: DataFrame, shards: Int = 64, batchSize: Int = 32,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(shards > 0 && batchSize > 0, "shards and batchSize must be positive")
    val tagged = df.select(col(idCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tok"),
        md5(col(idCol).cast("string")).as("_h"))
      .withColumn("shard",
        (conv(substring(col("_h"), 1, 4), 16, 10).cast("int") % shards))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("n_tok").asc, col("_h").asc, col(idCol).asc)
    tagged
      .withColumn("batch_id", ((row_number().over(w) - 1) / batchSize).cast("int"))
      .select(idCol, "n_tok", "shard", "batch_id")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES) — the data-mixing primitive "draw k docs ∝ weight,
    * no repeats" (e.g. ∝ quality score or token count), exactly the
    * sequential weighted draw's inclusion law. Each row derives a
    * PORTABLE 48-bit uniform u ∈ (0,1] from md5(id:seed), keys itself
    * with `−ln(u)/w` (⇔ largest `u^(1/w)` wins), and the k smallest keys
    * are the sample.
    *
    * Scale shape: pure per-row expressions + TakeOrdered — one map pass
    * and a per-partition top-k fold into the driver's k rows; no global
    * sort, no shuffle of the corpus. Deterministic in (id, seed) — reruns
    * and engine replays pick the identical sample; rows with w ≤ 0 or
    * null never qualify (they'd be unsamplable mass). */
  def weightedSample(df: DataFrame, k: Int, weightCol: Column,
      idCol: String = "doc_id", seed: String = "graft"): DataFrame = {
    require(k > 0, "sample size k must be positive")
    // (0,1]: 48-bit md5 prefix + 1 over 2^48 — never 0, so ln is safe
    val u = (conv(substring(md5(concat_ws(":", col(idCol).cast("string"),
      lit(seed))), 1, 12), 16, 10).cast("double") + lit(1.0)) /
      lit(281474976710656.0)
    val w = weightCol.cast("double")
    df.filter(w.isNotNull && w > 0)
      .withColumn("es_key", -log(u) / w)
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }
}
