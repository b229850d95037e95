package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join — the inequality-join scale path.
  *
  * A range predicate `r.t − l.t ∈ [lower, upper)` with NO equi-key plans
  * as a broadcast-nested-loop / cartesian product in Spark: every left row
  * meets every right row, O(|L|·|R|) at any scale — the classic 100 TB
  * killer (the reference's notebooks only ever join with an equi key;
  * this covers the funnel/proximity analyses that don't have one). The
  * Databricks RANGE_JOIN hint and DuckDB's IEJoin solve the same problem
  * inside the engine; graft re-expresses it as an explicit operator on
  * stock Spark:
  *
  *   1. quantize time into width-`binWidth` bins (default: the band width,
  *      the provably-optimal-within-2× choice);
  *   2. each LEFT row duplicates into every bin its band can touch — at
  *      most `(upper−lower)/binWidth + 1` copies, a CONSTANT;
  *   3. each RIGHT row lands in exactly its own bin;
  *   4. hash-join on the bin id (+ any optional equi keys) and re-apply
  *      the EXACT band predicate to the candidates.
  *
  * Cost: one shuffle of each side on the bin id plus Σ per-bin candidate
  * products — data-proportional when event time is spread (the streaming/
  * event corpus shape), never |L|·|R|. The result is EXACTLY the naive
  * range join's (the final filter re-checks the predicate; bins only
  * bound which pairs are ever considered).
  */
object RangeJoin {

  /** Pairs where `right.rTime − left.lTime ∈ [lower, upper)`, both epoch
    * values in the same unit. Column sets must be disjoint (alias first,
    * like a self-join). `keys`: optional extra equi-join columns (same
    * name both sides — they tighten the bins into per-key hash buckets). */
  def bandJoin(left: DataFrame, lTime: String, right: DataFrame, rTime: String,
      lower: Long, upper: Long, keys: Seq[String] = Seq.empty,
      binWidth: Long = 0L): DataFrame = {
    require(upper > lower, s"empty band [$lower, $upper)")
    val w = if (binWidth > 0) binWidth else upper - lower
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key column collision: ${overlap.mkString(",")} — alias the sides first")
    // left row l covers right times in [l+lower, l+upper): bins
    // floor((l+lower)/w) .. floor((l+upper-1)/w) — ≤ (upper-1-lower)/w + 2
    // ids, a constant duplication factor
    val lBinned = left
      .withColumn("_rj_b0", floorDiv(col(lTime) + lit(lower), w))
      .withColumn("_rj_bn", floorDiv(col(lTime) + lit(upper - 1), w))
      .withColumn("_rj_bin", explode(sequence(col("_rj_b0"), col("_rj_bn"))))
      .drop("_rj_b0", "_rj_bn")
    val rBinned = right.withColumn("_rj_bin", floorDiv(col(rTime), w))
    lBinned.join(rBinned, keys :+ "_rj_bin")
      .filter(col(rTime) - col(lTime) >= lower && col(rTime) - col(lTime) < upper)
      .drop("_rj_bin")
  }

  /** Interval overlap join: pairs where [l.start, l.end] ∩ [r.start,
    * r.end] ≠ ∅ (inclusive bounds). Same binning idea — a left interval
    * duplicates into every bin it spans (cost ∝ interval length / width),
    * a right interval likewise, candidates meet in shared bins, and the
    * exact overlap predicate filters. `binWidth` should be near the
    * TYPICAL interval length: too small multiplies copies, too large
    * multiplies per-bin candidates. A pair spanning several shared bins
    * would duplicate — the canonical dedup keeps only the FIRST shared
    * bin (max of the two start-bins), making the output exactly one row
    * per qualifying pair with no distinct() shuffle. */
  def intervalJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binWidth: Long, keys: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key column collision: ${overlap.mkString(",")} — alias the sides first")
    def binned(df: DataFrame, s: String, e: String, tag: String): DataFrame = df
      .withColumn(s"_rj_s$tag", floorDiv(col(s), binWidth))
      .withColumn(s"_rj_bin",
        explode(sequence(col(s"_rj_s$tag"), floorDiv(col(e), binWidth))))
    val l = binned(left, lStart, lEnd, "l")
    val r = binned(right, rStart, rEnd, "r")
    l.join(r, keys :+ "_rj_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // first SHARED bin = max of the two start bins: count each pair once
      .filter(col("_rj_bin") === greatest(col("_rj_sl"), col("_rj_sr")))
      .drop("_rj_bin", "_rj_sl", "_rj_sr")
  }

  /** Integer floor division as a Column (Spark's `div` on longs). */
  private def floorDiv(c: Column, w: Long): Column = {
    val d = (c - pmod(c, lit(w))) / lit(w)
    d.cast("long")
  }
}
