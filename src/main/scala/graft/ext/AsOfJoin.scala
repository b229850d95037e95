package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single most recent right
  * row with `rightTime <= leftTime` on the same key — the standard
  * point-in-time lookup (trades→quotes, events→dimension snapshots).
  *
  * Scale shape: NOT a range join (key-equi join + time filter explodes to
  * |L×R per key| intermediate rows before the per-row max). Instead both
  * sides are union-tagged and a single running `last(_, ignoreNulls)` window
  * over (key, time) propagates the latest right payload onto each left row:
  * one shuffle on the key, linear scan per partition, output exactly |L|.
  * Skewed keys cost one sort each — same profile as any windowed dedup.
  */
object AsOfJoin {

  /** Inner as-of join. `right` must be unique per (key, time) — pre-aggregate
    * if it isn't (ties would otherwise resolve by input order, which is not
    * deterministic under shuffles). Right columns come back nested under a
    * `matched` struct; rows with no prior right match are dropped.
    *
    * @param tolerance max allowed `leftTime - rightTime` (same unit as the
    *                  time columns); None = unbounded look-back.
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      tolerance: Option[Long] = None): DataFrame = {
    val reserved = Set("_k", "_t", "_side", "_r", "_l", "matched")
    (left.columns ++ right.columns).filter(c => reserved.contains(c.toLowerCase))
      .foreach(c => throw new IllegalArgumentException(
        s"asof: column name '$c' collides with the join's internals — rename it first"))
    val leftCols = left.columns.toSeq
    val rightPayload = struct(right.columns.map(c => col(c).as(c)).toSeq: _*)
    // SQL join semantics: a NULL key or NULL time never matches — drop such
    // rows up front (a NULL right time would otherwise sort "before
    // everything" and propagate to every left row; the join is inner, so
    // unmatched-by-construction left rows are dropped either way)
    val r = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key).as("_k"), col(rightTime).cast("long").as("_t"),
        lit(0).as("_side"), rightPayload.as("_r"))
    val l = left.filter(col(key).isNotNull && col(leftTime).isNotNull)
      .withColumn("_l", struct(leftCols.map(c => col(c)): _*))
      .select(col(key).as("_k"), col(leftTime).cast("long").as("_t"),
        lit(1).as("_side"), lit(null).cast(r.schema("_r").dataType).as("_r"), col("_l"))
    // right rows sort before left rows at equal time (_side 0 < 1) ⇒ a right
    // row AT the left timestamp is visible: rightTime <= leftTime semantics.
    val w = Window.partitionBy("_k").orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = r.withColumn("_l", lit(null).cast(l.schema("_l").dataType))
      .unionByName(l)
      .withColumn("matched", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("matched").isNotNull)
    val bounded = tolerance match {
      case Some(tol) => joined.filter(
        col("_t") - col("matched").getField(rightTime).cast("long") <= tol)
      case None => joined
    }
    bounded.select(leftCols.map(c => col("_l").getField(c).as(c)) :+ col("matched"): _*)
  }
}
