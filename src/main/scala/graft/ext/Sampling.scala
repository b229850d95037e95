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

  /** Stratified proportional sample: per-stratum Bernoulli with a fixed
    * seed (stock `sampleBy`) — for class-balanced subsets where exact
    * key-stability is not required. */
  def stratified(df: DataFrame, stratumCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    val strata = df.select(stratumCol).distinct().collect().map(_.get(0))
    df.stat.sampleBy(stratumCol, strata.map(s => s -> fraction).toMap, seed)
  }
}
