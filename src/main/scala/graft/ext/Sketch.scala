package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size frequency sketches for corpus-scale token statistics.
  *
  * The scale problem: exact token frequencies over a 100 TB corpus are a
  * groupBy whose shuffle cardinality is the VOCABULARY (easily billions of
  * distinct n-grams). A Count-Min sketch replaces that with a
  * depth × width cell matrix — a few thousand rows regardless of corpus or
  * vocabulary size — at the cost of one-sided error: estimates are always
  * ≥ the true count, overshooting by at most ~N/width with probability
  * ≥ 1 − (1/2)^depth (Cormode & Muthukrishnan, J. Algorithms 55(1), 2005).
  * Frequency thresholds for curation (drop boilerplate tokens, find
  * heavy-hitter n-grams to audit) tolerate exactly that kind of error.
  *
  * Everything here hashes with [[Dedup.portableSeededHash]] (md5-derived),
  * so any engine with md5 replays the cells and estimates bit-for-bit —
  * the q154 oracle recomputes the whole sketch in DuckDB.
  */
object Sketch {

  /** A built Count-Min sketch: the cells plus the (depth, width) geometry
    * they were hashed with. Estimation MUST probe with the same geometry —
    * a mismatched width would silently underestimate (probes land in
    * buckets the build never filled) — so the handle carries it and
    * [[cmsEstimates]] takes the handle, never free depth/width numbers. */
  case class Cms(cells: DataFrame, depth: Int, width: Int)

  private def bucketOf(seed: Int, tok: Column, width: Int): Column =
    pmod(Dedup.portableSeededHash(lit(seed), tok), lit(width.toLong))

  /** Whitespace tokens of a corpus — [[TextAnalysis.tokens]], the single
    * tokenization every text op shares (heavyHitters' exact-vs-estimate
    * bound depends on the two sides tokenizing identically). */
  private def tokens(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))

  /** Build the sketch: one pass over the corpus, one shuffle whose
    * cardinality is ≤ depth·width cells (map-side combined — each of the
    * corpus partitions emits at most depth·width partial cells, never a
    * row per token). Returns the cells as a tiny DataFrame
    * (seed, bucket, cnt) wrapped with their geometry; absent cells are
    * zero. */
  def cmsBuild(df: DataFrame, depth: Int = 4, width: Int = 1024,
      textCol: String = "text"): Cms = {
    // width >= 1: a single-bucket sketch is degenerate (every estimate =
    // the total count) but well-defined — the CMS upper-bound property
    // holds, so it degrades gracefully rather than breaking callers
    require(depth >= 1 && width >= 1, s"cmsBuild: bad depth=$depth width=$width")
    Cms(tokens(df, textCol)
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("seed"), bucketOf(d, col("tok"), width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.seed").as("seed"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt")), depth, width)
  }

  /** Point estimates for candidate tokens: est(tok) = min over the sketch
    * rows of the token's bucket cell. The cells side is ≤ depth·width rows
    * and is broadcast — per candidate this is a map-side lookup plus one
    * candidate-sized min-aggregation; nothing scales with the corpus.
    * Estimates are upper bounds: est ≥ true count, always. */
  def cmsEstimates(cms: Cms, candidates: DataFrame,
      tokCol: String = "tok"): DataFrame = {
    val probes = candidates.select(col(tokCol).as("tok")).distinct()
      .select(col("tok"), explode(array((0 until cms.depth).map(d =>
        struct(lit(d).as("seed"), bucketOf(d, col("tok"), cms.width).as("bucket"))): _*)).as("p"))
      .select(col("tok"), col("p.seed").as("seed"), col("p.bucket").as("bucket"))
    probes.join(broadcast(cms.cells), Seq("seed", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters among `candidates`: sketch the corpus, estimate each
    * candidate, keep those with est ≥ minCount. The candidate set bounds
    * the output (CMS answers point queries — at scale candidates come
    * from a sample, a prior vocabulary, or a stream of new tokens; the
    * sketch itself never enumerates the corpus vocabulary). */
  def cmsHeavyHitters(corpus: DataFrame, candidates: DataFrame, minCount: Long,
      depth: Int = 4, width: Int = 1024, textCol: String = "text"): DataFrame = {
    val cms = cmsBuild(corpus, depth, width, textCol)
    cmsEstimates(cms, tokens(candidates, textCol))
      .filter(col("est") >= minCount)
  }
}
