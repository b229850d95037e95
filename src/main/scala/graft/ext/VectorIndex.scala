package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.toDoubleVec
import graft.lake.{LakeTable, TableSpec}

/** PERSISTED product-quantization ANN index — the "index once, append
  * incrementally, search many" serving shape a 100 TB embedding corpus
  * needs (FAISS's IVF-PQ lifecycle, re-expressed on the lake layer):
  *
  *   - `build` trains the codebooks once (deterministic md5 sample, or
  *     Lloyd-refined) and materializes TWO lake tables under the index
  *     path: `codebooks` (m·ks codeword rows + a meta row) and `codes`
  *     (one row per vector: its m packed code bytes and, for exact
  *     rerank, the original embedding). Both inherit lake semantics:
  *     ACID commits, time travel, OCC.
  *   - `add` encodes NEW vectors with the FROZEN codebooks (a pure
  *     codegen'd argmin over literal centroids — zero shuffle, no
  *     retraining, cost ∝ batch) and keyed-upserts them into `codes`;
  *     re-adding a vec_id replaces its row, so the index never holds two
  *     codes for one vector.
  *   - `search` is [[Similarity.pqSearch]] over the codes table: ADC
  *     lookup scoring reads m bytes per candidate; optional exact rerank
  *     rescores only the shortlist from the stored embeddings.
  *
  * Everything is deterministic: reloading from disk reproduces bit-equal
  * codebooks (doubles survive parquet exactly), and search results equal
  * an in-memory [[Similarity.pqSearch]] over the same state. */
object VectorIndex {

  private val META_KEY = -1L

  /** Train codebooks on `corpus` and persist codebooks + codes under
    * `path`. Parameters mirror [[Similarity.pqIndex]]. */
  def build(spark: SparkSession, path: String, corpus: DataFrame,
      m: Int = 8, ks: Int = 16, seed: Long = 42L, trainIters: Int = 0,
      vecCol: String = "embedding", idCol: String = "vec_id"): VectorIndex = {
    val idx = Similarity.pqIndex(corpus, m, ks, seed, vecCol, idCol, trainIters)
    import spark.implicits._
    val meta = (META_KEY, 1L, Seq(m.toDouble, ks.toDouble, idx.sub.toDouble))
    val rows = meta +: (for (j <- 0 until m; cI <- 0 until ks) yield
      ((j * ks + cI).toLong, 1L, idx.codewords(j)(cI))).toSeq
    LakeTable.create(spark, s"$path/codebooks", TableSpec("cb_key", "ver"),
      rows.toDF("cb_key", "ver", "codeword"))
    val encoded = corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("ver", lit(1L))
    val withCodes = attachCodes(encoded, idx.codewords, idx.cnormLut, idx.sub, ks)
    LakeTable.create(spark, s"$path/codes", TableSpec("vec_id", "ver"), withCodes)
    load(spark, path)
  }

  /** Reopen a persisted index: one bounded read of the codebooks table
    * (m·ks+1 rows — driver metadata, like IVF centroids). */
  def load(spark: SparkSession, path: String): VectorIndex = {
    val cb = LakeTable.load(spark, s"$path/codebooks").read()
      .select("cb_key", "codeword").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val meta = cb(META_KEY)
    val (m, ks) = (meta(0).toInt, meta(1).toInt)
    val sub = meta(2).toInt
    val codewords = Array.tabulate(m)(j =>
      Array.tabulate(ks)(cI => cb((j * ks + cI).toLong)))
    new VectorIndex(spark, path, m, ks, sub, codewords,
      Similarity.pqNormLut(codewords, m, ks))
  }

  private[ext] def attachCodes(batch: DataFrame,
      codewords: Array[Array[Seq[Double]]], cnormLut: Seq[Double],
      sub: Int, ks: Int): DataFrame = {
    import graft.functions.Int8Ops
    val m = codewords.length
    val codeFor = Similarity.pqCode(codewords, cnormLut, sub, ks) _
    batch.withColumn("cv", toDoubleVec(col("embedding")))
      .withColumn("codes",
        Int8Ops.pack(array((0 until m).map(j => codeFor(col("cv"), j)): _*)))
      .drop("cv")
  }
}

class VectorIndex private[ext] (spark: SparkSession, val path: String,
    val m: Int, val ks: Int, val sub: Int,
    val codewords: Array[Array[Seq[Double]]], val cnormLut: Seq[Double]) {

  private def codesTable: LakeTable = LakeTable.load(spark, s"$path/codes")

  /** Encode `batch` with the frozen codebooks and keyed-upsert into the
    * codes table — incremental, no retraining, cost ∝ batch size. `ver`
    * orders replacements of a re-added vec_id (defaults to a bump over
    * the current max so the new code wins). */
  def add(batch: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id"): VectorIndex = {
    val t = codesTable
    val nextVer = t.read().agg(coalesce(max(col("ver")), lit(0L))).head().getLong(0) + 1L
    val encoded = batch
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("ver", lit(nextVer))
    t.upsert(VectorIndex.attachCodes(encoded, codewords, cnormLut, sub, ks))
    this
  }

  /** ADC top-k over the persisted codes (see [[Similarity.pqSearch]]);
    * `rerank > 0` exact-rescores the shortlist from the stored
    * embeddings. */
  def search(queries: DataFrame, k: Int, rerank: Int = 0,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val state = codesTable.read().select("vec_id", "embedding", "codes")
    val encoded = state.select(col("vec_id").as("neighbor_id"), col("codes"))
    val corpus = state.select(col("vec_id"), col("embedding"))
    Similarity.pqSearch(
      Similarity.PqIndex(m, ks, sub, codewords, cnormLut, encoded),
      corpus, queries.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("embedding")), k, rerank)
  }
}
