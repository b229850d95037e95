package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the exactness baseline: broadcast the (small) query set
  * against the corpus — one pass, no corpus shuffle, O(Q·N) dot products in
  * codegen. The scale path is hyperplane LSH with multi-probe: bucket the
  * corpus once (reusable across queries), join queries to their bucket and
  * its Hamming-1 neighbors, refine exactly.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. Deterministic
    * tiebreak on neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("cv"))
      .withColumn("cn", normSq(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("qn", normSq(col("qv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** IVF (inverted-file) ANN: the corpus is coarse-quantized onto
    * `numLists` centroid lists (centroids drawn deterministically from the
    * corpus itself); a query exact-scores only the `nProbe` lists nearest
    * its own vector. The one-time assignment pass is the index build —
    * at scale it's written once and reused across query batches; recall
    * rises with nProbe (nProbe = numLists degenerates to brute force). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c0 = corpus.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("cv"))
      .withColumn("cn", normSq(col("cv")))
    // deterministic centroid sample: top-numLists by seeded hash
    val centroids = c0.select(col("neighbor_id").as("cid"), col("cv").as("centroid"))
      .orderBy(xxhash64(col("cid"), lit(seed)).asc, col("cid").asc)
      .limit(numLists)
    def nearestLists(df: DataFrame, vec: String, n: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("c_sim", dot(col(vec), col("centroid")) /
          (sqrt(normSq(col(vec))) * sqrt(normSq(col("centroid")))))
      scored.withColumn("c_rank", row_number().over(
          Window.partitionBy(df.columns.head).orderBy(col("c_sim").desc, col("cid").asc)))
        .filter(col("c_rank") <= n)
        .drop("centroid", "c_sim", "c_rank")
    }
    val assigned = nearestLists(c0, "cv", 1) // each corpus vector → 1 list
    val probes = nearestLists(
      queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("qv"))
        .withColumn("qn", normSq(col("qv"))), "qv", nProbe)
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Multi-table LSH ANN: `numTables` independent hyperplane signatures;
    * a query probes, per table, its own bucket plus every Hamming-1 bucket,
    * then exact-refines candidates and takes top-k. More tables → higher
    * recall at the cost of `numTables`× the bucketed index size — the
    * standard memory/recall trade; on random (near-orthogonal) data recall
    * needs several tables, on clustered real embeddings fewer. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8, numTables: Int = 12, seed: Long = 42L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val tables = (0 until numTables).map(t => randomPlanes(numPlanes, dim, seed + t))

    val c0 = corpus.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("cv"))
      .withColumn("cn", normSq(col("cv")))
    // corpus indexed once per table: (table, bucket) exploded
    val c = c0.withColumn("tb", explode(array(tables.zipWithIndex.map { case (p, t) =>
        struct(lit(t).as("t"), hyperplaneSignature(col("cv"), p).as("bucket"))
      }: _*)))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("tb.t"), col("tb.bucket"))

    val q0 = queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("qn", normSq(col("qv")))
    // per table: own bucket + Hamming-1 probes
    val q = q0.withColumn("tb", explode(array((for {
        (p, t) <- tables.zipWithIndex
        probe <- 0 to numPlanes
      } yield {
        val sig = hyperplaneSignature(col("qv"), p)
        val b = if (probe == 0) sig else sig.bitwiseXOR(lit(1L << (probe - 1)))
        struct(lit(t).as("t"), b.as("bucket"))
      }): _*)))
      .select(col("query_id"), col("qv"), col("qn"), col("tb.t"), col("tb.bucket"))

    val scored = c.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(first("qv").as("qv"), first("qn").as("qn"),
        first("cv").as("cv"), first("cn").as("cn"))
      .withColumn("score", cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }
}
