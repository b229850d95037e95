package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Similarity, TextAnalysis, TextIndex, VectorIndex}
import graft.streaming.IndexStream

/** Streaming index maintenance: micro-batched adds converge to the same
  * state as one batch add, for both serving indexes. */
class IndexStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def tmp(n: String): String = Files.createTempDirectory(s"graft_ixs_$n").toString

  test("streamed document batches track the text index to the full corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val idxPath = tmp("t_idx")
    TextIndex.build(spark, idxPath, docs.filter(col("doc_id") % 2 === 0))
    val land = tmp("t_land")
    docs.filter(col("doc_id") % 2 === 1)
      .repartition(5).write.mode("overwrite").parquet(land)
    IndexStream.ingestText(spark, land, spark.read.parquet(land).schema,
      idxPath, tmp("t_ck"))
    val terms = Seq("join", "window", "dup")
    def rows(df: DataFrame) =
      df.orderBy(col("bm25_score").desc, col("doc_id").asc).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(TextIndex.load(spark, idxPath).search(terms, topK = 20)) ==
      rows(TextAnalysis.bm25(docs, terms, topK = 20)),
      "after draining the stream the index must equal a full-corpus build")
  }

  test("streamed embedding batches ≡ one batch add on the vector index") {
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    // parquet round-trip so the array type matches the streamed batches'
    // (parquet arrays read back containsNull=true; a toDF array does not)
    val embDir = tmp("v_emb")
    (0L until 160L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(embDir)
    val emb = spark.read.parquet(embDir).cache()
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") < 5)
    def rows(df: DataFrame) = df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    // reference: one batch add
    val batchPath = tmp("v_batch")
    VectorIndex.build(spark, batchPath, even, numLists = 8).add(odd)
    val want = rows(VectorIndex.load(spark, batchPath).search(queries, k = 5, nProbe = 4))
    // streamed: the same odd half over several files/micro-batches
    val streamPath = tmp("v_stream")
    VectorIndex.build(spark, streamPath, even, numLists = 8)
    val land = tmp("v_land")
    odd.repartition(5).write.mode("overwrite").parquet(land)
    IndexStream.ingestVectors(spark, land, spark.read.parquet(land).schema,
      streamPath, tmp("v_ck"))
    assert(rows(VectorIndex.load(spark, streamPath)
      .search(queries, k = 5, nProbe = 4)) == want,
      "micro-batched adds must converge to the single-batch state")
  }
}
