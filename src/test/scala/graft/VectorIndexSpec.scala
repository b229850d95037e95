package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Similarity, VectorIndex}

/** Persisted incremental PQ ANN index: build-once codebooks on lake
  * tables, frozen-codebook incremental adds, ADC search equal to the
  * in-memory path, bit-stable across reloads. */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_vix").toString

  /** 120 deterministic 16-dim vectors. */
  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(5)
    (0L until 120L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
  }

  test("persisted search ≡ in-memory pqTopK, and survives reload bit-exactly") {
    val path = tmp()
    val c = corpus.cache()
    val queries = c.filter(col("vec_id") < 5)
    val ix = VectorIndex.build(spark, path, c, m = 8, ks = 16)
    def rows(df: DataFrame) = df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val fromIndex = rows(ix.search(queries, k = 5))
    val inMemory = rows(Similarity.pqTopK(c, queries, k = 5, m = 8, ks = 16))
    assert(fromIndex == inMemory, "index search must equal the in-memory PQ path")
    val reloaded = VectorIndex.load(spark, path)
    assert(reloaded.codewords.map(_.toSeq).toSeq == ix.codewords.map(_.toSeq).toSeq,
      "codebooks must round-trip parquet bit-exactly")
    assert(rows(reloaded.search(queries, k = 5)) == fromIndex)
    // exact rerank path works from the stored embeddings alone
    val reranked = rows(reloaded.search(queries, k = 5, rerank = 3))
    assert(reranked.nonEmpty && reranked.map(x => (x._1, x._3)).distinct.size == reranked.size)
  }

  test("incremental add with frozen codebooks: new vectors are searchable") {
    val path = tmp()
    val c = corpus.cache()
    val ix = VectorIndex.build(spark, path, c, m = 8, ks = 16)
    // plant a vector almost identical to query 3's embedding
    val q3 = c.filter(col("vec_id") === 3L).select("embedding")
      .head().getSeq[Float](0).toArray
    val planted = q3.clone(); planted(0) += 1e-4f
    ix.add(Seq((777L, planted)).toDF("vec_id", "embedding"))
    val got = VectorIndex.load(spark, path)
      .search(c.filter(col("vec_id") === 3L), k = 1, rerank = 4)
      .select("neighbor_id").head().getLong(0)
    assert(got == 777L, s"the planted near-duplicate must be rank 1, got $got")
  }

  test("IVF-partitioned index: probe-pruned search opens fewer files, equals in-memory IVF-PQ") {
    val path = tmp()
    val c = corpus.cache()
    val queries = c.filter(col("vec_id") < 5)
    val ix = VectorIndex.build(spark, path, c, m = 8, ks = 16, numLists = 8)
    def rows(df: DataFrame) = df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    // the scan is really pruned: probed lists' files < total live files
    val (pruned, total) = ix.prunedFileCounts(queries, nProbe = 2)
    assert(pruned < total, s"expected file pruning, got $pruned of $total")
    assert(pruned > 0, "probed lists must still contribute files")
    // pruned search ≡ the in-memory IVF-PQ composition (same md5 coarse
    // sample, same codewords, same ADC scores) — raw and reranked
    assert(rows(ix.search(queries, k = 5, nProbe = 2)) ==
      rows(Similarity.ivfPqTopK(c, queries, k = 5, numLists = 8, nProbe = 2)))
    assert(rows(ix.search(queries, k = 5, rerank = 4, nProbe = 2)) ==
      rows(Similarity.ivfPqTopK(c, queries, k = 5, numLists = 8, nProbe = 2, rerank = 4)))
    // nProbe >= numLists degenerates to the flat ADC path
    assert(rows(ix.search(queries, k = 5, nProbe = 8)) == rows(ix.search(queries, k = 5)))
    // survives reload: centroids round-trip parquet bit-exactly
    val reloaded = VectorIndex.load(spark, path)
    assert(reloaded.centroids.toSeq == ix.centroids.toSeq)
    assert(rows(reloaded.search(queries, k = 5, nProbe = 2)) ==
      rows(ix.search(queries, k = 5, nProbe = 2)))
  }

  test("IVF-partitioned add: a re-added vector that moves lists leaves no stale row") {
    val path = tmp()
    val c = corpus.cache()
    val ix = VectorIndex.build(spark, path, c, m = 8, ks = 16, numLists = 8)
    val codes = graft.lake.LakeTable.load(spark, s"$path/codes")
    val oldCid = codes.read().filter(col("vec_id") === 7L)
      .select("cid").head().getInt(0)
    // re-add vec 7 AS another list's centroid: its nearest list is that
    // centroid's own (cos ≈ 1), so the record must MOVE partitions
    val targetCid = (oldCid + 3) % ix.centroids.length
    val moved = Seq((7L, ix.centroids(targetCid).map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")
    ix.add(moved)
    val after = codes.read().filter(col("vec_id") === 7L)
      .select("cid", "embedding").collect()
    assert(after.length == 1, s"stale row must die, got ${after.length} rows")
    assert(after.head.getInt(0) == targetCid)
    // an add that does NOT move lists still replaces in place
    ix.add(moved)
    assert(codes.read().filter(col("vec_id") === 7L).count() == 1)
  }

  test("adds racing a compaction: OCC serializes all three, search and pruning unchanged") {
    import java.util.concurrent.{CountDownLatch, Executors}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val c = corpus.cache()
    val even = c.filter(col("vec_id") % 2 === 0)
    val addA = c.filter(col("vec_id") % 4 === 1)
    val addB = c.filter(col("vec_id") % 4 === 3)
    val queries = c.filter(col("vec_id") < 5)
    def rows(df: DataFrame) = df.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    // reference: the same final state, no races, no compaction
    val refPath = tmp()
    VectorIndex.build(spark, refPath, even, numLists = 8).add(addA).add(addB)
    val want = rows(VectorIndex.load(spark, refPath).search(queries, k = 5, nProbe = 4))
    // raced: two disjoint adds and a compaction loop, all concurrent.
    // Adds commute (disjoint keys), compaction is a pure physical
    // rewrite — every serialization order yields the same logical state.
    val racePath = tmp()
    VectorIndex.build(spark, racePath, even, numLists = 8)
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val start = new CountDownLatch(1)
    val futs = Seq(
      Future { start.await(); VectorIndex.load(spark, racePath).add(addA) },
      Future { start.await(); VectorIndex.load(spark, racePath).add(addB) },
      Future { start.await()
        val ix = VectorIndex.load(spark, racePath)
        (0 until 3).foreach(_ => ix.compact()) })
    start.countDown()
    Await.result(Future.sequence(futs), 600.seconds)
    pool.shutdown()
    val after = VectorIndex.load(spark, racePath)
    assert(rows(after.search(queries, k = 5, nProbe = 4)) == want,
      "racing add/add/compact must converge to the sequential no-compaction state")
    // compaction preserved the hive list layout: probe pruning still skips files
    val (pruned, total) = after.prunedFileCounts(queries.limit(1), nProbe = 2)
    assert(pruned > 0 && pruned < total,
      s"probe pruning must survive compaction: opened $pruned of $total")
    // and every writer landed: commits show 2 upserts + 3 compacts after build
    val ops = graft.lake.LakeTable.load(spark, s"$racePath/codes")
      .commits.map(_.operation)
    assert(ops.count(_ == "compact") == 3 && ops.count(_ == "upsert") >= 2,
      s"all racers must commit, got $ops")
  }

  test("re-adding a vec_id replaces its code (keyed upsert, never duplicates)") {
    val path = tmp()
    val c = corpus.cache()
    val ix = VectorIndex.build(spark, path, c, m = 8, ks = 16)
    val newVec = Array.fill(16)(0.25f)
    ix.add(Seq((7L, newVec)).toDF("vec_id", "embedding"))
    val codes = graft.lake.LakeTable.load(spark, s"$path/codes").read()
    assert(codes.filter(col("vec_id") === 7L).count() == 1)
    val stored = codes.filter(col("vec_id") === 7L)
      .select("embedding").head().getSeq[Float](0)
    assert(stored == newVec.toSeq, "the replacement embedding must win")
  }
}
