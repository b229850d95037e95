package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** SQL `table_changes` TVF (Delta CDF parity): the resolution rule injected
  * by GraftExtensions rewrites `FROM table_changes('t', since[, end])` into
  * the change-feed read, composable with arbitrary surrounding SQL. */
class TableChangesSpec extends AnyFunSuite {

  /** Dedicated session so the extension applies (the shared test session
    * was built without it). Same SparkContext is reused underneath. */
  lazy val spark: SparkSession = {
    SparkTestSession.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-tvf-test"), 4)
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def mkTable(name: String): (String, LakeTable) = {
    import spark.implicits._
    val path = Files.createTempDirectory(s"graft_tvf_$name").toString
    val base = Seq((1, 10, 100L), (2, 20, 100L), (3, 30, 100L), (4, 40, 100L))
      .toDF("id", "v", "ts")
    (path, LakeTable.create(spark, path, TableSpec("id", "ts"), base))
  }

  test("table_changes('path', since) tags inserts, updates and deletes in SQL") {
    import spark.implicits._
    val (path, tbl) = mkTable("full")
    tbl.delete(col("id") === 3) // v1
    tbl.upsert(Seq((2, 21, 200L), (9, 90, 200L)).toDF("id", "v", "ts")) // v2
    val got = spark.sql(
      s"""SELECT id, v, _change_type FROM table_changes('$path', 0)
         |ORDER BY _change_type, id""".stripMargin)
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((3, -1, "delete"), (9, 90, "insert"), (2, 21, "update_postimage")))
  }

  test("table_files / table_history answer from commit-log metadata in SQL") {
    import spark.implicits._
    val (path, tbl) = mkTable("meta")
    tbl.upsert(Seq((9, 90, 200L)).toDF("id", "v", "ts")) // v1
    // files: rows sum equals the snapshot, composable with aggregates
    val sums = spark.sql(
      s"SELECT CAST(SUM(rows - dv_rows) AS BIGINT) FROM table_files('$path')")
      .head().getLong(0)
    assert(sums == tbl.read().count())
    // time travel: v0's file list is smaller
    val n0 = spark.sql(s"SELECT COUNT(*) FROM table_files('$path', 0)").head().getLong(0)
    val nNow = spark.sql(s"SELECT COUNT(*) FROM table_files('$path')").head().getLong(0)
    assert(n0 <= nNow && n0 > 0)
    // history: one row per commit, newest first
    val hist = spark.sql(s"SELECT version, operation FROM table_history('$path')")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.map(_._1).toSeq == Seq(1L, 0L))
    assert(hist.map(_._2).toSeq == Seq("upsert", "create"))
    // zero data files opened: the plan is a LocalRelation scan
    val plan = spark.sql(s"SELECT * FROM table_files('$path')")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), plan)
  }

  test("table_partitions rolls up per-partition file/row/byte metadata") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_tvf_parts").toString
    val tbl = LakeTable.create(spark, path,
      TableSpec("id", "ts", partition = Some("p")),
      Seq((1, 100L, "a", "x"), (2, 100L, "a", "y"), (3, 100L, "b", "y"))
        .toDF("id", "ts", "p", "q"))
    tbl.deleteVectors(col("id") === 1)
    val rows = spark.sql(
      s"""SELECT partition_value, rows, n_files FROM table_partitions('$path')
         |ORDER BY partition_value""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(x => x._1 -> x._2).toMap == Map("a" -> 1L, "b" -> 1L),
      s"DV-discounted per-partition rows, got ${rows.toSeq}")
    assert(rows.forall(_._3 >= 1L))
    // era awareness: after a partition evolution, each file reports the
    // COLUMN it was physically written under alongside its value
    LakeTable.load(spark, path).compact() // fold the DV first
    LakeTable.load(spark, path).changePartition(Some("q"))
    LakeTable.load(spark, path)
      .upsert(Seq((4, 100L, "c", "z")).toDF("id", "ts", "p", "q"))
    val eras = spark.sql(
      s"""SELECT partition_column, partition_value FROM table_partitions('$path')
         |ORDER BY partition_column, partition_value""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(eras.exists(_._1 == "p") && eras.contains(("q", "z")),
      s"mixed eras must report per-column values, got $eras")
  }

  test("the third argument bounds the window to (since, end]") {
    import spark.implicits._
    val (path, tbl) = mkTable("bounded")
    tbl.upsert(Seq((1, 11, 200L)).toDF("id", "v", "ts")) // v1
    tbl.upsert(Seq((2, 22, 300L)).toDF("id", "v", "ts")) // v2
    val got = spark.sql(
      s"SELECT id, v, _change_type FROM table_changes('$path', 1, 2)")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((2, 22, "update_postimage")))
  }

  test("a catalog table name resolves and the feed composes with joins/aggregates") {
    import spark.implicits._
    val (path, tbl) = mkTable("compose")
    tbl.upsert(Seq((1, 11, 200L), (2, 22, 200L), (9, 90, 200L)).toDF("id", "v", "ts"))
    spark.sql("DROP TABLE IF EXISTS tvf_t")
    spark.sql(s"CREATE TABLE tvf_t USING graft LOCATION '$path'")
    val got = spark.sql(
      """SELECT c._change_type, count(*) AS n, sum(d.v) AS base_v
        |FROM table_changes('tvf_t', 0) c JOIN tvf_t d ON c.id = d.id
        |GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("insert", 1L, 90L), ("update_postimage", 2L, 33L)))
    spark.sql("DROP TABLE tvf_t")
  }

  test("a timestamp `since` resolves through versionAt; a future one reads nothing") {
    import spark.implicits._
    val (path, tbl) = mkTable("ts")
    tbl.upsert(Seq((1, 11, 200L)).toDF("id", "v", "ts"))
    val n = spark.sql(
      s"SELECT * FROM table_changes('$path', TIMESTAMP '2999-01-01 00:00:00')")
      .count()
    assert(n == 0L, "a since-timestamp after the last commit must yield an empty feed")
  }

  test("a non-graft target errors with the statement shape, not a planner crash") {
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('/no/such/table', 0)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("table_changes"),
      s"claimed TVF must report its own argument error, got: ${err.getMessage}")
  }

  test("includePreimages adds exactly the updated keys' window-start values") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft_cdf_pre").toString
    // one file holds ALL keys: updating key 2 rewrites 1 and 3 too, and
    // they must NOT surface as preimages
    val tbl = LakeTable.create(spark, path, TableSpec("id", "ts"),
      Seq((1L, 1L, "a1"), (2L, 1L, "b1"), (3L, 1L, "c1"))
        .toDF("id", "ts", "v").coalesce(1))
    tbl.upsert(Seq((2L, 2L, "b2"), (9L, 1L, "new")).toDF("id", "ts", "v"))
    tbl.delete(col("id") === 3L)
    val feed = LakeTable.load(spark, path).changes(0, includePreimages = true)
      .select("id", "v", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(feed == Set(
      (2L, "b2", "update_postimage"),
      (2L, "b1", "update_preimage"),
      (9L, "new", "insert"),
      (3L, null, "delete")))
    // MoR refuses: the old value never leaves its base file
    val morPath = java.nio.file.Files.createTempDirectory("graft_cdf_pre_mor").toString
    val mor = LakeTable.create(spark, morPath, TableSpec("id", "ts", mor = true),
      Seq((1L, 1L, "a")).toDF("id", "ts", "v"))
    mor.upsert(Seq((1L, 2L, "b")).toDF("id", "ts", "v"))
    val err2 = intercept[IllegalArgumentException] {
      mor.changes(0, includePreimages = true).collect()
    }
    assert(err2.getMessage.contains("CoW"))
  }

  test("text_search / vector_search TVFs serve the persisted indexes from SQL") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tixPath = java.nio.file.Files.createTempDirectory("graft_tvf_tix").toString
    graft.ext.TextIndex.build(spark, tixPath, docs)
    val viaSql = spark.sql(
      s"SELECT doc_id, bm25_score FROM text_search('$tixPath', 'join window dup', 20)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = graft.ext.TextIndex.load(spark, tixPath)
      .search(Seq("join", "window", "dup"), 20)
      .select("doc_id", "bm25_score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == direct && viaSql.nonEmpty)
    // composes with surrounding SQL (filter + aggregate over the TVF)
    val n = spark.sql(
      s"SELECT count(*) FROM text_search('$tixPath', 'join', 50) WHERE bm25_score > 0")
      .head().getLong(0)
    assert(n > 0)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vixPath = java.nio.file.Files.createTempDirectory("graft_tvf_vix").toString
    graft.ext.VectorIndex.build(spark, vixPath, emb, numLists = 8)
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("tvf_queries")
    try {
      val viaSqlV = spark.sql(
        s"SELECT query_id, neighbor_id, rank FROM vector_search('$vixPath', 'tvf_queries', 5, 2)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
      val directV = graft.ext.VectorIndex.load(spark, vixPath)
        .search(emb.filter(col("vec_id") < 3), k = 5, nProbe = 2)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
      assert(viaSqlV == directV && viaSqlV.nonEmpty)
    } finally { spark.catalog.dropTempView("tvf_queries"); () }

    // argument errors are eager and descriptive
    val err = intercept[Exception](spark.sql(s"SELECT * FROM text_search('$tixPath')"))
    assert(err.getMessage.contains("text_search"))
  }

  test("a physical-only window is EMPTY for incremental/changes without opening a data file") {
    import spark.implicits._
    val (path, tbl) = mkTable("phys")
    tbl.upsert(Seq((2, 21, 200L), (9, 90, 200L)).toDF("id", "v", "ts")) // v1
    val v1 = tbl.latestVersion
    // a tailing stream sees a compaction as its own micro-batch: every
    // added file carries only pre-existing rows, so the batch must be
    // empty BY METADATA — without this the stream reads the whole
    // rewritten table per compaction and filters every row back out
    tbl.compact() // v2
    tbl.analyze() // v3 — pure metadata, same proof
    val inc = tbl.incremental(v1)
    assert(inc.isEmpty, "physical-only window must have no post-images")
    assert(inc.inputFiles.isEmpty,
      "the empty proof must come from commit METADATA, not a filtered scan")
    val ch = tbl.changes(v1)
    assert(ch.isEmpty && ch.inputFiles.isEmpty,
      "changes over a physical-only window must be metadata-only empty")
    assert(spark.sql(s"SELECT * FROM table_changes('$path', $v1)").isEmpty)
    // MIXED window from the same since: the churn before the compaction
    // still surfaces exactly once, with the compaction's carried rows
    // filtered out — and a post-compaction upsert is visible too
    tbl.upsert(Seq((1, 11, 300L)).toDF("id", "v", "ts")) // v4
    val mixed = tbl.incremental(0L)
    assert(mixed.select("id", "v").collect().map(r => (r.getInt(0), r.getInt(1)))
      .toSet == Set((2, 21), (9, 90), (1, 11)),
      "mixed window must carry the true churn exactly once")
    val chMixed = tbl.changes(v1).select("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(chMixed == Set((1, "update_postimage")),
      s"post-compaction churn must tag correctly, got $chMixed")
  }
}
