package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Envelope, Normalize}
import graft.lake.{LakeTable, TableSpec}

/** Keystone golden test (SURVEY.md §5.2(1), FIXTURES.md §5): replays the
  * showcase end-to-end and asserts the reference's embedded goldens.
  */
class LakeTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def tmp(): String = Files.createTempDirectory("graft_lake").toString

  def ingest(df: DataFrame): DataFrame = Normalize.ingest(df)

  def state(df: DataFrame): Set[(Int, String, Int, String, Boolean)] =
    df.select("pk_id", "name", "value", "source_metadata.change_type", "source_metadata.is_deleted")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3), r.getBoolean(4)))
      .toSet

  val goldenFinal = Set(
    (1, "apple", 10, "INSERT", false),
    (2, "samsung", 201, "UPDATE-INSERT", false),
    (3, "dell", 30, "DELETE", true), // tombstone retained, README.md:529
    (4, "motorola", 40, "INSERT", false),
    (5, "htc", 50, "INSERT", false))

  val goldenInitial = Set(
    (1, "apple", 10, "INSERT", false), (2, "samsung", 20, "INSERT", false),
    (3, "dell", 30, "INSERT", false), (4, "motorola", 40, "INSERT", false))

  def cowSpec = TableSpec("pk_id", "updated_at", Some("created_at"))
  def morSpec = cowSpec.copy(mor = true)

  test("CoW: full load then upsert reaches the golden 5-row state") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    assert(state(t.read()) == goldenInitial)
    t.upsert(ingest(Envelope.cdc(spark)))
    assert(state(t.read()) == goldenFinal)
    // §4.3(5): untouched rows keep their commit time, updated rows get a new one
    val times = t.read().select("pk_id", "_commit_time").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(times(1) == times(4) && times(2) != times(1), "apple/motorola original, samsung new")
    assert(times(5) == times(2), "htc inserted by the upsert commit")
  }

  test("CoW upsert is idempotent") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    val cdc = ingest(Envelope.cdc(spark))
    t.upsert(cdc).upsert(cdc)
    assert(state(t.read()) == goldenFinal)
  }

  test("older precombine does not overwrite newer state") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    t.upsert(ingest(Envelope.cdc(spark)))
    t.upsert(ingest(Envelope.backfill(spark))) // replay old full dump
    // samsung keeps 201 (strictly newer precombine); dell's tombstone flips
    // back because its replayed row TIES on precombine and incoming wins
    // ties — Hudi DefaultHoodieRecordPayload `>=` semantics
    val expected = goldenFinal - ((3, "dell", 30, "DELETE", true)) +
      ((3, "dell", 30, "INSERT", false))
    assert(state(t.read()) == expected, "stale replay must not regress newer rows")
  }

  test("MoR: _ro stale (except new keys), _rt fresh; compact converges them") {
    val path = tmp()
    val t = LakeTable.create(spark, path, morSpec, ingest(Envelope.backfill(spark)))
    assert(state(t.readOptimized()) == state(t.realtime()), "README.md:707: identical after full load")
    t.upsert(ingest(Envelope.cdc(spark)))
    // _ro: stale samsung=20, dell=30 — but new key htc already visible (base file)
    assert(state(t.readOptimized()) == goldenInitial + ((5, "htc", 50, "INSERT", false)),
      "README.md:929-1034")
    assert(state(t.realtime()) == goldenFinal, "README.md:1044-1150")
    t.compact()
    assert(state(t.readOptimized()) == goldenFinal)
    assert(state(t.realtime()) == goldenFinal)
  }

  test("time travel: version 0 shows the pre-upsert state") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    t.upsert(ingest(Envelope.cdc(spark)))
    assert(state(t.read(Some(0))) == goldenInitial)
    assert(state(t.read(Some(1))) == goldenFinal)
  }

  test("vacuum removes dead files but keeps the live snapshot readable") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    t.upsert(ingest(Envelope.cdc(spark)))
    val before = countParquet(path)
    t.vacuum(retainVersions = 1)
    assert(countParquet(path) < before, "rewritten files physically deleted")
    assert(state(t.read()) == goldenFinal)
  }

  test("savepoint pins a version's files against vacuum; release unpins") {
    import spark.implicits._
    val path = tmp()
    def batch(tag: String) = (1 to 50).map(i => (i, tag.hashCode.toLong, tag)).toDF("k", "pc", "v")
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"), batch("v0"))
    t.overwrite(batch("v1"))
    t.overwrite(batch("v2"))
    t.savepoint(0L)
    assert(t.savepoints == Seq(0L))
    t.vacuum(retainVersions = 1)
    // v0 pinned: still time-travels; v1 (unpinned, superseded) is gone
    assert(t.read(Some(0L)).select("v").head().getString(0) == "v0")
    intercept[Exception] { t.read(Some(1L)).collect() }
    // restore to the savepointed version works (the Hudi use-case)
    t.restore(0L)
    assert(t.read().select("v").head().getString(0) == "v0")
    // release + vacuum reclaims nothing retained... pin v0's files again
    // via the restore (they are the LIVE set now), so releasing is safe
    t.releaseSavepoint(0L)
    assert(t.savepoints.isEmpty)
    intercept[IllegalArgumentException] { t.releaseSavepoint(0L) }
  }

  test("delete on MoR with outstanding logs folds them first — no duplicate keys") {
    import spark.implicits._
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc", mor = true),
      Seq((1, 1L, "a"), (2, 1L, "b"), (3, 1L, "c")).toDF("k", "pc", "v"))
    t.upsert(Seq((1, 2L, "a2"), (2, 2L, "b2")).toDF("k", "pc", "v")) // → log files
    t.delete(org.apache.spark.sql.functions.col("k") === 3)
    val rows = t.read().select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(rows.length == rows.map(_._1).distinct.length, s"duplicate keys: ${rows.toSeq}")
    assert(rows.toSet == Set((1, "a2"), (2, "b2")),
      "log post-images survive the delete, k=3 gone")
  }

  test("update() evaluates condition and assignments against pre-update values") {
    import spark.implicits._
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a", "b"), (2, 1L, "x", "y")).toDF("k", "pc", "c1", "c2"))
    // swap c1/c2 where c1='a' — sequential assignment would set both to 'b'
    t.update(org.apache.spark.sql.functions.col("c1") === "a",
      Map("c1" -> org.apache.spark.sql.functions.col("c2"),
        "c2" -> org.apache.spark.sql.functions.col("c1")))
    val rows = t.read().select("k", "c1", "c2").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1, "b", "a"), (2, "x", "y")))
  }

  test("update() restamps commit time so incremental and changes() see post-images") {
    import spark.implicits._
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))
    t.update(org.apache.spark.sql.functions.col("k") === 2,
      Map("v" -> org.apache.spark.sql.functions.lit("b2")))
    val inc = t.incremental(0).select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(inc == Set((2, "b2")), s"incremental must carry the UPDATE post-image, got $inc")
    val ch = t.changes(0).select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(ch == Set((2, "update_postimage")))
  }

  test("changes() tags inserts, update post-images, and deletes over a version window") {
    import spark.implicits._
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a"), (2, 1L, "b"), (3, 1L, "c")).toDF("k", "pc", "v"))
    t.upsert(Seq((2, 2L, "b2"), (4, 1L, "d")).toDF("k", "pc", "v")) // v1
    t.delete(org.apache.spark.sql.functions.col("k") === 1)         // v2
    val got = t.changes(0).select("k", "v", "_change_type").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got == Set(
      (2, Some("b2"), "update_postimage"),
      (4, Some("d"), "insert"),
      (1, None, "delete")), s"got $got")
    // windowed: only v2's change
    val w = t.changes(1).select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(w == Set((1, "delete")))
    // deleted-then-reinserted key surfaces as its post-image, not a delete
    t.upsert(Seq((1, 3L, "a3")).toDF("k", "pc", "v"))
    val re = t.changes(2).select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(re == Set((1, "insert")))
  }

  test("changes() honors (key, partition) record identity on partitioned tables") {
    import spark.implicits._
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc", Some("p")),
      Seq((1, 1L, "a", "A"), (2, 1L, "b", "A")).toDF("k", "pc", "v", "p"))
    // one commit rewrites partition A's file (k=2 update) AND inserts the
    // NEW record (k=1, partition B) — same key, different partition. With
    // key-only identity the B record would be mistagged update_postimage.
    t.upsert(Seq((2, 2L, "b2", "A"), (1, 1L, "x", "B")).toDF("k", "pc", "v", "p"))
    val got = t.changes(0).select("k", "p", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((2, "A", "update_postimage"), (1, "B", "insert")), s"got $got")
  }

  test("changes() on MoR: log-updates tag update, in-window insert-then-update tags insert") {
    import spark.implicits._
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc", mor = true),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))
    // v1: k=1 updated (log write, base untouched) + k=5 inserted (base)
    t.upsert(Seq((1, 2L, "a2"), (5, 1L, "e")).toDF("k", "pc", "v"))
    // v2: k=5 updated again — insert-then-update inside the window
    t.upsert(Seq((5, 2L, "e2")).toDF("k", "pc", "v"))
    val got = t.changes(0).select("k", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a2", "update_postimage"), (5, "e2", "insert")), s"got $got")
    // v3: MoR delete (folds logs, rewrites base)
    t.delete(org.apache.spark.sql.functions.col("k") === 1)
    val w = t.changes(2).select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(w == Set((1, "delete")), s"got $w")
  }

  test("reader option changes.since surfaces the change feed with _change_type") {
    import spark.implicits._
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq((1, 2L, "a2"), (2, 1L, "b")).toDF("k", "pc", "v"))
    val got = spark.read.format("graft").option("changes.since", "0").load(path)
      .select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "update_postimage"), (2, "insert")))
  }

  test("restore re-references an old version's files; history records every commit") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    t.upsert(ingest(Envelope.cdc(spark)))
    assert(state(t.read()) == goldenFinal)
    t.restore(0)
    assert(state(t.read()) == goldenInitial, "latest snapshot is version 0's state")
    assert(state(t.read(Some(1))) == goldenFinal, "in-between versions stay travelable")
    val ops = t.history.select("version", "operation").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ops == Seq((2L, "restore"), (1L, "upsert"), (0L, "create")))
    // restore is a real state: upserting on top works
    t.upsert(ingest(Envelope.cdc(spark)))
    assert(state(t.read()) == goldenFinal)
  }

  test("time-based vacuum keeps versions inside the retention window") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    t.upsert(ingest(Envelope.cdc(spark)))
    val before = countParquet(path)
    // everything is younger than 1000h: nothing deleted, time travel intact
    t.vacuum(retainHours = Some(1000.0))
    assert(countParquet(path) == before)
    assert(state(t.read(Some(0))) == goldenInitial)
    // 0h window: only the latest version survives
    t.vacuum(retainHours = Some(0.0))
    assert(countParquet(path) < before)
    assert(state(t.read()) == goldenFinal)
  }

  test("merge with applyDeletes drops tombstoned rows (opt-in extension)") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    t.merge(ingest(Envelope.cdc(spark)), applyDeletes = true)
    assert(state(t.read()) == goldenFinal.filterNot(_._1 == 3))
  }

  test("registerViews exposes SQL access (S4/S12)") {
    val path = tmp()
    val t = LakeTable.create(spark, path, morSpec, ingest(Envelope.backfill(spark)))
    t.upsert(ingest(Envelope.cdc(spark))).registerViews("hudi_mor")
    val rt = spark.sql("SELECT pk_id, name, value FROM hudi_mor_rt").count()
    val ro = spark.sql("SELECT pk_id, name, value FROM hudi_mor_ro").count()
    assert(rt == 5 && ro == 5)
    assert(spark.sql("SELECT value FROM hudi_mor_ro WHERE pk_id=2").head().getInt(0) == 20)
    assert(spark.sql("SELECT value FROM hudi_mor_rt WHERE pk_id=2").head().getInt(0) == 201)
  }

  test("meta columns have Hudi shapes (M4)") {
    val path = tmp()
    val t = LakeTable.create(spark, path, cowSpec, ingest(Envelope.backfill(spark)))
    val r = t.read().select("_commit_time", "_commit_seqno", "_record_key", "_partition_path", "_file_name").head()
    assert(r.getString(0).matches("\\d{17}"))
    assert(r.getString(1).startsWith(r.getString(0) + "_"))
    assert(Set("1", "2", "3", "4").contains(r.getString(2)))
    assert(r.getString(3).nonEmpty)
    assert(r.getString(4).endsWith(".parquet"))
  }

  test("bulkInsert passes duplicate keys through; the next upsert collapses them") {
    import spark.implicits._
    val path = tmp()
    val dup = Seq((1, 10L, "a"), (1, 20L, "b"), (2, 5L, "c")).toDF("k", "pc", "v")
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"), dup, bulkInsert = true)
    assert(t.read().count() == 3, "Hudi INSERT semantics: no combine-before-insert")
    t.upsert(Seq((2, 6L, "c2")).toDF("k", "pc", "v"))
    val afterUpsert = t.read().select("k", "pc", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    // upsert rewrites only touched files — untouched duplicate keys persist
    // (Hudi-identical); compaction collapses them latest-wins
    assert(afterUpsert.contains((2, 6L, "c2")) && afterUpsert.size >= 3)
    t.compact()
    val afterCompact = t.read().select("k", "pc", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(afterCompact == Set((1, 20L, "b"), (2, 6L, "c2")))
  }

  test("batch-internal precombine dedup keeps only the latest row per key (A4)") {
    val path = tmp()
    val both = ingest(Envelope.backfill(spark)).unionByName(ingest(Envelope.cdc(spark)))
    val t = LakeTable.create(spark, path, cowSpec, both)
    assert(state(t.read()) == goldenFinal, "one batch holding old+new rows applies latest only")
  }

  private def countParquet(path: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
  }

  test("time-range filters prune files via INT64 timestamp footer stats") {
    import org.apache.spark.sql.functions._
    val path = tmp()
    // time-clustered table with ts stats — the streaming-ingest layout;
    // a recent-window range filter must open only the tail files
    val facts = spark.range(800L).select(col("id").as("k"), lit(0L).as("ver"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0)").as("ts"),
      (col("id") % 100).as("v"))
      .repartitionByRange(8, col("ts"))
    val t = LakeTable.create(spark, path,
      TableSpec("k", "ver", statsColumns = Seq("ts")), facts, bulkInsert = true)
    val cut = java.sql.Timestamp.valueOf("2024-01-30 00:00:00") // last ~10% of rows
    val pruned = t.readWhere(Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("ts", cut)))
    val fullFiles = t.read().inputFiles.length
    assert(fullFiles >= 4, s"need a clustered multi-file table, got $fullFiles")
    assert(pruned.inputFiles.length < fullFiles,
      s"a time-range filter must prune (${pruned.inputFiles.length} of $fullFiles)")
    // candidate files may contribute out-of-range rows; re-filtering
    // yields exactly the full read's matching rows
    assert(pruned.filter(col("ts") >= lit(cut)).select("k", "v")
      .collect().map(_.toSeq).toSet ==
      t.read().filter(col("ts") >= lit(cut)).select("k", "v")
        .collect().map(_.toSeq).toSet)
    // java.time form (datetime.java8API) prunes identically
    val pruned8 = t.readWhere(Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(
      "ts", cut.toInstant)))
    assert(pruned8.inputFiles.length == pruned.inputFiles.length)
  }

  test("MoR readWhere prunes base files against key stats THROUGH the merge") {
    import org.apache.spark.sql.functions._
    val path = tmp()
    // key-clustered base (tight per-file key ranges), then log churn: the
    // point lookup must open a minority of base files plus the logs, and
    // the merged rows must equal the unpruned realtime read's
    val base0 = spark.range(800L).select(col("id").as("k"),
      lit(0L).as("ver"), (col("id") % 100).as("v"))
      .repartitionByRange(8, col("k"))
    val t = LakeTable.create(spark, path, TableSpec("k", "ver", mor = true),
      base0, bulkInsert = true)
    t.upsert(spark.range(10L).select((col("id") * 80).as("k"),
      lit(1L).as("ver"), lit(999L).as("v")))
    assert(t.liveFiles(None).exists(_.log), "churn must be outstanding logs")
    val probe = Seq(org.apache.spark.sql.sources.EqualTo("k", 160L))
    val pruned = t.readWhere(probe)
    val fullFiles = t.read().inputFiles.length
    assert(pruned.inputFiles.length < fullFiles,
      s"MoR readWhere must open fewer files (${pruned.inputFiles.length} vs $fullFiles)")
    assert(pruned.filter(col("k") === 160L).select("k", "ver", "v")
      .collect().map(_.toSeq).toSet ==
      t.read().filter(col("k") === 160L).select("k", "ver", "v")
        .collect().map(_.toSeq).toSet,
      "pruned merge must equal the full realtime merge on the probed key")
    // a key superseded only in the logs still reads its LATEST row
    assert(pruned.filter(col("k") === 160L).select("v").head().getLong(0) == 999L)
  }
}
