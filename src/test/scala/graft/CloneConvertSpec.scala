package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Shallow clone (metadata-only fork, copy-on-write divergence) and
  * convert-in-place (plain parquet dir → graft table without a rewrite).
  */
class CloneConvertSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def vals(t: LakeTable): Set[(Long, String)] =
    t.read().select("k", "v").as[(Long, String)].collect().toSet

  test("shallow clone reads the source state without copying data") {
    val srcPath = Files.createTempDirectory("graft_clone_src").toString
    val src = LakeTable.create(spark, srcPath, TableSpec("k", "ts"),
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ts", "v"))
    src.upsert(Seq((2L, 2L, "b2"), (3L, 1L, "c")).toDF("k", "ts", "v"))

    val clonePath = Files.createTempDirectory("graft_clone_tgt").toString + "/t"
    val clone = src.cloneTo(clonePath)
    assert(vals(clone) == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // metadata-only: the clone's data dir holds no files yet
    val dataDir = new java.io.File(clonePath, "data")
    assert(!dataDir.exists || dataDir.listFiles.isEmpty, "clone must not copy data")

    // divergence: writes to the clone leave the source untouched
    clone.upsert(Seq((1L, 3L, "a-clone"), (9L, 1L, "z")).toDF("k", "ts", "v"))
    assert(vals(clone) == Set((1L, "a-clone"), (2L, "b2"), (3L, "c"), (9L, "z")))
    assert(vals(src) == Set((1L, "a"), (2L, "b2"), (3L, "c")), "source unchanged")
    // and source writes don't leak into the clone
    src.upsert(Seq((5L, 1L, "e")).toDF("k", "ts", "v"))
    assert(!vals(clone).contains((5L, "e")))

    // compact() absorbs the external references — clone becomes self-contained
    clone.compact()
    assert(clone.commits.maxBy(_.version).add.forall(_.base.isEmpty),
      "post-compact files live in the clone's own data dir")
    assert(vals(clone) == Set((1L, "a-clone"), (2L, "b2"), (3L, "c"), (9L, "z")))
  }

  test("clone of a precise version is the time-travel snapshot") {
    val srcPath = Files.createTempDirectory("graft_clone_v").toString
    val src = LakeTable.create(spark, srcPath, TableSpec("k", "ts"),
      Seq((1L, 1L, "a")).toDF("k", "ts", "v"))
    src.upsert(Seq((1L, 2L, "a2")).toDF("k", "ts", "v"))
    val clone = src.cloneTo(Files.createTempDirectory("graft_clone_v_t").toString + "/t",
      asOf = Some(0L))
    assert(vals(clone) == Set((1L, "a")))
  }

  test("convert-in-place bootstraps a graft table over plain parquet") {
    val dir = Files.createTempDirectory("graft_convert").toString
    Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")).toDF("k", "ts", "v")
      .repartition(2).write.mode("overwrite").parquet(dir)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))

    val t = LakeTable.convert(spark, dir, TableSpec("k", "ts"))
    assert(vals(t) == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // upserts work: touched originals are de-referenced, not deleted
    t.upsert(Seq((2L, 2L, "b2"), (4L, 1L, "d")).toDF("k", "ts", "v"))
    assert(vals(t) == Set((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    val after = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(after == before, "original parquet files stay on disk")

    // stats-based pruning metadata exists for the converted files
    assert(t.commits.head.add.forall(a => a.rows > 0 && a.base.isDefined))
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE through the parser") {
    // needs the extensions session from MergeIntoSpec's pattern
    SparkTestSession.spark // ensure base context
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-clone-sql"), 4)
      .withExtensions(new graft.sql.GraftExtensions).getOrCreate()
    import s.implicits._
    val srcPath = Files.createTempDirectory("graft_clone_sql").toString
    Seq((1L, 1L, "a")).toDF("k", "ts", "v").write.format("graft")
      .option("key", "k").option("precombine", "ts").mode("overwrite").save(srcPath)
    val tgt = Files.createTempDirectory("graft_clone_sql_t").toString + "/t"
    s.sql(s"CREATE TABLE '$tgt' SHALLOW CLONE '$srcPath'")
    assert(LakeTable.load(s, tgt).read().count() == 1)
    s.sql("DROP TABLE IF EXISTS clone_named")
    val tgt2 = Files.createTempDirectory("graft_clone_sql_t2").toString + "/t"
    s.sql(s"CREATE TABLE clone_named SHALLOW CLONE '$srcPath' LOCATION '$tgt2'")
    assert(s.sql("SELECT count(*) FROM clone_named").head().getLong(0) == 1)
    s.sql("DROP TABLE clone_named")
  }

  test("deep clone byte-copies the snapshot and survives source vacuum/drop") {
    val srcPath = Files.createTempDirectory("graft_dclone_src").toString
    val src = LakeTable.create(spark, srcPath,
      TableSpec("k", "ts", statsColumns = Seq("v"), bloomBitsPerKey = 10),
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ts", "v"))
    src.upsert(Seq((2L, 2L, "b2"), (3L, 1L, "c")).toDF("k", "ts", "v"))
    val expected = Set((1L, "a"), (2L, "b2"), (3L, "c"))

    val clonePath = Files.createTempDirectory("graft_dclone_tgt").toString + "/t"
    val clone = src.deepCloneTo(clonePath)
    assert(vals(clone) == expected)
    // independent: every file lives in the clone's own data dir (no base
    // refs), stats carried over verbatim (key ranges + declared colStats)
    val adds = clone.commits.maxBy(_.version).add
    assert(adds.forall(_.base.isEmpty), "deep clone must own its files")
    assert(adds.forall(_.colStats.contains("v")), "column stats must carry over")
    val srcStats = src.liveFiles(None).map(a => (a.rows, a.minKey, a.maxKey)).sorted
    assert(adds.map(a => (a.rows, a.minKey, a.maxKey)).sorted == srcStats)
    // divergence both ways
    clone.upsert(Seq((9L, 1L, "z")).toDF("k", "ts", "v"))
    src.upsert(Seq((5L, 1L, "e")).toDF("k", "ts", "v"))
    assert(vals(clone) == expected + ((9L, "z")))
    assert(vals(src) == expected + ((5L, "e")))
    // the shallow-clone failure mode must NOT exist: rewrite the source's
    // files (compact) and vacuum the originals — the deep clone still reads
    src.compact()
    src.vacuum(retainVersions = 1, retainHours = Some(0.0))
    assert(vals(clone) == expected + ((9L, "z")),
      "deep clone must survive source vacuum")
  }

  test("deep clone of a version snapshot; evolved sources materialize via rewrite") {
    val srcPath = Files.createTempDirectory("graft_dclone_ev").toString
    val src = LakeTable.create(spark, srcPath, TableSpec("k", "ts"),
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ts", "v"))
    // VERSION AS OF deep clone
    src.upsert(Seq((1L, 2L, "a2")).toDF("k", "ts", "v"))
    val snap = src.deepCloneTo(
      Files.createTempDirectory("graft_dclone_ev_v").toString + "/t", asOf = Some(0L))
    assert(vals(snap) == Set((1L, "a"), (2L, "b")))
    // additive evolution → live files carry two schemas → rewrite path
    src.addColumns(Seq(org.apache.spark.sql.types.StructField("w",
      org.apache.spark.sql.types.LongType)))
    src.upsert(Seq((3L, 1L, "c", 7L)).toDF("k", "ts", "v", "w"))
    val clone = src.deepCloneTo(
      Files.createTempDirectory("graft_dclone_ev_t").toString + "/t")
    assert(clone.read().select("k", "v", "w").as[(Long, String, Option[Long])]
      .collect().toSet ==
      Set((1L, "a2", None), (2L, "b", None), (3L, "c", Some(7L))))
    assert(clone.commits.maxBy(_.version).add.forall(_.base.isEmpty))
    // SQL: DEEP keyword routes to deepCloneTo (own files, no base refs)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-dclone-sql"), 4)
      .withExtensions(new graft.sql.GraftExtensions).getOrCreate()
    val tgt = Files.createTempDirectory("graft_dclone_sql").toString + "/t"
    s.sql(s"CREATE TABLE '$tgt' DEEP CLONE '$srcPath'")
    val sqlClone = LakeTable.load(s, tgt)
    assert(sqlClone.read().count() == 3)
    assert(sqlClone.commits.maxBy(_.version).add.forall(_.base.isEmpty))
  }
}
