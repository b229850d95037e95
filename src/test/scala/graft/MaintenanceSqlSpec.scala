package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Round-4 Delta-parity maintenance SQL: `VACUUM … DRY RUN`,
  * `RESTORE … TO TIMESTAMP AS OF`, partition-scoped `OPTIMIZE … WHERE`,
  * and the path-addressed `table_changes_by_path` TVF. */
class MaintenanceSqlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-maint-test"), 4)
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  test("REORG TABLE APPLY (PURGE) materializes deletion vectors via SQL") {
    val path = Files.createTempDirectory("graft_reorg").toString
    val tbl = LakeTable.create(spark, path, TableSpec("id", "ts"),
      (1L to 100L).map(i => (i, 1L, s"v$i")).toDF("id", "ts", "v"))
    tbl.deleteVectors(org.apache.spark.sql.functions.col("id") <= 10)
    assert(tbl.liveFiles(None).exists(_.dv.isDefined))
    spark.sql(s"REORG TABLE graft.`$path` APPLY (PURGE)")
    val t2 = LakeTable.load(spark, path)
    assert(t2.liveFiles(None).forall(_.dv.isEmpty), "purge must clear every DV")
    assert(t2.read().count() == 90)
    // purged files are self-contained: vacuum away the old ones, still reads
    t2.vacuum(retainVersions = 1)
    assert(LakeTable.load(spark, path).read().count() == 90)
  }

  test("VACUUM DRY RUN lists deletable files without deleting them") {
    val path = Files.createTempDirectory("graft_vac_dry").toString
    val tbl = LakeTable.create(spark, path, TableSpec("id", "ts"),
      (1L to 100L).map(i => (i, 1L, s"v$i")).toDF("id", "ts", "v"))
    tbl.overwrite((1L to 100L).map(i => (i, 2L, s"w$i")).toDF("id", "ts", "v"))
    val dry = spark.sql(s"VACUUM graft.`$path` RETAIN 0 HOURS DRY RUN").collect()
    assert(dry.nonEmpty, "superseded v0 files must be listed")
    assert(dry.forall(_.getString(0).endsWith(".parquet")))
    // nothing deleted: the old version still reads
    assert(LakeTable.load(spark, path).read(Some(0L)).count() == 100)
    // the destructive pass then removes exactly the listed set
    spark.sql(s"VACUUM graft.`$path` RETAIN 0 HOURS")
    val gone = dry.map(_.getString(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(gone.forall(rel =>
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/data/$rel"))))
  }

  test("RESTORE TO TIMESTAMP AS OF resolves like time travel") {
    val path = Files.createTempDirectory("graft_restore_ts").toString
    val tbl = LakeTable.create(spark, path, TableSpec("id", "ts"),
      Seq((1L, 1L, "a")).toDF("id", "ts", "v"))
    val t0 = tbl.commits.find(_.version == 0).get.commitTime
    Thread.sleep(5)
    tbl.upsert(Seq((1L, 2L, "b")).toDF("id", "ts", "v"))
    // an instant just after commit 0 restores the v0 state
    val instant = java.time.LocalDateTime
      .parse(t0, java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS"))
      .plusNanos(1000000).format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    spark.sql(s"RESTORE TABLE graft.`$path` TO TIMESTAMP AS OF '$instant'")
    val v = LakeTable.load(spark, path).read()
      .filter(col("id") === 1L).select("v").as[String].head()
    assert(v == "a", "restore must land on the newest commit at-or-before the instant")
  }

  test("OPTIMIZE WHERE concatenates only the named partition's files") {
    val path = Files.createTempDirectory("graft_opt_where").toString
    val spec = TableSpec("id", "ts", partition = Some("p"))
    val tbl = LakeTable.create(spark, path, spec,
      (1L to 40L).map(i => (i, 1L, if (i % 2 == 0) "a" else "b")).toDF("id", "ts", "p"))
    // several small upserts per partition → many small files
    (1 to 3).foreach { r =>
      tbl.upsert(Seq((100L + r, r.toLong, "a"), (200L + r, r.toLong, "b"))
        .toDF("id", "ts", "p"))
    }
    def filesOf(pv: String): Int =
      LakeTable.load(spark, path).liveFiles(None).count(_.partitionValue.contains(pv))
    val (a0, b0) = (filesOf("a"), filesOf("b"))
    assert(a0 > 1 && b0 > 1)
    spark.sql(s"OPTIMIZE graft.`$path` WHERE p = 'a'")
    assert(filesOf("a") < a0, "partition a must be concatenated")
    assert(filesOf("b") == b0, "partition b must be untouched")
    // rows intact
    assert(LakeTable.load(spark, path).read().count() == 46)
    // unpartitioned-table and non-partition-column predicates are rejected
    val err = intercept[Exception] {
      spark.sql(s"OPTIMIZE graft.`$path` WHERE id = 3")
    }
    assert(err.getMessage.contains("partition column"))
  }

  test("SET TBLPROPERTIES turns auto-compaction on for an existing table") {
    val path = Files.createTempDirectory("graft_props").toString
    val tbl = LakeTable.create(spark, path, TableSpec("id", "ts"),
      (1L to 50L).map(i => (i, 1L, s"v$i")).toDF("id", "ts", "v"))
    spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES('autoCompactFiles' = '4')")
    assert(LakeTable.load(spark, path).spec.autoCompactFiles == 4)
    (1 to 8).foreach { r =>
      LakeTable.load(spark, path)
        .upsert(Seq((1000L + r, r.toLong, s"n$r")).toDF("id", "ts", "v"))
    }
    assert(LakeTable.load(spark, path).liveFiles(None).size <= 4,
      "the altered policy must bound the file count")
    // identity properties and typos are rejected loudly
    val err1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES('buckets' = '8')")
    }
    assert(err1.getMessage.contains("identity"))
    val err2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES('autoCompactFile' = '4')")
    }
    assert(err2.getMessage.contains("unknown"))
  }

  test("table_changes_by_path addresses the table by location") {
    val path = Files.createTempDirectory("graft_tvf_path").toString
    val tbl = LakeTable.create(spark, path, TableSpec("id", "ts"),
      Seq((1, 10, 100L)).toDF("id", "v", "ts"))
    tbl.upsert(Seq((2, 20, 200L)).toDF("id", "v", "ts"))
    val got = spark.sql(
      s"SELECT id, _change_type FROM table_changes_by_path('$path', 0)")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((2, "insert")))
  }

  test("GENERATE symlink_format_manifest lists the exact snapshot, per partition") {
    val path = Files.createTempDirectory("graft_manifest").toString
    val tbl = LakeTable.create(spark, path,
      TableSpec("id", "ts", partition = Some("p")),
      (1L to 100L).map(i => (i, 1L, s"v$i", s"part${i % 3}")).toDF("id", "ts", "v", "p"))
    val parts = spark.sql(
      s"GENERATE symlink_format_manifest FOR TABLE graft.`$path`")
      .collect().map(_.getString(0)).sorted
    assert(parts.toSeq == Seq("p=part0", "p=part1", "p=part2"))
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val listed = parts.flatMap { rel =>
      val in = fs.open(new org.apache.hadoop.fs.Path(
        s"$path/_symlink_format_manifest/$rel/manifest"))
      val body = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      body.split("\n").filter(_.nonEmpty)
    }
    // the manifest IS the snapshot: reading the listed paths matches read()
    assert(listed.nonEmpty)
    val viaManifest = spark.read.parquet(listed.toIndexedSeq: _*).count()
    assert(viaManifest == tbl.read().count())
    // regenerate after churn: the manifests track the NEW snapshot (the
    // touched partition's rewritten file replaces the stale path)
    tbl.upsert(Seq((1L, 2L, "v1b", "part1")).toDF("id", "ts", "v", "p"))
    spark.sql(s"GENERATE symlink_format_manifest FOR TABLE graft.`$path`")
    val relisted = parts.flatMap { rel =>
      val in2 = fs.open(new org.apache.hadoop.fs.Path(
        s"$path/_symlink_format_manifest/$rel/manifest"))
      val body2 = new String(
        org.apache.commons.io.IOUtils.toByteArray(in2), "UTF-8")
      in2.close()
      body2.split("\n").filter(_.nonEmpty)
    }
    val after = spark.read.parquet(relisted.toIndexedSeq: _*)
    assert(after.count() == 100)
    assert(after.filter(col("id") === 1L).select("v").as[String].head() == "v1b")
    // a DV'd snapshot refuses (a path list cannot express row-level deletes)
    tbl.deleteVectors(col("id") === 50L)
    val err = intercept[IllegalArgumentException] {
      tbl.generateManifest()
    }
    assert(err.getMessage.contains("deletion vectors"))
  }

  test("COPY INTO loads each file exactly once, PATTERN filters, rerun is a no-op") {
    val path = Files.createTempDirectory("graft_copy_tbl").toString
    val land = Files.createTempDirectory("graft_copy_land").toString
    val tbl = LakeTable.create(spark, path, TableSpec("id", "ts"),
      Seq((0L, 0L, "seed")).toDF("id", "ts", "v"))
    (1L to 50L).map(i => (i, 1L, s"a$i")).toDF("id", "ts", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/batch1")
    (51L to 80L).map(i => (i, 1L, s"b$i")).toDF("id", "ts", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/batch2")
    val first = spark.sql(s"COPY INTO graft.`$path` FROM '$land'").collect()
    assert(first.length == 2, s"both landing files load: ${first.toSeq}")
    assert(LakeTable.load(spark, path).read().count() == 81)
    // rerun: nothing new, nothing committed
    val vBefore = tbl.latestVersion
    assert(spark.sql(s"COPY INTO graft.`$path` FROM '$land'").collect().isEmpty)
    assert(tbl.latestVersion == vBefore)
    // a new file is picked up alone; PATTERN scopes the listing
    (81L to 90L).map(i => (i, 1L, s"c$i")).toDF("id", "ts", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/batch3")
    val third = spark.sql(
      s"COPY INTO graft.`$path` FROM '$land' FILEFORMAT = PARQUET " +
        "PATTERN = 'batch3/*.parquet'").collect()
    assert(third.length == 1 && third.head.getString(0).contains("batch3"))
    assert(LakeTable.load(spark, path).read().count() == 91)
    // extra source columns drop; rows with already-present keys latest-win
    Seq((1L, 9L, "upd", "extra")).toDF("id", "ts", "v", "junk")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/batch4")
    spark.sql(s"COPY INTO graft.`$path` FROM '$land'")
    val t2 = LakeTable.load(spark, path)
    assert(t2.read().count() == 91)
    assert(t2.read().filter(col("id") === 1L).select("v").as[String].head() == "upd")
  }
}
