package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Delta-parity `FSCK REPAIR TABLE`: when storage loses a data file (or a
  * deletion-vector sidecar), repair drops exactly the dead references so
  * the table reads again with the surviving rows. */
class FsckSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_fsck").toString

  private def seed = (1L to 100L).map(i => (i, 1L, s"v$i", i % 8)).toDF("k", "ver", "v", "g")

  /** Physically delete one live parquet file, returning its rel path. */
  private def loseOne(t: LakeTable): String = {
    val victim = t.liveFiles(None).map(_.path).sorted.head
    val p = new Path(s"${t.path}/data/$victim")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    victim
  }

  test("repair drops exactly the missing file; reads recover the survivors") {
    val path = tmp()
    // partitioned so each partition is its own file — a lost file is a
    // known row subset
    val t = LakeTable.create(spark, path,
      TableSpec("k", "ver", partition = Some("g")), seed)
    val lost = loseOne(t)
    intercept[Exception] { t.read().count() } // the broken state fails loudly
    val dry = LakeTable.load(spark, path).repair(dryRun = true)
    assert(dry == Seq(lost))
    intercept[Exception] { LakeTable.load(spark, path).read().count() } // dry run fixed nothing
    val dropped = LakeTable.load(spark, path).repair()
    assert(dropped == Seq(lost))
    val out = LakeTable.load(spark, path).read()
    val lostPart = lost.split("/").find(_.startsWith("g=")).get.stripPrefix("g=").toLong
    assert(out.count() == seed.filter(col("g") =!= lostPart).count())
    assert(out.filter(col("g") === lostPart).isEmpty)
    // idempotent: a second repair finds nothing
    assert(LakeTable.load(spark, path).repair().isEmpty)
  }

  test("a file whose DV sidecar is lost is dropped too (no resurrection)") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "ver"),
      seed.drop("g"))
    t.deleteVectors(col("k") <= 10)
    val withDv = LakeTable.load(spark, path)
    val dvDir = withDv.liveFiles(None).flatMap(_.dv).head
    val p = new Path(s"$path/data/$dvDir")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val dropped = LakeTable.load(spark, path).repair()
    assert(dropped.nonEmpty, "the DV-orphaned file must be dropped")
    val out = LakeTable.load(spark, path).read()
    assert(out.filter(col("k") <= 10).isEmpty,
      "deleted rows must never resurrect through a lost DV")
  }

  test("SQL: FSCK REPAIR TABLE (and DRY RUN) through the parser") {
    val s = MaintenanceSqlSessions.sql
    import s.implicits._
    val path = tmp()
    val t = LakeTable.create(s, path, TableSpec("k", "ver", partition = Some("g")),
      (1L to 40L).map(i => (i, 1L, s"v$i", i % 4)).toDF("k", "ver", "v", "g"))
    val lost = loseOne(t)
    val dryRows = s.sql(s"FSCK REPAIR TABLE graft.`$path` DRY RUN").collect()
    assert(dryRows.map(_.getString(0)).toSeq == Seq(lost))
    val rows = s.sql(s"FSCK REPAIR TABLE graft.`$path`").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq(lost))
    assert(LakeTable.load(s, path).read().count() == 30)
  }
}
