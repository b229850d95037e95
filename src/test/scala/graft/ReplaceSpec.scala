package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** replaceWhere / dynamic partition overwrite: scoped atomic replacement
  * (Delta `replaceWhere`, Spark `partitionOverwriteMode=dynamic`).
  */
class ReplaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def rows(t: LakeTable): Set[(Long, String, String)] =
    t.read().select("k", "part", "v").as[(Long, String, String)].collect().toSet

  def mkTable(tag: String, partitioned: Boolean): LakeTable = {
    val path = Files.createTempDirectory(s"graft_rw_$tag").toString
    val df = Seq(
      (1L, 1L, "us", "a"), (2L, 1L, "us", "b"),
      (3L, 1L, "eu", "c"), (4L, 1L, "eu", "d"))
      .toDF("k", "ts", "part", "v")
    LakeTable.create(spark, path,
      TableSpec("k", "ts", partition = if (partitioned) Some("part") else None), df)
  }

  test("overwritePartitions swaps exactly the incoming partitions") {
    val t = mkTable("dpo", partitioned = true)
    val v0 = t.latestVersion
    // replace the us partition with a single new row; eu untouched
    t.overwritePartitions(Seq((9L, 2L, "us", "z")).toDF("k", "ts", "part", "v"))
    assert(rows(t) == Set((9L, "us", "z"), (3L, "eu", "c"), (4L, "eu", "d")),
      "us fully replaced (old us rows gone), eu intact")
    assert(t.latestVersion == v0 + 1, "one atomic commit")
    // the commit's removes are only us files — metadata-selected
    val removed = t.commits.last.remove
    assert(removed.nonEmpty && removed.forall(_.contains("part=us")),
      s"only us files removed, got $removed")
    assert(t.partitionValues == Seq("eu", "us"))
  }

  test("overwriteWhere swaps a row-level predicate range atomically") {
    val t = mkTable("rw", partitioned = false)
    val v0 = t.latestVersion
    // replace k<=2 with one row: k=2 absent from the frame must vanish
    t.overwriteWhere(Seq((1L, 2L, "us", "a2")).toDF("k", "ts", "part", "v"),
      col("k") <= 2)
    assert(rows(t) == Set((1L, "us", "a2"), (3L, "eu", "c"), (4L, "eu", "d")))
    assert(t.latestVersion == v0 + 1, "one atomic commit")
  }

  test("overwriteWhere rejects rows outside the predicate") {
    val t = mkTable("rwbad", partitioned = false)
    val e = intercept[IllegalArgumentException] {
      t.overwriteWhere(Seq((7L, 2L, "us", "x")).toDF("k", "ts", "part", "v"),
        col("k") <= 2)
    }
    assert(e.getMessage.contains("predicate"))
  }

  test("writer options replaceWhere and partitionOverwriteMode route correctly") {
    val t = mkTable("opts", partitioned = true)
    Seq((5L, 2L, "eu", "e2")).toDF("k", "ts", "part", "v")
      .write.format("graft")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").save(t.path)
    assert(rows(t) == Set((1L, "us", "a"), (2L, "us", "b"), (5L, "eu", "e2")))
    Seq((2L, 3L, "us", "b3")).toDF("k", "ts", "part", "v")
      .write.format("graft")
      .option("replaceWhere", "k = 2")
      .mode("overwrite").save(t.path)
    assert(rows(t) == Set((1L, "us", "a"), (2L, "us", "b3"), (5L, "eu", "e2")))
  }

  test("overwritePartitions folds a replaced partition's MoR logs away") {
    val path = Files.createTempDirectory("graft_rw_mor").toString
    val t = LakeTable.create(spark, path,
      TableSpec("k", "ts", partition = Some("part"), mor = true),
      Seq((1L, 1L, "us", "a"), (3L, 1L, "eu", "c")).toDF("k", "ts", "part", "v"))
    t.upsert(Seq((1L, 2L, "us", "a2")).toDF("k", "ts", "part", "v")) // us log file
    t.overwritePartitions(Seq((9L, 3L, "us", "z")).toDF("k", "ts", "part", "v"))
    assert(rows(t) == Set((9L, "us", "z"), (3L, "eu", "c")),
      "replaced partition's log rows must not resurface")
  }
}
