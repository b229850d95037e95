package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Edge cases around empty inputs and degenerate tables. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft_edge").toString

  test("empty upsert commits a no-op version and changes nothing") {
    val t = LakeTable.create(spark, tmp(), TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq.empty[(Int, Long, String)].toDF("k", "pc", "v"))
    assert(t.latestVersion == 1)
    assert(t.read().count() == 1)
    assert(t.commits.last.add.isEmpty && t.commits.last.remove.isEmpty)
  }

  test("empty MoR upsert and matching-nothing delete are no-ops") {
    val t = LakeTable.create(spark, tmp(), TableSpec("k", "pc", mor = true),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))
    t.upsert(Seq.empty[(Int, Long, String)].toDF("k", "pc", "v"))
    t.delete(col("k") === 999)
    assert(t.realtime().count() == 2)
    assert(t.readOptimized().count() == 2)
  }

  test("empty table created from an empty frame reads as empty with schema") {
    val t = LakeTable.create(spark, tmp(), TableSpec("k", "pc"),
      Seq.empty[(Int, Long, String)].toDF("k", "pc", "v"))
    val df = t.read()
    assert(df.count() == 0)
    assert(df.columns.contains("v") && df.columns.contains("_commit_time"))
    t.upsert(Seq((1, 1L, "x")).toDF("k", "pc", "v"))
    assert(t.read().count() == 1)
  }

  test("single-row lifecycle: create, upsert, delete, compact, vacuum") {
    val t = LakeTable.create(spark, tmp(), TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq((1, 2L, "a2")).toDF("k", "pc", "v"))
      .delete(col("v") === "never")
      .compact()
      .vacuum(retainVersions = 1)
    val r = t.read().select("k", "v").head()
    assert((r.getInt(0), r.getString(1)) == ((1, "a2")))
  }

  test("time travel to a vacuumed version fails at scan, not silently") {
    val t = LakeTable.create(spark, tmp(), TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq((1, 2L, "a2")).toDF("k", "pc", "v"))
    t.vacuum(retainVersions = 1)
    // version-0 file was rewritten at v1 and vacuumed away
    val e = intercept[Exception] { t.read(Some(0)).count() }
    assert(e.getMessage != null)
  }
}
