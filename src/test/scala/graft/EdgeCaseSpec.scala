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

  test("a table path containing '/data/' keeps consistent relative paths") {
    val base = Files.createTempDirectory("graft_data_seg")
    val path = base.resolve("data").resolve("t1").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))
    assert(t.read().count() == 2)
    t.upsert(Seq((2, 2L, "b2"), (3, 1L, "c")).toDF("k", "pc", "v"))
    val rows = t.read().select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "a"), (2, "b2"), (3, "c")))
    t.vacuum(retainVersions = 1)
    assert(t.read().count() == 3, "vacuum must not delete live files")
  }

  test("null record keys in a batch fail loudly instead of collapsing") {
    val t = LakeTable.create(spark, tmp(), TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    val bad = Seq((Option(2), 1L, "b"), (Option.empty[Int], 1L, "x"),
      (Option.empty[Int], 2L, "y")).toDF("k", "pc", "v")
    val e = intercept[Exception] { t.upsert(bad) }
    assert(e.getMessage.contains("null record key")
      || Option(e.getCause).exists(_.getMessage.contains("null record key")))
  }

  test("partition-value change behaves as a new record on every path (non-global identity)") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc", partition = Some("p")),
      Seq((1, 1L, "eu", "a"), (2, 1L, "eu", "b")).toDF("k", "pc", "p", "v"))
    t.upsert(Seq((1, 2L, "us", "a2")).toDF("k", "pc", "p", "v"))
    def st = t.read().select("k", "p", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    val expected = Set((1, "eu", "a"), (1, "us", "a2"), (2, "eu", "b"))
    assert(st == expected, "the old-partition row stays (Hudi non-global index)")
    t.compact()
    assert(st == expected, "compact must not collapse cross-partition records")
    val e = intercept[IllegalArgumentException] {
      t.update(col("k") === 1, Map("p" -> lit("apac")))
    }
    assert(e.getMessage.contains("partition column"))
  }

  test("null partition values are upsert-reachable (hive default partition)") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc", partition = Some("p")),
      Seq((1, 1L, Option("eu"), "a"), (2, 1L, Option.empty[String], "b"))
        .toDF("k", "pc", "p", "v"))
    t.upsert(Seq((2, 2L, Option.empty[String], "b2")).toDF("k", "pc", "p", "v"))
    val rows = t.read().select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "a"), (2, "b2")),
      "the null-partition row must be found and updated, not duplicated")
  }

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
