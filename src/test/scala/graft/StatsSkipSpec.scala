package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** File-level data skipping on non-key columns (Delta data-skipping
  * analog): per-file (min, max) from footers for `statsColumns`, filter →
  * file pruning from commit-log metadata at read time.
  */
class StatsSkipSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def mk(tag: String): LakeTable = {
    val path = Files.createTempDirectory(s"graft_skip_$tag").toString
    // 4 files range-clustered on value: disjoint per-file value ranges
    val df = (1L to 400L).map(i => (i, 1L, i * 10)).toDF("k", "ts", "value")
      .repartitionByRange(4, col("value"))
    LakeTable.create(spark, path,
      TableSpec("k", "ts", statsColumns = Seq("value")), df, bulkInsert = true)
  }

  def filesOf(df: org.apache.spark.sql.DataFrame): Long =
    df.select(input_file_name()).distinct().count()

  test("colStats are collected and a value filter prunes files") {
    val t = mk("prune")
    val live = t.commits.flatMap(_.add)
    assert(live.size == 4, s"expected 4 files, got ${live.size}")
    assert(live.forall(_.colStats.contains("value")), "per-file value stats recorded")

    // point lookup on value: exactly one file can hold it
    val point = t.readWhere(Seq(EqualTo("value", 1500L)))
    assert(filesOf(point) == 1, "EqualTo must prune to one file")
    assert(point.count() == 100, "pruned read returns the whole matching file")
    assert(point.filter("value = 1500").count() == 1)

    // range filter: only the top file(s)
    val top = t.readWhere(Seq(GreaterThan("value", 3900L)))
    assert(filesOf(top) == 1, "GreaterThan near max must prune to one file")
    assert(top.filter("value > 3900").count() == 10)

    // a filter nothing matches: zero files planned
    assert(t.readWhere(Seq(GreaterThan("value", 99999L))).isEmpty)
    // unknown filter shapes keep everything (conservative)
    assert(filesOf(t.readWhere(Seq(LessThan("nonexistent_col", 1L)))) == 4)
  }

  test("format(\"graft\") reads push filters into file skipping") {
    val t = mk("relation")
    val df = spark.read.format("graft").load(t.path).filter(col("value") === 1500L)
    assert(df.count() == 1)
    // the planned scan read one file, not four
    val planned = spark.read.format("graft").load(t.path)
      .filter(col("value") === 1500L).select(input_file_name()).distinct().count()
    assert(planned == 1, "relation scan must plan only the covering file")
  }

  test("skipping answers stay correct vs the unpruned read") {
    val t = mk("correct")
    val full = t.read().filter("value > 1200 AND value <= 2600").select("k")
      .as[Long].collect().toSet
    val pruned = t.readWhere(Seq(GreaterThan("value", 1200L)))
      .filter("value > 1200 AND value <= 2600").select("k").as[Long].collect().toSet
    assert(pruned == full)
  }

  test("writer option statsColumns persists into the spec") {
    val path = Files.createTempDirectory("graft_skip_opt").toString
    (1L to 10L).map(i => (i, 1L, s"s$i")).toDF("k", "ts", "name")
      .write.format("graft").option("key", "k").option("precombine", "ts")
      .option("statsColumns", "name").mode("overwrite").save(path)
    val t = LakeTable.load(spark, path)
    assert(t.spec.statsColumns == Seq("name"))
    assert(t.commits.flatMap(_.add).forall(_.colStats.contains("name")))
    // ASCII string skipping works too
    assert(t.readWhere(Seq(EqualTo("name", "s3"))).filter("name = 's3'").count() == 1)
  }
}
