package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Commit-log table statistics feeding Catalyst's join planner: a small
  * lake table must report its true on-disk size (not "assume huge") so the
  * optimizer auto-broadcasts it — no `broadcast()` hint — on both the
  * path-based `format("graft")` relation and the DSv2 catalog scan.
  */
class TableStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def mkSmall(tag: String): LakeTable = {
    val path = Files.createTempDirectory(s"graft_stats_$tag").toString
    val dim = (1L to 50L).map(i => (i, 1L, s"name_$i")).toDF("k", "ts", "name")
    LakeTable.create(spark, path, TableSpec("k", "ts"), dim)
  }

  private def hasBroadcastJoin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty

  /** Run `body` with AQE off so the broadcast decision is provably driven
    * by the STATIC commit-log stats, not an AQE runtime-size rescue. */
  private def withStaticPlanner[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("write paths record per-file byte sizes in the commit log") {
    val t = mkSmall("bytes")
    val adds = t.commits.flatMap(_.add)
    assert(adds.nonEmpty && adds.forall(_.bytes > 0), "every add carries its file length")
    val expected = adds.map(_.bytes).sum
    assert(t.sizeBytes() == expected)
    // upserts keep the stat current
    t.upsert(Seq((1L, 2L, "renamed")).toDF("k", "ts", "name"))
    assert(t.sizeBytes() > 0)
    assert(t.commits.flatMap(_.add).forall(_.bytes > 0))
  }

  test("small lake table auto-broadcasts in a join (V1 relation)") {
    val t = mkSmall("bcast_v1")
    val dim = spark.read.format("graft").load(t.path).select("k", "name")
    // the logical plan must carry the true (small) size, not "assume huge"
    val stat = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stat < 10L * 1024 * 1024,
      s"relation stats must reflect on-disk size, got $stat")
    withStaticPlanner {
      val fact = (1L to 20000L).map(i => (i % 50 + 1, i)).toDF("k", "v")
      val joined = fact.join(dim, "k")
      assert(hasBroadcastJoin(joined),
        s"expected BroadcastHashJoin, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 20000L)
    }
  }

  test("small catalog table auto-broadcasts in a SQL join (DSv2 scan)") {
    val t = mkSmall("bcast_v2")
    val cat = "graft_stats_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      Files.createTempDirectory("graft_stats_wh").toString)
    try {
      spark.sql(s"CREATE TABLE $cat.default.stats_dim USING graft LOCATION '${t.path}'")
      (1L to 20000L).map(i => (i % 50 + 1, i)).toDF("k", "v")
        .createOrReplaceTempView("stats_fact")
      withStaticPlanner {
        val joined = spark.sql(
          s"SELECT f.k, f.v, d.name FROM stats_fact f JOIN $cat.default.stats_dim d ON f.k = d.k")
        assert(hasBroadcastJoin(joined),
          s"expected BroadcastHashJoin, got:\n${joined.queryExecution.executedPlan}")
        assert(joined.count() == 20000L)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $cat.default.stats_dim")
      spark.sql("DROP VIEW IF EXISTS stats_fact")
    }
  }

  test("DV'd files discount killed rows from the size estimate") {
    val t = mkSmall("dv_discount")
    val before = t.sizeBytes()
    t.deleteVectors(col("k") <= 25L)
    val after = t.sizeBytes()
    assert(after < before, s"DV delete must shrink the size estimate ($before -> $after)")
    assert(after > 0)
  }
}
