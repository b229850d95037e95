package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Auto-maintenance policy (Delta auto-OPTIMIZE analog): a stream of small
  * upserts must not accrete unbounded file counts — the post-commit
  * trigger compacts when the live-file (or MoR log) count crosses the
  * TableSpec threshold, without anyone calling compact()/optimize(). */
class AutoCompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("N small CoW upserts leave a bounded live-file count without explicit compact") {
    val path = Files.createTempDirectory("graft_autoc_cow").toString
    val tbl = LakeTable.create(spark, path,
      TableSpec("id", "ts", autoCompactFiles = 6),
      (1L to 100L).map(i => (i, 1L, s"v$i")).toDF("id", "ts", "v"))
    (1 to 12).foreach { r =>
      tbl.upsert(Seq((1000L + r, r.toLong, s"new$r")).toDF("id", "ts", "v"))
    }
    val live = LakeTable.load(spark, path).liveFiles(None)
    assert(live.size <= 6,
      s"auto-compaction must bound the file count, got ${live.size}")
    // no rows lost or duplicated across the folds
    val got = tbl.read().select("id").as[Long].collect().sorted
    assert(got.toSeq == ((1L to 100L) ++ (1001L to 1012L)))
    // the maintenance commits are the table's own (OCC-committed) history
    assert(tbl.commits.exists(c =>
      c.operation == "optimize" || c.operation == "compact"))
  }

  test("MoR log accumulation is bounded by autoCompactLogs") {
    val path = Files.createTempDirectory("graft_autoc_mor").toString
    val tbl = LakeTable.create(spark, path,
      TableSpec("id", "ts", mor = true, autoCompactLogs = 3),
      (1L to 50L).map(i => (i, 1L, s"v$i")).toDF("id", "ts", "v"))
    (1 to 10).foreach { r =>
      tbl.upsert(Seq((1L, 100L + r, s"u$r")).toDF("id", "ts", "v"))
    }
    val logs = LakeTable.load(spark, path).liveFiles(None).count(_.log)
    assert(logs <= 3, s"auto-compaction must bound outstanding logs, got $logs")
    // latest-wins state preserved through the automatic folds
    val v = tbl.realtime().filter(col("id") === 1L).select("v").as[String].head()
    assert(v == "u10")
  }

  test("auto-compaction is OCC-safe under concurrent writers") {
    val path = Files.createTempDirectory("graft_autoc_occ").toString
    LakeTable.create(spark, path,
      TableSpec("id", "ts", autoCompactFiles = 4),
      (1L to 20L).map(i => (i, 1L, s"v$i")).toDF("id", "ts", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val futures = (1 to 3).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val t = LakeTable.load(spark, path)
            (1 to 4).foreach { r =>
              t.upsert(Seq((1000L * w + r, r.toLong, s"w${w}r$r"))
                .toDF("id", "ts", "v"))
            }
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val t = LakeTable.load(spark, path)
    val ids = t.read().select("id").as[Long].collect().sorted
    assert(ids.toSeq == ((1L to 20L) ++
      (1 to 3).flatMap(w => (1 to 4).map(r => 1000L * w + r)).sorted))
    assert(t.liveFiles(None).size <= 8,
      s"file count must stay bounded under concurrency, got ${t.liveFiles(None).size}")
  }
}
