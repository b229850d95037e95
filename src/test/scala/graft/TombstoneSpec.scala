package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** MoR tombstone-log deletes (deletion-vector analog): a keyed delete
  * writes tombstone log rows instead of folding logs + rewriting files —
  * O(deleted keys) — and `_rt` filters them at read; compaction folds them.
  */
class TombstoneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def mor(tag: String): LakeTable = {
    val path = Files.createTempDirectory(s"graft_tomb_$tag").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc", mor = true),
      Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")).toDF("k", "pc", "v"))
    t.upsert(Seq((1L, 2L, "a2"), (4L, 1L, "d")).toDF("k", "pc", "v")) // k1→log, k4→base
    t
  }

  def keys(t: LakeTable): Set[Long] =
    t.read().select("k").as[Long].collect().toSet

  test("MoR keyed delete writes a tombstone, rewrites nothing") {
    val t = mor("basic")
    val filesBefore = t.commits.flatMap(_.add).map(_.path).toSet
    t.deleteKeys(Seq(1L, 3L).toDF("k"))
    val last = t.commits.maxBy(_.version)
    assert(last.remove.isEmpty, "tombstone delete must not remove files")
    assert(last.add.nonEmpty && last.add.forall(a => a.log && a.tombstone))
    assert(keys(t) == Set(2L, 4L), "_rt hides tombstoned keys")
    // _ro is stale (still shows the base rows) — ordinary MoR staleness
    assert(t.readOptimized().select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    assert(t.commits.flatMap(_.add).map(_.path).toSet
      .intersect(filesBefore) == filesBefore, "no base/log file rewritten")
  }

  test("delete then reinsert: a newer upsert revives the key") {
    val t = mor("revive")
    t.deleteKeys(Seq(1L).toDF("k"))
    assert(keys(t) == Set(2L, 3L, 4L))
    // reinsert with LOWER precombine than the dead row: the tombstone must
    // not let the old (pc=2) row win — write-id order decides
    t.upsert(Seq((1L, 0L, "a-back")).toDF("k", "pc", "v"))
    assert(keys(t) == Set(1L, 2L, 3L, 4L))
    assert(t.read().filter("k = 1").select("v").as[String].head() == "a-back")
  }

  test("compact folds tombstones away and _ro catches up") {
    val t = mor("fold")
    t.deleteKeys(Seq(1L, 4L).toDF("k"))
    t.compact()
    assert(keys(t) == Set(2L, 3L))
    assert(t.readOptimized().select("k").as[Long].collect().toSet == Set(2L, 3L))
    assert(!t.commits.maxBy(_.version).add.exists(_.tombstone))
    // tombstone files were de-referenced by the compacting commit
    assert(t.read().count() == 2)
  }

  test("changes() tags a tombstoned key as delete; incremental suppresses it") {
    val t = mor("cdf")
    val v = t.latestVersion
    t.deleteKeys(Seq(1L).toDF("k"))
    val ch = t.changes(v).select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((1L, "delete")), s"got $ch")
    // k=1's v-window post-image (the log update) is dead — incremental
    // over the widened window must not resurrect it
    assert(!t.incremental(0).select("k").as[Long].collect().contains(1L))
  }

  test("partitioned MoR: tombstone identity is (key, partition)") {
    val path = Files.createTempDirectory("graft_tomb_part").toString
    val t = LakeTable.create(spark, path,
      TableSpec("k", "pc", partition = Some("p"), mor = true),
      Seq((1L, 1L, "us", "a"), (1L, 1L, "eu", "b"), (2L, 1L, "us", "c"))
        .toDF("k", "pc", "p", "v"))
    t.upsert(Seq((1L, 2L, "us", "a2")).toDF("k", "pc", "p", "v"))
    t.deleteKeys(Seq((1L, "us")).toDF("k", "p"))
    val got = t.read().select("k", "p").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "eu"), (2L, "us")), "(1,us) dead, (1,eu) alive")
  }
}
