package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

case class Rec(k: Int, pc: Long, payload: String)

/** Property-style invariants (SURVEY.md §5.2(3)) over randomized batches:
  * upsert idempotence, batch-split equivalence, compact preserving `_rt`,
  * version monotonicity. Seeded scala.util.Random keeps runs reproducible;
  * precombine values are globally unique per key+row so batch splits cannot
  * hit incoming-wins-tie ambiguity.
  */
class LakePropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def genBatch(rnd: scala.util.Random, n: Int, keySpace: Int, pcBase: Long): Seq[Rec] =
    (0 until n).map { i =>
      Rec(rnd.nextInt(keySpace), pcBase + rnd.nextInt(1000000), s"v${rnd.nextInt(1000)}")
    }

  def df(rows: Seq[Rec]): DataFrame = rows.toDF()

  def tmp(): String = Files.createTempDirectory("graft_prop").toString

  def state(t: LakeTable): Set[(Int, Long, String)] =
    t.read().select("k", "pc", "payload").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet

  def specCow = TableSpec("k", "pc")

  test("upsert is idempotent (upsert(b); upsert(b) ≡ upsert(b))") {
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(100 + trial)
      val base = genBatch(rnd, 50, 20, 0)
      val b = genBatch(rnd, 30, 20, 2000000)
      val t1 = LakeTable.create(spark, tmp(), specCow, df(base)); t1.upsert(df(b))
      val t2 = LakeTable.create(spark, tmp(), specCow, df(base)); t2.upsert(df(b)); t2.upsert(df(b))
      assert(state(t1) == state(t2), s"trial $trial")
    }
  }

  test("general merge (unconditional UPDATE */INSERT *) ≡ plain upsert on random batches") {
    import graft.sql.GraftMerge
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(400 + trial)
      val base = genBatch(rnd, 50, 20, 0)
      val b = genBatch(rnd, 30, 30, 2000000) // hits existing + new keys
      val t1 = LakeTable.create(spark, tmp(), specCow, df(base)); t1.upsert(df(b))
      val t2 = LakeTable.create(spark, tmp(), specCow, df(base))
      val src = df(b)
      val tgt = t2.read()
      GraftMerge.execute(t2, src, tgt, src("k") === tgt("k"),
        matched = Seq(GraftMerge.UpdateAll(None)),
        notMatched = Seq(GraftMerge.InsertAll(None)))
      assert(state(t1) == state(t2), s"trial $trial")
    }
  }

  test("update-only merge with a partial-column source leaves unmatched rows alone") {
    import graft.sql.GraftMerge
    val t = LakeTable.create(spark, tmp(), specCow,
      df(Seq(Rec(1, 1L, "a"), Rec(2, 1L, "b"))))
    val src = Seq((1, "A")).toDF("k", "newp") // no pc/payload columns
    val tgt = t.read()
    GraftMerge.execute(t, src, tgt, src("k") === tgt("k"),
      matched = Seq(GraftMerge.UpdateSet(None, Seq("payload" -> src("newp")))),
      notMatched = Seq.empty)
    assert(state(t) == Set((1, 1L, "A"), (2, 1L, "b")))
  }

  test("upsert(b1 ++ b2) ≡ upsert(b1); upsert(b2) when precombine is totally ordered") {
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(200 + trial)
      val base = genBatch(rnd, 50, 15, 0)
      // strictly distinct precombines across b1/b2 → no cross-batch ties
      val all = genBatch(rnd, 40, 15, 3000000).zipWithIndex
        .map { case (r, i) => r.copy(pc = 3000000L + i * 2) }
      val (b1, b2) = all.splitAt(20)
      val t1 = LakeTable.create(spark, tmp(), specCow, df(base)); t1.upsert(df(all.map(identity)))
      val t2 = LakeTable.create(spark, tmp(), specCow, df(base)); t2.upsert(df(b1)); t2.upsert(df(b2))
      assert(state(t1) == state(t2), s"trial $trial")
    }
  }

  test("MoR: compact() preserves realtime contents and converges _ro") {
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(300 + trial)
      val t = LakeTable.create(spark, tmp(), specCow.copy(mor = true),
        df(genBatch(rnd, 50, 20, 0)))
      t.upsert(df(genBatch(rnd, 30, 25, 1000000)))
      t.upsert(df(genBatch(rnd, 30, 30, 2000000)))
      val before = state(t)
      t.compact()
      assert(state(t) == before, s"trial $trial: compact changed realtime contents")
      val ro = t.readOptimized().select("k", "pc", "payload").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      assert(ro == before, s"trial $trial: _ro ≠ _rt after compact")
    }
  }

  test("versions increase by one per commit and time travel sees every state") {
    val rnd = new scala.util.Random(42)
    val t = LakeTable.create(spark, tmp(), specCow, df(genBatch(rnd, 20, 10, 0)))
    assert(t.latestVersion == 0)
    val s0 = state(t)
    t.upsert(df(genBatch(rnd, 10, 12, 1000000)))
    assert(t.latestVersion == 1)
    val s1 = state(t)
    t.upsert(df(genBatch(rnd, 10, 14, 2000000)))
    assert(t.latestVersion == 2)
    assert(t.read(Some(0)).count() == s0.size)
    assert(t.read(Some(1)).count() == s1.size)
    val tt0 = t.read(Some(0)).select("k", "pc", "payload").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(tt0 == s0)
  }

  test("MoR upserts never touch existing base files (no removes until compact)") {
    val rnd = new scala.util.Random(7)
    val t = LakeTable.create(spark, tmp(), specCow.copy(mor = true),
      df(genBatch(rnd, 40, 20, 0)))
    t.upsert(df(genBatch(rnd, 20, 22, 1000000)))
    t.upsert(df(genBatch(rnd, 20, 24, 2000000)))
    val removes = t.commits.filter(_.operation == "upsert").flatMap(_.remove)
    assert(removes.isEmpty, "MoR upsert must be append-only")
    val hasLogs = t.commits.flatMap(_.add).exists(_.log)
    assert(hasLogs, "updates should have produced log files")
  }

  test("bucket-pruned point lookups equal unpruned reads on random keys") {
    import org.apache.spark.sql.sources.{EqualTo, In}
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(900 + trial)
      val base = genBatch(rnd, 400, 120, 0)
      val t = LakeTable.create(spark, tmp(),
        TableSpec("k", "pc", buckets = 8), df(base))
      t.upsert(df(genBatch(rnd, 60, 120, 2000000)))
      val full = state(t)
      (1 to 10).foreach { _ =>
        val probe = rnd.nextInt(150) // includes absent keys
        val got = t.readWhere(Seq(EqualTo("k", probe)))
          .filter(org.apache.spark.sql.functions.col("k") === probe)
          .select("k", "pc", "payload").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
        assert(got == full.filter(_._1 == probe), s"trial $trial key $probe")
      }
      val ks = Array.fill(5)(rnd.nextInt(150))
      val gotIn = t.readWhere(Seq(In("k", ks.map(_.asInstanceOf[Any]))))
        .filter(org.apache.spark.sql.functions.col("k").isin(ks.toIndexedSeq: _*))
        .select("k", "pc", "payload").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      assert(gotIn == full.filter(r => ks.contains(r._1)), s"trial $trial IN")
    }
  }
}
