package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, MaterializedView, MvAgg, TableSpec}
import graft.lake.MaterializedView.MvJoin

/** Incremental materialized-view maintenance: after ANY sequence of base
  * mutations, `refresh()` must equal a from-scratch aggregate over the
  * final base state — including group birth, group death, min/max loss
  * under deletion, NULL inputs, and no-op refreshes.
  */
class MaterializedViewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft_mv").toString

  private def baseRows(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("k"),
      lit(0L).as("ver"),
      (col("id") % 7).cast("string").as("grp"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"),
      when(col("id") % 5 === 0, lit(null).cast("int")).otherwise((col("id") % 100).cast("int")).as("score"))

  private val aggs = Seq(
    MvAgg("n", "count", "*"),
    MvAgg("n_score", "count", "score"),
    MvAgg("sum_amt", "sum", "amt"),
    MvAgg("avg_amt", "avg", "amt"),
    MvAgg("min_score", "min", "score"),
    MvAgg("max_score", "max", "score"))

  private def recompute(t: LakeTable): DataFrame =
    t.read().groupBy("grp").agg(
      count(lit(1)).as("n"),
      count(col("score")).as("n_score"),
      sum(col("amt")).as("sum_amt"),
      (sum(col("amt")).cast("double") / count(col("amt"))).as("avg_amt"),
      min(col("score")).as("min_score"),
      max(col("score")).as("max_score"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def checkEq(mv: MaterializedView, t: LakeTable): Unit = {
    val got = rows(mv.read().select("grp", "n", "n_score", "sum_amt", "avg_amt", "min_score", "max_score"))
    val want = rows(recompute(t))
    assert(got == want, s"mv != recompute\n got: $got\nwant: $want")
  }

  test("refresh after upsert + delete equals full recompute; dead groups vanish") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(500))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    checkEq(mv, t)

    // churn: bump 1 in 7, insert new keys, delete one whole group
    val churn = baseRows(500).filter(col("k") % 7 === 1)
      .withColumn("ver", lit(1L)).withColumn("amt", col("amt") + lit(5.55).cast("decimal(18,2)"))
    val fresh = baseRows(60).withColumn("k", col("k") + 10000L)
      .withColumn("grp", lit("new"))
    t.upsert(churn.unionByName(fresh))
    t.delete(col("grp") === "3") // group death
    mv.refresh()
    checkEq(mv, t)
    assert(!mv.read().where(col("grp") === "3").collect().nonEmpty, "dead group must be deleted")
  }

  test("min/max survive losing their extremum (removal-group re-aggregation)") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(300))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    // delete exactly the max-score rows of every group
    t.delete(col("score") >= 90)
    mv.refresh()
    checkEq(mv, t)
    // and an update that lowers a previous max via upsert
    val lower = t.read().where(col("score") === 89)
      .select("k", "ver", "grp", "amt", "score")
      .withColumn("ver", col("ver") + 1).withColumn("score", lit(1))
    t.upsert(lower)
    mv.refresh()
    checkEq(mv, t)
  }

  test("hll distinct-count MV: union on additions, re-sketch on removals, death/rebirth, rollup") {
    val bp = tmp(); val mp = tmp()
    // ≤ 91 distinct users per group / ≤ 91 overall: inside the sketch's
    // exact (coupon) regime, so the estimate IS COUNT(DISTINCT) and the
    // equality checks below are deterministic, not statistical
    def mk(from: Long, until: Long, ver: Long, userMod: Long): DataFrame =
      spark.range(from, until).select(
        col("id").as("k"), lit(ver).as("ver"),
        (col("id") % 5).cast("string").as("grp"),
        (col("id") % userMod).as("user"),
        when(col("id") % 11 === 0, lit(null).cast("long"))
          .otherwise(col("id") % userMod).as("maybe_user"))
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), mk(0, 400, 0L, 57))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), Seq(
      MvAgg("n", "count", "*"),
      MvAgg("du", "hll", "user"),
      MvAgg("dm", "hll", "maybe_user")))
    def want = rows(t.read().groupBy("grp").agg(count(lit(1)).as("n"),
      countDistinct(col("user")).as("du"),
      countDistinct(col("maybe_user")).as("dm")))
    def got = rows(mv.read().select("grp", "n", "du", "dm"))
    assert(got == want, "create-time state")
    // additions only (pure sketch-union path): new keys, new distinct users
    t.upsert(mk(400, 520, 1L, 91))
    mv.refresh()
    assert(got == want, "additions-only refresh")
    // removals: distinct counts must DROP (the removal-group re-sketch)
    t.delete(col("user") < 10)
    mv.refresh()
    assert(got == want, "removal refresh")
    // group death, then rebirth — the reborn sketch must not inherit the
    // dead row's stale sketch
    t.delete(col("grp") === "2")
    mv.refresh()
    assert(got == want, "group death")
    assert(mv.read().where(col("grp") === "2").isEmpty)
    t.upsert(mk(2000, 2030, 2L, 7).withColumn("grp", lit("2")))
    mv.refresh()
    assert(got == want, "rebirth")
    // rollup to the global aggregate: group sketches UNION to the true
    // global distinct (not the sum of per-group distincts)
    val glob = mv.readRollup(Nil).select("du").head().getLong(0)
    val exactGlob = t.read().select(countDistinct(col("user"))).head().getLong(0)
    assert(glob == exactGlob, s"rollup distinct $glob != exact $exactGlob")
  }

  test("pruneDeadGroups removes tombstones; reads unchanged, rebirth still exact") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(210))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    // kill two groups, then prune their tombstone rows
    t.delete(col("grp").isin("2", "4"))
    mv.refresh()
    val stateRows0 = mv.state.read().count()
    assert(mv.pruneDeadGroups() == 2L, "two dead groups expected")
    assert(mv.pruneDeadGroups() == 0L, "second prune is a no-op")
    assert(mv.state.read().count() == stateRows0 - 2, "tombstone rows gone")
    checkEq(mv, t)
    // rebirth from an ABSENT row must equal rebirth from a tombstone:
    // zeroed baseline, no stale extrema inherited
    t.upsert(baseRows(210).filter(col("grp") === "2").withColumn("ver", lit(2L)))
    mv.refresh()
    checkEq(mv, t)
  }

  test("no-op refresh and repeated refresh are stable; version tracked") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(100))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    val v0 = mv.lastRefreshedVersion
    mv.refresh()
    assert(mv.lastRefreshedVersion == v0, "no-op refresh must not advance")
    t.upsert(baseRows(100).filter(col("k") % 3 === 0).withColumn("ver", lit(1L))
      .withColumn("amt", col("amt") * 2))
    mv.refresh(); mv.refresh() // second is a no-op
    assert(mv.lastRefreshedVersion == t.latestVersion)
    checkEq(mv, t)
  }

  test("NULL dim values group correctly and stay distinct from 'null' string") {
    val bp = tmp(); val mp = tmp()
    val base = baseRows(100)
      .withColumn("grp", when(col("k") % 3 === 0, lit(null).cast("string"))
        .when(col("k") % 3 === 1, lit("null")).otherwise(col("grp")))
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), base)
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    checkEq(mv, t)
    t.upsert(base.filter(col("k") % 6 === 0).withColumn("ver", lit(1L))
      .withColumn("amt", col("amt") + lit(1).cast("decimal(18,2)")))
    mv.refresh()
    checkEq(mv, t)
    val grps = mv.read().select("grp").collect().map(_.getString(0)).toSet
    assert(grps.contains(null) && grps.contains("null"))
  }

  test("multi-dim MV with overwriteWhere churn") {
    val bp = tmp(); val mp = tmp()
    val base = baseRows(400).withColumn("g2", (col("k") % 2).cast("string"))
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), base)
    val mv = MaterializedView.create(spark, mp, t, Seq("grp", "g2"),
      Seq(MvAgg("n", "count", "*"), MvAgg("sum_amt", "sum", "amt")))
    t.overwriteWhere(
      base.filter(col("grp") === "2").withColumn("amt", col("amt") * 3),
      col("grp") === "2")
    mv.refresh()
    val got = rows(mv.read())
    val want = rows(t.read().groupBy("grp", "g2")
      .agg(count(lit(1)).as("n"), sum(col("amt")).as("sum_amt")))
    assert(got == want)
  }

  test("refresh scans only churn for linear aggs (delta plan reads window files)") {
    val bp = tmp(); val mp = tmp()
    // key-clustered multi-file layout so key-local churn touches few files
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"),
      baseRows(1000).repartitionByRange(8, col("k")), bulkInsert = true)
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("sum_amt", "sum", "amt")))
    val before = t.latestVersion
    t.upsert(baseRows(1000).filter(col("k") < 20).withColumn("ver", lit(1L)))
    // the windowDelta inputs must be bounded by churn-touched files, not
    // the table: all files added in the window plus files they replaced
    val window = t.commits.filter(c => c.version > before)
    val touched = window.flatMap(c => c.add.map(_.rows)).sum + {
      val removed = window.flatMap(_.remove).toSet
      t.commits.filter(_.version <= before).flatMap(_.add)
        .filter(a => removed.contains(a.path)).map(_.rows).sum
    }
    val total = t.read().count()
    assert(touched < total, s"churn rows $touched must be under table rows $total")
    mv.refresh()
    // n/sum agree without ever scanning the base (no min/max aggs)
    val got = rows(mv.read())
    val want = rows(t.read().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("amt")).as("sum_amt")))
    assert(got == want)
  }

  private def factRows(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("k"),
      lit(0L).as("ver"),
      (col("id") % 20).as("fk"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"),
      when(col("id") % 5 === 0, lit(null).cast("int"))
        .otherwise((col("id") % 100).cast("int")).as("score"))

  private def dimRows: DataFrame =
    spark.range(20L).select(
      col("id").as("dk"),
      lit(0L).as("dver"),
      concat(lit("r"), (col("id") % 4).cast("string")).as("region"),
      (col("id") * 100).cast("int").as("dval"))

  private val joinAggs = Seq(
    MvAgg("n", "count", "*"),
    MvAgg("sum_amt", "sum", "amt"),
    MvAgg("avg_amt", "avg", "amt"),
    MvAgg("min_score", "min", "score"),
    MvAgg("max_dval", "max", "dval"),
    // ≤ 20 distinct fks: exact coupon regime, estimate == COUNT(DISTINCT)
    MvAgg("dfk", "hll", "fk"))

  private def checkJoinEq(mp: String, ft: LakeTable, dt: LakeTable): Unit = {
    val got = rows(MaterializedView.load(spark, mp).read())
    val want = rows(ft.read().join(dt.read(), col("fk") === col("dk"))
      .groupBy("region").agg(
        count(lit(1)).as("n"),
        sum(col("amt")).as("sum_amt"),
        (sum(col("amt")).cast("double") / count(col("amt"))).as("avg_amt"),
        min(col("score")).as("min_score"),
        max(col("dval")).as("max_dval"),
        countDistinct(col("fk")).as("dfk")))
    assert(got == want, s"join mv != recompute\n got: $got\nwant: $want")
  }

  test("star-join view: fact churn, dim churn, and both — refresh equals recompute") {
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), factRows(400))
    val dt = LakeTable.create(spark, dp, TableSpec("dk", "dver"), dimRows)
    val mv = MaterializedView.create(spark, mp, ft, Seq("region"), joinAggs,
      Seq(MvJoin(dp, "fk", "dk")))
    checkJoinEq(mp, ft, dt)
    // 1) fact churn only: updates, inserts, deletes — the dim is untouched
    ft.upsert(factRows(400).filter(col("k") % 7 === 1).withColumn("ver", lit(1L))
      .withColumn("amt", col("amt") + lit(5.55).cast("decimal(18,2)"))
      .unionByName(factRows(460).filter(col("k") >= 400)))
    ft.delete(col("k") % 11 === 0)
    mv.refresh()
    checkJoinEq(mp, ft, dt)
    // 2) dim churn only: a dim row switches region — every matching fact
    // row's contribution must MOVE groups (minus old, plus new), without
    // the refresh scanning more of the fact table than those keys
    dt.upsert(dimRows.filter(col("dk") === 3L).withColumn("dver", lit(1L))
      .withColumn("region", lit("r9")))
    mv.refresh()
    checkJoinEq(mp, ft, dt)
    // 3) both tables churn in one refresh window (ΔF⋈D_old + F_new⋈ΔD)
    ft.upsert(factRows(400).filter(col("k") % 13 === 2).withColumn("ver", lit(2L))
      .withColumn("score", lit(7)))
    dt.upsert(dimRows.filter(col("dk") === 8L).withColumn("dver", lit(1L))
      .withColumn("region", lit("r9")).withColumn("dval", lit(-1)))
    mv.refresh()
    checkJoinEq(mp, ft, dt)
    // 4) dim row DELETE: inner-join semantics — its fact rows drop out,
    // and a group death (r9 loses dk=3 AND dk=8) deletes state rows
    dt.delete(col("dk").isin(3L, 8L))
    mv.refresh()
    checkJoinEq(mp, ft, dt)
    assert(MaterializedView.load(spark, mp).read()
      .where(col("region") === "r9").count() == 0, "dead group must vanish")
    // 5) no-op refresh is stable on both cursors
    val m0 = MaterializedView.load(spark, mp).meta
    mv.refresh()
    val m1 = MaterializedView.load(spark, mp).meta
    assert(m0 == m1, "no-op refresh must advance neither cursor")
  }

  test("star-join min/max repair re-aggregates from the JOINED snapshot") {
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), factRows(300))
    val dt = LakeTable.create(spark, dp, TableSpec("dk", "dver"), dimRows)
    MaterializedView.create(spark, mp, ft, Seq("region"), joinAggs,
      Seq(MvJoin(dp, "fk", "dk")))
    // delete the max-dval dim row of every region: the lost extremum must
    // be recomputed from fact⋈dim, and fact rows of the deleted dim keys
    // must leave every aggregate (not only min/max)
    dt.delete(col("dk") >= 16L)
    MaterializedView.load(spark, mp).refresh()
    checkJoinEq(mp, ft, dt)
    // and a fact-side extremum loss in the same view
    ft.delete(col("score") >= 50)
    MaterializedView.load(spark, mp).refresh()
    checkJoinEq(mp, ft, dt)
  }

  test("multi-dim star: fact x 2 dims, churn on all three tables in one refresh") {
    val fp = tmp(); val d1p = tmp(); val d2p = tmp(); val mp = tmp()
    // fact carries TWO dim keys; dims: region table and a product table
    val fact0 = spark.range(400L).select(
      col("id").as("k"), lit(0L).as("ver"),
      (col("id") % 20).as("fk"), (col("id") % 8).as("pk_prod"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"))
    val prod0 = spark.range(8L).select(
      col("id").as("pdk"), lit(0L).as("pver"),
      concat(lit("cat"), (col("id") % 3).cast("string")).as("category"))
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), fact0)
    val d1 = LakeTable.create(spark, d1p, TableSpec("dk", "dver"), dimRows)
    val d2 = LakeTable.create(spark, d2p, TableSpec("pdk", "pver"), prod0)
    val mv = MaterializedView.create(spark, mp, ft, Seq("region", "category"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "amt")),
      Seq(MvJoin(d1p, "fk", "dk"), MvJoin(d2p, "pk_prod", "pdk")))
    def check(): Unit = {
      val got = rows(MaterializedView.load(spark, mp).read())
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, d1p).read(), col("fk") === col("dk"))
        .join(LakeTable.load(spark, d2p).read(), col("pk_prod") === col("pdk"))
        .groupBy("region", "category").agg(count(lit(1)).as("n"),
          sum(col("amt")).as("s"), max(col("amt")).as("mx")))
      assert(got == want, s"star mv != recompute\n got: $got\nwant: $want")
    }
    check()
    // churn EVERY table, one refresh: fact updates+deletes, dim1 region
    // move, dim2 category move + delete (its facts drop out)
    ft.upsert(fact0.filter(col("k") % 6 === 1).withColumn("ver", lit(1L))
      .withColumn("amt", col("amt") + lit(0.25).cast("decimal(18,2)")))
    ft.delete(col("k") % 13 === 0)
    d1.upsert(dimRows.filter(col("dk") === 5L).withColumn("dver", lit(1L))
      .withColumn("region", lit("rX")))
    d2.upsert(prod0.filter(col("pdk") === 2L).withColumn("pver", lit(1L))
      .withColumn("category", lit("catX")))
    d2.delete(col("pdk") === 7L)
    MaterializedView.load(spark, mp).refresh()
    check()
    // subsequent single-table churn still maintains incrementally
    d1.upsert(dimRows.filter(col("dk") === 5L).withColumn("dver", lit(2L))
      .withColumn("region", lit("rY")))
    MaterializedView.load(spark, mp).refresh()
    check()
    assert(mv.dimRefreshedVersions ==
      Seq(LakeTable.load(spark, d1p).latestVersion,
        LakeTable.load(spark, d2p).latestVersion))
    // join-key naming contract: a chain whose parent joins AFTER the
    // child is rejected (snowflake arms must come parent-first) ...
    val err = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, tmp(), ft, Seq("category"),
        Seq(MvAgg("n", "count", "*")),
        Seq(MvJoin(d2p, "region", "pdk"), MvJoin(d1p, "fk", "dk")))
    }
    assert(err.getMessage.contains("parent-first"), err.getMessage)
    // ... and a left key resolving in NO joined table names the constraint
    val err2 = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, tmp(), ft, Seq("region"),
        Seq(MvAgg("n", "count", "*")),
        Seq(MvJoin(d1p, "no_such_col", "dk")))
    }
    assert(err2.getMessage.contains("exactly one joined table"), err2.getMessage)
  }

  test("group death persists a tombstone; rebirth restarts exactly (incl. min/max)") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(210))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    // kill group "4" entirely, then refresh: read() hides it, state keeps
    // a GRP_N <= 0 tombstone row (single-commit refresh invariant)
    t.delete(col("grp") === "4")
    mv.refresh()
    checkEq(mv, t)
    assert(mv.read().where(col("grp") === "4").count() == 0)
    // rebirth with DIFFERENT values: the tombstone's zeroed linear state
    // and stale extremum must not leak into the reborn group
    t.upsert(baseRows(9000).filter(col("k") >= 8950)
      .withColumn("grp", lit("4")).withColumn("score", lit(3)))
    mv.refresh()
    checkEq(mv, t)
  }

  test("racing refreshes serialize exactly: no double-apply, no lost window, no phantom death") {
    import java.util.concurrent.{CountDownLatch, Executors}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(400))
    MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    (1 to 3).foreach { wave =>
      // churn: reprice a stripe, delete a stripe (min/max loss included)
      t.upsert(baseRows(400).filter(col("k") % 5 === wave)
        .withColumn("ver", lit(wave.toLong))
        .withColumn("amt", col("amt") + lit(wave).cast("decimal(18,2)")))
      t.delete(col("score") >= 100 - wave * 7 && col("score") < 100 - wave * 7 + 3)
      // three handles race the SAME refresh window: exactly one applies,
      // the others either no-op on the recorded cursor or lose the pinned
      // claim and re-read — the double-apply (amt counted twice) or
      // phantom-death (n pushed <= 0 from a doubled delta) failure modes
      // both break the recompute equality below
      val start = new CountDownLatch(1)
      val futs = (1 to 3).map(_ => Future {
        start.await()
        MaterializedView.load(spark, mp).refresh()
      })
      start.countDown()
      Await.result(Future.sequence(futs), 600.seconds)
      checkEq(MaterializedView.load(spark, mp), LakeTable.load(spark, bp))
    }
    pool.shutdown()
  }

  test("star-join view maintained by two racing writers (fact stream + dim stream)") {
    import java.util.concurrent.{CountDownLatch, Executors}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), factRows(300))
    val dt = LakeTable.create(spark, dp, TableSpec("dk", "dver"), dimRows)
    MaterializedView.create(spark, mp, ft, Seq("region"), joinAggs,
      Seq(MvJoin(dp, "fk", "dk")))
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val start = new CountDownLatch(1)
    // the two-streams shape: each writer commits to ITS table then
    // refreshes the shared view, twice, unsynchronized — overlapping
    // DIFFERENT refresh windows, the hardest interleaving
    val factWriter = Future {
      start.await()
      (1 to 2).foreach { w =>
        val f = LakeTable.load(spark, fp)
        f.upsert(factRows(300).filter(col("k") % 4 === w)
          .withColumn("ver", lit(w.toLong)).withColumn("score", lit(w * 11)))
        MaterializedView.load(spark, mp).refresh()
      }
    }
    val dimWriter = Future {
      start.await()
      (1 to 2).foreach { w =>
        val d = LakeTable.load(spark, dp)
        d.upsert(dimRows.filter(col("dk") === (w * 3).toLong)
          .withColumn("dver", lit(w.toLong)).withColumn("region", lit(s"rw$w")))
        MaterializedView.load(spark, mp).refresh()
      }
    }
    start.countDown()
    Await.result(Future.sequence(Seq(factWriter, dimWriter)), 600.seconds)
    pool.shutdown()
    // NO settle refresh: each writer's refresh() only returns once the
    // recorded cursor covers the versions it observed — its own churn
    // included — so after both join, the view covers all four commits
    checkJoinEq(mp, LakeTable.load(spark, fp), LakeTable.load(spark, dp))
  }

  test("physical-only base churn (compaction) refreshes as an empty delta but advances the cursor") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"),
      baseRows(200).repartition(6))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    // compact rewrites every file; carried-over rows appear in plus AND
    // minus of the window delta and must cancel to a zero-row change
    t.compact()
    mv.refresh()
    assert(mv.lastRefreshedVersion == t.latestVersion,
      "the cursor must advance past a physical-only commit")
    checkEq(mv, t)
    // and the rewrite freshness gate sees the view as current again
    mv.refresh() // no-op
    checkEq(mv, t)
  }

  test("long-lived maintenance: many refreshes keep a bounded state file count; cursor survives compaction") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(120))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("sum_amt", "sum", "amt")))
    (1 to 24).foreach { w =>
      t.upsert(baseRows(120).filter(col("k") % 8 === w % 8)
        .withColumn("ver", lit(w.toLong))
        .withColumn("amt", col("amt") + lit(w).cast("decimal(18,2)")))
      mv.refresh()
    }
    val live = mv.state.liveFiles(None).filterNot(_.log)
    assert(live.size <= 17,
      s"auto-compaction must bound the state file count, got ${live.size}")
    // the cursor (a txn watermark) survived every interleaved compaction
    assert(mv.lastRefreshedVersion == t.latestVersion)
    assert(rows(mv.read()) == rows(t.read().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("amt")).as("sum_amt"))))
  }

  test("streaming ingestion keeps the view continuously fresh; restart is safe") {
    val bp = tmp(); val mp = tmp(); val land = tmp(); val ckpt = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(200))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("sum_amt", "sum", "amt")))
    def check(): Unit = {
      val base = LakeTable.load(spark, bp)
      assert(MaterializedView.load(spark, mp).lastRefreshedVersion ==
        base.latestVersion, "view must track the stream")
      assert(rows(MaterializedView.load(spark, mp).read()) ==
        rows(base.read().groupBy("grp")
          .agg(count(lit(1)).as("n"), sum(col("amt")).as("sum_amt"))))
    }
    // wave 1: updates to existing keys + new keys, across several files
    baseRows(300).filter(col("k") >= 150).withColumn("ver", lit(1L))
      .repartition(6).write.mode("overwrite").parquet(s"$land/w1")
    graft.streaming.CdcStream.ingestWithViews(spark, t, s"$land/w1",
      t.read().select("k", "ver", "grp", "amt", "score").schema, ckpt, Some(Seq(mp)))
    check()
    // wave 2 into the same landing zone + checkpoint: only NEW files are
    // processed on the rerun (restart semantics), and the view follows
    baseRows(320).filter(col("k") >= 300).withColumn("ver", lit(2L))
      .repartition(3).write.mode("append").parquet(s"$land/w1")
    graft.streaming.CdcStream.ingestWithViews(spark,
      LakeTable.load(spark, bp), s"$land/w1",
      t.read().select("k", "ver", "grp", "amt", "score").schema, ckpt, Some(Seq(mp)))
    check()
  }

  test("extremum repair scan is FILE-pruned when dims are clustered stats columns") {
    val bp = tmp(); val mp = tmp()
    // files range-clustered on grp with per-file grp stats: each file
    // covers ~1 group, so the repair's IN(grp, affected) can prune
    val df = baseRows(800).repartitionByRange(8, col("grp"))
    val t = LakeTable.create(spark, bp,
      TableSpec("k", "ver", statsColumns = Seq("grp")), df, bulkInsert = true)
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    val total = t.commits.flatMap(_.add).size
    assert(total >= 4, s"need clustered files, got $total")
    // lose the extremum of exactly ONE group → repair touches one group
    t.delete(col("grp") === "4" && col("score") >= 50)
    MaterializedView.lastRepairScan = None
    mv.refresh()
    checkEq(mv, t)
    val (live, scanned) = MaterializedView.lastRepairScan.getOrElse(
      fail("refresh with an extremum loss must run the repair path"))
    assert(scanned < live,
      s"repair must prune the snapshot scan (scanned $scanned of $live files)")
    // pure-addition churn on a min/max view never scans the snapshot
    MaterializedView.lastRepairScan = None
    t.upsert(baseRows(40).withColumn("k", col("k") + 50000L))
    mv.refresh()
    checkEq(mv, t)
    assert(MaterializedView.lastRepairScan.isEmpty,
      "a window with no removal-touched live groups must skip the repair scan")
  }

  test("physical-only rewrites are an EMPTY delta by metadata proof: base/dim compaction runs no repair, state stays exact") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"),
      baseRows(400).repartition(6))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    checkEq(mv, t)
    // a compaction rewrites every file: the gross windowDelta would be the
    // whole table on both sides. The physical-only metadata proof answers
    // it EMPTY instead, so the refresh contributes nothing and min/max
    // never raise HASM — a production compaction cadence must not
    // re-aggregate every group of every registered view
    t.compact()
    MaterializedView.lastRepairScan = None
    mv.refresh()
    checkEq(mv, t)
    assert(MaterializedView.lastRepairScan.isEmpty,
      "a physical-only base rewrite must not trigger the extremum repair scan")
    // positive control over the SAME compacted table: losing a real
    // extremum still detects and repairs
    t.delete(col("grp") === "3" && col("score") >= 50)
    MaterializedView.lastRepairScan = None
    mv.refresh()
    checkEq(mv, t)
    assert(MaterializedView.lastRepairScan.nonEmpty,
      "a true extremum loss must still run the repair path")
    // DIM side: compacting a dim under a star view is an empty dim delta
    // by the same proof — no repair, no group moves, exact state
    val fp = tmp(); val dp = tmp(); val mp2 = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), factRows(400))
    val dt = LakeTable.create(spark, dp, TableSpec("dk", "dver"), dimRows)
    MaterializedView.create(spark, mp2, ft, Seq("region"), joinAggs,
      Seq(MvJoin(dp, "fk", "dk")))
    dt.compact()
    MaterializedView.lastRepairScan = None
    MaterializedView.load(spark, mp2).refresh()
    checkJoinEq(mp2, ft, dt)
    assert(MaterializedView.lastRepairScan.isEmpty,
      "a physical-only dim rewrite must net away, not re-aggregate")
    // and a REAL dim move after the compaction still maintains exactly
    dt.upsert(dimRows.filter(col("dk") === 3L).withColumn("dver", lit(1L))
      .withColumn("region", lit("r9")))
    MaterializedView.load(spark, mp2).refresh()
    checkJoinEq(mp2, ft, dt)
    // MIXED window (the gross-delta path, not the metadata shortcut):
    // logical churn AND a compaction inside one refresh window on BOTH
    // tables — the carried rows cancel inside the signed aggregate, the
    // churn survives
    ft.upsert(factRows(430).filter(col("k") >= 400).withColumn("ver", lit(3L)))
    ft.compact()
    dt.upsert(dimRows.filter(col("dk") === 7L).withColumn("dver", lit(2L))
      .withColumn("region", lit("r9")))
    dt.compact()
    MaterializedView.load(spark, mp2).refresh()
    checkJoinEq(mp2, ft, dt)
  }

  test("a physical-only window refresh is a metadata-only cursor bump: ZERO Spark jobs") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"),
      baseRows(200).repartition(4))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"), aggs)
    // the member's maintenance cadence between refreshes: every commit in
    // the pending window is content-preserving, so the refresh must prove
    // the delta empty from COMMIT METADATA alone — no plan, no job, no
    // data file opened — and publish a pure cursor-bump state commit
    t.compact()
    t.analyze()
    val stV0 = mv.state.latestVersion
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      mv.refresh()
      var last = -1
      while (n.get() != last) { last = n.get(); Thread.sleep(300) }
    } finally spark.sparkContext.removeSparkListener(l)
    assert(n.get() == 0,
      s"a physical-only window refresh must run zero jobs, ran ${n.get()}")
    assert(mv.lastRefreshedVersion == t.latestVersion,
      "the cursor bump must advance the cursor to the member head")
    assert(mv.state.latestVersion == stV0 + 1,
      "exactly one metadata-only state commit expected")
    checkEq(mv, t)
  }

  test("auto-prune keeps tombstones bounded under death/rebirth churn") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"),
      baseRows(50).withColumn("grp", concat(lit("perm"), col("k") % 2)))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("sum_amt", "sum", "amt")))
    def check(): Unit = assert(
      rows(MaterializedView.load(spark, mp).read()) ==
        rows(t.read().groupBy("grp")
          .agg(count(lit(1)).as("n"), sum(col("amt")).as("sum_amt"))))
    // each cycle births 10 fresh groups then kills them — every cycle
    // leaves 10 tombstones; without the refresh-cadence prune the state
    // would grow one dead row per EVER-dead group, unbounded
    val everDead = 30 * 10
    (0 until 30).foreach { c =>
      val wave = spark.range(10).select(
        (col("id") + 100000L + c * 100L).as("k"), lit(0L).as("ver"),
        concat(lit(s"c${c}_"), col("id")).as("grp"),
        lit(1.0).cast("decimal(18,2)").as("amt"), lit(1).as("score"))
      t.upsert(wave)
      mv.refresh()
      t.delete(col("grp").startsWith(s"c${c}_"))
      mv.refresh()
    }
    check()
    // pruneDeadGroups returns the CURRENT tombstone count — far below the
    // ever-dead total proves the cadence prune fired along the way
    val leftover = mv.pruneDeadGroups()
    assert(leftover < everDead / 2,
      s"auto-prune must have fired: $leftover tombstones left of $everDead ever dead")
    check()
  }

  test("filtered view maintains the σ_pred aggregate under churn crossing the predicate") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(400))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("sum_amt", "sum", "amt"),
        MvAgg("mx", "max", "score")),
      filter = Some("score >= 50 AND grp <> '6'"))
    def check(): Unit = {
      val want = rows(t.read().filter("score >= 50 AND grp <> '6'")
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("amt")).as("sum_amt"),
          max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want)
    }
    check()
    // updates MOVE rows across the predicate boundary in both directions:
    // 60→10 leaves the filtered set, 20→95 enters it; plus deletes that
    // take a filtered group's max (repair must re-aggregate FILTERED)
    val out = t.read().where(col("score") === 60)
      .select("k", "ver", "grp", "amt", "score")
      .withColumn("ver", col("ver") + 1).withColumn("score", lit(10))
    val in = t.read().where(col("score") === 20)
      .select("k", "ver", "grp", "amt", "score")
      .withColumn("ver", col("ver") + 1).withColumn("score", lit(95))
    t.upsert(out.unionByName(in))
    mv.refresh()
    check()
    t.delete(col("score") >= 90)
    mv.refresh()
    check()
    // non-deterministic and subquery predicates are rejected at create
    val bad = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, tmp(), t, Seq("grp"),
        Seq(MvAgg("n", "count", "*")), filter = Some("rand() > 0.5"))
    }
    assert(bad.getMessage.contains("deterministic"))
  }

  test("snowflake chain fact→cust→nation: churn on all three tables, incl. chain-dim deletes") {
    val fp = tmp(); val cp = tmp(); val np = tmp(); val mp = tmp()
    val fact0 = spark.range(600L).select(
      col("id").as("k"), lit(0L).as("ver"), (col("id") % 40).as("ck"),
      (col("id") * 7 % 100).cast("int").as("score"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"))
    val cust0 = spark.range(40L).select(
      col("id").as("cdk"), lit(0L).as("cver"), (col("id") % 6).as("nk"))
    val nat0 = spark.range(6L).select(
      col("id").as("ndk"), lit(0L).as("nver"),
      concat(lit("nation"), col("id")).as("nname"))
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), fact0)
    val ct = LakeTable.create(spark, cp, TableSpec("cdk", "cver"), cust0)
    val nt = LakeTable.create(spark, np, TableSpec("ndk", "nver"), nat0)
    // join 1 chains off join 0's dim: nk lives on the CUSTOMER table
    val mv = MaterializedView.create(spark, mp, ft, Seq("nname"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "score")),
      Seq(MvJoin(cp, "ck", "cdk"), MvJoin(np, "nk", "ndk")))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, cp).read(), col("ck") === col("cdk"))
        .join(LakeTable.load(spark, np).read(), col("nk") === col("ndk"))
        .groupBy("nname").agg(count(lit(1)).as("n"), sum(col("amt")).as("s"),
          max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "snowflake mv != recompute")
    }
    check()
    // one refresh absorbs churn on every level of the chain: fact
    // updates+deletes, customers MOVING between nations (their facts move
    // groups), a nation rename (whole group re-labels), a nation DELETE
    // (its customers' facts drop out), a customer delete
    ft.upsert(fact0.filter(col("k") % 9 === 2).withColumn("ver", lit(1L))
      .withColumn("amt", col("amt") + lit(0.5).cast("decimal(18,2)")))
    ft.delete(col("k") % 17 === 0)
    ct.upsert(cust0.filter(col("cdk") % 7 === 3).withColumn("cver", lit(1L))
      .withColumn("nk", (col("nk") + 1) % 6))
    ct.delete(col("cdk") === 11L)
    nt.upsert(nat0.filter(col("ndk") === 2L).withColumn("nver", lit(1L))
      .withColumn("nname", lit("renamed2")))
    nt.delete(col("ndk") === 5L)
    MaterializedView.load(spark, mp).refresh()
    check()
    val m = MaterializedView.load(spark, mp)
    assert(m.lastRefreshedVersion == LakeTable.load(spark, fp).latestVersion)
    assert(m.dimRefreshedVersions == Seq(
      LakeTable.load(spark, cp).latestVersion,
      LakeTable.load(spark, np).latestVersion),
      "one refresh must advance all three maintenance cursors")
    // and a later mid-chain-only churn still maintains incrementally
    ct.upsert(cust0.filter(col("cdk") === 20L).withColumn("cver", lit(2L))
      .withColumn("nk", lit(0L)))
    m.refresh()
    check()
  }

  test("FILTERED depth-3 snowflake (fact→cust→nation→region): churn at every level") {
    val fp = tmp(); val cp = tmp(); val np = tmp(); val rp = tmp(); val mp = tmp()
    val fact0 = spark.range(500L).select(
      col("id").as("k"), lit(0L).as("ver"), (col("id") % 30).as("ck"),
      (col("id") % 4).cast("string").as("cls"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"))
    val cust0 = spark.range(30L).select(
      col("id").as("cdk"), lit(0L).as("cver"), (col("id") % 8).as("nk"))
    val nat0 = spark.range(8L).select(
      col("id").as("ndk"), lit(0L).as("nver"), (col("id") % 3).as("rk"))
    val reg0 = spark.range(3L).select(
      col("id").as("rdk"), lit(0L).as("rver"),
      concat(lit("region"), col("id")).as("rname"))
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), fact0)
    val ct = LakeTable.create(spark, cp, TableSpec("cdk", "cver"), cust0)
    val nt = LakeTable.create(spark, np, TableSpec("ndk", "nver"), nat0)
    val rt = LakeTable.create(spark, rp, TableSpec("rdk", "rver"), reg0)
    // three chained arms AND a fact-column filter: the view maintains
    // σ_cls∈{1,2}(F⋈C⋈N⋈R) GROUP BY rname
    val mv = MaterializedView.create(spark, mp, ft, Seq("rname"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "amt")),
      Seq(MvJoin(cp, "ck", "cdk"), MvJoin(np, "nk", "ndk"),
        MvJoin(rp, "rk", "rdk")),
      filter = Some("cls IN ('1', '2')"))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .filter(col("cls").isin("1", "2"))
        .join(LakeTable.load(spark, cp).read(), col("ck") === col("cdk"))
        .join(LakeTable.load(spark, np).read(), col("nk") === col("ndk"))
        .join(LakeTable.load(spark, rp).read(), col("rk") === col("rdk"))
        .groupBy("rname").agg(count(lit(1)).as("n"), sum(col("amt")).as("s"),
          max(col("amt")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "filtered deep-snowflake mv != recompute")
    }
    check()
    // churn EVERY level in one refresh: fact rows cross the filter both
    // ways + deletes; customers move nations; nations move regions; a
    // region renames and another DIES (everything under it drops out)
    ft.upsert(fact0.filter(col("k") % 6 === 1).withColumn("ver", lit(1L))
      .withColumn("cls", concat((col("k") % 3).cast("string"), lit(""))))
    ft.delete(col("k") % 13 === 0)
    ct.upsert(cust0.filter(col("cdk") % 7 === 2).withColumn("cver", lit(1L))
      .withColumn("nk", (col("nk") + 1) % 8))
    nt.upsert(nat0.filter(col("ndk") === 5L).withColumn("nver", lit(1L))
      .withColumn("rk", lit(0L)))
    rt.upsert(reg0.filter(col("rdk") === 1L).withColumn("rver", lit(1L))
      .withColumn("rname", lit("renamed1")))
    rt.delete(col("rdk") === 2L)
    MaterializedView.load(spark, mp).refresh()
    check()
    assert(MaterializedView.load(spark, mp).dimRefreshedVersions == Seq(
      LakeTable.load(spark, cp).latestVersion,
      LakeTable.load(spark, np).latestVersion,
      LakeTable.load(spark, rp).latestVersion),
      "one refresh must advance all four maintenance cursors")
    // tail-only churn afterwards (the deepest dim alone)
    rt.upsert(reg0.filter(col("rdk") === 0L).withColumn("rver", lit(2L))
      .withColumn("rname", lit("renamed0")))
    MaterializedView.load(spark, mp).refresh()
    check()
    // a second view whose filter references a MID-CHAIN dim column (nk on
    // the customer table): refs route through sideSplitN to the right
    // table's projection and the predicate applies to the joined row
    val mp2 = tmp()
    val mv2 = MaterializedView.create(spark, mp2, ft, Seq("rname"),
      Seq(MvAgg("n", "count", "*")),
      Seq(MvJoin(cp, "ck", "cdk"), MvJoin(np, "nk", "ndk"),
        MvJoin(rp, "rk", "rdk")),
      filter = Some("nk >= 2"))
    ct.upsert(cust0.filter(col("cdk") === 3L).withColumn("cver", lit(3L))
      .withColumn("nk", lit(1L))) // crosses the dim-column predicate
    mv2.refresh()
    val want2 = rows(LakeTable.load(spark, fp).read()
      .join(LakeTable.load(spark, cp).read(), col("ck") === col("cdk"))
      .join(LakeTable.load(spark, np).read(), col("nk") === col("ndk"))
      .join(LakeTable.load(spark, rp).read(), col("rk") === col("rdk"))
      .filter(col("nk") >= 2)
      .groupBy("rname").agg(count(lit(1)).as("n")))
    assert(rows(MaterializedView.load(spark, mp2).read()) == want2,
      "dim-column-filtered chain mv != recompute")
  }

  test("streaming into a chain-TAIL dim auto-discovers and maintains a snowflake view") {
    val fp = tmp(); val cp = tmp(); val np = tmp(); val mp = tmp()
    val land = tmp(); val ck = tmp()
    val fact0 = spark.range(300L).select(
      col("id").as("k"), lit(0L).as("ver"), (col("id") % 20).as("ck"),
      (col("id") * 3).as("amt"))
    val cust0 = spark.range(20L).select(
      col("id").as("cdk"), lit(0L).as("cver"), (col("id") % 5).as("nk"))
    val nat0 = spark.range(5L).select(
      col("id").as("ndk"), lit(0L).as("nver"),
      concat(lit("n"), col("id")).as("nname"))
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"), fact0)
    LakeTable.create(spark, cp, TableSpec("cdk", "cver"), cust0)
    val nt = LakeTable.create(spark, np, TableSpec("ndk", "nver"), nat0)
    MaterializedView.create(spark, mp, ft, Seq("nname"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")),
      Seq(MvJoin(cp, "ck", "cdk"), MvJoin(np, "nk", "ndk")))
    graft.sql.GraftMvRewrite.register(mp)
    try {
      // stream RENAMES into the deepest dim with NO view list — per-batch
      // auto-discovery must find the snowflake view through its dimPaths
      nat0.filter(col("ndk") < 3).withColumn("nver", lit(1L))
        .withColumn("nname", concat(lit("renamed"), col("ndk")))
        .repartition(3).write.mode("overwrite").parquet(land)
      graft.streaming.CdcStream.ingestWithViews(spark, nt, land,
        nt.read().select("ndk", "nver", "nname").schema, ck)
      val mv = MaterializedView.load(spark, mp)
      assert(mv.dimRefreshedVersions(1) == LakeTable.load(spark, np).latestVersion,
        "the stream must keep the chain-tail cursor current without naming the view")
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, cp).read(), col("ck") === col("cdk"))
        .join(LakeTable.load(spark, np).read(), col("nk") === col("ndk"))
        .groupBy("nname").agg(count(lit(1)).as("n"), sum(col("amt")).as("s")))
      assert(rows(mv.read()) == want)
    } finally graft.sql.GraftMvRewrite.unregister(mp)
  }

  test("schema evolution that makes a join key ambiguous fails refresh with the contract's message") {
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"),
      spark.range(100L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 10).as("fk"), (col("id") * 2).as("amt")))
    val dt = LakeTable.create(spark, dp, TableSpec("dk", "dver"),
      spark.range(10L).select(col("id").as("dk"), lit(0L).as("dver"),
        concat(lit("g"), col("id") % 3).as("grp")))
    val mv = MaterializedView.create(spark, mp, ft, Seq("grp"),
      Seq(MvAgg("n", "count", "*")), Seq(MvJoin(dp, "fk", "dk")))
    // the fact table EVOLVES to gain a column named like the dim key:
    // the per-refresh keyHomes revalidation must fail with the join-key
    // constraint's own message, not an opaque ambiguous-reference error
    ft.upsert(spark.range(3L).select((col("id") + 500L).as("k"),
      lit(1L).as("ver"), (col("id") % 10).as("fk"), (col("id") * 2).as("amt"),
      col("id").as("dk")), mergeSchema = true)
    val err = intercept[IllegalArgumentException](mv.refresh())
    assert(err.getMessage.contains("its OWN dim table only"), err.getMessage)
  }

  test("dim-attribute view repair is FILE-pruned through the join chain (GROUP BY nname)") {
    val fp = tmp(); val cp = tmp(); val np = tmp(); val mp = tmp()
    // fact key-clustered on the JOIN key ck with per-file ck stats: the
    // chase nname → ndk → cdk=ck derives IN(ck, …) that commit-log
    // skipping can act on, even though NO view dim is a fact column
    val fact0 = spark.range(960L).select(
      col("id").as("k"), lit(0L).as("ver"), (col("id") % 48).as("ck"),
      (col("id") * 7 % 100).cast("int").as("score"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"))
      .repartitionByRange(8, col("ck"))
    val cust0 = spark.range(48L).select(
      col("id").as("cdk"), lit(0L).as("cver"), (col("id") % 12).as("nk"))
    val nat0 = spark.range(12L).select(
      col("id").as("ndk"), lit(0L).as("nver"),
      concat(lit("nation"), col("id")).as("nname"))
    val ft = LakeTable.create(spark, fp,
      TableSpec("k", "ver", statsColumns = Seq("ck")), fact0, bulkInsert = true)
    val ct = LakeTable.create(spark, cp, TableSpec("cdk", "cver"), cust0)
    val nt = LakeTable.create(spark, np, TableSpec("ndk", "nver"), nat0)
    val mv = MaterializedView.create(spark, mp, ft, Seq("nname"),
      Seq(MvAgg("n", "count", "*"), MvAgg("mx", "max", "score")),
      Seq(MvJoin(cp, "ck", "cdk"), MvJoin(np, "nk", "ndk")))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(ct.read(), col("ck") === col("cdk"))
        .join(nt.read(), col("nk") === col("ndk"))
        .groupBy("nname").agg(count(lit(1)).as("n"), max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "dim-attribute mv != recompute")
    }
    check()
    val total = ft.commits.flatMap(_.add).size
    assert(total >= 4, s"need a clustered multi-file fact, got $total")
    // lose the max of exactly ONE nation: its customers are 4 of 48 ck
    // values, clustered into a minority of the fact files
    ft.delete(col("ck") % 12 === 4 && col("score") >= 50)
    MaterializedView.lastRepairScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live, scanned) = MaterializedView.lastRepairScan.getOrElse(
      fail("an extremum loss must run the repair path"))
    assert(scanned < live,
      s"chained dim-value repair must prune the fact scan (scanned $scanned of $live files)")
  }

  test("composite-key join maintains under churn on both tables; repair chase prunes across the composite hop") {
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    // fact clustered on ck with per-file ck stats; the join is on the
    // COMPOSITE (ck, st) = (cdk, cst) natural key
    val fact0 = spark.range(960L).select(
      col("id").as("k"), lit(0L).as("ver"), (col("id") % 48).as("ck"),
      when(col("id") % 2 === 0, lit("A")).otherwise(lit("B")).as("st"),
      (col("id") * 7 % 100).cast("int").as("score"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"))
      .repartitionByRange(8, col("ck"))
    // one dim row per (cdk, cst) pair; grp is a function of cdk so an
    // affected grp chases to a small cdk set
    def dim0 = spark.range(96L).select(
      col("id").as("d_id"), lit(0L).as("dver"), (col("id") % 48).as("cdk"),
      when(col("id") < 48, lit("A")).otherwise(lit("B")).as("cst"),
      concat(lit("g"), col("id") % 12).as("grp"))
    val ft = LakeTable.create(spark, fp,
      TableSpec("k", "ver", statsColumns = Seq("ck")), fact0, bulkInsert = true)
    val dt = LakeTable.create(spark, dp, TableSpec("d_id", "dver"), dim0)
    val mv = MaterializedView.create(spark, mp, ft, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "score")),
      Seq(MvJoin(dp, Seq("ck", "st"), Seq("cdk", "cst"), 0L)))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(),
          col("ck") === col("cdk") && col("st") === col("cst"))
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("amt")).as("s"),
          max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "composite-key mv != recompute")
    }
    check()
    // dim churn on BOTH key columns' groups: the 'B' half of four cdks
    // moves group; two (cdk, 'A') rows die
    dt.upsert(dim0.filter(col("cdk") % 12 === 3 && col("cst") === "B")
      .withColumn("grp", lit("gMOVED")).withColumn("dver", lit(1L)))
    dt.delete(col("cdk").isin(5L, 17L) && col("cst") === "A")
    MaterializedView.load(spark, mp).refresh()
    check()
    // fact churn: extremum loss in grp g4's rows only (cdk % 12 == 4) —
    // the repair must chase gMOVED/g4 values across the composite join to
    // per-column fact-key IN lists and file-prune the snapshot scan
    val total = ft.commits.flatMap(_.add).size
    assert(total >= 4, s"need a clustered multi-file fact, got $total")
    ft.delete(col("ck") % 12 === 4 && col("score") >= 50)
    MaterializedView.lastRepairScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live, scanned) = MaterializedView.lastRepairScan.getOrElse(
      fail("an extremum loss must run the repair path"))
    assert(scanned < live,
      s"composite-key chase must prune the fact scan (scanned $scanned of $live files)")
    // arity mismatch is rejected at construction
    val err = intercept[IllegalArgumentException](
      MvJoin(dp, Seq("ck"), Seq("cdk", "cst"), 0L))
    assert(err.getMessage.contains("equal arity"), err.getMessage)
  }

  test("expression dims maintain under churn crossing bucket boundaries; null buckets; extremum repair") {
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(400))
    // bucket = score % 10 (NULL for null scores): a row-local expression
    // over the base row, grouped alongside a bare dim
    val mv = MaterializedView.create(spark, mp, t, Seq("grp", "bucket"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "score")),
      dimExprs = Map("bucket" -> "cast(score % 10 as int)"))
    def check(): Unit = {
      val want = rows(t.read()
        .withColumn("bucket", expr("cast(score % 10 as int)"))
        .groupBy("grp", "bucket").agg(count(lit(1)).as("n"),
          sum(col("amt")).as("s"), max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "expr-dim mv != recompute")
    }
    check()
    // churn that MOVES rows between buckets (score changes), adds fresh
    // rows (new buckets), and deletes extremum rows (repair path)
    t.upsert(baseRows(400).filter(col("k") % 6 === 1).withColumn("ver", lit(1L))
      .withColumn("score", (col("score") + 7).cast("int")))
    t.upsert(baseRows(80).withColumn("k", col("k") + 40000L))
    t.delete(col("score") >= 90)
    MaterializedView.load(spark, mp).refresh()
    check()
    // expression dims cannot collide with member-table columns
    val err = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, tmp(), t, Seq("score"),
        Seq(MvAgg("n", "count", "*")),
        dimExprs = Map("score" -> "cast(amt % 5 as int)"))
    }
    assert(err.getMessage.contains("collides"), err.getMessage)
  }

  test("expression-dim (time-bucket) repair is FILE-pruned via the monotonic transform") {
    val bp = tmp(); val mp = tmp()
    // time-clustered fact with per-file ts stats — the streaming-ingest
    // layout: each file covers a narrow time slice, so an affected
    // day-bucket's repair should open only that slice's files
    val facts = spark.range(960L).select(
      col("id").as("k"), lit(0L).as("ver"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id/2 AS INT),0,0)").as("ts"),
      (col("id") * 7 % 100).cast("int").as("score"))
      .repartitionByRange(8, col("ts"))
    val t = LakeTable.create(spark, bp,
      TableSpec("k", "ver", statsColumns = Seq("ts")), facts, bulkInsert = true)
    val mv = MaterializedView.create(spark, mp, t, Seq("day"),
      Seq(MvAgg("n", "count", "*"), MvAgg("mx", "max", "score")),
      dimExprs = Map("day" -> "date_trunc('DAY', ts)"))
    def check(): Unit = {
      val want = rows(t.read().withColumn("day", expr("date_trunc('DAY', ts)"))
        .groupBy("day").agg(count(lit(1)).as("n"), max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "expr-dim mv != recompute")
    }
    check()
    val total = t.commits.flatMap(_.add).size
    assert(total >= 4, s"need a time-clustered multi-file fact, got $total")
    // lose the max of exactly the FIRST day (hours 0-23 = ids 0-47):
    // 960 ids over 2-per-hour = 20 days across 8 files
    t.delete(col("ts") < expr("timestamp'2024-01-02 00:00:00'") && col("score") >= 50)
    MaterializedView.lastRepairScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live, scanned) = MaterializedView.lastRepairScan.getOrElse(
      fail("an extremum loss must run the repair path"))
    assert(scanned < live,
      s"monotonic expr-dim repair must prune the fact scan (scanned $scanned of $live files)")
  }

  test("LEFT-join view: null-extension maintained under key birth/death, group moves, fact churn") {
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"),
      spark.range(600L).select(
        col("id").as("k"), lit(0L).as("ver"), (col("id") % 30).as("ck"),
        (col("id") * 7 % 100).cast("int").as("score"),
        (col("id") * 10).cast("decimal(18,2)").as("amt")))
    // a third of the join keys have NO dim row: their fact rows
    // null-extend into the NULL group
    def dimRows = spark.range(30L).select(
      col("id").as("cdk"), lit(0L).as("dver"),
      concat(lit("g"), col("id") % 4).as("grp"))
    val dt = LakeTable.create(spark, dp, TableSpec("cdk", "dver"),
      dimRows.filter(col("cdk") % 3 =!= 0))
    val mv = MaterializedView.create(spark, mp, ft, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "score")),
      Seq(MvJoin(dp, Seq("ck"), Seq("cdk"), 0L, outer = true)))
    def check(tag: String): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(), col("ck") === col("cdk"), "left_outer")
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("amt")).as("s"),
          max(col("score")).as("mx")))
      val got = rows(MaterializedView.load(spark, mp).read())
      assert(got == want, s"left-join mv != recompute after $tag")
    }
    check("create")
    assert(mv.read().filter(col("grp").isNull).count() == 1,
      "the null-extension group must exist")
    // key BIRTH: first dim rows appear → their null-extended fact rows
    // must move from the NULL group into real groups
    dt.upsert(dimRows.filter(col("cdk") % 6 === 0))
    MaterializedView.load(spark, mp).refresh()
    check("key birth")
    // key DEATH: dim rows vanish → their fact rows re-enter the NULL group
    dt.delete(col("cdk") % 5 === 0)
    MaterializedView.load(spark, mp).refresh()
    check("key death")
    // plain group move (no existence flip) rides the inner-delta term
    dt.upsert(dimRows.filter(col("cdk") % 7 === 1 && col("cdk") % 3 =!= 0
      && col("cdk") % 5 =!= 0)
      .withColumn("grp", lit("gM")).withColumn("dver", lit(1L)))
    MaterializedView.load(spark, mp).refresh()
    check("group move")
    // fact churn incl. an extremum loss in the NULL group (repair path
    // with a NULL dim value: pruning backs off, correctness holds)
    ft.upsert(spark.range(80L).select((col("id") + 9000L).as("k"), lit(1L).as("ver"),
      (col("id") % 30).as("ck"), lit(55).cast("int").as("score"),
      lit(7).cast("decimal(18,2)").as("amt")))
    ft.delete(col("score") >= 90)
    MaterializedView.load(spark, mp).refresh()
    check("fact churn + null-group extremum loss")
    // outer arms must be leaves: a snowflake child keyed off a LEFT arm
    // is rejected with the constraint's message
    val np = tmp()
    LakeTable.create(spark, np, TableSpec("ndk", "nver"),
      Seq((0L, 0L, "n0")).toDF("ndk", "nver", "nname"))
    val err = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, tmp(), ft, Seq("nname"),
        Seq(MvAgg("n", "count", "*")),
        Seq(MvJoin(dp, Seq("ck"), Seq("cdk"), 0L, outer = true),
          MvJoin(np, Seq("grp"), Seq("nname"), 0L)))
    }
    assert(err.getMessage.contains("leaves"), err.getMessage)
  }

  test("FILTERED LEFT-join view over a MoR dim: slice + null-extension maintained under log churn") {
    // the round-9 features composed with the existing matrix: a filtered
    // view over an outer arm whose dim is MoR (births/deaths land as
    // un-compacted log files; the existence probes and the delta diff
    // must read THROUGH the merge)
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"),
      spark.range(600L).select(
        col("id").as("k"), lit(0L).as("ver"), (col("id") % 30).as("ck"),
        (col("id") % 97).cast("int").as("score"),
        (col("id") * 10).cast("decimal(18,2)").as("amt")))
    def dim0 = spark.range(30L).select(
      col("id").as("cdk"), lit(0L).as("dver"),
      concat(lit("g"), col("id") % 4).as("grp"))
    val dt = LakeTable.create(spark, dp, TableSpec("cdk", "dver", mor = true),
      dim0.filter(col("cdk") % 3 =!= 0))
    MaterializedView.create(spark, mp, ft, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "score")),
      Seq(MvJoin(dp, Seq("ck"), Seq("cdk"), 0L, outer = true)),
      filter = Some("score >= 20"))
    def check(tag: String): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(), col("ck") === col("cdk"), "left_outer")
        .filter(col("score") >= 20)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("amt")).as("s"),
          max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        s"filtered outer MoR-dim mv != recompute after $tag")
    }
    check("create")
    // key births + deaths land as MoR LOGS (no compaction before refresh)
    dt.upsert(dim0.filter(col("cdk") % 6 === 0))
    dt.deleteKeys(dim0.filter(col("cdk") % 5 === 0).select("cdk"))
    assert(LakeTable.load(spark, dp).liveFiles(None).exists(_.log),
      "the dim churn must still be un-compacted MoR logs at refresh time")
    MaterializedView.load(spark, mp).refresh()
    check("MoR key births + deaths")
    // fact churn crossing the filter boundary + extremum loss
    ft.upsert(spark.range(100L).select((col("id") + 7000L).as("k"),
      lit(1L).as("ver"), (col("id") % 30).as("ck"),
      (col("id") % 19).cast("int").as("score"),
      lit(5).cast("decimal(18,2)").as("amt")))
    ft.delete(col("score") >= 90)
    MaterializedView.load(spark, mp).refresh()
    check("fact churn across the filter boundary")
  }

  test("LEFT-join transition term opens only the flipped keys' fact files — and zero when none flip") {
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp,
      TableSpec("k", "ver", statsColumns = Seq("ck")),
      spark.range(960L).select(
        col("id").as("k"), lit(0L).as("ver"), (col("id") % 48).as("ck"),
        (col("id") * 10).cast("decimal(18,2)").as("amt"))
        .repartitionByRange(8, col("ck")), bulkInsert = true)
    def dim0 = spark.range(48L).select(
      col("id").as("cdk"), lit(0L).as("dver"),
      concat(lit("g"), col("id") % 6).as("grp"))
    val dt = LakeTable.create(spark, dp, TableSpec("cdk", "dver"),
      dim0.filter(col("cdk") % 3 =!= 0))
    MaterializedView.create(spark, mp, ft, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")),
      Seq(MvJoin(dp, Seq("ck"), Seq("cdk"), 0L, outer = true)))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(), col("ck") === col("cdk"), "left_outer")
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("amt")).as("s")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want)
    }
    check()
    val total = ft.commits.flatMap(_.add).size
    assert(total >= 4, s"need a clustered multi-file fact, got $total")
    // pure group-move churn: NO key flips existence → the transition
    // term must open ZERO fact files
    dt.upsert(dim0.filter(col("cdk") === 7L)
      .withColumn("grp", lit("gM")).withColumn("dver", lit(1L)))
    MaterializedView.lastNullExtScan = None
    MaterializedView.lastNullExtDimScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live0, scanned0) = MaterializedView.lastNullExtScan.getOrElse(
      fail("outer-arm dim churn must run the transition term"))
    assert(scanned0 == 0,
      s"no-flip churn must open zero transition files (opened $scanned0 of $live0)")
    // round 13: the touched keys NET (a rewritten key on both window
    // sides existed at both versions) — a move-only window nets to
    // empty, so the existence probes are skipped outright: zero dim
    // files opened, not just zero fact files
    val (dLive0, dOpened0) = MaterializedView.lastNullExtDimScan.getOrElse(
      fail("the transition must still record the dim-probe seam"))
    assert(dOpened0 == 0,
      s"move-only churn must skip the existence probes (opened $dOpened0 of $dLive0)")
    // birth of ONE key: only its ck slice of the clustered fact opens
    dt.upsert(dim0.filter(col("cdk") === 3L))
    MaterializedView.lastNullExtScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live1, scanned1) = MaterializedView.lastNullExtScan.getOrElse(
      fail("a key birth must run the transition term"))
    assert(scanned1 > 0 && scanned1 < live1,
      s"one key's birth must open a minority of fact files (opened $scanned1 of $live1)")
  }

  test("a no-op refresh at an auto-prune cadence multiple runs ZERO Spark jobs") {
    // regression guard for the round-8 gating fix: the tombstone-count
    // scan must fire only when the state version ADVANCED during the
    // call — a streaming caller's no-op refresh (no base churn) that
    // happens to land on a cadence multiple must stay metadata-only. A
    // future refactor that re-introduces the per-call scan is invisible
    // to correctness specs; only the job count catches it.
    val bp = tmp(); val mp = tmp()
    val t = LakeTable.create(spark, bp, TableSpec("k", "ver"), baseRows(100))
    val mv = MaterializedView.create(spark, mp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")))
    // drive the STATE version onto a cadence multiple (16) with real
    // refreshes; compaction commits may land too, so loop on the version
    var i = 0
    while (mv.state.latestVersion % 16 != 0 || mv.state.latestVersion == 0) {
      i += 1
      assert(i < 40, s"state version never hit a cadence multiple")
      t.upsert(baseRows(100).filter(col("k") % 7 === i % 7)
        .withColumn("ver", lit(i.toLong)))
      mv.refresh()
    }
    val vAt = mv.state.latestVersion
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      mv.refresh() // nothing to do: cursors already at every member head
      var last = -1
      while (n.get() != last) { last = n.get(); Thread.sleep(300) }
    } finally spark.sparkContext.removeSparkListener(l)
    assert(n.get() == 0,
      s"a no-op refresh at state version $vAt must run zero jobs, ran ${n.get()}")
    assert(mv.state.latestVersion == vAt, "a no-op refresh must not commit")
  }

  test("DIM-side expression-dim (time-bucket) repair chases through the join and prunes the fact scan") {
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    // fact clustered on the join key ck with per-file ck stats; the
    // bucket source c_since lives on the DIM — the shape that falls out
    // of BOTH fact-side pruners (monotonicBucketPruner needs a base
    // column, the bare-column chase needs a bare dim)
    val fact0 = spark.range(960L).select(
      col("id").as("k"), lit(0L).as("ver"), (col("id") % 48).as("ck"),
      (col("id") * 7 % 100).cast("int").as("score"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"))
      .repartitionByRange(8, col("ck"))
    // 4 customers per day across 12 days
    val dim0 = spark.range(48L).select(
      col("id").as("cdk"), lit(0L).as("dver"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id/4 AS INT),0,0,0)")
        .as("c_since"))
    val ft = LakeTable.create(spark, fp,
      TableSpec("k", "ver", statsColumns = Seq("ck")), fact0, bulkInsert = true)
    LakeTable.create(spark, dp, TableSpec("cdk", "dver"), dim0)
    val mv = MaterializedView.create(spark, mp, ft, Seq("sday"),
      Seq(MvAgg("n", "count", "*"), MvAgg("mx", "max", "score")),
      Seq(MvJoin(dp, "ck", "cdk")),
      dimExprs = Map("sday" -> "date_trunc('DAY', c_since)"))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(), col("ck") === col("cdk"))
        .withColumn("sday", expr("date_trunc('DAY', c_since)"))
        .groupBy("sday").agg(count(lit(1)).as("n"), max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "dim-side expr-dim mv != recompute")
    }
    check()
    val total = ft.commits.flatMap(_.add).size
    assert(total >= 4, s"need a clustered multi-file fact, got $total")
    // lose the max of exactly the FIRST day's groups (cdk 0-3): the
    // repair must invert the affected day to those dim rows, chase their
    // keys to ck, and open only that ck slice of the fact
    ft.delete(col("ck") < 4 && col("score") >= 50)
    MaterializedView.lastRepairScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live, scanned) = MaterializedView.lastRepairScan.getOrElse(
      fail("an extremum loss must run the repair path"))
    assert(scanned < live,
      s"dim-side expr-dim repair must prune the fact scan (scanned $scanned of $live files)")
  }

  test("MoR base and MoR chain dim maintain incrementally under upsert/delete churn") {
    val fp = tmp(); val cp = tmp(); val mp = tmp()
    val fact0 = spark.range(400L).select(
      col("id").as("k"), lit(0L).as("ver"), (col("id") % 20).as("ck"),
      when(col("id") % 11 === 0, lit(null).cast("int"))
        .otherwise((col("id") % 100).cast("int")).as("score"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"))
    val cust0 = spark.range(20L).select(
      col("id").as("cdk"), lit(0L).as("cver"),
      concat(lit("g"), col("id") % 4).as("grp"))
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver", mor = true), fact0)
    val ct = LakeTable.create(spark, cp, TableSpec("cdk", "cver", mor = true), cust0)
    val mv = MaterializedView.create(spark, mp, ft, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mn", "min", "score"), MvAgg("mx", "max", "score")),
      Seq(MvJoin(cp, "ck", "cdk")))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, cp).read(), col("ck") === col("cdk"))
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("amt")).as("s"),
          min(col("score")).as("mn"), max(col("score")).as("mx")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want,
        "MoR mv != _rt recompute")
    }
    check()
    // wave 1: pure-log churn — upserts to existing keys (value + group
    // moves), brand-new keys, keyed deletes (tombstones). NO compaction:
    // the delta must fold log rows and tombstones itself.
    ft.upsert(fact0.filter(col("k") % 7 === 1).withColumn("ver", lit(1L))
      .withColumn("amt", col("amt") + lit(2.5).cast("decimal(18,2)"))
      .withColumn("ck", (col("ck") + 3) % 20))
    ft.upsert(spark.range(60L).select((col("id") + 9000L).as("k"),
      lit(1L).as("ver"), (col("id") % 20).as("ck"),
      (col("id") % 100).cast("int").as("score"),
      lit(7.77).cast("decimal(18,2)").as("amt")))
    ft.deleteKeys(spark.range(30L).select((col("id") * 13).as("k")))
    ct.upsert(cust0.filter(col("cdk") % 5 === 2).withColumn("cver", lit(1L))
      .withColumn("grp", lit("gmoved")))
    assert(LakeTable.load(spark, fp).liveFiles(None).exists(_.log),
      "the wave must still be un-compacted logs when the view refreshes")
    MaterializedView.load(spark, mp).refresh()
    check()
    // wave 2: a compaction inside the window (its carried rows must
    // cancel), then more log churn on top
    ft.compact()
    ft.upsert(fact0.filter(col("k") % 10 === 3).withColumn("ver", lit(2L))
      .withColumn("score", lit(99).cast("int")))
    ft.deleteKeys(spark.range(5L).select((col("id") + 9000L).as("k")))
    MaterializedView.load(spark, mp).refresh()
    check()
    // wave 3: tombstone then re-insert the same key (higher precombine)
    ft.deleteKeys(spark.range(1L).select(lit(2L).as("k")))
    ft.upsert(spark.range(1L).select(lit(2L).as("k"), lit(3L).as("ver"),
      lit(0L).as("ck"), lit(55).cast("int").as("score"),
      lit(1.25).cast("decimal(18,2)").as("amt")))
    MaterializedView.load(spark, mp).refresh()
    check()
    // no-op refresh converges and stays consistent
    MaterializedView.load(spark, mp).refresh()
    check()
  }

  test("EXPRESSION-input aggregates maintain under churn; non-row-local inputs rejected at create") {
    // the TPC-H revenue shape: sum/avg/count/max over a row-local
    // expression of the joined row — including a cross-table expression
    // (fact amt × dim weight). Exact types (decimal × int) keep the
    // signed-delta maintenance bit-exact.
    val fp = tmp(); val dp = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"),
      spark.range(400L).select(
        col("id").as("k"), lit(0L).as("ver"), (col("id") % 20).as("ck"),
        (col("id") % 7).cast("string").as("grp"),
        (col("id") * 3).cast("decimal(18,2)").as("amt"),
        when(col("id") % 5 === 0, lit(null).cast("int"))
          .otherwise((col("id") % 9).cast("int")).as("qty")))
    def dimRows = spark.range(20L).select(
      col("id").as("cdk"), lit(0L).as("dver"),
      (col("id") % 4 + 1).cast("int").as("w"))
    val dt = LakeTable.create(spark, dp, TableSpec("cdk", "dver"), dimRows)
    MaterializedView.create(spark, mp, ft, Seq("grp"),
      Seq(MvAgg("rev", "sum", "amt * (qty + 1)"),
        MvAgg("cx", "count", "qty * 2"),
        MvAgg("mxe", "max", "amt * (qty + 1)"),
        MvAgg("ave", "avg", "qty * 10"),
        MvAgg("xw", "sum", "amt * w")),
      Seq(MvJoin(dp, Seq("ck"), Seq("cdk"), 0L)))
    def check(tag: String): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(), col("ck") === col("cdk"))
        .groupBy("grp").agg(
          sum(expr("amt * (qty + 1)")).as("rev"),
          count(expr("qty * 2")).as("cx"),
          max(expr("amt * (qty + 1)")).as("mxe"),
          (sum(expr("qty * 10")).cast("double") /
            count(expr("qty * 10"))).as("ave"),
          sum(expr("amt * w")).as("xw")))
      val got = rows(MaterializedView.load(spark, mp).read())
      assert(got == want, s"expression-agg mv != recompute after $tag\n got $got\nwant $want")
    }
    check("create")
    // fact churn: updates (newer precombine), inserts with NULL qty,
    // deletes taking an expression extremum (repair path over expr(in))
    ft.upsert(spark.range(60L).select((col("id") + 7000L).as("k"),
      lit(1L).as("ver"), (col("id") % 20).as("ck"),
      (col("id") % 7).cast("string").as("grp"),
      lit(2.50).cast("decimal(18,2)").as("amt"),
      when(col("id") % 3 === 0, lit(null).cast("int"))
        .otherwise(lit(4).cast("int")).as("qty")))
    ft.delete(expr("amt * (qty + 1)") >= 2000)
    MaterializedView.load(spark, mp).refresh()
    check("fact churn + expression extremum loss")
    // dim churn: weight changes ride the ΔD term through the expression
    dt.upsert(dimRows.filter(col("cdk") % 3 === 0)
      .withColumn("w", lit(9).cast("int")).withColumn("dver", lit(1L)))
    MaterializedView.load(spark, mp).refresh()
    check("dim weight churn")
    // a group dies and is reborn — expression deltas cancel exactly
    ft.delete(col("grp") === "3")
    MaterializedView.load(spark, mp).refresh()
    ft.upsert(spark.range(10L).select((col("id") + 8000L).as("k"),
      lit(2L).as("ver"), (col("id") % 20).as("ck"), lit("3").as("grp"),
      lit(1.25).cast("decimal(18,2)").as("amt"), lit(2).cast("int").as("qty")))
    MaterializedView.load(spark, mp).refresh()
    check("group death + rebirth")
    // non-row-local input rejected with the constraint's message
    val err = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, tmp(), ft, Seq("grp"),
        Seq(MvAgg("bad", "sum", "max(amt)")),
        Seq(MvJoin(dp, Seq("ck"), Seq("cdk"), 0L)))
    }
    assert(err.getMessage.contains("row-local"), err.getMessage)
  }

  test("snowflake-ancestored LEFT-outer arm (optional chain-tail dim) maintains under births/deaths/moves") {
    // fact ⋈ customer (inner) LEFT nation, the nation key homed on the
    // CUSTOMER dim — the normalized-catalog shape where the chain-tail
    // dim is optional. The transition term must stay correct under
    // nation key births (null rows retract), deaths (null rows appear),
    // renames (no flip — inner delta only), customer moves ACROSS
    // nations (chain change without an existence flip), and fact churn
    // incl. an extremum loss (repair path under a chained outer arm).
    val fp = tmp(); val cp = tmp(); val np = tmp(); val mp = tmp()
    val ft = LakeTable.create(spark, fp, TableSpec("k", "ver"),
      spark.range(600L).select(
        col("id").as("k"), lit(0L).as("ver"), (col("id") % 30).as("ck"),
        (col("id") * 7 % 100).cast("int").as("score"),
        (col("id") * 10).cast("decimal(18,2)").as("amt")))
    def custRows = spark.range(30L).select(
      col("id").as("cdk"), lit(0L).as("cver"), (col("id") % 10).as("nk"))
    val ct = LakeTable.create(spark, cp, TableSpec("cdk", "cver"), custRows)
    def natRows = spark.range(10L).select(
      col("id").as("ndk"), lit(0L).as("nver"),
      concat(lit("nat"), col("id")).as("nname"))
    // nations 0,3,6,9 missing: their customers' fact rows null-extend
    val nt = LakeTable.create(spark, np, TableSpec("ndk", "nver"),
      natRows.filter(col("ndk") % 3 =!= 0))
    MaterializedView.create(spark, mp, ft, Seq("nname"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt"),
        MvAgg("mx", "max", "score")),
      Seq(MvJoin(cp, Seq("ck"), Seq("cdk"), 0L),
        MvJoin(np, Seq("nk"), Seq("ndk"), 0L, outer = true)))
    def check(tag: String): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, cp).read(), col("ck") === col("cdk"))
        .join(LakeTable.load(spark, np).read(), col("nk") === col("ndk"), "left_outer")
        .groupBy("nname").agg(count(lit(1)).as("n"), sum(col("amt")).as("s"),
          max(col("score")).as("mx")))
      val got = rows(MaterializedView.load(spark, mp).read())
      assert(got == want, s"chained-outer mv != recompute after $tag")
    }
    check("create")
    assert(MaterializedView.load(spark, mp).read()
      .filter(col("nname").isNull).count() == 1,
      "the null-extension group must exist")
    // nation key BIRTHS (0 and 6 appear): their customers' fact rows
    // leave the NULL group
    nt.upsert(natRows.filter(col("ndk") % 6 === 0))
    MaterializedView.load(spark, mp).refresh()
    check("chained key birth")
    // nation key DEATH (5 vanishes): its fact rows re-enter the NULL group
    nt.delete(col("ndk") === 5L)
    MaterializedView.load(spark, mp).refresh()
    check("chained key death")
    // rename without a flip rides the inner ΔD term
    nt.upsert(natRows.filter(col("ndk") === 7L)
      .withColumn("nname", lit("renamed")).withColumn("nver", lit(1L)))
    MaterializedView.load(spark, mp).refresh()
    check("no-flip rename")
    // CUSTOMER churn: a customer moves to a dead nation (its rows join
    // the NULL group through the chain) and another is deleted
    ct.upsert(custRows.filter(col("cdk") === 4L)
      .withColumn("nk", lit(3L)).withColumn("cver", lit(1L)))
    ct.delete(col("cdk") === 11L)
    MaterializedView.load(spark, mp).refresh()
    check("parent-dim churn")
    // fact churn + extremum loss in a null-extended group
    ft.upsert(spark.range(50L).select((col("id") + 9000L).as("k"),
      lit(1L).as("ver"), (col("id") % 30).as("ck"),
      lit(55).cast("int").as("score"), lit(7).cast("decimal(18,2)").as("amt")))
    ft.delete(col("score") >= 90)
    MaterializedView.load(spark, mp).refresh()
    check("fact churn + extremum loss")
    // simultaneous churn on all three tables in one refresh window
    nt.upsert(natRows.filter(col("ndk") === 9L))
    ct.upsert(custRows.filter(col("cdk") === 13L)
      .withColumn("nk", lit(9L)).withColumn("cver", lit(2L)))
    ft.delete(col("k") % 17 === 0)
    MaterializedView.load(spark, mp).refresh()
    check("three-table window")
  }

  test("chained-outer transition term chases flipped keys to fact files; probes open only touched dim files") {
    val fp = tmp(); val cp = tmp(); val np = tmp(); val mp = tmp()
    // ck-clustered fact: each file covers a narrow ck range, so a chased
    // flipped-key IN should open only the affected slice
    val ft = LakeTable.create(spark, fp,
      TableSpec("k", "ver", statsColumns = Seq("ck")),
      spark.range(960L).select(
        col("id").as("k"), lit(0L).as("ver"), (col("id") % 48).as("ck"),
        (col("id") * 10).cast("decimal(18,2)").as("amt"))
        .repartitionByRange(8, col("ck")), bulkInsert = true)
    // each nation owns a CONTIGUOUS ck slice (cdk/8), so one nation's
    // flip chases to a narrow fact-key range
    def custRows = spark.range(48L).select(
      col("id").as("cdk"), lit(0L).as("cver"), (col("id") / 8).as("nk"))
    LakeTable.create(spark, cp, TableSpec("cdk", "cver"), custRows)
    def natRows = spark.range(6L).select(
      col("id").as("ndk"), lit(0L).as("nver"),
      concat(lit("nat"), col("id")).as("nname"))
    // ndk-clustered nation dim with ≥4 files: the existence probes
    // should open only the touched key's file(s)
    val nt = LakeTable.create(spark, np,
      TableSpec("ndk", "nver", statsColumns = Seq("ndk")),
      natRows.filter(col("ndk") =!= 3L).repartitionByRange(4, col("ndk")),
      bulkInsert = true)
    MaterializedView.create(spark, mp, ft, Seq("nname"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")),
      Seq(MvJoin(cp, Seq("ck"), Seq("cdk"), 0L),
        MvJoin(np, Seq("nk"), Seq("ndk"), 0L, outer = true)))
    def check(): Unit = {
      val want = rows(LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, cp).read(), col("ck") === col("cdk"))
        .join(LakeTable.load(spark, np).read(), col("nk") === col("ndk"), "left_outer")
        .groupBy("nname").agg(count(lit(1)).as("n"), sum(col("amt")).as("s")))
      assert(rows(MaterializedView.load(spark, mp).read()) == want)
    }
    check()
    val totalFact = ft.commits.flatMap(_.add).size
    assert(totalFact >= 4, s"need a clustered multi-file fact, got $totalFact")
    val totalNat = nt.commits.flatMap(_.add).size
    assert(totalNat >= 3, s"need a clustered multi-file nation dim, got $totalNat")
    // pure rename: NO existence flip → zero transition fact files, and
    // the probes open only the touched key's dim files
    nt.upsert(natRows.filter(col("ndk") === 1L)
      .withColumn("nname", lit("gM")).withColumn("nver", lit(1L)))
    MaterializedView.lastNullExtScan = None
    MaterializedView.lastNullExtDimScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live0, scanned0) = MaterializedView.lastNullExtScan.getOrElse(
      fail("outer-arm dim churn must run the transition term"))
    assert(scanned0 == 0,
      s"no-flip churn must open zero transition fact files (opened $scanned0 of $live0)")
    val (dLive0, dScanned0) = MaterializedView.lastNullExtDimScan.getOrElse(
      fail("outer-arm dim churn must run the existence probes"))
    assert(dScanned0 < dLive0,
      s"probes must open only touched dim files (opened $dScanned0 of $dLive0)")
    // birth of the missing nation: the chase walks ndk=3 → cdk 24-31 →
    // In(ck, 24..31) — only that slice of the clustered fact opens
    nt.upsert(natRows.filter(col("ndk") === 3L))
    MaterializedView.lastNullExtScan = None
    MaterializedView.load(spark, mp).refresh()
    check()
    val (live1, scanned1) = MaterializedView.lastNullExtScan.getOrElse(
      fail("a chained key birth must run the transition term"))
    assert(scanned1 > 0 && scanned1 < live1,
      s"a chained key birth must open a minority of fact files (opened $scanned1 of $live1)")
  }

  test("schema-evolution contract: additive is harmless; rename/drop of a referenced column is a clean error; drop+re-add can never silently diverge") {
    val p = tmp(); val mvp = tmp()
    val t0 = LakeTable.create(spark, p, TableSpec("k", "ver"), baseRows(300))
    val mv = MaterializedView.create(spark, mvp, t0, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")))
    def expectNow(): Set[Seq[Any]] = LakeTable.load(spark, p).read()
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("amt").as("s"))
      .collect().map(_.toSeq).toSet
    def served(): Set[Seq[Any]] =
      mv.read().select("grp", "n", "s").collect().map(_.toSeq).toSet
    // ADDITIVE evolution: a new base column is harmless — churn + refresh
    // stay exact, the view simply never references it
    LakeTable.load(spark, p).addColumns(Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)))
    LakeTable.load(spark, p).upsert(spark.range(300L, 340L).select(
      col("id").as("k"), lit(1L).as("ver"),
      (col("id") % 7).cast("string").as("grp"),
      (col("id") * 10).cast("decimal(18,2)").as("amt"),
      lit(3).as("score"), col("id").as("extra")))
    mv.refresh()
    assert(served() == expectNow(), "additive evolution must stay exact")
    // RENAME of the referenced agg input: refresh fails with the broken
    // reference NAMED (contract error, not a mid-plan AnalysisException)
    LakeTable.load(spark, p).renameColumn("amt", "amount")
    val ex = intercept[IllegalStateException](mv.refresh())
    assert(ex.getMessage.contains("broken column reference") &&
      ex.getMessage.contains("amt"), s"got: ${ex.getMessage}")
    // DESCRIBE MATERIALIZED VIEW surfaces the same broken state
    val rows = graft.sql.GraftDescribeMaterializedViewCommand(s"'$mvp'").run(spark)
    val broken = rows.filter(_.getString(0) == "broken_reference").map(_.getString(1))
    assert(broken.exists(_.contains("amt")),
      s"DESCRIBE must surface the broken reference (got $broken)")
    // the rewrite never serves a broken view: the rename commit advanced
    // the base, so the view is stale by construction
    graft.sql.GraftMvRewrite.register(mvp)
    try {
      val q = spark.read.format("graft").load(p)
        .groupBy("grp").agg(count(lit(1)).as("n"))
      assert(q.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
        "a broken (stale) view must never serve")
    } finally graft.sql.GraftMvRewrite.clear()
    // renaming BACK repairs: the physical column id is unchanged, so the
    // incremental state is still exact
    LakeTable.load(spark, p).renameColumn("amount", "amt")
    mv.refresh()
    assert(served() == expectNow(), "rename-back must repair exactly")
    // DROP + RE-ADD can never silently diverge: the re-added column has a
    // FRESH physical id (old values read as NULL) while the stored state
    // still reflects the old values — refresh must refuse cleanly, both
    // immediately after the drop (broken reference) and after the re-add
    // (physical-identity discontinuity)
    LakeTable.load(spark, p).dropColumn("amt")
    val exDrop = intercept[IllegalStateException](mv.refresh())
    assert(exDrop.getMessage.contains("broken column reference"))
    LakeTable.load(spark, p).addColumns(Seq(
      org.apache.spark.sql.types.StructField("amt",
        org.apache.spark.sql.types.DecimalType(18, 2))))
    val exReadd = intercept[IllegalStateException](mv.refresh())
    assert(exReadd.getMessage.contains("dropped (or renamed away) and re-created"),
      s"got: ${exReadd.getMessage}")
    // DESCRIBE still names the view usable-as-of its own state; the
    // broken_reference list is EMPTY now (the name resolves again) — the
    // discontinuity is a refresh-time guard, and the view stays stale so
    // it can never serve
    val rows2 = graft.sql.GraftDescribeMaterializedViewCommand(s"'$mvp'").run(spark)
    assert(rows2.exists(r => r.getString(0) == "fresh" && r.getString(1) == "false"))
  }

  test("binary outer-arm join keys: flip diffing goes by VALUE, so no-flip churn opens zero transition fact files") {
    // ADVICE (round 10): Row.toSeq set-diffing compared Array[Byte] keys
    // by REFERENCE, so every touched binary key looked gained-AND-lost —
    // correct (the terms cancel) but it forced fact reads on every
    // refresh. Pin: an UPDATE-only churn wave on a binary-keyed LEFT dim
    // computes EMPTY flip sets (zero fact files opened); a real death
    // still flips and stays exact.
    val fp = tmp(); val dp = tmp(); val mvp = tmp()
    def bin(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("binary")
    val fact = LakeTable.create(spark, fp, TableSpec("k", "ver"),
      spark.range(400L).select(col("id").as("k"), lit(0L).as("ver"),
        bin(col("id") % 20).as("bk"), (col("id") % 100).as("amt")))
    val dim = LakeTable.create(spark, dp, TableSpec("d_id", "dver"),
      spark.range(15L).select(col("id").as("d_id"), lit(0L).as("dver"),
        bin(col("id")).as("dbk"), concat(lit("n"), col("id") % 4).as("dname")))
    MaterializedView.create(spark, mvp, fact, Seq("dname"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")),
      Seq(MvJoin(dp, Seq("bk"), Seq("dbk"), 0L, outer = true)))
    def check(): Unit = {
      val expect = LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(),
          col("bk") === col("dbk"), "left_outer")
        .groupBy("dname").agg(count(lit(1)).as("n"), sum("amt").as("s"))
        .collect().map(_.toSeq).toSet
      assert(MaterializedView.load(spark, mvp).read()
        .select("dname", "n", "s").collect().map(_.toSeq).toSet == expect)
    }
    check()
    // UPDATE-only dim churn (no key births/deaths): with value-based
    // diffing both flip sets are empty — the transition terms must open
    // ZERO fact files
    dim.upsert(spark.range(5L).select(col("id").as("d_id"), lit(1L).as("dver"),
      bin(col("id")).as("dbk"), concat(lit("m"), col("id") % 4).as("dname")))
    MaterializedView.lastNullExtScan = None
    MaterializedView.load(spark, mvp).refresh()
    check()
    val (live0, scanned0) = MaterializedView.lastNullExtScan.getOrElse(
      fail("outer-arm dim churn must run the transition term"))
    assert(scanned0 == 0,
      s"no-flip binary churn must open zero transition fact files (opened $scanned0 of $live0)")
    // a real DEATH of a binary key flips 1→0: null-extensions appear and
    // the result stays exact end-to-end (binary IN pushdown included)
    dim.delete(col("d_id") === 3L)
    MaterializedView.load(spark, mvp).refresh()
    check()
  }

  test("legacy non-identifier bare input: a column literally named a-b maintains as a COLUMN, never parses as subtraction") {
    // ADVICE (round 10): isBareInput classified `a-b` as an expression;
    // expr("a-b") parses as subtraction — silent wrong state (or an
    // opaque create error). Schema-aware classification treats any known
    // member column name as bare.
    val p = tmp(); val mvp = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"),
      spark.range(200L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 5).cast("string").as("grp"),
        (col("id") % 50).as("a-b")))
    MaterializedView.create(spark, mvp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "a-b"),
        MvAgg("mx", "max", "a-b")))
    def check(): Unit = {
      val expect = LakeTable.load(spark, p).read().groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("`a-b`")).as("s"),
          max(col("`a-b`")).as("mx"))
        .collect().map(_.toSeq).toSet
      assert(MaterializedView.load(spark, mvp).read()
        .select("grp", "n", "s", "mx").collect().map(_.toSeq).toSet == expect)
    }
    check()
    t.upsert(spark.range(200L, 260L).select(col("id").as("k"), lit(1L).as("ver"),
      (col("id") % 5).cast("string").as("grp"), (col("id") % 37).as("a-b")))
    t.delete(col("k") % 11 === 0)
    MaterializedView.load(spark, mvp).refresh()
    check()
  }

  test("type-widening contract: member int→bigint under sum/min/max/avg/hll widens the state in place; DESCRIBE surfaces it pending") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val p = tmp(); val mvp = tmp()
    val t0 = LakeTable.create(spark, p, TableSpec("k", "ver"),
      spark.range(300L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 5).cast("string").as("grp"),
        (col("id") % 40).cast("int").as("v")))
    val mv = MaterializedView.create(spark, mvp, t0, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "v"),
        MvAgg("mn", "min", "v"), MvAgg("mx", "max", "v"),
        MvAgg("av", "avg", "v"), MvAgg("du", "hll", "v")))
    assert(mv.state.schema("mn").dataType == IntegerType)
    LakeTable.load(spark, p).widenColumn("v", LongType)
    // DESCRIBE surfaces the PENDING state widenings before any refresh:
    // the extrema columns follow the member; the running sum is long
    // already and never appears
    val pend = graft.sql.GraftDescribeMaterializedViewCommand(s"'$mvp'")
      .run(spark).filter(_.getString(0) == "type_widening").map(_.getString(1))
    assert(pend.exists(x => x.contains("mn") && x.contains("int") &&
      x.contains("bigint")), s"got $pend")
    assert(pend.exists(_.contains("mx")), s"got $pend")
    assert(!pend.exists(_.contains("s__sum")),
      s"the running long sum needs no widening: $pend")
    // churn with values only the WIDE type can hold, plus RE-OCCURRING
    // small values — the latter pin that a value sketched as int and the
    // same value arriving as bigint land in the same hll buckets
    LakeTable.load(spark, p).upsert(spark.range(300L, 360L).select(
      col("id").as("k"), lit(1L).as("ver"),
      (col("id") % 5).cast("string").as("grp"),
      when(col("id") % 2 === 0, (col("id") % 40).cast("long"))
        .otherwise(col("id") % 3 + 3000000000L).as("v")))
    mv.refresh()
    val st1 = mv.state.schema
    assert(st1("mn").dataType == LongType && st1("mx").dataType == LongType,
      s"state extrema must widen in place: ${st1.simpleString}")
    assert(graft.sql.GraftDescribeMaterializedViewCommand(s"'$mvp'")
      .run(spark).forall(_.getString(0) != "type_widening"),
      "nothing pending after the refresh applied the widening")
    // exact vs recompute — the extrema hold the wide values (a narrow
    // state would have wrapped them through the cast-to-state arithmetic)
    // and the hll estimate equals the exact distinct count (≤ 11 values
    // per group, far below the sketch's exact regime)
    val got = mv.read().select("grp", "n", "s", "mn", "mx", "av", "du")
      .collect().map(_.toSeq).toSet
    val want = LakeTable.load(spark, p).read().groupBy("grp").agg(
      count(lit(1)).as("n"), sum("v").as("s"), min("v").as("mn"),
      max("v").as("mx"),
      (sum("v").cast("double") / count(col("v"))).as("av"),
      countDistinct(col("v")).as("du"))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("type-widening contract: a widened dim column and a widened join key maintain exactly") {
    import org.apache.spark.sql.types.LongType
    val fp = tmp(); val dp = tmp(); val mvp = tmp()
    val fact = LakeTable.create(spark, fp, TableSpec("k", "ver"),
      spark.range(300L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 20).cast("int").as("fk"),
        (col("id") % 9).cast("int").as("b")))
    val dim = LakeTable.create(spark, dp, TableSpec("dk", "dver"),
      spark.range(20L).select(col("id").cast("int").as("dk"),
        lit(0L).as("dver"), concat(lit("s"), col("id") % 4).as("seg")))
    val mv = MaterializedView.create(spark, mvp, fact, Seq("seg", "b"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "k")),
      Seq(MaterializedView.MvJoin(dp, "fk", "dk")))
    def check(): Unit = {
      val want = LakeTable.load(spark, fp).read()
        .join(LakeTable.load(spark, dp).read(), col("fk") === col("dk"))
        .groupBy("seg", "b")
        .agg(count(lit(1)).as("n"), sum("k").as("s"))
        .collect().map(_.toSeq).toSet
      assert(MaterializedView.load(spark, mvp).read()
        .select("seg", "b", "n", "s").collect().map(_.toSeq).toSet == want)
    }
    check()
    // widen the fact-resident DIM COLUMN; wide group values arrive — the
    // state's b column must follow (else the new groups' b would wrap)
    fact.widenColumn("b", LongType)
    fact.upsert(spark.range(300L, 340L).select(col("id").as("k"),
      lit(1L).as("ver"), (col("id") % 20).cast("int").as("fk"),
      (col("id") % 2 + 4000000000L).as("b")))
    MaterializedView.load(spark, mvp).refresh()
    assert(MaterializedView.load(spark, mvp).state.schema("b").dataType == LongType)
    check()
    // widen BOTH sides of the join key (no state column changes — the
    // join coerces), then churn across it: new wide-keyed dim rows and
    // fact rows must join up, and a dim segment move must still repair
    fact.widenColumn("fk", LongType)
    dim.widenColumn("dk", LongType)
    dim.upsert(spark.range(20L, 23L).select((col("id") % 3 + 5000000000L).as("dk"),
      lit(1L).as("dver"), lit("wide").as("seg")))
    fact.upsert(spark.range(340L, 360L).select(col("id").as("k"),
      lit(2L).as("ver"), (col("id") % 3 + 5000000000L).as("fk"),
      (col("id") % 9).cast("long").as("b")))
    dim.upsert(spark.range(2L, 4L).select(col("id").cast("long").as("dk"),
      lit(2L).as("dver"), lit("moved").as("seg")))
    MaterializedView.load(spark, mvp).refresh()
    check()
  }

  test("type-widening contract: decimal precision growth under a sum follows into the state") {
    import org.apache.spark.sql.types.DecimalType
    val p = tmp(); val mvp = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"),
      spark.range(200L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 5).cast("string").as("grp"),
        (col("id") % 37).cast("decimal(10,2)").as("amt")))
    val mv = MaterializedView.create(spark, mvp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")))
    val sumType0 = mv.state.schema("s__sum").dataType
    assert(sumType0 == DecimalType(20, 2), s"got $sumType0")
    t.widenColumn("amt", DecimalType(14, 2))
    t.upsert(spark.range(200L, 230L).select(col("id").as("k"),
      lit(1L).as("ver"), (col("id") % 5).cast("string").as("grp"),
      (col("id") + 100000000000L).cast("decimal(14,2)").as("amt")))
    mv.refresh()
    assert(MaterializedView.load(spark, mvp).state.schema("s__sum").dataType ==
      DecimalType(24, 2), "the stored running sum must follow the widened input")
    val got = MaterializedView.load(spark, mvp).read()
      .select("grp", "n", "s").collect().map(_.toSeq).toSet
    val want = LakeTable.load(spark, p).read().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("amt").as("s"))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("type-widening contract: an EXPRESSION dim follows its widened source column") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val p = tmp(); val mvp = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"),
      spark.range(200L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 30).cast("int").as("v")))
    val mv = MaterializedView.create(spark, mvp, t, Seq("dv"),
      Seq(MvAgg("n", "count", "*")), dimExprs = Map("dv" -> "v * 1"))
    assert(mv.state.schema("dv").dataType == IntegerType)
    t.widenColumn("v", LongType)
    t.upsert(spark.range(200L, 230L).select(col("id").as("k"),
      lit(1L).as("ver"), (col("id") % 2 + 5000000000L).as("v")))
    mv.refresh()
    assert(MaterializedView.load(spark, mvp).state.schema("dv").dataType == LongType,
      "the expression dim's state column must follow the widened source type")
    val got = MaterializedView.load(spark, mvp).read()
      .select("dv", "n").collect().map(_.toSeq).toSet
    val want = LakeTable.load(spark, p).read()
      .groupBy((col("v") * 1).as("dv")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"\n got: $got\nwant: $want")
  }

  test("views over views refuse cleanly at create, as base and as dim") {
    val p = tmp(); val mvp = tmp(); val mvp2 = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"),
      spark.range(50L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 5).cast("string").as("grp")))
    val mv = MaterializedView.create(spark, mvp, t, Seq("grp"),
      Seq(MvAgg("n", "count", "*")))
    val exBase = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, mvp2, mv.state, Seq("grp"),
        Seq(MvAgg("n2", "count", "*")))
    }
    assert(exBase.getMessage.contains("views over views"),
      s"got: ${exBase.getMessage}")
    val exDim = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, mvp2, t, Seq("grp"),
        Seq(MvAgg("n2", "count", "*")),
        Seq(MaterializedView.MvJoin(mv.state.path, "k", "_mv_key")))
    }
    assert(exDim.getMessage.contains("views over views"),
      s"got: ${exDim.getMessage}")
  }
}
