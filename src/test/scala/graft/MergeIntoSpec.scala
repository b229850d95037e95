package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Envelope, Normalize}

/** S11 stretch: the reference's MERGE INTO statement
  * (`/root/reference/README.md:1213-1224`) runs verbatim through spark.sql
  * against a graft table, via GraftExtensions.
  */
class MergeIntoSpec extends AnyFunSuite {

  /** Dedicated session so the extension applies (the shared test session
    * was built without it). Same SparkContext is reused underneath. */
  lazy val spark: SparkSession = {
    SparkTestSession.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-merge-test"), 4)
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("the reference's MERGE INTO statement runs verbatim and reaches the golden state") {
    val path = Files.createTempDirectory("graft_merge_sql").toString
    Normalize.flatten(Envelope.backfill(spark)).write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql("DROP TABLE IF EXISTS delta_table")
    spark.sql(s"CREATE TABLE delta_table USING graft LOCATION '$path'")
    Normalize.flatten(Envelope.cdc(spark)).createOrReplaceTempView("temp")

    // README.md:1213-1224, verbatim shape
    spark.sql(
      """MERGE INTO delta_table target USING (
        |  SELECT latest_changes.* FROM temp latest_changes
        |  INNER JOIN (
        |    SELECT pk_id, max(updated_at) AS MaxDate
        |    FROM temp
        |    GROUP BY pk_id
        |  ) cm
        |  ON latest_changes.pk_id = cm.pk_id AND latest_changes.updated_at = cm.MaxDate
        |) source
        |ON source.pk_id == target.pk_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val got = spark.sql(
      "SELECT pk_id, name, value, source_metadata.is_deleted FROM delta_table ORDER BY pk_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getBoolean(3))).toSeq
    assert(got == Seq((1, "apple", 10, false), (2, "samsung", 201, false),
      (3, "dell", 30, true), (4, "motorola", 40, false), (5, "htc", 50, false)))
    spark.sql("DROP TABLE delta_table")
  }

  /** Register a 3-row table and a 3-row source view for the generalized
    * clause tests; returns the table name. */
  def mergeFixture(tag: String): String = {
    import spark.implicits._
    val path = Files.createTempDirectory(s"graft_gm_$tag").toString
    Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"))
      .toDF("pk_id", "updated_at", "name").write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql(s"DROP TABLE IF EXISTS gm_$tag")
    spark.sql(s"CREATE TABLE gm_$tag USING graft LOCATION '$path'")
    Seq((2L, 2L, "b2", true), (3L, 2L, "c2", false), (4L, 2L, "d", false))
      .toDF("pk_id", "updated_at", "name", "del").createOrReplaceTempView(s"src_$tag")
    s"gm_$tag"
  }

  def state(table: String): Seq[(Long, Long, String)] =
    spark.sql(s"SELECT pk_id, updated_at, name FROM $table ORDER BY pk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

  test("WHEN MATCHED AND cond THEN DELETE composes with UPDATE/INSERT, first-match-wins") {
    val t = mergeFixture("del")
    spark.sql(
      s"""MERGE INTO $t target USING src_del source
         |ON source.pk_id == target.pk_id
         |WHEN MATCHED AND source.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state(t) == Seq((1L, 1L, "a"), (3L, 2L, "c2"), (4L, 2L, "d")),
      "k1 untouched, k2 deleted, k3 updated, k4 inserted")
    spark.sql(s"DROP TABLE $t")
  }

  test("column-level UPDATE SET assigns only the named column") {
    val t = mergeFixture("set")
    spark.sql(
      s"""MERGE INTO $t target USING src_set source
         |ON source.pk_id == target.pk_id
         |WHEN MATCHED THEN UPDATE SET name = concat(target.name, '+', source.name)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(state(t) == Seq((1L, 1L, "a"), (2L, 1L, "b+b2"), (3L, 1L, "c+c2"), (4L, 2L, "d")),
      "matched rows keep their precombine, only name is assigned")
    spark.sql(s"DROP TABLE $t")
  }

  test("conditional INSERT filters unmatched source rows") {
    val t = mergeFixture("ins")
    spark.sql(
      s"""MERGE INTO $t target USING src_ins source
         |ON source.pk_id == target.pk_id
         |WHEN NOT MATCHED AND source.pk_id < 4 THEN INSERT *""".stripMargin)
    assert(state(t) == Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")),
      "the only unmatched source row (k4) fails the insert condition; matched rows untouched")
    spark.sql(s"DROP TABLE $t")
  }

  test("latest source row per key decides the action (stale DELETE loses to newer UPDATE)") {
    import spark.implicits._
    val t = mergeFixture("multi")
    // key 2: newer update (pc=9) vs stale delete (pc=5); key 3: newer delete
    Seq((2L, 9L, "b9", false), (2L, 5L, "junk", true),
        (3L, 9L, "junk", true), (3L, 5L, "c5", false))
      .toDF("pk_id", "updated_at", "name", "del").createOrReplaceTempView("src_multi2")
    spark.sql(
      s"""MERGE INTO $t target USING src_multi2 source
         |ON source.pk_id == target.pk_id
         |WHEN MATCHED AND source.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(state(t) == Seq((1L, 1L, "a"), (2L, 9L, "b9")),
      "k2 updated by its newest row, k3 deleted by its newest row")
    spark.sql(s"DROP TABLE $t")
  }

  test("key equality may appear after other conjuncts in the merge condition") {
    import spark.implicits._
    val t = mergeFixture("conj")
    Seq((2L, 2L, "b"), (9L, 2L, "z"))
      .toDF("pk_id", "updated_at", "name").createOrReplaceTempView("src_conj2")
    spark.sql(
      s"""MERGE INTO $t target USING src_conj2 source
         |ON source.name = target.name AND source.pk_id = target.pk_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // pk 2 matches on (name, pk); pk 9 is new — key conjunct found second
    assert(state(t) == Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 1L, "c"), (9L, 2L, "z")))
    spark.sql(s"DROP TABLE $t")
  }

  test("WHEN NOT MATCHED BY SOURCE acts on target rows the source misses") {
    val t = mergeFixture("bysrc")
    // source covers pk 2,3,4 — pk 1 is not matched by source
    spark.sql(
      s"""MERGE INTO $t target USING src_bysrc source
         |ON source.pk_id == target.pk_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND target.name = 'zzz' THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = concat(target.name, '!')""".stripMargin)
    assert(state(t) == Seq((1L, 1L, "a!"), (2L, 2L, "b2"), (3L, 2L, "c2"), (4L, 2L, "d")),
      "k1 (unmatched by source, not 'zzz') gets the UPDATE; the rest merge normally")
    spark.sql(
      s"""MERGE INTO $t target USING src_bysrc source
         |ON source.pk_id == target.pk_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(state(t) == Seq((2L, 2L, "b2"), (3L, 2L, "c2"), (4L, 2L, "d")),
      "sync-to-source: the target-only row is deleted")
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL UPDATE and DELETE FROM run against a V1 graft table") {
    val t = mergeFixture("dml")
    spark.sql(s"UPDATE $t SET name = concat(name, '!') WHERE pk_id = 2")
    assert(state(t) == Seq((1L, 1L, "a"), (2L, 1L, "b!"), (3L, 1L, "c")))
    spark.sql(s"DELETE FROM $t WHERE name = 'c'")
    assert(state(t) == Seq((1L, 1L, "a"), (2L, 1L, "b!")))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t SET pk_id = 9 WHERE name = 'a'")
    }
    assert(e.getMessage.contains("record key"))
    spark.sql(s"DROP TABLE $t")
  }

  test("NOT MATCHED BY SOURCE evaluates against the statement snapshot, not post-merge state") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_bysrc_snap").toString
    Seq((1L, 1L, "active"), (2L, 1L, "active"))
      .toDF("pk_id", "updated_at", "status").write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql("DROP TABLE IF EXISTS snap_t")
    spark.sql(s"CREATE TABLE snap_t USING graft LOCATION '$path'")
    Seq((1L, 2L)).toDF("pk_id", "updated_at").createOrReplaceTempView("snap_src")
    // the MATCHED clause updates pk 1 out of the ON condition; the by-source
    // pass must still see the pre-merge row as matched (pinned snapshot) —
    // otherwise pk 1 is updated AND deleted by one statement
    spark.sql(
      """MERGE INTO snap_t target USING snap_src source
        |ON source.pk_id == target.pk_id AND target.status = 'active'
        |WHEN MATCHED THEN UPDATE SET status = 'retired'
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = spark.sql("SELECT pk_id, status FROM snap_t ORDER BY pk_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "retired")), s"pk1 retired, pk2 (unmatched-by-source) deleted; got $got")
    spark.sql("DROP TABLE snap_t")
  }

  test("by-source DELETE must not swallow a same-key INSERT from an extra ON conjunct") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_bysrc_ins").toString
    Seq((5L, 1L, "inactive"), (6L, 1L, "active"))
      .toDF("pk_id", "updated_at", "status").write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql("DROP TABLE IF EXISTS insdel_t")
    spark.sql(s"CREATE TABLE insdel_t USING graft LOCATION '$path'")
    Seq((5L, 2L, "fresh"), (6L, 2L, "active"))
      .toDF("pk_id", "updated_at", "status").createOrReplaceTempView("insdel_src")
    // pk 5 fails the ON conjunct (old row inactive) → source row INSERTs and
    // the old target row is by-source-deleted; the fresh insert must survive
    spark.sql(
      """MERGE INTO insdel_t target USING insdel_src source
        |ON source.pk_id == target.pk_id AND target.status = 'active'
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = spark.sql("SELECT pk_id, updated_at, status FROM insdel_t ORDER BY pk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((5L, 2L, "fresh"), (6L, 2L, "active")), s"got $got")
    spark.sql("DROP TABLE insdel_t")
  }

  test("by-source-only MERGE commits no empty main-pass version") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_bysrc_only").toString
    Seq((1L, 1L, "a"), (2L, 1L, "b"))
      .toDF("pk_id", "updated_at", "name").write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql("DROP TABLE IF EXISTS bonly_t")
    spark.sql(s"CREATE TABLE bonly_t USING graft LOCATION '$path'")
    Seq(Tuple1(1L)).toDF("pk_id").createOrReplaceTempView("bonly_src")
    val before = graft.lake.LakeTable.load(spark, path).history.count()
    spark.sql(
      """MERGE INTO bonly_t target USING bonly_src source
        |ON source.pk_id == target.pk_id
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val t = graft.lake.LakeTable.load(spark, path)
    assert(t.history.count() == before + 1, "exactly one commit (the delete), no empty upsert")
    assert(t.read().select("pk_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    spark.sql("DROP TABLE bonly_t")
  }

  test("maintenance SQL: OPTIMIZE, OPTIMIZE ZORDER BY, VACUUM, DESCRIBE HISTORY") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_maint_sql").toString
    (1L to 200L).map(i => (i, 1L, i % 7, i % 5, s"v$i")).toDF("pk_id", "updated_at", "a", "b", "name")
      .repartition(8)
      .write.format("graft").option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql(s"DROP TABLE IF EXISTS maint_t")
    spark.sql(s"CREATE TABLE maint_t USING graft LOCATION '$path'")

    spark.sql("OPTIMIZE maint_t") // small-file concatenation
    val afterOpt = graft.lake.LakeTable.load(spark, path)
    assert(afterOpt.read().count() == 200)

    spark.sql("OPTIMIZE maint_t ZORDER BY (a, b)")
    assert(graft.lake.LakeTable.load(spark, path).read().count() == 200)

    val hist = spark.sql(s"DESCRIBE HISTORY '$path'")
    val ops = hist.select("operation").collect().map(_.getString(0)).toSeq
    assert(hist.columns.contains("version") && ops.contains("zorder"),
      s"history must list the zorder commit, got $ops")

    spark.sql("VACUUM maint_t RETAIN 0 HOURS") // drop pre-optimize files
    val t = graft.lake.LakeTable.load(spark, path)
    assert(t.read().count() == 200, "vacuum must keep the live version readable")

    val detail = spark.sql("DESCRIBE DETAIL maint_t").collect().head
    assert(detail.getAs[String]("format") == "graft" &&
      detail.getAs[String]("key") == "pk_id" &&
      detail.getAs[Long]("num_rows") == 200)

    val vNow = t.latestVersion
    spark.sql(s"UPDATE maint_t SET name = 'gone' WHERE pk_id <= 100")
    spark.sql(s"RESTORE TABLE maint_t TO VERSION AS OF $vNow")
    val names = graft.lake.LakeTable.load(spark, path).read()
      .where("pk_id <= 100 AND name = 'gone'").count()
    assert(names == 0, "RESTORE must bring back the pre-update rows")
    spark.sql("DROP TABLE maint_t")
  }

  test("SHOW PARTITIONS answers from the commit log") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_showparts").toString
    Seq((1L, 1L, "us", "a"), (2L, 1L, "eu", "b"))
      .toDF("pk_id", "updated_at", "region", "name")
      .write.format("graft").option("key", "pk_id").option("precombine", "updated_at")
      .option("partition", "region").mode("overwrite").save(path)
    val got = spark.sql(s"SHOW PARTITIONS '$path'").collect().map(_.getString(0)).toSet
    assert(got == Set("region=us", "region=eu"))
    // non-graft targets keep Spark's own SHOW PARTITIONS path
    val e = intercept[Exception] { spark.sql("SHOW PARTITIONS no_such_graft_tbl") }
    assert(!e.isInstanceOf[scala.MatchError])
  }

  test("partitioned table: MERGE record identity is (key, partition)") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_gm_part").toString
    // same key (1) in two partitions — two distinct records
    Seq((1L, 1L, "us", "a"), (1L, 1L, "eu", "b"), (2L, 1L, "us", "c"))
      .toDF("pk_id", "updated_at", "region", "name").write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .option("partition", "region")
      .mode("overwrite").save(path)
    spark.sql("DROP TABLE IF EXISTS gm_part")
    spark.sql(s"CREATE TABLE gm_part USING graft LOCATION '$path'")
    Seq((1L, 2L, "us", "a2", true), (2L, 2L, "us", "c2", false))
      .toDF("pk_id", "updated_at", "region", "name", "del")
      .createOrReplaceTempView("src_part")
    spark.sql(
      """MERGE INTO gm_part target USING src_part source
        |ON source.pk_id == target.pk_id AND source.region == target.region
        |WHEN MATCHED AND source.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val got = spark.sql(
      "SELECT pk_id, region, name FROM gm_part ORDER BY pk_id, region")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "eu", "b"), (2L, "us", "c2")),
      "(1,us) deleted and (1,eu) survives — a key-only delete would kill both")

    // by-source DELETE must also respect partition identity: source covers
    // only the us partition rows, so the eu record is "not matched by
    // source" and dies; its same-key us sibling must not.
    spark.sql(
      """MERGE INTO gm_part target USING src_part source
        |ON source.pk_id == target.pk_id AND source.region == target.region
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got2 = spark.sql(
      "SELECT pk_id, region, name FROM gm_part ORDER BY pk_id, region")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got2 == Seq((1L, "us", "a2"), (2L, "us", "c2")),
      "(1,eu) unmatched-by-source dies; same-key (1,us) re-upserted survives")
    spark.sql("DROP TABLE gm_part")
  }

  test("unsupported MERGE shapes fail loudly, not silently") {
    val t = mergeFixture("bad")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $t target USING src_bad source
           |ON source.pk_id == target.pk_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT (pk_id) VALUES (source.pk_id)""".stripMargin)
    }
    assert(e.getMessage.contains("INSERT *"))
    val e2 = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $t target USING src_bad source
           |ON source.updated_at > target.updated_at
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e2.getMessage.contains("source.<key> = target.<key>"))
    spark.sql(s"DROP TABLE $t")
  }
}
