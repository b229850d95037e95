package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Column DEFAULTs (write-side): an omitted column takes its expression,
  * a supplied one — explicit nulls included — passes through untouched. */
class DefaultColsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_def").toString

  private val spec = TableSpec("k", "pc",
    defaults = Map("status" -> "'open'", "score" -> "100L"))

  test("omitted default columns stamp; supplied values (and nulls) pass through") {
    val path = tmp()
    // create WITHOUT either default column: both stamp into the schema
    val t = LakeTable.create(spark, path, spec, Seq((1L, 1L, "a")).toDF("k", "pc", "v"))
    val r0 = t.read().head()
    assert(r0.getAs[String]("status") == "open" && r0.getAs[Long]("score") == 100L)
    // upsert omitting both → stamped
    t.upsert(Seq((2L, 1L, "b")).toDF("k", "pc", "v"))
    assert(t.read().filter($"k" === 2L).head().getAs[String]("status") == "open")
    // supplied values win; an explicit null STAYS null (not a generated col)
    t.upsert(Seq((3L, 1L, "c", "closed")).toDF("k", "pc", "v", "status"))
    t.upsert(Seq((4L, 1L, "d")).toDF("k", "pc", "v")
      .withColumn("status", lit(null).cast("string")))
    val rows = t.read().select("k", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(3L) == "closed")
    assert(rows(4L) == null, "explicit null must not be overwritten by the default")
    // rename/drop of a defaulted column refuses
    intercept[IllegalArgumentException] { t.dropColumn("status") }
    intercept[IllegalArgumentException] { t.renameColumn("status", "state") }
  }

  test("V1 writer options declare defaults and identity on a new table") {
    val path = tmp()
    Seq((1L, 1L, "a")).toDF("k", "pc", "v").write.format("graft")
      .option("key", "k").option("precombine", "pc")
      .option("default.status", "'open'")
      .option("identity.rid", "START WITH 10 INCREMENT BY 1")
      .mode("overwrite").save(path)
    val t = LakeTable.load(spark, path)
    val r = t.read().head()
    assert(r.getAs[String]("status") == "open")
    assert(r.getAs[Long]("rid") == 10L)
    t.upsert(Seq((2L, 1L, "b")).toDF("k", "pc", "v"))
    assert(t.read().filter($"k" === 2L).head().getAs[Long]("rid") == 11L)
  }

  test("existence defaults: pre-add rows read the default; post-add nulls stay null") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "pc", "v"))
    t.addColumns(
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType)),
      defaults = Map("score" -> "42"))
    val t2 = LakeTable.load(spark, path)
    // OLD rows (files predate the column): the default, not null
    assert(t2.read().select("score").collect().map(_.getLong(0)).toSeq
      == Seq(42L, 42L))
    // a post-add write with an EXPLICIT null keeps the null
    t2.upsert(Seq((3L, 1L, "c")).toDF("k", "pc", "v")
      .withColumn("score", lit(null).cast("long")))
    // a post-add write omitting the column stamps the write-side default
    t2.upsert(Seq((4L, 1L, "d")).toDF("k", "pc", "v"))
    val rows = t2.read().select("k", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(rows(1L) == 42L && rows(2L) == 42L, "pre-add rows keep the default")
    assert(rows(3L) == null, "genuine post-add null is preserved")
    assert(rows(4L) == 42L, "omitted column takes the write default")
    // DV delete on a pre-add file: survivors still read the default
    t2.deleteVectors(col("k") === 1L)
    assert(LakeTable.load(spark, path).read().filter(col("k") === 2L)
      .head().getAs[Long]("score") == 42L)
    // compaction materializes the defaults physically; reads unchanged
    t2.compact()
    val after = LakeTable.load(spark, path).read().select("k", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(after == Map(2L -> 42L, 3L -> null, 4L -> 42L))
  }

  test("existence defaults through SQL ALTER TABLE ADD COLUMNS ... DEFAULT and the v2 scan") {
    spark.conf.set("spark.sql.catalog.graft_ed", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ed.warehouse",
      Files.createTempDirectory("graft_ed_wh").toString)
    spark.sql(
      """CREATE TABLE graft_ed.db.et (k BIGINT, pc BIGINT, v STRING)
        |USING graft OPTIONS (key 'k', precombine 'pc')""".stripMargin)
    spark.sql("INSERT INTO graft_ed.db.et VALUES (1, 1, 'a')")
    spark.sql("ALTER TABLE graft_ed.db.et ADD COLUMNS (status STRING DEFAULT 'open')")
    // the catalog read path (v2 scan, present-flag fill) serves the default
    val out = spark.sql("SELECT k, status FROM graft_ed.db.et").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "open"), s"got $out")
    spark.sql("INSERT INTO graft_ed.db.et VALUES (2, 1, 'b', 'closed')")
    val out2 = spark.sql("SELECT k, status FROM graft_ed.db.et ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 == Map(1L -> "open", 2L -> "closed"))
    spark.sql("DROP TABLE graft_ed.db.et")
  }

  test("catalog DDL declares defaults via namespaced options") {
    spark.conf.set("spark.sql.catalog.graft_def", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_def.warehouse",
      Files.createTempDirectory("graft_def_wh").toString)
    spark.sql(
      """CREATE TABLE graft_def.db.dt (k BIGINT, pc BIGINT, v STRING, status STRING)
        |USING graft OPTIONS (key 'k', precombine 'pc',
        |  'default.status' "'open'")""".stripMargin)
    val props = spark.sql("SHOW TBLPROPERTIES graft_def.db.dt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("default.status").contains("'open'"))
    spark.sql("DROP TABLE graft_def.db.dt")
  }
}
