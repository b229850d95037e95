package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{IdentityDef, LakeTable, TableSpec}

/** GENERATED ALWAYS AS IDENTITY: deterministic allocation (md5-of-key
  * order), per-key stability across upserts, never-reuse across deletes
  * and overwrites, ALWAYS enforcement, and the catalog DDL round trip. */
class IdentitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(): String = Files.createTempDirectory("graft_id").toString

  private def batch(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", i.toLong, s"p$i")).toDF("pk_id", "updated_at", "payload")
  }

  private val idSpec = TableSpec("pk_id", "updated_at",
    identity = Map("row_id" -> IdentityDef()))

  /** Expected ids for a set of keys: md5-of-key order, offset + step. */
  private def expectedIds(keys: DataFrame, offset: Long, step: Long = 1L): DataFrame = {
    val w = Window.orderBy(md5(col("pk_id").cast("string")).asc, col("pk_id").asc)
    keys.withColumn("exp_id", lit(offset) + lit(step) * row_number().over(w).cast("long"))
  }

  private def assertIds(t: LakeTable, expected: DataFrame): Unit = {
    val got = t.read().select("pk_id", "row_id")
    val diff = got.join(expected.select(col("pk_id"), col("exp_id")), Seq("pk_id"))
      .filter(col("row_id") =!= col("exp_id"))
    assert(diff.isEmpty, s"ids diverge from the md5-order expectation: " +
      diff.collect().take(5).mkString(","))
  }

  test("create assigns 1..n in md5-of-key order; reruns are deterministic") {
    val t = LakeTable.create(spark, tmp(), idSpec, batch(0 until 50))
    val out = t.read()
    assert(out.columns.contains("row_id"))
    val ids = out.select("row_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 50L), "ids must be exactly 1..50")
    assertIds(t, expectedIds(batch(0 until 50).select("pk_id"), 0L))
    // a second table over the same batch allocates identically
    val t2 = LakeTable.create(spark, tmp(), idSpec, batch(0 until 50))
    val a = t.read().select("pk_id", "row_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = t2.read().select("pk_id", "row_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("upsert: existing keys keep their ids, new keys continue from the high mark") {
    val t = LakeTable.create(spark, tmp(), idSpec, batch(0 until 30))
    val before = t.read().select("pk_id", "row_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // keys 20..29 exist (payload updated), 30..39 are new
    t.upsert(batch(20 until 40).withColumn("payload", lit("updated")))
    val after = t.read().select("pk_id", "row_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 30).foreach(i => assert(after(s"k$i") == before(s"k$i"),
      s"existing key k$i must keep its id"))
    val newIds = (30 until 40).map(i => after(s"k$i")).sorted
    assert(newIds == (31L to 40L), s"new keys draw 31..40, got $newIds")
    assertIds(t, expectedIds(batch(30 until 40).select("pk_id"), 30L)
      .unionByName(spark.createDataFrame(before.toSeq).toDF("pk_id", "exp_id")))
  }

  test("deleted keys never get their ids back; overwrite re-ids past the high mark") {
    val t = LakeTable.create(spark, tmp(), idSpec, batch(0 until 10))
    t.delete(col("pk_id") === "k3")
    t.upsert(batch(3 until 4)) // re-insert k3
    val k3 = t.read().filter(col("pk_id") === "k3").select("row_id").head().getLong(0)
    assert(k3 == 11L, s"re-inserted key draws a FRESH id (11), got $k3")
    // overwrite: every key re-draws above the high mark
    t.overwrite(batch(0 until 5))
    val ids = t.read().select("row_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (12L to 16L), s"overwrite ids continue 12..16, got ${ids.toSeq}")
  }

  test("ALWAYS: supplied non-null values are rejected; an all-null column is treated as absent") {
    val t = LakeTable.create(spark, tmp(), idSpec, batch(0 until 5))
    val e = intercept[IllegalArgumentException] {
      t.upsert(batch(5 until 6).withColumn("row_id", lit(99L)))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    // SQL INSERT paths materialize omitted columns as null — accepted
    t.upsert(batch(5 until 6).withColumn("row_id", lit(null).cast("long")))
    assert(t.read().filter(col("pk_id") === "k5").select("row_id").head().getLong(0) == 6L)
  }

  test("START WITH / INCREMENT BY honored, including negative step") {
    val spec = TableSpec("pk_id", "updated_at",
      identity = Map("row_id" -> IdentityDef(start = 100L, step = 10L),
        "neg_id" -> IdentityDef(start = -1L, step = -1L)))
    val t = LakeTable.create(spark, tmp(), spec, batch(0 until 5))
    val rows = t.read().select("row_id", "neg_id").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(100L, 110L, 120L, 130L, 140L))
    assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(-5L, -4L, -3L, -2L, -1L))
    // both columns follow the SAME md5 order
    val pairs = t.read().select("row_id", "neg_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(pairs.map(_._2).toSeq == Seq(-1L, -2L, -3L, -4L, -5L))
  }

  test("MoR: existing keys keep ids through the log-merge read") {
    val spec = idSpec.copy(mor = true)
    val t = LakeTable.create(spark, tmp(), spec, batch(0 until 10))
    val before = t.realtime().select("pk_id", "row_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    t.upsert(batch(5 until 15).withColumn("payload", lit("v2")))
    val after = t.realtime().select("pk_id", "row_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 10).foreach(i => assert(after(s"k$i") == before(s"k$i")))
    assert((10 until 15).map(i => after(s"k$i")).sorted == (11L to 15L))
    // a tombstoned key re-draws (does not resurrect its old id)
    t.deleteKeys(spark.createDataFrame(Seq(Tuple1("k0"))).toDF("pk_id"))
    t.upsert(batch(0 until 1))
    val k0 = t.realtime().filter(col("pk_id") === "k0").select("row_id").head().getLong(0)
    assert(k0 == 16L, s"tombstoned key re-draws 16, got $k0")
  }

  test("clones carry the high-water mark; update cannot assign identity") {
    val t = LakeTable.create(spark, tmp(), idSpec, batch(0 until 8))
    val cl = t.cloneTo(tmp() + "/clone")
    cl.upsert(batch(8 until 9))
    assert(cl.read().filter(col("pk_id") === "k8").select("row_id").head().getLong(0) == 9L,
      "clone continues allocation from the source's mark")
    val e = intercept[IllegalArgumentException] {
      t.update(col("pk_id") === "k1", Map("row_id" -> lit(0L)))
    }
    assert(e.getMessage.contains("IDENTITY"))
    // deep clone (rewrite path forced by a DV) keeps assigned ids verbatim
    val before = t.read().select("pk_id", "row_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    t.deleteVectors(col("pk_id") === "k2")
    val dc = t.deepCloneTo(tmp() + "/deep")
    val after = dc.read().select("pk_id", "row_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before - "k2")
    dc.upsert(batch(9 until 10))
    assert(dc.read().filter(col("pk_id") === "k9").select("row_id").head().getLong(0) == 9L,
      "deep clone continues from the carried mark")
  }

  test("catalog DDL: identity option round-trips and INSERT draws ids") {
    spark.conf.set("spark.sql.catalog.graft_id", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_id.warehouse",
      Files.createTempDirectory("graft_id_wh").toString)
    spark.sql(
      """CREATE TABLE graft_id.db.idt (pk_id STRING, updated_at BIGINT, payload STRING,
        |  row_id BIGINT)
        |USING graft
        |OPTIONS (key 'pk_id', precombine 'updated_at',
        |  'identity.row_id' 'START WITH 1000 INCREMENT BY 1')""".stripMargin)
    spark.sql(
      "INSERT INTO graft_id.db.idt VALUES ('a', 1, 'x', null), ('b', 1, 'y', null)")
    val out = spark.sql("SELECT pk_id, row_id FROM graft_id.db.idt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.toSeq.sorted == Seq(1000L, 1001L), "first value IS the START WITH")
    val props = spark.sql("SHOW TBLPROPERTIES graft_id.db.idt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("identity.row_id").exists(_.contains("START WITH 1000")))
    spark.sql("DROP TABLE graft_id.db.idt")
  }
}
