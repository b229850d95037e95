package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits. Data files
  * keep their creation-time physical field names; logical names travel in
  * the commit's schema + column map; dropped names re-added later bind to
  * fresh physical fields, never the old data.
  */
class ColumnMappingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft_cmap").toString

  private def base(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("k"), lit(0L).as("ver"),
      concat(lit("u"), col("id")).as("name"),
      (col("id") * 2).as("score"))

  test("rename is metadata-only and old data reads under the new name") {
    val p = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"), base(100))
    val filesBefore = t.commits.flatMap(_.add).map(_.path).toSet
    t.renameColumn("score", "points")
    assert(t.commits.last.add.isEmpty && t.commits.last.remove.isEmpty,
      "rename must not touch a single file")
    assert(t.schema.fieldNames.toSeq == Seq("k", "ver", "name", "points"))
    val got = t.read().select("k", "points").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 14L)
    assert(t.commits.flatMap(_.add).map(_.path).toSet == filesBefore)
  }

  test("writes after a rename store the ORIGINAL physical name; reads stay logical") {
    val p = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"), base(100))
    t.renameColumn("score", "points")
    t.upsert(base(100).filter(col("k") < 10).withColumn("ver", lit(1L))
      .withColumn("score", col("score") + 1000).withColumnRenamed("score", "points"))
    val got = t.read().select("k", "points").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 1010L && got(50L) == 100L)
    // raw parquet of the NEW file must carry the physical name "score"
    val newDirs = t.commits.last.add.map(a => s"$p/data/${a.path}")
    val raw = spark.read.parquet(newDirs: _*)
    assert(raw.columns.contains("score") && !raw.columns.contains("points"))
  }

  test("drop is metadata-only; re-added name binds to fresh physical, not old data") {
    val p = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"), base(50))
    t.dropColumn("score")
    assert(t.schema.fieldNames.toSeq == Seq("k", "ver", "name"))
    assert(t.commits.last.add.isEmpty, "drop must not rewrite")
    t.addColumns(Seq(StructField("score", LongType)))
    val vals = t.read().select("score").collect().map(r => r.isNullAt(0))
    assert(vals.forall(identity), "re-added column must be all-NULL, not resurrected data")
    assert(t.spec.columnMap("score") == "score_1", "fresh physical mapping")
    // and writing through the re-added column works
    t.upsert(base(50).filter(col("k") === 3).withColumn("ver", lit(1L))
      .withColumn("score", lit(77L)))
    val got = t.read().where(col("k") === 3).select("score").head().getLong(0)
    assert(got == 77L)
  }

  test("mergeSchema refuses to silently reuse a retired column name") {
    val p = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"), base(20))
    t.dropColumn("score")
    val widened = base(20).withColumn("ver", lit(1L))
    val e = intercept[IllegalArgumentException](t.upsert(widened, mergeSchema = true))
    assert(e.getMessage.contains("addColumns"))
  }

  test("time travel shows the pre-rename schema and names") {
    val p = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"), base(30))
    val v0 = t.latestVersion
    t.renameColumn("name", "username")
    t.dropColumn("score")
    assert(t.schema.fieldNames.toSeq == Seq("k", "ver", "username"))
    val old = t.read(Some(v0))
    assert(old.columns.contains("name") && old.columns.contains("score"))
    assert(old.where(col("k") === 4).select("score").head().getLong(0) == 8L)
  }

  test("rename of key/partition/stats/constraint columns is rejected") {
    val p = tmp()
    val t = LakeTable.create(spark, p,
      TableSpec("k", "ver", statsColumns = Seq("score"),
        constraints = Map("name_ok" -> "name IS NOT NULL")), base(10))
    intercept[IllegalArgumentException](t.renameColumn("k", "kk"))
    intercept[IllegalArgumentException](t.renameColumn("ver", "v2"))
    intercept[IllegalArgumentException](t.renameColumn("score", "points"))
    intercept[IllegalArgumentException](t.renameColumn("name", "username"))
    intercept[IllegalArgumentException](t.dropColumn("score"))
  }

  test("MoR realtime merge and compaction work across a rename") {
    val p = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver", mor = true), base(60))
    t.renameColumn("score", "points")
    t.upsert(base(60).filter(col("k") % 4 === 0).withColumn("ver", lit(1L))
      .withColumn("score", col("score") + 500).withColumnRenamed("score", "points"))
    def check(df: DataFrame): Unit = {
      val got = df.select("k", "points").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(4L) == 508L && got(5L) == 10L)
    }
    check(t.realtime())
    t.compact()
    check(t.readOptimized())
  }

  test("rename chains and swap-style reuse keep values straight") {
    val p = tmp()
    val t = LakeTable.create(spark, p, TableSpec("k", "ver"), base(10))
    t.renameColumn("score", "tmp")
    t.renameColumn("tmp", "points")      // chain: points -> physical "score"
    t.renameColumn("name", "label")
    t.addColumns(Seq(StructField("name", StringType))) // reuse a renamed-away name
    val r = t.read().where(col("k") === 2).select("points", "label", "name").head()
    assert(r.getLong(0) == 4L && r.getString(1) == "u2" && r.isNullAt(2))
    assert(t.spec.columnMap("points") == "score")
    assert(t.spec.columnMap("name") == "name_1")
  }
}
