package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Additive schema evolution (mergeSchema): new columns widen the table,
  * pre-evolution files surface nulls, time travel keeps each version's own
  * schema, and un-flagged extras fail loudly.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft_evo").toString

  test("upsert with mergeSchema widens; old rows take nulls; time travel keeps old shape") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))
    t.upsert(Seq((2, 2L, "b2", 3.5), (3, 1L, "c", 7.0)).toDF("k", "pc", "v", "score"),
      mergeSchema = true)
    assert(t.schema.fieldNames.toSeq == Seq("k", "pc", "v", "score"))
    val rows = t.read().select("k", "v", "score").collect()
      .map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set((1, "a", None), (2, "b2", Some(3.5)), (3, "c", Some(7.0))))
    // version 0 keeps the original 3-column shape
    assert(t.read(Some(0)).columns.count(!_.startsWith("_")) == 3)
    // and the widened snapshot still round-trips through another upsert
    t.upsert(Seq((1, 3L, "a2", 9.0)).toDF("k", "pc", "v", "score"))
    assert(t.read().filter(col("k") === 1).select("score").head().getDouble(0) == 9.0)
  }

  test("MoR evolution: realtime merges old base with widened log rows") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc", mor = true),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))
    t.upsert(Seq((2, 2L, "b2", 42L)).toDF("k", "pc", "v", "extra"), mergeSchema = true)
    val rt = t.realtime().select("k", "v", "extra").collect()
      .map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(rt == Set((1, "a", None), (2, "b2", Some(42L))))
    t.compact()
    assert(t.readOptimized().select("extra").collect().length == 2)
  }

  test("extra columns without mergeSchema fail loudly") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((2, 1L, "b", 1.0)).toDF("k", "pc", "v", "oops"))
    }
    assert(e.getMessage.contains("mergeSchema"))
  }
}
