package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** CHECK constraints: write-time batch validation (Delta's ALTER TABLE ADD
  * CONSTRAINT analog) — one aggregate pass per write, SQL CHECK NULL
  * semantics, persisted in the table spec across sessions.
  */
class ConstraintSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def mk(tag: String): LakeTable = {
    val path = Files.createTempDirectory(s"graft_check_$tag").toString
    LakeTable.create(spark, path, TableSpec("k", "ts"),
      Seq((1L, 1L, 10), (2L, 1L, 20)).toDF("k", "ts", "value"))
  }

  test("a violating batch fails loudly and names the constraint; valid writes pass") {
    val t = mk("basic")
    t.addConstraint("value_positive", "value > 0")
    t.upsert(Seq((3L, 1L, 30)).toDF("k", "ts", "value")) // fine
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((4L, 1L, -5)).toDF("k", "ts", "value"))
    }
    assert(e.getMessage.contains("value_positive"))
    assert(t.read().count() == 3, "the violating batch must not land")
    // NULL passes (SQL CHECK semantics)
    t.upsert(Seq((5L, 1L, null.asInstanceOf[Integer])).toDF("k", "ts", "value"))
    assert(t.read().count() == 4)
    // persisted: a fresh handle enforces it too
    val t2 = LakeTable.load(spark, t.path)
    intercept[IllegalArgumentException] {
      t2.upsert(Seq((6L, 1L, -1)).toDF("k", "ts", "value"))
    }
  }

  test("addConstraint validates existing rows; dropConstraint lifts enforcement") {
    val t = mk("lifecycle")
    t.upsert(Seq((9L, 1L, -9)).toDF("k", "ts", "value"))
    val e = intercept[IllegalArgumentException] {
      t.addConstraint("value_positive", "value > 0")
    }
    assert(e.getMessage.contains("existing rows"))
    t.addConstraint("value_big", "value > -100")
    intercept[IllegalArgumentException] {
      t.upsert(Seq((10L, 1L, -200)).toDF("k", "ts", "value"))
    }
    t.dropConstraint("value_big")
    t.upsert(Seq((10L, 1L, -200)).toDF("k", "ts", "value"))
    assert(t.read().count() == 4)
  }

  test("UPDATE post-images are constrained") {
    val t = mk("update")
    t.addConstraint("value_positive", "value > 0")
    val e = intercept[IllegalArgumentException] {
      t.update(org.apache.spark.sql.functions.col("k") === 1L,
        Map("value" -> org.apache.spark.sql.functions.lit(-1)))
    }
    assert(e.getMessage.contains("value_positive"))
    assert(t.read().filter("k = 1").select("value").as[Int].head() == 10)
  }

  test("SQL: ALTER TABLE ADD/DROP CONSTRAINT through the parser") {
    SparkTestSession.spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-check-sql"), 4)
      .withExtensions(new graft.sql.GraftExtensions).getOrCreate()
    import s.implicits._
    val path = Files.createTempDirectory("graft_check_sql").toString
    Seq((1L, 1L, 10)).toDF("k", "ts", "value").write.format("graft")
      .option("key", "k").option("precombine", "ts").mode("overwrite").save(path)
    s.sql(s"ALTER TABLE '$path' ADD CONSTRAINT v_pos CHECK (value > 0)")
    val detail = s.sql(s"DESCRIBE DETAIL '$path'").collect().head
    assert(detail.getAs[String]("constraints") == "v_pos CHECK (value > 0)")
    val e = intercept[Exception] {
      Seq((2L, 1L, -2)).toDF("k", "ts", "value").write.format("graft")
        .option("key", "k").option("precombine", "ts").mode("append").save(path)
    }
    assert(e.getMessage.contains("v_pos"))
    s.sql(s"ALTER TABLE '$path' DROP CONSTRAINT v_pos")
    Seq((2L, 1L, -2)).toDF("k", "ts", "value").write.format("graft")
      .option("key", "k").option("precombine", "ts").mode("append").save(path)
    assert(LakeTable.load(s, path).read().count() == 2)
  }
}
