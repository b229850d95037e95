package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Delta-parity TYPE WIDENING: `widenColumn` / `ALTER COLUMN … TYPE` is a
  * metadata-only commit — old files keep their narrow physical encoding
  * and up-convert at read time; new writes use the wide type; lossy
  * changes refuse. */
class WideningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_widen").toString

  test("int→long / float→double / decimal widen without rewriting a file") {
    val path = tmp()
    val df = (1 to 50).map(i => (i.toLong, 1L, i, i.toFloat / 2, BigDecimal(i).setScale(2)))
      .toDF("k", "ver", "n", "f", "d")
      .withColumn("n", col("n").cast("int"))
      .withColumn("d", col("d").cast(DecimalType(10, 2)))
    val t = LakeTable.create(spark, path, TableSpec("k", "ver"), df)
    val filesBefore = t.liveFiles(None).map(_.path).toSet
    t.widenColumn("n", LongType)
    t.widenColumn("f", DoubleType)
    t.widenColumn("d", DecimalType(20, 4))
    val t2 = LakeTable.load(spark, path)
    assert(t2.liveFiles(None).map(_.path).toSet == filesBefore,
      "widening must not rewrite or add any file")
    val out = t2.read()
    assert(out.schema("n").dataType == LongType)
    assert(out.schema("f").dataType == DoubleType)
    assert(out.schema("d").dataType == DecimalType(20, 4))
    // old narrow files read correctly through the wide schema
    assert(out.agg(sum("n")).head().getLong(0) == (1 to 50).sum.toLong)
    assert(math.abs(out.agg(sum("f")).head().getDouble(0) - (1 to 50).map(_ / 2.0).sum) < 1e-9)
    // a new write at the wide type coexists with the narrow files
    t2.upsert(Seq((51L, 1L, 5000000000L, 1.5e100, BigDecimal("123456789012345.6789")))
      .toDF("k", "ver", "n", "f", "d").withColumn("d", col("d").cast(DecimalType(20, 4))))
    val wide = LakeTable.load(spark, path).read().filter(col("k") === 51L).head()
    assert(wide.getAs[Long]("n") == 5000000000L)
    assert(wide.getAs[Double]("f") == 1.5e100)
    // time travel BEFORE the widening serves the narrow schema
    assert(t2.read(Some(0L)).schema("n").dataType == IntegerType)
  }

  test("lossy or unsafe changes refuse") {
    val path = tmp()
    val t = LakeTable.create(spark, path, TableSpec("k", "ver"),
      Seq((1L, 1L, 5, "x", 9L)).toDF("k", "ver", "n", "s", "big"))
    intercept[IllegalArgumentException] { t.widenColumn("n", IntegerType) } // same
    intercept[IllegalArgumentException] { t.widenColumn("n", ShortType) }   // narrow
    intercept[IllegalArgumentException] { t.widenColumn("s", IntegerType) } // string→int
    intercept[IllegalArgumentException] { t.widenColumn("big", DoubleType) } // long→double loses ulps
    intercept[IllegalArgumentException] { t.widenColumn("n", DecimalType(9, 0)) } // too small
    intercept[IllegalArgumentException] { t.widenColumn("missing", LongType) }
    // bucketed record key refuses (hash is type-dependent)
    val bpath = tmp()
    val bt = LakeTable.create(spark, bpath, TableSpec("k", "ver", buckets = 4),
      Seq((1, 1L, "a")).toDF("k", "ver", "v"))
    intercept[IllegalArgumentException] { bt.widenColumn("k", LongType) }
  }

  test("widening interplays: defaulted and sum-stats columns stay exact") {
    import graft.lake.IdentityDef
    val path = tmp()
    val spec = TableSpec("k", "ver",
      defaults = Map("n" -> "7"),
      sumColumns = Seq("n"),
      identity = Map("rid" -> IdentityDef()))
    val t = LakeTable.create(spark, path, spec,
      Seq((1L, 1L, 5)).toDF("k", "ver", "n"))
    t.upsert(Seq((2L, 1L)).toDF("k", "ver")) // default stamps n=7
    // widen the defaulted+summed column: metadata-only, sums stay exact
    t.widenColumn("n", LongType)
    val t2 = LakeTable.load(spark, path)
    assert(t2.read().agg(sum("n")).head().getLong(0) == 12L)
    // a post-widen write with a long-range value coexists with narrow files
    t2.upsert(Seq((3L, 1L, 6000000000L)).toDF("k", "ver", "n"))
    assert(LakeTable.load(spark, path).read().agg(sum("n")).head().getLong(0)
      == 6000000012L)
    // identity unaffected by the widen: ids 1..3 dense
    assert(LakeTable.load(spark, path).read().select("rid").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("catalog SQL ALTER COLUMN TYPE routes to the metadata-only widen") {
    spark.conf.set("spark.sql.catalog.graft_w", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_w.warehouse",
      Files.createTempDirectory("graft_w_wh").toString)
    spark.sql(
      """CREATE TABLE graft_w.db.wt (k BIGINT, ver BIGINT, n INT)
        |USING graft OPTIONS (key 'k', precombine 'ver')""".stripMargin)
    spark.sql("INSERT INTO graft_w.db.wt VALUES (1, 1, 7)")
    spark.sql("ALTER TABLE graft_w.db.wt ALTER COLUMN n TYPE BIGINT")
    val out = spark.sql("SELECT n FROM graft_w.db.wt")
    assert(out.schema("n").dataType == LongType)
    assert(out.head().getLong(0) == 7L)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_w.db.wt ALTER COLUMN n TYPE INT")
    }
    assert(e.getMessage.contains("widening") || e.getMessage.contains("not supported"))
    spark.sql("DROP TABLE graft_w.db.wt")
  }
}
