package graft.tools

import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, TableSpec}

/** Throwaway diagnostics main — edited per investigation, never part of a
  * shipped path. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("scratch", 32)
    def tbl(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    def li = tbl("lineitem")
      .withColumn("lkey", col("l_orderkey") * 10 + col("l_linenumber"))
    val liSpec = TableSpec("lkey", "l_shipdate")
    def liSource = {
      val base = li
      base.filter(col("lkey") % 10 === 0)
        .withColumn("l_extendedprice", col("l_extendedprice") + 1.0)
        .withColumn("l_shipdate", col("l_shipdate") + expr("INTERVAL 1 DAY"))
        .unionByName(base.filter(col("lkey") % 50 === 0)
          .withColumn("lkey", col("lkey") + 100000000L))
    }
    val dir = java.nio.file.Files.createTempDirectory("scratch_b2").toString
    LakeTable.create(spark, dir, liSpec, li, bulkInsert = true)
    val cow = LakeTable.load(spark, dir)
    println(s"live files after create: ${cow.liveFileStats}")
    cow.upsert(liSource)
    println(s"live files after upsert: ${cow.liveFileStats}")
    val n = cow.read().count()
    val dupKeys = cow.read().groupBy("lkey").count().filter(col("count") > 1).count()
    val expected = li.count() + li.filter(col("lkey") % 50 === 0).count()
    println(s"rows=$n expected=$expected dupKeys=$dupKeys")
    val bumped = cow.read().filter(col("lkey") % 10 === 0 && col("lkey") < 100000000L)
      .join(li.select(col("lkey"), col("l_extendedprice").as("orig")), "lkey")
      .filter(abs(col("l_extendedprice") - col("orig") - 1.0) > 1e-9).count()
    println(s"unbumped-after-upsert=$bumped (must be 0)")
    spark.stop()
  }
}
