package graft.tools

import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, TableSpec}

/** Dev tool: decompose the lake bench write paths at sf0.1. */
object LakeProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("lake-profile", 32)
    val d = "/root/testdata/sf0.1"
    def li = spark.read.parquet(s"$d/lineitem.parquet")
      .withColumn("lkey", col("l_orderkey") * 10 + col("l_linenumber"))
    def src = li.filter(col("lkey") % 10 === 0)
      .withColumn("l_extendedprice", col("l_extendedprice") + 1.0)
      .withColumn("l_shipdate", col("l_shipdate") + expr("INTERVAL 1 DAY"))
      .unionByName(li.filter(col("lkey") % 50 === 0).withColumn("lkey", col("lkey") + 100000000L))
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$name%-24s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    li.limit(10000).write.mode("overwrite").format("noop").save()
    val base = java.nio.file.Files.createTempDirectory("lp").toString
    time("cow create (bulk)")(LakeTable.create(spark, s"$base/cow", TableSpec("lkey", "l_shipdate"), li, bulkInsert = true))
    val cow = LakeTable.load(spark, s"$base/cow")
    time("cow upsert")(cow.upsert(src))
    time("mor create (bulk)")(LakeTable.create(spark, s"$base/mor", TableSpec("lkey", "l_shipdate", mor = true), li, bulkInsert = true))
    val mor = LakeTable.load(spark, s"$base/mor")
    time("mor upsert only")(mor.upsert(src))
    time("mor rt read")(mor.realtime().write.mode("overwrite").format("noop").save())
    time("mor compact")(mor.compact())
    spark.stop()
  }
}
