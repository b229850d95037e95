package graft.tools

import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, TableSpec}

/** Dev tool: print the raw FileScan lines for a filtered lake read. */
object ScanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("scan-check", 4)
    val d = "/root/testdata/sf0.01"
    val path = java.nio.file.Files.createTempDirectory("scan_check").toString
    val t = LakeTable.create(spark, path, TableSpec("o_orderkey", "o_orderdate"),
      spark.read.parquet(s"$d/orders.parquet"))
    val fq = t.read().filter(col("o_totalprice") > 300000.0)
      .select("o_orderkey", "o_totalprice")
    fq.collect()
    val plan = fq.queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("FileScan") || l.contains("PushedFilters"))
      .foreach(l => println("SCAN>> " + l.trim.take(400)))
    spark.stop()
  }
}
