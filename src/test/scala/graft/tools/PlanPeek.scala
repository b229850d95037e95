package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: print the analyzed plan shapes of grouping-sets queries so
  * the MV grouping-sets serving can be built against the real node
  * structure (Aggregate ← Expand ← Project ← scan). Run:
  * `sbt "Test/runMain graft.tools.PlanPeek"`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("planpeek").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, s"g${i % 2}", i % 3, i % 5))
      .toDF("k", "a", "b", "amt")
    df.createOrReplaceTempView("t")
    for (q <- Seq(
      "SELECT a, b, count(1) AS n, sum(amt) AS s FROM t GROUP BY ROLLUP(a, b)",
      "SELECT a, b, grouping(a) AS ga, count(1) AS n FROM t GROUP BY CUBE(a, b)",
      "SELECT a, avg(amt) AS av FROM t WHERE b = 1 GROUP BY GROUPING SETS ((a), ())"
    )) {
      println("=== " + q)
      println(spark.sql(q).queryExecution.analyzed.treeString)
    }
    spark.stop()
  }
}
