package graft.tools

import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, TableSpec}

/** Dev tool: dump the plan facts that matter at scale — pushed filters,
  * read schemas (column pruning), broadcast joins, codegen spans — for the
  * registered queries and a filtered LakeTable read. Run:
  * `sbt "runMain graft.tools.PlanAudit [sfDir]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.local("plan-audit", 8)

    def facts(name: String, plan: String): Unit = {
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters: [")).map(_.trim.take(160)).toSeq.distinct
      val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).map(_.trim.take(160)).toSeq.distinct
      val bcast = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val wscg = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      println(s"== $name  broadcastJoins=$bcast codegenSpans=$wscg")
      pushed.take(4).foreach(l => println(s"   $l"))
      schemas.take(4).foreach(l => println(s"   $l"))
    }

    Seq("q01_pricing_summary", "q02_filter_revenue", "q03_join_agg", "q04_dim_join")
      .foreach { n =>
        val df = graft.queries.Relational.defs(n)._1(spark, d)
        facts(n, df.queryExecution.executedPlan.toString)
      }

    val path = java.nio.file.Files.createTempDirectory("plan_audit").toString
    val t = LakeTable.create(spark, path, TableSpec("o_orderkey", "o_orderdate"),
      spark.read.parquet(s"$d/orders.parquet"))
    val fq = t.read().filter(col("o_totalprice") > 300000.0)
      .select("o_orderkey", "o_totalprice")
    facts("lake_read_filtered", fq.queryExecution.executedPlan.toString)

    spark.stop()
  }
}
