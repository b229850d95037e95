package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = graft.core.GraftSession.local("graft-test", 4)
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every registered query runs and is non-degenerate at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      withClue(s"$name: ") { assert(df.count() >= 0) }
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates match a hand check") {
    val row = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .filter("l_returnflag = 'A' AND l_linestatus = 'F'").collect().head
    assert(row.getAs[Long]("count_order") > 0)
    assert(row.getAs[Double]("sum_base_price") > 0.0)
  }

  test("q05 latest-per-user emits exactly one row per user") {
    val df = SparkEntry.queries("q05_latest_per_user")(spark, sf)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("oracleSql only references registered query names") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("query registries have disjoint names (no silent override on merge)") {
    val all = Seq(
      graft.queries.Relational.defs.keys.toSeq,
      graft.queries.LakeQueries.defs.keys.toSeq,
      graft.queries.ExtQueries.defs.keys.toSeq,
      graft.queries.CdcQueries.defs.keys.toSeq).flatten
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    assert(SparkEntry.queries.size == all.size)
  }
}
