package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, MaterializedView, MvAgg, TableSpec}
import graft.sql.GraftMvRewrite

/** CI-shaped slice of the decoy-MV sweep (`tools/verify_decoy.sh` runs the
  * full 166-query corpus): a decoy materialized view over an UNRELATED
  * table is registered and the rewrite rule injected into the session
  * optimizer, then a representative subset of the driver queries runs —
  * every Aggregate in every plan passes through the MV matcher, none may
  * be served by the decoy, results must be bit-identical to the no-decoy
  * baseline, and the rule must swallow ZERO matcher errors. The round-8
  * inlineProjects crash escaped 438 targeted tests precisely because no
  * spec ran the rule against arbitrary plans; this makes the oracle
  * corpus itself the fuzz harness.
  */
class DecoySweepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-decoy-test"), 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // cheap + shape-diverse: plain agg, window, set ops, GROUPING SETS,
  // lakehouse upsert lifecycle, text/dedup extensions, Avro source,
  // catalog SQL, and a query that itself registers + serves its own MV
  private val subset = Seq(
    "q01_pricing_summary", "q05_latest_per_user", "q09_set_ops",
    "q11_rollup", "q20_lake_cow_upsert", "q30_text_stats",
    "q31_dedup_exact", "q56_sql_entry", "q64_avro_roundtrip",
    "q162_mv_rewrite_derived")

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq.sorted

  test("driver-query subset is decoy-invariant with zero swallowed matcher errors") {
    val baseline = subset.map(n => n -> run(n)).toMap
    val dir = Files.createTempDirectory("graft_decoy_spec").toString
    val tbl = LakeTable.create(spark, s"$dir/base", TableSpec("k", "ver"),
      spark.range(100L).select(col("id").as("k"), lit(0L).as("ver"),
        (col("id") % 5).cast("string").as("grp"), (col("id") % 7).as("amt")))
    MaterializedView.create(spark, s"$dir/mv", tbl, Seq("grp"),
      Seq(MvAgg("n", "count", "*"), MvAgg("s", "sum", "amt")))
    val before = spark.experimental.extraOptimizations
    try {
      GraftMvRewrite.register(s"$dir/mv")
      GraftMvRewrite.rewriteErrors = 0L
      spark.experimental.extraOptimizations = before :+ GraftMvRewrite
      subset.foreach { n =>
        assert(run(n) == baseline(n), s"$n drifted under the decoy view")
      }
      assert(GraftMvRewrite.rewriteErrors == 0L,
        s"the rule swallowed ${GraftMvRewrite.rewriteErrors} matcher error(s) " +
          "during the decoy subset sweep")
    } finally {
      spark.experimental.extraOptimizations = before
      GraftMvRewrite.clear()
    }
  }
}
