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
  // catalog SQL, a query that itself registers + serves its own MV, and
  // a graft-table JOIN query (q167) so the join-back dry-run fuzz below
  // exercises extraArmsOf/jbCtx against a real join plan population
  private val subset = Seq(
    "q01_pricing_summary", "q05_latest_per_user", "q09_set_ops",
    "q11_rollup", "q20_lake_cow_upsert", "q30_text_stats",
    "q31_dedup_exact", "q56_sql_entry", "q64_avro_roundtrip",
    "q162_mv_rewrite_derived", "q167_mv_joinback",
    // registers + serves its own grouping-sets view while the decoys
    // are active, so the Expand matcher runs against foreign candidates
    "q174_mv_grouping_sets")

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
    // join decoy + dry-run fuzz (mirrors Verify's GRAFT_DECOY_MV mode):
    // the join signature exercises extraArmsOf, and the dry-run seam
    // runs the join-back matcher for every registered view against
    // every graft join/star query, discarding results
    val dimT = LakeTable.create(spark, s"$dir/dim", TableSpec("dk", "dver"),
      spark.range(20L).select(col("id").as("dk"), lit(0L).as("dver"),
        concat(lit("d"), col("id") % 3).as("dname")))
    val factT = LakeTable.create(spark, s"$dir/fact", TableSpec("fk", "fver"),
      spark.range(100L).select(col("id").as("fk"), lit(0L).as("fver"),
        (col("id") % 20).as("fdk"), (col("id") % 9).as("famt")))
    MaterializedView.create(spark, s"$dir/mv2", factT, Seq("dname"),
      Seq(MvAgg("n2", "count", "*"), MvAgg("s2", "sum", "famt")),
      Seq(MaterializedView.MvJoin(s"$dir/dim", Seq("fdk"), Seq("dk"),
        dimT.latestVersion)))
    val before = spark.experimental.extraOptimizations
    try {
      GraftMvRewrite.register(s"$dir/mv")
      GraftMvRewrite.register(s"$dir/mv2")
      GraftMvRewrite.fuzzJoinBackDryRun = true
      GraftMvRewrite.rewriteErrors = 0L
      spark.experimental.extraOptimizations = before :+ GraftMvRewrite
      subset.foreach { n =>
        assert(run(n) == baseline(n), s"$n drifted under the decoy views")
      }
      assert(GraftMvRewrite.rewriteErrors == 0L,
        s"the rule swallowed ${GraftMvRewrite.rewriteErrors} matcher error(s) " +
          "during the decoy subset sweep")
    } finally {
      spark.experimental.extraOptimizations = before
      GraftMvRewrite.fuzzJoinBackDryRun = false
      GraftMvRewrite.clear()
    }
  }
}
