package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names — dump only those
    // (local iteration aid; the driver always uses the 2-arg form)
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, Option.empty[Set[String]])
      case Array(s, o, names) => (s, o, Some(names.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_DECOY_MV=1 turns the whole oracle corpus into a fuzz harness
    // for the MV-rewrite rule: one decoy view over an UNRELATED table is
    // registered and the rule injected into THIS session's optimizer, so
    // every Aggregate of every query plans through the matcher while the
    // decoy can never legitimately serve any of them. Done = the sweep
    // stays oracle-green (checked by tools/check_oracle.py as usual) AND
    // the rule swallowed zero matcher errors — the r8 inlineProjects
    // crash class can no longer hide from the 166 oracles.
    val decoy = sys.env.get("GRAFT_DECOY_MV").exists(v =>
      v == "1" || v.equalsIgnoreCase("true"))
    if (decoy) {
      import org.apache.spark.sql.functions._
      val dir = Files.createTempDirectory("graft_decoy_mv").toString
      val tbl = graft.lake.LakeTable.create(spark, s"$dir/base",
        graft.lake.TableSpec("k", "ver"),
        spark.range(100L).select(col("id").as("k"), lit(0L).as("ver"),
          (col("id") % 5).cast("string").as("grp"), (col("id") % 7).as("amt")))
      graft.lake.MaterializedView.create(spark, s"$dir/mv", tbl, Seq("grp"),
        Seq(graft.lake.MvAgg("n", "count", "*"),
          graft.lake.MvAgg("s", "sum", "amt")))
      graft.sql.GraftMvRewrite.register(s"$dir/mv")
      // second decoy: a JOIN view (fact ⋈ dim over unrelated tables) —
      // its nonempty join signature exercises extraArmsOf's sub-multiset
      // matching, and the dry-run seam below runs the full JOIN-BACK
      // matcher (extraArmsOf, jbCtx provenance validation, serve-plan
      // building) for every registered view against every join/star
      // query in the corpus, discarding the result — so the matcher
      // surface the base-path candidate pre-filter would otherwise hide
      // from a fixed decoy is fuzzed by the whole oracle population.
      val dimT = graft.lake.LakeTable.create(spark, s"$dir/dim",
        graft.lake.TableSpec("dk", "dver"),
        spark.range(20L).select(col("id").as("dk"), lit(0L).as("dver"),
          concat(lit("d"), col("id") % 3).as("dname")))
      val factT = graft.lake.LakeTable.create(spark, s"$dir/fact",
        graft.lake.TableSpec("fk", "fver"),
        spark.range(100L).select(col("id").as("fk"), lit(0L).as("fver"),
          (col("id") % 20).as("fdk"), (col("id") % 9).as("famt")))
      graft.lake.MaterializedView.create(spark, s"$dir/mv2", factT,
        Seq("dname"),
        Seq(graft.lake.MvAgg("n2", "count", "*"),
          graft.lake.MvAgg("s2", "sum", "famt")),
        Seq(graft.lake.MaterializedView.MvJoin(
          s"$dir/dim", Seq("fdk"), Seq("dk"), dimT.latestVersion)))
      graft.sql.GraftMvRewrite.register(s"$dir/mv2")
      graft.sql.GraftMvRewrite.fuzzJoinBackDryRun = true
      graft.sql.GraftMvRewrite.rewriteErrors = 0L
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.sql.GraftMvRewrite
      System.err.println(s"[verify] decoy MVs at $dir/mv and $dir/mv2 " +
        "(join decoy + join-back dry-run fuzz); rewrite rule injected")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // write the oracle json FIRST: a hanging/crashing query must not cost
    // the round every other query's correctness check
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (decoy) {
      val errs = graft.sql.GraftMvRewrite.rewriteErrors
      graft.sql.GraftMvRewrite.fuzzJoinBackDryRun = false
      graft.sql.GraftMvRewrite.clear()
      System.err.println(s"[verify] decoy sweep done; rewriteErrors=$errs")
      if (errs != 0L) {
        System.err.println("[verify] FAIL: the rewrite rule swallowed " +
          s"$errs matcher error(s) during the decoy sweep")
        spark.stop()
        sys.exit(1)
      }
    }
    spark.stop()
  }
}
