package graft.tools

/** Dump `.explain("formatted")` of named declared queries to files — the
  * plans/r13 evidence artifacts. Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  * writes <outDir>/<query>_<suffix>.txt per query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qcsv) = args.take(4)
    val spark = graft.core.GraftSession.local("plan-dump", 8)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val all = graft.SparkEntry.queries
    qcsv.split(",").filter(_.nonEmpty).foreach { q =>
      val df = all(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $q")
    }
    spark.stop()
  }
}
