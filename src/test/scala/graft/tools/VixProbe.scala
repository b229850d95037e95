package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the e13/e14 bench pair's run-to-run variance: builds
  * the same 192x-replicated vix index as Bench.scala, then times the full
  * ADC scan (e14 shape) repeatedly in one JVM and prints the physical plan
  * once. Not part of the driver contract — local diagnosis only. */
object VixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("vix-probe"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("vix_probe").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .crossJoin(spark.range(192).toDF("rep"))
      .withColumn("vec_id", col("vec_id") + col("rep") * 1000000L)
      .drop("rep")
    val t0 = System.nanoTime()
    val vix = graft.ext.VectorIndex.build(spark, dir, corpus, numLists = 16)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 2)
    val df = vix.search(queries, k = 5, rerank = 4)
    df.explain("formatted")
    import java.lang.management.{ManagementFactory => mf}
    def gcMs: Long = mf.getGarbageCollectorMXBeans.stream()
      .mapToLong(_.getCollectionTime).sum()
    def pool(name: String): Long = mf.getMemoryPoolMXBeans.stream()
      .filter(_.getName.contains(name)).mapToLong(_.getUsage.getUsed).sum()
    var lastGc = gcMs
    for (i <- 1 to 16) {
      val tc = System.nanoTime()
      // fixed CPU-bound control: ~32 tasks of pure arithmetic, no I/O
      spark.range(0, 256000000L, 1, 32)
        .select(sum(col("id") % 1000003L)).collect()
      val ctrl = (System.nanoTime() - tc) / 1e9
      val t = System.nanoTime()
      val df = vix.search(queries, k = 5, rerank = 4)
      val tBuild = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlan = System.nanoTime()
      df.collect()
      val tExec = System.nanoTime()
      val g = gcMs
      println(f"rep $i: ${(tExec - t) / 1e9}%.2f s " +
        f"[build=${(tBuild - t) / 1e9}%.2f plan=${(tPlan - tBuild) / 1e9}%.2f " +
        f"exec=${(tExec - tPlan) / 1e9}%.2f]  ctrl=$ctrl%.2f s " +
        f"gc+${g - lastGc}ms " +
        f"heap=${mf.getMemoryMXBean.getHeapMemoryUsage.getUsed / (1 << 20)}M " +
        f"threads=${mf.getThreadMXBean.getThreadCount} " +
        f"wall=${java.time.LocalTime.now()}")
      lastGc = g
      val prdds = spark.sparkContext.getPersistentRDDs
      if (prdds.nonEmpty) println(s"  persistent RDDs: ${prdds.size} " +
        prdds.values.map(r => s"${r.id}:${r.name}").take(8).mkString(", "))
      if (i == 5 || i == 14) {
        val server = mf.getPlatformMBeanServer
        val histo = server.invoke(
          new javax.management.ObjectName("com.sun.management:type=DiagnosticCommand"),
          "gcClassHistogram", Array[AnyRef](null),
          Array("[Ljava.lang.String;")).asInstanceOf[String]
        println(s"--- histo rep $i ---")
        histo.linesIterator.take(28).foreach(println)
      }
    }
    val names = Thread.getAllStackTraces.keySet().toArray(Array.empty[Thread])
      .map(_.getName.replaceAll("[0-9]+", "N"))
    names.groupBy(identity).toSeq.map { case (n, g) => (g.length, n) }
      .sortBy(-_._1).take(15).foreach { case (c, n) => println(f"$c%5d  $n") }
    spark.stop()
  }
}
