package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostics main — edited per investigation, never part of a
  * shipped path. Current probe: e1 minhashPairs plan shape under fanIn. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("scratch", 32)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 2000)
    val pairs = graft.ext.Dedup.minhashPairs(docs, threshold = 0.6,
      numHashes = 64, bands = 16, k = 4)
    println(pairs.queryExecution.executedPlan.toString.take(9000))
    val t0 = System.nanoTime()
    pairs.write.mode("overwrite").format("noop").save()
    println(f"NOOP TOOK ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
