package graft.tools

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev tool: decompose minhashPairs cost at sf0.1. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("mh-profile", 32)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id") < 2000)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s  (n=$n)")
    }
    println("docs: " + docs.count())
    time("shingles only")(docs.select(Dedup.shingles(col("text"), 4).as("sh")).select(sum(size(col("sh")))).head().getLong(0))
    time("signatures")(Dedup.minhashSignatures(docs, 64, 4, "text", "doc_id").count())
    time("signatures again")(Dedup.minhashSignatures(docs, 64, 4, "text", "doc_id").count())
    time("candidates")(Dedup.minhashCandidates(docs, 64, 16, 4).count())
    time("full pairs")(Dedup.minhashPairs(docs, 0.6, 64, 16, 4).count())
    spark.stop()
  }
}
