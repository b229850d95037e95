package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.9 depth: graft's islands-based sessionization (q47, oracled in
  * DuckDB) agrees with Spark's native session_window on real data — same
  * session count and same per-session event counts (boundary semantics
  * differ only at exact-gap ties, impossible on ns-random data).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("islands sessionization equals native session_window") {
    val islands = SparkEntry.queries("q47_sessionize")(spark, sf)
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(2 - 1))).groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).sorted.toSeq }

    val native = graft.queries.Tables.events(spark, sf)
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .groupBy(session_window(col("ts_t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).sorted.toSeq }

    assert(islands == native)
  }
}
