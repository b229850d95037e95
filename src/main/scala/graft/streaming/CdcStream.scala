package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.lake.LakeTable

/** Structured Streaming ingestion into a LakeTable — the idiomatic upgrade
  * of the reference's file-at-a-time CDC pickup (SURVEY.md §2.9: Datastream
  * drops files continuously, `/root/reference/README.md:164,189`; the
  * showcase processes them batch-by-hand). Each micro-batch flows through
  * the same precombine-dedup + keyed-upsert path as batch ingest, so
  * streaming and batch converge to identical table states.
  */
object CdcStream {

  /** Stream all files under `dir` (schema-pinned parquet) into `table` via
    * foreachBatch upserts. `availableNow` drains existing files and stops —
    * the batch-test-friendly trigger; pass `continuous=true` for a
    * long-running micro-batch stream. */
  def ingest(spark: SparkSession, table: LakeTable, dir: String, schema: StructType,
      checkpoint: String, continuous: Boolean = false,
      transform: DataFrame => DataFrame = identity): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(if (continuous) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = transform(batch)
        if (!b.isEmpty) table.upsert(b)
        ()
      }
      .start()
    if (!continuous) q.awaitTermination()
  }

  /** [[ingest]] + continuous materialized-view maintenance: each
    * micro-batch upserts into the base table and then `refresh()`es every
    * listed view, so downstream aggregate readers (and the automatic MV
    * rewrite) see results that track the stream batch-by-batch. Both
    * halves are safe under restart replay: the upsert is keyed +
    * precombine-deduped, and refresh() is windowed on the base version —
    * a replayed batch that changed nothing refreshes nothing. Cost per
    * batch ∝ batch churn (never base size), the property that makes a
    * CONTINUOUSLY fresh aggregate affordable at 100 TB.
    *
    * `viewPaths = None` (the default) auto-discovers views from the SQL
    * lifecycle registry each batch ([[graft.sql.GraftMvRewrite.viewsOver]]):
    * every `CREATE MATERIALIZED VIEW` over this base table — including one
    * issued mid-stream — is maintained without the caller ever listing it.
    * `Some(paths)` pins the refresh set explicitly — `Some(Seq.empty)`
    * genuinely refreshes nothing (an Option sentinel, so "none" and
    * "auto-discover" can never be conflated). */
  def ingestWithViews(spark: SparkSession, table: LakeTable, dir: String,
      schema: StructType, checkpoint: String,
      viewPaths: Option[Seq[String]] = None, continuous: Boolean = false,
      transform: DataFrame => DataFrame = identity): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(if (continuous) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = transform(batch)
        if (!b.isEmpty) {
          table.upsert(b)
          val views = viewPaths
            .getOrElse(graft.sql.GraftMvRewrite.viewsOver(spark, table.path))
          views.foreach(p =>
            graft.lake.MaterializedView.load(spark, p).refresh())
        }
        ()
      }
      .start()
    if (!continuous) q.awaitTermination()
  }
}
