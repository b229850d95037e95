package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming maintenance of the persisted serving indexes: each
  * micro-batch of documents (or embeddings) is absorbed into the
  * [[graft.ext.TextIndex]] / [[graft.ext.VectorIndex]] via its incremental
  * `add` — the streaming composition of the index lifecycle (SURVEY §2.9
  * file-stream ingest × the index family), so retrieval serves results
  * that track the corpus batch-by-batch at churn cost.
  *
  * Restart safety is by CONVERGENCE, not a txn guard: every write inside
  * `add` is keyed — postings/codes upsert on their record keys, vanished
  * rows die by keyed delete — so replaying a micro-batch rewrites the same
  * keys to the same values and the index state is identical to a
  * single-delivery run (spec-pinned: streaming adds ≡ one batch add).
  * Per-batch cost ∝ batch, never index size. */
object IndexStream {

  /** Stream documents under `source` into the text index at `indexPath`. */
  def ingestText(spark: SparkSession, source: String, schema: StructType,
      indexPath: String, checkpoint: String,
      textCol: String = "text", idCol: String = "doc_id",
      continuous: Boolean = false): Unit =
    run(spark, source, schema, checkpoint, continuous) { batch =>
      graft.ext.TextIndex.load(spark, indexPath).add(batch, textCol, idCol)
      ()
    }

  /** Stream embeddings under `source` into the vector index at
    * `indexPath` (frozen codebooks — no retraining on the hot path). */
  def ingestVectors(spark: SparkSession, source: String, schema: StructType,
      indexPath: String, checkpoint: String,
      vecCol: String = "embedding", idCol: String = "vec_id",
      continuous: Boolean = false): Unit =
    run(spark, source, schema, checkpoint, continuous) { batch =>
      graft.ext.VectorIndex.load(spark, indexPath).add(batch, vecCol, idCol)
      ()
    }

  private def run(spark: SparkSession, source: String, schema: StructType,
      checkpoint: String, continuous: Boolean)(absorb: DataFrame => Unit): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(source)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(if (continuous) Trigger.ProcessingTime("5 seconds")
        else Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) absorb(batch)
        ()
      }
      .start()
    if (!continuous) q.awaitTermination()
  }
}
