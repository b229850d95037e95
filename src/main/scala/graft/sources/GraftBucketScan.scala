package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.lake.TableSpec

/** DSv2 batch scan for hash-BUCKETED graft tables that reports
  * `KeyGroupedPartitioning` on the stored `_bucket` column — the half of
  * Spark's storage-partitioned join (SPJ) the source must supply. With
  * `spark.sql.sources.v2.bucketing.enabled=true` (plus
  * `spark.sql.requireAllClusterKeysForCoPartition=false`, since the
  * partition key `[_bucket]` is a subset of the join keys), a join of two
  * same-bucketed tables whose keys include `_bucket` plans with ZERO
  * shuffle on either side: each task reads bucket i of both tables and
  * joins in place — at 100 TB, the difference between a fact-fact join
  * that moves both tables over the network and one that moves nothing.
  *
  * One input partition per bucket id (ALL `buckets` ids, including empty
  * ones, so two tables always expose identical partition-value sets and
  * co-partitioning never falls back). Rows are read with Spark's own
  * vectorized parquet reader (row mode); the bucket id itself is not in
  * the data files (it is the dir layout) and is appended as a constant
  * partition value per reader — the same mechanism Spark's file source
  * uses. The scan builder only routes here when the snapshot is "plain"
  * (no MoR logs, no deletion vectors, no foreign base dirs, no column
  * mapping, no meta columns requested, no pushed filters); anything else
  * falls back to the general V1 path, trading the SPJ for full semantics.
  */
class GraftBucketScan(dataDir: String, numBuckets: Int,
    filesByBucket: Map[Int, Seq[String]], required: StructType, dataFields: Set[String])
  extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity(TableSpec.BUCKET_COL)), numBuckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until numBuckets).map { b =>
      GraftBucketInputPartition(b,
        filesByBucket.getOrElse(b, Seq.empty).map(f => s"$dataDir/$f").toArray)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // the bucket id is dir metadata, not file data — never ask the file for it
    val dataCols = required.fields.map(_.name)
      .filter(n => dataFields.contains(n) && n != TableSpec.BUCKET_COL)
    val wantBucket = required.fieldNames.contains(TableSpec.BUCKET_COL)
    GraftBucketReaderFactory(dataCols, wantBucket)
  }
}

case class GraftBucketInputPartition(bucket: Int, files: Array[String])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

case class GraftBucketReaderFactory(dataCols: Array[String], wantBucket: Boolean)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftBucketInputPartition]
    new PartitionReader[InternalRow] {
      private val files = gp.files.iterator
      private var reader: VectorizedParquetRecordReader = _
      private var row: InternalRow = _

      private def openNext(): Boolean = {
        close()
        if (!files.hasNext) return false
        // Spark's own vectorized reader, row mode; CORRECTED rebase modes
        // (the simple constructor's defaults) are exact for graft-written
        // files, which are always modern proleptic parquet
        val r = new VectorizedParquetRecordReader(false, 4096)
        r.initialize(files.next(), dataCols.toSeq.asJava)
        // the bucket id is dir metadata, not file data: append it as the
        // constant partition value (Spark file-source mechanism)
        if (wantBucket)
          r.initBatch(StructType(Seq(StructField(TableSpec.BUCKET_COL, IntegerType))),
            InternalRow(gp.bucket))
        reader = r
        true
      }

      override def next(): Boolean = {
        while (true) {
          if (reader == null) { if (!openNext()) return false }
          if (reader.nextKeyValue()) {
            row = reader.getCurrentValue.asInstanceOf[InternalRow]
            return true
          }
          reader.close(); reader = null
        }
        false
      }

      override def get(): InternalRow = row

      override def close(): Unit = {
        if (reader != null) { reader.close(); reader = null }
      }
    }
  }
}
