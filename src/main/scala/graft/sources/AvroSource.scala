package graft.sources

import java.io.ByteArrayInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro batch file source (SURVEY.md S1): the reference reads Datastream's
  * Avro event files with `spark.read.format("avro")`
  * (`/root/reference/README.md:264,440`); the spark-avro connector is not
  * available offline, so graft ships a reader on the bundled avro-1.12.1
  * core library: schema inferred from the file header (as spark-avro does),
  * files decoded in parallel on executors via `binaryFiles`.
  *
  * Scale note: one CDC event file is one task — the same parallelism
  * granularity Datastream's file-per-batch layout gives any reader. Fine
  * for CDC pickup; bulk analytics data should be Parquet.
  *
  * Supported Avro types: the Datastream envelope subset + primitives —
  * null/boolean/int/long/float/double/string/bytes/enum/fixed, record,
  * array, map, union[null, T], logical timestamp-micros/millis and
  * date.
  */
object AvroSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(path)
    val headerBytes = files.first()._2.toArray()
    val avroSchema = schemaOf(headerBytes)
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString
    val rows = files.flatMap { case (_, pds) =>
      val reader = new GenericDatumReader[GenericRecord](
        new AvroSchema.Parser().parse(schemaJson))
      val stream = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(pds.toArray()), reader)
      val local = new AvroSchema.Parser().parse(schemaJson)
      val it = stream.iterator().asScala.map(rec =>
        convert(rec, local).asInstanceOf[Row])
      it // stream closed by GC at partition end; files are small CDC batches
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  private def schemaOf(bytes: Array[Byte]): AvroSchema = {
    val s = new DataFileStream[GenericRecord](
      new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    try s.getSchema finally s.close()
  }

  /** Avro → Catalyst schema translation (the subset above). */
  def toSparkType(s: AvroSchema): DataType = s.getType match {
    case AvroSchema.Type.BOOLEAN => BooleanType
    case AvroSchema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case AvroSchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis => TimestampType
      case _ => LongType
    }
    case AvroSchema.Type.FLOAT => FloatType
    case AvroSchema.Type.DOUBLE => DoubleType
    case AvroSchema.Type.STRING | AvroSchema.Type.ENUM => StringType
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED => BinaryType
    case AvroSchema.Type.NULL => NullType
    case AvroSchema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name, toSparkType(f.schema), nullable = true)).toSeq)
    case AvroSchema.Type.ARRAY =>
      ArrayType(toSparkType(s.getElementType))
    case AvroSchema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType))
    case AvroSchema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != AvroSchema.Type.NULL)
      require(nonNull.size == 1, s"only union[null, T] supported, got $s")
      toSparkType(nonNull.head)
    case other => throw new UnsupportedOperationException(s"avro type $other")
  }

  /** Avro runtime value → Catalyst external row value. */
  private def convert(v: Any, s: AvroSchema): Any = {
    if (v == null) return null
    s.getType match {
      case AvroSchema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != AvroSchema.Type.NULL).head
        convert(v, nonNull)
      case AvroSchema.Type.STRING => v match {
        case u: Utf8 => u.toString
        case other => other.toString
      }
      case AvroSchema.Type.ENUM => v.toString
      case AvroSchema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros =>
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(v.asInstanceOf[Long], 1000000L),
            Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L)
        case _: LogicalTypes.TimestampMillis =>
          java.time.Instant.ofEpochMilli(v.asInstanceOf[Long])
        case _ => v
      }
      case AvroSchema.Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date])
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        else v
      case AvroSchema.Type.BYTES => v match {
        case b: java.nio.ByteBuffer =>
          val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
        case a => a
      }
      case AvroSchema.Type.FIXED =>
        v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes()
      case AvroSchema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.map(f => convert(rec.get(f.pos), f.schema)).toSeq)
      case AvroSchema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(convert(_, s.getElementType)).toSeq
      case AvroSchema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala
          .map { case (k, x) => k.toString -> convert(x, s.getValueType) }.toMap
      case _ => v // boolean/int/long/float/double
    }
  }
}

/** `spark.read.format("avro").load(path)` — the verbatim reference call
  * shape (`/root/reference/README.md:264,440`; `scala-cdc-hudi.ipynb`
  * cells 5-6), registered under the standard `avro` short name via
  * `DataSourceRegister` so a user porting the reference notebooks runs
  * the exact same line. Delegates to [[AvroSource.read]]. */
class AvroFileSource extends org.apache.spark.sql.sources.RelationProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "avro"

  override def createRelation(ctx: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String]): org.apache.spark.sql.sources.BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "avro source needs a path: spark.read.format(\"avro\").load(path)"))
    new AvroRelation(ctx, path)
  }
}

/** V1 relation over an Avro file glob: schema inferred from the first
  * file's header at plan time, rows decoded on executors (one task per
  * CDC file — see the scale note on [[AvroSource]]). */
class AvroRelation(ctx: org.apache.spark.sql.SQLContext, val path: String)
    extends org.apache.spark.sql.sources.BaseRelation
    with org.apache.spark.sql.sources.TableScan {

  private lazy val df: DataFrame = AvroSource.read(ctx.sparkSession, path)

  override def sqlContext: org.apache.spark.sql.SQLContext = ctx
  override lazy val schema: StructType = df.schema
  override def buildScan(): org.apache.spark.rdd.RDD[Row] = df.rdd
}
