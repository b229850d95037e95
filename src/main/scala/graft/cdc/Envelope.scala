package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The Datastream CDC event envelope — the engine's canonical input type,
  * reconstructed from the Hive DDL at `/root/reference/README.md:299-318`
  * and the raw Avro read in `scala-cdc-hudi.ipynb` cell 5 (see SURVEY.md
  * §1.3). Fixtures carry the reference's golden rows (FIXTURES.md §3-4).
  */
object Envelope {

  val sourceMetadataType: StructType = StructType(Seq(
    StructField("table", StringType),
    StructField("database", StringType),
    StructField("primary_keys", ArrayType(StringType, containsNull = false)),
    StructField("log_file", StringType),
    StructField("log_position", LongType),
    StructField("change_type", StringType), // INSERT | UPDATE-INSERT | DELETE
    StructField("is_deleted", BooleanType)))

  val payloadType: StructType = StructType(Seq(
    StructField("pk_id", IntegerType),
    StructField("name", StringType),
    StructField("value", IntegerType),
    StructField("updated_at", TimestampType),
    StructField("created_at", TimestampType)))

  val schema: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("read_timestamp", TimestampType),
    StructField("source_timestamp", TimestampType),
    StructField("object", StringType),
    StructField("read_method", StringType), // mysql-backfill-fulldump | mysql-cdc-binlog
    StructField("stream_name", StringType),
    StructField("schema_key", StringType),
    StructField("sort_keys", ArrayType(StructType(Seq(
      StructField("member0", StringType),
      StructField("member1", LongType))), containsNull = false)),
    StructField("source_metadata", sourceMetadataType),
    StructField("payload", payloadType)))

  private def ts(s: String): Timestamp = Timestamp.valueOf(s) // session is UTC

  private def row(pk: Int, name: String, value: Int, updated: String, created: String,
      readTs: String, method: String, changeType: String, deleted: Boolean,
      logFile: String, logPos: Long): Row = Row(
    java.util.UUID.nameUUIDFromBytes(s"$method-$pk-$updated".getBytes).toString,
    ts(readTs), ts(readTs), "demo_hudi_delta_test", method,
    "projects/111/locations/us-central1/streams/demo-stream", "demo_schema",
    Seq(Row("mysql-bin.000001", logPos)),
    Row("hudi_delta_test", "demo", Seq("pk_id"), logFile, logPos, changeType, deleted),
    Row(pk, name, value, ts(updated), ts(created)))

  /** Fixture A — backfill full dump, 4 INSERTs
    * (`/root/reference/README.md:83-87,351-434`). */
  def backfill(spark: SparkSession): DataFrame = {
    val rows = Seq(
      row(1, "apple", 10, "2023-01-12 04:01:18", "2023-01-12 04:01:18",
        "2023-01-12 04:04:45", "mysql-backfill-fulldump", "INSERT", false, null, 0L),
      row(2, "samsung", 20, "2023-01-12 04:01:18", "2023-01-12 04:01:18",
        "2023-01-12 04:04:45", "mysql-backfill-fulldump", "INSERT", false, null, 0L),
      row(3, "dell", 30, "2023-01-12 04:01:18", "2023-01-12 04:01:18",
        "2023-01-12 04:04:45", "mysql-backfill-fulldump", "INSERT", false, null, 0L),
      row(4, "motorola", 40, "2023-01-12 04:01:20", "2023-01-12 04:01:20",
        "2023-01-12 04:04:45", "mysql-backfill-fulldump", "INSERT", false, null, 0L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  /** Fixture B — CDC binlog batch: insert pk5 htc, update pk2 samsung=201,
    * delete pk3 dell (`/root/reference/README.md:184-187,491-552`; line 184's
    * `(5,'htc',50)` per the goldens). */
  def cdc(spark: SparkSession): DataFrame = {
    val rows = Seq(
      row(5, "htc", 50, "2023-01-12 04:10:38", "2023-01-12 04:10:38",
        "2023-01-12 04:10:55", "mysql-cdc-binlog", "INSERT", false, "mysql-bin.000001", 11881438L),
      row(2, "samsung", 201, "2023-01-12 04:10:46", "2023-01-12 04:01:18",
        "2023-01-12 04:10:55", "mysql-cdc-binlog", "UPDATE-INSERT", false, "mysql-bin.000001", 11882107L),
      row(3, "dell", 30, "2023-01-12 04:01:18", "2023-01-12 04:01:18",
        "2023-01-12 04:10:55", "mysql-cdc-binlog", "DELETE", true, "mysql-bin.000001", 11882737L))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  /** Persist both fixtures as parquet (the showcase ships them as Avro on
    * GCS, `README.md:1165-1166`; spark-avro is absent offline). */
  def writeFixtures(spark: SparkSession, dir: String): Unit = {
    backfill(spark).write.mode("overwrite").parquet(s"$dir/backfill.parquet")
    cdc(spark).write.mode("overwrite").parquet(s"$dir/cdc.parquet")
  }
}
