package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Envelope, Normalize}

/** S2/S3/S13/D4 parity: the reference's reader/writer statement shapes work
  * verbatim with format("graft"), including the Hudi option-key aliases.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def tmp(): String = Files.createTempDirectory("graft_ds").toString

  test("reference writer shape: insert Overwrite then upsert Append (S6/S7)") {
    val path = tmp()
    Normalize.ingest(Envelope.backfill(spark)).write.format("graft")
      .option("hoodie.datasource.write.recordkey.field", "pk_id")
      .option("hoodie.datasource.write.precombine.field", "updated_at")
      .option("hoodie.datasource.write.partitionpath.field", "created_at")
      .mode(SaveMode.Overwrite)
      .save(path)
    Normalize.ingest(Envelope.cdc(spark)).write.format("graft")
      .mode(SaveMode.Append)
      .save(path)
    val got = spark.read.format("graft").load(path)
      .select("pk_id", "name", "value").orderBy("pk_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1, "apple", 10), (2, "samsung", 201), (3, "dell", 30),
      (4, "motorola", 40), (5, "htc", 50)))
  }

  test("MoR views + time travel through reader options (S8/S9/M3)") {
    val path = tmp()
    Normalize.ingest(Envelope.backfill(spark)).write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .option("hoodie.datasource.write.storage.type", "MERGE_ON_READ")
      .mode(SaveMode.Overwrite).save(path)
    Normalize.ingest(Envelope.cdc(spark)).write.format("graft")
      .mode(SaveMode.Append).save(path)
    def vals(view: String): Map[Int, Int] =
      spark.read.format("graft").option("view", view).load(path)
        .select("pk_id", "value").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(vals("ro")(2) == 20, "_ro stale")
    assert(vals("rt")(2) == 201, "_rt fresh")
    val v0 = spark.read.format("graft").option("versionAsOf", "0").load(path)
    assert(v0.count() == 4)
  }

  test("CREATE TABLE ... USING graft LOCATION works (S13/D4), filters push") {
    val path = tmp()
    Normalize.ingest(Envelope.backfill(spark)).write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode(SaveMode.Overwrite).save(path)
    spark.sql("DROP TABLE IF EXISTS graft_ddl_test") // D3
    spark.sql(s"CREATE TABLE graft_ddl_test USING graft LOCATION '$path'")
    val rows = spark.sql("SELECT pk_id, name FROM graft_ddl_test WHERE value > 15 ORDER BY pk_id")
    assert(rows.collect().map(_.getInt(0)).toSeq == Seq(2, 3, 4))
    assert(spark.sql("SHOW TABLES").collect().map(_.getString(1)).contains("graft_ddl_test")) // D1
    val ddl = spark.sql("SHOW CREATE TABLE graft_ddl_test").head().getString(0) // D2
    assert(ddl.contains("USING graft") && ddl.toLowerCase.contains("location"))
    spark.sql("DROP TABLE graft_ddl_test")
  }

  test("writeStream.format(\"graft\") sinks micro-batches through the upsert path") {
    val inDir = Files.createTempDirectory("graft_sink_in")
    val path = tmp()
    val ck = Files.createTempDirectory("graft_sink_ck").toString
    import spark.implicits._
    Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v")
      .write.parquet(inDir.resolve("f0.parquet").toString)
    Seq((2, 2L, "b2"), (3, 1L, "c")).toDF("k", "pc", "v")
      .write.parquet(inDir.resolve("f1.parquet").toString)
    val schema = spark.read.parquet(inDir.toString + "/*").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString + "/*")
      .writeStream.format("graft")
      .option("key", "k").option("precombine", "pc")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(path)
    q.awaitTermination()
    val rows = spark.read.format("graft").load(path)
      .select("k", "v").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "a"), (2, "b2"), (3, "c")))
  }

  test("unix_timestamp ignores its format for TimestampType inputs (F1 quirk)") {
    // README.md:270-273 uses format MM-dd-yyyy on TimestampType columns —
    // Spark converts directly, which is why the odd pattern still works.
    import spark.implicits._
    val df = Seq("2023-01-12 04:01:18").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val (withFmt, noFmt) = (
      df.select(unix_timestamp(col("ts"), "MM-dd-yyyy HH:mm:ss")).head().getLong(0),
      df.select(unix_timestamp(col("ts"))).head().getLong(0))
    assert(withFmt == 1673496078L && withFmt == noFmt)
  }
}
