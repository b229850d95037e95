package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Envelope, Normalize}

/** S11 stretch: the reference's MERGE INTO statement
  * (`/root/reference/README.md:1213-1224`) runs verbatim through spark.sql
  * against a graft table, via GraftExtensions.
  */
class MergeIntoSpec extends AnyFunSuite {

  /** Dedicated session so the extension applies (the shared test session
    * was built without it). Same SparkContext is reused underneath. */
  lazy val spark: SparkSession = {
    SparkTestSession.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-merge-test"), 4)
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("the reference's MERGE INTO statement runs verbatim and reaches the golden state") {
    val path = Files.createTempDirectory("graft_merge_sql").toString
    Normalize.flatten(Envelope.backfill(spark)).write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql("DROP TABLE IF EXISTS delta_table")
    spark.sql(s"CREATE TABLE delta_table USING graft LOCATION '$path'")
    Normalize.flatten(Envelope.cdc(spark)).createOrReplaceTempView("temp")

    // README.md:1213-1224, verbatim shape
    spark.sql(
      """MERGE INTO delta_table target USING (
        |  SELECT latest_changes.* FROM temp latest_changes
        |  INNER JOIN (
        |    SELECT pk_id, max(updated_at) AS MaxDate
        |    FROM temp
        |    GROUP BY pk_id
        |  ) cm
        |  ON latest_changes.pk_id = cm.pk_id AND latest_changes.updated_at = cm.MaxDate
        |) source
        |ON source.pk_id == target.pk_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val got = spark.sql(
      "SELECT pk_id, name, value, source_metadata.is_deleted FROM delta_table ORDER BY pk_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getBoolean(3))).toSeq
    assert(got == Seq((1, "apple", 10, false), (2, "samsung", 201, false),
      (3, "dell", 30, true), (4, "motorola", 40, false), (5, "htc", 50, false)))
    spark.sql("DROP TABLE delta_table")
  }

  test("unsupported MERGE shapes fail loudly, not silently") {
    val path = Files.createTempDirectory("graft_merge_bad").toString
    Normalize.flatten(Envelope.backfill(spark)).write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql("DROP TABLE IF EXISTS merge_bad")
    spark.sql(s"CREATE TABLE merge_bad USING graft LOCATION '$path'")
    Normalize.flatten(Envelope.cdc(spark)).createOrReplaceTempView("temp2")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO merge_bad target USING temp2 source
          |ON source.pk_id == target.pk_id
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("graft MERGE supports exactly"))
    spark.sql("DROP TABLE merge_bad")
  }
}
