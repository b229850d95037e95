package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ingest/normalize chain (SURVEY.md EP1):
  * flatten the payload struct, then convert the four timestamp columns to
  * epoch seconds.
  */
object Normalize {

  /** P1: `df.select("payload.*", "*")` — payload fields hoisted to the top
    * level, full envelope retained (`/root/reference/README.md:267,442`). */
  def flatten(df: DataFrame): DataFrame =
    df.select(col("payload.*"), col("*"))

  /** P3/F1: `unix_timestamp(col, "MM-dd-yyyy HH:mm:ss")` on
    * updated_at/created_at/read_timestamp/source_timestamp
    * (`/root/reference/README.md:270-273,443-446`). The odd format string is
    * ignored for TimestampType inputs — Spark converts directly to epoch
    * seconds, which is why the reference's pattern still yields correct
    * values (pinned by NormalizeSpec). */
  def epochize(df: DataFrame): DataFrame =
    Seq("updated_at", "created_at", "read_timestamp", "source_timestamp")
      .foldLeft(df)((d, c) =>
        d.withColumn(c, unix_timestamp(col(c), "MM-dd-yyyy HH:mm:ss")))

  /** Full ingest chain as the reference runs it. */
  def ingest(df: DataFrame): DataFrame = epochize(flatten(df))
}
