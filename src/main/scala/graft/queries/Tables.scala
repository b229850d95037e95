package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Readers for the driver-generated corpus (TESTDATA.md) plus the numeric
  * conventions that keep Spark results hash-identical to the DuckDB oracle.
  */
object Tables {

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Epoch-microseconds from an events `ts` column of either corpus
    * vintage — the driver has shipped events.parquet both as
    * timestamp[ns] (readable only as LongType nanos via
    * spark.sql.legacy.parquet.nanosAsLong; integer `div`, never `/`:
    * double division loses ulps at epoch-nano magnitudes) and as
    * timestamp[us] (surfacing as TIMESTAMP_NTZ; cast to TIMESTAMP is
    * instant-preserving in the UTC sessions graft runs, then
    * unix_micros is exact). Both agree with DuckDB's epoch_ns(ts)//1000. */
  def tsMicrosOf(dt: org.apache.spark.sql.types.DataType, c: String = "ts"): Column =
    dt match {
      case org.apache.spark.sql.types.LongType => expr(s"$c div 1000")
      case _ => unix_micros(col(c).cast("timestamp"))
    }

  /** Inverse of [[tsMicrosOf]]: render an epoch-micros VALUE in the events
    * `ts` column's own type (Long = nanos; timestamps via timestamp_micros). */
  def tsFromMicros(dt: org.apache.spark.sql.types.DataType, us: Column): Column =
    dt match {
      case org.apache.spark.sql.types.LongType => us * lit(1000L)
      case other => timestamp_micros(us).cast(other)
    }

  /** events with `ts_us` (epoch µs) attached, vintage-adaptive. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    graft.core.GraftSession.ensure(spark)
    val ev = t(spark, sfDir, "events")
    ev.withColumn("ts_us", tsMicrosOf(ev.schema("ts").dataType))
  }

  /** Money columns are 2-decimal doubles. Both engines sum them exactly as
    * DECIMAL(18,2) and only then convert to double, so the result does not
    * depend on summation order (plain double sums would differ between
    * Spark's partial aggregation and DuckDB's sequential scan). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum divided in double. Matches
    * CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/COUNT(x) in DuckDB. */
  def avgMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(c)
}
