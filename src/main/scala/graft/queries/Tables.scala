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

  /** events.ts is parquet timestamp[ns]; graft reads it as LongType nanos
    * (spark.sql.legacy.parquet.nanosAsLong) and exposes epoch-micros, the
    * same value DuckDB yields via epoch_ns(ts)//1000. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    graft.core.GraftSession.ensure(spark)
    // integer division (`div`), not `/`: double division loses ulps on
    // epoch-nano magnitudes and disagrees with DuckDB's epoch_ns(ts)//1000
    t(spark, sfDir, "events").withColumn("ts_us", expr("ts div 1000"))
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
