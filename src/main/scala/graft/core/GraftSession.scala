package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference (Dalas5/hudi-and-delta-showcase) configures its sessions via
  * format-extension jars (`scala-cdc-hudi.ipynb` cell 0, `Delta-test-nb.ipynb`
  * cell 1); graft is a plain library on stock Spark 4.1.2, so the only session
  * requirements are UTC time, AQE on, and a local-mode-sane shuffle
  * partition count.
  */
object GraftSession {

  /** Apply graft's recommended settings on an existing builder. */
  def tune(b: SparkSession.Builder, cpus: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // events.parquet has shipped as timestamp[ns] (readable only through
    // this switch, as LongType nanos) and as timestamp[us] (reads fine
    // without it) — keep the switch for the ns vintage; readers normalize
    // either type via graft.queries.Tables.tsMicrosOf.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // write timestamps as INT64 micros, not Spark's legacy INT96 default:
    // INT96 columns carry NO parquet footer min/max statistics, which
    // silently disables every timestamp statsColumns skip (and the MV
    // expression-dim repair pruning built on them); INT64 micros is also
    // what the Delta/Iceberg protocols require of new tables
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  def local(appName: String = "graft", cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Settings graft needs that may not be set on a caller-provided session
    * (e.g. the driver's Verify/Bench session). Safe to call repeatedly. */
  def ensure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark
  }
}
