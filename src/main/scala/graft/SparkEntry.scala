package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator registry in graft.queries.*; each
  * entry has a matching DuckDB oracle in `oracleSql` unless the operator is
  * not SQL-expressible (driver then records a weaker rows-only check).
  */
object SparkEntry {

  private def registries: Seq[Map[String, ((SparkSession, String) => DataFrame, String)]] =
    Seq(graft.queries.Relational.defs, graft.queries.LakeQueries.defs,
      graft.queries.ExtQueries.defs, graft.queries.CdcQueries.defs)

  /** Flagship: the reference's CDC showcase end-to-end (backfill → CoW
    * create → CDC upsert → golden 5-row state). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.LakeQueries.defs("q27_cdc_golden")._1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatten.map { case (k, (fn, _)) => k -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatten.collect { case (k, (_, sql)) if sql.nonEmpty => k -> sql }.toMap
}
