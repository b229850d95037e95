package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Spark's RUNTIME filters compose with graft scans — the two join-time
  * scale levers a 100 TB fact table needs beyond static pruning:
  *
  *  - dynamic partition pruning (DPP): a fact⋈dim join on the fact's
  *    partition column prunes fact partitions at RUNTIME from the dim
  *    side's filter results — the V1 read is a genuine partitioned
  *    parquet scan (`basePath` + hive-style dirs), so Catalyst's
  *    PartitionPruning rule applies to it exactly as to a native table;
  *  - runtime bloom-filter join pruning (InjectRuntimeFilter): a
  *    selective dim filter materializes a bloom filter that drops fact
  *    rows BEFORE the join shuffle.
  *
  * Both cases assert the plan shape AND result equality, so a regression
  * in the read path that silently breaks runtime filtering fails loudly.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def executed(df: DataFrame) = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Collect nodes through AQE query-stage boundaries — QueryStageExec
    * is a LEAF node, so a plain collect never sees inside a finalized
    * stage. */
  private def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    f.lift(p).toSeq ++ kids.flatMap(deepCollect(_)(f))
  }

  private def deepScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    deepCollect(p) { case f: FileSourceScanExec => f }

  test("dynamic partition pruning fires on a partitioned lake table join") {
    val path = Files.createTempDirectory("graft_dpp").toString
    val rows = (1L to 4000L).map(i => (i, s"cat${i % 8}", i * 2))
      .toDF("k", "cat", "v")
    val tbl = LakeTable.create(spark, path,
      TableSpec("k", "v", partition = Some("cat")), rows)
    // a FILE-backed dim: an in-memory dim's filter constant-folds into the
    // LocalRelation, leaving no selective predicate for the DPP rule to see
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString
    (0 until 8).map(i => (s"cat$i", i % 4)).toDF("cat", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = tbl.read().join(dim.filter(col("grp") === 1), "cat")
      .select("k", "cat", "grp")
    val plan = executed(joined)
    val dppScans = deepScans(plan).filter(_.partitionFilters.exists(e =>
      e.exists(_.isInstanceOf[DynamicPruningExpression])))
    assert(dppScans.nonEmpty,
      s"fact scan must carry a dynamic pruning partition filter:\n$plan")
    // runtime-pruned result ≡ statically filtered join
    val expect = tbl.read().filter(col("cat").isin("cat1", "cat5"))
      .join(dim.filter(col("grp") === 1), "cat").select("k", "cat", "grp")
    assert(joined.collect().map(_.toSeq).toSet ==
      expect.collect().map(_.toSeq).toSet)
    assert(joined.count() == 1000)
  }

  test("AQE splits a skewed graft join partition at runtime") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val path = Files.createTempDirectory("graft_skew").toString
    // one pathological key carries ~97% of the probe side
    val rows = (1L to 150000L).map(i =>
      (i, if (i <= 145000L) 1L else i % 100, s"payload_$i"))
      .toDF("k", "fk", "v")
    val tbl = LakeTable.create(spark, path, TableSpec("k", "fk"), rows)
    val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("fk", "name")
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test data is small — shrink the production thresholds so the hot
      // partition counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = tbl.read().join(dim, "fk").select("k", "fk", "name")
      val plan = executed(joined)
      val skewJoins = deepCollect(plan) {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        s"AQE must mark the hot-key join as a skew join:\n$plan")
      // every fk ∈ [0, 100) has a dim row — the skew split must not drop
      // or duplicate a single row
      assert(joined.count() == 150000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter injects on a selective dim join") {
    val path = Files.createTempDirectory("graft_rbf").toString
    val rows = (1L to 20000L).map(i => (i, i % 512, s"v$i"))
      .toDF("k", "fk", "v")
    val tbl = LakeTable.create(spark, path, TableSpec("k", "fk"), rows)
    val dimPath = Files.createTempDirectory("graft_rbf_dim").toString
    (0L until 512L).map(i => (i, s"d$i")).toDF("fk", "name")
      .write.mode("overwrite").parquet(dimPath)
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local test data is tiny — drop the 10GB/10MB production thresholds
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      // force a shuffle join so the filter has a shuffle to save
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = spark.read.parquet(dimPath).filter(col("name") === "d7")
      val joined = tbl.read().join(dim, "fk").select("k", "fk", "name")
      val optimized = joined.queryExecution.optimizedPlan
      val hasBloom = optimized.exists(_.expressions.exists(_.exists(
        _.getClass.getSimpleName == "BloomFilterMightContain")))
      assert(hasBloom,
        s"optimizer must inject a bloom runtime filter:\n$optimized")
      val got = joined.collect().map(_.toSeq).toSet
      val expect = tbl.read().filter(col("fk") === 7L)
        .withColumn("name", lit("d7")).select("k", "fk", "name")
        .collect().map(_.toSeq).toSet
      assert(got == expect && got.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
