package graft

import java.nio.file.{Files, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.lake.{LakeTable, TableSpec}

/** Scale-up measurement harness — the round-13 experiment: the SAME
  * write/maintenance entries as [[Bench]] run at 1× and R× (default 10×)
  * corpus size with the churn held CONSTANT IN ABSOLUTE TERMS, so the
  * per-entry scaling exponent separates ∝-churn costs (must stay ~flat
  * as the corpus grows) from ∝-corpus costs (must grow ~linearly).
  * This is the measurement the 100 TB story was missing: every pruning
  * claim ("cost tracks the churn window, not the table") was a
  * plan-shape argument at one scale factor; here the claim is observed.
  *
  * Fixtures: each input table is replicated R× under shifted keys
  * (the e13/e14 corpus-replication technique) and written KEY-ORDERED
  * (`repartitionByRange(key).sortWithinPartitions(key)`, 32·R output
  * partitions) — the layout a naturally-loaded table has (TPC-H data
  * is orderkey-ordered; production event streams are time/key-local),
  * and the layout that makes file-level key stats meaningful at any
  * scale. Churn batches are restricted to the replica-0 key band, so
  * the 1× and R× runs apply the IDENTICAL logical change set.
  *
  * Expected shapes (the per-entry verdicts BASELINE.md's sf1 block
  * records against the measured exponents):
  *   - b1_full_load, e7_span_dedup: ∝ corpus — exponent ≈ 1.
  *   - b2/b8/b7/b12/b13/b15: ∝ churn — far sublinear (exponent ≈ 0)
  *     when the path prunes correctly; a linear reading here is a real
  *     scale bug no single-SF run can see.
  *   - e17_bpe_train: the word-frequency pass is ∝ corpus but the 32
  *     certified merge rounds are ∝ distinct words (replication adds
  *     none) — expected strongly sublinear.
  *
  * Output: ONE JSON line (driver-bench format) per run with
  * `"rep":R` and job-count meta, written by tools/bench_scale.sh into
  * bench_runs/scale/ for the exponent computation.
  */
object BenchScale {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_scale_work", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p.getParent)
    p.toString
  }

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def median(df: => DataFrame, n: Int = 3): Double = {
    noop(df)
    val ts = Seq.fill(n)(time(noop(df))).sorted
    ts(n / 2)
  }

  private final class JobCounter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    override def onJobStart(
        s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
  }

  private val meta = scala.collection.mutable.LinkedHashMap.empty[String, Long]

  private def timedWithJobs(spark: SparkSession, name: String)(body: => Unit): Double = {
    val c = new JobCounter
    spark.sparkContext.addSparkListener(c)
    val t = time(body)
    var last = -1L
    while (c.jobs.get() != last) { last = c.jobs.get(); Thread.sleep(200) }
    spark.sparkContext.removeSparkListener(c)
    meta(s"${name}_jobs") = last
    t
  }

  // replica key bands: shifts keep every replica's keys (and the churn
  // batches' synthetic new keys, which add ≤ 1e8 within replica 0's
  // band) disjoint across replicas
  private val BAND_LKEY = 1000000000L // lineitem lkey (max ~6e7 + 1e8 new)
  private val BAND_OKEY = 1000000000L // orders o_orderkey (max ~6e5 + 1e8 new)
  private val BAND_CKEY = 100000000L  // customer c_custkey (max 15e3 + 1e7 new)
  private val BAND_DOC  = 10000000L   // documents doc_id (max 5e3)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SCALE_REP", "1").toInt
    val fixRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_FIX", "/tmp/graft_scale_fix")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench-scale"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // diagnostics: SPARK_GRAFT_SCALE_ONLY=b15[,b12…] runs a subset;
    // SPARK_GRAFT_SCALE_STAGES=1 prints every stage ≥ 300ms with its
    // call site — the tool that localizes a superlinear entry's cost
    val only: Set[String] =
      sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet).getOrElse(Set.empty)
    def want(name: String): Boolean = only.isEmpty || only.exists(name.startsWith)
    sys.env.get("SPARK_GRAFT_SCALE_STAGES").foreach { thr =>
      val lim = thr.toLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = System.nanoTime()
        private def rel = (System.nanoTime() - t0) / 1e9
        private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(0L)
          if (ms >= lim)
            println(f"STAGE  $rel%8.2f ${si.stageId}%5d ${ms / 1000.0}%7.2fs in=${si.taskMetrics.inputMetrics.recordsRead}%9d sh=${si.taskMetrics.shuffleReadMetrics.recordsRead}%9d tasks=${si.numTasks}%4d  ${si.name.linesIterator.next()}")
        }
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStart.put(e.jobId, System.nanoTime()); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStart.remove(e.jobId)
          val d = if (st == null) -1.0 else (System.nanoTime() - st) / 1e9
          println(f"JOB    $rel%8.2f ${e.jobId}%5d $d%7.2fs")
        }
      })
    }
    // production's layout invariant is constant FILE SIZE (count grows
    // with data); at sandbox SFs the AQE 64MB advisory would coalesce
    // every write to ~1 file and make file-granular stats pruning
    // structurally unobservable. 40k rows/file is the sandbox stand-in
    // for the ~128MB production target — applied identically to both
    // arms, it gives every table a data-proportional file count.
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "40000")
    Seq("org.apache.spark.rdd.MapPartitionsRDD",
        "org.apache.spark.sql.execution.CacheManager").foreach(l =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.ERROR))

    def tbl(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

    // ---- fixtures (untimed, idempotent): R× replicas, key-ordered ----
    def materialize(name: String, keyCol: String)(build: => DataFrame): DataFrame = {
      val out = s"$fixRoot/rep$rep/$name.parquet"
      if (!Files.exists(Paths.get(out, "_SUCCESS"))) {
        build.repartitionByRange(32 * rep, col(keyCol))
          .sortWithinPartitions(keyCol)
          .write.mode("overwrite").parquet(out)
      }
      spark.read.parquet(out)
    }
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val r = df.crossJoin(spark.range(rep.toLong).toDF("__rep"))
      shifts.foldLeft(r) { case (acc, (c, band)) =>
        acc.withColumn(c, col(c) + col("__rep") * band)
      }.drop("__rep")
    }
    val li = materialize("lineitem", "lkey")(replicate(
      tbl("lineitem")
        .withColumn("lkey", col("l_orderkey") * 10 + col("l_linenumber")),
      Map("lkey" -> BAND_LKEY)))
    val orders = materialize("orders", "o_orderkey")(replicate(
      tbl("orders"), Map("o_orderkey" -> BAND_OKEY, "o_custkey" -> BAND_CKEY)))
    val customer = materialize("customer", "c_custkey")(replicate(
      tbl("customer"), Map("c_custkey" -> BAND_CKEY)))
    val docs = materialize("documents", "doc_id")(replicate(
      tbl("documents"), Map("doc_id" -> BAND_DOC)))
    meta("li_rows") = li.count()
    meta("orders_rows") = orders.count()
    meta("doc_rows") = docs.count()

    val liSpec = TableSpec("lkey", "l_shipdate")
    // the replica-0 band churn — the IDENTICAL logical change at every R.
    // Keys on `lkey DIV 10` (the orderkey half): l_linenumber is 1..7, so
    // the original `lkey % 10 === 0` selected ZERO rows — the round-13
    // pre-fix b2 scale point measured an empty upsert (see Bench.liSource
    // and OPTIMIZATION_r13.md; re-measured after the fix).
    def liSource = {
      val band0 = li.filter(col("lkey") < BAND_LKEY)
      band0.filter(expr("(lkey DIV 10) % 10 = 0"))
        .withColumn("l_extendedprice", col("l_extendedprice") + 1.0)
        .withColumn("l_shipdate", col("l_shipdate") + expr("INTERVAL 1 DAY"))
        .unionByName(band0.filter(expr("(lkey DIV 10) % 50 = 0"))
          .withColumn("lkey", col("lkey") + 100000000L))
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    li.limit(10000).write.mode("overwrite").format("noop").save()

    // B1: full-load ingest — ∝ corpus by construction (every row writes).
    if (want("b1") || want("b2") || want("b8")) {
      val cowPath = freshDir("b1_cow")
      results("b1_full_load") = timedWithJobs(spark, "b1") {
        LakeTable.create(spark, cowPath, liSpec, li, bulkInsert = true)
      }
      val cow = LakeTable.load(spark, cowPath)

      // B2: CDC upsert, constant churn. The fixture is key-ordered, so the
      // band-0 churn keys fall in ~1/R of the files — the rewrite (and its
      // probe) must ride the key stats, not the table size.
      results("b2_cdc_upsert") = timedWithJobs(spark, "b2") { cow.upsert(liSource) }

      // B8: CDC read of exactly that churn window — ∝ files the upsert
      // touched, which constant churn holds ~flat.
      results("b8_changes") = median { cow.changes(0) }
    }

    // B7: range-localized upsert on a key-CLUSTERED table. targetFiles
    // scales with R: production clusters to a constant FILE SIZE, so the
    // file count (not the file size) grows with data — holding
    // targetFiles fixed would grow every file 10× and turn the pruned
    // single-file rewrite linear by layout choice alone.
    if (want("b7")) {
      val clusteredPath = freshDir("b7_clustered")
      LakeTable.create(spark, clusteredPath, liSpec, li, bulkInsert = true)
      val clustered = LakeTable.load(spark, clusteredPath)
      clustered.compact(clusterByKey = true, targetFiles = 32 * rep)
      val localized = li.filter(col("lkey") < 30000)
        .withColumn("l_extendedprice", col("l_extendedprice") + 1.0)
        .withColumn("l_shipdate", col("l_shipdate") + expr("INTERVAL 1 DAY"))
      results("b7_pruned_upsert") = timedWithJobs(spark, "b7") {
        clustered.upsert(localized)
      }
    }

    // B12: star-join MV refresh — constant churn on both members.
    if (want("b12")) results("b12_mv_join_refresh") = {
      val fDir = freshDir("b12_f"); val dDir = freshDir("b12_d")
      val fact = LakeTable.create(spark, fDir,
        TableSpec("o_orderkey", "o_orderdate"), orders)
      val dim = LakeTable.create(spark, dDir, TableSpec("c_custkey", "cver"),
        customer.withColumn("cver", lit(0L)))
      val mvDir = freshDir("b12_mv")
      graft.lake.MaterializedView.create(spark, mvDir, fact, Seq("c_mktsegment"),
        Seq(graft.lake.MvAgg("n", "count", "*"),
          graft.lake.MvAgg("s", "sum", "o_custkey")),
        Seq(graft.lake.MaterializedView.MvJoin(dDir, "o_custkey", "c_custkey")))
      fact.upsert(orders.filter(col("o_orderkey") < BAND_OKEY &&
          col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 DAY")))
      dim.upsert(customer.filter(col("c_custkey") < BAND_CKEY &&
          col("c_custkey") % 200 === 0)
        .withColumn("c_mktsegment", lit("MOVED")).withColumn("cver", lit(1L)))
      timedWithJobs(spark, "b12") {
        graft.lake.MaterializedView.load(spark, mvDir).refresh()
      }
    }

    // B13: hll-MV refresh absorbing a constant pure-addition batch.
    if (want("b13")) results("b13_mv_hll_refresh") = {
      val bDir = freshDir("b13_base")
      val base = LakeTable.create(spark, bDir,
        TableSpec("o_orderkey", "o_orderdate"), orders)
      val mvDir = freshDir("b13_mv")
      graft.lake.MaterializedView.create(spark, mvDir, base, Seq("o_orderstatus"),
        Seq(graft.lake.MvAgg("n", "count", "*"),
          graft.lake.MvAgg("du", "hll", "o_custkey")))
      base.upsert(orders.filter(col("o_orderkey") < BAND_OKEY &&
          col("o_orderkey") % 100 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_custkey", col("o_custkey") + 10000000L))
      timedWithJobs(spark, "b13") {
        graft.lake.MaterializedView.load(spark, mvDir).refresh()
      }
    }

    // B15: LEFT-OUTER MV refresh, dim churn with key flips on a
    // custkey-clustered fact — constant flip set, so the transition
    // terms' IN file filters must open a constant file set.
    if (want("b15")) results("b15_outer_mv_refresh") = {
      val fDir = freshDir("b15_f"); val dDir = freshDir("b15_d")
      val fact = LakeTable.create(spark, fDir,
        TableSpec("o_orderkey", "o_orderdate",
          statsColumns = Seq("o_custkey"), writeSortColumns = Seq("o_custkey")),
        orders, bulkInsert = true)
      val dim = LakeTable.create(spark, dDir, TableSpec("c_custkey", "cver"),
        customer.filter(col("c_custkey") % 4 =!= 0)
          .withColumn("cver", lit(0L)))
      val mvDir = freshDir("b15_mv")
      graft.lake.MaterializedView.create(spark, mvDir, fact, Seq("c_mktsegment"),
        Seq(graft.lake.MvAgg("n", "count", "*"),
          graft.lake.MvAgg("s", "sum", "o_custkey")),
        Seq(graft.lake.MaterializedView.MvJoin(dDir, Seq("o_custkey"),
          Seq("c_custkey"), 0L, outer = true)))
      val band0 = customer.filter(col("c_custkey") < BAND_CKEY)
      dim.upsert(band0.filter(col("c_custkey") % 4 =!= 0 &&
          col("c_custkey") % 200 === 2)
        .withColumn("c_mktsegment", lit("MOVED")).withColumn("cver", lit(1L)))
      dim.upsert(band0.filter(col("c_custkey") % 400 === 0)
        .withColumn("cver", lit(0L)))
      dim.delete(col("c_custkey") < BAND_CKEY && col("c_custkey") % 300 === 7)
      timedWithJobs(spark, "b15") {
        graft.lake.MaterializedView.load(spark, mvDir).refresh()
      }
    }

    // E7: span-level dedup over the full corpus — posexplode per token,
    // ∝ corpus by construction (the linear control).
    if (want("e7")) results("e7_span_dedup") = median(Dedup.spanDedup(docs))

    // E17: BPE training on an R×-scaled training sample (every replica of
    // the doc_id<1000 docs): the word-frequency aggregate scales, the 32
    // merge rounds work on distinct words (replication adds none).
    if (want("e17")) results("e17_bpe_train") = {
      val train = docs.filter(col("doc_id") % BAND_DOC < 1000)
      var st: (graft.ext.Bpe.Merges, Seq[graft.ext.Bpe.RoundStat]) = null
      val t = timedWithJobs(spark, "e17") {
        st = graft.ext.Bpe.trainWithStats(train, numMerges = 32)
      }
      meta("e17_merges") = st._1.pairs.size.toLong
      t
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ms = meta.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(f"""{"metric":"scale_total","value":$total%.3f,"unit":"sec","rep":$rep,"queries":$qs,"meta":$ms,"sf":"$sfDir"}""")
    spark.stop()
  }
}
