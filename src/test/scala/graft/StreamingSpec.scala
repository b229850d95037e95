package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.9 depth: graft's islands-based sessionization (q47, oracled in
  * DuckDB) agrees with Spark's native session_window on real data — same
  * session count and same per-session event counts (boundary semantics
  * differ only at exact-gap ties, impossible on ns-random data).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("graft streaming source tails commits incrementally (readStream)") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val path = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[(Int, String)]]
    val q = spark.readStream.format("graft").load(path)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized {
          batches += df.select("k", "v").collect().map(r => (r.getInt(0), r.getString(1))).toSet
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.synchronized(batches.toSeq) == Seq(Set((1, "a"), (2, "b"))),
        "first batch = full snapshot (startingVersion default)")
      t.upsert(Seq((2, 2L, "b2"), (3, 1L, "c")).toDF("k", "pc", "v"))
      q.processAllAvailable()
      assert(batches.synchronized(batches.last) == Set((2, "b2"), (3, "c")),
        "second batch = only the upsert's post-images (incremental, no re-scan)")
      t.upsert(Seq((4, 1L, "d")).toDF("k", "pc", "v"))
      q.processAllAvailable()
      assert(batches.synchronized(batches.last) == Set((4, "d")))
      assert(batches.synchronized(batches.size) == 3, "one batch per commit window")
    } finally q.stop()
  }

  test("streaming change feed (changes=true) tags insert/update/delete per batch") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val path = java.nio.file.Files.createTempDirectory("graft_stream_cdf").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "pc", "v"))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[(Int, String)]]
    val q = spark.readStream.format("graft")
      .option("startingVersion", "latest").option("changes", "true").load(path)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized {
          batches += df.select("k", "_change_type").collect()
            .map(r => (r.getInt(0), r.getString(1))).toSet
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      t.upsert(Seq((2, 2L, "b2"), (3, 1L, "c")).toDF("k", "pc", "v"))
      q.processAllAvailable()
      assert(batches.synchronized(batches.last) ==
        Set((2, "update_postimage"), (3, "insert")), s"got ${batches.last}")
      t.delete(col("k") === 1)
      q.processAllAvailable()
      assert(batches.synchronized(batches.last) == Set((1, "delete")), s"got ${batches.last}")
    } finally q.stop()
  }

  test("maxVersionsPerTrigger bounds each micro-batch to one commit window") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val path = java.nio.file.Files.createTempDirectory("graft_stream_rate").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq((2, 1L, "b")).toDF("k", "pc", "v"))
    t.upsert(Seq((3, 1L, "c")).toDF("k", "pc", "v"))
    // 3 commits outstanding; with the cap each drains as its own batch
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(path)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.select("k").collect().map(_.getInt(0)).toSet }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.synchronized(batches.toSeq) == Seq(Set(1), Set(2), Set(3)),
        s"one commit per batch, got ${batches.synchronized(batches.toSeq)}")
    } finally q.stop()
  }

  test("maxBytesPerTrigger bounds micro-batches by commit-log byte stats") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val path = java.nio.file.Files.createTempDirectory("graft_stream_bytes").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq((2, 1L, "b")).toDF("k", "pc", "v"))
    t.upsert(Seq((3, 1L, "c")).toDF("k", "pc", "v"))
    // every commit's file is larger than 1 byte, so each drains alone
    // (an oversized single commit must still be admitted - progress)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    val q = spark.readStream.format("graft")
      .option("maxBytesPerTrigger", "1").load(path)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.select("k").collect().map(_.getInt(0)).toSet }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.synchronized(batches.toSeq) == Seq(Set(1), Set(2), Set(3)),
        s"one commit per batch under the byte cap, got ${batches.synchronized(batches.toSeq)}")
    } finally q.stop()
  }

  test("rate-limited stream restart does not re-deliver committed versions") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val path = java.nio.file.Files.createTempDirectory("graft_stream_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_restart_c").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq((2, 1L, "b")).toDF("k", "pc", "v"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(path)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized { batches += df.select("k").collect().map(_.getInt(0)).toSet }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // drains v0, v1 as two capped batches
    assert(batches.synchronized(batches.toSeq) == Seq(Set(1), Set(2)))
    t.upsert(Seq((3, 1L, "c")).toDF("k", "pc", "v"))
    run() // restart: the capped source must resume ABOVE the committed offset
    assert(batches.synchronized(batches.toSeq) == Seq(Set(1), Set(2), Set(3)),
      s"restart re-delivered: ${batches.synchronized(batches.toSeq)}")
  }

  test("graft streaming source honors startingVersion=latest") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val path = java.nio.file.Files.createTempDirectory("graft_stream_lv").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v"))
    t.upsert(Seq((2, 1L, "b")).toDF("k", "pc", "v"))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    val q = spark.readStream.format("graft").option("startingVersion", "latest").load(path)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.select("k").collect().map(_.getInt(0)).toSet }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.synchronized(batches.toSeq).flatten.isEmpty,
        "history before stream start is skipped")
      t.upsert(Seq((3, 1L, "c")).toDF("k", "pc", "v"))
      q.processAllAvailable()
      assert(batches.synchronized(batches.flatten.toSet) == Set(3))
    } finally q.stop()
  }

  test("graft streaming source honors startingTimestamp (commit-timeline resolved)") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val path = java.nio.file.Files.createTempDirectory("graft_stream_ts").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "a")).toDF("k", "pc", "v")) // v0
    t.upsert(Seq((2, 1L, "b")).toDF("k", "pc", "v")) // v1
    // instant strictly between v1 and v2 — only v2+ commits qualify
    val v1Time = graft.lake.LakeTable.commitTimeMillis(
      t.commits.find(_.version == 1).get.commitTime)
    Thread.sleep(5)
    t.upsert(Seq((3, 1L, "c")).toDF("k", "pc", "v")) // v2
    val got = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val q = spark.readStream.format("graft")
      .option("startingTimestamp", (v1Time + 1).toString).load(path)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("k", "v").collect()
          .map(r => (r.getInt(0), r.getString(1))) }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.synchronized(got.toSet) == Set((3, "c")),
        s"only commits at-or-after the timestamp must stream, got $got")
    } finally q.stop()
    // a timestamp before the table's creation streams the full history
    val all = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q2 = spark.readStream.format("graft")
      .option("startingTimestamp", "2000-01-01 00:00:00").load(path)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        all.synchronized { all ++= df.select("k").collect().map(_.getInt(0)) }
        ()
      }.start()
    try {
      q2.processAllAvailable()
      assert(all.synchronized(all.toSet) == Set(1, 2, 3))
    } finally q2.stop()
  }

  test("islands sessionization equals native session_window") {
    val islands = SparkEntry.queries("q47_sessionize")(spark, sf)
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(2 - 1))).groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).sorted.toSeq }

    val native = graft.queries.Tables.events(spark, sf)
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .groupBy(session_window(col("ts_t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).sorted.toSeq }

    assert(islands == native)
  }

  test("dedup-on-ingest stream drops cross-batch duplicates via the fingerprint index") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val src = java.nio.file.Files.createTempDirectory("graft_dstream_src").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft_dstream_ckp").toString
    val seedDocs = Seq((0L, "seed zero content")).toDF("doc_id", "text")
    val index = LakeTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_dstream_idx").toString,
      TableSpec("fingerprint", "doc_id"),
      graft.ext.Dedup.copyCounts(seedDocs)
        .select(col("fingerprint"), col("keep_id").cast("long").as("doc_id")))
    val target = LakeTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_dstream_tgt").toString,
      TableSpec("doc_id", "doc_id"), seedDocs)
    val schema = seedDocs.schema

    Seq((1L, "first new content"), (2L, "second new content"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    graft.streaming.DedupStream.ingest(spark, src, schema, index, target, ckp)
    assert(target.read().select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L))

    // batch 2: a copy of doc 1's content, a copy of the seed, and one new doc
    Seq((10L, "first new content"), (11L, "seed zero content"),
        (12L, "third new content"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    graft.streaming.DedupStream.ingest(spark, src, schema, index, target, ckp)
    assert(target.read().select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 12L), "only the genuinely new doc lands")
    assert(index.read().count() == 4, "index = one fingerprint per distinct content")
  }

  test("dropDuplicatesWithinWatermark dedups across batches, evicts state past the watermark") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_ddw_src").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft_ddw_ckp").toString
    val t0 = 1700000000000000L // µs
    val hour = 3600L * 1000000L
    val day = 24L * hour
    val outDir = java.nio.file.Files.createTempDirectory("graft_ddw_out").toString
    // memory sinks cannot recover a checkpoint — accumulate emitted rows
    // via foreachBatch parquet appends instead (the restartable shape)
    def drain(): Map[String, Long] = {
      val q = spark.readStream
        .schema("k STRING, ts_us BIGINT").parquet(src)
        .withColumn("ts_t", timestamp_micros(col("ts_us")))
        .withWatermark("ts_t", "1 day")
        .dropDuplicatesWithinWatermark("k")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(outDir): Unit
        }
        .option("checkpointLocation", ckp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir).groupBy("k").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    Seq(("A", t0), ("B", t0)).toDF("k", "ts_us")
      .coalesce(1).write.mode("append").parquet(src)
    assert(drain() == Map("A" -> 1L, "B" -> 1L), "first occurrences all emit")
    // a dup within the watermark drops even though it arrives batches later;
    // C advances the watermark to t0+2d, past A's t0+1d state expiry
    Seq(("A", t0 + hour), ("C", t0 + 3 * day)).toDF("k", "ts_us")
      .coalesce(1).write.mode("append").parquet(src)
    assert(drain() == Map("A" -> 1L, "B" -> 1L, "C" -> 1L),
      "in-watermark duplicate must drop across micro-batches")
    // A's state was evicted when the watermark passed — a fresh A re-emits:
    // bounded state means dedup is only guaranteed WITHIN the delay
    Seq(("A", t0 + 2 * day + hour)).toDF("k", "ts_us")
      .coalesce(1).write.mode("append").parquet(src)
    assert(drain() == Map("A" -> 2L, "B" -> 1L, "C" -> 1L),
      "post-eviction key behaves as first-seen again (bounded state)")
  }
}
