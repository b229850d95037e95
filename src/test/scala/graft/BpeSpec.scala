package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Bpe

/** Distributed BPE training + native encode: canonical merge order on a
  * known corpus, round-trip reconstruction, determinism, and the
  * native-expression ≡ scalar-replay equivalence.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("training learns the canonical most-frequent-pair merges") {
    // classic BPE example shape: "low" x5, "lowest" x2, "newer" x6, "wider" x3
    val corpus = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++
        Seq.fill(6)("newer") ++ Seq.fill(3)("wider")).mkString(" ")))
      .toDF("doc_id", "text")
    val m = Bpe.train(corpus, numMerges = 4)
    assert(m.pairs.length == 4)
    // most frequent first pair: 'e','r·' appears in newer(6) + wider(3) = 9
    assert(m.pairs.head == ("e", "r" + Bpe.EOW), s"got ${m.pairs.head}")
    // merges are deterministic across runs
    val m2 = Bpe.train(corpus, numMerges = 4)
    assert(m.pairs == m2.pairs)
  }

  test("encode round-trips: stripping marks reconstructs the lowercased text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val m = Bpe.train(docs, numMerges = 30)
    assert(m.pairs.nonEmpty)
    val enc = docs.select(col("doc_id"), col("text"),
      Bpe.encode(m, col("text")).as("bpe"))
    val bad = enc.withColumn("rejoined",
        regexp_replace(concat_ws("", col("bpe")), Bpe.EOW, " "))
      .withColumn("expected",
        concat(regexp_replace(trim(lower(col("text"))), "\\s+", " "), lit(" ")))
      .filter(col("rejoined") =!= col("expected"))
    assert(bad.isEmpty, s"round-trip failed for ${bad.count()} docs")
    // tokens per doc never exceed character count and shrink under merges
    val sizes = enc.select(size(col("bpe")).as("n"),
      length(regexp_replace(col("text"), "\\s+", "")).as("chars")).collect()
    assert(sizes.forall(r => r.getInt(0) <= r.getInt(1)),
      "BPE must not expand beyond character segmentation")
  }

  test("incremental pair counts reproduce the full-recount merge sequence exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val inc = Bpe.train(docs, numMerges = 25)
    val ref = Bpe.trainRecount(docs, numMerges = 25)
    assert(inc.pairs == ref.pairs,
      s"incremental and recount training diverged:\n${inc.pairs}\nvs\n${ref.pairs}")
  }

  test("round cost is proportional to affected words, not the vocabulary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val (m, stats) = Bpe.trainWithStats(docs, numMerges = 30)
    assert(m.pairs.length == 30 && stats.length == 30)
    val vocabWords = Bpe.wordFrequencies(docs).count()
    // every round's work set is the words containing the merged pair; past
    // the first few ultra-common pairs that must be a small fraction of
    // the vocabulary — the old loop re-exploded ALL of it every round
    val later = stats.drop(5)
    assert(later.forall(_.affectedWords < vocabWords),
      s"affected must never reach the full vocab: $stats")
    assert(later.map(_.affectedWords).sum < vocabWords * later.length / 2,
      s"mean affected fraction must stay well under the vocabulary: " +
        s"${later.map(_.affectedWords)} of $vocabWords words")
  }

  test("batched training: identical merges to one-at-a-time, ≥10x fewer Spark jobs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(300)
      .localCheckpoint(true) // pin the input so both runs read identical rows
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        // the listener bus is async — wait for the count to go quiet
        var last = -1
        while (n.get() != last) { last = n.get(); Thread.sleep(300) }
        n.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    var batched: (Bpe.Merges, Seq[Bpe.RoundStat]) = null
    var single: (Bpe.Merges, Seq[Bpe.RoundStat]) = null
    val jb = countJobs { batched = Bpe.trainWithStats(docs, numMerges = 120) }
    val js = countJobs { single = Bpe.trainWithStats(docs, numMerges = 120, maxBatch = 1) }
    // the certificate makes batching invisible in the OUTPUT: merges AND
    // per-round stats (chosen pair, its exact intermediate count, affected
    // words) are bit-identical to the sequential loop
    assert(batched._1.pairs == single._1.pairs,
      s"batched and sequential merge sequences diverged:\n${batched._1.pairs}\nvs\n${single._1.pairs}")
    assert(batched._2 == single._2,
      s"round stats diverged:\n${batched._2}\nvs\n${single._2}")
    // ...and visible in the COST: the scheduler round-trips per merge
    // collapse by the batch factor
    assert(jb * 10 <= js,
      s"batched training must use >=10x fewer Spark jobs: $jb vs $js")
  }

  test("anchored batching sustains ≤1 job per merge amortized at 256 merges") {
    // CI-shaped guard for the BASELINE.md BpeScale evidence: a regression
    // in the anchor/certificate logic (e.g. re-proposing already-merged
    // pairs) silently degrades batched training to ~1 accepted merge per
    // full-cost speculative round — invisible to the correctness specs,
    // only the job count catches it. Synthetic seeded corpus with
    // Zipf-ish word frequencies: mostly-distinct pair counts, so ties
    // (the legitimate single-merge backoff) don't mask the regression.
    val rnd = new scala.util.Random(42)
    val words = (0 until 4000).map { _ =>
      val len = 6 + rnd.nextInt(10)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    val rows = words.zipWithIndex.map { case (w, i) =>
      Seq.fill(math.max(1, (40000.0 / (i + 1)).toInt))(w).mkString(" ")
    }
    val docs = rows.toDF("text").repartition(4).localCheckpoint(true)
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    val merges =
      try {
        val m = Bpe.trainWithStats(docs, numMerges = 256)._1.pairs.size
        var last = -1
        while (n.get() != last) { last = n.get(); Thread.sleep(300) }
        m
      } finally spark.sparkContext.removeSparkListener(l)
    assert(merges >= 256, s"corpus must sustain 256 merges, got $merges")
    assert(n.get() <= merges,
      s"anchored batching must stay ≤1 Spark job per merge amortized " +
        s"(got ${n.get()} jobs for $merges merges)")
  }

  test("native encode equals a scalar replay of the merge table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    val m = Bpe.train(docs, numMerges = 15)
    val rank = new java.util.HashMap[String, Integer]()
    m.pairs.zipWithIndex.foreach { case ((l, r), i) => rank.put(l + " " + r, i) }
    docs.select(col("text"), Bpe.encode(m, col("text")).as("bpe")).collect()
      .foreach { row =>
        val expected = graft.functions.BpeUtil
          .encodeText(row.getString(0), Bpe.EOW, rank).toSeq
        assert(row.getSeq[String](1) == expected)
      }
  }

  test("persisted tokenizer round-trips; re-save versions; time travel pins") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_bpe_art").toString
    val m1 = Bpe.train(docs.limit(60), numMerges = 12)
    Bpe.save(spark, path, m1)
    // reload is rank-for-rank identical, and encodes identically
    val back = Bpe.loadMerges(spark, path)
    assert(back.pairs == m1.pairs)
    val probe = docs.limit(10)
    val a = probe.select(Bpe.encode(m1, col("text"))).collect().map(_.getSeq[String](0))
    val b = probe.select(Bpe.encode(back, col("text"))).collect().map(_.getSeq[String](0))
    assert(a.toSeq == b.toSeq)
    // retrain on more data and re-save: the artifact versions in place
    val m2 = Bpe.train(docs.limit(200), numMerges = 20)
    Bpe.save(spark, path, m2)
    assert(Bpe.loadMerges(spark, path).pairs == m2.pairs)
    // a consumer pinned to the old version keeps the old tokenizer
    assert(Bpe.loadMerges(spark, path, versionAsOf = Some(0L)).pairs == m1.pairs)
  }
}
