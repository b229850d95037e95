package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Verification for the non-SQL-expressible extension ops: planted-duplicate
  * recall for MinHash/SimHash/embedding dedup, LSH-vs-brute-force recall for
  * ANN, language-ID sanity, decode-stub determinism.
  */
class ExtSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")
  def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Planted near-dups: +100000 ids with one appended token. */
  def planted: DataFrame = docs.unionByName(
    docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" graftdup"))))

  def plantedIds: Set[(Long, Long)] =
    docs.filter(col("doc_id") % 10 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000L)).toSet

  test("contamination flags every planted eval doc near 1.0, clean docs stay low") {
    val train = docs
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" graftdup")))
    val expected = plantedIds.map(_._2)
    val flagged = Dedup.contamination(train, evalDocs, threshold = 0.8, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(expected.subsetOf(flagged.keySet),
      s"missed ${expected -- flagged.keySet}")
    assert(flagged.values.forall(_ >= 0.8))
    // a doc with no train overlap must not be flagged
    import spark.implicits._
    val clean = Seq((999999L, "zzqx wvut plonk vree karmic blorp nuxl trep")).toDF("doc_id", "text")
    assert(Dedup.contamination(train, clean, threshold = 0.1, k = 3).isEmpty)
  }

  test("minhash LSH finds every planted near-duplicate pair") {
    val found = Dedup.minhashPairs(planted, threshold = 0.6, numHashes = 64, bands = 16, k = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = plantedIds -- found
    assert(missed.isEmpty, s"minhash missed planted pairs: $missed")
  }

  test("minhash pairs are a subset of exact n-gram Jaccard pairs (no false positives)") {
    val mh = Dedup.minhashPairs(planted, 0.6, 64, 16, k = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(planted, 0.6, k = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact), s"minhash produced non-exact pairs: ${mh -- exact}")
  }

  test("PPJoin prefix filtering ≡ full inverted index, with fewer candidates") {
    val full = Dedup.ngramJaccardPairs(planted, 0.6, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pp = Dedup.ngramJaccardPairs(planted, 0.6, k = 4, prefixFilter = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pp == full, s"prefix filter changed results: ${(pp -- full) ++ (full -- pp)}")
    // the point of the plan: the candidate set is strictly smaller than
    // the full index's joined pair set
    val docs = planted.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 4).as("sh"))
      .withColumn("n_sh", org.apache.spark.sql.functions.size(col("sh")))
    val candN = Dedup.prefixCandidates(docs, 0.6).count()
    val inv = docs.select(col("id"), explode(col("sh")).as("s"))
    val fullN = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select("a.id", "b.id").distinct().count()
    assert(candN < fullN,
      s"prefix filtering must shrink the candidate set ($candN vs $fullN)")
    assert(full.map(p => (p._1, p._2)).subsetOf(
      Dedup.prefixCandidates(docs, 0.6).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet),
      "every true pair must survive candidate generation (zero false negatives)")
  }

  test("weighted sampling: deterministic, k-exact, weight-proportional, no w<=0") {
    import spark.implicits._
    import graft.ext.Sampling
    // 400 light docs (w=1) + 100 heavy (w=50): heavies hold ~92.6% of the
    // mass, so a k=50 sample should be dominated by them
    val pool = ((1L to 400L).map(i => (i, 1L)) ++ (1001L to 1100L).map(i => (i, 50L)) ++
      Seq((9999L, 0L), (9998L, -3L))).toDF("doc_id", "w")
    val s1 = Sampling.weightedSample(pool, 50, col("w")).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.weightedSample(pool, 50, col("w")).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "same seed must replay the same sample")
    assert(s1.size == 50 && s1.distinct.size == 50)
    assert(!s1.contains(9999L) && !s1.contains(9998L), "w<=0 must never qualify")
    val heavies = s1.count(_ >= 1001L)
    assert(heavies >= 35, s"heavy docs must dominate ∝ weight (got $heavies/50)")
    // exact A-ES law replay: the engine's pick must equal a driver-side
    // recomputation of −ln(u)/w over the same portable md5 uniforms
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(s"$id:graft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 281474976710656.0
      -math.log(u) / w.toDouble
    }
    val expect = (((1L to 400L).map(i => (i, 1L)) ++ (1001L to 1100L).map(i => (i, 50L)))
      .map { case (id, w) => (key(id, w), id) }.sorted.take(50).map(_._2)).toSet
    assert(s1.toSet == expect, "engine sample must equal the A-ES law replay")
    // a different seed draws a different (but same-law) sample
    val s3 = Sampling.weightedSample(pool, 50, col("w"), seed = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(s3 != s1 && s3.size == 50)
  }

  test("edit-distance join finds every ≤1-edit pair (sub, ins, del, eq) and no more") {
    import spark.implicits._
    val right = Seq((1L, "alphabet"), (2L, "spark"), (3L, "granite"))
      .toDF("id_b", "name")
    val left = Seq(
      (10L, "alphabet"),  // equal            → dist 0 to 1
      (11L, "alphabex"),  // substitution     → dist 1 to 1
      (12L, "alphabets"), // insertion        → dist 1 to 1
      (13L, "lphabet"),   // deletion         → dist 1 to 1
      (14L, "sprk"),      // deletion         → dist 1 to 2
      (15L, "granizz"),   // two substitutions → dist 2: must NOT match
      (16L, "zzzzz")      // unrelated        → no match
    ).toDF("id_a", "name")
    val got = Dedup.editDistanceJoin(left, right, "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((10L, 1L, 0), (11L, 1L, 1), (12L, 1L, 1), (13L, 1L, 1), (14L, 2L, 1)),
      s"got $got")
  }

  test("new join ops plan as equi-joins — never nested loops") {
    import spark.implicits._
    def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
    val l = Seq((1L, "abc")).toDF("id_a", "name")
    val r = Seq((2L, "abd")).toDF("id_b", "name")
    val fuzzy = planOf(Dedup.editDistanceJoin(l, r, "name"))
    assert(!fuzzy.contains("BroadcastNestedLoopJoin") && !fuzzy.contains("CartesianProduct"),
      s"fuzzy join must hash-join on variants:\n$fuzzy")
    val docs = planted.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 4).as("sh"))
      .withColumn("n_sh", org.apache.spark.sql.functions.size(col("sh")))
    val pp = planOf(Dedup.prefixCandidates(docs, 0.6))
    assert(!pp.contains("BroadcastNestedLoopJoin") && !pp.contains("CartesianProduct"),
      s"prefix candidates must equi-join on the shingle:\n$pp")
  }

  test("length-grouped batches collapse padding waste vs random batching") {
    import graft.ext.Sampling
    val out = Sampling.lengthGroupedBatches(docs, shards = 8, batchSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(out.map(_._1).distinct.length == out.length, "every doc appears once")
    // padding waste of a batch = Σ(max_len − len); compare grouped vs a
    // random (doc_id-order) batching of the same corpus
    def waste(batches: Iterable[Iterable[Long]]): Long = batches.map { b =>
      val m = b.max; b.map(m - _).sum
    }.sum
    val grouped = waste(out.groupBy(x => (x._3, x._4)).values.map(_.map(_._2).toSeq))
    val random = waste(out.sortBy(_._1).map(_._2).toSeq.grouped(16).map(_.toSeq).toSeq)
    assert(grouped * 3 <= random,
      s"grouped padding waste $grouped should be ≪ random $random")
    // deterministic across runs
    val again = Sampling.lengthGroupedBatches(docs, shards = 8, batchSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("simhash finds planted near-duplicates (appended token ⇒ tiny bit flip)") {
    val found = Dedup.simhashPairs(planted, maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (plantedIds & found).size.toDouble / plantedIds.size
    assert(recall >= 0.9, s"simhash recall $recall below 0.9")
  }

  test("simhash is deterministic and order-sensitive") {
    val h1 = spark.range(1).select(Dedup.simhash(lit("alpha beta gamma"))).head().getLong(0)
    val h2 = spark.range(1).select(Dedup.simhash(lit("alpha beta gamma"))).head().getLong(0)
    val h3 = spark.range(1).select(Dedup.simhash(lit("gamma beta alpha"))).head().getLong(0)
    assert(h1 == h2)
    // simhash is bag-of-words by construction: permutation keeps the hash
    assert(h1 == h3, "simhash over unweighted tokens is order-insensitive")
    val h4 = spark.range(1).select(TextAnalysis.rollingHash(lit("gamma beta alpha"))).head().getLong(0)
    val h5 = spark.range(1).select(TextAnalysis.rollingHash(lit("alpha beta gamma"))).head().getLong(0)
    assert(h4 != h5, "rolling hash IS order-sensitive")
  }

  test("embedding LSH dedup finds all planted scaled duplicates") {
    val plantedEmb = emb.unionByName(
      emb.filter(col("vec_id") % 40 === 0)
        .withColumn("vec_id", col("vec_id") + 100000L)
        .withColumn("embedding", transform(col("embedding"), x => x * lit(2.0f))))
    val expected = emb.filter(col("vec_id") % 40 === 0).select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000L)).toSet
    val found = Dedup.embeddingPairs(plantedEmb, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(found),
      s"embedding dedup missed scaled duplicates: ${expected -- found}")
  }

  test("LSH top-k recall vs brute force >= 0.7 with multi-probe") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.7, s"LSH recall $recall below 0.7")
  }

  test("hard negatives: top-k of the corpus minus the positive set, exactly") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 8)
    // positives: each query's true top-2 plus an arbitrary aligned pair
    val top2 = Similarity.bruteForceTopK(emb, queries, 2)
      .select(col("query_id"), col("neighbor_id").as("pos_id"))
    val positives = top2.unionByName(
      queries.select(col("vec_id").as("query_id"), (col("vec_id") + 5).as("pos_id")))
    val posSet = positives.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.hardNegatives(emb, queries, positives, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // no positive (and never the query itself) appears as a negative
    assert(got.forall { case (q, n, _) => !posSet.contains((q, n)) && q != n })
    // and the result IS the rank-rewritten suffix of the unrestricted
    // top list: drop positives from brute-force top-(k + |pos per query|),
    // re-rank, take 4
    val bf = Similarity.bruteForceTopK(emb, queries, 4 + 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = bf.filterNot { case (q, n, _) => posSet.contains((q, n)) }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(_._3).take(4).zipWithIndex.map { case ((_, n, _), i) => (q, n, i + 1) }
      }.toSet
    assert(got.toSet == want, s"hard negatives diverged:\n$got\nvs\n$want")
  }

  test("int8-quantized top-k recall vs float brute force >= 0.9") {
    import org.apache.spark.sql.functions.expr
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val qz = Similarity.quantizedTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & qz).size.toDouble / bf.size
    assert(recall >= 0.9, s"int8 recall $recall below 0.9 — quantization too lossy")
    // native pack/dot ≡ the declarative integer formulation, bit for bit
    val probe = emb.limit(50)
      .withColumn("qv", expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 10.0) as int))"))
      .withColumn("native", graft.functions.Int8Ops.dotInt8(
        graft.functions.Int8Ops.pack(col("qv")), graft.functions.Int8Ops.pack(col("qv"))))
      .withColumn("hof", expr(
        "aggregate(zip_with(qv, qv, (a, b) -> cast(a as bigint) * b), 0L, (s, x) -> s + x)"))
    assert(probe.filter(col("native") =!= col("hof")).isEmpty,
      "DotInt8/PackInt8 must equal the HOF integer dot exactly")
  }

  test("PQ/ADC top-k: recall floor, determinism, native ADC ≡ HOF lookup") {
    import org.apache.spark.sql.functions.expr
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & pq).size.toDouble / bf.size
    // random near-orthogonal embeddings are PQ's worst case; the point of
    // the compressed scan is shortlisting, not final ranking
    assert(recall >= 0.2, s"PQ recall $recall below 0.2")
    // the production shape — ADC shortlist + exact rerank — recovers recall
    val rr = Similarity.pqTopK(emb, queries, 10, rerank = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rrRecall = (bf & rr).size.toDouble / bf.size
    assert(rrRecall >= 0.6, s"PQ+rerank recall $rrRecall below 0.6")
    assert(rrRecall > recall, "exact rerank must improve on raw ADC ranking")
    // deterministic end to end (codebook sample + order-pinned FP)
    val again = Similarity.pqTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq == again, "pqTopK must be deterministic")
    // native AdcScore ≡ a scalar replay of the same table lookup, bit for bit
    val ks = 4
    val probe = emb.limit(50)
      .withColumn("codes", graft.functions.Int8Ops.pack(expr(
        "transform(slice(embedding, 1, 8), x -> abs(cast(round(cast(x as double) * 10.0) as int)) % 4)")))
      .withColumn("lut", expr(
        "transform(sequence(1, 32), i -> cast(i as double) * 1.5)"))
      .withColumn("native", graft.functions.Int8Ops.adc(col("codes"), col("lut"), ks))
    probe.select("codes", "lut", "native").collect().foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      val lut = r.getSeq[Double](1)
      var expected = 0.0d
      codes.zipWithIndex.foreach { case (c, j) => expected += lut(j * ks + (c & 0xff)) }
      assert(r.getDouble(2) == expected, "AdcScore must equal the scalar replay exactly")
    }
  }

  test("ngram typicality separates boilerplate from line noise") {
    import spark.implicits._
    val planted = docs.select("doc_id", "text").unionByName(Seq(
      // boilerplate: the same sentence the corpus-common way, repeated
      (900000L, Seq.fill(20)("the data table row value part").mkString(" ")),
      // line noise: grams nobody else has
      (900001L, "zqx9 wvu8 plm7 okn6 ijb5 uhv4 ygc3 tfx2 rdz1 esw0")
    ).toDF("doc_id", "text"))
    val t = graft.ext.TextAnalysis.typicality(planted, n = 2, minCount = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (bN, bKnown, bMass) = t(900000L)
    val (nN, nKnown, _) = t(900001L)
    assert(bN > 0 && bKnown == bN, "repeated common grams must all be known")
    assert(bMass > bN, "boilerplate gram mass must exceed its occurrence count")
    assert(nN == 9 && nKnown == 0, "noise grams must be unknown to the corpus")
  }

  test("deterministic shuffle: exact permutation, seed-keyed, partitioning-stable") {
    import spark.implicits._
    val n = docs.count()
    def posMap(df: org.apache.spark.sql.DataFrame, seed: Long) =
      graft.ext.Sampling.deterministicShuffle(df, seed)
        .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val p1 = posMap(docs, 7L)
    assert(p1.values.toSeq.sorted == (0L until n).toSeq,
      "positions must be an exact 0..n-1 permutation")
    // same seed, different physical partitioning -> identical mapping
    assert(posMap(docs.repartition(7), 7L) == p1)
    // a different seed produces a genuinely different order
    assert(posMap(docs, 8L) != p1)
  }

  test("incremental dedup: index hits and within-batch dups drop, commit persists") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    val seed = graft.ext.Dedup.copyCounts(
        Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"))
      .select(col("fingerprint"), col("keep_id").cast("long").as("doc_id"))
    val index = LakeTable.create(spark, dir,
      TableSpec("fingerprint", "doc_id", bloomBitsPerKey = 10), seed)
    val batch1 = Seq(
      (2L, "delta epsilon zeta"),   // new content -> survives
      (10L, "alpha beta gamma"),    // already indexed -> drops
      (11L, "delta epsilon zeta")   // within-batch copy, larger id -> drops
    ).toDF("doc_id", "text")
    val s1 = graft.ext.Dedup.incrementalDedup(index, batch1)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(2L))
    // the commit made batch1's survivor part of the corpus memory
    val batch2 = Seq(
      (20L, "delta epsilon zeta"),  // introduced by batch1 -> drops
      (21L, "eta theta iota")       // new -> survives
    ).toDF("doc_id", "text")
    val s2 = graft.ext.Dedup.incrementalDedup(index, batch2)
      .select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(21L))
    // MoR index with a tombstoned key: the probe must NOT report it existing
    val dir2 = java.nio.file.Files.createTempDirectory("graft_incdedup_mor").toString
    val index2 = LakeTable.create(spark, dir2,
      TableSpec("fingerprint", "doc_id", mor = true), seed)
    index2.deleteKeys(seed.select("fingerprint"))
    val s3 = graft.ext.Dedup.incrementalDedup(index2,
        Seq((30L, "alpha beta gamma")).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().sorted
    assert(s3.toSeq == Seq(30L), "a tombstoned fingerprint must readmit content")
  }

  test("incremental near-dup: near-copies drop across and within batches, commit persists") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    // portable seeded hash = parse(first 15 hex of md5("seed:shingle"))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("0:a".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val gotHash = spark.range(1)
      .select(graft.ext.Dedup.portableSeededHash(lit(0), lit("a"))).head().getLong(0)
    assert(gotHash == expected)

    val wordsA = (0 until 40).map(i => s"alpha$i").mkString(" ")
    val wordsB = (0 until 40).map(i => s"beta$i").mkString(" ")
    val wordsC = (0 until 40).map(i => s"gamma$i").mkString(" ")
    val wordsD = (0 until 40).map(i => s"delta$i").mkString(" ")
    def mutate(t: String) = t.split(" ").updated(20, "CHANGED").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_neardedup").toString
    val index = LakeTable.create(spark, dir, TableSpec("bk", "doc_id"),
      graft.ext.Dedup.nearDupIndexRows(Seq((1L, wordsA)).toDF("doc_id", "text")))
    val batch1 = Seq(
      (10L, mutate(wordsA)), // near-copy of indexed A -> drops
      (11L, wordsB),         // new -> survives
      (12L, mutate(wordsB)), // near-copy of earlier batch doc -> drops
      (13L, wordsC)          // new -> survives
    ).toDF("doc_id", "text")
    val s1 = graft.ext.Dedup.incrementalNearDedup(index, batch1, minEqual = 32)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(11L, 13L), s"batch1 survivors: ${s1.toSeq}")
    // commit admitted B and C: their near-copies drop next batch, D survives
    val batch2 = Seq(
      (20L, mutate(wordsC)),
      (21L, wordsD)
    ).toDF("doc_id", "text")
    val s2 = graft.ext.Dedup.incrementalNearDedup(index, batch2, minEqual = 32)
      .select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(21L), s"batch2 survivors: ${s2.toSeq}")
  }

  test("dedup ops leave no CacheManager entries behind (round-5 persist leak)") {
    import spark.implicits._
    import graft.lake.{LakeTable, TableSpec}
    // start from a clean cache (suites run sequentially in the forked JVM)
    spark.catalog.clearCache()
    Dedup.minhashPairs(planted, 0.6, 64, 16, k = 4).count()
    Dedup.simhashPairs(planted, maxHamming = 8).count()
    val words = (0 until 40).map(i => s"cache$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_cacheleak").toString
    val index = LakeTable.create(spark, dir, TableSpec("bk", "doc_id"),
      graft.ext.Dedup.nearDupIndexRows(Seq((1L, words)).toDF("doc_id", "text")))
    Dedup.incrementalNearDedup(index,
      Seq((2L, words.split(" ").updated(20, "X").mkString(" ")),
        (3L, (0 until 40).map(i => s"fresh$i").mkString(" "))).toDF("doc_id", "text"),
      minEqual = 32).count()
    // every persist these paths take must be released before return: in a
    // long-lived session (the driver's one-JVM bench calls minhashPairs 4x)
    // leaked entries accumulate in the CacheManager and pin block storage
    // for the rest of the suite
    assert(spark.sharedState.cacheManager.isEmpty,
      "dedup left entries in the CacheManager")
  }

  test("stupid-backoff LM scoring: exact fixed-point values, backoff levels, OOV") {
    import spark.implicits._
    // model: N=6; uni a:2 b:2 c:1 d:1; bi "a b":2 "b c":1 "c a":1 "b d":1;
    // tri "a b c":1 "b c a":1 "c a b":1 "a b d":1
    val model = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val scored = Seq(
      (1L, "a b c"), // uni 2e6/6=333333; bi 2e6/2=1000000; tri 1e6/2=500000
      (2L, "b b z")  // uni 333333; bigram miss→2*4e5/6=133333; OOV→0
    ).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.stupidBackoff(model, scored)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got(1L) == ((3L, 1L, 1L, 1L, 0L, 1833333L)))
    assert(got(2L) == ((3L, 0L, 0L, 2L, 1L, 466666L)))
    // an in-model document must outscore its own reversed token sequence:
    // natural order hits trigrams everywhere, the reversal mostly backs off
    val fluent = docs.select("doc_id", "text").limit(40)
    val sample = fluent.orderBy("doc_id").head().getString(1)
    val toks = sample.trim.toLowerCase.split("\\s+").take(30)
    val probe = Seq(
      (800000L, toks.mkString(" ")),
      (800001L, toks.reverse.mkString(" "))
    ).toDF("doc_id", "text")
    val d = graft.ext.TextAnalysis.stupidBackoff(fluent, probe)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(d(800000L) > d(800001L),
      s"in-order grams must outscore the reversed sequence: $d")
  }

  test("domain mixture hits each domain's token budget and is deterministic") {
    import org.apache.spark.sql.functions.{expr, sum => fsum}
    val weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    def run() = graft.ext.Sampling.mixture(docs, weights, totalTokens = 2000L)
    val got = run()
      .withColumn("tok", expr(raw"size(split(trim(text), '\\s+'))").cast("long"))
    val perDomain = got.groupBy("source").agg(fsum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDomain.keySet == weights.keySet, "only the weighted domains contribute")
    // each domain reaches its budget (corpus is big enough) and overshoots
    // by at most the boundary doc
    Seq("src0" -> 1000L, "src1" -> 500L, "src2" -> 500L).foreach { case (d, b) =>
      assert(perDomain(d) >= b, s"$d must reach its budget: ${perDomain(d)} < $b")
      assert(perDomain(d) < b + 1000, s"$d overshoots by more than one doc")
    }
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == run().select("doc_id").collect().map(_.getLong(0)).toSet,
      "mixture must be deterministic")
  }

  test("temperature mixture flattens the domain distribution at α=0.5") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, sum => fsum}
    // skewed corpus: "big" holds 96% of the tokens (1000 docs × 10 tok),
    // "small" 4% (40 docs × 10 tok); every doc is exactly 10 tokens
    val text = Seq.fill(10)("w").mkString(" ")
    val corpus = ((1 to 1000).map(i => (i.toLong, "big", text)) ++
      (2001 to 2040).map(i => (i.toLong, "small", text)))
      .toDF("doc_id", "source", "text")
    def tokensPer(df: DataFrame): Map[String, Long] = df
      .withColumn("tok", expr(raw"size(split(trim(text), '\\s+'))").cast("long"))
      .groupBy("source").agg(fsum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = graft.ext.Sampling.temperatureMixture(corpus, totalTokens = 600L)
    val got = tokensPer(mixed)
    // sqrt weights: √10000 : √400 = 100 : 20 → budgets 500 : 100 — the
    // small domain's share rises 4% → ~17%, the big one falls 96% → ~83%
    // (each domain may overshoot its budget by at most one 10-token doc)
    assert(got("big") >= 500L && got("big") < 510L, s"big budget: $got")
    assert(got("small") >= 100L && got("small") < 110L, s"small budget: $got")
    // α=1 is proportional: budgets 10000/10400 and 400/10400 of 600
    val prop = tokensPer(graft.ext.Sampling.temperatureMixture(
      corpus, totalTokens = 600L, alpha = 1.0))
    assert(prop("small") < got("small"),
      s"α=1 must give the small domain less than α=0.5: $prop vs $got")
    // deterministic across runs
    val again = graft.ext.Sampling.temperatureMixture(corpus, totalTokens = 600L)
    assert(mixed.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("unimax waterfill: epoch caps bind, leftover redistributes uniformly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, sum => fsum}
    val text = Seq.fill(10)("w").mkString(" ") // every doc = exactly 10 tokens
    val corpus = ((1 to 100).map(i => (i.toLong, "A", text)) ++
      (201 to 260).map(i => (i.toLong, "B", text)) ++
      (301 to 310).map(i => (i.toLong, "C", text)))
      .toDF("doc_id", "source", "text")
    // caps at 2 epochs: A 2000, B 1200, C 200; budget 900:
    //   C capped (200·3 ≤ 900); B uncapped (1200·2 > 700) → R=700 over 2
    //   → A 350, B 350 — and C can only REALIZE its 100 actual tokens
    val got = graft.ext.Sampling
      .unimax(corpus, totalTokens = 900L, maxEpochs = 2)
      .withColumn("tok", expr(raw"size(split(trim(text), '\\s+'))").cast("long"))
      .groupBy("source").agg(fsum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> 350L, "B" -> 350L, "C" -> 100L), s"got $got")
    // odd remainder goes to the LAST uncapped domains in cap order:
    // budget 901 → R=701 over {B, A} (B first: smaller cap) → B 350, A 351
    val odd = graft.ext.Sampling
      .unimax(corpus, totalTokens = 901L, maxEpochs = 2)
      .withColumn("tok", expr(raw"size(split(trim(text), '\\s+'))").cast("long"))
      .groupBy("source").agg(fsum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc granularity is 10 tokens: budget 351 still cuts at run<351 → 360
    assert(odd("B") == 350L && odd("A") == 360L && odd("C") == 100L, s"got $odd")
  }

  test("bm25 ranks rare-term and higher-tf docs first, exact and deterministic") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "common rare x x"),
      (2L, "common x x x"),
      (3L, "x x x x"),
      (4L, "common common x x")).toDF("doc_id", "text")
    def run() = graft.ext.TextAnalysis.bm25(corpus,
      terms = Seq("common", "rare"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = run()
    // doc 3 has no query term; rare (df=1) dominates, then tf breaks ties
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 2L), s"ranking: ${got.toSeq}")
    assert(got.find(_._1 == 1L).get._3 == 2L, "doc 1 hits both terms")
    // hand-computed exact scores: N=4, tot=16, all dl=4
    // rare@1: 7·1·22·16e6 / (3·(160+48+144)) = 2464e6/1056
    // common@1: 3·1·22·16e6 / (7·352); common@2: 3·2·22·16e6 / (7·512)
    val rare1 = 2464000000L / 1056L
    val c1 = 1056000000L / 2464L
    val c2 = 2112000000L / 3584L
    assert(got.find(_._1 == 1L).get._2 == rare1 + c1, s"doc1 score: ${got.toSeq}")
    assert(got.find(_._1 == 4L).get._2 == c2)
    assert(got.find(_._1 == 2L).get._2 == c1)
    assert(run().toSeq == got.toSeq, "bm25 must be deterministic")
  }

  test("semantic dedup drops planted scaled copies, keeps originals, deterministic") {
    import org.apache.spark.sql.functions.expr
    // ×2 scaling is FP-exact (power of two), so the copy's cosine to every
    // centroid is bit-identical to the original's: same cluster, cosine 1
    val planted = emb.unionByName(emb.filter(col("vec_id") < 30)
      .withColumn("vec_id", col("vec_id") + 500000L)
      .withColumn("embedding", expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))")))
    def run(): Set[Long] = Similarity.semanticDedup(planted, numClusters = 16,
      threshold = 0.99).select("vec_id").collect().map(_.getLong(0)).toSet
    val kept = run()
    assert((0L until 30L).forall(i => !kept.contains(500000L + i)),
      "every planted scaled copy must drop (an earlier identical-direction member exists)")
    assert((0L until 30L).count(kept.contains) > 20,
      "most originals must survive (random embeddings are rarely near-duplicates)")
    assert(kept == run(), "semanticDedup must be deterministic")
  }

  test("Lloyd-trained PQ codebooks beat the sampled ones on raw ADC recall") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def adcRecall(idx: Similarity.PqIndex): Double = {
      val got = Similarity.pqSearch(idx, emb, queries, 10)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & got).size.toDouble / bf.size
    }
    val sampled = adcRecall(Similarity.pqIndex(emb))
    val trained = adcRecall(Similarity.pqIndex(emb, trainIters = 3))
    assert(trained > sampled,
      s"trained codebooks must raise raw-ADC recall: sampled=$sampled trained=$trained")
    // partition-order-pinned means ⇒ the trained index is reproducible
    val again = adcRecall(Similarity.pqIndex(emb, trainIters = 3))
    assert(trained == again, "trained pqIndex must be deterministic")
  }

  test("IVF-PQ composed search: recall with rerank, determinism") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both approximations stacked: generous probe + exact rerank recovers
    // usable recall on worst-case random embeddings
    val ip = Similarity.ivfPqTopK(emb, queries, 10, numLists = 16, nProbe = 10, rerank = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ip).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF-PQ recall $recall below 0.3")
    val again = Similarity.ivfPqTopK(emb, queries, 10, numLists = 16, nProbe = 10, rerank = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ip == again, "ivfPqTopK must be deterministic")
    // full probing reduces to plain PQ+rerank over the whole corpus
    val full = Similarity.ivfPqTopK(emb, queries, 10, numLists = 8, nProbe = 8, rerank = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries, 10, rerank = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == pq, "nProbe = numLists must degenerate to the un-pruned PQ search")
  }

  test("IVF top-k recall vs brute force >= 0.5 at nProbe=6/16") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5, numLists = 16, nProbe = 6)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall below 0.5")
    // full probing degenerates to brute force exactly
    val full = Similarity.ivfTopK(emb, queries, 5, numLists = 8, nProbe = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf, "nProbe = numLists must equal brute force")
  }

  test("Lloyd mean fold runs on the executors yet matches a driver-side pid-ordered fold bit-exactly") {
    import graft.functions.VectorOps.toDoubleVec
    // adversarial partitioning: many partitions, uneven group spread
    val base = emb.repartition(13)
      .select((col("vec_id") % 3).cast("int").as("cid"),
        posexplode(toDoubleVec(col("embedding"))).as(Seq("pos", "x")))
      .cache()
    val got = Similarity.pinnedMeans(base, Seq("cid", "pos"))
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // reference: the old driver-side fold — per-(group, pid) partials
    // collected, sorted by pid, summed sequentially
    val partials = base
      .groupBy(col("cid"), col("pos"), spark_partition_id().as("pid"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
    val want = partials.groupBy(r => (r.getInt(0), r.getInt(1)))
      .view.mapValues { rows =>
        val ordered = rows.sortBy(_.getInt(2))
        var sAcc = 0.0d; var nAcc = 0L
        ordered.foreach { r => sAcc += r.getDouble(3); nAcc += r.getLong(4) }
        sAcc / nAcc
      }.toMap
    base.unpersist()
    assert(got.keySet == want.keySet)
    // bit-exact: the executor-side aggregate() fold must replay the exact
    // IEEE op sequence (compare raw long bits, not ==, to catch -0.0/ulp)
    val diff = got.collect { case (k, v)
        if java.lang.Double.doubleToRawLongBits(v) !=
          java.lang.Double.doubleToRawLongBits(want(k)) => k }
    assert(diff.isEmpty, s"FP sequence diverged for groups $diff")
    // and the driver-side result is one row per GROUP, not per partition
    assert(got.size == base.select("cid", "pos").distinct().count())
  }

  test("k-means-trained IVF meets the recall floor and stays deterministic") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.ivfTopK(emb, queries, 5, numLists = 16, nProbe = 6, trainIters = 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = run()
    val recall = (bf & trained).size.toDouble / bf.size
    assert(recall >= 0.5, s"trained IVF recall $recall below 0.5")
    assert(run() == trained, "training must be deterministic for identical input")
  }

  test("connected components label chains and cliques with the min reachable id") {
    import spark.implicits._
    // a 4-chain (multi-hop propagation), an isolated edge, and a triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L), (21L, 22L)).toDF("id_a", "id_b")
    val got = graft.ext.Dedup.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components converge on a long chain (pointer jumping)") {
    import spark.implicits._
    // diameter 60 ≫ the round cap — hop-only propagation would fail here
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.ext.Dedup.components(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 60 && got.values.forall(_ == 1L))
  }

  test("keep-best retention: one survivor per cluster, highest score wins, singletons live") {
    import spark.implicits._
    // cluster {1,2,3}: 2 has the top score; {10,11}: tie → smaller id; 99 unpaired
    val corpus = Seq((1L, "a", 5L), (2L, "b", 9L), (3L, "c", 7L),
      (10L, "d", 4L), (11L, "e", 4L), (99L, "f", 1L)).toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.keepBestPerCluster(corpus, pairs, score = col("q"))
      .select("doc_id", "cluster_id", "kept")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      1L -> (1L, false), 2L -> (1L, true), 3L -> (1L, false),
      10L -> (10L, true), 11L -> (10L, false), 99L -> (99L, true)))
  }

  test("keep-best on the planted corpus retains the longer planted copy") {
    val p = planted
    val rows = Dedup.keepBestPerCluster(p,
        Dedup.ngramJaccardPairs(p, threshold = 0.6, k = 4),
        score = size(split(trim(col("text")), "\\s+")).cast("long"))
      .select("doc_id", "cluster_id", "score", "kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // global invariants: exactly one survivor per cluster, and it carries
    // the cluster's (max score, min id) — checked against the op's output
    val byCluster = rows.groupBy(_._2)
    for ((c, members) <- byCluster) {
      val keptM = members.filter(_._4)
      assert(keptM.length == 1, s"cluster $c must keep exactly one")
      val winner = members.minBy(m => (-m._3, m._1))
      assert(keptM.head._1 == winner._1, s"cluster $c kept ${keptM.head._1}, not $winner")
    }
    // and concretely: in every two-member {orig, dup} cluster the planted
    // +100000 copy is one token longer and survives over the original
    val kept = rows.filter(_._4).map(_._1).toSet
    for ((orig, dup) <- plantedIds) {
      val cluster = byCluster(rows.find(_._1 == dup).get._2)
      if (cluster.map(_._1).toSet == Set(orig, dup)) {
        assert(kept.contains(dup) && !kept.contains(orig),
          s"planted $dup (longer) must beat $orig")
      }
    }
  }

  test("token-budget sample lands on the budget, deterministically") {
    import graft.ext.Sampling
    val tok = size(split(trim(col("text")), "\\s+")).cast("long")
    val total = docs.select(sum(tok)).head().getLong(0)
    val budget = total / 3
    def run() = Sampling.tokenBudget(docs, budget)
    val sel = run()
    val selTok = sel.select(sum(tok)).head().getLong(0)
    val maxDoc = docs.select(max(tok)).head().getLong(0)
    assert(selTok >= budget, "budget must be reached when the corpus allows")
    assert(selTok < budget + maxDoc, "only the boundary doc may cross the budget")
    assert(run().select("doc_id").collect().map(_.getLong(0)).toSet ==
      sel.select("doc_id").collect().map(_.getLong(0)).toSet, "selection is deterministic")
    // a budget beyond the corpus returns everything
    assert(Sampling.tokenBudget(docs, total * 2).count() == docs.count())
  }

  test("deterministic split is key-stable, exhaustive, and roughly proportional") {
    import graft.ext.Sampling
    val a = Sampling.deterministicSplit(docs).select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Sampling.deterministicSplit(docs.repartition(7)).select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.values.toSet == Set("train", "val", "test"), "every row lands in a split")
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.65 && frac < 0.85, s"train fraction $frac far from 12/16")
  }

  test("brute-force top-k gets a partial WindowGroupLimit before the shuffle") {
    val plan = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Partial") && plan.contains("WindowGroupLimit"),
      "map-side top-k pushdown must bound what reaches the per-query reducer")
  }

  test("IVF list assignment plans shuffle-free (only the final top-k windows)") {
    val queries = emb.filter(col("vec_id") < 20)
    val plan = Similarity.ivfTopK(emb, queries, 5, numLists = 16, nProbe = 6)
      .queryExecution.executedPlan.toString
    // WindowGroupLimit nodes are the top-k rank pushdown of that same
    // window — count only Window execs
    val windows = plan.linesIterator.count(_.contains("Window ["))
    assert(windows == 1, s"expected exactly the final top-k Window, got $windows")
  }

  test("approx_count_distinct lands within its error bound of exact") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val exact = ev.select("user_id").distinct().count().toDouble
    val approx = ev.agg(org.apache.spark.sql.functions
      .approx_count_distinct(col("user_id"), 0.02)).head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.1, s"approx=$approx exact=$exact")
  }

  test("format graft write accepts Delta's mergeSchema option") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ms").toString
    Seq((1, 1L, "a")).toDF("k", "pc", "v").write.format("graft")
      .option("key", "k").option("precombine", "pc").mode("overwrite").save(path)
    Seq((2, 1L, "b", 5.0)).toDF("k", "pc", "v", "score").write.format("graft")
      .option("mergeSchema", "true").mode("append").save(path)
    val df = spark.read.format("graft").load(path)
    assert(df.columns.contains("score"))
    assert(df.count() == 2)
  }

  test("language ID picks the language whose markers dominate") {
    val samples = Seq(
      ("the cat and the dog of the house is in that garden", "en"),
      ("el perro de la casa que los gatos una vez por la noche como siempre", "es"),
      ("der hund und die katze das ist nicht ein problem mit auf", "de"),
      ("le chien dans la maison est une chose pour les gens que nous aimons", "fr"))
    import spark.implicits._
    val got = samples.toDF("text", "expected")
      .withColumn("got", TextAnalysis.langId(col("text")))
      .collect().map(r => (r.getString(1), r.getString(2)))
    got.foreach { case (exp, act) => assert(exp == act, s"expected $exp got $act") }
  }

  test("decode stub plumbing: deterministic features, batch shape preserved") {
    val media = Multimodal.mediaFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(media, parallelism = 4).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, parallelism = 2).orderBy("media_id").collect()
    assert(f1.sameElements(f2), "features must not depend on partitioning")
    assert(f1.length == docs.count())
    val r = f1.head
    assert(r.getAs[scala.collection.Seq[String]]("frames").length == 4)
    assert(r.getAs[Int]("width") * r.getAs[Int]("height") <= r.getAs[Long]("n_bytes"))
  }

  test("native shingles match the builtin HOF formulation exactly") {
    import org.apache.spark.sql.functions.{col => c}
    Seq(1, 3, 4).foreach { k =>
      val cmp = docs.select(
        Dedup.shingles(c("text"), k).as("native"),
        Dedup.shinglesHof(c("text"), k).as("hof"))
      assert(cmp.filter(c("native") =!= c("hof")).count() == 0, s"k=$k")
    }
    // shorter-than-k docs clip to one shingle of all tokens, both paths
    import spark.implicits._
    val short = Seq("a b").toDF("text")
      .select(Dedup.shingles(c("text"), 4).as("n"), Dedup.shinglesHof(c("text"), 4).as("h"))
      .head()
    assert(short.getSeq[String](0) == Seq("a b") && short.getSeq[String](1) == Seq("a b"))
  }

  test("native stopword count matches the builtin HOF formulation") {
    import org.apache.spark.sql.functions.{col => c}
    val cmp = docs.select(
      TextAnalysis.stopwordCount(c("text")).as("native"),
      TextAnalysis.stopwordCountHof(c("text")).as("hof"))
    assert(cmp.filter(c("native") =!= c("hof")).count() == 0)
  }

  test("exact dedup keeps lowest id and drops all planted exact copies") {
    val exactPlanted = docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0).withColumn("doc_id", col("doc_id") + 100000L))
    val kept = Dedup.exact(exactPlanted)
    assert(kept.count() == docs.count())
    assert(kept.filter(col("doc_id") >= 100000L).count() == 0)
  }

  test("sequence packing is a consistent concat-and-chunk assignment") {
    import graft.ext.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val seqLen = 512L
    val packed = Sampling.packSequences(docs, seqLen)
      .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast("long"))
      .select("doc_id", "seq_id", "seq_offset", "n_tok")
    val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall { case (_, _, off, _) => off >= 0 && off < seqLen })
    // reconstruct: (seq_id, seq_offset) must equal the global running sum
    // in md5 order — i.e. consecutive docs are exactly n_tok apart
    val inOrder = rows.sortBy { case (id, s, off, _) => (s, off, id) }
    val starts = inOrder.map { case (_, s, off, _) => s * seqLen + off }
    val expect = inOrder.map(_._4).scanLeft(0L)(_ + _).dropRight(1)
    assert(starts.sameElements(expect), "packing must tile the token stream with no gaps")
    // stable under physical layout changes
    val repacked = Sampling.packSequences(docs.repartition(17), seqLen)
      .select("doc_id", "seq_id", "seq_offset").collect().map(_.toSeq).toSet
    assert(repacked == rows.map(r => Seq[Any](r._1, r._2, r._3)).toSet)
  }

  test("repetition stats flag degenerate docs and pass clean ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "one two one two one two one two one two one two one two"),
      (4L, "x")).toDF("doc_id", "text")
    val st = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(st(1L).getAs[Boolean]("gopher_keep"), "normal prose must pass")
    assert(!st(2L).getAs[Boolean]("gopher_keep"), "single-word spam must fail")
    assert(st(2L).getAs[Double]("top_word_frac") == 1.0)
    assert(!st(3L).getAs[Boolean]("gopher_keep"), "2-gram loop must fail")
    assert(st(3L).getAs[Double]("dup_2gram_frac") > 0.8)
    val single = st(4L)
    assert(single.getAs[Long]("n_2grams") == 1L, "degenerate single-word 2-gram")
    assert(!single.getAs[Boolean]("gopher_keep"))
  }

  test("C4 rules keep punctuated prose lines and flag poisoned pages") {
    import spark.implicits._
    val in = Seq(
      (1L, "A proper sentence with enough words here.\nshort one.\nno terminal punctuation line with many words\nAnother full sentence closes the page!\nFinal sentence number three lands right here."),
      (2L, "This page mentions javascript inside its only long sentence line.\nBackup sentence line with plenty of words here.\nSecond proper sentence right here today.\nThird proper sentence right here now."),
      (3L, "Valid long sentence on a page with lorem ipsum inside it.\nMore valid sentence content right here. And a third one too."),
      (4L, "function() { return 1; } some code page here.")).toDF("doc_id", "text")
    val out = TextAnalysis.c4Rules(in).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_kept_lines") == 3L, "short + unpunctuated lines drop")
    assert(out(1L).getAs[Boolean]("c4_keep"))
    assert(!out(1L).getAs[String]("clean_text").contains("short one"))
    assert(out(2L).getAs[Long]("n_kept_lines") == 3L, "javascript line drops")
    assert(out(2L).getAs[Boolean]("c4_keep"))
    assert(out(3L).getAs[Boolean]("has_lorem") && !out(3L).getAs[Boolean]("c4_keep"))
    assert(out(4L).getAs[Boolean]("has_brace") && !out(4L).getAs[Boolean]("c4_keep"))
  }

  test("span dedup blanks later occurrences of a shared passage, keeps the first") {
    import spark.implicits._
    val boiler = (1 to 6).map(i => s"boiler$i").mkString(" ") // 6-word span
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val in = Seq(
      (1L, s"${uniq("a", 4)} $boiler ${uniq("b", 4)}"), // first occurrence - kept whole
      (2L, s"${uniq("c", 4)} $boiler ${uniq("d", 4)}"), // later - boiler removed
      (3L, uniq("e", 10)), // no dup - untouched
      (4L, "tiny doc")) // shorter than the span - untouched
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(in, spanWords = 6).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("text_dedup") == in.collect()(0).getString(1),
      "owner doc keeps its text verbatim")
    val cleaned2 = out(2L).getAs[String]("text_dedup")
    assert(!cleaned2.contains("boiler1"), "duplicated span must be blanked")
    assert(cleaned2.contains("c1") && cleaned2.contains("d4"),
      "unique words around the span survive")
    assert(out(2L).getAs[Long]("n_kept") < out(2L).getAs[Long]("n_words"))
    assert(out(3L).getAs[Long]("n_kept") == 10L)
    assert(out(4L).getAs[String]("text_dedup") == "tiny doc",
      "docs shorter than the span pass through")
  }

  test("chunking covers every token, respects overlap, and is reproducible") {
    import spark.implicits._
    val words = (1 to 150).map(i => s"w$i").mkString(" ")
    val in = Seq((1L, words), (2L, "a b c"), (3L, (1 to 64).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunk(in, chunkTokens = 64, overlap = 16)
    val byDoc = out.collect().groupBy(_.getAs[Long]("doc_id"))
    // 150 tokens, stride 48: starts 0,48,96 → 96+64=160 >= 150 → 3 chunks
    assert(byDoc(1L).length == 3)
    assert(byDoc(1L).map(_.getAs[Long]("chunk_start")).sorted.sameElements(Array(0L, 48L, 96L)))
    assert(byDoc(1L).map(_.getAs[Long]("chunk_len")).sorted.sameElements(Array(54L, 64L, 64L)))
    // consecutive chunks share exactly `overlap` tokens
    val c0 = byDoc(1L).find(_.getAs[Long]("chunk_id") == 0L).get.getAs[String]("chunk_text")
    val c1 = byDoc(1L).find(_.getAs[Long]("chunk_id") == 1L).get.getAs[String]("chunk_text")
    assert(c0.split(" ").takeRight(16).sameElements(c1.split(" ").take(16)))
    // short docs and exactly-chunk-sized docs are one chunk, text verbatim
    assert(byDoc(2L).length == 1 && byDoc(2L).head.getAs[String]("chunk_text") == "a b c")
    assert(byDoc(3L).length == 1 && byDoc(3L).head.getAs[Long]("chunk_len") == 64L)
    // reconstruction: concatenating each chunk's non-overlap prefix + the
    // last chunk's tail covers the doc exactly
    val ordered = byDoc(1L).sortBy(_.getAs[Long]("chunk_id"))
    val rebuilt = ordered.init.map(_.getAs[String]("chunk_text").split(" ").take(48))
      .flatten ++ ordered.last.getAs[String]("chunk_text").split(" ")
    assert(rebuilt.mkString(" ") == words, "chunks must cover the doc losslessly")
  }

  test("hashed embeddings: dense gather matches sparse rows; cosine ANN runs on them") {
    val sparse = TextAnalysis.hashedEmbedding(docs, dim = 64)
    val dense = TextAnalysis.hashedEmbeddingDense(docs, dim = 64)
    val sm = sparse.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket")) -> r.getAs[Long]("weight"))
      .toMap
    val dm = dense.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Long]]("embedding")).toMap
    assert(dm.nonEmpty && dm.values.forall(_.length == 64))
    for (((id, b), w) <- sm) assert(dm(id)(b.toInt) == w, s"doc $id bucket $b")
    assert(dm.forall { case (id, v) =>
      v.zipWithIndex.forall { case (x, i) => x == 0L || sm.contains((id, i.toLong)) }
    }, "dense non-zeros must all come from sparse rows")
    // identical text → identical embedding; the vectors are ANN-ready
    val one = docs.orderBy("doc_id").limit(1)
    val dup = one.withColumn("doc_id", lit(999999L))
    val dd = TextAnalysis.hashedEmbeddingDense(one.unionByName(dup), dim = 64)
      .collect().map(_.getAs[scala.collection.Seq[Long]]("embedding"))
    assert(dd(0) == dd(1), "same text must hash to the same embedding")
  }

  test("heavy hitters: estimates dominate exact counts and collide upward only") {
    val out = TextAnalysis.heavyHitters(docs, k = 15, depth = 4, width = 64).collect()
    assert(out.length == 15)
    assert(out.forall(_.getAs[Boolean]("bound_ok")), "CMS must never undercount")
    assert(out.forall(r => r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_c")))
    // tiny width forces collisions: at least one estimate strictly above
    // exact proves the sketch is really a sketch, not a passthrough
    assert(out.exists(r => r.getAs[Long]("cms_est") > r.getAs[Long]("exact_c")),
      "width 64 over a real vocabulary must collide somewhere")
    // a wide sketch on the same corpus is exact for the top hitters
    val wide = TextAnalysis.heavyHitters(docs, k = 5, depth = 4, width = 1 << 20).collect()
    assert(wide.forall(r => r.getAs[Long]("cms_est") == r.getAs[Long]("exact_c")),
      "2^20 buckets at sf0.001 vocabulary should be collision-free for top-5")
  }

  test("DSIR importance scoring surfaces planted in-domain docs from the pool") {
    import graft.ext.Sampling
    // the synthetic corpus shares ONE 31-word vocabulary across all
    // sources (no natural domain signal), so the test plants one: target
    // docs carry distinctive domain-marker tokens, and 5 pool docs get the
    // same markers — those are the in-domain needles resampling must find
    val markers = lit(" graftmed graftbio graftsci graftlab")
    val target = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("text", concat(col("text"), markers))
      .withColumn("_tgt", lit(true))
    val needles = docs.filter(col("doc_id") % 10 === 7 && col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 500000L)
      .withColumn("text", concat(col("text"), markers))
    val pool = docs.filter(col("doc_id") % 10 =!= 0).unionByName(needles)
      .withColumn("_tgt", lit(false))
    val corpus = pool.unionByName(target)
    val nNeedles = needles.count()
    assert(nNeedles == 5, s"expected 5 planted needles, got $nNeedles")
    val scored = Sampling.importanceScores(corpus, isTarget = col("_tgt"))
    val needleMin = scored.filter(col("doc_id") >= 500000L)
      .agg(min("per_tok_score")).head.getLong(0)
    val poolMax = scored.filter(col("doc_id") < 500000L)
      .agg(max("per_tok_score")).head.getLong(0)
    assert(needleMin > poolMax,
      s"every marked doc must outscore every unmarked one ($needleMin vs $poolMax)")
    // resample determinism + needle recall in the top-k
    val top = Sampling.importanceResample(corpus, isTarget = col("_tgt"), k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val top2 = Sampling.importanceResample(corpus, isTarget = col("_tgt"), k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top == top2, "resampling must be deterministic")
    assert(top.toSet == Set(500007L, 500017L, 500027L, 500037L, 500047L),
      s"the top 5 must be exactly the planted needles, got $top")
  }

  test("perDomainCap bounds a 90%-one-domain crawl without a domain-wide window") {
    import spark.implicits._
    import graft.ext.Sampling
    // 900 docs in the giant domain, 60 in a small one, 3 in a tiny one
    val df = ((1L to 900L).map(i => (i, "giant")) ++
      (1001L to 1060L).map(i => (i, "small")) ++
      (2001L to 2003L).map(i => (i, "tiny"))).toDF("doc_id", "source")
    val capped = Sampling.perDomainCap(df, cap = 50L)
    val counts = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("giant") == 50L && counts("small") == 50L && counts("tiny") == 3L)
    // deterministic representatives: rerun picks the same ids
    val a = capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.perDomainCap(df, cap = 50L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // and they are exactly the md5-order prefix per domain
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val expect = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 50)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == expect)
  }

  test("seedClassifier separates seed-like text and is deterministic") {
    import spark.implicits._
    val good = (1L to 30L).map(i => (i, "the curious library catalogue preserves careful prose", "pos"))
    val bad = (31L to 60L).map(i => (i, "zzz spam casino jackpot winner click buy now", "neg"))
    val test = Seq(
      (101L, "library catalogue prose is careful and curious", "?"),
      (102L, "casino spam click jackpot now", "?"))
    val df = (good ++ bad ++ test).toDF("doc_id", "text", "lab")
    val scored = TextAnalysis.seedClassifier(df,
      isPos = col("lab") === "pos", isNeg = col("lab") === "neg")
    val s = scored.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(101L) > s(102L), s"seed-like text must outscore spam: ${s(101L)} vs ${s(102L)}")
    assert(s(101L) > 500000L && s(102L) < 500000L,
      "scores must sit on the right side of the 0.5 prior")
    val s2 = TextAnalysis.seedClassifier(df,
      isPos = col("lab") === "pos", isNeg = col("lab") === "neg")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s == s2, "scoring must be deterministic")
  }
}
