package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import graft.lake.{LakeTable, TableSpec}

/** Training-data-pipeline extension coverage: text analysis, dedup (exact /
  * MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine), similarity
  * search, multimodal plumbing, streaming ingest. Oracle SQL provided
  * wherever DuckDB can express the computation exactly; algorithmic ops
  * (minhash/simhash/LSH) are rows-only here and verified by planted-
  * duplicate recall in ScalaTest.
  *
  * Pairwise dedup queries run on a fixed 2000-doc subset: the synthetic
  * corpus vocabulary is tiny, so shingle posting lists grow quadratically
  * with corpus size — bounding the subset keeps the inverted-index join
  * cost constant across scale factors while still exercising the full
  * pipeline shape.
  */
object ExtQueries {
  import Tables._

  /** Fixed artifact path for the q143 oracle: Verify and the driver's
    * DuckDB check run on the same host, so the query dumps the learned
    * merges here as plain parquet and the oracle SQL replays encode from
    * it (a lake-table dir would glob overwritten MVCC files too). */
  private val BpeOracleMergesPath =
    s"${System.getProperty("java.io.tmpdir")}/graft_bpe_oracle_merges"

  /** q91's training-certificate twin of [[BpeOracleMergesPath]] (separate
    * path so neither query depends on the other having run). */
  private val BpeOracleTrainPath =
    s"${System.getProperty("java.io.tmpdir")}/graft_bpe_oracle_train"

  /** q147's persisted-vocab twin of [[BpeOracleMergesPath]]. */
  private val UnigramOracleVocabPath =
    s"${System.getProperty("java.io.tmpdir")}/graft_ug_oracle_vocab"

  private def plantedDocs(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").filter(col("doc_id") < 2000)
    docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
        .withColumn("text", concat(col("text"), lit(" graftdup"))))
  }

  private val plantedDocsSql =
    """SELECT doc_id, text FROM documents WHERE doc_id < 2000
      |UNION ALL
      |SELECT doc_id + 100000, text || ' graftdup' FROM documents
      |WHERE doc_id < 2000 AND doc_id % 10 = 0""".stripMargin

  /** q37 oracle: the LSH hyperplanes are a deterministic function of
    * (numPlanes=8, dim=64, seed=42+t) — the exact same literals Spark bakes
    * into its codegen'd signature expressions, interpolated here as DOUBLE[]
    * rows so DuckDB recomputes identical bucket signatures (Double.toString
    * is shortest-round-trip; DuckDB's parse is correctly rounded, so the
    * doubles survive the text round-trip bit-for-bit, like q36's). */
  private def lshOracleSql: String = {
    import graft.functions.VectorOps.randomPlanes
    val planeRows = for {
      t <- 0 until 12
      (p, i) <- randomPlanes(numPlanes = 8, dim = 64, seed = 42L + t).zipWithIndex
    } yield s"($t, $i, [${p.map(d => java.lang.Double.toString(d)).mkString(",")}]::DOUBLE[])"
    raw"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
      |planes(t, p, pv) AS (VALUES ${planeRows.mkString(",\n")}),
      |sig AS (SELECT n.vec_id, p.t,
      |    CAST(SUM(CASE WHEN (SELECT SUM(z.x*z.y) FROM (SELECT UNNEST(n.e) AS x, UNNEST(p.pv) AS y) z) >= 0
      |             THEN (1::BIGINT << p.p) ELSE 0::BIGINT END) AS BIGINT) AS bucket
      |  FROM n CROSS JOIN planes p GROUP BY n.vec_id, p.t),
      |q AS (SELECT vec_id AS query_id, t, xor(bucket, f.flip) AS bucket
      |  FROM sig CROSS JOIN (SELECT UNNEST([0,1,2,4,8,16,32,64,128]) AS flip) f
      |  WHERE vec_id < 10),
      |cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
      |  FROM sig c JOIN q ON c.t = q.t AND c.bucket = q.bucket
      |  WHERE c.vec_id <> q.query_id),
      |scored AS (SELECT cand.query_id, cand.neighbor_id,
      |    (SELECT SUM(z.x*z.y) FROM (SELECT UNNEST(qq.e) AS x, UNNEST(cc.e) AS y) z)
      |      / (sqrt(qq.nsq) * sqrt(cc.nsq)) AS score
      |  FROM cand JOIN n qq ON qq.vec_id = cand.query_id
      |  JOIN n cc ON cc.vec_id = cand.neighbor_id),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM scored)
      |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin
  }

  val defs: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // Text stats: token counting, stopwords, punct, quality, fingerprint.
    "q30_text_stats" -> ((
      (s: SparkSession, d: String) =>
        TextAnalysis.stats(t(s, d, "documents"))
          .select("doc_id", "ws_tokens", "bpe_tokens", "n_stopwords", "n_punct",
            "quality", "fingerprint")
          .orderBy("doc_id"),
      raw"""SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS bpe_tokens,
        |  len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','for','on','with','as','at','by','be'], t))) AS n_stopwords,
        |  length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]-]', '', 'g')) AS n_punct,
        |  least(1.0, len(regexp_split_to_array(trim(text), '\s+')) / 50.0)
        |    * (0.5 + 0.5 * least(1.0, (len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','for','on','with','as','at','by','be'], t))
        |      ) / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0)) * 5.0))
        |    * (1.0 - least(1.0, ((length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]-]', '', 'g')))
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 2.0)) AS quality,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Exact dedup over a corpus with planted exact copies.
    "q31_dedup_exact" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val planted = docs.unionByName(
          docs.filter(col("doc_id") % 10 === 0).withColumn("doc_id", col("doc_id") + 100000L))
        Dedup.copyCounts(planted).orderBy("fingerprint")
      },
      raw"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |  COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
        |FROM corpus GROUP BY 1 ORDER BY fingerprint""".stripMargin)),

    // Exact n-gram Jaccard near-dup pairs via inverted-index join.
    "q32_ngram_jaccard" -> ((
      (s: SparkSession, d: String) =>
        Dedup.ngramJaccardPairs(plantedDocs(s, d), threshold = 0.6, k = 4)
          .orderBy("id_a", "id_b"),
      raw"""WITH corpus AS ($plantedDocsSql),
        |docs AS (SELECT doc_id AS id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-3, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3]))) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM corpus)),
        |inv AS (SELECT id, len(sh) AS n, UNNEST(sh) AS s FROM docs),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(common AS DOUBLE)/(na+nb-common) AS jaccard
        |FROM pairs WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin)),

    // PPJoin prefix filtering: same exact-Jaccard semantics as q32, but
    // candidates come only from frequency-ordered PREFIX shingles under
    // the length filter — the plan that survives a corpus whose head
    // shingles have quadratic posting lists. Exactness means the oracle
    // is the SAME full-index replay as q32's.
    "q125_jaccard_prefix" -> ((
      (s: SparkSession, d: String) =>
        Dedup.ngramJaccardPairs(plantedDocs(s, d), threshold = 0.6, k = 4,
          prefixFilter = true)
          .orderBy("id_a", "id_b"),
      raw"""WITH corpus AS ($plantedDocsSql),
        |docs AS (SELECT doc_id AS id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-3, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3]))) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM corpus)),
        |inv AS (SELECT id, len(sh) AS n, UNNEST(sh) AS s FROM docs),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(common AS DOUBLE)/(na+nb-common) AS jaccard
        |FROM pairs WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin)),

    // Exact edit-distance-1 fuzzy join (FastSS deletion neighborhoods):
    // every third customer name gets one md5-chosen character deleted;
    // the join must recover each corrupted name's original (plus any
    // genuine distance-1 neighbors — TPC-H names differ by one digit) via
    // a hash join on deletion variants, never a quadratic scan. The
    // oracle replays corruption, neighborhoods, and levenshtein verify.
    "q133_fuzzy_join" -> ((
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
        val corrupted = cust.filter(col("c_custkey") % 3 === 0)
          .withColumn("pos",
            (conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
              .cast("int") % length(col("c_name"))) + 1)
          .select((col("c_custkey") + 1000000L).as("id_a"),
            concat(col("c_name").substr(lit(1), col("pos") - 1),
              col("c_name").substr(col("pos") + 1, length(col("c_name")) - col("pos")))
              .as("name"))
        val originals = cust.select(col("c_custkey").as("id_b"), col("c_name").as("name"))
        Dedup.editDistanceJoin(corrupted, originals, "name")
          .orderBy("id_a", "id_b")
      },
      """WITH cust AS (SELECT c_custkey, c_name FROM customer),
        |corr AS (SELECT c_custkey + 1000000 AS id_a,
        |    substr(c_name, 1, p-1) || substr(c_name, p+1, len(c_name)-p) AS name
        |  FROM (SELECT c_custkey, c_name,
        |      (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4))::INT
        |        % len(c_name)) + 1 AS p
        |    FROM cust WHERE c_custkey % 3 = 0)),
        |lv AS (SELECT id_a, name AS ta, UNNEST(list_concat([name],
        |    list_transform(range(1, len(name)+1),
        |      i -> substr(name, 1, i-1) || substr(name, i+1, len(name)-i)))) AS v
        |  FROM corr),
        |rv AS (SELECT c_custkey AS id_b, c_name AS tb, UNNEST(list_concat([c_name],
        |    list_transform(range(1, len(c_name)+1),
        |      i -> substr(c_name, 1, i-1) || substr(c_name, i+1, len(c_name)-i)))) AS v
        |  FROM cust),
        |cand AS (SELECT DISTINCT id_a, id_b, ta, tb FROM lv JOIN rv USING (v))
        |SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS INT) AS dist FROM cand
        |WHERE levenshtein(ta, tb) <= 1
        |ORDER BY id_a, id_b""".stripMargin)),

    // Length-grouped batching: shard by md5, order each shard by token
    // count, cut runs of 32 — docs inside a batch have near-equal
    // lengths (bucketed padding). Per-SHARD windows only, never a global
    // sort; the oracle replays shard/order/cut exactly.
    "q134_length_batches" -> ((
      (s: SparkSession, d: String) =>
        Sampling.lengthGroupedBatches(t(s, d, "documents"), shards = 16, batchSize = 32)
          .orderBy("doc_id"),
      raw"""WITH tagged AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |sharded AS (SELECT doc_id, n_tok, h,
        |    CAST(('0x' || substr(h, 1, 4))::BIGINT % 16 AS INT) AS shard
        |  FROM tagged)
        |SELECT doc_id, n_tok, shard,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY shard
        |        ORDER BY n_tok ASC, h ASC, doc_id ASC) - 1) // 32 AS INT) AS batch_id
        |FROM sharded
        |ORDER BY doc_id""".stripMargin)),

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // 200 docs drawn ∝ token count, exactly replayable — u is a portable
    // 48-bit md5 uniform (bit-identical on both engines: the 2^48 divide
    // is exact), the key is −ln(u)/w, TakeOrdered keeps k. The only
    // engine divergence channel is a last-ulp ln() at the k-boundary
    // pair — order statistics gaps are ~10 orders of magnitude wider.
    "q126_weighted_sample" -> ((
      (s: SparkSession, d: String) => {
        val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
        Sampling.weightedSample(
          t(s, d, "documents").withColumn("n_tok", nTok), 200, col("n_tok"))
          .select("doc_id", "n_tok").orderBy("doc_id")
      },
      raw"""WITH w AS (SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
        |keyed AS (SELECT doc_id, w,
        |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 12))::BIGINT
        |         + 1.0) / 281474976710656.0) / w AS es_key
        |  FROM w WHERE w > 0),
        |top AS (SELECT doc_id, w FROM keyed ORDER BY es_key, doc_id LIMIT 200)
        |SELECT doc_id, CAST(w AS BIGINT) AS n_tok FROM top
        |ORDER BY doc_id""".stripMargin)),

    // Token-budget sampling: a deterministic ~10k-token prefix of the
    // md5-ordered corpus (the dataset-mixing primitive). The engine runs
    // the 256-bucket two-phase plan (no global window); the oracle is the
    // equivalent global running-sum rule — equivalence is exact because
    // bucket order is a prefix of the hash order and every doc has >= 1
    // token.
    "q79_token_budget" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        Sampling.tokenBudget(t(s, d, "documents"), budget = 10000L)
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
          .orderBy("doc_id")
      },
      raw"""WITH d AS (SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (ORDER BY h ASC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        |  FROM d)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok FROM r WHERE run < 10000
        |ORDER BY doc_id""".stripMargin)),

    // Domain-mixture sampling (DoReMi-style): each named source contributes
    // its own deterministic md5-order token-budget prefix, weighted
    // 50/25/25 over a 2000-token total. Engine runs the skew-free
    // (domain × 256-bucket) two-phase plan; the oracle is the equivalent
    // per-domain global running-sum rule. All-integer output: hash-exact.
    // Per-domain cap (C4/RefinedWeb "≤ N docs per host" rule): at most 20
    // docs per source, deterministic md5-order representatives, via the
    // two-phase (domain × 256-bucket) plan — no domain-wide window exists,
    // so a 90%-one-domain crawl can't bottleneck. Oracle = the per-domain
    // global rank rule the plan implements.
    "q116_domain_cap" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        val out = Sampling.perDomainCap(t(s, d, "documents"), cap = 20L)
          .select(col("doc_id"), col("source"))
        val over = out.groupBy("source").count().filter(col("count") > 20)
        require(over.isEmpty, "cap must bound every domain")
        out.orderBy("doc_id")
      },
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY doc_id""".stripMargin)),

    "q95_domain_mixture" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        Sampling.mixture(t(s, d, "documents"),
          weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25),
          totalTokens = 2000L)
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
          .orderBy("doc_id")
      },
      raw"""WITH d AS (SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
        |r AS (SELECT doc_id, source, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        |  FROM d)
        |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok FROM r
        |WHERE run < CASE source WHEN 'src0' THEN 1000 ELSE 500 END
        |ORDER BY doc_id""".stripMargin)),

    // Temperature-scaled mixture (mT5/XLM-R α-sampling): budgets ∝
    // sqrt(domain token total), normalized — low-resource domains
    // upsampled vs their share. Portable by construction: IEEE requires
    // sqrt exactly rounded, the weights quantize to fixed point, the
    // budget division is HUGEINT-exact, and the per-domain cut is the
    // q95 md5-order prefix rule — DuckDB replays every budget and every
    // kept doc bit-for-bit.
    "q136_temperature_mixture" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        Sampling.temperatureMixture(t(s, d, "documents"), totalTokens = 3000L)
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
          .orderBy("doc_id")
      },
      raw"""WITH d AS (SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |tot AS (SELECT source, SUM(n_tok) AS t FROM d GROUP BY source),
        |qw AS (SELECT source,
        |    CAST(FLOOR(SQRT(CAST(t AS DOUBLE)) * 1e6) AS BIGINT) AS w
        |  FROM tot),
        |bud AS (SELECT source,
        |    CAST(CAST(3000 AS HUGEINT) * w
        |      // (SELECT SUM(CAST(w AS HUGEINT)) FROM qw) AS BIGINT) AS budget
        |  FROM qw),
        |r AS (SELECT d.doc_id, d.source, d.n_tok, bud.budget,
        |    COALESCE(SUM(d.n_tok) OVER (PARTITION BY d.source
        |      ORDER BY d.h ASC, d.doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        |  FROM d JOIN bud ON d.source = bud.source)
        |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok FROM r
        |WHERE run < budget
        |ORDER BY doc_id""".stripMargin)),

    // BM25 ranked retrieval in EXACT fixed-point integers: k1=6/5, b=3/4
    // multiplied out over avgdl = tot/N, idf as the raw rarity ratio
    // (2N−2df+1)/(2df+1) — the documented log→ratio trade (see DSIR) — so
    // every per-term score is one HUGEINT integral divide and per-doc
    // scores are exact integer sums: DuckDB replays the full ranking
    // bit-for-bit, no FP anywhere.
    "q137_bm25" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.TextAnalysis
        TextAnalysis.bm25(t(s, d, "documents"),
          terms = Seq("join", "window", "dup"), topK = 20)
          .orderBy(col("bm25_score").desc, col("doc_id").asc)
      },
      raw"""WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS ts
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM toks),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dl) AS tot FROM dl),
        |ex AS (SELECT doc_id, UNNEST(ts) AS term FROM toks),
        |tf AS (SELECT ex.doc_id, ex.term, dl.dl, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM ex JOIN dl ON ex.doc_id = dl.doc_id
        |  WHERE ex.term IN ('join', 'window', 'dup')
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id,
        |    CAST(CAST((2*n.n - 2*df.df + 1) AS HUGEINT) * tf.tf * 22
        |      * n.tot * 1000000
        |      // (CAST((2*df.df + 1) AS HUGEINT) *
        |         (CAST(10 AS HUGEINT) * n.tot * tf.tf
        |          + CAST(3 AS HUGEINT) * n.tot
        |          + CAST(9 AS HUGEINT) * tf.dl * n.n)) AS BIGINT) AS sc
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(SUM(sc) AS BIGINT) AS bm25_score,
        |       COUNT(*) AS n_terms_hit
        |FROM s GROUP BY doc_id
        |ORDER BY bm25_score DESC, doc_id ASC LIMIT 20""".stripMargin)),

    // UniMax sampling (Chung et al. 2023): uniform per-domain budgets with
    // an epoch cap — the leftover from capped (small) domains
    // redistributes uniformly. Domains are a deterministic 70/20/10 split
    // of the corpus so the budget (= half the corpus, computed not
    // hard-coded) caps 'small' and (boundary-exactly) 'mid' at any scale
    // factor; the waterfill is pure integer arithmetic, so DuckDB replays
    // the BUDGETS as well as the md5-order cut.
    "q142_unimax" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        val docs = t(s, d, "documents").withColumn("dom",
          when(col("doc_id") % 10 < 7, "big")
            .when(col("doc_id") % 10 < 9, "mid").otherwise("small"))
        val total = docs
          .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
          .head().getLong(0)
        Sampling.unimax(docs, totalTokens = total / 2, maxEpochs = 1,
          domainCol = "dom")
          .select(col("doc_id"), col("dom"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
          .orderBy("doc_id")
      },
      raw"""WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 7 THEN 'big'
        |         WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'small' END AS dom,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |bt AS (SELECT CAST(SUM(n_tok) // 2 AS BIGINT) AS B FROM d),
        |tot AS (SELECT dom, CAST(SUM(n_tok) AS BIGINT) AS t FROM d GROUP BY dom),
        |c AS (SELECT dom, t AS cap,
        |    ROW_NUMBER() OVER (ORDER BY t ASC, dom ASC) AS rn,
        |    COUNT(*) OVER () AS n,
        |    COALESCE(SUM(t) OVER (ORDER BY t ASC, dom ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
        |  FROM tot),
        |k AS (SELECT c.*, bt.B,
        |    CASE WHEN CAST(cap AS HUGEINT) * (n - rn + 1) <= CAST(B AS HUGEINT) - pfx
        |         THEN 1 ELSE 0 END AS capped
        |  FROM c CROSS JOIN bt),
        |g AS (SELECT CAST(SUM(capped) AS BIGINT) AS j,
        |    CAST(COALESCE(SUM(CASE WHEN capped = 1 THEN cap END), 0) AS BIGINT) AS pc,
        |    CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(B) AS BIGINT) AS B FROM k),
        |bud AS (SELECT k.dom,
        |    CASE WHEN k.capped = 1 THEN k.cap
        |         ELSE (g.B - g.pc) // (g.n - g.j) +
        |              CASE WHEN (k.rn - g.j) >
        |                   (g.n - g.j) - ((g.B - g.pc) % (g.n - g.j))
        |                   THEN 1 ELSE 0 END
        |    END AS budget
        |  FROM k CROSS JOIN g),
        |r AS (SELECT d.doc_id, d.dom, d.n_tok, bud.budget,
        |    COALESCE(SUM(d.n_tok) OVER (PARTITION BY d.dom
        |      ORDER BY d.h ASC, d.doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        |  FROM d JOIN bud ON d.dom = bud.dom)
        |SELECT doc_id, dom, CAST(n_tok AS BIGINT) AS n_tok FROM r
        |WHERE run < budget
        |ORDER BY doc_id""".stripMargin)),

    // DSIR-style importance resampling (Xie et al. 2023): pick the 50
    // general-pool docs whose hashed-unigram distribution looks most like
    // the target domain ('src18'). Likelihood ratios are EXACT fixed-point
    // integers (Laplace-smoothed, ×1e6, integer div) over portable md5
    // buckets, so DuckDB replays every score bit-for-bit — the log-sum of
    // the paper is traded for an integer ratio-sum (documented deviation).
    "q112_dsir_importance" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        Sampling.importanceResample(t(s, d, "documents"),
          isTarget = col("source") === "src18", k = 50)
          .select(col("doc_id"), col("n_toks"), col("dsir_score"),
            col("per_tok_score"))
      },
      raw"""WITH tok AS (
        |  SELECT doc_id, tgt, ('0x' || substr(md5(tk), 1, 15))::BIGINT % 1024 AS b
        |  FROM (SELECT doc_id, (source = 'src18') AS tgt,
        |          UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS tk
        |        FROM documents)
        |  WHERE len(tk) > 0),
        |cnt AS (SELECT b,
        |    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
        |    SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cs
        |  FROM tok GROUP BY b),
        |tot AS (SELECT SUM(ct) + 1024 AS totT, SUM(cs) + 1024 AS totS FROM cnt),
        |rat0 AS (SELECT b, cs,
        |    ((ct + 1) * totS * 1000000) // ((cs + 1) * totT) AS rr
        |  FROM cnt, tot),
        |base AS (SELECT SUM(cs * rr) // GREATEST(SUM(cs), 1) AS r0 FROM rat0),
        |ratio AS (SELECT b, rr - r0 AS r FROM rat0, base),
        |sc AS (SELECT tok.doc_id, COUNT(*) AS n_toks, SUM(r) AS score
        |  FROM tok JOIN ratio USING (b) WHERE NOT tgt GROUP BY tok.doc_id)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |       CAST(score AS BIGINT) AS dsir_score,
        |       CAST(score // n_toks AS BIGINT) AS per_tok_score
        |FROM sc ORDER BY per_tok_score DESC, doc_id LIMIT 50""".stripMargin)),

    // GPT-style sequence packing: concat-and-chunk assignment of every doc
    // to its fixed-length training sequence. The engine runs the 256-bucket
    // two-phase prefix sum (no global window); the oracle is the equivalent
    // global running-sum rule. All-integer output: hash-exact.
    "q81_sequence_pack" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        Sampling.packSequences(t(s, d, "documents"), seqLen = 2048L)
          .select(col("doc_id"), col("seq_id"), col("seq_offset"))
          .orderBy("doc_id")
      },
      raw"""WITH dd AS (SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (SELECT doc_id,
        |    COALESCE(SUM(n_tok) OVER (ORDER BY h ASC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        |  FROM dd)
        |SELECT doc_id, CAST(run // 2048 AS BIGINT) AS seq_id,
        |  CAST(run % 2048 AS BIGINT) AS seq_offset
        |FROM r ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition/quality filters: every ratio is an exact-int
    // quotient (bit-stable doubles); the top-word mode runs as explode +
    // two hash aggregates, everything else as per-row array expressions.
    "q82_repetition_filter" -> ((
      (s: SparkSession, d: String) =>
        TextAnalysis.repetitionStats(t(s, d, "documents"))
          .select("doc_id", "n_words", "n_distinct_words", "n_2grams",
            "n_distinct_2grams", "top_word_n", "dup_word_frac", "dup_2gram_frac",
            "top_word_frac", "alpha_word_frac", "mean_word_len", "gopher_keep")
          .orderBy("doc_id"),
      raw"""WITH dd AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
        |    length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_chars FROM documents),
        |g AS (SELECT doc_id, w, n_chars,
        |    list_transform(generate_series(1, greatest(len(w)-1, 1)),
        |      i -> concat_ws(' ', w[i], w[i+1])) AS g2 FROM dd),
        |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
        |    CAST(len(g2) AS BIGINT) AS n_2grams,
        |    CAST(len(list_distinct(g2)) AS BIGINT) AS n_distinct_2grams,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(n_chars AS BIGINT) AS n_chars FROM g),
        |tw AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_word_n FROM (
        |    SELECT doc_id, COUNT(*) AS c FROM (SELECT doc_id, UNNEST(w) AS word FROM dd)
        |    GROUP BY doc_id, word) GROUP BY doc_id),
        |j AS (SELECT m.*, tw.top_word_n FROM m JOIN tw USING (doc_id))
        |SELECT doc_id, n_words, n_distinct_words, n_2grams, n_distinct_2grams, top_word_n,
        |  1.0 - CAST(n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
        |  1.0 - CAST(n_distinct_2grams AS DOUBLE) / CAST(n_2grams AS DOUBLE) AS dup_2gram_frac,
        |  CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
        |  CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS alpha_word_frac,
        |  CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
        |  (n_words BETWEEN 10 AND 100000)
        |    AND (CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) BETWEEN 2.0 AND 12.0)
        |    AND (CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8)
        |    AND (1.0 - CAST(n_distinct_2grams AS DOUBLE) / CAST(n_2grams AS DOUBLE) <= 0.3)
        |    AND (CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.25) AS gopher_keep
        |FROM j ORDER BY doc_id""".stripMargin)),

    // C4/MassiveText span-level dedup: every later occurrence of a repeated
    // 15-word window is blanked and the cleaned text reconstructed — the
    // boilerplate-paragraph catcher whole-doc dedup misses. Spans travel as
    // md5 digests (engine-portable), first-occurrence is MIN over the
    // (doc, pos) scalar, so the oracle reproduces ownership exactly.
    "q86_span_dedup" -> ((
      (s: SparkSession, d: String) =>
        Dedup.spanDedup(t(s, d, "documents"), spanWords = 15).orderBy("doc_id"),
      raw"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |inst0 AS (SELECT doc_id, w,
        |    UNNEST(range(1, greatest(len(w) - 13, 1))) AS i FROM w),
        |inst AS (SELECT doc_id, i - 1 AS pos,
        |    md5(array_to_string(w[i:i+14], ' ')) AS span FROM inst0),
        |own AS (SELECT span, MIN(doc_id * 1048576 + pos) AS own FROM inst GROUP BY span),
        |dups AS (SELECT i.doc_id, i.pos FROM inst i JOIN own o USING (span)
        |  WHERE i.doc_id * 1048576 + i.pos <> o.own),
        |cov AS (SELECT DISTINCT doc_id, pos + UNNEST(range(0, 15)) AS p FROM dups),
        |words0 AS (SELECT doc_id, w, UNNEST(range(1, len(w) + 1)) AS i FROM w),
        |words AS (SELECT doc_id, i - 1 AS p, w[i] AS word FROM words0),
        |kept AS (SELECT wo.doc_id, wo.p, wo.word FROM words wo
        |  LEFT JOIN cov ON cov.doc_id = wo.doc_id AND cov.p = wo.p
        |  WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
        |    string_agg(word, ' ' ORDER BY p) AS text_dedup
        |  FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_words,
        |  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  COALESCE(a.text_dedup, '') AS text_dedup
        |FROM w LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // C4 page-cleaning rules (line keep-filter, sentence floor, lorem/brace
    // flags, cleaned-text reconstruction). The corpus is newline- and
    // punctuation-free, so deterministic page variants are planted in-query
    // (mod-3 docs gain valid sentence lines, mod-5 docs gain the poison
    // markers) — both engines construct identical inputs.
    "q89_c4_rules" -> ((
      (s: SparkSession, d: String) => {
        val planted = t(s, d, "documents").withColumn("text", concat(col("text"),
          when(col("doc_id") % 3 === 0, lit("\nThis is a valid sentence line one." +
            "\nShort line.\nAnother good sentence follows right here!" +
            "\nA third full sentence ends this page.")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("\nlorem ipsum dolor { javascript")).otherwise(lit(""))))
        TextAnalysis.c4Rules(planted)
          .select("doc_id", "n_lines", "n_kept_lines", "n_sentences",
            "has_lorem", "has_brace", "c4_keep", "clean_text")
          .orderBy("doc_id")
      },
      raw"""WITH d0 AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'This is a valid sentence line one.'
        |      || chr(10) || 'Short line.'
        |      || chr(10) || 'Another good sentence follows right here!'
        |      || chr(10) || 'A third full sentence ends this page.' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN chr(10) || 'lorem ipsum dolor { javascript' ELSE '' END AS text
        |  FROM documents),
        |l AS (SELECT doc_id, text, regexp_split_to_array(text, chr(10)) AS lines FROM d0),
        |k AS (SELECT doc_id, text, lines,
        |    list_filter(lines, x -> regexp_matches(trim(x), '[.!?"]$$')
        |      AND len(regexp_split_to_array(trim(x), '\s+')) >= 5
        |      AND NOT contains(lower(x), 'javascript')) AS kept FROM l)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  CAST(len(regexp_split_to_array(text, '[.!?]')) - 1 AS BIGINT) AS n_sentences,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(text, '{') AS has_brace,
        |  len(kept) >= 1 AND len(regexp_split_to_array(text, '[.!?]')) - 1 >= 3
        |    AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(text, '{') AS c4_keep,
        |  COALESCE(array_to_string(kept, chr(10)), '') AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin)),

    // Train/eval CONTAMINATION check: share of each eval doc's 3-shingles
    // found anywhere in the training corpus (containment, not Jaccard).
    // Planted eval docs are train docs with a one-token suffix — they must
    // score near 1.0; fresh docs only clear the 0.5 bar by real overlap.
    "q78_contamination" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val train = docs.filter(col("doc_id") < 2000)
        val eval0 = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") < 2000)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", concat(col("text"), lit(" graftdup")))
          .unionByName(docs.filter(col("doc_id") >= 2000 && col("doc_id") < 2500))
        Dedup.contamination(train, eval0, threshold = 0.5, k = 3)
          .orderBy("doc_id")
      },
      raw"""WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |ev AS (
        |  SELECT doc_id + 100000 AS id, text || ' graftdup' AS text
        |  FROM documents WHERE doc_id < 2000 AND doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 2000 AND doc_id < 2500),
        |tsh AS (SELECT DISTINCT UNNEST(list_distinct(list_transform(
        |      generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS s
        |  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM train)),
        |esh AS (SELECT id, UNNEST(list_distinct(list_transform(
        |      generate_series(1, greatest(len(tk)-2, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS s
        |  FROM (SELECT id, regexp_split_to_array(trim(text), '\s+') AS tk FROM ev)),
        |tot AS (SELECT id, COUNT(*) AS n_total FROM esh GROUP BY 1),
        |hit AS (SELECT id, COUNT(*) AS n_hit FROM esh WHERE s IN (SELECT s FROM tsh) GROUP BY 1)
        |SELECT tot.id AS doc_id,
        |       CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / tot.n_total AS contamination
        |FROM tot LEFT JOIN hit USING (id)
        |WHERE CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / tot.n_total >= 0.5
        |ORDER BY doc_id""".stripMargin)),

    // Avro batch scan (S1): nation written to Avro (driver-side, tiny dim
    // table), read back through graft's bundled-avro reader, oracled
    // against the parquet original — proves schema mapping + decode.
    "q64_avro_roundtrip" -> ((
      (s: SparkSession, d: String) => {
        import org.apache.avro.{Schema => ASchema}
        import org.apache.avro.file.DataFileWriter
        import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
        val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_avro_q",
          s"nation_${d.replaceAll("[^a-z0-9.]", "_")}")
        if (Files.exists(dir))
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.delete(f))
        Files.createDirectories(dir)
        val schema = new ASchema.Parser().parse(
          """{"type":"record","name":"nation","fields":[
            |{"name":"n_nationkey","type":"int"},{"name":"n_name","type":"string"},
            |{"name":"n_regionkey","type":"int"}]}""".stripMargin)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, dir.resolve("nation.avro").toFile)
        t(s, d, "nation").orderBy("n_nationkey").collect().foreach { r =>
          val rec = new GenericData.Record(schema)
          rec.put("n_nationkey", r.getInt(0)); rec.put("n_name", r.getString(1))
          rec.put("n_regionkey", r.getInt(2))
          w.append(rec)
        }
        w.close()
        // the verbatim reference call shape (README.md:264,440) — resolves
        // to graft.sources.AvroFileSource via DataSourceRegister
        s.read.format("avro").load(dir.toString + "/*.avro")
          .orderBy("n_nationkey")
      },
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // DSv2 catalog end-to-end (S13/D1-D7): CTAS + INSERT upsert + SELECT
    // through `graft.sources.GraftCatalog` identifiers, oracled in SQL.
    "q65_catalog_sql" -> ((
      (s: SparkSession, d: String) => {
        val tag = math.abs(d.hashCode).toString
        val wh = Paths.get(System.getProperty("java.io.tmpdir"), "graft_cat_q", tag)
        if (Files.exists(wh))
          Files.walk(wh).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => Files.delete(f))
        Files.createDirectories(wh)
        val cat = s"graft_q$tag" // catalog instances cache their options
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
        t(s, d, "region").createOrReplaceTempView("q65_region")
        s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.q65")
        s.sql(s"""CREATE TABLE $cat.q65.r USING graft
                  OPTIONS (key 'r_regionkey', precombine 'r_regionkey')
                  AS SELECT * FROM q65_region""")
        s.sql(s"""INSERT INTO $cat.q65.r
                  SELECT r_regionkey + 100 AS r_regionkey, r_name
                  FROM q65_region""")
        s.sql(s"SELECT r_regionkey, r_name FROM $cat.q65.r ORDER BY r_regionkey")
      },
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL
        |SELECT r_regionkey + 100, r_name FROM region
        |ORDER BY r_regionkey""".stripMargin)),

    // Deterministic key-stable train/val/test split (md5 hex-prefix
    // buckets, engine-portable — oracled row-by-row against DuckDB's md5).
    "q63_split" -> ((
      (s: SparkSession, d: String) =>
        graft.ext.Sampling.deterministicSplit(t(s, d, "documents"))
          .select("doc_id", "split").orderBy("doc_id"),
      """SELECT doc_id, CASE
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN 'c' AND 'd' THEN 'val'
        |  ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Duplicate clustering: connected components over the exact Jaccard
    // pair graph — each doc labeled with its cluster's minimum id (the
    // keep/drop decision). Oracled via DuckDB's recursive CTE (min
    // reachable id ≡ the propagation fixpoint).
    "q62_dup_clusters" -> ((
      (s: SparkSession, d: String) =>
        Dedup.components(Dedup.ngramJaccardPairs(plantedDocs(s, d), threshold = 0.6, k = 4))
          .orderBy("id"),
      raw"""WITH RECURSIVE corpus AS ($plantedDocsSql),
        |docs AS (SELECT doc_id AS id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-3, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3]))) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM corpus)),
        |inv AS (SELECT id, len(sh) AS n, UNNEST(sh) AS s FROM docs),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |pairs AS (SELECT id_a, id_b FROM cand
        |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.6),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
        |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    // Duplicate-cluster retention: keep the highest-quality member per
    // near-dup cluster (score = token count, ties to the smaller id),
    // singletons always survive. The planted copies are one token LONGER
    // than their sources ("graftdup"), so keep-best retains the planted
    // doc — the OPPOSITE of q62's min-id rule — which makes the score
    // genuinely decide. Oracle = q62's recursive-CTE components + the
    // same windowed argmax in DuckDB.
    "q152_keep_best" -> ((
      (s: SparkSession, d: String) => {
        val docs = plantedDocs(s, d)
        Dedup.keepBestPerCluster(docs,
            Dedup.ngramJaccardPairs(docs, threshold = 0.6, k = 4),
            score = size(split(trim(col("text")), "\\s+")).cast("long"))
          .select(col("doc_id"), col("cluster_id"), col("score"), col("kept"))
          .orderBy("doc_id")
      },
      raw"""WITH RECURSIVE corpus AS ($plantedDocsSql),
        |docs AS (SELECT doc_id AS id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-3, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3]))) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM corpus)),
        |inv AS (SELECT id, len(sh) AS n, UNNEST(sh) AS s FROM docs),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |pairs AS (SELECT id_a, id_b FROM cand
        |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.6),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
        |scored AS (SELECT c.doc_id, COALESCE(l.cluster_id, c.doc_id) AS cluster_id,
        |    CAST(len(regexp_split_to_array(trim(c.text), '\s+')) AS BIGINT) AS score
        |  FROM corpus c LEFT JOIN labels l ON c.doc_id = l.id)
        |SELECT doc_id, cluster_id, score,
        |  (row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC) = 1) AS kept
        |FROM scored ORDER BY doc_id""".stripMargin)),

    // Unicode normalization (NFC) + casefold — the standard first step of
    // a curation pipeline: canonically equivalent byte sequences must
    // fingerprint/dedup identically. The corpus is ASCII, so the query
    // appends the SAME decomposed sequences on both engines (combining
    // acute/ring/diaeresis) and the oracle pins that Java's Normalizer and
    // DuckDB's nfc_normalize compose them identically (é, å, ï).
    "q153_normalize" -> ((
      (s: SparkSession, d: String) => {
        val aug = t(s, d, "documents").filter(col("doc_id") < 500)
          .withColumn("raw",
            concat(col("text"), lit(" Café Å naïve STRASSE")))
        aug.select(col("doc_id"),
            graft.functions.UnicodeNorm.unicodeNorm(lower(col("raw")), "NFC")
              .as("norm_text"),
            length(col("raw")).as("raw_len"))
          .withColumn("nfc_len", length(col("norm_text")))
          .orderBy("doc_id")
      },
      raw"""WITH aug AS (SELECT doc_id,
        |    text || ' Cafe' || chr(769) || ' A' || chr(778) || ' nai' || chr(776) || 've STRASSE' AS raw
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id, nfc_normalize(lower(raw)) AS norm_text,
        |  length(raw) AS raw_len,
        |  length(nfc_normalize(lower(raw))) AS nfc_len
        |FROM aug ORDER BY doc_id""".stripMargin)),

    // Count-Min-sketch heavy hitters: token frequencies from a fixed
    // depth×width cell matrix instead of a vocabulary-sized exact groupBy
    // (the 100 TB shape: the sketch shuffle is ≤ 4·1024 cells no matter
    // the corpus; estimates are one-sided upper bounds). Hashing is the
    // portable md5 bucket, so DuckDB rebuilds the identical sketch and
    // the estimates hash-match bit-for-bit.
    "q154_cms_heavy_hitters" -> ((
      (s: SparkSession, d: String) => {
        val corpus = t(s, d, "documents").filter(col("doc_id") < 500)
        val cands = t(s, d, "documents").filter(col("doc_id") < 50)
        graft.ext.Sketch.cmsHeavyHitters(corpus, cands, minCount = 50L,
            depth = 4, width = 1024)
          .orderBy(col("est").desc, col("tok"))
      },
      raw"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
        |toks AS (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS tok FROM corpus),
        |seeds AS (SELECT UNNEST(generate_series(0, 3)) AS seed),
        |cells AS (SELECT seed,
        |    ('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % 1024 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM toks CROSS JOIN seeds GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT tok FROM (
        |  SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM corpus WHERE doc_id < 50) u),
        |probes AS (SELECT tok, seed,
        |    ('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % 1024 AS bucket
        |  FROM cand CROSS JOIN seeds),
        |est AS (SELECT p.tok, MIN(COALESCE(c.cnt, 0)) AS est
        |  FROM probes p LEFT JOIN cells c ON p.seed = c.seed AND p.bucket = c.bucket
        |  GROUP BY 1)
        |SELECT tok, CAST(est AS BIGINT) AS est FROM est WHERE est >= 50
        |ORDER BY est DESC, tok""".stripMargin)),

    // MinHash+LSH near-dup pairs (banded signatures, exact-Jaccard refine).
    // Deterministic (fixed seeds) with measured 100% recall on this corpus
    // at sf0.01 AND sf0.1 — oracled against the exact inverted-index pairs;
    // planted recall additionally asserted in ExtSpec.
    "q33_minhash_pairs" -> ((
      (s: SparkSession, d: String) =>
        Dedup.minhashPairs(plantedDocs(s, d), threshold = 0.6, numHashes = 64,
          bands = 16, k = 4).orderBy("id_a", "id_b"),
      raw"""WITH corpus AS ($plantedDocsSql),
        |docs AS (SELECT doc_id AS id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(tk)-3, 1)),
        |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3]))) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM corpus)),
        |inv AS (SELECT id, len(sh) AS n, UNNEST(sh) AS s FROM docs),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb, COUNT(*) AS common
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(common AS DOUBLE)/(na+nb-common) AS jaccard
        |FROM pairs WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin)),

    // SimHash near-dup pairs (Hamming ≤ 3 via 15-bit chunk candidates).
    // Fully oracled: the 60-bit engine-portable token hash (first 15 hex
    // chars of md5) lets DuckDB recompute signatures bit-for-bit; candidate
    // chunking and the Hamming refine are plain integer arithmetic.
    "q34_simhash_pairs" -> ((
      (s: SparkSession, d: String) =>
        Dedup.simhashPairs(plantedDocs(s, d), maxHamming = 3, bits = 60,
          tokenHash = Dedup.portableTokenHash)
          .orderBy("id_a", "id_b"),
      raw"""WITH corpus AS ($plantedDocsSql),
        |tok AS (SELECT doc_id AS id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS tkn
        |  FROM corpus),
        |tb AS (SELECT id, b.bit,
        |    CASE WHEN (((strpos('0123456789abcdef', substr(md5(tkn), 15 - (b.bit // 4), 1)) - 1)
        |               >> (b.bit % 4)) & 1) = 1 THEN 1 ELSE -1 END AS contrib
        |  FROM tok CROSS JOIN (SELECT UNNEST(generate_series(0, 59)) AS bit) b),
        |cnt AS (SELECT id, bit, SUM(contrib) AS s FROM tb GROUP BY id, bit),
        |sig AS (SELECT id, CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << bit ELSE 0::BIGINT END) AS BIGINT) AS sig
        |  FROM cnt GROUP BY id),
        |ch AS (SELECT id, sig, c.chunk, (sig >> (c.chunk * 15)) & 32767 AS chv
        |  FROM sig CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS chunk) c),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sig_a, b.sig AS sig_b
        |  FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.chv = b.chv AND a.id < b.id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
        |ORDER BY id_a, id_b""".stripMargin)),

    // Embedding-cosine near-dup pairs on planted scaled duplicates
    // (scaling preserves direction → cosine ≈ 1 > 0.99 threshold).
    "q35_embedding_dups" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings").filter(col("vec_id") < 2000)
        val planted = emb.unionByName(
          emb.filter(col("vec_id") % 40 === 0)
            .withColumn("vec_id", col("vec_id") + 100000L)
            .withColumn("embedding", transform(col("embedding"), x => x * lit(2.0f))))
        Dedup.embeddingPairs(planted, threshold = 0.99)
          .select("id_a", "id_b").orderBy("id_a", "id_b")
      },
      // deterministic (fixed hyperplane seed) and measured to emit exactly
      // the planted scaled duplicates at sf0.01 and sf0.1 — random 64-dim
      // vectors never reach cosine 0.99 naturally
      """SELECT vec_id AS id_a, vec_id + 100000 AS id_b FROM embeddings
        |WHERE vec_id < 2000 AND vec_id % 40 = 0 ORDER BY id_a""".stripMargin)),

    // Brute-force exact cosine top-k (ANN correctness baseline).
    "q36_cosine_topk" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(q.e) AS x, UNNEST(c.e) AS y) t)
        |      / (sqrt(q.nsq) * sqrt(c.nsq)) AS score
        |  FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM p)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // Hard-negative mining for contrastive training: each query's k
    // most-similar corpus items EXCLUDING its known positives (here the
    // deterministic aligned pairs q→q+1, q→q+2, and the query's TRUE
    // nearest neighbor — the realistic "the retrieved positive is not a
    // negative" case). Exclusion precedes the rank, so the result is the
    // band just below the positives — exactly what a bi-encoder trainer
    // feeds as hard negatives. Oracle: the q36 cosine replay with the
    // same three-way exclusion (the true-NN exclusion replayed via a
    // nested rank).
    "q151_hard_negatives" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        val truePos = Similarity.bruteForceTopK(emb, queries, k = 1)
          .select(col("query_id"), col("neighbor_id").as("pos_id"))
        val aligned = queries.select(col("vec_id").as("query_id"))
          .withColumn("pos_id", explode(array(col("query_id") + 1, col("query_id") + 2)))
        Similarity.hardNegatives(emb, queries,
            truePos.unionByName(aligned), k = 5)
          .orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(q.e) AS x, UNNEST(c.e) AS y) t)
        |      / (sqrt(q.nsq) * sqrt(c.nsq)) AS score
        |  FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |tp AS (SELECT query_id, neighbor_id AS pos_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk
        |    FROM p) WHERE rk = 1),
        |pos AS (SELECT query_id, pos_id FROM tp
        |  UNION SELECT query_id, query_id + 1 FROM tp
        |  UNION SELECT query_id, query_id + 2 FROM tp),
        |neg AS (SELECT p.* FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM pos
        |    WHERE pos.query_id = p.query_id AND pos.pos_id = p.neighbor_id)),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM neg)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // int8 scalar-quantized ANN — the memory-bandwidth scale path (4×/8×
    // smaller vectors, integer dot hot loop). Fully oracled bit-exact: the
    // shared scale, away-from-zero round, integer dots, and the final
    // correctly-rounded sqrt/divide replay identically in DuckDB.
    "q74_quantized_ann" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT 127.0 / MAX(list_max(list_transform(e, x -> abs(x)))) AS s FROM v),
        |qz AS (SELECT vec_id,
        |    list_transform(e, x -> CAST(round(x * m.s) AS INTEGER)) AS qv
        |  FROM v CROSS JOIN m),
        |n AS (SELECT vec_id, qv,
        |    CAST((SELECT SUM(t.x * t.x) FROM (SELECT UNNEST(qv) AS x) t) AS BIGINT) AS nsq
        |  FROM qz),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST((SELECT SUM(t.x * t.y) FROM (SELECT UNNEST(q.qv) AS x, UNNEST(c.qv) AS y) t) AS DOUBLE)
        |      / sqrt(CAST(q.nsq * c.nsq AS DOUBLE)) AS score
        |  FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM p)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // Product-quantized ANN (ADC scoring): vectors compress to 8 one-byte
    // codes (64 B -> 8 B per vector), queries score candidates by table
    // lookup. Codewords are the md5-ordered corpus sample (as q39) sliced
    // per subspace; every FP reduction is order-pinned (sequential folds,
    // ascending-subspace ADC, ordered SUMs in the oracle) so scores are
    // bit-reproducible and the search is fully oracled.
    "q88_pq_ann" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT e, ROW_NUMBER() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC) - 1 AS cidx
        |  FROM v QUALIFY cidx < 16),
        |subs AS (SELECT UNNEST(range(0, 8)) AS j),
        |cnorm AS (SELECT c.cidx, s.j,
        |    list_sum(list_transform(range(1, 9), i -> c.e[s.j*8 + i] * c.e[s.j*8 + i])) AS w
        |  FROM cent c CROSS JOIN subs s),
        |dist AS (SELECT v.vec_id, s.j, c.cidx,
        |    cn.w - 2.0 * list_sum(list_transform(range(1, 9),
        |      i -> v.e[s.j*8 + i] * c.e[s.j*8 + i])) AS d
        |  FROM v CROSS JOIN cent c CROSS JOIN subs s
        |  JOIN cnorm cn ON cn.cidx = c.cidx AND cn.j = s.j),
        |code AS (SELECT vec_id, j, cidx AS code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cidx ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |vn AS (SELECT co.vec_id, SUM(cn.w ORDER BY co.j) AS vhatn
        |  FROM code co JOIN cnorm cn ON cn.j = co.j AND cn.cidx = co.code
        |  GROUP BY co.vec_id),
        |qn AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS qn
        |  FROM v WHERE vec_id < 10),
        |lut AS (SELECT q.vec_id AS query_id, s.j, c.cidx,
        |    list_sum(list_transform(range(1, 9), i -> q.e[s.j*8 + i] * c.e[s.j*8 + i])) AS val
        |  FROM qn q CROSS JOIN cent c CROSS JOIN subs s),
        |adc AS (SELECT l.query_id, co.vec_id AS neighbor_id, SUM(l.val ORDER BY co.j) AS dotv
        |  FROM code co JOIN lut l ON l.j = co.j AND l.cidx = co.code
        |  WHERE co.vec_id <> l.query_id
        |  GROUP BY l.query_id, co.vec_id),
        |sc AS (SELECT a.query_id, a.neighbor_id,
        |    a.dotv / (sqrt(q.qn) * sqrt(vn.vhatn)) AS score
        |  FROM adc a JOIN qn q ON q.vec_id = a.query_id
        |  JOIN vn ON vn.vec_id = a.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM sc)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // Persisted incremental ANN index: codebooks trained on the EVEN half
    // only, persisted to lake tables, the ODD half added incrementally
    // with frozen codebooks, then searched after a reload. The oracle is
    // the q88 ADC replay with `cent` drawn from the even corpus — codes
    // for every vector, bit-exact scores, proving the whole
    // build→persist→add→reload→search lifecycle is deterministic.
    "q129_vector_index" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.VectorIndex
        val path = java.nio.file.Files.createTempDirectory("graft_vix_q").toString
        val emb = t(s, d, "embeddings")
        val ix = VectorIndex.build(s, path, emb.filter(col("vec_id") % 2 === 0))
        ix.add(emb.filter(col("vec_id") % 2 === 1))
        VectorIndex.load(s, path).search(emb.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT e, ROW_NUMBER() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC) - 1 AS cidx
        |  FROM v WHERE vec_id % 2 = 0 QUALIFY cidx < 16),
        |subs AS (SELECT UNNEST(range(0, 8)) AS j),
        |cnorm AS (SELECT c.cidx, s.j,
        |    list_sum(list_transform(range(1, 9), i -> c.e[s.j*8 + i] * c.e[s.j*8 + i])) AS w
        |  FROM cent c CROSS JOIN subs s),
        |dist AS (SELECT v.vec_id, s.j, c.cidx,
        |    cn.w - 2.0 * list_sum(list_transform(range(1, 9),
        |      i -> v.e[s.j*8 + i] * c.e[s.j*8 + i])) AS d
        |  FROM v CROSS JOIN cent c CROSS JOIN subs s
        |  JOIN cnorm cn ON cn.cidx = c.cidx AND cn.j = s.j),
        |code AS (SELECT vec_id, j, cidx AS code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cidx ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |vn AS (SELECT co.vec_id, SUM(cn.w ORDER BY co.j) AS vhatn
        |  FROM code co JOIN cnorm cn ON cn.j = co.j AND cn.cidx = co.code
        |  GROUP BY co.vec_id),
        |qn AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS qn
        |  FROM v WHERE vec_id < 10),
        |lut AS (SELECT q.vec_id AS query_id, s.j, c.cidx,
        |    list_sum(list_transform(range(1, 9), i -> q.e[s.j*8 + i] * c.e[s.j*8 + i])) AS val
        |  FROM qn q CROSS JOIN cent c CROSS JOIN subs s),
        |adc AS (SELECT l.query_id, co.vec_id AS neighbor_id, SUM(l.val ORDER BY co.j) AS dotv
        |  FROM code co JOIN lut l ON l.j = co.j AND l.cidx = co.code
        |  WHERE co.vec_id <> l.query_id
        |  GROUP BY l.query_id, co.vec_id),
        |sc AS (SELECT a.query_id, a.neighbor_id,
        |    a.dotv / (sqrt(q.qn) * sqrt(vn.vhatn)) AS score
        |  FROM adc a JOIN qn q ON q.vec_id = a.query_id
        |  JOIN vn ON vn.vec_id = a.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM sc)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // Unigram-LM (SentencePiece-family) tokenizer: hard-EM training is
    // rows-only by nature (like q91's BPE training), but ENCODE with a
    // FROZEN vocabulary is a deterministic integer Viterbi any engine can
    // replay — scores are fixed-point log-probs stamped once at train time
    // and persisted as data (the q143 discipline). The oracle replays the
    // full DP from the dumped (piece, qscore) parquet with a recursive
    // CTE: forward pass carrying the best-score and chosen-length lists,
    // backtrack pass rebuilding the token sequence; tie rule (longer last
    // piece) and the UNK single-char floor (-100000000) mirrored verbatim.
    "q147_unigram_encode" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Unigram
        val docs = t(s, d, "documents")
        val vocab = Unigram.train(docs.filter(col("doc_id") < 1000),
          vocabSize = 400, seedSize = 1500, maxPieceLen = 4, emIters = 2)
        val lakeDir = Files.createTempDirectory("graft_ug_lake").toString
        Unigram.save(s, lakeDir, vocab)
        val reloaded = Unigram.loadVocab(s, lakeDir)
        require(reloaded.pieces == vocab.pieces, "save/load must round-trip the vocab")
        s.createDataFrame(reloaded.pieces).toDF("piece", "qscore")
          .coalesce(1).write.mode("overwrite").parquet(UnigramOracleVocabPath)
        val toks = Unigram.encode(reloaded, col("text"))
        docs.select(col("doc_id"),
          size(toks).cast("long").as("n_ug_tokens"),
          concat_ws(" ", toks).as("ug_text")).orderBy("doc_id")
      },
      s"""WITH RECURSIVE
        |v AS (SELECT piece, qscore FROM read_parquet('$UnigramOracleVocabPath/*.parquet')),
        |dw AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
        |       FROM documents),
        |inst AS (SELECT doc_id, u.i AS pos, u.w AS word FROM (
        |    SELECT doc_id, UNNEST(list_transform(range(1, len(ws)+1),
        |        i -> {'i': i, 'w': ws[i]})) AS u
        |    FROM dw) WHERE u.w <> ''),
        |w1 AS (SELECT DISTINCT word FROM inst),
        |dp(word, n, i, bests, choice) AS (
        |  SELECT word, len(word), 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM w1
        |  UNION ALL
        |  SELECT d.word, d.n, d.i + 1,
        |    list_append(d.bests, b.s), list_append(d.choice, CAST(b.l AS INT))
        |  FROM (SELECT * FROM dp WHERE i < n) d
        |  JOIN LATERAL (
        |    SELECT c.s, c.l FROM (
        |      SELECT d.bests[d.i + 2 - CAST(t.l AS INT)] + COALESCE(
        |          (SELECT v2.qscore FROM v v2 WHERE v2.piece =
        |             substr(d.word, d.i + 2 - CAST(t.l AS INT), CAST(t.l AS INT))),
        |          CASE WHEN t.l = 1 THEN -100000000 ELSE NULL END) AS s, t.l AS l
        |      FROM (SELECT UNNEST(range(1, least(4, d.i + 1) + 1)) AS l) t
        |    ) c WHERE c.s IS NOT NULL
        |    ORDER BY c.s DESC, c.l DESC LIMIT 1) b ON true),
        |dpn AS (SELECT word, n, choice FROM dp WHERE i = n),
        |bt(word, pos, toks) AS (
        |  SELECT word, n, CAST([] AS VARCHAR[]) FROM dpn
        |  UNION ALL
        |  SELECT b.word, b.pos - d.choice[b.pos],
        |    list_prepend(substr(b.word, b.pos - d.choice[b.pos] + 1, d.choice[b.pos]),
        |                 b.toks)
        |  FROM bt b JOIN dpn d ON d.word = b.word
        |  WHERE b.pos > 0),
        |wt AS (SELECT word, toks, len(toks) AS n FROM bt WHERE pos = 0)
        |SELECT d.doc_id, CAST(COALESCE(SUM(wt.n), 0) AS BIGINT) AS n_ug_tokens,
        |  COALESCE(string_agg(array_to_string(wt.toks, ' '), ' ' ORDER BY i.pos), '') AS ug_text
        |FROM documents d
        |LEFT JOIN inst i ON i.doc_id = d.doc_id
        |LEFT JOIN wt ON wt.word = i.word
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin)),

    // Persisted incremental INVERTED INDEX (the text-retrieval mirror of
    // q129/q144's vector lifecycle): postings live in a lake table
    // partitioned by term hash bucket, built on the EVEN half and extended
    // incrementally with the odd half; search opens only the query terms'
    // bucket partitions (require-pinned) and scores the q137 exact-integer
    // BM25 with df from the probed postings and N/total-tokens from the
    // 1-row meta table. Oracle = the q137 full-corpus replay verbatim —
    // the incremental index must equal a from-scratch build.
    "q146_text_index" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.TextIndex
        val path = java.nio.file.Files.createTempDirectory("graft_tix_q").toString
        val docs = t(s, d, "documents")
        val ix = TextIndex.build(s, path, docs.filter(col("doc_id") % 2 === 0))
        ix.add(docs.filter(col("doc_id") % 2 === 1))
        val qterms = Seq("join", "window", "dup")
        val (pruned, total) = ix.prunedFileCounts(qterms)
        require(pruned > 0 && pruned < total,
          s"term-bucket pruning must skip files: opened $pruned of $total")
        TextIndex.load(s, path).search(qterms, topK = 20)
          .orderBy(col("bm25_score").desc, col("doc_id").asc)
      },
      raw"""WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS ts
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM toks),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dl) AS tot FROM dl),
        |ex AS (SELECT doc_id, UNNEST(ts) AS term FROM toks),
        |tf AS (SELECT ex.doc_id, ex.term, dl.dl, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM ex JOIN dl ON ex.doc_id = dl.doc_id
        |  WHERE ex.term IN ('join', 'window', 'dup')
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id,
        |    CAST(CAST((2*n.n - 2*df.df + 1) AS HUGEINT) * tf.tf * 22
        |      * n.tot * 1000000
        |      // (CAST((2*df.df + 1) AS HUGEINT) *
        |         (CAST(10 AS HUGEINT) * n.tot * tf.tf
        |          + CAST(3 AS HUGEINT) * n.tot
        |          + CAST(9 AS HUGEINT) * tf.dl * n.n)) AS BIGINT) AS sc
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(SUM(sc) AS BIGINT) AS bm25_score,
        |       COUNT(*) AS n_terms_hit
        |FROM s GROUP BY doc_id
        |ORDER BY bm25_score DESC, doc_id ASC LIMIT 20""".stripMargin)),

    // Streaming maintenance of the inverted index (q146's lifecycle driven
    // through Structured Streaming): the odd half arrives as micro-batched
    // files and each batch is absorbed via the index's incremental add —
    // restart-safe by convergence (every write inside add is keyed). The
    // post-drain probe-pruned search must equal the full-corpus BM25
    // replay, same oracle as q146.
    "q148_stream_text_index" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.TextIndex
        graft.core.GraftSession.ensure(s)
        val docs = t(s, d, "documents")
        val path = java.nio.file.Files.createTempDirectory("graft_tix_s").toString
        TextIndex.build(s, path, docs.filter(col("doc_id") % 2 === 0))
        val land = java.nio.file.Files.createTempDirectory("graft_tix_land").toString
        val ck = java.nio.file.Files.createTempDirectory("graft_tix_ck").toString
        docs.filter(col("doc_id") % 2 === 1)
          .repartition(5).write.mode("overwrite").parquet(land)
        graft.streaming.IndexStream.ingestText(s, land,
          s.read.parquet(land).schema, path, ck)
        val ix = TextIndex.load(s, path)
        val qterms = Seq("join", "window", "dup")
        val (pruned, total) = ix.prunedFileCounts(qterms)
        require(pruned > 0 && pruned < total,
          s"term-bucket pruning must skip files: opened $pruned of $total")
        ix.search(qterms, topK = 20)
          .orderBy(col("bm25_score").desc, col("doc_id").asc)
      },
      raw"""WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS ts
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM toks),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dl) AS tot FROM dl),
        |ex AS (SELECT doc_id, UNNEST(ts) AS term FROM toks),
        |tf AS (SELECT ex.doc_id, ex.term, dl.dl, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM ex JOIN dl ON ex.doc_id = dl.doc_id
        |  WHERE ex.term IN ('join', 'window', 'dup')
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id,
        |    CAST(CAST((2*n.n - 2*df.df + 1) AS HUGEINT) * tf.tf * 22
        |      * n.tot * 1000000
        |      // (CAST((2*df.df + 1) AS HUGEINT) *
        |         (CAST(10 AS HUGEINT) * n.tot * tf.tf
        |          + CAST(3 AS HUGEINT) * n.tot
        |          + CAST(9 AS HUGEINT) * tf.dl * n.n)) AS BIGINT) AS sc
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(SUM(sc) AS BIGINT) AS bm25_score,
        |       COUNT(*) AS n_terms_hit
        |FROM s GROUP BY doc_id
        |ORDER BY bm25_score DESC, doc_id ASC LIMIT 20""".stripMargin)),

    // Persisted IVF-PQ index with LIST-PARTITIONED codes (the persisted
    // analog of q39's coarse pruning composed onto q129's lifecycle): the
    // codes table is laid out as one hive partition per coarse list, so a
    // probe-limited search OPENS only its nProbe lists' files — pinned by
    // the require below via commit-log pruning counts — and candidates
    // obey per-query IVF semantics (a candidate scores only against
    // queries that probed its list). Oracle: coarse md5 sample + cosine
    // argmax assignment (the q130 pattern), per-query top-2 probe lists,
    // then the q129 ADC replay restricted to (query, probed-list) pairs.
    "q144_vector_index_pruned" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.VectorIndex
        val path = java.nio.file.Files.createTempDirectory("graft_vix_p").toString
        val emb = t(s, d, "embeddings")
        val ix = VectorIndex.build(s, path, emb, numLists = 8)
        val queries = emb.filter(col("vec_id") < 10)
        val (pruned, total) =
          ix.prunedFileCounts(queries.filter(col("vec_id") === 0L), nProbe = 2)
        require(pruned < total && pruned > 0,
          s"probe pruning must skip files: opened $pruned of $total")
        ix.search(queries, k = 5, nProbe = 2).orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
        |cl AS (SELECT e AS ce, nsq AS cn, ROW_NUMBER() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC) - 1 AS cid
        |  FROM n QUALIFY cid < 8),
        |csim AS (SELECT n.vec_id, cl.cid,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(n.e) AS x, UNNEST(cl.ce) AS y) t)
        |      / (sqrt(n.nsq) * sqrt(cl.cn)) AS s
        |  FROM n CROSS JOIN cl),
        |cassign AS (SELECT vec_id, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        |    FROM csim) WHERE rn = 1),
        |probe AS (SELECT vec_id AS query_id, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        |    FROM csim WHERE vec_id < 10) WHERE rn <= 2),
        |cent AS (SELECT e, ROW_NUMBER() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC) - 1 AS cidx
        |  FROM v QUALIFY cidx < 16),
        |subs AS (SELECT UNNEST(range(0, 8)) AS j),
        |cnorm AS (SELECT c.cidx, s.j,
        |    list_sum(list_transform(range(1, 9), i -> c.e[s.j*8 + i] * c.e[s.j*8 + i])) AS w
        |  FROM cent c CROSS JOIN subs s),
        |dist AS (SELECT v.vec_id, s.j, c.cidx,
        |    cn.w - 2.0 * list_sum(list_transform(range(1, 9),
        |      i -> v.e[s.j*8 + i] * c.e[s.j*8 + i])) AS d
        |  FROM v CROSS JOIN cent c CROSS JOIN subs s
        |  JOIN cnorm cn ON cn.cidx = c.cidx AND cn.j = s.j),
        |code AS (SELECT vec_id, j, cidx AS code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cidx ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |vn AS (SELECT co.vec_id, SUM(cn.w ORDER BY co.j) AS vhatn
        |  FROM code co JOIN cnorm cn ON cn.j = co.j AND cn.cidx = co.code
        |  GROUP BY co.vec_id),
        |qn AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS qn
        |  FROM v WHERE vec_id < 10),
        |lut AS (SELECT q.vec_id AS query_id, s.j, c.cidx,
        |    list_sum(list_transform(range(1, 9), i -> q.e[s.j*8 + i] * c.e[s.j*8 + i])) AS val
        |  FROM qn q CROSS JOIN cent c CROSS JOIN subs s),
        |adc AS (SELECT l.query_id, co.vec_id AS neighbor_id, SUM(l.val ORDER BY co.j) AS dotv
        |  FROM code co
        |  JOIN cassign ca ON ca.vec_id = co.vec_id
        |  JOIN probe p ON p.cid = ca.cid
        |  JOIN lut l ON l.j = co.j AND l.cidx = co.code AND l.query_id = p.query_id
        |  WHERE co.vec_id <> l.query_id
        |  GROUP BY l.query_id, co.vec_id),
        |sc AS (SELECT a.query_id, a.neighbor_id,
        |    a.dotv / (sqrt(q.qn) * sqrt(vn.vhatn)) AS score
        |  FROM adc a JOIN qn q ON q.vec_id = a.query_id
        |  JOIN vn ON vn.vec_id = a.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM sc)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // The q144 lifecycle under MAINTENANCE: codebooks trained on the even
    // half, the odd half added in two increments with a codes-table
    // COMPACTION after each — the steady state of a serving index that
    // takes appends forever (small add-files folded into per-list files,
    // OCC-serialized against the adds; the racing schedule is pinned in
    // VectorIndexSpec). Compaction is a pure physical rewrite: the oracle
    // is the q144 replay with even-half-trained centroids/codebooks, so a
    // compaction that dropped/duplicated/reassigned ANY code would break
    // the hash; the require pins that probe pruning still skips files on
    // the compacted layout.
    "q149_vix_add_compact" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.VectorIndex
        val path = java.nio.file.Files.createTempDirectory("graft_vix_c").toString
        val emb = t(s, d, "embeddings")
        val ix = VectorIndex.build(s, path, emb.filter(col("vec_id") % 2 === 0),
          numLists = 8)
        ix.add(emb.filter(col("vec_id") % 4 === 1)).compact()
        ix.add(emb.filter(col("vec_id") % 4 === 3)).compact()
        val reloaded = VectorIndex.load(s, path)
        val queries = emb.filter(col("vec_id") < 10)
        val (pruned, total) =
          reloaded.prunedFileCounts(queries.filter(col("vec_id") === 0L), nProbe = 2)
        require(pruned < total && pruned > 0,
          s"probe pruning must survive compaction: opened $pruned of $total")
        reloaded.search(queries, k = 5, nProbe = 2).orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
        |cl AS (SELECT e AS ce, nsq AS cn, ROW_NUMBER() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC) - 1 AS cid
        |  FROM n WHERE vec_id % 2 = 0 QUALIFY cid < 8),
        |csim AS (SELECT n.vec_id, cl.cid,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(n.e) AS x, UNNEST(cl.ce) AS y) t)
        |      / (sqrt(n.nsq) * sqrt(cl.cn)) AS s
        |  FROM n CROSS JOIN cl),
        |cassign AS (SELECT vec_id, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        |    FROM csim) WHERE rn = 1),
        |probe AS (SELECT vec_id AS query_id, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        |    FROM csim WHERE vec_id < 10) WHERE rn <= 2),
        |cent AS (SELECT e, ROW_NUMBER() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC) - 1 AS cidx
        |  FROM v WHERE vec_id % 2 = 0 QUALIFY cidx < 16),
        |subs AS (SELECT UNNEST(range(0, 8)) AS j),
        |cnorm AS (SELECT c.cidx, s.j,
        |    list_sum(list_transform(range(1, 9), i -> c.e[s.j*8 + i] * c.e[s.j*8 + i])) AS w
        |  FROM cent c CROSS JOIN subs s),
        |dist AS (SELECT v.vec_id, s.j, c.cidx,
        |    cn.w - 2.0 * list_sum(list_transform(range(1, 9),
        |      i -> v.e[s.j*8 + i] * c.e[s.j*8 + i])) AS d
        |  FROM v CROSS JOIN cent c CROSS JOIN subs s
        |  JOIN cnorm cn ON cn.cidx = c.cidx AND cn.j = s.j),
        |code AS (SELECT vec_id, j, cidx AS code FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cidx ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |vn AS (SELECT co.vec_id, SUM(cn.w ORDER BY co.j) AS vhatn
        |  FROM code co JOIN cnorm cn ON cn.j = co.j AND cn.cidx = co.code
        |  GROUP BY co.vec_id),
        |qn AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS qn
        |  FROM v WHERE vec_id < 10),
        |lut AS (SELECT q.vec_id AS query_id, s.j, c.cidx,
        |    list_sum(list_transform(range(1, 9), i -> q.e[s.j*8 + i] * c.e[s.j*8 + i])) AS val
        |  FROM qn q CROSS JOIN cent c CROSS JOIN subs s),
        |adc AS (SELECT l.query_id, co.vec_id AS neighbor_id, SUM(l.val ORDER BY co.j) AS dotv
        |  FROM code co
        |  JOIN cassign ca ON ca.vec_id = co.vec_id
        |  JOIN probe p ON p.cid = ca.cid
        |  JOIN lut l ON l.j = co.j AND l.cidx = co.code AND l.query_id = p.query_id
        |  WHERE co.vec_id <> l.query_id
        |  GROUP BY l.query_id, co.vec_id),
        |sc AS (SELECT a.query_id, a.neighbor_id,
        |    a.dotv / (sqrt(q.qn) * sqrt(vn.vhatn)) AS score
        |  FROM adc a JOIN qn q ON q.vec_id = a.query_id
        |  JOIN vn ON vn.vec_id = a.neighbor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM sc)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // Cluster-balanced sampling: coarse-cluster the corpus embeddings
    // (deterministic md5-sampled centroids, codegen'd literal argmax,
    // zero shuffle) and cap each semantic cluster at 50 docs via the
    // two-phase md5-order rule — the "don't let one dominant topic eat
    // the budget" curation primitive (the DataComp/SemDeDup curation
    // line). Oracle = q39's assignment replay + q116's per-group global
    // rank rule, composed.
    "q130_cluster_balanced" -> ((
      (s: SparkSession, d: String) => {
        val assign = Similarity.clusterAssign(t(s, d, "embeddings"), numClusters = 16)
        val joined = t(s, d, "documents").select("doc_id")
          .join(assign, col("doc_id") === col("vec_id")).drop("vec_id")
          .withColumn("cid_s", col("cid").cast("string"))
        Sampling.perDomainCap(joined, cap = 50, domainCol = "cid_s")
          .select(col("doc_id"), col("cid").cast("int").as("cid"))
          .orderBy("doc_id")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
        |cent AS (SELECT vec_id AS cid, e AS ce, nsq AS cn FROM n
        |  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC LIMIT 16),
        |sim AS (SELECT n.vec_id, cent.cid,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(n.e) AS x, UNNEST(cent.ce) AS y) t)
        |      / (sqrt(n.nsq) * sqrt(cent.cn)) AS csim
        |  FROM n CROSS JOIN cent),
        |assign AS (SELECT vec_id, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        |    FROM sim) WHERE rn = 1),
        |j AS (SELECT d.doc_id, a.cid FROM documents d JOIN assign a ON a.vec_id = d.doc_id),
        |rk AS (SELECT doc_id, cid, ROW_NUMBER() OVER (
        |    PARTITION BY cid ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r FROM j)
        |SELECT doc_id, CAST(cid AS INT) AS cid FROM rk WHERE r <= 50
        |ORDER BY doc_id""".stripMargin)),

    // LSH-bucketed ANN (multi-probe) — the 100 TB path; recall vs brute
    // force asserted in ExtSpec. Fully oracled (see lshOracleSql).
    "q37_lsh_topk" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      },
      lshOracleSql)),

    // IVF ANN (coarse-quantized lists, nProbe probing) — the other 100 TB
    // similarity path besides LSH; recall asserted in ExtSpec. Fully
    // oracled: centroid selection is md5-ordered (engine-portable), list
    // assignment / probing / refine are plain argmax + top-k over the same
    // IEEE op sequence as the q36 brute-force oracle.
    "q39_ivf_topk" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
          numLists = 16, nProbe = 6)
          .orderBy("query_id", "rank")
      },
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
        |cent AS (SELECT vec_id AS cid, e AS ce, nsq AS cn FROM n
        |  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC LIMIT 16),
        |sim AS (SELECT n.vec_id, n.e, n.nsq, cent.cid, cent.cn,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(n.e) AS x, UNNEST(cent.ce) AS y) t)
        |      / (sqrt(n.nsq) * sqrt(cent.cn)) AS csim
        |  FROM n CROSS JOIN cent),
        |assign AS (SELECT vec_id AS neighbor_id, e AS cv, nsq AS cvn, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        |    FROM sim) WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, e AS qv, nsq AS qn, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        |    FROM sim WHERE vec_id < 10) WHERE rn <= 6),
        |scored AS (SELECT p.query_id, a.neighbor_id,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(p.qv) AS x, UNNEST(a.cv) AS y) t)
        |      / (sqrt(p.qn) * sqrt(a.cvn)) AS score
        |  FROM probes p JOIN assign a ON p.cid = a.cid AND a.neighbor_id <> p.query_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rk FROM scored)
        |SELECT query_id, neighbor_id, rk AS "rank", score FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin)),

    // Language ID: marker-count argmax with fixed tiebreak order (de > en >
    // es > fr, 'und' when no markers hit) — fully SQL-expressible. The
    // rolling-hash fingerprint is xxhash64-chained (not DuckDB-expressible;
    // its determinism/order-sensitivity is pinned in ExtSpec instead).
    "q38_lang_id" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "documents")
          .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess"))
          .orderBy("doc_id"),
      raw"""WITH s AS (SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |    t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf'], t))) AS de,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |    t -> list_contains(['the','and','of','to','is','in','that','it','with'], t))) AS en,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |    t -> list_contains(['el','la','de','que','los','las','una','por','como'], t))) AS es,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |    t -> list_contains(['le','la','les','des','est','une','dans','pour','que'], t))) AS fr
        |  FROM documents)
        |SELECT doc_id, CASE
        |  WHEN greatest(de, en, es, fr) = 0 THEN 'und'
        |  WHEN de = greatest(de, en, es, fr) THEN 'de'
        |  WHEN en = greatest(de, en, es, fr) THEN 'en'
        |  WHEN es = greatest(de, en, es, fr) THEN 'es'
        |  ELSE 'fr' END AS lang_guess
        |FROM s ORDER BY doc_id""".stripMargin)),

    // Multimodal: binary payload stats via pure builtins (oracled).
    "q40_multimodal_stats" -> ((
      (s: SparkSession, d: String) =>
        Multimodal.payloadStats(Multimodal.mediaFromDocuments(t(s, d, "documents")))
          .orderBy("media_id"),
      """SELECT doc_id AS media_id, 'fake/rgb8' AS format,
        |  octet_length(encode(text)) AS n_bytes,
        |  hex(encode(substring(text, 1, 8))) AS head_hex,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY media_id""".stripMargin)),

    // Multimodal: batched per-partition decode-stub features (mapPartitions
    // — the mapInPandas-shaped path). The stub's fake features are md5-based
    // (the corpus is ASCII, so char offsets ≡ byte offsets), which makes the
    // whole decode output DuckDB-expressible — fully oracled.
    "q41_multimodal_decode" -> ((
      (s: SparkSession, d: String) =>
        Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(t(s, d, "documents")), parallelism = 8)
          .withColumn("frame0", element_at(col("frames"), 1))
          .drop("frames")
          .orderBy("media_id"),
      """WITH m AS (SELECT doc_id AS media_id, text,
        |    octet_length(encode(text)) AS n,
        |    greatest(1, CAST(floor(sqrt(octet_length(encode(text)))) AS INT)) AS width
        |  FROM documents)
        |SELECT media_id, CAST(n AS BIGINT) AS n_bytes, md5(text) AS content_md5,
        |  width, greatest(1, CAST(n // width AS INT)) AS height,
        |  md5(substr(text, 1, greatest(1, n // 4))) AS frame0
        |FROM m ORDER BY media_id""".stripMargin)),

    // Structured Streaming ingest → LakeTable upsert → latest state per key.
    "q42_stream_upsert" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_q")
        val inDir = base.resolve("in"); val tblDir = base.resolve("tbl"); val ckDir = base.resolve("ck")
        Seq(base, inDir).foreach { p => if (!Files.exists(p)) Files.createDirectories(p) }
        Seq(tblDir, ckDir).foreach { p =>
          if (Files.exists(p))
            Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(f => Files.delete(f))
        }
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val ev = events(s, d).select("event_id", "user_id", "event_type", "value", "ts_us")
        // bootstrap the table with an empty slice, then stream everything in
        val tbl = LakeTable.create(s, tblDir.toString, TableSpec("user_id", "ts_us"),
          ev.filter(lit(false)))
        val schema = s.read.parquet(s"$d/events.parquet").schema
        graft.streaming.CdcStream.ingest(s, tbl, inDir.toString, schema, ckDir.toString,
          transform = b => b.withColumn("ts_us", tsMicrosOf(schema("ts").dataType))
            .select("event_id", "user_id", "event_type", "value", "ts_us"))
        tbl.read().select("user_id", "event_id", "event_type", "ts_us").orderBy("user_id")
      },
      """SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS ts_us
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // Stream-stream inner join (§2.9): signups joined to purchases within
    // 30 minutes, both sides watermarked with an event-time range
    // constraint (the state-cleanup contract). Drained with AvailableNow →
    // the appended output is exactly the batch range join (q61's oracle).
    "q71_stream_join" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_j")
        val inDir = base.resolve("in")
        if (!Files.exists(inDir)) Files.createDirectories(inDir)
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val ev = s.readStream.schema(schema).parquet(inDir.toString)
          .withColumn("ts_t", timestamp_micros(tsMicrosOf(schema("ts").dataType)))
        val signup = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id").as("signup_id"), col("ts_t").as("s_ts"))
          .withWatermark("s_ts", "1 hour")
        val purchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts_t").as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val joined = signup.join(purchase,
          col("user_id") === col("p_user") && col("p_ts") > col("s_ts") &&
            col("p_ts") <= col("s_ts") + expr("INTERVAL 30 MINUTES"))
        val name = "graft_sj_sink"
        s.catalog.dropTempView(name)
        val q = joined.writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
          .select(col("user_id"), col("signup_id"), col("purchase_id"),
            unix_micros(col("p_ts")).as("p_ts"))
          .orderBy("user_id", "signup_id", "purchase_id")
      },
      """SELECT s.user_id AS user_id, s.event_id AS signup_id,
        |  p.event_id AS purchase_id, epoch_ns(p.ts)//1000 AS p_ts
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        |  AND epoch_ns(p.ts)//1000 > epoch_ns(s.ts)//1000
        |  AND epoch_ns(p.ts)//1000 <= epoch_ns(s.ts)//1000 + 30*60*1000000
        |ORDER BY user_id, signup_id, purchase_id""".stripMargin)),

    // Stream-stream LEFT OUTER join (§2.9): like q71 but signups WITHOUT a
    // purchase in the window also emit (null purchase columns) — the shape
    // Delta/Flink users reach for in funnel analysis. Outer results only
    // materialize when the watermark passes a row's eviction bound, so a
    // far-future sentinel purchase (unmatched — never emitted by a left
    // join) pushes the final watermark past every signup and the engine's
    // closing no-data batch flushes the remaining state. Drained with
    // AvailableNow → output equals the batch LEFT JOIN.
    "q93_stream_outer_join" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_oj")
        val inDir = base.resolve("in")
        if (!Files.exists(inDir)) Files.createDirectories(inDir)
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val evb = s.read.parquet(s"$d/events.parquet")
        val sch = evb.schema
        val maxUs = evb.agg(max(tsMicrosOf(evb.schema("ts").dataType))).head().getLong(0)
        // one far-future signup AND purchase: the global watermark is the
        // MIN across both sides' watermark operators, so both must advance
        // past every real event for the final flush to cover everything
        val sentBase = evb.limit(1)
          .withColumn("event_id", lit(-1L).cast(sch("event_id").dataType))
          .withColumn("user_id", lit(-1L).cast(sch("user_id").dataType))
          .withColumn("ts", tsFromMicros(sch("ts").dataType,
            lit(maxUs) + lit(30L * 24 * 3600) * lit(1000000L)))
        val sentinel = sentBase.withColumn("event_type", lit("signup"))
          .unionByName(sentBase.withColumn("event_type", lit("purchase")))
        val sentDir = base.resolve("sent")
        sentinel.coalesce(1).write.mode("overwrite").parquet(sentDir.toString)
        val sentPart = Files.list(sentDir).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        Files.copy(sentPart, inDir.resolve("zz_sentinel.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val ev = s.readStream.schema(sch).parquet(inDir.toString)
          .withColumn("ts_t", timestamp_micros(tsMicrosOf(sch("ts").dataType)))
        val signup = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id").as("signup_id"), col("ts_t").as("s_ts"))
          .withWatermark("s_ts", "1 hour")
        val purchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts_t").as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val joined = signup.join(purchase,
          col("user_id") === col("p_user") && col("p_ts") > col("s_ts") &&
            col("p_ts") <= col("s_ts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        val name = "graft_soj_sink"
        s.catalog.dropTempView(name)
        val q = joined.writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
          .filter(col("user_id") >= 0) // drop the sentinel if it ever flushes
          .select(col("user_id"), col("signup_id"), col("purchase_id"),
            unix_micros(col("p_ts")).as("p_ts"))
          .orderBy("user_id", "signup_id", "purchase_id")
      },
      """SELECT s.user_id AS user_id, s.event_id AS signup_id,
        |  p.event_id AS purchase_id, epoch_ns(p.ts)//1000 AS p_ts
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        |  AND epoch_ns(p.ts)//1000 > epoch_ns(s.ts)//1000
        |  AND epoch_ns(p.ts)//1000 <= epoch_ns(s.ts)//1000 + 30*60*1000000
        |ORDER BY user_id, signup_id, purchase_id""".stripMargin)),

    // Session windows (§2.9): per-user sessionization with a 60-minute
    // inactivity gap — the streaming-native op batch windows can't express
    // (session extent depends on the DATA, not the clock). State is one
    // open session per active user, merged/closed as the watermark passes
    // session end + gap; a far-future sentinel (filtered out) pushes the
    // final watermark past every real session so AvailableNow drains them
    // all. Oracle: the classic gaps-and-islands rewrite — a new session
    // starts when the gap to the previous event is >= 60 min (Spark's
    // half-open [ts, ts+gap) windows merge only on strict overlap).
    "q113_session_window" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_sess")
        val inDir = base.resolve("in")
        if (!Files.exists(inDir)) Files.createDirectories(inDir)
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("a_events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val evb = s.read.parquet(s"$d/events.parquet")
        val sch = evb.schema
        val maxUs = evb.agg(max(tsMicrosOf(evb.schema("ts").dataType))).head().getLong(0)
        val sentinel = evb.limit(1)
          .withColumn("event_id", lit(-1L).cast(sch("event_id").dataType))
          .withColumn("user_id", lit(-1L).cast(sch("user_id").dataType))
          .withColumn("ts", tsFromMicros(sch("ts").dataType,
            lit(maxUs) + lit(30L * 24 * 3600) * lit(1000000L)))
        val sentDir = base.resolve("sent")
        sentinel.coalesce(1).write.mode("overwrite").parquet(sentDir.toString)
        val sentPart = Files.list(sentDir).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        Files.copy(sentPart, inDir.resolve("zz_sentinel.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val agg = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
          .withColumn("ts_t", timestamp_micros(tsMicrosOf(sch("ts").dataType)))
          .withWatermark("ts_t", "1 minute")
          .groupBy(session_window(col("ts_t"), "60 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(Tables.dec2(col("value"))).cast("double").as("sum_value"))
        val name = "graft_sess_sink"
        s.catalog.dropTempView(name)
        val q = agg.writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
          .filter(col("user_id") >= 0) // the sentinel's own session never counts
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("sess_start"),
            unix_micros(col("session_window.end")).as("sess_end"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "sess_start")
      },
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS ts_us, value FROM events),
        |m AS (SELECT user_id, ts_us, value,
        |    CASE WHEN LAG(ts_us) OVER w IS NULL
        |         OR ts_us - LAG(ts_us) OVER w >= 3600000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |g AS (SELECT user_id, ts_us, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, MIN(ts_us) AS sess_start,
        |  MAX(ts_us) + 3600000000 AS sess_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin)),

    // Streaming dedup with watermark-bounded state (§2.9):
    // `dropDuplicatesWithinWatermark` keeps first occurrences while holding
    // per-key state only as long as the watermark delay — the bounded-state
    // answer to exactly-once ingestion of an at-least-once feed (a 100 TB
    // stream cannot keep every key ever seen; a batch-window dedup can't
    // dedup across batches). Every 10th event is re-fed as a second file in
    // a later micro-batch (maxFilesPerTrigger=1) and must drop; the delay
    // (90 days) covers the 30-day feed span, so no row is ever late and the
    // drained output equals the duplicate-free feed exactly.
    "q108_stream_dedup" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_ddw")
        val inDir = base.resolve("in")
        if (!Files.exists(inDir)) Files.createDirectories(inDir)
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("a_events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val evb = s.read.parquet(s"$d/events.parquet")
        val sch = evb.schema
        val dupDir = base.resolve("dup")
        evb.filter(col("event_id") % 10 === 0).coalesce(1)
          .write.mode("overwrite").parquet(dupDir.toString)
        val dupPart = Files.list(dupDir)
          .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
        Files.copy(dupPart, inDir.resolve("zz_dups.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val deduped = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
          .withColumn("ts_t", timestamp_micros(tsMicrosOf(sch("ts").dataType)))
          .withWatermark("ts_t", "90 days")
          .dropDuplicatesWithinWatermark("event_id")
        val name = "graft_ddw_sink"
        s.catalog.dropTempView(name)
        val q = deduped.writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts_t")).as("ts_us"))
          .orderBy("event_id")
      },
      """SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS ts_us
        |FROM events ORDER BY event_id""".stripMargin)),

    // Corpus n-gram typicality: per-doc knownness of word bigrams against
    // the whole corpus (boilerplate = high common-gram mass, noise = grams
    // nobody else uses). Explode → corpus hash agg → join back → per-doc
    // re-agg; all-integer output: hash-exact.
    "q96_ngram_typicality" -> ((
      (s: SparkSession, d: String) =>
        TextAnalysis.typicality(t(s, d, "documents"), n = 2, minCount = 3)
          .orderBy("doc_id"),
      raw"""WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |    UNNEST(list_transform(range(1, len(ws)),
        |      i -> array_to_string(ws[i:i+1], ' '))) AS g FROM w),
        |counts AS (SELECT g, COUNT(*) AS c FROM g GROUP BY g),
        |perdoc AS (SELECT doc_id, COUNT(*) AS n_ngrams,
        |    SUM(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS n_known,
        |    SUM(c) AS gram_mass
        |  FROM g JOIN counts USING (g) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
        |  CAST(COALESCE(p.n_known, 0) AS BIGINT) AS n_known,
        |  CAST(COALESCE(p.gram_mass, 0) AS BIGINT) AS gram_mass
        |FROM documents d LEFT JOIN perdoc p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // RAG-style sliding-window chunking: 64-token windows, 16-token
    // overlap, stable (doc, offset)-derived chunk ids + md5 chunk
    // fingerprints. Pure per-row tokenize + posexplode — no shuffle;
    // all-integer/string output: hash-exact.
    "q105_chunking" -> ((
      (s: SparkSession, d: String) =>
        TextAnalysis.chunk(t(s, d, "documents"), chunkTokens = 64, overlap = 16)
          .orderBy("doc_id", "chunk_id"),
      raw"""WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |c AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
        |    CASE WHEN len(ws) <= 64 THEN 1
        |         ELSE (len(ws) - 64 + 47) // 48 + 1 END AS nc FROM w),
        |x AS (SELECT doc_id, ws, n, UNNEST(range(nc)) AS chunk_id FROM c)
        |SELECT doc_id, chunk_id, n AS n_tokens,
        |  chunk_id * 48 AS chunk_start,
        |  CAST(LEAST(64, n - chunk_id * 48) AS BIGINT) AS chunk_len,
        |  array_to_string(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text,
        |  md5(array_to_string(ws[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')) AS chunk_hash
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin)),

    // Feature-hashed (hashing-trick) text embeddings: vocabulary-free
    // fixed-width integer vectors from md5-portable token buckets with
    // ±1 signs — sparse (doc, bucket, weight) rows, replayed exactly by
    // the oracle including sign cancellations.
    "q106_hashed_embedding" -> ((
      (s: SparkSession, d: String) =>
        TextAnalysis.hashedEmbedding(t(s, d, "documents"), dim = 256)
          .orderBy("doc_id", "bucket"),
      raw"""WITH tok AS (SELECT doc_id,
        |    UNNEST(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
        |h AS (SELECT doc_id,
        |    ('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT AS hv FROM tok)
        |SELECT doc_id, hv % 256 AS bucket,
        |  CAST(SUM(CASE WHEN (hv // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        |FROM h GROUP BY doc_id, hv % 256 ORDER BY doc_id, bucket""".stripMargin)),

    // Count-min-sketch heavy hitters with exact companion: the 4×1024
    // md5-portable sketch is replayed bit-for-bit (collisions included),
    // the exact top-20 anchors it, and the CMS one-sided bound
    // (est >= exact) enters as an always-true boolean column.
    "q107_heavy_hitters" -> ((
      (s: SparkSession, d: String) =>
        TextAnalysis.heavyHitters(t(s, d, "documents"), k = 20, depth = 4, width = 1024)
          .orderBy(col("exact_c").desc, col("tok").asc),
      raw"""WITH tok AS (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |sk AS (SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT UNNEST([0, 1, 2, 3]) AS d,
        |      UNNEST([('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT % 1024,
        |              ('0x' || substr(md5('1:' || tok), 1, 15))::BIGINT % 1024,
        |              ('0x' || substr(md5('2:' || tok), 1, 15))::BIGINT % 1024,
        |              ('0x' || substr(md5('3:' || tok), 1, 15))::BIGINT % 1024]) AS bucket
        |    FROM tok) GROUP BY d, bucket),
        |topk AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_c FROM tok
        |  GROUP BY tok ORDER BY exact_c DESC, tok ASC LIMIT 20),
        |probe AS (SELECT t.tok, t.exact_c, x.d,
        |    ('0x' || substr(md5(CAST(x.d AS VARCHAR) || ':' || t.tok), 1, 15))::BIGINT % 1024 AS bucket
        |  FROM topk t CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS d) x)
        |SELECT p.tok, p.exact_c, MIN(s.c) AS cms_est,
        |  MIN(s.c) >= p.exact_c AS bound_ok
        |FROM probe p JOIN sk s ON p.d = s.d AND p.bucket = s.bucket
        |GROUP BY p.tok, p.exact_c
        |ORDER BY exact_c DESC, tok ASC""".stripMargin)),

    // Deterministic global shuffle: every doc's 0-based position in the
    // md5(seed:key) permutation — reproducible training order, computed
    // two-phase (256-bucket counts -> driver prefix -> per-bucket ranks),
    // never a single-partition global window.
    // The END-TO-END training-data pipeline, one query: exact dedup →
    // language filter → seed-classifier quality gate → per-domain cap →
    // token budget → deterministic epoch shuffle. Every stage is an
    // operator this engine ships individually; chained here they replay
    // doc-for-doc in DuckDB — the "a user could run their whole pipeline
    // and prove it" flagship. All-integer outputs: hash-exact.
    "q120_training_pipeline" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Sampling
        val docs = t(s, d, "documents")
        val deduped = Dedup.exact(docs)
        val en = deduped.filter(col("lang") === "en")
        // classifier trained on the FULL corpus's src0/src1 seeds
        val scores = TextAnalysis.seedClassifier(docs,
          isPos = col("source") === "src0", isNeg = col("source") === "src1")
        val quality = en.join(scores, "doc_id")
          .filter(col("quality_score") >= 500000L)
        val capped = Sampling.perDomainCap(quality, cap = 15L)
        val budgeted = Sampling.tokenBudget(capped, budget = 6000L)
        Sampling.deterministicShuffle(budgeted, seed = 42L)
          .select("doc_id", "source", "n_toks", "quality_score", "shuffle_pos")
          .orderBy("doc_id")
      },
      raw"""WITH dedup AS (
        |  SELECT doc_id, source, lang, text FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |en AS (SELECT * FROM dedup WHERE lang = 'en'),
        |tok AS (SELECT doc_id, source,
        |    UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tt AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
        |  FROM tok WHERE length(tok) > 0),
        |w AS (SELECT b,
        |    (SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) + 1) * 1000000
        |      // (SUM(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END) + 2) AS w
        |  FROM tt WHERE source IN ('src0', 'src1') GROUP BY b),
        |score AS (SELECT tt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |    CAST(SUM(COALESCE(w.w, 500000)) // COUNT(*) AS BIGINT) AS q
        |  FROM tt LEFT JOIN w ON tt.b = w.b GROUP BY tt.doc_id),
        |quality AS (SELECT en.doc_id, en.source, en.text, score.n_toks, score.q
        |  FROM en JOIN score ON en.doc_id = score.doc_id WHERE score.q >= 500000),
        |capped AS (SELECT * FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS crk
        |  FROM quality) WHERE crk <= 15),
        |budget AS (SELECT *,
        |    SUM(wtok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) - wtok AS run
        |  FROM (SELECT *,
        |      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS wtok
        |    FROM capped)),
        |kept AS (SELECT * FROM budget WHERE run < 6000)
        |SELECT doc_id, source, n_toks, q AS quality_score,
        |  ROW_NUMBER() OVER (
        |    ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) - 1
        |    AS shuffle_pos
        |FROM kept ORDER BY doc_id""".stripMargin)),

    "q102_det_shuffle" -> ((
      (s: SparkSession, d: String) =>
        Sampling.deterministicShuffle(t(s, d, "documents"), seed = 42L)
          .select("doc_id", "shuffle_pos").orderBy("doc_id"),
      """SELECT doc_id,
        |  ROW_NUMBER() OVER (
        |    ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) - 1
        |    AS shuffle_pos
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // CCNet-style Stupid-Backoff LM quality scoring: trigram/bigram/unigram
    // counts trained on the even-doc_id half of the corpus, every doc scored
    // per token at the longest matching order with 0.4-per-order backoff.
    // Fixed-point integer arithmetic end to end (millionths, floor division)
    // so the oracle replay is hash-exact — no FP anywhere.
    "q97_lm_quality" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        TextAnalysis.stupidBackoff(docs.filter(col("doc_id") % 2 === 0), docs)
          .orderBy("doc_id")
      },
      raw"""WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents),
        |m AS (SELECT * FROM w WHERE doc_id % 2 = 0),
        |u AS (SELECT UNNEST(ws) AS g FROM m),
        |uc AS (SELECT g, COUNT(*) AS c FROM u GROUP BY g),
        |tot AS (SELECT COUNT(*) AS n FROM u),
        |bc AS (SELECT g, COUNT(*) AS c FROM (
        |    SELECT UNNEST(CASE WHEN len(ws) < 2 THEN [] ELSE
        |      list_transform(range(1, len(ws)), i -> array_to_string(ws[i:i+1], ' ')) END) AS g
        |    FROM m) GROUP BY g),
        |tc AS (SELECT g, COUNT(*) AS c FROM (
        |    SELECT UNNEST(CASE WHEN len(ws) < 3 THEN [] ELSE
        |      list_transform(range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' ')) END) AS g
        |    FROM m) GROUP BY g),
        |pos AS (SELECT doc_id,
        |    UNNEST(range(0, len(ws))) AS p,
        |    UNNEST(ws) AS w0,
        |    UNNEST(list_transform(range(1, len(ws) + 1),
        |      i -> CASE WHEN i >= 2 THEN ws[i-1] ELSE NULL END)) AS w1,
        |    UNNEST(list_transform(range(1, len(ws) + 1),
        |      i -> CASE WHEN i >= 3 THEN ws[i-2] ELSE NULL END)) AS w2
        |  FROM w),
        |j AS (SELECT pos.doc_id, pos.p, tc.c AS c3, bctx.c AS cctx,
        |    bc2.c AS c2, u1.c AS cu1, u0.c AS c1, tot.n AS n
        |  FROM pos
        |  LEFT JOIN tc ON pos.w2 IS NOT NULL
        |    AND tc.g = pos.w2 || ' ' || pos.w1 || ' ' || pos.w0
        |  LEFT JOIN bc bctx ON pos.w2 IS NOT NULL
        |    AND bctx.g = pos.w2 || ' ' || pos.w1
        |  LEFT JOIN bc bc2 ON pos.w1 IS NOT NULL
        |    AND bc2.g = pos.w1 || ' ' || pos.w0
        |  LEFT JOIN uc u1 ON u1.g = pos.w1
        |  LEFT JOIN uc u0 ON u0.g = pos.w0
        |  CROSS JOIN tot),
        |s AS (SELECT doc_id, p, c3, c2, c1,
        |    CASE
        |      WHEN c3 IS NOT NULL THEN c3 * 1000000 // cctx
        |      WHEN c2 IS NOT NULL AND p >= 2 THEN c2 * 400000 // cu1
        |      WHEN c2 IS NOT NULL THEN c2 * 1000000 // cu1
        |      WHEN c1 IS NOT NULL THEN
        |        (CASE WHEN p >= 2 THEN c1 * 160000
        |              WHEN p = 1 THEN c1 * 400000
        |              ELSE c1 * 1000000 END) // n
        |      ELSE 0 END AS sc
        |  FROM j)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_pos,
        |  CAST(SUM(CASE WHEN c3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
        |  CAST(SUM(CASE WHEN c3 IS NULL AND c2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits2,
        |  CAST(SUM(CASE WHEN c3 IS NULL AND c2 IS NULL AND c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
        |  CAST(SUM(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(sc) AS BIGINT) AS sb_milli
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // SemDeDup semantic deduplication: md5-sampled cluster assignment (the
    // q39-portable argmax), then within-cluster first-occurrence-owns
    // pruning of near-duplicates (cosine > 0.99 to an earlier member).
    // Planted exact copies (vec_id + 100000) must all drop; genuine
    // near-dups among the random embeddings drop identically on both
    // engines because every cosine is an order-pinned FP fold.
    "q94_semantic_dedup" -> ((
      (s: SparkSession, d: String) => {
        val emb = t(s, d, "embeddings")
        val planted = emb.filter(col("vec_id") < 50)
          .withColumn("vec_id", col("vec_id") + 100000L)
        Similarity.semanticDedup(emb.unionByName(planted),
          numClusters = 16, threshold = 0.99)
          .orderBy("vec_id")
      },
      """WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |v AS (SELECT * FROM v0 UNION ALL
        |      SELECT vec_id + 100000, e FROM v0 WHERE vec_id < 50),
        |n AS (SELECT vec_id, e, (SELECT SUM(x*x) FROM (SELECT UNNEST(e) AS x)) AS nsq FROM v),
        |cent AS (SELECT vec_id AS cid, e AS ce, nsq AS cn FROM n
        |  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':42') ASC, vec_id ASC LIMIT 16),
        |sim AS (SELECT n.vec_id, n.e, n.nsq, cent.cid,
        |    (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(n.e) AS x, UNNEST(cent.ce) AS y) t)
        |      / (sqrt(n.nsq) * sqrt(cent.cn)) AS csim
        |  FROM n CROSS JOIN cent),
        |assign AS (SELECT vec_id, e, nsq, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        |    FROM sim) WHERE rn = 1),
        |dropped AS (SELECT DISTINCT a.vec_id FROM assign a JOIN assign b
        |  ON a.cid = b.cid AND b.vec_id < a.vec_id
        |  AND (SELECT SUM(t.x*t.y) FROM (SELECT UNNEST(a.e) AS x, UNNEST(b.e) AS y) t)
        |      / (sqrt(a.nsq) * sqrt(b.nsq)) > 0.99)
        |SELECT a.vec_id, a.cid FROM assign a
        |WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
        |ORDER BY a.vec_id""".stripMargin)),

    // Sketch aggregation: HLL++ approximate distinct users per event type,
    // verified numerically — the exact count is hashed against the oracle
    // and the sketch enters as a boolean error-bound check (HLL++ register
    // merges are commutative maxes, so the estimate is partition-order
    // deterministic and the bound is reproducible; the oracle's column is
    // literal TRUE). rsd=0.02 ⇒ a 10% bound is ≥5 sigma.
    // Mergeable quantile sketch (q60's pattern for quantiles): exact
    // per-group percentiles are hashed; the approx_percentile sketch
    // (Spark's distributed-mergeable GK digest at accuracy 1000) enters
    // as a rank-error boolean — its value rank must sit within 2% of the
    // target quantile, the documented guarantee with slack for merges.
    "q117_approx_quantiles" -> ((
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        val agg = o.groupBy("o_orderstatus").agg(
          count(lit(1)).as("n"),
          percentile(col("o_totalprice"), lit(0.5)).as("exact_med"),
          percentile(col("o_totalprice"), lit(0.9)).as("exact_p90"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("_am"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(1000)).as("_a9"))
        val ranks = o.join(agg.select("o_orderstatus", "_am", "_a9"), "o_orderstatus")
          .groupBy("o_orderstatus").agg(
            sum(when(col("o_totalprice") <= col("_am"), 1L).otherwise(0L)).as("_rm"),
            sum(when(col("o_totalprice") <= col("_a9"), 1L).otherwise(0L)).as("_r9"))
        agg.join(ranks, "o_orderstatus")
          .select(col("o_orderstatus"), col("n"), col("exact_med"), col("exact_p90"),
            (abs(col("_rm").cast("double") / col("n") - 0.5) <= 0.02).as("med_ok"),
            (abs(col("_r9").cast("double") / col("n") - 0.9) <= 0.02).as("p90_ok"))
          .orderBy("o_orderstatus")
      },
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  quantile_cont(o_totalprice, 0.5) AS exact_med,
        |  quantile_cont(o_totalprice, 0.9) AS exact_p90,
        |  TRUE AS med_ok, TRUE AS p90_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Seed-labeled quality classifier (fastText/CCNet corpus-filter role):
    // src0 docs are the positive seed, src1 the negative; every doc gets
    // an exact-integer mean token posterior — model and scores replay
    // bit-for-bit in DuckDB (md5 buckets, Laplace integer division).
    "q118_quality_classifier" -> ((
      (s: SparkSession, d: String) =>
        TextAnalysis.seedClassifier(t(s, d, "documents"),
          isPos = col("source") === "src0", isNeg = col("source") === "src1")
          .orderBy("doc_id"),
      raw"""WITH tok AS (SELECT doc_id, source,
        |    UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tt AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
        |  FROM tok WHERE length(tok) > 0),
        |w AS (SELECT b,
        |    (SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) + 1) * 1000000
        |      // (SUM(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END) + 2) AS w
        |  FROM tt WHERE source IN ('src0', 'src1') GROUP BY b)
        |SELECT tt.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |  CAST(SUM(COALESCE(w.w, 500000)) // COUNT(*) AS BIGINT) AS quality_score
        |FROM tt LEFT JOIN w ON tt.b = w.b
        |GROUP BY tt.doc_id ORDER BY doc_id""".stripMargin)),

    "q60_approx_distinct" -> ((
      (s: SparkSession, d: String) =>
        events(s, d)
          .groupBy("event_type")
          .agg(count_distinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n"),
            (abs(approx_count_distinct(col("user_id"), 0.02).cast("double") /
              count_distinct(col("user_id")).cast("double") - 1.0) <= 0.1)
              .as("sketch_ok"))
          .orderBy("event_type"),
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(COUNT(*) AS BIGINT) AS n, TRUE AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Distributed BPE tokenizer TRAINING, hash-checked end to end via an
    // argmax CERTIFICATE: the query emits one row per merge round — the
    // chosen pair, its corpus-weighted adjacency count, and the number of
    // vocabulary words it touched — and persists the learned merge table
    // as the q143-style parquet artifact. The oracle uses that artifact
    // ONLY to advance the vocabulary state (the same space-wrapped
    // replace() recurrence the q143 encode replay uses), then recomputes
    // each round's argmax (n DESC, l ASC, r ASC — binary collation on
    // both engines) and affected-word count INDEPENDENTLY: a wrong merge
    // at any round makes the recomputed argmax disagree with the emitted
    // row and the hash goes red. Training itself stays the iterative
    // driver-paced loop (BpeSpec pins incremental ≡ full-recount); this
    // closes the last rows-only CORRECTNESS entry from round 5.
    "q91_bpe_tokens" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Bpe
        val docs = t(s, d, "documents")
        val (merges, stats) =
          Bpe.trainWithStats(docs.filter(col("doc_id") < 1000), numMerges = 40)
        require(merges.pairs.length == 40, "training must learn the requested merges")
        val rows = merges.pairs.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
        s.createDataFrame(rows).toDF("rank", "left", "right")
          .coalesce(1).write.mode("overwrite").parquet(BpeOracleTrainPath)
        val statRows = stats.zipWithIndex.map { case (st, i) =>
          (i.toLong, st.l, st.r, st.n, st.affectedWords) }
        s.createDataFrame(statRows).toDF("rk", "l", "r", "n_pair", "n_words")
          .orderBy("rk")
      },
      s"""WITH RECURSIVE
        |m AS (SELECT "rank" AS rk, "left" AS l, "right" AS r
        |      FROM read_parquet('$BpeOracleTrainPath/*.parquet')),
        |wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
        |    FROM documents WHERE doc_id < 1000)
        |  WHERE word <> '' GROUP BY word),
        |init AS (SELECT word, freq, ' ' || array_to_string(syms, '  ') || ' ' AS s
        |  FROM (SELECT word, freq, list_transform(range(1, len(c)+1),
        |          i -> c[i] || CASE WHEN i = len(c) THEN '·' ELSE '' END) AS syms
        |        FROM (SELECT word, freq, str_split_regex(word, '') AS c FROM wf))),
        |st(iter, word, freq, s) AS (
        |  SELECT 0, word, freq, s FROM init
        |  UNION ALL
        |  SELECT e.iter + 1, e.word, e.freq,
        |    replace(e.s, ' ' || g.l || '  ' || g.r || ' ', ' ' || g.l || g.r || ' ')
        |  FROM st e JOIN m g ON g.rk = e.iter
        |  WHERE e.iter < 40),
        |pc AS (SELECT iter, p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS n_pair
        |  FROM (SELECT iter, freq,
        |      UNNEST(list_transform(range(1, len(sy)), j -> {'l': sy[j], 'r': sy[j+1]})) AS p
        |    FROM (SELECT iter, freq, str_split(trim(s), '  ') AS sy
        |          FROM st WHERE iter < 40)
        |    WHERE len(sy) >= 2)
        |  GROUP BY iter, p.l, p.r),
        |aff AS (SELECT g.rk, CAST(COUNT(*) AS BIGINT) AS n_words
        |  FROM st e JOIN m g ON g.rk = e.iter
        |  WHERE contains(e.s, ' ' || g.l || '  ' || g.r || ' ')
        |  GROUP BY g.rk),
        |best AS (SELECT iter, l, r, n_pair FROM (
        |    SELECT iter, l, r, n_pair, ROW_NUMBER() OVER (
        |      PARTITION BY iter ORDER BY n_pair DESC, l ASC, r ASC) AS rn
        |    FROM pc) WHERE rn = 1)
        |SELECT CAST(b.iter AS BIGINT) AS rk, b.l, b.r, b.n_pair, a.n_words
        |FROM best b JOIN aff a ON a.rk = b.iter
        |ORDER BY rk""".stripMargin)),

    // Greedy BPE ENCODE under a FIXED merges table, hash-checked end to
    // end: training (q91) is iterative and stays rows-only, but encode is
    // a deterministic per-row function of (text, merges) — so the learned
    // (rank,left,right) table is persisted as a plain-parquet artifact at
    // a fixed path and DuckDB REPLAYS the greedy lowest-rank-first merge
    // loop from it with a recursive CTE (distinct words only, one
    // iteration per applied merge; symbols space-wrapped so a pair match
    // in the string is exactly symbol adjacency and replace() is the
    // canonical non-overlapping left-to-right merge). The save/loadMerges
    // lake-table lifecycle is exercised on the way: the encode runs off
    // the RELOADED artifact, proving persist→load→encode determinism.
    "q143_bpe_encode" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.Bpe
        val docs = t(s, d, "documents")
        val merges = Bpe.train(docs.filter(col("doc_id") < 1000), numMerges = 40)
        val lakeDir = Files.createTempDirectory("graft_bpe_lake").toString
        Bpe.save(s, lakeDir, merges)
        val reloaded = Bpe.loadMerges(s, lakeDir)
        require(reloaded.pairs == merges.pairs, "save/load must round-trip the merges")
        val rows = merges.pairs.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
        s.createDataFrame(rows).toDF("rank", "left", "right")
          .coalesce(1).write.mode("overwrite").parquet(BpeOracleMergesPath)
        val toks = Bpe.encode(reloaded, col("text"))
        docs.select(col("doc_id"),
          size(toks).cast("long").as("n_bpe_tokens"),
          concat_ws(" ", toks).as("bpe_text")).orderBy("doc_id")
      },
      s"""WITH RECURSIVE
        |m AS (SELECT "rank" AS rk, "left" AS l, "right" AS r
        |      FROM read_parquet('$BpeOracleMergesPath/*.parquet')),
        |dw AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
        |       FROM documents),
        |inst AS (SELECT doc_id, u.i AS pos, u.w AS word FROM (
        |    SELECT doc_id, UNNEST(list_transform(range(1, len(ws)+1),
        |        i -> {'i': i, 'w': ws[i]})) AS u
        |    FROM dw) WHERE u.w <> ''),
        |w1 AS (SELECT DISTINCT word FROM inst),
        |init AS (SELECT word, ' ' || array_to_string(syms, '  ') || ' ' AS s,
        |    len(syms) < 2 AS done
        |  FROM (SELECT word, list_transform(range(1, len(c)+1),
        |          i -> c[i] || CASE WHEN i = len(c) THEN '·' ELSE '' END) AS syms
        |        FROM (SELECT word, str_split_regex(word, '') AS c FROM w1))),
        |enc(word, s, done) AS (
        |  SELECT word, s, done FROM init
        |  UNION ALL
        |  SELECT e.word,
        |    CASE WHEN b.l IS NULL THEN e.s
        |         ELSE replace(e.s, ' ' || b.l || '  ' || b.r || ' ',
        |                      ' ' || b.l || b.r || ' ') END,
        |    b.l IS NULL
        |  FROM (SELECT word, s FROM enc WHERE NOT done) e
        |  LEFT JOIN LATERAL (
        |     SELECT m.l, m.r FROM m
        |     WHERE contains(e.s, ' ' || m.l || '  ' || m.r || ' ')
        |     ORDER BY m.rk LIMIT 1) b ON true),
        |wt AS (SELECT word, replace(trim(s), '  ', ' ') AS toks,
        |              len(str_split(trim(s), '  ')) AS n
        |       FROM enc WHERE done)
        |SELECT d.doc_id,
        |  CAST(COALESCE(SUM(wt.n), 0) AS BIGINT) AS n_bpe_tokens,
        |  COALESCE(string_agg(wt.toks, ' ' ORDER BY i.pos), '') AS bpe_text
        |FROM documents d
        |LEFT JOIN inst i ON i.doc_id = d.doc_id
        |LEFT JOIN wt ON wt.word = i.word
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin)),

    // Interval/range join: purchases within 30 minutes after a signup by
    // the same user (time-windowed self-join, J-extension beyond equi).
    // Banded range join: an inequality join with NO equi key — purchases
    // 1µs..30min after ANY error event, cross-user. Naively this is a
    // broadcast-nested-loop (O(|L|·|R|) at any scale); RangeJoin.bandJoin
    // quantizes both sides into band-width bins, hash-joins the bin id
    // (constant left duplication), and re-applies the exact predicate —
    // the require pins that no nested-loop/cartesian survives in the plan.
    "q115_band_join" -> ((
      (s: SparkSession, d: String) => {
        import graft.ext.RangeJoin
        val ev = events(s, d)
        val errs = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("ts_us").as("e_ts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts_us").as("p_ts"))
        val joined = RangeJoin.bandJoin(errs, "e_ts", purch, "p_ts",
          lower = 1L, upper = 30L * 60 * 1000000 + 1)
        val plan = joined.queryExecution.executedPlan.toString
        require(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
          "banded range join must plan as a hash join on the bin id")
        joined.groupBy("error_id")
          .agg(count(lit(1)).as("n_purchases"), max("purchase_id").as("max_purchase"))
          .orderBy("error_id")
      },
      """SELECT e.event_id AS error_id, COUNT(*) AS n_purchases,
        |  MAX(p.event_id) AS max_purchase
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON epoch_ns(p.ts)//1000 - epoch_ns(e.ts)//1000 >= 1
        |  AND epoch_ns(p.ts)//1000 - epoch_ns(e.ts)//1000 < 1800000001
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q61_range_join" -> ((
      (s: SparkSession, d: String) => {
        val ev = events(s, d)
        val signup = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id").as("signup_id"), col("ts_us").as("s_ts"))
        val purchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us").as("p_ts"))
        signup.join(purchase, Seq("user_id"))
          .filter(col("p_ts") > col("s_ts") &&
            col("p_ts") <= col("s_ts") + 30L * 60 * 1000000)
          .select("user_id", "signup_id", "purchase_id", "p_ts")
          .orderBy("user_id", "signup_id", "purchase_id")
      },
      """SELECT s.user_id AS user_id, s.event_id AS signup_id,
        |  p.event_id AS purchase_id, epoch_ns(p.ts)//1000 AS p_ts
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        |  AND epoch_ns(p.ts)//1000 > epoch_ns(s.ts)//1000
        |  AND epoch_ns(p.ts)//1000 <= epoch_ns(s.ts)//1000 + 30*60*1000000
        |ORDER BY user_id, signup_id, purchase_id""".stripMargin)),

    // Pivot: per-user event-type counts as columns (explicit value list —
    // the scale-safe form; an unlisted pivot needs a distinct-scan first).
    "q69_pivot" -> ((
      (s: SparkSession, d: String) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        events(s, d).groupBy("user_id").pivot("event_type", types).agg(count(lit(1)))
          .select(col("user_id") +:
            types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
          .orderBy("user_id")
      },
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // TF-IDF: top-3 scoring terms per document (composes the q52/q53
    // vocabulary passes into the classic relevance score; natural log,
    // same IEEE op order in both engines).
    "q70_tfidf" -> ((
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val n = docs.count()
        val toks = docs.select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
        tf.join(dfreq, "term")
          .withColumn("score", col("tf") * log(lit(n.toDouble) / col("df")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          // rank on the full double but DON'T hash it — Java Math.log and
          // libm ln differ in the last ulp, and decimal quantization can't
          // absorb a diff that lands on a rounding boundary (seen at sf0.1).
          // Ordering is robust (near-ties of tf·ln(N/df) across distinct
          // small-integer (tf, df) pairs don't occur); emit (tf, df, rk).
          .select("doc_id", "term", "tf", "df", "rk")
          .orderBy("doc_id", "rk")
      },
      raw"""WITH toks AS (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk FROM s)
        |SELECT doc_id, term, tf, df, rk FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin)),

    // As-of (temporal) join: every purchase matched to the user's most
    // recent click at-or-before the purchase time. Right side pre-aggregated
    // to unique (user, ts) so the match is deterministic; oracled against
    // DuckDB's native ASOF JOIN. The operator is the union-tag + running
    // last() window shape — one key shuffle, no range-join explosion.
    "q67_asof_join" -> ((
      (s: SparkSession, d: String) => {
        val ev = events(s, d)
        val purchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us"))
        val click = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts_us").agg(max(col("event_id")).as("click_id"))
        graft.ext.AsOfJoin.asof(purchase, click, "user_id", "ts_us", "ts_us")
          .select(col("user_id"), col("purchase_id"), col("ts_us").as("p_ts"),
            col("matched.click_id").as("click_id"), col("matched.ts_us").as("c_ts"))
          .orderBy("user_id", "purchase_id")
      },
      """WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_ns(ts)//1000 AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ns(ts)//1000 AS c_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id AS user_id, purchase_id, p_ts, click_id, c_ts
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
        |ORDER BY user_id, purchase_id""".stripMargin)),

    // Semi-structured props parsing: JSON field extraction + aggregation
    // (get_json_object vs DuckDB json_extract_string).
    "q59_json_props" -> ((
      (s: SparkSession, d: String) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
          .orderBy("event_type"),
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Custom stateful streaming (flatMapGroupsWithState): first-seen dedup
    // per (user, event_type); one input file → one micro-batch → output is
    // the global (ts, id)-minimum per key, which SQL can express exactly.
    // transformWithState (Spark 4's arbitrary-state API — typed per-key
    // state handles + TTL + timers, the flatMapGroupsWithState successor):
    // a per-user running aggregate held in ValueState across micro-batches
    // (maxFilesPerTrigger=1 forces several), each batch emitting the
    // state-so-far; the LAST update per user must equal the batch GROUP BY
    // — that contract is the oracle. Integer-only state ⇒ engine-exact.
    "q119_transform_with_state" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_tws")
        val inDir = base.resolve("in")
        if (!Files.exists(inDir)) Files.createDirectories(inDir)
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("a_events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val evb = s.read.parquet(s"$d/events.parquet")
        val schema = evb.schema
        // a second input file = a second micro-batch: state must carry over
        evb.filter(col("event_id") % 3 === 0).coalesce(1)
          .write.mode("overwrite").parquet(base.resolve("extra").toString)
        val extra = Files.list(base.resolve("extra"))
          .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
        Files.copy(extra, inDir.resolve("zz_extra.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        import s.implicits._
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
          .withColumn("ts_us", tsMicrosOf(schema("ts").dataType))
          .select("user_id", "event_type", "event_id", "ts_us")
          .as[graft.streaming.StatefulOps.Keyed]
        val out = graft.streaming.StatefulOps.runningAgg(stream)
        val name = "graft_tws_sink"
        s.catalog.dropTempView(name)
        // transformWithState needs the multi-column-family RocksDB store
        // (HDFSBacked refuses); scope the provider to this query
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val prior = s.conf.getOption(providerKey)
        s.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val q = out.writeStream.outputMode("update").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally prior.fold(s.conf.unset(providerKey))(s.conf.set(providerKey, _))
        // the final update per user (greatest running count) = batch agg
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_events").desc)
        val updates = s.table(name)
        require(updates.groupBy("user_id").count().filter(col("count") >= 2).count() > 0,
          "state must have carried across micro-batches (users with 2+ updates)")
        updates.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
          .select("user_id", "n_events", "max_event_id")
          .orderBy("user_id")
      },
      """SELECT user_id,
        |  CAST(COUNT(*) + COUNT(*) FILTER (event_id % 3 = 0) AS BIGINT) AS n_events,
        |  MAX(event_id) AS max_event_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    "q58_stream_stateful" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stateful")
        val inDir = base.resolve("in")
        if (!Files.exists(inDir)) Files.createDirectories(inDir)
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        import s.implicits._
        val stream = s.readStream.schema(schema).parquet(inDir.toString)
          .withColumn("ts_us", tsMicrosOf(schema("ts").dataType))
          .select("user_id", "event_type", "event_id", "ts_us")
          .as[graft.streaming.StatefulOps.Keyed]
        val out = graft.streaming.StatefulOps.firstSeen(stream)
        val name = "graft_stateful_sink"
        s.catalog.dropTempView(name)
        val q = out.writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name).select("user_id", "event_type", "event_id", "ts_us")
          .orderBy("user_id", "event_type")
      },
      """SELECT user_id, event_type, event_id, epoch_ns(ts)//1000 AS ts_us
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts ASC, event_id ASC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    // PII redaction pass over a corpus with planted emails/numbers/IPs.
    "q57_redact" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "documents")
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact bob@example.com at 12345678901 or 10.0.0.1")))
            .otherwise(col("text")))
          .select(col("doc_id"), TextAnalysis.redact(col("text")).as("clean"))
          .filter(col("clean").contains("<EMAIL>") || col("clean").contains("<NUM>") ||
            col("clean").contains("<IP>"))
          .orderBy("doc_id"),
      raw"""SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' contact bob@example.com at 12345678901 or 10.0.0.1' ELSE text END,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\d{7,}', '<NUM>', 'g') AS clean
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin)),

    // Corpus word frequencies (explode + count — the vocabulary pass).
    "q52_word_freq" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word").asc)
          .limit(50),
      raw"""SELECT word, COUNT(*) AS n
        |FROM (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 50""".stripMargin)),

    // Document frequency per term (the TF-IDF denominator): distinct
    // per-doc terms, then per-term doc counts and total occurrences.
    "q53_doc_freq" -> ((
      (s: SparkSession, d: String) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
        toks.groupBy("word")
          .agg(countDistinct(col("doc_id")).as("doc_freq"), count(lit(1)).as("occurrences"))
          .orderBy("word")
      },
      raw"""SELECT word, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS occurrences
        |FROM (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin)),

    // Funnel: users whose first signup is later followed by a purchase,
    // with the conversion delay (sequence detection over event time).
    "q54_funnel" -> ((
      (s: SparkSession, d: String) => {
        val ev = events(s, d)
        val signup = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_ts"))
        val purchase = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us").as("p_ts"))
        signup.join(purchase, Seq("user_id"))
          .filter(col("p_ts") > col("signup_ts"))
          .groupBy("user_id", "signup_ts")
          .agg(min(col("p_ts")).as("first_purchase_ts"), count(lit(1)).as("n_purchases"))
          .withColumn("delay_us", col("first_purchase_ts") - col("signup_ts"))
          .orderBy("user_id")
      },
      """WITH s AS (
        |  SELECT user_id, MIN(epoch_ns(ts)//1000) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id AS user_id, signup_ts,
        |  MIN(p_ts) AS first_purchase_ts, COUNT(*) AS n_purchases,
        |  MIN(p_ts) - signup_ts AS delay_us
        |FROM s JOIN p ON s.user_id = p.user_id AND p_ts > signup_ts
        |GROUP BY s.user_id, signup_ts ORDER BY user_id""".stripMargin)),

    // Structured Streaming event-time windowed aggregation with watermark
    // (§2.9): tumbling 5-minute windows per event_type, drained with
    // AvailableNow into a memory sink in complete mode (deterministic
    // regardless of micro-batch boundaries).
    "q43_stream_window" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val base = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stream_w")
        val inDir = base.resolve("in")
        if (!Files.exists(inDir)) Files.createDirectories(inDir)
        Files.copy(Paths.get(d, "events.parquet"), inDir.resolve("events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val agg = s.readStream.schema(schema).parquet(inDir.toString)
          .withColumn("ts_t", timestamp_micros(tsMicrosOf(schema("ts").dataType)))
          .withWatermark("ts_t", "10 minutes")
          .groupBy(window(col("ts_t"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(Tables.dec2(col("value"))).cast("double").as("sum_value"))
        val name = "graft_win_sink"
        s.catalog.dropTempView(name) // rerun-safe within one session
        val q = agg.writeStream.outputMode("complete").format("memory")
          .queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
          .select(unix_timestamp(col("window.start")).as("win_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("win_start", "event_type")
      },
      """SELECT CAST(epoch(time_bucket(INTERVAL 5 MINUTES, CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin))
  )
}
