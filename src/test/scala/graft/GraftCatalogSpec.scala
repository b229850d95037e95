package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Envelope, Normalize}
import graft.lake.{LakeTable, TableSpec}

/** DSv2 TableCatalog path (SURVEY §7.4): CREATE/SHOW/SELECT/INSERT/MERGE/
  * DROP against `graft.<ns>.<table>` identifiers resolve through
  * [[graft.sources.GraftCatalog]] — the reference's Spark-SQL DDL surface.
  */
class GraftCatalogSpec extends AnyFunSuite {

  lazy val warehouse: String = Files.createTempDirectory("graft_wh").toString

  lazy val spark: SparkSession = {
    SparkTestSession.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = graft.core.GraftSession.tune(
      SparkSession.builder().master("local[4]").appName("graft-catalog-test"), 4)
      .withExtensions(new graft.sql.GraftExtensions)
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("CREATE TABLE / INSERT INTO / SELECT round-trips through the catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("""CREATE TABLE graft.db.users (uid BIGINT, updated_at BIGINT, name STRING)
                 USING graft OPTIONS (key 'uid', precombine 'updated_at')""")
    spark.sql("INSERT INTO graft.db.users VALUES (1L, 10L, 'ada'), (2L, 10L, 'bob')")
    spark.sql("INSERT INTO graft.db.users VALUES (1L, 20L, 'ada2'), (3L, 10L, 'eve')")
    val rows = spark.sql("SELECT uid, name FROM graft.db.users ORDER BY uid")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "ada2"), (2L, "bob"), (3L, "eve")),
      "second INSERT upserts by key with precombine latest-wins")
    // meta columns are part of the catalog table schema
    val meta = spark.sql("SELECT _record_key FROM graft.db.users WHERE uid = 3").head()
    assert(meta.getString(0) == "3")
  }

  test("USE graft; SHOW TABLES works before any namespace is created") {
    spark.sql("USE graft")
    try {
      assert(spark.sql("SHOW TABLES").collect().isEmpty,
        "default namespace lists empty, not NoSuchNamespace")
    } finally spark.sql("USE spark_catalog.default")
  }

  test("SHOW TABLES and SHOW CREATE TABLE render the catalog table") {
    val tables = spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).toSet
    assert(tables.contains("users"))
    val ddl = spark.sql("SHOW CREATE TABLE graft.db.users").head().getString(0)
    assert(ddl.contains("graft.db.users") && ddl.contains("'key' = 'uid'"),
      s"unexpected DDL: $ddl")
  }

  test("filter + projection SELECT prunes through the catalog scan") {
    val one = spark.sql("SELECT name FROM graft.db.users WHERE uid = 2").collect()
    assert(one.map(_.getString(0)).toSeq == Seq("bob"))
  }

  test("VERSION AS OF time travel through the catalog") {
    val v = spark.sql("SELECT uid FROM graft.db.users VERSION AS OF 1").count()
    assert(v == 2, "version 1 = first INSERT only")
  }

  test("TIMESTAMP AS OF time travel (SQL, reader option, and API)") {
    import graft.lake.{LakeTable, TableSpec}
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_cat_tsasof").toString
    val t = LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "pc", "v"))
    val t0 = LakeTable.commitTimeMillis(t.commits.last.commitTime)
    Thread.sleep(20)
    t.upsert(Seq((3L, 1L, "c")).toDF("k", "pc", "v"))
    val t1 = LakeTable.commitTimeMillis(t.commits.last.commitTime)
    // API: newest commit at-or-before the instant
    assert(t.versionAt(t0) == 0L && t.versionAt(t1) == 1L)
    assert(t.versionAt((t0 + t1) / 2) == 0L, "between commits resolves backward")
    intercept[IllegalArgumentException](t.versionAt(t0 - 10000))
    // reader option (epoch millis and ISO string forms)
    assert(spark.read.format("graft").option("timestampAsOf", t0.toString)
      .load(path).count() == 2)
    val iso = java.time.Instant.ofEpochMilli(t0).toString
    assert(spark.read.format("graft").option("timestampAsOf", iso)
      .load(path).count() == 2)
    // SQL surface through the catalog (timestamps are session-UTC)
    spark.sql(s"CREATE TABLE graft.db.tsasof USING graft LOCATION '$path'")
    try {
      val tsLit = new java.sql.Timestamp(t0).toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString.replace('T', ' ')
      val old = spark.sql(
        s"SELECT k FROM graft.db.tsasof TIMESTAMP AS OF '$tsLit'").count()
      assert(old == 2, s"TIMESTAMP AS OF '$tsLit' must see version 0")
      assert(spark.sql("SELECT k FROM graft.db.tsasof").count() == 3)
    } finally spark.sql("DROP TABLE IF EXISTS graft.db.tsasof")
  }

  test("INSERT OVERWRITE replaces the table contents") {
    spark.sql("""CREATE TABLE graft.db.ow (k BIGINT, pc BIGINT, v STRING)
                 USING graft OPTIONS (key 'k', precombine 'pc')""")
    spark.sql("INSERT INTO graft.db.ow VALUES (1L, 1L, 'a'), (2L, 1L, 'b')")
    spark.sql("INSERT OVERWRITE graft.db.ow VALUES (9L, 1L, 'z')")
    val rows = spark.sql("SELECT k, v FROM graft.db.ow").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((9L, "z")))
  }

  test("external LOCATION table reads an existing graft table; DROP keeps data") {
    val path = Files.createTempDirectory("graft_ext").toString
    import spark.implicits._
    LakeTable.create(spark, path, TableSpec("k", "pc"),
      Seq((1, 1L, "x"), (2, 1L, "y")).toDF("k", "pc", "v"))
    spark.sql(s"CREATE TABLE graft.db.ext USING graft LOCATION '$path'")
    assert(spark.sql("SELECT k FROM graft.db.ext").count() == 2)
    spark.sql("DROP TABLE graft.db.ext")
    assert(LakeTable.load(spark, path).read().count() == 2, "external data survives DROP")
    assert(!spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("ext"))
  }

  test("MERGE INTO a catalog-identified table reaches the golden CDC state") {
    val path = Files.createTempDirectory("graft_cat_merge").toString
    Normalize.flatten(Envelope.backfill(spark)).write.format("graft")
      .option("key", "pk_id").option("precombine", "updated_at")
      .mode("overwrite").save(path)
    spark.sql(s"CREATE TABLE graft.db.merge_t USING graft LOCATION '$path'")
    Normalize.flatten(Envelope.cdc(spark)).createOrReplaceTempView("cat_cdc")
    spark.sql("""MERGE INTO graft.db.merge_t target USING (SELECT * FROM cat_cdc) source
                 ON source.pk_id == target.pk_id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val state = spark.sql("SELECT pk_id, name FROM graft.db.merge_t ORDER BY pk_id")
      .collect().map(r => (r.get(0).toString, r.getString(1))).toSeq
    val golden = LakeTable.load(spark, path).read()
      .select("pk_id", "name").orderBy("pk_id")
      .collect().map(r => (r.get(0).toString, r.getString(1))).toSeq
    assert(state == golden && state.nonEmpty)
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema additively") {
    spark.sql("""CREATE TABLE graft.db.evo (k BIGINT, pc BIGINT, v STRING)
                 USING graft OPTIONS (key 'k', precombine 'pc')""")
    spark.sql("INSERT INTO graft.db.evo VALUES (1L, 1L, 'a')")
    spark.sql("ALTER TABLE graft.db.evo ADD COLUMNS (tag STRING)")
    val pre = spark.sql("SELECT tag FROM graft.db.evo WHERE k = 1").head()
    assert(pre.isNullAt(0), "pre-evolution rows surface null for the new column")
    spark.sql("INSERT INTO graft.db.evo VALUES (2L, 1L, 'b', 'new')")
    val rows = spark.sql("SELECT k, v, tag FROM graft.db.evo ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some("new"))))
  }

  test("ALTER TABLE RENAME/DROP COLUMN are metadata-only through the catalog") {
    spark.sql("""CREATE TABLE graft.db.cmap (k BIGINT, pc BIGINT, v STRING, x BIGINT)
                 USING graft OPTIONS (key 'k', precombine 'pc')""")
    spark.sql("INSERT INTO graft.db.cmap VALUES (1L, 1L, 'a', 10L), (2L, 1L, 'b', 20L)")
    spark.sql("ALTER TABLE graft.db.cmap RENAME COLUMN v TO label")
    val r = spark.sql("SELECT k, label FROM graft.db.cmap ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(r == Seq((1L, "a"), (2L, "b")))
    spark.sql("ALTER TABLE graft.db.cmap DROP COLUMN x")
    assert(!spark.table("graft.db.cmap").columns.contains("x"))
    spark.sql("INSERT INTO graft.db.cmap VALUES (3L, 1L, 'c')")
    val all = spark.sql("SELECT k, label FROM graft.db.cmap ORDER BY k").collect()
    assert(all.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.cmap RENAME COLUMN k TO kk")
    }
    assert(e.getMessage.contains("key"))
  }

  test("DELETE FROM removes matching rows through the catalog") {
    spark.sql("""CREATE TABLE graft.db.del (k BIGINT, pc BIGINT, v STRING)
                 USING graft OPTIONS (key 'k', precombine 'pc')""")
    spark.sql("INSERT INTO graft.db.del VALUES (1L,1L,'a'), (2L,1L,'b'), (3L,1L,'c')")
    spark.sql("DELETE FROM graft.db.del WHERE k = 2 OR v = 'c'")
    val left = spark.sql("SELECT k FROM graft.db.del").collect().map(_.getLong(0)).toSet
    assert(left == Set(1L))
  }

  test("CREATE TABLE AS SELECT materializes through the catalog") {
    spark.sql("""CREATE TABLE graft.db.ctas USING graft
                 OPTIONS (key 'k', precombine 'pc')
                 AS SELECT CAST(id AS BIGINT) AS k, 1L AS pc,
                           concat('v', id) AS v FROM range(5)""")
    val rows = spark.sql("SELECT k, v FROM graft.db.ctas ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == (0 until 5).map(i => (i.toLong, s"v$i")))
  }

  test("managed DROP TABLE removes the table; recreate works") {
    spark.sql("""CREATE TABLE graft.db.tmp (k BIGINT, pc BIGINT) USING graft
                 OPTIONS (key 'k', precombine 'pc')""")
    spark.sql("INSERT INTO graft.db.tmp VALUES (1L, 1L)")
    spark.sql("DROP TABLE graft.db.tmp")
    assert(!spark.catalog.tableExists("graft.db.tmp"))
    spark.sql("""CREATE TABLE graft.db.tmp (k BIGINT, pc BIGINT) USING graft
                 OPTIONS (key 'k', precombine 'pc')""")
    assert(spark.sql("SELECT * FROM graft.db.tmp").count() == 0)
  }

  test("CREATE TABLE carries bloom/writeSort/sum column options into the spec") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("""CREATE TABLE graft.db.opts (k BIGINT, pc BIGINT, tag STRING, n BIGINT)
                 USING graft
                 OPTIONS (key 'k', precombine 'pc', bloomColumns 'tag',
                          writeSortColumns 'n', sumColumns 'n')""")
    val path = s"$warehouse/db/opts"
    val sp = LakeTable.load(spark, path).spec
    assert(sp.bloomColumns == Seq("tag"))
    assert(sp.writeSortColumns == Seq("n"))
    assert(sp.sumColumns == Seq("n"))
    spark.sql("INSERT INTO graft.db.opts VALUES (1L, 1L, 'a', 10L), (2L, 1L, 'b', 20L)")
    assert(spark.sql("SELECT SUM(n) FROM graft.db.opts").head().getLong(0) == 30L)
    spark.sql("DROP TABLE graft.db.opts")
  }

  test("FunctionCatalog: catalog-qualified functions resolve and match engine twins") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    // discoverable
    val listed = spark.sql("SHOW FUNCTIONS IN graft.db")
      .collect().map(_.getString(0)).toSet
    assert(Seq("dot_product", "graft_bucket", "ws_token_count")
      .forall(f => listed.exists(_.endsWith(f))), s"listed: $listed")
    // dot_product ≡ the HOF formulation / native expression (index fold)
    val dp = spark.sql(
      """SELECT graft.db.dot_product(CAST(array(1.5, 2.0, -3.25) AS array<double>),
        |                            CAST(array(4.0, 0.5, 2.0) AS array<double>))""".stripMargin)
      .head().getDouble(0)
    assert(dp == 1.5 * 4.0 + 2.0 * 0.5 + (-3.25) * 2.0)
    // graft_bucket ≡ pmod(hash(k), n) — the bucketed-table layout rule
    val got = spark.sql(
      """SELECT k, graft.db.graft_bucket(k, 8) AS b,
        |       pmod(hash(k), 8) AS expect
        |FROM VALUES (1L), (2L), (77L), (-5L), (123456789L) AS t(k)""".stripMargin)
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2), s"bucket mismatch: $r"))
    // ws_token_count ≡ size(split(trim(s), '\s+')) incl. the empty edge
    val tc = spark.sql(
      raw"""SELECT s, graft.db.ws_token_count(s) AS n,
           |       size(split(trim(s), '\\s+')) AS expect
           |FROM VALUES (' a  b c '), (''), ('  '), ('one') AS t(s)""".stripMargin)
      .collect()
    tc.foreach(r => assert(r.getInt(1) == r.getInt(2), s"token count mismatch: $r"))
    // nulls flow through as nulls
    assert(spark.sql("SELECT graft.db.ws_token_count(CAST(NULL AS STRING))")
      .head().isNullAt(0))
    // unknown function fails loudly
    val err = intercept[Exception](
      spark.sql("SELECT graft.db.no_such_fn(1)").collect())
    assert(err.getMessage.toLowerCase.contains("no_such_fn"))
  }
}
