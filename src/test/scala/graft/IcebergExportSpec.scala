package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}
import graft.sources.AvroSource

/** Iceberg-protocol snapshot export: `metadata/v1.metadata.json` +
  * manifest-list and manifest avro files per the public Iceberg v1 spec.
  * Verified by RECONSTRUCTING the table from nothing but the exported
  * metadata chain (json → manifest list avro → manifest avro → data
  * files) — the walk any Iceberg reader does — and comparing to
  * `read()`, plus structural asserts on the spec's required pieces. */
class IcebergExportSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_iexp").toString
  private val mapper = new ObjectMapper()

  /** Follow the metadata chain exactly as an Iceberg reader would. */
  private def readViaIceberg(tablePath: String): DataFrame = {
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tablePath/metadata/version-hint.text")), "UTF-8").trim
    val meta = mapper.readTree(new java.io.File(
      s"$tablePath/metadata/v$hint.metadata.json"))
    assert(meta.get("format-version").asInt == 1)
    val snapId = meta.get("current-snapshot-id").asLong
    val snap = {
      val it = meta.get("snapshots").elements()
      var found: com.fasterxml.jackson.databind.JsonNode = null
      while (it.hasNext) { val s = it.next(); if (s.get("snapshot-id").asLong == snapId) found = s }
      assert(found != null, "current-snapshot-id must resolve"); found
    }
    val listDf = AvroSource.read(spark, snap.get("manifest-list").asText)
    val manifests = listDf.select("manifest_path").collect().map(_.getString(0))
    assert(manifests.nonEmpty)
    // iceberg schema → data columns (partition column comes from the
    // manifest's partition record)
    val pfields = meta.get("partition-spec")
    val pname = if (pfields.size() > 0) Some(pfields.get(0).get("name").asText) else None
    val fieldIt = meta.get("schema").get("fields").elements()
    val names = Seq.newBuilder[String]
    while (fieldIt.hasNext) names += fieldIt.next().get("name").asText
    val allCols = names.result()
    val frames = manifests.toSeq.flatMap { m =>
      val entries = AvroSource.read(spark, m)
        .select(col("status"), col("data_file.file_path").as("fp"),
          col("data_file.record_count").as("rc"),
          (pname match {
            case Some(p) => col(s"data_file.partition.$p").cast("string")
            case None => lit(null).cast("string")
          }).as("pv"))
        .collect()
      entries.map { e =>
        assert(e.getInt(0) == 1, "entries are ADDED in a fresh snapshot")
        val dataCols = allCols.filterNot(pname.contains)
        var df = spark.read.parquet(e.getString(1))
          .select(dataCols.map(col): _*)
        pname.foreach(p => df = df.withColumn(p, lit(e.getString(3))))
        (df.select(allCols.map(col): _*), e.getLong(2))
      }
    }
    // record_count metadata must match the physical files
    frames.foreach { case (df, rc) => assert(df.count() == rc) }
    frames.map(_._1).reduce(_.unionByName(_))
  }

  test("an Iceberg reader's view of the export equals the engine's snapshot") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      TableSpec("k", "ver", partition = Some("g")),
      (1L to 400L).map(i => (i, 1L, s"v$i", s"g${i % 4}")).toDF("k", "ver", "v", "g"))
    t.upsert(Seq((3L, 2L, "updated", "g3"), (401L, 1L, "new", "g1"))
      .toDF("k", "ver", "v", "g"))
    val metaFile = LakeTable.load(spark, path).generateIcebergMetadata()
    assert(metaFile.endsWith("metadata/v1.metadata.json"))
    val fromMeta = readViaIceberg(path)
      .select("k", "ver", "v", "g").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    val direct = LakeTable.load(spark, path).read()
      .select("k", "ver", "v", "g").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    assert(fromMeta == direct, "the exported metadata must describe the exact snapshot")
    assert(fromMeta.exists(_._3 == "updated") && fromMeta.size == 401)
  }

  test("structural contract: v1 required fields, field-ids, spec'd avro metadata") {
    val path = tmp()
    LakeTable.create(spark, path, TableSpec("k", "ver", partition = Some("g")),
      (1L to 100L).map(i => (i, 1L, s"v$i", s"g${i % 3}")).toDF("k", "ver", "v", "g"))
      .generateIcebergMetadata()
    val meta = mapper.readTree(new java.io.File(s"$path/metadata/v1.metadata.json"))
    Seq("format-version", "table-uuid", "location", "last-updated-ms",
      "last-column-id", "schema", "partition-spec", "partition-specs",
      "default-spec-id", "current-snapshot-id", "snapshots", "snapshot-log",
      "sort-orders", "default-sort-order-id")
      .foreach(k => assert(meta.has(k), s"metadata.json must carry $k"))
    // identity partition spec on g with spec'd ids
    val pf = meta.get("partition-spec").get(0)
    assert(pf.get("name").asText == "g" && pf.get("transform").asText == "identity"
      && pf.get("field-id").asInt == 1000)
    assert(meta.get("last-partition-id").asInt == 1000)
    // schema fields carry sequential ids
    val ids = {
      val it = meta.get("schema").get("fields").elements()
      val b = Seq.newBuilder[Int]; while (it.hasNext) b += it.next().get("id").asInt
      b.result()
    }
    assert(ids == (1 to ids.size))
    // the manifest avro carries the spec'd file metadata keys and field-ids
    val listPath = meta.get("snapshots").get(0).get("manifest-list").asText
    val mPath = AvroSource.read(spark, listPath)
      .select("manifest_path").head().getString(0)
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      new java.io.File(mPath),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      Seq("schema", "partition-spec", "partition-spec-id", "format-version", "content")
        .foreach(k => assert(reader.getMetaString(k) != null, s"manifest must carry $k"))
      assert(reader.getMetaString("format-version") == "1")
      assert(reader.getMetaString("content") == "data")
      val sch = reader.getSchema
      assert(sch.getField("status").getObjectProp("field-id") == 0)
      val df = sch.getField("data_file")
      assert(df.getObjectProp("field-id") == 2)
      assert(df.schema().getField("file_path").getObjectProp("field-id") == 100)
      assert(df.schema().getField("block_size_in_bytes").getObjectProp("field-id") == 105)
    } finally reader.close()
  }

  test("SQL route, unpartitioned export, and refusals") {
    val s = MaintenanceSqlSessions.sql
    val path = tmp()
    val t = LakeTable.create(s, path, TableSpec("k", "ver"),
      { import s.implicits._; (1L to 50L).map(i => (i, 1L, s"v$i")).toDF("k", "ver", "v") })
    val out = s.sql(s"GENERATE iceberg_metadata FOR TABLE graft.`$path`")
      .head().getString(0)
    assert(out.endsWith("metadata/v1.metadata.json"))
    val got = readViaIceberg(path).select("k").orderBy("k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (1L to 50L))
    // refusal: outstanding MoR logs
    val mp = tmp()
    val m = LakeTable.create(spark, mp, TableSpec("k", "ver", mor = true),
      (1L to 20L).map(i => (i, 1L, s"v$i")).toDF("k", "ver", "v"))
    m.upsert(Seq((1L, 2L, "upd")).toDF("k", "ver", "v"))
    val e = intercept[IllegalArgumentException](m.generateIcebergMetadata())
    assert(e.getMessage.contains("compact"))
    // after compaction the export succeeds
    m.compact()
    LakeTable.load(spark, mp).generateIcebergMetadata()
    assert(readViaIceberg(mp).count() == 20)
  }
}
