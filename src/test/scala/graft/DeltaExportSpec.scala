package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TableSpec}

/** Delta-protocol snapshot export: `_delta_log/…0.json` with protocol,
  * metaData (Spark schema JSON — the exact `schemaString` format Delta
  * uses), and one `add` per live file. Verified by RECONSTRUCTING the
  * table from nothing but the exported log and comparing to `read()`. */
class DeltaExportSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_dexp").toString
  private val mapper = new ObjectMapper()

  /** Parse the exported log and rebuild the snapshot DataFrame from only
    * its actions — the work any Delta reader does. */
  private def readViaDeltaLog(tablePath: String): DataFrame = {
    val src = scala.io.Source.fromFile(s"$tablePath/_delta_log/00000000000000000000.json")
    val lines = try src.getLines().toList finally src.close()
    val actions = lines.map(mapper.readTree)
    val metaData = actions.flatMap(a => Option(a.get("metaData"))).head
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(metaData.get("schemaString").asText)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val pcols = {
      val it = metaData.get("partitionColumns").elements()
      val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next().asText
      b.result()
    }
    val adds = actions.flatMap(a => Option(a.get("add")))
    val frames = adds.map { add =>
      val rel = java.net.URLDecoder.decode(add.get("path").asText, "UTF-8")
      val dataCols = schema.fields.filterNot(f => pcols.contains(f.name))
      var df = spark.read
        .schema(org.apache.spark.sql.types.StructType(dataCols))
        .parquet(s"$tablePath/$rel")
        .select(dataCols.map(f => col(f.name)).toIndexedSeq: _*)
      pcols.foreach { p =>
        val v = add.get("partitionValues").get(p)
        val raw = if (v == null || v.isNull) null else v.asText
        df = df.withColumn(p, lit(raw).cast(schema(p).dataType))
      }
      df.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
    frames.reduce(_.unionByName(_))
  }

  test("a Delta reader's view of the export equals the engine's snapshot") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      TableSpec("k", "ver", partition = Some("g")),
      (1L to 500L).map(i => (i, 1L, s"v$i", s"g${i % 5}")).toDF("k", "ver", "v", "g"))
    t.upsert(Seq((3L, 2L, "updated", "g3"), (501L, 1L, "new", "g1"))
      .toDF("k", "ver", "v", "g"))
    val logFile = LakeTable.load(spark, path).generateDeltaLog()
    assert(logFile.endsWith("_delta_log/00000000000000000000.json"))
    val fromLog = readViaDeltaLog(path)
      .select("k", "ver", "v", "g").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    val direct = LakeTable.load(spark, path).read()
      .select("k", "ver", "v", "g").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    assert(fromLog == direct, "the exported log must describe the exact snapshot")
    assert(fromLog.exists(_._3 == "updated") && fromLog.size == 501)
    // structural contract: exactly one protocol and one metaData
    val src = scala.io.Source.fromFile(logFile)
    val lines = try src.getLines().toList finally src.close()
    assert(lines.count(_.contains("\"protocol\"")) == 1)
    assert(lines.count(_.contains("\"metaData\"")) == 1)
    assert(lines.count(_.contains("\"add\"")) ==
      LakeTable.load(spark, path).liveFiles(None).size)
  }

  test("unpartitioned export, SQL route, and re-export sweeps stale logs") {
    val s = MaintenanceSqlSessions.sql
    import s.implicits._
    val path = tmp()
    LakeTable.create(s, path, TableSpec("k", "ver"),
      (1L to 100L).map(i => (i, 1L, i * 2)).toDF("k", "ver", "n"))
    val rows = s.sql(s"GENERATE delta_log FOR TABLE graft.`$path`").collect()
    assert(rows.length == 1 && rows(0).getString(0).contains("_delta_log"))
    assert(readViaDeltaLog(path).agg(sum("n")).head().getLong(0) == (1L to 100L).map(_ * 2).sum)
    // churn + re-export reflects the new snapshot
    LakeTable.load(s, path).delete(col("k") <= 50L)
    LakeTable.load(s, path).generateDeltaLog()
    assert(readViaDeltaLog(path).count() == 50)
  }

  test("refusals: MoR logs, DVs, mixed partition eras") {
    val path = tmp()
    val m = LakeTable.create(spark, path, TableSpec("k", "ver", mor = true),
      (1L to 50L).map(i => (i, 1L, s"v$i")).toDF("k", "ver", "v"))
    m.upsert(Seq((1L, 2L, "u")).toDF("k", "ver", "v"))
    intercept[IllegalArgumentException] {
      LakeTable.load(spark, path).generateDeltaLog()
    }
    val p2 = tmp()
    val t2 = LakeTable.create(spark, p2, TableSpec("k", "ver"),
      (1L to 50L).map(i => (i, 1L, s"v$i")).toDF("k", "ver", "v"))
    t2.deleteVectors(col("k") <= 5L)
    intercept[IllegalArgumentException] {
      LakeTable.load(spark, p2).generateDeltaLog()
    }
    val p3 = tmp()
    val t3 = LakeTable.create(spark, p3,
      TableSpec("k", "ver", partition = Some("a")),
      (1L to 50L).map(i => (i, 1L, s"a${i % 2}", s"b${i % 3}")).toDF("k", "ver", "a", "b"))
    t3.changePartition(Some("b"))
    LakeTable.load(spark, p3)
      .upsert(Seq((51L, 1L, "a0", "b0")).toDF("k", "ver", "a", "b"))
    intercept[IllegalArgumentException] {
      LakeTable.load(spark, p3).generateDeltaLog()
    }
    // compact migrates the layout; the export then succeeds
    LakeTable.load(spark, p3).compact()
    LakeTable.load(spark, p3).generateDeltaLog()
    assert(readViaDeltaLog(p3).count() == 51)
  }
}
