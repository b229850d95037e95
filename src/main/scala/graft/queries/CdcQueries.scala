package graft.queries

import java.nio.file.{Files, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{Envelope, Normalize}

/** CDC ingest-chain coverage (SURVEY.md §2.2 P1/P3, §2.6 F1, EP2) with
  * VALUES-literal oracles — the fixtures are generated in-process, so the
  * expected rows are fully known.
  */
object CdcQueries {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_cdc_q", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p.getParent)
    p.toString
  }

  val defs: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // P1: payload star-flatten keeps envelope columns alongside hoisted
    // payload fields (README.md:267).
    "q17_flatten" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        val flat = Normalize.flatten(Envelope.backfill(s))
        flat.select(col("pk_id"), col("name"), col("value"),
          col("read_method"), col("source_metadata.change_type").as("change_type"),
          col("payload.pk_id").as("payload_pk_id")) // struct retained post-flatten
          .orderBy("pk_id")
      },
      """SELECT * FROM (VALUES
        |  (1, 'apple',    10, 'mysql-backfill-fulldump', 'INSERT', 1),
        |  (2, 'samsung',  20, 'mysql-backfill-fulldump', 'INSERT', 2),
        |  (3, 'dell',     30, 'mysql-backfill-fulldump', 'INSERT', 3),
        |  (4, 'motorola', 40, 'mysql-backfill-fulldump', 'INSERT', 4)
        |) AS t(pk_id, name, value, read_method, change_type, payload_pk_id)
        |ORDER BY pk_id""".stripMargin)),

    // P3/F1: unix_timestamp with the reference's odd "MM-dd-yyyy HH:mm:ss"
    // pattern — ignored for TimestampType inputs, so epochs come out right
    // (README.md:270-273,360,370; the quirk SURVEY.md §4.3(6) pins).
    "q18_epochize" -> ((
      (s: SparkSession, d: String) => {
        graft.core.GraftSession.ensure(s)
        Normalize.ingest(Envelope.backfill(s))
          .select("pk_id", "updated_at", "created_at", "read_timestamp", "source_timestamp")
          .orderBy("pk_id")
      },
      """SELECT * FROM (VALUES
        |  (1, 1673496078, 1673496078, 1673496285, 1673496285),
        |  (2, 1673496078, 1673496078, 1673496285, 1673496285),
        |  (3, 1673496078, 1673496078, 1673496285, 1673496285),
        |  (4, 1673496080, 1673496080, 1673496285, 1673496285)
        |) AS t(pk_id, updated_at, created_at, read_timestamp, source_timestamp)
        |ORDER BY pk_id""".stripMargin)),

    // EP2: the Delta-notebook SQL flow — temp view + verbatim dedup-subquery
    // MERGE (J1/A1/S5/S11) — reaching the same golden final state.
    "q19_sql_merge" -> ((
      (s: SparkSession, d: String) => {
        val path = freshDir("delta_flow")
        graft.sql.Showcase.runDeltaFlow(s, path)
          .select(col("pk_id"), col("name"), col("value"),
            col("source_metadata.change_type").as("change_type"),
            unix_timestamp(col("updated_at")).as("updated_epoch"))
          .orderBy("pk_id")
      },
      """SELECT * FROM (VALUES
        |  (1, 'apple',    10,  'INSERT',        1673496078),
        |  (2, 'samsung',  201, 'UPDATE-INSERT', 1673496646),
        |  (3, 'dell',     30,  'DELETE',        1673496078),
        |  (4, 'motorola', 40,  'INSERT',        1673496080),
        |  (5, 'htc',      50,  'INSERT',        1673496638)
        |) AS t(pk_id, name, value, change_type, updated_epoch)
        |ORDER BY pk_id""".stripMargin))
  )
}
