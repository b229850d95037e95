package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata. The decode step is STUBBED (no image/audio libs in
  * this container — see `decodeStub`); everything Spark-side is real: the
  * schema contract, the batched per-partition execution shape (the Scala
  * analog of `mapInPandas`), and the partitioning strategy.
  */
object Multimodal {

  /** Media-asset schema: id + opaque payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Build a deterministic media table from the documents corpus (the text
    * bytes stand in for encoded image/audio payloads). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("fake/rgb8").as("format"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** Feature row produced per asset by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("content_md5", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", ArrayType(StringType, containsNull = false))))

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** STUB — a real pipeline decodes the payload with an image/audio codec
    * here. Deterministic fake: dimensions derived from payload length, a
    * "frame sample" of 4 per-chunk md5 digests (md5 so any engine can
    * recompute them — the q41 oracle does). The *shape* (bytes in → typed
    * features out, pure function, batch-friendly) is the real contract. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[String]) = {
    val n = payload.length
    val width = math.max(1, math.sqrt(n.toDouble).toInt)
    val height = math.max(1, n / math.max(1, width))
    val chunk = math.max(1, n / 4)
    val frames = (0 until 4).map { i =>
      md5Hex(payload.slice(i * chunk, math.min(n, (i + 1) * chunk)))
    }.toArray
    (width, height, frames)
  }

  /** Batched per-partition decode — the Scala analog of `mapInPandas`:
    * executors stream partitions through the (stubbed) decoder without
    * collecting anything; repartition count controls batch parallelism.
    * Output is a plain DataFrame with `featureSchema`. */
  def extractFeatures(media: DataFrame, parallelism: Int = 0): DataFrame = {
    val in = if (parallelism > 0) media.repartition(parallelism, col("media_id")) else media
    val enc = Encoders.row(featureSchema)
    in.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, frames) = decodeStub(payload)
        Row(id, payload.length.toLong, md5Hex(payload), w, h, frames.toSeq)
      }
    }(enc)
  }

  /** Declarative metadata pass over binary payloads using only builtins —
    * this part needs no stub and stays in whole-stage codegen. */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      length(col("payload")).cast(LongType).as("n_bytes"),
      hex(substring(col("payload"), 1, 8)).as("head_hex"),
      md5(col("payload")).as("payload_md5"))
}
