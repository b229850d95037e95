package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Sketch
import graft.functions.UnicodeNorm.unicodeNorm

/** Count-Min sketch guarantees and Unicode normalization semantics. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("CMS estimates are one-sided: est >= exact for every candidate token") {
    val exact = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact"))
    val cms = Sketch.cmsBuild(docs, depth = 4, width = 256)
    val joined = Sketch.cmsEstimates(cms, exact.select("tok"))
      .join(exact, Seq("tok"))
      .select(col("tok"), col("est"), col("exact")).collect()
    assert(joined.nonEmpty)
    val under = joined.filter(r => r.getLong(1) < r.getLong(2))
    assert(under.isEmpty, s"CMS underestimated: ${under.take(5).mkString(", ")}")
  }

  test("CMS total mass per sketch row equals the corpus token count") {
    val n = docs.select(explode(split(trim(col("text")), "\\s+"))).count()
    val rows = Sketch.cmsBuild(docs, depth = 4, width = 256)
      .cells.groupBy("seed").agg(sum("cnt").as("mass"))
      .collect().map(r => r.getLong(1))
    assert(rows.length == 4 && rows.forall(_ == n),
      s"per-row mass ${rows.toSeq} != token count $n")
  }

  test("CMS with ample width is exact on this corpus (deterministic md5 buckets)") {
    val exact = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact"))
    val cms = Sketch.cmsBuild(docs, depth = 4, width = 65536)
    val mismatched = Sketch.cmsEstimates(cms, exact.select("tok"))
      .join(exact, Seq("tok"))
      .filter(col("est") =!= col("exact")).count()
    assert(mismatched == 0)
  }

  test("unknown candidate tokens estimate to collision mass only (>= 0, never null)") {
    val cms = Sketch.cmsBuild(docs, depth = 4, width = 256)
    val est = Sketch.cmsEstimates(cms,
        Seq("zzqx_never_in_corpus_1", "zzqx_never_in_corpus_2").toDF("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(est.length == 2 && est.forall(_._2 >= 0L))
  }

  test("NFC composes decomposed sequences; already-NFC text is returned untouched") {
    val rows = Seq(
      ("é", "é"),          // combining acute -> precomposed
      ("Å", "Å"),          // combining ring
      ("naïve", "naïve"),  // mid-word diaeresis
      ("plain ascii", "plain ascii"),
      ("é", "é")                 // idempotent on composed input
    ).toDF("s", "expected")
    val got = rows.select(unicodeNorm(col("s"), "NFC").as("n"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"NFC(${r.getString(1)}) produced ${r.getString(0)}"))
  }

  test("NFKC folds compatibility forms (ligature, fullwidth); NFD decomposes") {
    val nfkc = Seq(("ﬁle", "file"), ("Ｆｕｌｌ", "Full")).toDF("s", "expected")
      .select(unicodeNorm(col("s"), "NFKC").as("n"), col("expected")).collect()
    nfkc.foreach(r => assert(r.getString(0) == r.getString(1)))
    val nfd = Seq(("é", "é")).toDF("s", "expected")
      .select(unicodeNorm(col("s"), "NFD").as("n"), col("expected")).collect()
    nfd.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("normalization is null-safe and non-BMP-safe") {
    val out = Seq((1L, Option("🦀 é")), (2L, Option.empty[String]))
      .toDF("id", "s")
      .select(col("id"), unicodeNorm(col("s"), "NFC").as("n"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "🦀 é") // crab + composed e-acute
    assert(out(1).isNullAt(1))
  }

  test("unknown normalization form is rejected at column construction") {
    intercept[IllegalArgumentException] { unicodeNorm(col("x"), "NFX") }
  }
}
