package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis

/** The single-pass native [[graft.functions.TextStats]] expression must be
  * bit-identical to the column-per-stat builtin formulation it replaced
  * ([[TextAnalysis.statsSpec]]) — on the real corpus and on whitespace/
  * punctuation edge cases the corpus doesn't contain.
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  val fields = Seq("ws_tokens", "bpe_tokens", "n_stopwords", "n_punct",
    "quality", "fingerprint", "lang_guess")

  def assertSame(df: DataFrame): Unit = {
    val native = TextAnalysis.stats(df).select("doc_id", fields: _*)
      .collect().map(r => r.toSeq).sortBy(_.head.toString)
    val spec = TextAnalysis.statsSpec(df).select("doc_id", fields: _*)
      .collect().map(r => r.toSeq).sortBy(_.head.toString)
    assert(native.length == spec.length)
    native.zip(spec).foreach { case (n, s) =>
      assert(n == s, s"native $n != spec $s")
    }
  }

  test("native ≡ column-per-stat on the documents corpus") {
    assertSame(spark.read.parquet(s"$sf/documents.parquet"))
  }

  test("native ≡ column-per-stat on whitespace/punct/lang edge cases") {
    import spark.implicits._
    val edge = Seq(
      (1L, ""),
      (2L, " "),
      (3L, "   "),
      (4L, "\t"),
      (5L, "\tthe cat\t"),
      (6L, "the the the"),
      (7L, "el la de que los"),
      (8L, "der und die das ist"),
      (9L, "le la les des est"),
      (10L, "zzz qqq xxx"),
      (11L, "Hello, World! (How) [are] you; 'today'?"),
      (12L, "a  b\n\nc\td"),
      (13L, "!!!???...---"),
      (14L, "THE AND OF TO IS"),
      (15L, "1.5 + 2 = 3,5; x@y.z"),
      (16L, "la la la"), // es/fr tie → alphabetical priority (es)
      (17L, "the la der le")) // 4-way tie → de
      .toDF("doc_id", "text")
    assertSame(edge)
  }

  test("null text yields null stats in both formulations") {
    import spark.implicits._
    val df = Seq((1L, Option("abc")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val n = TextAnalysis.stats(df).filter(col("doc_id") === 2).select(fields.map(col): _*).head()
    assert((0 until fields.length).forall(n.isNullAt), s"expected all-null row, got $n")
  }
}
