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
}
