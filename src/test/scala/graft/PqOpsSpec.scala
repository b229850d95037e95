package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity
import graft.functions.{PqOps, VectorOps}
import graft.functions.VectorOps.{dot, toDoubleVec}

/** The native PQ expressions (PqLut / PqEncode — codebook as a reference
  * object, constant codegen size) must stay BIT-identical to the literal
  * dot(slice(...)) chains they replaced: the q88/q129/q144 oracle hashes
  * were pinned against the chain formulation.
  */
class PqOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def fixture(m: Int, ks: Int) = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("cv"))
    val dim = emb.select(size(col("cv"))).head().getInt(0)
    val sub = dim / m
    val cws: Array[Array[Seq[Double]]] = {
      val rnd = new java.util.Random(7)
      Array.fill(m)(Array.fill(ks)(Seq.fill(sub)(rnd.nextGaussian())))
    }
    (emb, sub, cws)
  }

  test("PqLut is bit-identical to the dot(slice(...)) literal chain") {
    val m = 8; val ks = 16
    val (emb, sub, cws) = fixture(m, ks)
    def chain(qv: Column): Column =
      array((for { j <- 0 until m; cI <- 0 until ks } yield
        dot(slice(qv, j * sub + 1, sub), array(cws(j)(cI).map(lit): _*))): _*)
    val bad = emb
      .select(PqOps.lut(col("cv"), cws, ks, sub).as("native"),
        chain(col("cv")).as("chain"))
      .filter(col("native") =!= col("chain"))
    assert(bad.count() == 0)
  }

  test("PqEncode is bit-identical to the pqCode argmin literal chain") {
    val m = 8; val ks = 16
    val (emb, sub, cws) = fixture(m, ks)
    val cnorm = Similarity.pqNormLut(cws, m, ks)
    val codeFor = Similarity.pqCode(cws, cnorm, sub, ks) _
    val bad = emb
      .select(PqOps.encode(col("cv"), cws, cnorm, ks, sub).as("native"),
        array((0 until m).map(j => codeFor(col("cv"), j)): _*).as("chain"))
      .filter(col("native") =!= col("chain"))
    assert(bad.count() == 0)
  }

  test("ties keep the lowest code, NaN distances never displace a real one") {
    import spark.implicits._
    // two identical codewords -> argmin tie -> code 0 must win
    val cws: Array[Array[Seq[Double]]] = Array(Array(Seq(1.0, 0.0), Seq(1.0, 0.0),
      Seq(Double.NaN, Double.NaN), Seq(0.5, 0.5)))
    val cnorm = Similarity.pqNormLut(cws, 1, 4)
    val df = Seq(Tuple1(Seq(1.0, 0.0)), Tuple1(Seq(0.4, 0.6))).toDF("cv")
    val codes = df.select(PqOps.encode(col("cv"), cws, cnorm, 4, 2)).collect()
      .map(_.getSeq[Int](0))
    assert(codes(0) == Seq(0))
    // chain semantics cross-check on the same rows
    val codeFor = Similarity.pqCode(cws, cnorm, 2, 4) _
    val chain = df.select(array(codeFor(col("cv"), 0))).collect().map(_.getSeq[Int](0))
    assert(codes.toSeq == chain.toSeq)
  }

  test("interpreted eval matches codegen") {
    val m = 4; val ks = 8
    val (emb, sub, cws) = fixture(m, ks)
    val cnorm = Similarity.pqNormLut(cws, m, ks)
    val rows = emb.limit(32).collect().map(_.getSeq[Double](1))
    val viaDf = emb.limit(32)
      .select(col("vec_id"), PqOps.lut(col("cv"), cws, ks, sub).as("l"),
        PqOps.encode(col("cv"), cws, cnorm, ks, sub).as("c"))
      .orderBy("vec_id").collect()
    val flat = cws.flatMap(_.flatMap(_.toArray))
    val cn = cnorm.toArray
    viaDf.zip(emb.limit(32).orderBy("vec_id").collect()).foreach { case (got, src) =>
      val qv = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        src.getSeq[Double](1).toArray)
      val wantL = graft.functions.PqLutRuntime.lut(qv, flat, m, ks, sub).toDoubleArray()
      val wantC = graft.functions.PqLutRuntime.encode(qv, flat, cn, m, ks, sub).toIntArray()
      assert(got.getSeq[Double](1).toArray.sameElements(wantL))
      assert(got.getSeq[Int](2).toArray.sameElements(wantC))
    }
  }
}
