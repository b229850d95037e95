package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

class DotProductSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("native dot product is bit-identical to the builtin HOF fold") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.toDoubleVec(col("embedding")).as("v"))
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        VectorOps.dot(col("a.v"), col("b.v")).as("native"),
        VectorOps.dotHof(col("a.v"), col("b.v")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("nulls propagate, mismatched lengths use the shorter prefix") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
    val short = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0))).toDF("a", "b")
      .select(VectorOps.dot(col("a"), col("b"))).head().getDouble(0)
    assert(short == 11.0)
  }

  test("custom expressions callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  word_shingles('a b c d', 2) AS sh,
        |  token_set_count('the cat and the dog', array('the', 'and')) AS n""".stripMargin)
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(r.getInt(2) == 3)
  }

  test("codegen path actually engages (no fallback exception, plan executes)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(VectorOps.toDoubleVec(col("embedding")).as("v"))
    val scored = emb.select(VectorOps.dot(col("v"), col("v")).as("nsq"))
    assert(scored.agg(min("nsq")).head().getDouble(0) > 0.0)
  }
}
