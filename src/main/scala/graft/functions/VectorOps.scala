package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built purely
  * from codegen'd higher-order functions (no UDFs — SURVEY.md §2.6). The
  * fold order is the list order, which keeps results bit-identical to the
  * DuckDB oracle's zipped-UNNEST SUM.
  */
object VectorOps {

  /** Cast a float vector to double element-wise (do this once, up front:
    * float accumulation drifts and is not oracle-reproducible). */
  def toDoubleVec(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product — the native codegen'd expression (see
    * [[DotProduct]]); same index-order fold as the builtin HOF version
    * ([[dotHof]]), so results are bit-identical. */
  def dot(a: Column, b: Column): Column = DotProduct.dotProduct(a, b)

  /** Builtin-only formulation (interpreted; kept as the semantic spec and
    * for cross-checking the native expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def normSq(a: Column): Column = dot(a, a)

  /** cosine(a,b) = dot / (sqrt(|a|²) * sqrt(|b|²)) — written exactly this
    * way in oracles too, so the floating-point op sequence matches. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine given precomputed squared norms (avoids recomputing per pair). */
  def cosinePre(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / (sqrt(normSqA) * sqrt(normSqB))

  /** Random-hyperplane signature for cosine LSH: `planes` is a literal
    * matrix (numPlanes × dim) generated deterministically on the driver;
    * the result packs sign bits into a long bucket id. */
  def hyperplaneSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0.0d, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic pseudo-random hyperplanes (driver-side, seeded). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
