package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SQL registration for graft's native expressions, so `spark.sql` users
  * can call them directly:
  *
  * {{{
  * GraftFunctions.register(spark)
  * spark.sql("SELECT dot_product(a, b), word_shingles(text, 3) FROM t")
  * }}}
  *
  * Also injected by `graft.sql.GraftExtensions`.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def stringArrayArg(e: Expression, what: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
      items.map {
        case Literal(s: UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(s"$what needs string literals, got $other")
      }
    case other => throw new IllegalArgumentException(s"$what must be array('w1','w2',...), got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "word_shingles" -> (es => WordShingles(es(0), if (es.size > 1) intArg(es(1), "k") else 3)),
    "token_set_count" -> (es => TokenSetCount(es(0), stringArrayArg(es(1), "words"),
      lowercase = es.size > 2 && intArg(es(2), "lowercase") != 0)),
    // pmod(murmur3(key), n) — the bucketed-table layout rule, so SQL users
    // can compute a key's bucket / pre-cluster batches to a table's layout
    // (twin of the FunctionCatalog surface in graft.sources.GraftV2Functions)
    "graft_bucket" -> (es =>
      org.apache.spark.sql.catalyst.expressions.Pmod(
        new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(es(0))),
        es(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
