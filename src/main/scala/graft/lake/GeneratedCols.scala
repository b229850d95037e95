package graft.lake

import java.util.Locale

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, GraftExpressionBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, IntegralDivide, Literal}
import org.apache.spark.sql.functions._

/** Generated-column machinery (Delta `GENERATED ALWAYS AS (expr)` analog):
  * write-side stamping/validation lives here, and so does the HIDDEN
  * PARTITIONING half — mapping a filter on the generation SOURCE column to
  * a filter on the generated partition column, through the transform.
  *
  * The mapping is sound only for transforms that are monotone
  * non-decreasing in exactly one source column: then `s >= v` implies
  * `g(s) >= g(v)` (and symmetrically for `<=` / `=` / `IN`), so per-file
  * partition values can be compared against `g(literal)` evaluated once at
  * plan time. [[monotonicSource]] recognizes a conservative allow-list —
  * `to_date`, `date_trunc`, `year`, zero-padded big-endian `date_format`
  * patterns, `timestamp_micros/millis/seconds`, `div` by a positive
  * constant, and casts — the same family Delta derives partition filters
  * for. Anything unrecognized still stamps and validates fine; it just
  * doesn't prune through the transform.
  */
object GeneratedCols {

  /** Stamp missing generated columns and VALIDATE caller-supplied ones
    * (null-safe equality over the whole batch, one aggregate pass — the
    * Delta contract: a writer may omit a generated column, but a value it
    * does supply must equal the generation expression). */
  def apply(df: DataFrame, generated: Map[String, String]): DataFrame = {
    if (generated.isEmpty) return df
    val (present, missing) =
      generated.partition { case (c, _) => df.columns.exists(_.equalsIgnoreCase(c)) }
    if (present.nonEmpty) {
      val names = present.keys.toSeq
      val aggs = names.map { c =>
        max(when(!(col(c) <=> expr(present(c))), lit(1)).otherwise(lit(0))).as(c)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val bad = names.zipWithIndex
        .filter { case (_, i) => !row.isNullAt(i) && row.getInt(i) == 1 }.map(_._1)
      require(bad.isEmpty,
        "generated column values diverge from their generation expression: " +
          bad.map(c => s"$c GENERATED ALWAYS AS (${present(c)})").mkString("; "))
    }
    missing.foldLeft(df) { case (d, (c, e)) => d.withColumn(c, expr(e)) }
  }

  /** The single source column of `genExpr` when the expression is a
    * recognized monotone-non-decreasing transform of it; None otherwise
    * (no pruning through the transform — never wrong, only less skipping). */
  def monotonicSource(spark: SparkSession, genExpr: String): Option[String] = {
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(genExpr)
      catch { case NonFatal(_) => return None }
    val attrs = parsed.collect { case a: UnresolvedAttribute => a.name }.distinct
    if (attrs.length != 1) return None

    def mono(e: Expression): Boolean = e match {
      case _: UnresolvedAttribute => true
      case _: Literal => true // constant subtree (affine shifts etc.)
      case c: Cast =>
        // numeric/temporal targets preserve order; a cast TO string does
        // not (lexicographic "10" < "9")
        (c.dataType match {
          case _: org.apache.spark.sql.types.NumericType => true
          case org.apache.spark.sql.types.DateType => true
          case org.apache.spark.sql.types.TimestampType => true
          case org.apache.spark.sql.types.TimestampNTZType => true
          case _ => false
        }) && mono(c.child)
      case d: IntegralDivide =>
        (d.right match {
          case Literal(v: Long, _) => v > 0
          case Literal(v: Int, _) => v > 0
          case _ => false
        }) && mono(d.left)
      case f: UnresolvedFunction =>
        f.nameParts.last.toLowerCase(Locale.ROOT) match {
          case "to_date" | "date" | "year" | "unix_date" | "unix_micros" |
               "unix_millis" | "unix_seconds" | "timestamp_micros" |
               "timestamp_millis" | "timestamp_seconds" =>
            f.arguments.length == 1 && mono(f.arguments.head)
          case "date_trunc" =>
            // date_trunc(unit, ts): unit literal, ts on the spine
            f.arguments.length == 2 &&
              f.arguments.head.isInstanceOf[Literal] && mono(f.arguments(1))
          case "date_format" =>
            // monotone only for zero-padded big-endian formats
            f.arguments.length == 2 && (f.arguments(1) match {
              case Literal(s, _) =>
                Set("yyyy", "yyyy-MM", "yyyy-MM-dd").contains(String.valueOf(s))
              case _ => false
            }) && mono(f.arguments.head)
          case _ => false
        }
      case _ => false
    }
    if (mono(parsed)) Some(attrs.head) else None
  }

  /** Evaluate the generation expression at a literal source value —
    * `g(v)` — normalized for the commit-log partition-stat compare:
    * numbers stay numbers, everything else becomes its hive-dir string
    * form (dates print as yyyy-MM-dd, matching stored partition values).
    * None when the literal doesn't fit or evaluation fails (skip pruning). */
  def evalAt(spark: SparkSession, genExpr: String, source: String,
      value: Any): Option[Any] = {
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(genExpr)
      val litV = Literal(value)
      val substituted = parsed.transform {
        case a: UnresolvedAttribute if a.name.equalsIgnoreCase(source) => litV
      }
      val out = spark.range(1)
        .select(GraftExpressionBridge.column(substituted).as("g")).head().get(0)
      out match {
        case null => None
        case n: java.lang.Number => Some(n)
        case other => Some(String.valueOf(other))
      }
    } catch { case NonFatal(_) => None }
  }

  /** Derive partition-column filters from source-column filters through the
    * transform. Inequalities relax to their non-strict image (`s > v` ⇒
    * `g(s) >= g(v)`); every derived filter is a pure ADDITION to the
    * conjunction, so pruning can only improve, never change results. */
  def derive(spark: SparkSession, partitionCol: String, genExpr: String,
      source: String,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    def g(v: Any): Option[Any] = evalAt(spark, genExpr, source, v)
    filters.flatMap {
      case EqualTo(c, v) if c.equalsIgnoreCase(source) =>
        g(v).map(EqualTo(partitionCol, _))
      case In(c, vs) if c.equalsIgnoreCase(source) && vs.nonEmpty =>
        val imgs = vs.toSeq.map(g)
        if (imgs.forall(_.isDefined)) Some(In(partitionCol, imgs.flatten.toArray))
        else None
      case GreaterThan(c, v) if c.equalsIgnoreCase(source) =>
        g(v).map(GreaterThanOrEqual(partitionCol, _))
      case GreaterThanOrEqual(c, v) if c.equalsIgnoreCase(source) =>
        g(v).map(GreaterThanOrEqual(partitionCol, _))
      case LessThan(c, v) if c.equalsIgnoreCase(source) =>
        g(v).map(LessThanOrEqual(partitionCol, _))
      case LessThanOrEqual(c, v) if c.equalsIgnoreCase(source) =>
        g(v).map(LessThanOrEqual(partitionCol, _))
      case _ => None
    }
  }
}
