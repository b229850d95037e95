package graft.sql

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.LakeTable

/** SQL table-valued-function surface for the change data feed — the Delta
  * `table_changes` parity piece (the reference's Delta workflow reads CDF
  * in SQL; graft's [[LakeTable.changes]] was API-only before this):
  *
  * {{{
  * SELECT * FROM table_changes('events', 2)          -- (v2, latest]
  * SELECT * FROM table_changes('events', 2, 5)       -- (v2, v5]
  * SELECT * FROM table_changes('/path/to/table', 0)  -- by path
  * SELECT * FROM table_changes('t', TIMESTAMP '2026-01-01 00:00:00')
  * }}}
  *
  * [[GraftExtensions]] registers the function in the session's TABLE
  * function registry (`injectTableFunction`), so Spark's own
  * `ResolveFunctions` resolves it like a builtin TVF — the builder returns
  * the analyzed plan of `LakeTable.changes(since, end)`. Version bounds
  * follow the `changes` API: the window is `(since, end]`. A timestamp
  * argument resolves through [[LakeTable.versionAt]] (the newest commit
  * at-or-before it), like `TIMESTAMP AS OF`.
  *
  * The rewrite happens at analysis time on the driver; the resulting plan
  * is the ordinary distributed CDF read (cost ∝ window churn, never table
  * size), composable with any surrounding SQL — joins, filters and
  * aggregates over the feed all plan through Catalyst as usual.
  */
object GraftTableChanges {

  val NAME = "table_changes"
  /** Delta's path-addressed twin: the first argument is ALWAYS a table
    * path, never a catalog name. */
  val BY_PATH_NAME = "table_changes_by_path"

  /** TVF builder: literal args → the CDF read's analyzed plan. Argument
    * errors throw eagerly with the offending statement shape — the function
    * is registry-claimed, so there is no later resolver to defer to. */
  def plan(session: SparkSession, args: Seq[Expression],
      byPath: Boolean = false): LogicalPlan = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"table_changes(table, since[, end]): $why " +
        s"(got ${args.map(_.sql).mkString("(", ", ", ")")})")
    val (tableArg, sinceArg, endArg) = args match {
      case Seq(t, s) => (t, s, None)
      case Seq(t, s, e) => (t, s, Some(e))
      case _ => fail("takes 2 or 3 arguments")
    }
    val name = stringArg(tableArg).getOrElse(
      fail("the first argument must be a table name or path string literal"))
    val table = loadGraft(session, name, byPath).getOrElse(
      fail(s"'$name' is not a graft table"))
    val since = versionArg(table, sinceArg).getOrElse(
      fail("`since` must be a version number or timestamp literal"))
    val end = endArg.map(e => versionArg(table, e).getOrElse(
      fail("`end` must be a version number or timestamp literal")))
    table.changes(since, end).queryExecution.analyzed
  }

  private def stringArg(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) => Some(s.toString)
    case _ => None
  }

  /** A version bound: integer literal = version number; timestamp or
    * timestamp-shaped string literal = the newest version at-or-before it
    * (`TIMESTAMP AS OF` semantics via [[LakeTable.versionAt]]). */
  private def versionArg(t: LakeTable, e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case Literal(micros: Long, TimestampType) => Some(t.versionAt(micros / 1000L))
    case Literal(s: UTF8String, StringType) =>
      val txt = s.toString
      Try(txt.toLong).toOption.orElse(
        Try(java.sql.Timestamp.valueOf(txt).getTime).toOption.map(t.versionAt))
    case _ => None
  }

  /** The target resolves only when it IS a graft table: a path-shaped
    * string (or any string via the by-path function) loads directly, a
    * bare identifier goes through the session catalog's provider check. */
  private def loadGraft(session: SparkSession, name: String,
      byPath: Boolean): Option[LakeTable] = {
    val target = if (byPath || name.contains("/")) s"'$name'" else name
    Try(GraftSqlParser.resolveTable(session, target)).toOption
  }
}

/** Standalone-resolution twin of the registry entry, for sessions built
  * WITHOUT GraftExtensions (the driver's Verify session): apply this rule to
  * a parsed plan and the `table_changes` TVF nodes resolve exactly as the
  * registered function would. Non-matching nodes pass through untouched. */
case class ResolveGraftTableChanges(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u: UnresolvedTableValuedFunction
        if u.name.length == 1 && u.name.head.equalsIgnoreCase(GraftTableChanges.NAME) =>
      GraftTableChanges.plan(session, u.functionArgs)
    case u: UnresolvedTableValuedFunction
        if u.name.length == 1 &&
          u.name.head.equalsIgnoreCase(GraftTableChanges.BY_PATH_NAME) =>
      GraftTableChanges.plan(session, u.functionArgs, byPath = true)
  }
}
