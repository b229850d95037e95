package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.catalog.UnresolvedCatalogRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.lake.LakeTable
import graft.sources.GraftRelation

/** SQL `MERGE INTO` for graft tables (SURVEY.md §7.4 stretch, S11/EP2):
  * a SparkSessionExtensions resolution rule rewrites `MergeIntoTable`
  * targeting a graft table into a runnable command backed by
  * `LakeTable.upsert` — the same statement shape the reference runs on
  * Delta (`/root/reference/README.md:1213-1224`):
  *
  * {{{
  * spark.sql("""MERGE INTO delta_table target USING (…) source
  *              ON source.pk_id == target.pk_id
  *              WHEN MATCHED THEN UPDATE SET *
  *              WHEN NOT MATCHED THEN INSERT *""")
  * }}}
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.sql.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`. Supported shape: equality merge
  * condition on the table's record key, `UPDATE SET *` / `INSERT *`
  * actions (exactly the reference's usage — precombine semantics decide
  * matched-row survival, so UPDATE and INSERT both route through upsert).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => ResolveGraftMerge)
    graft.functions.GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
  }
}

object ResolveGraftMerge extends Rule[LogicalPlan] {
  // Fire as soon as the TARGET is recognizable as graft — before the main
  // batch's star expansion runs (it would try to assign the target's meta
  // columns from the source and fail). The source plan is captured as-is,
  // possibly unresolved; execution re-analyzes it via Dataset.ofRows.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if graftPath(m.targetTable).isDefined =>
      val path = graftPath(m.targetTable).get
      val matchedOk = m.matchedActions match {
        case Seq(UpdateStarAction(None)) => true
        case _ => false
      }
      val notMatchedOk = m.notMatchedActions match {
        case Seq(InsertStarAction(None)) => true
        case _ => false
      }
      if (!matchedOk || !notMatchedOk || m.notMatchedBySourceActions.nonEmpty)
        throw new UnsupportedOperationException(
          "graft MERGE supports exactly: WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT * (the reference's shape)")
      GraftMergeCommand(path, m.sourceTable, keyName(m.mergeCondition))
  }

  /** The merge condition must be a single equality; both sides must name
    * the same column (the record key is validated at run time). */
  private def keyName(cond: Expression): String = cond match {
    case EqualTo(l, r) =>
      val ln = attrName(l)
      val rn = attrName(r)
      if (ln.isEmpty || ln != rn)
        throw new UnsupportedOperationException(
          s"graft MERGE needs ON source.<key> = target.<key>, got $cond")
      ln.get
    case other =>
      throw new UnsupportedOperationException(
        s"graft MERGE needs a single equality merge condition, got $other")
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last.toLowerCase)
    case a: Attribute => Some(a.name.toLowerCase)
    case _ => None
  }

  private def graftPath(t: LogicalPlan): Option[String] = t match {
    case SubqueryAlias(_, child) => graftPath(child)
    case UnresolvedCatalogRelation(tbl, _, _) if tbl.provider.exists(_.equalsIgnoreCase("graft")) =>
      tbl.storage.locationUri.map(u => new Path(u).toString)
    case LogicalRelation(rel: GraftRelation, _, _, _, _) => Some(rel.path)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t2: graft.sources.GraftCatalogTable => Some(t2.path)
        case _ => None
      }
    case _ => None
  }
}

/** Eagerly-executed MERGE: materializes the (already analyzed) source plan
  * and runs the keyed upsert. */
case class GraftMergeCommand(path: String, source: LogicalPlan, key: String)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val table = LakeTable.load(spark, path)
    require(table.spec.key.equalsIgnoreCase(key),
      s"MERGE condition column '$key' is not the table key '${table.spec.key}'")
    table.upsert(GraftExpressionBridge.ofRows(spark, source))
    Seq.empty
  }
}
