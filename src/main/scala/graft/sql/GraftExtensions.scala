package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.catalog.UnresolvedCatalogRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, lit, when, xxhash64}

import graft.lake.LakeTable
import graft.sources.GraftRelation

/** SQL `MERGE INTO` for graft tables (SURVEY.md §7.4 stretch, S11/EP2):
  * a SparkSessionExtensions resolution rule rewrites `MergeIntoTable`
  * targeting a graft table into a runnable command backed by
  * `LakeTable.upsert`/`deleteKeys` — the statement shape the reference runs
  * on Delta (`/root/reference/README.md:1213-1224`) plus the clauses a
  * Delta user reaches for next:
  *
  * {{{
  * MERGE INTO t target USING (…) source ON source.pk_id == target.pk_id
  * WHEN MATCHED AND source.is_deleted THEN DELETE
  * WHEN MATCHED THEN UPDATE SET name = source.name       -- column-level
  * WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED AND source.value > 0 THEN INSERT *
  * }}}
  *
  * Clauses apply first-match-wins per row (standard MERGE semantics). The
  * merge condition must include `source.<key> = target.<key>` on the
  * table's record key — graft MERGE is keyed, which is what makes the
  * write a stats-pruned touched-file upsert instead of a full rewrite.
  * Enable with
  * `.config("spark.sql.extensions", "graft.sql.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => ResolveGraftMerge)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftTableChanges.NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftTableChanges.NAME),
      args => GraftTableChanges.plan(SparkSession.active, args)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftTableChanges.BY_PATH_NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftTableChanges.BY_PATH_NAME),
      args => GraftTableChanges.plan(SparkSession.active, args, byPath = true)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftMetadataTvfs.FILES_NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftMetadataTvfs.FILES_NAME),
      args => GraftMetadataTvfs.filesPlan(SparkSession.active, args)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftMetadataTvfs.HISTORY_NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftMetadataTvfs.HISTORY_NAME),
      args => GraftMetadataTvfs.historyPlan(SparkSession.active, args)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftMetadataTvfs.PARTITIONS_NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftMetadataTvfs.PARTITIONS_NAME),
      args => GraftMetadataTvfs.partitionsPlan(SparkSession.active, args)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftIndexTvfs.TEXT_NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftIndexTvfs.TEXT_NAME),
      args => GraftIndexTvfs.textPlan(SparkSession.active, args)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftIndexTvfs.VECTOR_NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftIndexTvfs.VECTOR_NAME),
      args => GraftIndexTvfs.vectorPlan(SparkSession.active, args)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftMvTvf.NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftMvTvf.NAME),
      args => GraftMvTvf.plan(SparkSession.active, args)))
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(GraftMvTvf.FRESHNESS_NAME),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft", GraftMvTvf.FRESHNESS_NAME),
      args => GraftMvTvf.freshnessPlan(SparkSession.active, args)))
    e.injectOptimizerRule(_ => GraftMetadataOnlyCount)
    e.injectOptimizerRule(_ => GraftMvRewrite)
    e.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    graft.functions.GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
  }
}

/** A matched/not-matched clause, first-match-wins in declaration order. */
private[sql] sealed trait GraftMergeAction extends Serializable {
  def condition: Option[Expression]
}
private[sql] case class GraftUpdateStar(condition: Option[Expression]) extends GraftMergeAction
private[sql] case class GraftUpdateSet(condition: Option[Expression],
    assignments: Seq[(String, Expression)]) extends GraftMergeAction
private[sql] case class GraftDelete(condition: Option[Expression]) extends GraftMergeAction
private[sql] case class GraftInsertStar(condition: Option[Expression]) extends GraftMergeAction

object ResolveGraftMerge extends Rule[LogicalPlan] {
  // Fire as soon as the TARGET is recognizable as graft — before the main
  // batch's star expansion runs (it would try to assign the target's meta
  // columns from the source and fail). The source plan is captured as-is,
  // possibly unresolved; execution re-analyzes it via Dataset.ofRows.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if graftPath(m.targetTable).isDefined =>
      val path = graftPath(m.targetTable).get
      val bySource = m.notMatchedBySourceActions.map {
        case UpdateAction(cond, assigns, false) =>
          GraftUpdateSet(cond, assigns.map(a => (assignName(a.key), a.value)))
        case DeleteAction(cond) => GraftDelete(cond)
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED BY SOURCE action for graft MERGE: $other " +
            "(UPDATE SET <col> = <expr> and DELETE only — there is no source row)")
      }
      val matched = m.matchedActions.map {
        case UpdateStarAction(cond) => GraftUpdateStar(cond)
        case UpdateAction(cond, assigns, _) =>
          GraftUpdateSet(cond, assigns.map(a => (assignName(a.key), a.value)))
        case DeleteAction(cond) => GraftDelete(cond)
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN MATCHED action for graft MERGE: $other")
      }
      val notMatched = m.notMatchedActions.map {
        case InsertStarAction(cond) => GraftInsertStar(cond)
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED action for graft MERGE: $other " +
            "(use INSERT *)")
      }
      (matched, notMatched, bySource) match {
        // the reference's exact shape keeps its join-free fast path: the
        // upsert alone IS the merge
        case (Seq(GraftUpdateStar(None)), Seq(GraftInsertStar(None)), Seq()) =>
          GraftMergeCommand(path, m.sourceTable, keyName(m.mergeCondition))
        case _ =>
          GraftGeneralMergeCommand(path, keyName(m.mergeCondition),
            GraftMergeSpecHolder(m.targetTable, m.sourceTable, m.mergeCondition,
              matched, notMatched, bySource))
      }

    // Delta-style row-level SQL DML on graft targets. Conditions may
    // arrive with attributes already resolved against the statement's
    // relation — strip them back to names (the command re-resolves against
    // its own table scan, whose attribute ids differ).
    case u: UpdateTable if graftPath(u.table).isDefined =>
      GraftUpdateCommand(graftPath(u.table).get,
        GraftDmlHolder(u.condition.map(unresolve),
          u.assignments.map(a => (assignName(a.key), unresolve(a.value)))))

    // DELETE: V2 catalog tables already route through SupportsDelete
    // (with canDeleteWhere analysis-time rejection) — intercept only the
    // V1 `USING graft` relations Spark can't handle natively.
    case dl: DeleteFromTable if graftV1Path(dl.table).isDefined =>
      GraftDeleteCommand(graftV1Path(dl.table).get,
        GraftDmlHolder(Some(unresolve(dl.condition)), Seq.empty))
  }

  private def unresolve(e: Expression): Expression = e.transform {
    case a: Attribute => UnresolvedAttribute(a.name)
  }

  /** Like [[graftPath]] but only for V1 relations (session-catalog
    * `USING graft` tables). */
  private def graftV1Path(t: LogicalPlan): Option[String] = t match {
    case SubqueryAlias(_, child) => graftV1Path(child)
    case UnresolvedCatalogRelation(tbl, _, _) if tbl.provider.exists(_.equalsIgnoreCase("graft")) =>
      tbl.storage.locationUri.map(u => new Path(u).toString)
    case LogicalRelation(rel: GraftRelation, _, _, _, _) => Some(rel.path)
    case _ => None
  }

  private def assignName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case a: Attribute => a.name
    case other => throw new UnsupportedOperationException(
      s"graft MERGE UPDATE SET needs plain column names on the left, got $other")
  }

  /** The merge condition must contain `source.<key> = target.<key>` as a
    * top-level conjunct; both sides must name the same column. Returns ALL
    * candidate column names — which one is the record key is only known at
    * run time, so the command accepts any match. */
  private def keyName(cond: Expression): Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(cond).collect {
      case EqualTo(l, r) if attrName(l).nonEmpty && attrName(l) == attrName(r) =>
        attrName(l).get
    }
    if (keys.isEmpty) throw new UnsupportedOperationException(
      s"graft MERGE needs ON source.<key> = target.<key> (optionally AND …), got $cond")
    keys
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

/** Opaque holder for UPDATE/DELETE clause expressions (see
  * [[GraftMergeSpecHolder]] for why they must hide from TreeNode). */
case class GraftDmlHolder(cond: Option[Expression],
    assigns: Seq[(String, Expression)])

/** `UPDATE t SET … WHERE …` → touched-file rewrite via LakeTable.update. */
case class GraftUpdateCommand(path: String, holder: GraftDmlHolder)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val table = LakeTable.load(spark, path)
    val cond = holder.cond.map(GraftExpressionBridge.column).getOrElse(lit(true))
    table.update(cond, holder.assigns.map {
      case (n, e) => n -> GraftExpressionBridge.column(e)
    }.toMap)
    Seq.empty
  }
}

/** `DELETE FROM t WHERE …` → touched-file rewrite via LakeTable.delete. */
case class GraftDeleteCommand(path: String, holder: GraftDmlHolder)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val table = LakeTable.load(spark, path)
    table.delete(holder.cond.map(GraftExpressionBridge.column).getOrElse(lit(true)))
    Seq.empty
  }
}

/** Eagerly-executed MERGE fast path (`UPDATE SET * / INSERT *`, no
  * conditions): materializes the (already analyzed) source plan and runs
  * the keyed upsert. */
case class GraftMergeCommand(path: String, source: LogicalPlan, keys: Seq[String])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val table = LakeTable.load(spark, path)
    require(keys.exists(_.equalsIgnoreCase(table.spec.key)),
      s"MERGE condition columns ${keys.mkString(",")} do not include the table key '${table.spec.key}'")
    table.upsert(GraftExpressionBridge.ofRows(spark, source))
    Seq.empty
  }
}

/** Opaque holder for the captured (intentionally still-unresolved) merge
  * plans and clause expressions: TreeNode reflection doesn't traverse a
  * custom case class, so analysis of the command node doesn't reject the
  * unresolved source/target references — they resolve at run time against
  * the re-planned join, exactly like [[GraftMergeCommand]]'s source plan. */
case class GraftMergeSpecHolder(target: LogicalPlan, source: LogicalPlan,
    mergeCond: Expression, matched: Seq[GraftMergeAction],
    notMatched: Seq[GraftMergeAction],
    bySource: Seq[GraftMergeAction] = Seq.empty)

/** Generalized MERGE: left-join source onto the target on the merge
  * condition (both sides keep the statement's aliases, so clause
  * expressions resolve as written), compute each row's first-match-wins
  * disposition and post-image with when() chains, then apply the result as
  * one keyed upsert plus (if any DELETE clause fired) one keyed delete —
  * both stats-pruned touched-file rewrites, never a full-table rewrite.
  * Multiple source rows hitting one key resolve by precombine latest-wins
  * (Hudi semantics) rather than Delta's multiple-match error. */
case class GraftGeneralMergeCommand(path: String, keys: Seq[String],
    spec: GraftMergeSpecHolder) extends LeafRunnableCommand {
  import spec.{bySource, matched, mergeCond, notMatched, source, target}

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  private def c(e: Expression): Column = GraftExpressionBridge.column(e)

  override def run(spark: SparkSession): Seq[Row] = {
    val table = LakeTable.load(spark, path)
    require(keys.exists(_.equalsIgnoreCase(table.spec.key)),
      s"MERGE condition columns ${keys.mkString(",")} do not include the table key '${table.spec.key}'")
    val srcDf = GraftExpressionBridge.ofRows(spark, source)
    // target side re-planned through its own (aliased) relation so clause
    // expressions resolve exactly as the user wrote them; meta columns are
    // part of the relation and stay referencable in clause conditions
    val tgtDf = GraftExpressionBridge.ofRows(spark, target)
    def act(a: GraftMergeAction): GraftMerge.Action = a match {
      case GraftUpdateStar(cond) => GraftMerge.UpdateAll(cond.map(c))
      case GraftUpdateSet(cond, assigns) =>
        GraftMerge.UpdateSet(cond.map(c), assigns.map { case (n, e) => (n, c(e)) })
      case GraftDelete(cond) => GraftMerge.Delete(cond.map(c))
      case GraftInsertStar(cond) => GraftMerge.InsertAll(cond.map(c))
    }
    GraftMerge.execute(table, srcDf, tgtDf, c(mergeCond),
      matched.map(act), notMatched.map(act), bySource.map(act))
    Seq.empty
  }
}

/** The generalized MERGE engine, shared by the SQL command and the
  * programmatic API ([[GraftMerge.execute]]): left-join source onto target
  * on the merge condition, compute each row's first-match-wins disposition
  * and post-image with when() chains, then apply the result as one keyed
  * upsert plus (if any DELETE clause exists) one keyed delete — both
  * stats-pruned touched-file rewrites, never a full-table rewrite.
  * Multiple source rows hitting one key resolve by precombine latest-wins
  * (Hudi semantics) rather than Delta's multiple-match error. */
object GraftMerge {
  sealed trait Action { def cond: Option[Column] }
  case class UpdateAll(cond: Option[Column]) extends Action
  case class UpdateSet(cond: Option[Column], assigns: Seq[(String, Column)]) extends Action
  case class Delete(cond: Option[Column]) extends Action
  case class InsertAll(cond: Option[Column]) extends Action

  /** Programmatic entry: `matched`/`notMatched` clause conditions reference
    * `srcDf`/`tgtDf` columns (e.g. `srcDf("is_deleted")`).
    *
    * `notMatchedBySource` (Delta's WHEN NOT MATCHED BY SOURCE) acts on
    * TARGET rows no source row matches — conditions/assignments may only
    * reference target columns. Scale note: unlike the other clauses (pruned
    * to source-touched files), by-source clauses must consider the whole
    * target; an unconditioned one scans the full table — same caveat Delta
    * documents, so condition it (e.g. on a partition range) at scale. */
  def execute(table: LakeTable, srcDf: DataFrame, tgtDf0: DataFrame,
      joinCond: Column, matched: Seq[Action], notMatched: Seq[Action],
      notMatchedBySource: Seq[Action] = Seq.empty): Unit = {
    (matched ++ notMatchedBySource).collect { case UpdateSet(_, assigns) => assigns }
      .flatten.foreach {
        case (n, _) => require(!n.equalsIgnoreCase(table.spec.key),
          s"graft MERGE cannot UPDATE SET the record key '$n'")
      }
    notMatchedBySource.foreach {
      case _: InsertAll => throw new UnsupportedOperationException(
        "WHEN NOT MATCHED BY SOURCE cannot INSERT (there is no source row)")
      case _: UpdateAll => throw new UnsupportedOperationException(
        "WHEN NOT MATCHED BY SOURCE cannot UPDATE SET * (there is no source row)")
      case _ => ()
    }
    val dataCols = table.schema.fieldNames.toSeq
    val tgtDf = tgtDf0.withColumn("_graft_matched", lit(true))
    val joined = srcDf.join(tgtDf, joinCond, "left")
    val isMatched = tgtDf("_graft_matched").isNotNull

    def actionCond(a: Action): Column = a.cond.getOrElse(lit(true))

    // row disposition: first clause whose condition holds, in order
    val matchedDisp = matched.foldRight(lit("keep")) { (a, acc) =>
      val tag = a match {
        case _: Delete => "delete"
        case _ => "update"
      }
      when(actionCond(a), lit(tag)).otherwise(acc)
    }
    val notMatchedDisp = notMatched.foldRight(lit("skip")) { (a, acc) =>
      when(actionCond(a), lit("insert")).otherwise(acc)
    }
    val disp = when(isMatched, matchedDisp).otherwise(notMatchedDisp)

    // post-image per data column, aligned with the disposition chain
    def matchedValue(colName: String): Column =
      matched.foldRight(tgtDf(colName)) { (a, acc) =>
        val v = a match {
          case UpdateAll(_) => srcDf(colName)
          case UpdateSet(_, assigns) =>
            assigns.find(_._1.equalsIgnoreCase(colName)).map(_._2)
              .getOrElse(tgtDf(colName))
          case _ => tgtDf(colName) // delete: row is filtered by disposition
        }
        when(actionCond(a), v).otherwise(acc)
      }
    // with no INSERT clause the source may lack table columns — the
    // unmatched branch is never kept (disposition "skip"), so don't
    // reference source columns it doesn't have
    val unmatchedValue: String => Column =
      if (notMatched.isEmpty) n => tgtDf(n) else n => srcDf(n)
    // the SOURCE row's precombine decides which of several same-key source
    // rows acts (latest-wins) — the post-image's precombine can be the
    // target's (column-level UPDATE SET) and must not enter this contest
    val srcPc: Column =
      if (srcDf.columns.contains(table.spec.precombine)) srcDf(table.spec.precombine)
      else tgtDf(table.spec.precombine)
    val out0 = joined.select(
      (disp.as("_graft_disp") +: srcPc.as("_graft_spc") +:
        dataCols.map(n => when(isMatched, matchedValue(n)).otherwise(unmatchedValue(n)).as(n))): _*)
    // per-key resolution BEFORE applying anything: with multiple source
    // rows per key, the greatest source precombine's clause wins — a stale
    // DELETE row must not override a newer UPDATE (and vice versa)
    // Stage the by-source pass BEFORE the main pass commits anything: via
    // SQL the target is a lazy relation that lists live files at execution
    // time, so without eager pinning the anti-join would see the
    // POST-merge state — a row a MATCHED clause just updated out of the ON
    // condition would surface again and be hit by a second clause. The
    // eager localCheckpoint materializes the statement snapshot now.
    val bySourceStaged: Option[DataFrame] = if (notMatchedBySource.isEmpty) None else {
      val untouched = tgtDf0.join(srcDf, joinCond, "left_anti")
      val bsDisp = notMatchedBySource.foldRight(lit("keep")) { (a, acc) =>
        val tag = a match { case _: Delete => "delete"; case _ => "update" }
        when(actionCond(a), lit(tag)).otherwise(acc)
      }
      def bsValue(colName: String): Column =
        notMatchedBySource.foldRight(untouched(colName)) { (a, acc) =>
          val v = a match {
            case UpdateSet(_, assigns) =>
              assigns.find(_._1.equalsIgnoreCase(colName)).map(_._2)
                .getOrElse(untouched(colName))
            case _ => untouched(colName)
          }
          when(actionCond(a), v).otherwise(acc)
        }
      Some(untouched.select(
          bsDisp.as("_graft_disp") +: dataCols.map(n => bsValue(n).as(n)): _*)
        .filter(col("_graft_disp") =!= "keep")
        .localCheckpoint(true))
    }

    // a by-source-only statement must not run (or commit) an empty main pass.
    // The main pass is ALSO eagerly pinned: persist alone can recompute a
    // lost partition from the lazy SQL target relation AFTER the upsert
    // commit, flipping dispositions between the upsert and the deleteKeys.
    // Record identity is (key, partition) on a partitioned table — the same
    // key in two partitions is two records (Hudi non-global-index
    // semantics), so per-key resolution and deletes must not collapse them.
    val idCols: Seq[String] = table.spec.key +: table.spec.partition.toSeq
    val mainStaged: Option[DataFrame] =
      if (matched.isEmpty && notMatched.isEmpty) None
      else Some(LakeTable.dedupLatest(out0, idCols, "_graft_spc",
        xxhash64(out0.columns.map(col).toSeq: _*)).localCheckpoint(true))

    // Apply by-source FIRST: its rows are target rows no source row
    // matched, and with extra ON conjuncts the main pass may INSERT the
    // same key — per-row clause semantics (Delta's) delete only the old
    // row, so on a keyed table the delete must land before the insert.
    bySourceStaged.foreach { staged =>
      val ups = staged.filter(col("_graft_disp") === "update").drop("_graft_disp")
      if (notMatchedBySource.exists(!_.isInstanceOf[Delete])) table.upsert(ups)
      if (notMatchedBySource.exists(_.isInstanceOf[Delete])) {
        table.deleteKeys(staged.filter(col("_graft_disp") === "delete")
          .select(idCols.map(col): _*))
        ()
      }
    }

    mainStaged.foreach { out =>
      val upserts = out.filter(col("_graft_disp").isin("update", "insert"))
        .drop("_graft_disp", "_graft_spc")
      table.upsert(upserts)
      if (matched.exists(_.isInstanceOf[Delete])) {
        val doomed = out.filter(col("_graft_disp") === "delete")
          .select(idCols.map(col): _*)
        table.deleteKeys(doomed)
        ()
      }
    }
  }
}
