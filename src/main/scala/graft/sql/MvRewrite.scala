package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.lake.{LakeTable, MaterializedView, MvAgg}
import graft.lake.MaterializedView.MvJoin
import graft.sources.{GraftCatalogTable, GraftRelation}

/** Automatic query rewrite to materialized views — the classic warehouse
  * optimization: an aggregate query over a base table whose (dims, aggs)
  * shape a registered, UP-TO-DATE [[MaterializedView]] already maintains
  * is answered from the view's state table instead of scanning the base.
  * At 100 TB the difference is a full fact scan + shuffle vs reading a
  * few thousand pre-aggregated rows — and the incremental refresh keeps
  * the view current at churn cost, so the rewrite almost always applies.
  *
  * Matched shape (conservative — a miss only costs the rewrite, never
  * correctness):
  *
  *   `Aggregate(dims, aggs, [Filter(dim-only preds)] [Project] base)`
  *
  * where `base` is a plain-snapshot graft scan (V1 `format("graft")`
  * relation or a DSv2 catalog table, no time travel / incremental /
  * change-feed options), the grouping keys are the view's dims or a
  * SUBSET of them (rollup: count/sum re-aggregate by summing the stored
  * partials, min/max by min/max, avg from the stored sum+count pair),
  * and every aggregate is one of the view's declared count/sum/avg/min/
  * max columns (no DISTINCT, no FILTER clauses). Dim-only predicates
  * commute with grouping, so they re-apply against the view's dim
  * columns — below the re-aggregation on the rollup path, so predicates
  * on rolled-away dims work too. A FILTERED view additionally requires
  * the query's WHERE to imply its predicate: each view conjunct must be
  * matched by a query conjunct either EXACTLY (canonical rendering —
  * absorbed by the view) or by interval subsumption for single-attribute
  * </<=/>/>=/= comparisons (`x > 100` serves a view filtered `x > 50`;
  * the tighter query conjunct stays in the residual and re-applies, so
  * its attribute must be a view dim). The remainder must be dim-only.
  * Result types must match exactly or the rewrite bails.
  *
  * Freshness: the rewrite fires ONLY when `mv.lastRefreshedVersion`
  * equals the base table's latest commit — a stale view silently serving
  * old aggregates would be a correctness bug, so staleness disables the
  * rewrite (refresh() re-enables it).
  *
  * Views register per-process via [[GraftMvRewrite.register]]; the rule
  * itself is injected by [[GraftExtensions]].
  */
object GraftMvRewrite extends Rule[LogicalPlan] {

  private val registry = new java.util.concurrent.CopyOnWriteArraySet[String]()

  /** Registration-scoped shape cache (mvPath → (basePath, lowercased
    * dims, join triple)). All three are immutable for an MV's life, so
    * they pre-filter candidates with ZERO filesystem I/O — without this,
    * every Aggregate node in every optimizer fixed-point iteration paid
    * an MV meta read + base commit-log listing per registered view. The
    * authoritative (fresh) meta is still re-read for any candidate that
    * survives the pre-filter, so a stale entry can only MISS a rewrite,
    * never mis-serve one. */
  private case class MvShapeKey(basePath: String, dims: Set[String],
      joinSig: Seq[(String, Set[(String, String)], Boolean)],
      dimInfo: Seq[DimInfo]) {
    def dimPaths: Seq[String] = joinSig.map(_._1)
  }

  /** Lowercased (dimPath, {(leftKey, dimKey)}, outer) signature of one
    * join arm — the key-pair SET, so composite keys match in any written
    * order; the flag keeps inner and LEFT arms from serving each other. */
  private def lcSig(j: MvJoin): (String, Set[(String, String)], Boolean) =
    (j.dimPath,
      j.keyPairs.map { case (f, d) => (f.toLowerCase, d.toLowerCase) }.toSet,
      j.outer)
  private val shapeCache =
    new java.util.concurrent.ConcurrentHashMap[String, MvShapeKey]()

  def register(mvPath: String): Unit = {
    shapeCache.remove(mvPath); registry.add(mvPath); ()
  }
  def unregister(mvPath: String): Unit = {
    registry.remove(mvPath); shapeCache.remove(mvPath); ()
  }
  def clear(): Unit = { registry.clear(); shapeCache.clear() }

  private def shapeOf(spark: SparkSession, p: String): Option[MvShapeKey] = {
    val cached = shapeCache.get(p)
    if (cached != null) return Some(cached)
    try {
      val meta = MaterializedView.load(spark, p).meta
      val infos = dimInfosOf(spark, meta)
        .getOrElse(return None) // unparseable stored expr
      val s = MvShapeKey(meta.basePath, infos.map(_.key).toSet,
        meta.joins.map(lcSig), infos)
      shapeCache.put(p, s)
      Some(s)
    } catch { case scala.util.control.NonFatal(_) => None }
  }
  def registered: Seq[String] = {
    val it = registry.iterator(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Registered view paths maintained over `basePath` — the streaming
    * auto-maintenance discovery hook ([[graft.streaming.CdcStream
    * .ingestWithViews]] refreshes these per micro-batch when the caller
    * names none). A star-join view is "over" BOTH its fact and its dim
    * table, so a stream landing on either keeps it fresh. Uses the
    * zero-I/O shape cache; sorted for a deterministic refresh order. */
  def viewsOver(spark: SparkSession, basePath: String): Seq[String] =
    registered.filter(p => shapeOf(spark, p).exists(s =>
      s.basePath == basePath || s.dimPaths.contains(basePath))).sorted

  /** Test seam: commit-log latest-version resolutions performed by the
    * freshness gate (cache MISSES only) — pinned by MvRewriteSpec to stay
    * one per member TABLE per rule invocation, not per candidate view. */
  @volatile private[graft] var freshnessLookups: Long = 0L

  /** Test seam: unexpected throws swallowed by the per-Aggregate guard in
    * [[apply]]. A rule whose bail path is "return None" must never fail a
    * query — a matcher bug degrades to a missed rewrite — but the miss
    * must not be SILENT either, or regressions hide: MvRewriteSpec pins
    * this at zero across its whole serving matrix. */
  @volatile private[graft] var rewriteErrors: Long = 0L

  /** Fault-injection seam for the guard spec: when set, [[rewrite]] throws
    * at entry so the spec can prove a matcher failure degrades to a missed
    * rewrite (query still answers) instead of a failed query. */
  @volatile private[graft] var injectMatcherFailure: Boolean = false

  /** Fuzz seam (set only by the decoy oracle sweep and DecoySweepSpec):
    * every join/star query additionally DRY-RUNS the join-back matcher
    * against every registered view, ignoring the base-path candidate
    * pre-filter, and discards the result. The pre-filter means a fixed
    * decoy view can never reach [[extraArmsOf]]/`jbCtx` validation
    * against a corpus of per-query temp tables — this seam puts the
    * matcher surface under the full query population anyway; a throw
    * escapes to the per-Aggregate guard and fails the sweep via
    * [[rewriteErrors]]. Never serves: the dry-run result is discarded. */
  @volatile private[graft] var fuzzJoinBackDryRun: Boolean = false

  /** Canonical rendering: attribute names lowercased + unqualified, and
    * literal-only subtrees constant-folded — the optimizer has already
    * folded the QUERY's casts (`CAST(50 AS BIGINT)` → `50L`) by the time
    * this rule runs, so parsed stored texts must fold the same way. */
  private[sql] def canonExpr(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name.toLowerCase)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(u.name.toLowerCase)
  }.transformUp {
    case f if f.resolved && f.foldable && !f.isInstanceOf[Literal] =>
      try Literal.create(f.eval(null), f.dataType)
      catch { case scala.util.control.NonFatal(_) => f }
  }
  private[sql] def canon(e: Expression): String = canonExpr(e).sql

  /** Canonical text of a stored (expression-dim / filter) SQL string;
    * None when unparseable — the caller treats that as no-match. */
  private[sql] def canonText(spark: SparkSession, t: String): Option[String] =
    try Some(canon(spark.sessionState.sqlParser.parseExpression(t)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** The matchable KEY of a view dim: bare column → lowercased name;
    * expression dim → the canonical text of its stored expression. None
    * when the stored expression no longer parses (disables the view). */
  private def dimKeyOf(spark: SparkSession, dimExprs: Map[String, String],
      d: String): Option[String] =
    dimExprs.get(d) match {
      case Some(t) => canonText(spark, t)
      case None => Some(d.toLowerCase)
    }

  /** One view dim's matchable identity: `key` (see [[dimKeyOf]]), whether
    * it is a bare base column, and — for a date/timestamp truncation
    * expression dim — its hierarchy signature. */
  private[sql] case class DimInfo(name: String, key: String, bare: Boolean,
      trunc: Option[TruncSig])

  /** (kind ts|date, granularity rank, canonical source text, format
    * literal) of a `date_trunc(fmt, ts)` / `trunc(date, fmt)` call. */
  private[sql] case class TruncSig(kind: String, rank: Int, src: String, fmt: String)

  /** Granularity rank in the ALIGNED truncation chain — every coarser
    * level's bucket boundaries fall on finer-level boundaries, except
    * WEEK, which aligns with DAY and finer but not with MONTH+. */
  private def truncRank(fmt: String): Option[Int] = fmt.toUpperCase match {
    case "MICROSECOND" => Some(0)
    case "MILLISECOND" => Some(1)
    case "SECOND" => Some(2)
    case "MINUTE" => Some(3)
    case "HOUR" => Some(4)
    case "DAY" | "DD" => Some(5)
    case "WEEK" => Some(6)
    case "MON" | "MONTH" | "MM" => Some(7)
    case "QUARTER" => Some(8)
    case "YEAR" | "YYYY" | "YY" => Some(9)
    case _ => None
  }

  /** Truncation signature of an expression — recognizes BOTH the resolved
    * nodes (query side) and the unresolved function calls (parsed stored
    * expression-dim text). */
  private[sql] def truncSigOf(e: Expression): Option[TruncSig] = {
    def lit(x: Expression): Option[String] = x match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        Some(s.toString)
      case _ => None
    }
    e match {
      case t: TruncTimestamp =>
        for { f <- lit(t.format); r <- truncRank(f) }
          yield TruncSig("ts", r, canon(t.timestamp), f)
      case t: TruncDate =>
        for { f <- lit(t.format); r <- truncRank(f) }
          yield TruncSig("date", r, canon(t.date), f)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if u.nameParts.map(_.toLowerCase) == Seq("date_trunc") &&
            u.arguments.size == 2 =>
        for { f <- lit(u.arguments.head); r <- truncRank(f) }
          yield TruncSig("ts", r, canon(u.arguments(1)), f)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if u.nameParts.map(_.toLowerCase) == Seq("trunc") &&
            u.arguments.size == 2 =>
        for { f <- lit(u.arguments(1)); r <- truncRank(f) }
          yield TruncSig("date", r, canon(u.arguments.head), f)
      case _ => None
    }
  }

  /** Can a query truncation `q` be computed FROM a view truncation `v`
    * (same kind + source, strictly coarser, aligned chain)? A WEEK view
    * serves only WEEK queries (month+ boundaries don't align), and a
    * WEEK query composes from DAY-or-finer views only — both enforced by
    * excluding WEEK as the view side. */
  private def truncComposable(q: TruncSig, v: TruncSig): Boolean =
    q.kind == v.kind && q.src == v.src && q.rank > v.rank && v.rank != 6

  /** The per-dim identities of a view's meta, or None when a stored
    * expression no longer parses (disables the view). */
  private def dimInfosOf(spark: SparkSession,
      meta: MaterializedView.MvMeta): Option[Seq[DimInfo]] = {
    val infos = meta.dims.map { d =>
      meta.dimExprs.get(d) match {
        case None => Some(DimInfo(d, d.toLowerCase, bare = true, None))
        case Some(t) =>
          try {
            val parsed = spark.sessionState.sqlParser.parseExpression(t)
            Some(DimInfo(d, canon(parsed), bare = false, truncSigOf(parsed)))
          } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
    if (infos.exists(_.isEmpty)) None else Some(infos.flatten)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    // one latest-version resolution per member table per rule INVOCATION:
    // with many registered views over the same hot base, the freshness
    // gate would otherwise re-resolve the base's commit log once per
    // fresh-candidate per Aggregate node. Scoped to this invocation — a
    // commit landing mid-planning is the same benign race with or
    // without the memo (the rewrite serves the version it observed).
    val latestMemo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    plan.transformUp {
      case agg: Aggregate =>
        // never let a matcher bug escape the optimizer: any unexpected
        // throw degrades to a missed rewrite (counted — see rewriteErrors)
        try rewrite(agg, latestMemo).getOrElse(agg)
        catch {
          case scala.util.control.NonFatal(e) =>
            rewriteErrors += 1
            logDebug(s"mv rewrite skipped (matcher error): $e")
            agg
        }
    }
  }

  /** The base-table path under alias/attr-projection/filter wrappers, the
    * scan output, and any Filter conditions collected on the way down. */
  private[sql] def baseScan(p: LogicalPlan): Option[(String, Seq[Expression])] = p match {
    case SubqueryAlias(_, c) => baseScan(c)
    case v: View => baseScan(v.child)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => baseScan(c)
    case Filter(cond, c) => baseScan(c).map { case (path, fs) => (path, fs :+ cond) }
    case LogicalRelation(rel: GraftRelation, _, _, _, _)
        if !rel.parameters.contains("incremental.since") &&
          !rel.parameters.contains("changes.since") &&
          !rel.parameters.contains("versionAsOf") &&
          !rel.parameters.contains("timestampAsOf") &&
          rel.parameters.getOrElse("view", "snapshot").equalsIgnoreCase("snapshot") =>
      Some((rel.path, Nil))
    case r: DataSourceV2Relation => r.table match {
      case t: GraftCatalogTable if t.asOf.isEmpty => Some((t.path, Nil))
      case _ => None
    }
    case _ => None
  }

  /** One matched join arm of the QUERY plan: the dim scan's path, the
    * oriented key-attribute pairs (left, dim), the join type, and the dim
    * scan's output attribute set. `out` is the arm's PROVENANCE — the
    * join-back resolver serves a query attribute from this arm only when
    * the attribute's exprId is in `out` (the arm's LEAF SCAN output —
    * pre-projection, so filter refs projected away above still home
    * here), so a fact or covered-arm column
    * that merely SHARES a name with an arm column can never be silently
    * served as the arm's (the r10 name-only resolution hole). */
  private[sql] case class ArmScan(path: String,
      pairs: Seq[(AttributeReference, AttributeReference)],
      outer: Boolean, out: AttributeSet) {
    def lks: Seq[String] = pairs.map(_._1.name)
    def dks: Seq[String] = pairs.map(_._2.name)
  }

  /** The query arms NOT consumed by the view's own join signature (one
    * query arm per sig arm, matched as (path, pair-set, outer)); None
    * when the sig is not a sub-multiset of the query's arms. Shared by
    * the direct partial-star join-back and the grouping-sets drill. */
  private def extraArmsOf(sig: Seq[(String, Set[(String, String)], Boolean)],
      arms: Seq[ArmScan]): Option[Seq[ArmScan]] = {
    val remaining = scala.collection.mutable.ArrayBuffer(arms: _*)
    sig.foreach { sv =>
      val ix = remaining.indexWhere(a => lcSig(MvJoin(a.path, a.lks, a.dks,
        0L, a.outer)) == sv)
      if (ix < 0) return None
      remaining.remove(ix)
      ()
    }
    Some(remaining.toSeq)
  }

  /** The attr=attr conjuncts of an inner-join condition, each oriented
    * (leftAttr, rightAttr) against `r`'s output: the RIGHT attr must
    * resolve in r, the LEFT attr must not. None when any conjunct is not
    * a two-attribute equality (conservative — not an equi-join we model).
    * Composite keys are simply 2+ conjuncts. */
  private def equiPairs(cond: Expression, r: LogicalPlan)
      : Option[Seq[(AttributeReference, AttributeReference)]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case o => Seq(o)
    }
    val oriented = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (!r.outputSet.contains(a) && r.outputSet.contains(b)) Some((a, b))
        else if (!r.outputSet.contains(b) && r.outputSet.contains(a)) Some((b, a))
        else None
      case _ => None
    }
    if (oriented.isEmpty || oriented.exists(_.isEmpty)) None
    else Some(oriented.flatten)
  }

  /** A two-table inner / left-outer equi-join scan under alias/
    * projection/filter wrappers: `(leftPath, leftKeys, rightPath,
    * rightKeys, outer, filters)`, keys assigned to their own side
    * (composite keys = 2+ pairs, in conjunct order). Filters are
    * collected BOTH above the join and from either side's scan: a
    * side-local predicate below an INNER join commutes with it
    * (`σ_p(F) ⋈ D = σ_p(F ⋈ D)` when `p` references only F — which a
    * pushed-down predicate does by construction), so predicate pushdown
    * running before this rule can never hide a query conjunct from the
    * view-filter match. A LEFT join's RIGHT-side filter does NOT commute
    * (it changes the null-extension), so an outer arm with dim-side
    * filters conservatively fails the match. */
  private[sql] def joinScan(p: LogicalPlan)
      : Option[(String, AttributeSet, ArmScan, Seq[Expression])] =
    p match {
      case SubqueryAlias(_, c) => joinScan(c)
      case v: View => joinScan(v.child)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => joinScan(c)
      case Filter(cond, c) =>
        joinScan(c).map { case (lp, lo, arm, fs) => (lp, lo, arm, fs :+ cond) }
      case j @ Join(l, r, jt, Some(cond), _)
          if jt == org.apache.spark.sql.catalyst.plans.Inner ||
            jt == org.apache.spark.sql.catalyst.plans.LeftOuter =>
        val outer = jt == org.apache.spark.sql.catalyst.plans.LeftOuter
        for {
          pairs <- equiPairs(cond, r)
          if pairs.forall { case (a, _) => l.outputSet.contains(a) }
          (lp, lf) <- baseScan(l)
          (rp, rf) <- baseScan(r)
          if !(outer && rf.nonEmpty)
        } yield (lp, AttributeSet(l.collectLeaves().flatMap(_.output)),
          ArmScan(rp, pairs, outer,
            AttributeSet(r.collectLeaves().flatMap(_.output))), lf ++ rf)
      case _ => None
    }

  /** A left-deep join scan of 2+ dims: the fact scan at the bottom-left,
    * each Join adding one dim scan on the right under an And-of-
    * `EqualTo(leftCol, dimCol)` condition (composite keys = 2+ pairs).
    * The left keys may come from the FACT scan (star arm) or from an
    * ALREADY-JOINED dim (snowflake chain like fact→customer→nation) —
    * either way they resolve in the left subtree, which is exactly what
    * [[graft.lake.MaterializedView]]'s parent-first join contract
    * maintains. Returns `(factPath, arms, filters)` with arms
    * `(dimPath, leftKeys, dimKeys)` in join order; filters are collected
    * from ABOVE the topmost join AND from inside the join tree (directly
    * on a member scan or between joins) — every such predicate is
    * side/subtree-local by construction, so for inner joins it commutes
    * back above the tree unchanged; collecting it keeps the rewrite
    * robust under predicate pushdown, which runs interleaved with this
    * rule. */
  private[sql] def starScan(p: LogicalPlan)
      : Option[(String, Seq[ArmScan], Seq[Expression])] = {
    def peel(p: LogicalPlan): Option[(String, AttributeSet,
        Seq[ArmScan], Seq[Expression])] =
      p match {
        case SubqueryAlias(_, c) => peel(c)
        case v: View => peel(v.child)
        case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => peel(c)
        case Filter(cond, c) =>
          peel(c).map { case (fp, out, arms, fs) => (fp, out, arms, fs :+ cond) }
        case Join(l, r, jt, Some(cond), _)
            if jt == org.apache.spark.sql.catalyst.plans.Inner ||
              jt == org.apache.spark.sql.catalyst.plans.LeftOuter =>
          val outer = jt == org.apache.spark.sql.catalyst.plans.LeftOuter
          for {
            pairs <- equiPairs(cond, r)
            (rp, rf) <- baseScan(r)
            // a LEFT arm's dim-side filter changes the null-extension and
            // does not commute above the join — conservative no-match
            if !(outer && rf.nonEmpty)
            (fp, treeOut, arms, lf) <- baseScan(l) match {
              case Some((lp, lf0)) =>
                Some((lp, l.outputSet, Seq.empty[ArmScan], lf0))
              case _ => peel(l)
            }
            // every left key resolves in the joined tree
            if pairs.forall { case (la, _) => treeOut.contains(la) }
          } yield (fp, treeOut ++ r.outputSet,
            arms :+ ArmScan(rp, pairs, outer,
              AttributeSet(r.collectLeaves().flatMap(_.output))),
            lf ++ rf)
        case _ => None
      }
    def strip(p: LogicalPlan, fs: Seq[Expression])
        : Option[(String, Seq[ArmScan], Seq[Expression])] =
      p match {
        case SubqueryAlias(_, c) => strip(c, fs)
        case v: View => strip(v.child, fs)
        case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => strip(c, fs)
        case Filter(cond, c) => strip(c, fs :+ cond)
        case j: Join =>
          peel(j).collect { case (fp, _, arms, pf) if arms.size >= 2 => (fp, arms, fs ++ pf) }
        case _ => None
      }
    strip(p, Seq.empty)
  }

  /** The MV input text of an aggregate call's child: a bare column name,
    * or the unqualified SQL rendering of a deterministic ROW-LOCAL
    * expression (the TPC-H revenue shape `l_extendedprice *
    * (1 - l_discount)`) — what [[graft.lake.MaterializedView.create]]
    * validates and pins; the rewrite matches it canonically. */
  private[sql] def aggInputOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case e2 if e2.deterministic &&
        !e2.exists(_.isInstanceOf[SubqueryExpression]) &&
        !e2.exists(_.isInstanceOf[AggregateExpression]) =>
      Some(e2.transform {
        case a: AttributeReference => a.withQualifier(Seq.empty)
      }.sql)
    case _ => None
  }

  /** (kind, input) of an aggregate call in MV terms, if maintainable. */
  private[sql] def aggSpec(fn: AggregateFunction): Option[(String, String)] = fn match {
    case Count(Seq(Literal(1, _))) => Some(("count", "*"))
    case Count(Seq(e)) => aggInputOf(e).map(("count", _))
    case Sum(e, _) => aggInputOf(e).map(("sum", _))
    case Average(e, _) => aggInputOf(e).map(("avg", _))
    case Min(e) => aggInputOf(e).map(("min", _))
    case Max(e) => aggInputOf(e).map(("max", _))
    case _ => None
  }

  /** Does a view agg input answer a query-side input? BARE column names
    * (plain identifiers on both sides) match case-insensitively —
    * attribute resolution is case-insensitive, so `AMT` and `amt` name
    * the same column. Anything else compares by canonical text
    * (attribute names lowercased/unqualified, literal subtrees folded —
    * so the stored analyzed rendering and the query's analyzed
    * expression meet at the same text). The case-insensitive shortcut is
    * deliberately NOT applied to expression texts: `CASE WHEN flag='Y'`
    * and `CASE WHEN flag='y'` differ only in a string LITERAL's case and
    * are different aggregates — canon preserves literal case, so only
    * the canonical path may compare them. */
  private def bareIdent(s: String): Boolean = s.matches("[A-Za-z_][A-Za-z0-9_]*")
  private def inputMatches(spark: SparkSession, memberCols: => Option[Set[String]],
      viewIn: String, qIn: String): Boolean =
    if (viewIn == "*" || qIn == "*") viewIn == qIn
    else if (bareIdent(viewIn) && bareIdent(qIn)) viewIn.equalsIgnoreCase(qIn)
    else {
      // a NON-identifier string may be a legacy member COLUMN NAME
      // (`a-b`, stored raw — the maintenance inCol contract) rather than
      // expression text, and canonText would mis-parse it as arithmetic
      // — both mis-serving sum(a - b) from a view over the column `a-b`
      // and missing sum(`a-b`) the view really maintains. Classify both
      // sides against the member schemas first (lazy, zero I/O on the
      // all-identifier common path): a column side matches only the SAME
      // raw name on the other side; mixed column/expression never
      // matches. Unknown schemas (load failure) conservatively refuse
      // any non-identifier comparison.
      memberCols match {
        case None => false
        case Some(cols) =>
          val vCol = !bareIdent(viewIn) && cols.contains(viewIn.toLowerCase)
          val qCol = !bareIdent(qIn) && cols.contains(qIn.toLowerCase)
          if (vCol || qCol) vCol && qCol && viewIn.equalsIgnoreCase(qIn)
          else (canonText(spark, viewIn), canonText(spark, qIn)) match {
            case (Some(a), Some(b)) => a == b
            case _ => false
          }
      }
    }

  /** Which view column answers this aggregate call, if any. */
  private def aggColumn(spark: SparkSession, memberCols: => Option[Set[String]],
      fn: AggregateFunction, aggs: Seq[MvAgg]): Option[MvAgg] =
    aggSpec(fn).flatMap { case (kind, input) =>
      aggs.find(a => a.kind == kind && inputMatches(spark, memberCols, a.input, input))
    }

  /** Inline computed Project definitions directly under the Aggregate:
    * the analyzer extracts a complex grouping expression into a
    * `… AS _groupingexpression#N` project entry and groups on the
    * attribute, so the expression the user wrote is one level down.
    * Substituting each deterministic alias definition back into the
    * grouping/aggregate expressions (exprIds of the output aliases are
    * preserved) lets the matcher see `GROUP BY date_trunc(…)` as written.
    * Projects with non-deterministic computed entries stay put (the
    * rewrite then conservatively bails). */
  private[sql] def inlineProjects(agg0: Aggregate): Aggregate = {
    var current = agg0
    var continue = true
    while (continue) {
      continue = false
      current.child match {
        case Project(pl, c)
            if pl.exists(!_.isInstanceOf[AttributeReference]) &&
              pl.forall {
                case _: AttributeReference => true
                case al: Alias => al.child.deterministic
                case _ => false
              } =>
          val subst: Map[ExprId, Expression] =
            pl.collect { case al: Alias => al.exprId -> al.child }.toMap
          def sub(e: Expression): Expression = e.transformUp {
            case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
          }
          current = current.copy(
            groupingExpressions = current.groupingExpressions.map(sub),
            aggregateExpressions = current.aggregateExpressions.map { ne =>
              // a BARE output attribute whose definition lives in the child
              // Project (GROUP BY a computed subquery/CTE column — e.g.
              // `SELECT x, count(*) FROM (SELECT a+1 AS x FROM t) GROUP BY
              // x`, which CollapseProject keeps because the non-cheap alias
              // is referenced twice) substitutes to a NON-named expression;
              // re-wrap it under the original name + exprId so the
              // Aggregate's output schema — and everything resolving
              // against it above — is unchanged
              sub(ne) match {
                case named: NamedExpression => named
                case other => Alias(other, ne.name)(exprId = ne.exprId)
              }
            },
            child = c)
          continue = true
        case _ =>
      }
    }
    current
  }

  // a FILTERED view serves only queries whose WHERE implies the view's
  // predicate — checked conservatively: each view-filter conjunct must
  // match a query conjunct one-to-one under a canonical rendering
  // (attribute names lowercased, analyzed sql text). A miss only loses
  // the rewrite, never correctness.
  private[sql] def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }
  // `(attr, op, literal)` of a single-attribute comparison conjunct
  // (post-canon: attrs are lowercased UnresolvedAttributes, foldable
  // sides are Literals); literal-first forms normalize to attr-first
  private def cmpOf(e: Expression): Option[(String, String, Literal)] = {
    def nm(x: Expression): Option[String] = x match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(u.name.toLowerCase)
      case a: AttributeReference => Some(a.name.toLowerCase)
      case _ => None
    }
    e match {
      case GreaterThan(x, l: Literal) => nm(x).map((_, ">", l))
      case GreaterThanOrEqual(x, l: Literal) => nm(x).map((_, ">=", l))
      case LessThan(x, l: Literal) => nm(x).map((_, "<", l))
      case LessThanOrEqual(x, l: Literal) => nm(x).map((_, "<=", l))
      case EqualTo(x, l: Literal) => nm(x).map((_, "=", l))
      case GreaterThan(l: Literal, x) => nm(x).map((_, "<", l))
      case GreaterThanOrEqual(l: Literal, x) => nm(x).map((_, "<=", l))
      case LessThan(l: Literal, x) => nm(x).map((_, ">", l))
      case LessThanOrEqual(l: Literal, x) => nm(x).map((_, ">=", l))
      case EqualTo(l: Literal, x) => nm(x).map((_, "=", l))
      case _ => None
    }
  }
  // total order on comparable literal values; None = incomparable
  // (keeps the implication check conservative, never wrong)
  private def litCmp(x: Literal, y: Literal): Option[Int] = {
    // NaN / Infinity doubles have no BigDecimal rendering — treat as
    // incomparable (conservative no-match) instead of throwing
    // NumberFormatException out of the rule
    def big(n: java.lang.Number): Option[java.math.BigDecimal] =
      try Some(new java.math.BigDecimal(n.toString))
      catch { case _: NumberFormatException => None }
    def num(l: Literal): Option[java.math.BigDecimal] = l.value match {
      case null => None
      case n: java.lang.Number if l.dataType.isInstanceOf[
          org.apache.spark.sql.types.NumericType] => big(n)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
      case _ => None
    }
    (num(x), num(y)) match {
      case (Some(a), Some(b)) => Some(a.compareTo(b))
      case _ => (x.value, y.value) match {
        case (a: org.apache.spark.unsafe.types.UTF8String,
            b: org.apache.spark.unsafe.types.UTF8String)
            if x.dataType == StringType && y.dataType == StringType =>
          Some(a.compareTo(b))
        // same-type integral-backed literals (date = days, timestamp =
        // micros): ordering on the stored number IS the value ordering
        case (a: java.lang.Number, b: java.lang.Number)
            if x.dataType == y.dataType =>
          for { ba <- big(a); bb <- big(b) } yield ba.compareTo(bb)
        case _ => None
      }
    }
  }
  // `(attr, canonical literal renderings)` of an IN-list / equality
  // conjunct over one attribute with all-literal values — the literal
  // SET a membership implication compares. Post-canon, foldable
  // operands are Literals; InSet (the optimizer's large-IN form)
  // re-renders its raw values through typed Literals.
  // the attribute of a membership conjunct may sit under a
  // type-coercion Cast (the stored view text keeps the analyzer's cast;
  // the query side's no-op cast is optimizer-removed) — peel it. Sound
  // ONLY for lossless upcasts: [[implies]] pre-checks the RESOLVED
  // query conjunct (before canon erases child types) and bails on any
  // narrowing attribute cast, so by the time inNm runs here every
  // query-side cast is a provable upcast. A peeled upcast is sound for
  // the set checks because the folded literal RENDERINGS carry the
  // comparison type ("50L" vs "50"), so two sides coerced differently
  // can never pass a subset check; sound for the range check because
  // litCmp compares typed VALUES and an upcast preserves them. The
  // VIEW side (parsed stored text, child types unknowable) only ever
  // reaches the rendering-protected set checks — cmpOf never peels —
  // so an exotic narrowing cast in a stored filter cannot mis-serve.
  private def inNm(x: Expression): Option[String] = x match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(u.name.toLowerCase)
    case a: AttributeReference => Some(a.name.toLowerCase)
    case c: Cast => inNm(c.child)
    case _ => None
  }
  // does the RESOLVED expression contain a cast over an attribute that
  // can lose/wrap values (e.g. CAST(bigint_col AS INT))? Such a cast
  // maps overflow-wrapped values into a membership set, so comparing
  // its post-cast literals against a view filter on the bare column
  // would serve rows the view does not contain.
  private def hasNarrowingAttrCast(e: Expression): Boolean = e.exists {
    case c: Cast => c.child.resolved &&
      !Cast.canUpCast(c.child.dataType, c.dataType)
    case _ => false
  }
  // `(attr, literals)` of an IN-list / equality conjunct over one
  // attribute with all-literal values; InSet (the optimizer's large-IN
  // form) re-renders its raw values through typed Literals
  private def inLitsOf(e: Expression): Option[(String, Seq[Literal])] = e match {
    case In(x, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      inNm(x).map((_, vs.map(_.asInstanceOf[Literal])))
    case s: InSet =>
      inNm(s.child).map((_,
        s.hset.toSeq.map(v => Literal(v, s.child.dataType))))
    case EqualTo(x, l: Literal) => inNm(x).map((_, Seq(l)))
    case EqualTo(l: Literal, x) => inNm(x).map((_, Seq(l)))
    case _ => None
  }
  private def inSetOf(e: Expression): Option[(String, Set[String])] =
    inLitsOf(e).map { case (a, ls) => (a, ls.map(_.sql).toSet) }
  // does one literal satisfy a </<=/>/>=/= comparison against another?
  private def litSat(ql: Literal, vop: String, vl: Literal): Boolean =
    litCmp(ql, vl).exists(c => vop match {
      case ">" => c > 0
      case ">=" => c >= 0
      case "<" => c < 0
      case "<=" => c <= 0
      case "=" => c == 0
      case _ => false
    })
  // does the query conjunct `q` IMPLY the view conjunct `v`? Three
  // conservative sufficient conditions on the same attribute: interval
  // subsumption for single-attribute </<=/>/>=/= comparisons with
  // comparable literals (`x > 100` serves a view filtered `x > 50`);
  // literal-set inclusion for IN/= conjuncts (`x IN (1,2)` or `x = 2`
  // serves a view filtered `x IN (1,2,3)`); and IN-into-range (`x IN
  // (60, 70)` serves a view filtered `x >= 50` — every member
  // satisfies the comparison). Any non-matching shape is false.
  private[sql] def implies(q: Expression, v: Expression): Boolean = {
    // conservative bail BEFORE canon (canon unresolves attributes, so
    // the child types a soundness check needs exist only here)
    if (hasNarrowingAttrCast(q)) return false
    val qc = canonExpr(q)
    val vc = canonExpr(v)
    val range = for {
      (qa, qop, ql) <- cmpOf(qc)
      (va, vop, vl) <- cmpOf(vc)
      if qa == va
      c <- litCmp(ql, vl) // sign of (q literal − v literal)
    } yield (vop, qop) match {
      case (">", ">") => c >= 0
      case (">", ">=") | (">", "=") => c > 0
      case (">=", ">") | (">=", ">=") | (">=", "=") => c >= 0
      case ("<", "<") => c <= 0
      case ("<", "<=") | ("<", "=") => c < 0
      case ("<=", "<") | ("<=", "<=") | ("<=", "=") => c <= 0
      case ("=", "=") => c == 0
      case _ => false
    }
    def setSub = for {
      (qa, qs) <- inSetOf(qc)
      (va, vs) <- inSetOf(vc)
      if qa == va
    } yield qs.subsetOf(vs)
    def inRange = for {
      (qa, qls) <- inLitsOf(qc)
      (va, vop, vl) <- cmpOf(vc)
      if qa == va
    } yield qls.forall(ql => litSat(ql, vop, vl))
    range.orElse(setSub).orElse(inRange).getOrElse(false)
  }

  /** GROUPING-SETS serving — `GROUP BY ROLLUP / CUBE / GROUPING SETS`
    * over a viewed base, the classic summary-table dashboard shape. The
    * analyzer's plan is
    *
    *   `Aggregate [g1…gk, spark_grouping_id] ← Expand [one projection per
    *   set] ← Project [grouping aliases] ← [Filter] base`
    *
    * Each grouping attribute is defined by ONE expression over the base
    * (nulled per set, with `spark_grouping_id` encoding the set); the
    * aggregate calls read base columns passed through the Expand. The
    * scan under the Expand may be a plain base snapshot, a two-table
    * equi-join, or a left-deep star — served by a FRESH view whose OWN
    * join signature matches exactly (joined content folded into the
    * state) or is a strict sub-multiset of the query's arms (DRILL-
    * ACROSS: the leftover arms join back against the state's live group
    * rows, provenance-checked like the flat join-back; arm-touching
    * aggregates serve only duplication-insensitively — min/max, GRP_N-
    * weighted counts, DISTINCT counts — while weighted sum/avg drills
    * bail, keeping every serving bit-exact). When every grouping
    * expression is servable from the view's dims (or joined-back arm
    * columns) and every aggregate call re-derives from the stored
    * partials,
    * the SAME Aggregate/Expand pair re-executes over the state's live
    * group rows: the Expand replicates each state row per set exactly as
    * it replicates that group's base rows, and the re-aggregations are
    * the rollup homomorphisms (Σ GRP_N for count(*), Σ stored counts/
    * sums, min/max of extrema, Σsum ÷ Σcnt for avg — the same
    * finalizations [[graft.lake.MaterializedView.readRollupExprs]] uses,
    * so the two serving paths agree bit-for-bit). The null-vs-nulled dim
    * distinction is preserved identically: a NULL dim VALUE flows through
    * the non-nulled projection element while set-nulled positions take
    * the literal, and `spark_grouping_id` disambiguates on both sides.
    * Output identity: the grouping attributes and gid are REUSED and
    * every rewritten aggregate is re-aliased under its original exprId,
    * so everything above the Aggregate keeps resolving.
    *
    * Conservative bails (a miss, never wrong results): join/star scans
    * under the Expand, DISTINCT / FILTER clauses, expression-over-
    * aggregate outputs, non-servable grouping expressions or agg inputs,
    * any result-type mismatch. At 100 TB the win is the usual one at
    * Expand-multiplied scale: the query's Expand replicates EVERY fact
    * row per grouping set before the shuffle, while the served plan
    * replicates only |groups| state rows. */
  private def rewriteGroupingSets(agg: Aggregate, ex: Expand,
      latestOf: String => Long): Option[LogicalPlan] = {
    val spark = SparkSession.active
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.types.{DataType, DoubleType}
    val GID = "spark_grouping_id"
    val gAttrs: Seq[AttributeReference] = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val gid = gAttrs.find(_.name == GID).getOrElse(return None)
    val groupAttrs = gAttrs.filterNot(_.exprId == gid.exprId)
    val pos: Map[ExprId, Int] =
      ex.output.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    val gidIx = pos.getOrElse(gid.exprId, return None)
    val grpIxs = groupAttrs.map(a => pos.getOrElse(a.exprId, return None))
    val projs = ex.projections
    if (projs.isEmpty || projs.exists(_.size != ex.output.size)) return None
    val gidLits: Seq[Literal] = projs.map(_(gidIx) match {
      case l: Literal => l
      case _ => return None
    })
    // per grouping attr: the one defining expression (consistent across
    // sets) and the per-set null mask
    val gDefs: Seq[Expression] = groupAttrs.zip(grpIxs).map { case (_, ix) =>
      val defs = projs.map(_(ix)).filter {
        case Literal(null, _) => false
        case _ => true
      }
      if (defs.isEmpty || !defs.forall(_.semanticEquals(defs.head))) return None
      defs.head
    }
    val nullMask: Seq[Seq[Boolean]] = projs.map(p => grpIxs.map(ix =>
      p(ix) match { case Literal(null, _) => true; case _ => false }))
    // resolve the grouping expressions over the SCAN output: peel the
    // analyzer's alias Project(s) below the Expand (inlineProjects mirror)
    var below: LogicalPlan = ex.child
    var gOverScan: Seq[Expression] = gDefs
    var continuePeel = true
    while (continuePeel) below match {
      case SubqueryAlias(_, c) => below = c
      case v: View => below = v.child
      case Project(pl, c) if pl.forall {
            case _: AttributeReference => true
            case al: Alias => al.child.deterministic
            case _ => false
          } && pl.exists(!_.isInstanceOf[AttributeReference]) =>
        val subst = pl.collect { case al: Alias => al.exprId -> al.child }.toMap
        gOverScan = gOverScan.map(_.transformUp {
          case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
        })
        below = c
      case _ => continuePeel = false
    }
    // the scanned shape BELOW the Expand: a plain base snapshot, a
    // two-table equi-join (either inner orientation), or a left-deep
    // star — served by a view whose OWN join signature matches (the
    // joined content is folded into the state; grouping attrs resolve on
    // the joined row exactly as the direct path's dims do). No join-back
    // here: an extra query arm bails.
    val plainB = baseScan(below)
    val joinedB = if (plainB.isDefined) None else joinScan(below)
    val starB =
      if (plainB.isDefined || joinedB.isDefined) None else starScan(below)
    val (path, filters) = plainB
      .orElse(joinedB.map { case (lp, _, _, fs) => (lp, fs) })
      .orElse(starB.map { case (fp, _, fs) => (fp, fs) })
      .getOrElse(return None)
    def sigMatches(basePath: String,
        sig: Seq[(String, Set[(String, String)], Boolean)]): Boolean =
      (plainB, joinedB, starB) match {
        case (Some(_), _, _) => sig.isEmpty && basePath == path
        case (_, Some((lp, _, arm, _)), _) => sig match {
          case Seq((jDim, pairs, vOuter)) =>
            val fwd = arm.lks.zip(arm.dks)
              .map { case (l, r) => (l.toLowerCase, r.toLowerCase) }.toSet
            vOuter == arm.outer &&
            ((basePath == lp && jDim == arm.path && pairs == fwd) ||
              (!arm.outer && basePath == arm.path && jDim == lp &&
                pairs == fwd.map(_.swap)))
          case _ => false
        }
        case (_, _, Some((fp, arms, _))) =>
          basePath == fp && sig.size == arms.size &&
            arms.map(a => (a.path, a.lks.zip(a.dks)
              .map { case (l, r) => (l.toLowerCase, r.toLowerCase) }.toSet,
              a.outer)).toSet == sig.toSet
        case _ => false
      }

    def tryServe(view: MaterializedView,
        meta: MaterializedView.MvMeta,
        extraArms: Option[Seq[ArmScan]]): Option[LogicalPlan] = {
      val infos = dimInfosOf(spark, meta).getOrElse(return None)
      // member column names (lowercased) — base AND join-dim schemas,
      // identical to serveWith's version: this path serves join/star
      // views too, so a non-identifier DIM column (e.g. `a-b`) must be
      // recognized as a column, not canon-matched as arithmetic
      lazy val memberColsLc: Option[Set[String]] =
        try Some((LakeTable.load(spark, meta.basePath).schema.fieldNames ++
            meta.joins.flatMap(j =>
              LakeTable.load(spark, j.dimPath).schema.fieldNames))
          .map(_.toLowerCase).toSet)
        catch { case scala.util.control.NonFatal(_) => None }
      val f = org.apache.spark.sql.functions
      // ---- join-back context (DRILL-ACROSS grouping sets): the query's
      // star carries arms the view does NOT cover, and the grouping /
      // duplication-insensitive servings may read those arms' columns.
      // Mirror of serveWith's jbCtx contract: every extra arm's left key
      // is a carried bare view dim (or an earlier extra arm's column —
      // snowflake chains), every name the served plan binds is
      // unambiguous (state vs arm vs arm), and the arms are scanned LIVE
      // at the same snapshot the query itself would read, so freshness
      // still needs only the view's own cursors. The re-aggregation
      // algebra is the flat join-back's: the join multiplies each state
      // row exactly as it multiplies that group's fact rows, and the
      // Expand replication composes row-locally on top. Aggregates whose
      // INPUT touches an arm attribute serve only duplication-
      // insensitively (min/max, count via GRP_N weighting, DISTINCT
      // counts); weighted sum/avg drills bail on this path — every
      // serving stays bit-exact.
      val stateNamesLc: Set[String] = extraArms match {
        case None => Set.empty
        case Some(_) =>
          try view.state.schema.fieldNames.map(_.toLowerCase).toSet
          catch { case scala.util.control.NonFatal(_) => return None }
      }
      val jbCtx: Option[(Seq[ArmScan], Seq[Seq[String]])] = extraArms match {
        case None => None
        case Some(arms) =>
          val schemas =
            try arms.map(a => LakeTable.load(spark, a.path).schema.fieldNames.toSeq)
            catch { case scala.util.control.NonFatal(_) => return None }
          val bare = infos.filter(_.bare).map(_.key).toSet
          val lcSchemas = schemas.map(_.map(_.toLowerCase).toSet)
          arms.zipWithIndex.foreach { case (arm, ix) =>
            arm.pairs.foreach { case (lAttr, dAttr) =>
              val lk = lAttr.name; val dk = dAttr.name
              if (lk.equalsIgnoreCase(dk)) return None // bare-name join contract
              val lkl = lk.toLowerCase
              // provenance homing of the left key, as in serveWith
              val prov = arms.indexWhere(_.out.contains(lAttr))
              if (prov == -1) {
                if (!bare.contains(lkl)) return None
                if (lcSchemas.take(ix).exists(_.contains(lkl))) return None
              } else {
                if (prov >= ix) return None
                if (stateNamesLc.contains(lkl)) return None
                if (lcSchemas.zipWithIndex.count { case (sch, j) =>
                  j < ix && sch.contains(lkl) } != 1) return None
                if (!lcSchemas(prov).contains(lkl)) return None
              }
              if (stateNamesLc.contains(dk.toLowerCase) ||
                lcSchemas.zipWithIndex.count { case (sch, j) =>
                  j != ix && sch.contains(dk.toLowerCase) } > 0) return None
            }
          }
          Some((arms, schemas))
      }
      // the extra arm whose scan output holds this attribute — exprId
      // provenance, never name matching (a fact column sharing a name
      // with a drill-dim column must not serve as the dim's, nor the
      // other way around)
      def jbArmOf(a: Attribute): Option[Int] = jbCtx.flatMap {
        case (arms, _) =>
          val ix = arms.indexWhere(_.out.contains(a))
          if (ix < 0) None else Some(ix)
      }
      // an extra-arm attribute served as the joined dim's own column:
      // provenance AND an unambiguous name in the served plan
      def jbAttrCol(a: Attribute): Option[String] = jbCtx.flatMap {
        case (arms, schemas) =>
          val ix = arms.indexWhere(_.out.contains(a))
          if (ix < 0) None
          else {
            val nm = a.name.toLowerCase
            if (infos.exists(_.key == nm) || stateNamesLc.contains(nm)) None
            else if (schemas.map(_.map(_.toLowerCase)).zipWithIndex.exists {
              case (sch, j) => j != ix && sch.contains(nm) }) None
            else schemas(ix).find(_.equalsIgnoreCase(a.name))
          }
      }
      // arm column names the serving references — projected through the
      // live arm scans when the served child is built
      val jbNeeded = scala.collection.mutable.ArrayBuffer.empty[String]
      def armRefs(e: Expression): Boolean =
        e.references.exists(a => jbArmOf(a).isDefined)
      // view-filter absorption + dim-only residual, as in serveWith
      val qConj = scala.collection.mutable.ArrayBuffer(
        filters.flatMap(conjunctsOf): _*)
      val viewConj =
        try meta.filter.toSeq.flatMap(x =>
          conjunctsOf(spark.sessionState.sqlParser.parseExpression(x)))
        catch { case scala.util.control.NonFatal(_) => return None }
      viewConj.foreach { vc =>
        val want = canon(vc)
        val ix = qConj.indexWhere(c => canon(c) == want)
        if (ix >= 0) { qConj.remove(ix); () }
        else if (!qConj.exists(c => implies(c, vc))) return None
      }
      val rest = qConj.toSeq
      if (rest.exists(!_.deterministic)) return None
      def bareDimName(a: Attribute): Option[String] =
        // provenance first: an extra-arm attribute never serves from the
        // state, whatever its name
        if (jbArmOf(a).isDefined) None
        else infos.find(d => d.bare && d.key == a.name.toLowerCase).map(_.name)
      // a reference's serving name, provenance-dispatched (records arm
      // names for the join-back projection)
      def resolveRef(a: Attribute): Option[String] =
        if (jbArmOf(a).isDefined)
          jbAttrCol(a).map { n => jbNeeded += n; n }
        else bareDimName(a)
      if (!rest.forall(_.references.forall(a => resolveRef(a).isDefined)))
        return None
      val restCols = rest.map(c =>
        org.apache.spark.sql.GraftExpressionBridge.column(c.transform {
          case a: AttributeReference =>
            UnresolvedAttribute.quoted(resolveRef(a).get)
        }))
      // a grouping / duplication-insensitive input's serving Column over
      // the state read: a bare view dim, an expression dim restated
      // canonically, or a row-local expression over bare view dims
      def dimServe(ge: Expression): Option[org.apache.spark.sql.Column] =
        ge match {
          case a: AttributeReference => resolveRef(a).map(f.col)
          case e2 if e2.deterministic &&
              !e2.exists(_.isInstanceOf[SubqueryExpression]) &&
              !e2.exists(_.isInstanceOf[AggregateExpression]) =>
            // provenance: an expression touching an extra-arm attr must
            // rebuild through the join-back — never canon-match a stored
            // expression dim of colliding text
            (if (armRefs(e2)) None
             else infos.find(_.key == canon(e2)).map(d => f.col(d.name)))
              .orElse {
                val attrs = e2.collect { case a: AttributeReference => a }
                if (attrs.nonEmpty && attrs.forall(a => resolveRef(a).isDefined))
                  Some(org.apache.spark.sql.GraftExpressionBridge.column(
                    e2.transform {
                      case a: AttributeReference =>
                        UnresolvedAttribute.quoted(resolveRef(a).get)
                    }))
                else None
              }
          case _ => None
        }
      val gCols: Seq[(String, org.apache.spark.sql.Column)] =
        gOverScan.zipWithIndex.map { case (ge, j) =>
          (s"_gs_$j", dimServe(ge).getOrElse(return None))
        }
      // extra state-side columns the aggregate rewrites need (count/min/
      // max over dim expressions)
      val extraCols = scala.collection.mutable
        .ArrayBuffer.empty[(String, org.apache.spark.sql.Column)]
      val GRPN = MaterializedView.GRP_N
      type AttrOf = String => Option[Attribute]
      def aggE(fn2: AggregateFunction): Expression =
        AggregateExpression(fn2, Complete, isDistinct = false)
      def longSum(a: Attribute): Expression =
        Coalesce(Seq(Cast(aggE(Sum(a)), LongType), Literal(0L)))
      def findAgg(in: String, kinds: Set[String]): Option[MvAgg] =
        meta.aggs.find(a2 => kinds.contains(a2.kind) &&
          inputMatches(spark, memberColsLc, a2.input, in))
      // one aggregate CALL's rewrite recipe (shared by bare-aliased
      // outputs and expression-over-aggregate templates): phase 1
      // validates servability and registers any extra state-side
      // columns; the returned closure materializes the expression
      // against the analyzed state plan (phase 2)
      def fnRecipe(fn: AggregateFunction)
          : Option[AttrOf => Option[Expression]] = fn match {
        case Count(Seq(Literal(1, _))) =>
          Some((at: AttrOf) => at(GRPN).map(longSum))
        case Count(Seq(e)) =>
          // provenance: an arm-touching input has no stored partials —
          // skip the state-agg match (a name/canon collision with a
          // stored input must not serve) and go straight to the
          // GRP_N-weighted dim serving, which dimServe provenance-checks
          (if (armRefs(e)) None
           else aggInputOf(e).flatMap { in =>
            findAgg(in, Set("count")).map(a2 =>
              (at: AttrOf) => at(a2.name).map(longSum))
              .orElse(findAgg(in, Set("sum", "avg")).map(a2 =>
                (at: AttrOf) =>
                  at(MaterializedView.cntCol(a2.name)).map(longSum)))
          }).orElse(dimServe(e).map { sc =>
            // count over a servable dim expression: Σ GRP_N over the
            // rows whose serving value is non-null
            val nm = s"_gw_${extraCols.size}"
            extraCols += ((nm,
              f.when(sc.isNotNull, f.col(GRPN)).otherwise(f.lit(0L))))
            (at: AttrOf) => at(nm).map(longSum)
          })
        case Sum(e, _) =>
          // an arm-touching sum is the WEIGHTED drill shape — served on
          // the flat path only; here it bails (never through findAgg:
          // a stored input whose text collides must not answer it)
          if (armRefs(e)) None
          else aggInputOf(e).flatMap(in => findAgg(in, Set("sum", "avg")))
            .map { a2 =>
              (at: AttrOf) => for {
                sc <- at(MaterializedView.sumCol(a2.name))
                cc <- at(MaterializedView.cntCol(a2.name))
              } yield CaseWhen(Seq((
                GreaterThan(aggE(Sum(cc)), Literal(0L)),
                Cast(aggE(Sum(sc)), sc.dataType))), None): Expression
            }
        case Average(e, _) =>
          if (armRefs(e)) None
          else aggInputOf(e).flatMap(in => findAgg(in, Set("sum", "avg")))
            .map { a2 =>
              (at: AttrOf) => for {
                sc <- at(MaterializedView.sumCol(a2.name))
                cc <- at(MaterializedView.cntCol(a2.name))
              } yield CaseWhen(Seq((
                GreaterThan(aggE(Sum(cc)), Literal(0L)),
                Divide(Cast(aggE(Sum(sc)), DoubleType),
                  Cast(aggE(Sum(cc)), DoubleType)))), None): Expression
            }
        case Min(e) =>
          // extrema are duplication-insensitive: an arm-touching input
          // re-derives through dimServe (provenance-checked); the stored
          // agg is consulted only for arm-free inputs
          (if (armRefs(e)) None
           else aggInputOf(e).flatMap(in => findAgg(in, Set("min")))
            .map(a2 => (at: AttrOf) => at(a2.name).map(c =>
              aggE(Min(c)))))
            .orElse(dimServe(e).map { sc =>
              val nm = s"_gm_${extraCols.size}"
              extraCols += ((nm, sc))
              (at: AttrOf) => at(nm).map(c => aggE(Min(c)))
            })
        case Max(e) =>
          (if (armRefs(e)) None
           else aggInputOf(e).flatMap(in => findAgg(in, Set("max")))
            .map(a2 => (at: AttrOf) => at(a2.name).map(c =>
              aggE(Max(c)))))
            .orElse(dimServe(e).map { sc =>
              val nm = s"_gm_${extraCols.size}"
              extraCols += ((nm, sc))
              (at: AttrOf) => at(nm).map(c => aggE(Max(c)))
            })
        case _ => None
      }
      // phase 1: per output, a recipe producing the rewritten expression
      // against the analyzed state plan's attributes (phase 2)
      val recipes: Seq[AttrOf => Option[NamedExpression]] =
        agg.aggregateExpressions.map {
          case ne if !ne.exists(_.isInstanceOf[AggregateExpression]) =>
            // a grouping output or grouping()/grouping_id() arithmetic —
            // must reference only the REUSED grouping attrs + gid
            if (ne.references.subsetOf(AttributeSet(groupAttrs :+ gid)))
              (_: AttrOf) => Some(ne)
            else return None
          // count(DISTINCT dims…) per grouping set: duplication-
          // insensitive, so the per-set distinct over the replicated
          // state rows equals the base computation exactly (the state
          // holds one row per FULL dim tuple; a subset-dim distinct
          // collapses them just like the base rows would)
          case al @ Alias(
              AggregateExpression(Count(children), Complete, true, None, _), _)
              if children.nonEmpty =>
            val names = children.map { c =>
              dimServe(c) match {
                case Some(sc) =>
                  val nm = s"_gd_${extraCols.size}"
                  extraCols += ((nm, sc)); nm
                case None => return None
              }
            }
            (at: AttrOf) => {
              val resolved = names.map(at)
              if (resolved.exists(_.isEmpty)) None
              else Some(Alias(AggregateExpression(
                Count(resolved.map(_.get)), Complete, isDistinct = true),
                al.name)(exprId = al.exprId))
            }
          case al @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
            val r = fnRecipe(fn).getOrElse(return None)
            (at: AttrOf) =>
              r(at).map(e => Alias(e, al.name)(exprId = al.exprId))
          // EXPRESSION over aggregates (`sum(x)/count(1)`,
          // `max(x) - min(x)` per CUBE cell): every call rewrites in
          // place through fnRecipe; the surrounding row-local arithmetic
          // recomputes identically. Each substitution is type-gated
          // (a changed call type would silently re-type the arithmetic),
          // and the non-aggregate references must be grouping attrs/gid.
          case al @ Alias(child, _)
              if child.deterministic &&
                child.exists(_.isInstanceOf[AggregateExpression]) &&
                !child.exists(_.isInstanceOf[SubqueryExpression]) =>
            val subs = scala.collection.mutable.Buffer
              .empty[(AggregateExpression, AttrOf => Option[Expression])]
            child.foreach {
              case ae @ AggregateExpression(fn, Complete, false, None, _) =>
                fnRecipe(fn) match {
                  case Some(r) => subs += ((ae, r))
                  case None => return None
                }
              case _: AggregateExpression => return None
              case _ =>
            }
            val stripped = child.transform {
              case ae: AggregateExpression => Literal(null, ae.dataType)
            }
            if (!stripped.references.subsetOf(AttributeSet(groupAttrs :+ gid)))
              return None
            (at: AttrOf) => {
              var failed = false
              // transformUp: bottom-up visits only the ORIGINAL nodes, so
              // the aggregate calls INSIDE a replacement are never
              // re-matched (transformDown would recurse into them)
              val rebuilt = child.transformUp {
                case ae @ AggregateExpression(_, Complete, false, None, _) =>
                  subs.find(_._1 eq ae)
                    .orElse(subs.find(_._1.semanticEquals(ae)))
                    .flatMap(_._2(at)) match {
                    case Some(e) if e.dataType == ae.dataType => e
                    case _ => failed = true; ae
                  }
              }
              if (failed) None
              else Some(Alias(rebuilt, al.name)(exprId = al.exprId))
            }
          case _ => return None
        }
      // phase 2: the state child plan with servings + extras selected.
      // Under join-back the live group rows first join every extra arm
      // (scanned live, projected to join keys + referenced columns);
      // residual filters apply post-join — state-dim predicates commute
      // (left-side columns are unchanged per joined row) and arm-column
      // predicates sit exactly where the query's own filter sat.
      val stDf0 = view.state.read().filter(f.col(GRPN) > 0)
      val stJoined = jbCtx match {
        case None => stDf0
        case Some((arms, schemas)) =>
          // referenced columns PLUS every arm's left keys (a chained
          // arm's key lives on an earlier arm and must ride its
          // projection); names the state itself serves must NOT be
          // re-projected from an arm (ambiguity)
          val wanted = (jbNeeded ++ arms.flatMap(_.lks)).distinct
            .filterNot(w => stateNamesLc.contains(w.toLowerCase))
          arms.zipWithIndex.foldLeft(stDf0) { case (acc, (arm, ix)) =>
            val mine = schemas(ix)
            val need = (arm.dks ++ wanted.filter(w =>
              mine.exists(_.equalsIgnoreCase(w)))).distinct
            val dimDf = spark.read.format("graft").load(arm.path)
              .select(need.map(f.col): _*)
            acc.join(dimDf, arm.lks.zip(arm.dks).map { case (l, d) =>
              f.col(l) === f.col(d) }.reduce(_ && _),
              if (arm.outer) "left_outer" else "inner")
          }
      }
      val stF = restCols.foldLeft(stJoined)((acc, c) => acc.filter(c))
      val allExtra = (gCols ++ extraCols.toSeq).map { case (n, c) => c.as(n) }
      val child =
        try stF.select((f.col("*") +: allExtra): _*).queryExecution.analyzed
        catch { case scala.util.control.NonFatal(_) => return None }
      // the select is star-then-extras, so the synthetic serving columns
      // are POSITIONALLY the last allExtra.size outputs — resolve them by
      // position, never by name: a state dim literally named `_gs_0`
      // would otherwise shadow the synthetic and (types coinciding)
      // substitute the wrong column into the served plan. State-column
      // lookups search only the star prefix for the same reason.
      if (child.output.size < allExtra.size) return None
      val (stateOut, extraOut) =
        child.output.splitAt(child.output.size - allExtra.size)
      val extraAt: Map[String, Attribute] =
        (gCols ++ extraCols.toSeq).map(_._1).zip(extraOut).toMap
      def at(name: String): Option[Attribute] =
        extraAt.get(name).orElse(stateOut.find(_.name == name))
      val gServeAttrs: Seq[Attribute] = groupAttrs.indices.map { j =>
        val a = at(s"_gs_$j").getOrElse(return None)
        if (a.dataType != groupAttrs(j).dataType) return None
        a
      }
      val newAggs: Seq[NamedExpression] = recipes.map(r =>
        r(at).getOrElse(return None))
      // exact result-type gate, per output
      agg.aggregateExpressions.zip(newAggs).foreach { case (o, n) =>
        if (o.dataType != n.dataType) return None
      }
      val keepSet = AttributeSet(groupAttrs :+ gid)
      val passAttrs: Seq[Attribute] = AttributeSet(newAggs.flatMap(_.references))
        .toSeq.filterNot(keepSet.contains).filter(child.outputSet.contains)
      val newProjections: Seq[Seq[Expression]] = projs.indices.map { si =>
        passAttrs.map(a => a: Expression) ++
          gServeAttrs.zipWithIndex.map { case (a, j) =>
            if (nullMask(si)(j)) Literal(null, groupAttrs(j).dataType)
            else a: Expression
          } :+ gidLits(si)
      }
      val newOut: Seq[Attribute] = (passAttrs ++ groupAttrs) :+ gid
      Some(Aggregate(agg.groupingExpressions, newAggs,
        Expand(newProjections, newOut, child)))
    }

    // join-back orientations of the query's scanned arms (the parsed
    // one, plus the commuted one for a two-table INNER join — a LEFT
    // join never commutes), exactly as the direct path builds them
    val jbOrients: Seq[(String, Seq[ArmScan])] =
      joinedB.toSeq.flatMap { case (lp, lOut, arm, _) =>
        val fwd = (lp, Seq(arm))
        if (arm.outer) Seq(fwd)
        else Seq(fwd, (arm.path,
          Seq(ArmScan(lp, arm.pairs.map(_.swap), outer = false, lOut))))
      } ++ starB.toSeq.map { case (fp, arms, _) => (fp, arms) }
    // fresh candidates, smallest state first — a view serves either
    // EXACTLY (its join signature == the scanned shape) or by DRILLING
    // (its signature is a strict sub-multiset of one orientation's arms
    // over the same base; the leftover arms join back live)
    val cands = registered.flatMap { p =>
      shapeOf(spark, p) match {
        case Some(sh) if sigMatches(sh.basePath, sh.joinSig) ||
            jbOrients.exists { case (fp, arms) => fp == sh.basePath &&
              extraArmsOf(sh.joinSig, arms).exists(_.nonEmpty) } =>
          Some((p, sh.dims))
        case _ => None
      }
    }.sortBy(_._2.size)
    cands.iterator.flatMap { case (p, _) =>
      try {
        val m = MaterializedView.load(spark, p)
        val meta = m.meta // fresh read — authoritative over the cache
        val freshNow = m.servableFresh(meta, latestOf)
        if (!freshNow) None
        else if (sigMatches(meta.basePath, meta.joins.map(lcSig)))
          tryServe(m, meta, None)
        else jbOrients.iterator.flatMap { case (fp, arms) =>
          if (fp != meta.basePath) None
          else extraArmsOf(meta.joins.map(lcSig), arms)
            .filter(_.nonEmpty)
            .flatMap(extra => tryServe(m, meta, Some(extra)))
        }.nextOption()
      } catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption()
  }

  private def rewrite(agg0: Aggregate,
      latestMemo: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long])
      : Option[LogicalPlan] = {
    if (!agg0.resolved) return None
    if (injectMatcherFailure)
      throw new IllegalStateException("injected matcher failure (test seam)")
    val agg = inlineProjects(agg0)
    val spark = SparkSession.active
    def latestOf(p: String): Long = {
      val hit = latestMemo.get(p)
      if (hit != null) hit.longValue
      else {
        freshnessLookups += 1
        val v = LakeTable.load(spark, p).latestVersion
        latestMemo.put(p, v)
        v
      }
    }
    // GROUPING SETS (ROLLUP / CUBE) re-execute their own Expand over the
    // state's group rows — a separate matcher (see rewriteGroupingSets)
    agg.child match {
      case ex: Expand => return rewriteGroupingSets(agg, ex, latestOf)
      case _ =>
    }
    // the scanned shape: a plain base snapshot, a two-table inner
    // equi-join (either join order), or a left-deep 2+-dim star
    val plain = baseScan(agg.child)
    val joined = if (plain.isDefined) None else joinScan(agg.child)
    val starred =
      if (plain.isDefined || joined.isDefined) None else starScan(agg.child)
    val (path, filters) = plain
      .orElse(joined.map { case (lp, _, _, fs) => (lp, fs) })
      .orElse(starred.map { case (fp, _, fs) => (fp, fs) })
      .getOrElse(return None)
    // does this view's join set serve the scanned shape? A plain scan
    // needs a JOIN-FREE view (a join view has joined multiplicity); a
    // join scan needs the single arm's key-pair SET — in EITHER
    // orientation for inner (⋈ commutes), fact-first only for LEFT; a
    // star scan needs the same (dimPath, pairSet, outer) arm SET over the
    // same fact (any join order, any key order within an arm).
    def joinMatches(basePath: String,
        sig: Seq[(String, Set[(String, String)], Boolean)]): Boolean =
      (plain, joined, starred) match {
        case (Some(_), _, _) => sig.isEmpty && basePath == path
        case (_, Some((lp, _, arm, _)), _) => sig match {
          case Seq((jDim, pairs, vOuter)) =>
            val fwd = arm.lks.zip(arm.dks)
              .map { case (l, r) => (l.toLowerCase, r.toLowerCase) }.toSet
            vOuter == arm.outer &&
            ((basePath == lp && jDim == arm.path && pairs == fwd) ||
              (!arm.outer && basePath == arm.path && jDim == lp &&
                pairs == fwd.map(_.swap)))
          case _ => false
        }
        case (_, _, Some((fp, arms, _))) =>
          basePath == fp && sig.size == arms.size &&
            arms.map(a => (a.path, a.lks.zip(a.dks)
              .map { case (l, r) => (l.toLowerCase, r.toLowerCase) }.toSet, a.outer))
              .toSet == sig.toSet
        case _ => false
      }
    // every grouping key is either a bare column (key = lowercased name)
    // or a deterministic row-local expression (key = canonical text) — an
    // EXPRESSION dim view matches `GROUP BY date_trunc('day', ts)` by
    // canonical-text equality with its stored expression
    val dims: Seq[(Expression, String)] = agg.groupingExpressions.map {
      case a: AttributeReference => (a, a.name.toLowerCase)
      case e if e.deterministic && !e.exists(_.isInstanceOf[SubqueryExpression]) =>
        (e, canon(e))
      case _ => return None
    }
    val dimSet = dims.map(_._2).toSet
    // per grouping item, everything a dim match needs: the lowercased
    // names it references, and its truncation signature (if any)
    case class QItem(e: Expression, key: String, isBare: Boolean,
        refs: Set[String], trunc: Option[TruncSig])
    val qItems: Seq[QItem] = dims.map { case (e, k) =>
      QItem(e, k, e.isInstanceOf[AttributeReference],
        e.references.map(_.name.toLowerCase).toSet, truncSigOf(e))
    }
    // a grouping item is servable by a view dim in three ways, in
    // preference order: (1) EXACT key match; (2) the item is a row-local
    // expression over exactly ONE bare view dim — f(dim) is constant
    // within each stored group, so it re-computes from the state dim
    // column; (3) truncation-hierarchy composition — a coarser
    // `date_trunc` re-truncates the view's finer bucket column.
    def itemMatches(q: QItem, infos: Seq[DimInfo]): Boolean =
      infos.exists(_.key == q.key) ||
        (!q.isBare && infos.exists(d => d.bare && q.refs == Set(d.key))) ||
        q.trunc.exists(qt =>
          infos.exists(_.trunc.exists(vt => truncComposable(qt, vt))))
    // cached-shape pre-filter (zero I/O), exact-dim views before rollup
    // candidates (no re-aggregation beats a re-aggregation), smaller
    // state tables first among rollups
    val candidates = registered.flatMap { p =>
      shapeOf(spark, p) match {
        case Some(s) if joinMatches(s.basePath, s.joinSig) &&
            qItems.forall(q => itemMatches(q, s.dimInfo)) =>
          Some((p, s.dims))
        case _ => None
      }
    }.sortBy { case (_, ds) => (if (ds == dimSet) 0 else 1, ds.size) }
    val freshCandidates = candidates.iterator.flatMap { case (p, _) =>
      try {
        val m = MaterializedView.load(spark, p)
        val meta = m.meta // fresh read — authoritative over the cache
        if (joinMatches(meta.basePath, meta.joins.map(lcSig)) &&
          dimInfosOf(spark, meta).exists(infos =>
            qItems.forall(q => itemMatches(q, infos))) &&
          // freshness gate: a stale view must never serve — for a join
          // view EVERY maintenance cursor must be current (or behind by
          // physical-only commits — see servableFresh). The cursor is
          // read from the state table's commit (atomic with the data),
          // not the meta mirror; one resolution yields both components.
          m.servableFresh(meta, latestOf))
          Some((m, meta))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    // serve the query with ONE fresh candidate, or report why not (None):
    // candidates are tried in preference order, so a view whose filter
    // doesn't match (or whose agg set is short one column) never blocks a
    // later view that can serve
    def serveWith(view: MaterializedView,
        meta: MaterializedView.MvMeta,
        joinBack: Option[Seq[ArmScan]] = None)
        : Option[LogicalPlan] = {
      // per grouping item, its serving: the view dim column to read
      // directly (exact match) or a state-side DERIVED grouping column
      // (f-of-bare-dim substitution / coarser truncation) with a
      // synthetic output name. An unparseable stored expression disables
      // the view.
      val infos = dimInfosOf(spark, meta).getOrElse(return None)
      // member column names (lowercased) for the schema-aware input match
      // — forced only when an input comparison involves a non-identifier
      // string (see [[inputMatches]]); a load failure refuses those
      // comparisons conservatively via None
      lazy val memberColsLc: Option[Set[String]] =
        try Some((LakeTable.load(spark, meta.basePath).schema.fieldNames ++
            meta.joins.flatMap(j =>
              LakeTable.load(spark, j.dimPath).schema.fieldNames))
          .map(_.toLowerCase).toSet)
        catch { case scala.util.control.NonFatal(_) => None }
      // JOIN-BACK serving (the drill-across rewrite): the query joins the
      // view's base to dim tables and groups on a dim ATTRIBUTE the view
      // does not hold. When every join arm's left keys are bare view dims
      // (or columns of an earlier arm — snowflake chains), the state's
      // partials re-join the DIM TABLES READ LIVE and re-aggregate: the
      // re-aggregation is a homomorphism and the join multiplies each
      // state row exactly as it multiplies that key's fact rows, so
      // sums/counts/min/max/avg-pairs/sketches and DISTINCT counts all
      // reproduce the query bit-exactly (LEFT arms null-extend the
      // unmatched partials into the same NULL groups). Freshness needs
      // only the view's OWN cursors: the served plan scans the joined-back
      // dims at the same live snapshot the query itself would. `joinBack`
      // carries the query arms (dimPath, leftKeys, dimKeys, outer) the
      // view does NOT cover, in join order — for a PARTIAL-STAR match
      // (the view has its own arms, a sub-multiset of the query's — the
      // summary-table + dimension-drill shape) the view arms' content is
      // already folded into the state, and an extra arm's left key must
      // be a carried view dim (or an earlier EXTRA arm's column), exactly
      // like the join-free case.
      // hoisted (not a lazy val — a non-local return inside a lazy body
      // is a deferred-evaluation landmine): the state schema is read
      // only when join-back is in play, which is the only consumer
      val stateNames: Set[String] =
        if (joinBack.isEmpty) Set.empty
        else try view.state.schema.fieldNames.map(_.toLowerCase).toSet
        catch { case scala.util.control.NonFatal(_) => return None }
      val jbCtx: Option[(Seq[ArmScan], Seq[Seq[String]])] = joinBack match {
        case None => None
        case Some(arms) =>
          val schemas =
            try arms.map(a => LakeTable.load(spark, a.path).schema.fieldNames.toSeq)
            catch { case scala.util.control.NonFatal(_) => return None }
          val bare = infos.filter(_.bare).map(_.key).toSet
          val lcSchemas = schemas.map(_.map(_.toLowerCase).toSet)
          arms.zipWithIndex.foreach { case (arm, ix) =>
            arm.pairs.foreach { case (lAttr, dAttr) =>
              val lk = lAttr.name; val dk = dAttr.name
              if (lk.equalsIgnoreCase(dk)) return None // bare-name join contract
              val lkl = lk.toLowerCase
              // PROVENANCE homing of the left key: the arm whose scan
              // output holds the attribute (by exprId). Not on any extra
              // arm → a fact/covered-arm column, servable only as a
              // carried bare view dim; on an EARLIER extra arm →
              // snowflake chain off that arm; anything else bails.
              val prov = arms.indexWhere(_.out.contains(lAttr))
              if (prov == -1) {
                if (!bare.contains(lkl)) return None
                // the state serves col(lk): the name must not ALSO live
                // on an earlier arm (the served join would bind the
                // wrong side)
                if (lcSchemas.take(ix).exists(_.contains(lkl))) return None
              } else {
                if (prov >= ix) return None
                // chained: in the SERVED plan col(lk) must bind to
                // exactly the provenance arm — a state column of the
                // same name would capture it silently (the wanted-name
                // projection suppresses state-colliding names), and a
                // second earlier arm carrying it would be ambiguous
                if (stateNames.contains(lkl)) return None
                if (lcSchemas.zipWithIndex.count { case (s, j) =>
                  j < ix && s.contains(lkl) } != 1) return None
                if (!lcSchemas(prov).contains(lkl)) return None
              }
              // a projected dim column must collide with neither the
              // state's columns nor another arm's
              if (stateNames.contains(dk.toLowerCase) ||
                lcSchemas.zipWithIndex.count { case (s, j) =>
                  j != ix && s.contains(dk.toLowerCase) } > 0) return None
            }
          }
          Some((arms, schemas))
      }
      // the extra arm whose scan output holds this attribute — exprId
      // provenance, never name matching: a fact (or covered-arm) column
      // sharing a name with a drill-dim column must not be served as the
      // dim's, nor the other way around
      def jbArmOf(a: Attribute): Option[Int] = jbCtx.flatMap {
        case (arms, _) =>
          val ix = arms.indexWhere(_.out.contains(a))
          if (ix < 0) None else Some(ix)
      }
      // an extra-arm attribute served as the dim's own column after the
      // join-back: requires provenance AND an unambiguous name in the
      // SERVED plan (not a view dim, not a state column, on no other arm)
      def jbAttrCol(a: Attribute): Option[String] = jbCtx.flatMap {
        case (arms, schemas) =>
          val ix = arms.indexWhere(_.out.contains(a))
          if (ix < 0) None
          else {
            val nm = a.name.toLowerCase
            if (infos.exists(_.key == nm) || stateNames.contains(nm)) None
            else if (schemas.map(_.map(_.toLowerCase)).zipWithIndex.exists {
              case (s, j) => j != ix && s.contains(nm) }) None
            else schemas(ix).find(_.equalsIgnoreCase(a.name))
          }
      }
      // a query attribute's serving name: an extra-arm attr via
      // [[jbAttrCol]]; anything else (fact / covered-arm resident) via a
      // carried bare view dim of the same name
      def resolveAttr(a: Attribute): Option[String] =
        if (jbArmOf(a).isDefined) jbAttrCol(a)
        else infos.find(d => d.bare && d.key == a.name.toLowerCase).map(_.name)
      val serves: Seq[(Expression, String, Option[org.apache.spark.sql.Column])] =
        qItems.zipWithIndex.map { case (q, i) =>
          // PROVENANCE dispatch: any grouping item referencing an
          // extra-arm attribute must be served through the join-back —
          // even when its name or canonical text collides with a view
          // dim, the state cannot hold the arm's values
          val armRefs = q.e.references.exists(a => jbArmOf(a).isDefined)
          if (armRefs) q.e match {
            // a dim-table attribute keeps its own name as the output
            case a: AttributeReference =>
              val n = jbAttrCol(a).getOrElse(return None)
              (q.e, n, Some(org.apache.spark.sql.functions.col(n)))
            // a row-local expression whose refs are all served columns
            // (bare view dims and/or joined dim attrs) recomputes
            // post-join: f is constant within each joined partial row
            case _ =>
              val attrs = q.e.collect { case a: AttributeReference => a }
              if (!attrs.forall(a => resolveAttr(a).isDefined)) return None
              (q.e, s"_roll_$i",
                Some(org.apache.spark.sql.GraftExpressionBridge.column(
                  q.e.transform {
                    case a: AttributeReference =>
                      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                        .quoted(resolveAttr(a).get)
                  })))
          }
          else infos.find(_.key == q.key) match {
            case Some(d) => (q.e, d.name, None)
            case None =>
              val byBare = infos
                .find(d => d.bare && !q.isBare && q.refs == Set(d.key))
                .map { d =>
                  org.apache.spark.sql.GraftExpressionBridge.column(q.e.transform {
                    case a: AttributeReference =>
                      org.apache.spark.sql.catalyst.analysis
                        .UnresolvedAttribute.quoted(d.name)
                  })
                }
              def byTrunc = q.trunc.flatMap(qt =>
                infos.find(_.trunc.exists(vt => truncComposable(qt, vt)))
                  .map { d =>
                    if (qt.kind == "ts")
                      org.apache.spark.sql.functions.date_trunc(
                        qt.fmt, org.apache.spark.sql.functions.col(d.name))
                    else
                      org.apache.spark.sql.functions.trunc(
                        org.apache.spark.sql.functions.col(d.name), qt.fmt)
                  })
              (q.e, s"_roll_$i",
                Some(byBare.orElse(byTrunc).getOrElse(return None)))
          }
        }
      val exact = serves.forall(_._3.isEmpty) &&
        infos.map(_.key).toSet == dimSet
      val qConj = scala.collection.mutable.ArrayBuffer(filters.flatMap(conjunctsOf): _*)
      // parse failures must never escape an optimizer rule — an
      // unparseable stored predicate just disables this view's rewrite
      val viewConj =
        try meta.filter.toSeq.flatMap(f =>
          conjunctsOf(spark.sessionState.sqlParser.parseExpression(f)))
        catch { case scala.util.control.NonFatal(_) => return None }
      viewConj.foreach { vc =>
        val want = canon(vc)
        val ix = qConj.indexWhere(c => canon(c) == want)
        if (ix >= 0) qConj.remove(ix)
        else {
          // range implication: a strictly-tighter query comparison on the
          // same attribute also proves the view predicate — but is NOT
          // absorbed: it stays in the residual and re-applies on the
          // served rows, which the dim-only check below then requires to
          // be expressible (the attribute must be a view dim; bail
          // otherwise — exactly the conservative failure we want)
          if (!qConj.exists(c => implies(c, vc))) return None
        }
      }
      // whatever the view's filter did NOT absorb must be dim-only —
      // those predicates commute with GROUP BY and re-apply on the dims
      // (or, under join-back, on a joined dim table's own columns: the
      // residual applies after the join-back, exactly where the query's
      // own filter sat)
      val rest = qConj.toSeq
      val dimNames = meta.dims.map(_.toLowerCase).toSet
      // provenance-split, like the grouping items: an extra-arm attr must
      // resolve through the join-back; anything else must be a view dim
      if (!rest.forall(_.references.forall(a =>
          if (jbArmOf(a).isDefined) jbAttrCol(a).isDefined
          else dimNames.contains(a.name.toLowerCase))))
        return None
      if (rest.exists(!_.deterministic)) return None
      // map every output column of the aggregate to a served column:
      // grouping items by semantic equality (a bare attr compares by
      // exprId; an expression select item matches the grouping key it
      // restates), aggregates by the view's agg registry
      def viewDimOf(e: Expression): Option[String] =
        serves.collectFirst { case (g, n, _) if g.semanticEquals(e) => n }
      // DERIVED serving: aggregates the view never declared but whose
      // stored state determines exactly. Every sum AND avg stores the
      // running sum plus the non-null input count, so:
      //   avg(x)   ← a declared sum(x)/avg(x): sum ÷ cnt (bit-identical
      //              to a declared avg's finalization)
      //   sum(x)   ← a declared avg(x): its stored running sum
      //   count(x) ← a declared sum(x)/avg(x): its stored cnt (count
      //              counts exactly the non-null inputs)
      //   count(*) ← the state's live row count GRP_N — EVERY view
      //              maintains it, so any served query gets count(*) free
      // Each maps to a synthetic derived column the state read computes;
      // the result-type check below still gates every one (a decimal avg
      // finalizes as decimal and must bail).
      val derived =
        scala.collection.mutable.ArrayBuffer.empty[MaterializedView.MvDerived]
      // duplication-insensitive query aggregates served over the state's
      // group rows on the rollup path — count(DISTINCT …) and, under
      // join-back, min/max over drill attributes: (output column, the
      // full aggregate Column to compute)
      val derivedJoined = scala.collection.mutable
        .ArrayBuffer.empty[(String, org.apache.spark.sql.Column)]
      // extra-arm column names those servings need projected through the
      // join-back
      val jbRefNames = scala.collection.mutable.ArrayBuffer.empty[String]
      // a row-local expression rebuilt against the served plan: every
      // attribute resolves per [[resolveAttr]] (provenance-dispatched)
      def rebuiltCol(e2: Expression): Option[org.apache.spark.sql.Column] = {
        if (!e2.deterministic || e2.exists(_.isInstanceOf[SubqueryExpression]))
          return None
        val attrs = e2.collect { case a: AttributeReference => a }
        if (attrs.isEmpty || !attrs.forall(a => resolveAttr(a).isDefined)) None
        else {
          attrs.foreach(a =>
            if (jbArmOf(a).isDefined) jbRefNames += jbAttrCol(a).get)
          Some(org.apache.spark.sql.GraftExpressionBridge.column(e2.transform {
            case a: AttributeReference =>
              org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                .quoted(resolveAttr(a).get)
          }))
        }
      }
      // the serving of a count-DISTINCT child: a bare view dim by name,
      // an expression dim by canonical-text restatement, a row-local
      // expression over bare view dims (f is constant per state row, and
      // the state holds one row per dim tuple, so DISTINCT f(dims) over
      // state rows equals DISTINCT f(dims) over base rows), or — under
      // join-back — a joined dim table's own column or an expression
      // over served refs (DISTINCT is duplication-insensitive, so the
      // join's multiplicity is harmless). Provenance-dispatched like the
      // grouping items: an extra-arm attr never serves from the state.
      def cdServe(e: Expression): Option[org.apache.spark.sql.Column] =
        e match {
          case a: AttributeReference =>
            if (jbArmOf(a).isDefined)
              jbAttrCol(a).map { n =>
                jbRefNames += n; org.apache.spark.sql.functions.col(n) }
            else infos.find(d => d.bare && d.key == a.name.toLowerCase)
              .map(d => org.apache.spark.sql.functions.col(d.name))
          case e2 if e2.deterministic &&
              !e2.exists(_.isInstanceOf[SubqueryExpression]) =>
            if (e2.references.exists(a => jbArmOf(a).isDefined)) rebuiltCol(e2)
            else infos.find(_.key == canon(e2))
              .map(d => org.apache.spark.sql.functions.col(d.name))
              .orElse(rebuiltCol(e2))
          case _ => None
        }
      // does this (non-DISTINCT) aggregate call read only fact/covered
      // columns? An extra-arm attribute inside an agg INPUT means the
      // state cannot hold its partials — min/max re-derive below
      // (duplication-insensitive); everything else bails the view. This
      // closes the name-collision hole on the AGG side: a view agg over
      // fact `x` must never answer `sum(d.x)` just because the names
      // match.
      def aggArmFree(fn: AggregateFunction): Boolean =
        !fn.references.exists(a => jbArmOf(a).isDefined)
      // the live group-row weight: every state row stands for GRP_N fact
      // rows of its group (the weighted-drill-aggregate servings below)
      def grpN = org.apache.spark.sql.functions.col(MaterializedView.GRP_N)
      // is this drill-expression type one the weighted servings accept?
      // INTEGRAL only: long sums are modular-exact, so the serving equals
      // the unrewritten query bit-for-bit. float/double are deliberately
      // excluded — Σ e·GRP_N introduces products the query never
      // computes, so enabling the rewrite could flip low-order result
      // bits, unlike every other serving (all bit-exact); decimal is
      // excluded because the widened intermediate could mask an
      // overflow-to-null the narrower query sum produces.
      def weightedOk(e: Expression): Boolean = e.dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | LongType => true
        case _ => false
      }
      // Σ e·GRP_N serving a query sum over a drill expression. Non-ANSI
      // uses plain long arithmetic — modular wrap-around is identical on
      // both sides, so the serving is exact bit-for-bit including the
      // overflow corner. Under ANSI the per-row e·GRP_N long product
      // could overflow AND THROW where the original query's running sum
      // never peaks that high, so the products accumulate in
      // DECIMAL(38,0) instead (no long×long product can overflow 38
      // digits) and only the FINAL cast back to long throws — i.e.
      // exactly when the true total is outside long range, which is when
      // the query's own ANSI sum cannot succeed either.
      def weightedCol(e: Expression): Option[String] = {
        val f = org.apache.spark.sql.functions
        if (!weightedOk(e)) None
        else rebuiltCol(e).map { c =>
          val out = s"_djw_${derivedJoined.size}"
          val sum =
            if (spark.sessionState.conf.ansiEnabled)
              f.sum(c.cast("decimal(38,0)") * grpN).cast("long")
            else f.sum(c.cast("long") * grpN)
          derivedJoined += ((out, sum))
          out
        }
      }
      // weighted average: Σ e·GRP_N ÷ Σ GRP_N over non-null e, null on
      // an all-null group like the query's avg. Average over an integral
      // input accumulates in DOUBLE on both sides, so within the 2^53
      // envelope the serving is exact like the query; products are double
      // (never throw), so no ANSI gate is needed.
      def weightedAvg(e: Expression): Option[String] = {
        val f = org.apache.spark.sql.functions
        if (!weightedOk(e)) None
        else rebuiltCol(e).map { c =>
          val s = f.sum(c.cast("double") * grpN)
          val n = f.sum(f.when(c.isNotNull, grpN).otherwise(f.lit(0L)))
          val out = s"_djw_${derivedJoined.size}"
          derivedJoined += ((out, f.when(n > 0, s / n)))
          out
        }
      }
      def deriveAgg(fn: AggregateFunction): Option[String] = {
        def add(kind: String, src: String): String = {
          val out = s"_drv_${derived.size}"
          derived += MaterializedView.MvDerived(out, kind, src)
          out
        }
        // a declared sum/avg over the same input stores sum+cnt
        def srcAgg(e: Expression): Option[MvAgg] = aggInputOf(e).flatMap(q =>
          meta.aggs.find(a => (a.kind == "sum" || a.kind == "avg") &&
            inputMatches(spark, memberColsLc, a.input, q)))
        fn match {
          case Count(Seq(Literal(1, _))) => Some(add("star", ""))
          case Average(e, _) => srcAgg(e).map(s => add("avg", s.name))
          case Sum(e, _) => srcAgg(e).map(s => add("sum", s.name))
          case Count(Seq(e)) => srcAgg(e).map(s => add("cnt", s.name))
          case _ => None
        }
      }
      // EXPRESSION-over-aggregates serving (`sum(x)/count(*)`,
      // `max(x) - min(x)`, …): every aggregate CALL inside the output
      // expression maps to a view column and every remaining attribute to
      // a served dim; the surrounding row-local arithmetic then recomputes
      // identically over the state read. The template carries each
      // substitution's expected type so the result-type gate below can
      // verify per-node (the rebuilt expression's type then equals the
      // original's by construction). Markers are UnresolvedAttributes —
      // safe, the analyzed child contains none of its own.
      case class Tmpl(expr: Expression,
          needs: Seq[(String, org.apache.spark.sql.types.DataType)])
      def templateOf(child: Expression): Option[Tmpl] = {
        if (!child.deterministic ||
          child.exists(_.isInstanceOf[SubqueryExpression])) return None
        val needs = scala.collection.mutable
          .ArrayBuffer.empty[(String, org.apache.spark.sql.types.DataType)]
        var ok = true
        def mark(n: String, dt: org.apache.spark.sql.types.DataType): Expression = {
          needs += ((n, dt))
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(n)
        }
        // aggregate calls first (top-down), so their INPUT attributes are
        // never visited by the dim pass below
        val t = child.transformDown {
          case ae @ AggregateExpression(fn, Complete, false, None, _) =>
            // an extra-arm attribute inside an agg input: the state has
            // no partials for it (see aggArmFree) — but extrema are
            // duplication-insensitive, so min/max over drill attributes
            // re-derive post join-back even INSIDE arithmetic
            // (`max(d.x) - min(d.x)`); anything else bails the template
            if (!aggArmFree(fn)) fn match {
              case Min(e) => rebuiltCol(e) match {
                case Some(c) =>
                  val out = s"_djm_${derivedJoined.size}"
                  derivedJoined += ((out, org.apache.spark.sql.functions.min(c)))
                  mark(out, ae.dataType)
                case None => ok = false; ae
              }
              case Max(e) => rebuiltCol(e) match {
                case Some(c) =>
                  val out = s"_djm_${derivedJoined.size}"
                  derivedJoined += ((out, org.apache.spark.sql.functions.max(c)))
                  mark(out, ae.dataType)
                case None => ok = false; ae
              }
              case _ => ok = false; ae
            }
            else aggColumn(spark, memberColsLc, fn, meta.aggs).map(_.name).orElse(deriveAgg(fn)) match {
              case Some(n) => mark(n, ae.dataType)
              case None => ok = false; ae
            }
          case ae: AggregateExpression => ok = false; ae
        }
        if (!ok) return None
        // then whole served-dim subtrees (a bare dim attr, or an
        // expression-dim restatement inside larger arithmetic) — any
        // attribute still standing afterwards is unservable
        // `e.resolved` also skips any subtree containing a pass-1 marker
        // (semanticEquals on unresolved nodes throws)
        val t2 = t.transformDown {
          case e if e.resolved && viewDimOf(e).isDefined =>
            mark(viewDimOf(e).get, e.dataType)
        }
        if (ok && !t2.exists(_.isInstanceOf[AttributeReference]))
          Some(Tmpl(t2, needs.toSeq))
        else None
      }
      val mapping: Seq[(NamedExpression, Either[String, Tmpl])] =
        agg.aggregateExpressions.map {
          case a: AttributeReference if viewDimOf(a).isDefined =>
            (a, scala.Left(viewDimOf(a).get))
          case al @ Alias(ae @ AggregateExpression(fn, Complete, false, None, _), _) =>
            if (aggArmFree(fn))
              (al, scala.Left(aggColumn(spark, memberColsLc, fn, meta.aggs).map(_.name)
                .orElse(deriveAgg(fn)).getOrElse(return None)))
            else fn match {
              // extrema over drill attributes are duplication-insensitive:
              // recompute post-join over the state's group rows
              case Min(e) =>
                val c = rebuiltCol(e).getOrElse(return None)
                val out = s"_djm_${derivedJoined.size}"
                derivedJoined += ((out, org.apache.spark.sql.functions.min(c)))
                (al, scala.Left(out))
              case Max(e) =>
                val c = rebuiltCol(e).getOrElse(return None)
                val out = s"_djm_${derivedJoined.size}"
                derivedJoined += ((out, org.apache.spark.sql.functions.max(c)))
                (al, scala.Left(out))
              // WEIGHTED drill aggregates: each state row stands for
              // GRP_N fact rows of its group, and the join-back
              // multiplies state rows exactly as it multiplies that
              // group's fact rows (every arm's left key chains back to
              // view dims, so all of a group's rows share it) —
              //   sum_query(e)   = Σ_served e·GRP_N
              //   count_query(e) = Σ_served GRP_N over non-null e
              //   avg_query(e)   = the ratio
              // INTEGRAL inputs only (see weightedOk): long sums are
              // modular-exact, float/double and decimal bail so every
              // serving the rewrite produces stays bit-exact.
              case Sum(e, _) => weightedCol(e) match {
                case Some(out) => (al, scala.Left(out))
                case None => return None
              }
              case Count(children) if children.nonEmpty =>
                val cs = children.map(c => rebuiltCol(c).getOrElse(return None))
                val nn = cs.map(_.isNotNull).reduce(_ && _)
                val out = s"_djw_${derivedJoined.size}"
                derivedJoined += ((out,
                  org.apache.spark.sql.functions.coalesce(
                    org.apache.spark.sql.functions.sum(
                      org.apache.spark.sql.functions.when(nn, grpN)
                        .otherwise(org.apache.spark.sql.functions.lit(0L))),
                    org.apache.spark.sql.functions.lit(0L))))
                (al, scala.Left(out))
              case Average(e, _) => weightedAvg(e).map(out =>
                (al, scala.Left(out))).getOrElse(return None)
              case _ => return None
            }
          case al @ Alias(child, _) if viewDimOf(child).isDefined =>
            (al, scala.Left(viewDimOf(child).get))
          // count(DISTINCT dims…): served as a distinct count over the
          // state's live group rows — exact, because the state holds
          // exactly one row per dim tuple (NULL semantics match: Count
          // skips rows with any NULL child on both sides). Each child
          // must be a VIEW dim — grouped by the query or not — matched by
          // name (bare) or canonical text (expression dim). A query whose
          // dims match the view exactly routes through the rollup path
          // too (identity re-aggregation — each state row its own group),
          // so the same serving covers the exact shape.
          case al @ Alias(AggregateExpression(Count(children), Complete, true, None, _), _)
              if children.nonEmpty =>
            // every child must serve, or the whole view bails (the
            // catch-all below would bail on the DISTINCT call anyway)
            val cols = children.map(c => cdServe(c).getOrElse(return None))
            val out = s"_dcd_${derivedJoined.size}"
            derivedJoined += ((out,
              org.apache.spark.sql.functions.count_distinct(cols.head, cols.tail: _*)))
            (al, scala.Left(out))
          // anything else aliased: rebuild as row-local arithmetic over
          // served aggregates and dims, or bail conservatively
          case al @ Alias(child, _) =>
            (al, scala.Right(templateOf(child).getOrElse(return None)))
          case _ => return None
        }
      // build the replacement: an exact-dim view serves a plain state read
      // (dim filters re-applied on top); a COARSER query re-aggregates the
      // state table via readRollup, with the dim predicates pushed BELOW
      // the re-aggregation (they may reference rolled-away dims). Either
      // way a Project re-aliases view columns under the ORIGINAL output
      // exprIds, so everything above the aggregate keeps resolving.
      // count(DISTINCT)/joined-agg and join-back force the rollup path
      // even on exact dims: the distinct count / joined grouping is
      // computed by re-aggregating the state's group rows
      val exactServe = exact && derivedJoined.isEmpty && jbCtx.isEmpty
      val viewPlan =
        if (exactServe)
          view.readDerived(None, derived.toSeq).queryExecution.analyzed
        else {
          val preCols = rest.map(c =>
            org.apache.spark.sql.GraftExpressionBridge.column(c.transform {
              case a: AttributeReference =>
                org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
            }))
          val roll = serves.map {
            case (_, n, None) => (n, org.apache.spark.sql.functions.col(n))
            case (_, n, Some(c)) => (n, c)
          }
          // the join-back transform applied to the state read before
          // re-aggregation: each arm's dim is scanned LIVE via the same
          // graft snapshot source the query uses, projected to its join
          // keys plus the columns the serving actually references
          val joinBackFn: org.apache.spark.sql.DataFrame =>
              org.apache.spark.sql.DataFrame = jbCtx match {
            case None => identity
            case Some((arms, schemas)) =>
              val wantedNames: Seq[String] =
                (serves.collect { case (_, n, Some(_)) => n } ++
                  qItems.flatMap(_.refs) ++ // refs of expression servings
                  jbRefNames ++
                  rest.flatMap(_.references.map(_.name)) ++
                  arms.flatMap(_.lks)).distinct
                  .filterNot(w => stateNames.contains(w.toLowerCase))
              st => arms.zipWithIndex.foldLeft(st) {
                case (acc, (arm, ix)) =>
                  val mine = schemas(ix)
                  val need = (arm.dks ++ wantedNames.filter(w =>
                    mine.exists(_.equalsIgnoreCase(w)))).distinct
                  val dimDf = spark.read.format("graft").load(arm.path)
                    .select(need.map(org.apache.spark.sql.functions.col): _*)
                  acc.join(dimDf,
                    arm.lks.zip(arm.dks).map { case (l, d) =>
                      org.apache.spark.sql.functions.col(l) ===
                        org.apache.spark.sql.functions.col(d)
                    }.reduce(_ && _),
                    if (arm.outer) "left_outer" else "inner")
              }
          }
          try view.readRollupExprs(roll, preCols, derived.toSeq,
              derivedJoined.toSeq, joinBackFn)
            .queryExecution.analyzed
          catch { case scala.util.control.NonFatal(_) => return None }
        }
      def viewAttr(name: String): Option[AttributeReference] =
        viewPlan.output.collectFirst {
          case a: AttributeReference if a.name.equalsIgnoreCase(name) => a
        }
      // exact result-type match or bail (e.g. decimal avg finalized as
      // double); templates gate each substituted node's type, so the
      // rebuilt expression's type equals the original's by construction
      mapping.foreach {
        case (orig, scala.Left(viewCol)) =>
          val va = viewAttr(viewCol).getOrElse(return None)
          if (va.dataType != orig.dataType) return None
        case (_, scala.Right(t)) =>
          t.needs.foreach { case (n, dt) =>
            val va = viewAttr(n).getOrElse(return None)
            if (va.dataType != dt) return None
          }
      }
      if (exactServe && rest.exists(_.references.exists(a => viewAttr(a.name).isEmpty)))
        return None
      val refiltered =
        if (!exactServe) viewPlan // rollup path: filters already below the re-agg
        else rest.foldLeft(viewPlan) { (acc, cond) =>
          Filter(cond.transform {
            case a: AttributeReference if viewAttr(a.name).isDefined => viewAttr(a.name).get
          }, acc)
        }
      val out = mapping.map {
        case (orig, scala.Left(viewCol)) =>
          Alias(viewAttr(viewCol).get, orig.name)(exprId = orig.exprId)
        case (orig, scala.Right(t)) =>
          val e = t.expr.transformDown {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              viewAttr(u.name).get // present: gated via t.needs above
          }
          Alias(e, orig.name)(exprId = orig.exprId)
      }
      Some(Project(out, refiltered))
    }
    // (factPath, query arms) join-back orientations: the parsed one,
    // plus — for a two-table INNER join — the COMMUTED one (the user may
    // write dim ⋈ fact; inner ⋈ commutes, so the view's base can sit on
    // either side). The reversed arm's provenance is the LEFT subtree's
    // leaf-scan output; a LEFT-outer join does not commute and keeps
    // only the parsed orientation. Built before the direct-serve return
    // below so the fuzz seam covers directly-served queries too.
    val jbOrients: Seq[(String, Seq[ArmScan])] =
      joined.toSeq.flatMap { case (lp, lOut, arm, _) =>
        val fwd = (lp, Seq(arm))
        if (arm.outer) Seq(fwd)
        else Seq(fwd, (arm.path,
          Seq(ArmScan(lp, arm.pairs.map(_.swap), outer = false, lOut))))
      } ++ starred.toSeq.map { case (fp, arms, _) => (fp, arms) }
    // fuzz dry-run (see [[fuzzJoinBackDryRun]]): the matcher runs for
    // every registered view against every orientation's arms; results
    // are discarded, throws count via the per-Aggregate guard. Runs
    // BEFORE the direct-serve early return — a join/star query that
    // serves directly must still exercise the join-back matcher, or the
    // fuzz surface silently shrinks to the queries no view covers.
    if (fuzzJoinBackDryRun) jbOrients.foreach { case (_, arms) =>
      registered.foreach { p =>
        val m = MaterializedView.load(spark, p)
        val meta = m.meta
        extraArmsOf(meta.joins.map(lcSig), arms).foreach { extra =>
          if (extra.nonEmpty) { serveWith(m, meta, Some(extra)); () }
        }
      }
    }
    val direct = freshCandidates.flatMap { case (v, m) => serveWith(v, m) }.nextOption()
    if (direct.isDefined) return direct
    // JOIN-BACK candidates — the drill-across rewrite: a join/star query
    // whose fact a view covers, where the view's OWN arms (possibly none)
    // are a SUBSET of the query's, serves by re-joining the state's
    // partials to the remaining arms' dim tables read live (see
    // serveWith's jbCtx) — the classic summary-table + dimension drill.
    // Tried only after every direct candidate missed; freshness gates on
    // the view's own cursors (fact + its member dims) — the EXTRA dims
    // are scanned at the same live snapshot the query itself would read.
    if (jbOrients.isEmpty) return None
    // no per-item pre-filter here: a grouping item may be a dim-table
    // attribute or an expression over them, undecidable without the
    // dim schemas — serve-time resolution gates instead
    def jbTry(fp: String, arms: Seq[ArmScan]): Option[LogicalPlan] = {
      val jbCandidates = registered.flatMap { p =>
        shapeOf(spark, p) match {
          case Some(s) if s.basePath == fp &&
              extraArmsOf(s.joinSig, arms).exists(_.nonEmpty) =>
            Some((p, s.dims))
          case _ => None
        }
      }.sortBy { case (_, ds) => ds.size }
      val jbFresh = jbCandidates.iterator.flatMap { case (p, _) =>
        try {
          val m = MaterializedView.load(spark, p)
          val meta = m.meta // fresh read — authoritative over the cache
          val extra = extraArmsOf(meta.joins.map(lcSig), arms)
          if (meta.basePath == fp && extra.exists(_.nonEmpty) &&
            m.servableFresh(meta, latestOf))
            Some((m, meta, extra.get))
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }
      jbFresh.flatMap { case (v, m, extra) =>
        serveWith(v, m, Some(extra)) }.nextOption()
    }
    jbOrients.iterator.flatMap { case (fp, arms) => jbTry(fp, arms) }
      .nextOption()
  }
}

/** Extract a maintainable (basePath, dims, aggs, joins, filter) from an
  * analyzed MV definition query — the SQL `CREATE MATERIALIZED VIEW … AS
  * SELECT` front half. Deliberately the mirror of [[GraftMvRewrite]]'s
  * matcher: anything this accepts, the rewrite can serve. */
private[sql] object GraftMvShape {

  def extract(plan: LogicalPlan)
      : Either[String, (String, Seq[String], Seq[MvAgg], Seq[MvJoin],
        Option[String], Map[String, String])] =
    plan match {
      case SubqueryAlias(_, c) => extract(c)
      case agg0: Aggregate =>
        // ROLLUP/CUBE/GROUPING SETS definitions refuse BY NAME: the state
        // table holds one row per full dim tuple, and the rewrite serves
        // grouping-sets QUERIES from a plain-GROUP-BY view — materializing
        // the Expand itself would store redundant subtotal rows the
        // maintenance algebra does not model
        if (agg0.child.exists(_.isInstanceOf[Expand]))
          return scala.Left("ROLLUP/CUBE/GROUPING SETS cannot be " +
            "materialized — define the view over the plain GROUP BY dims; " +
            "grouping-sets queries are then SERVED from it by the " +
            "automatic rewrite")
        // same projection inlining as the rewrite matcher: the analyzer
        // parks complex grouping expressions in a Project below
        val agg = GraftMvRewrite.inlineProjects(agg0)
        // plain snapshot, a two-table inner equi-join (the LEFT table
        // becomes the maintenance base — correctness is join-symmetric),
        // or a left-deep multi-dim star (fact first in the FROM)
        val (path, filters, join) =
          GraftMvRewrite.baseScan(agg.child)
            .map { case (p, fs) => (p, fs, Seq.empty[MvJoin]) }
            .orElse(GraftMvRewrite.joinScan(agg.child).map {
              case (lp, _, arm, fs) =>
                (lp, fs, Seq(MvJoin(arm.path, arm.lks, arm.dks, 0L, arm.outer)))
            })
            .orElse(GraftMvRewrite.starScan(agg.child).map {
              case (fp, arms, fs) => (fp, fs,
                arms.map(a => MvJoin(a.path, a.lks, a.dks, 0L, a.outer)))
            })
            .getOrElse(
          return scala.Left("FROM must resolve to a plain graft table snapshot " +
            "or an INNER / LEFT equi-join star over one (no time travel / " +
            "incremental / change-feed options, ON conjunctions of a = b only, " +
            "fact table first)"))
        // a WHERE defines a FILTERED view: σ_pred(F⋈D…) GROUP BY dims —
        // maintained by filtering each signed delta term, served to
        // queries whose WHERE implies the predicate. Must be
        // deterministic and subquery-free (a subquery's value can change
        // independently of the member tables' versions).
        filters.foreach { f =>
          if (!f.deterministic)
            return scala.Left(s"the WHERE predicate must be deterministic: ${f.sql}")
          if (f.exists(_.isInstanceOf[SubqueryExpression]))
            return scala.Left(s"the WHERE predicate must not contain a subquery: ${f.sql}")
        }
        // strip qualifiers before rendering: the stored text re-analyzes
        // against the BASE table at create/refresh, where the definition
        // query's view alias (`fwhere_v.amt`) means nothing
        val filterSql =
          if (filters.isEmpty) None
          else Some(filters.map(_.transform {
            case a: AttributeReference => a.withQualifier(Seq.empty)
          }.sql).mkString(" AND "))
        // grouping keys: bare columns, or deterministic row-local
        // EXPRESSIONS named by an aliased select item (`date_trunc('day',
        // ts) AS day GROUP BY date_trunc('day', ts)`) — the time-bucketed
        // dashboard shape; the expression commutes with the signed delta
        // exactly like a filter, so it maintains incrementally
        val dimExprs = scala.collection.mutable.LinkedHashMap.empty[String, String]
        val dims = agg.groupingExpressions.map {
          case a: AttributeReference => a.name
          case e =>
            if (!e.deterministic)
              return scala.Left(s"grouping expression must be deterministic: ${e.sql}")
            if (e.exists(_.isInstanceOf[SubqueryExpression]))
              return scala.Left(s"grouping expression must not contain a subquery: ${e.sql}")
            val al = agg.aggregateExpressions.collectFirst {
              case al: Alias if al.child.semanticEquals(e) => al
            }.getOrElse(return scala.Left(
              s"grouping expression ${e.sql} must be aliased in the SELECT " +
                "list (e.g. date_trunc('DAY', ts) AS day)"))
            dimExprs += al.name -> e.transform {
              case a: AttributeReference => a.withQualifier(Seq.empty)
            }.sql
            al.name
        }
        val dimSet = dims.map(_.toLowerCase).toSet
        val aggs = agg.aggregateExpressions.flatMap {
          case a: AttributeReference if dimSet.contains(a.name.toLowerCase) => None
          // the select item NAMING an expression dim is the dim, not an agg
          case al: Alias if agg.groupingExpressions.exists(g =>
              !g.isInstanceOf[AttributeReference] &&
                g.semanticEquals(al.child)) => None
          case al @ Alias(a: AttributeReference, _)
              if dimSet.contains(a.name.toLowerCase) =>
            if (al.name.equalsIgnoreCase(a.name)) None
            else return scala.Left(s"dim columns cannot be re-aliased (${al.sql})")
          case al @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
            // CREATE-only extension over aggSpec: approx_count_distinct(x)
            // defines an hll agg (maintained as a Datasketches sketch; the
            // stored estimate is the sketch's, not HLL++'s — both are
            // "approximate distinct", but the DIFFERENT estimator is why
            // the query-rewrite side never maps this function: a rewrite
            // must not change a query's result)
            val spec = fn match {
              case h: HyperLogLogPlusPlus => h.child match {
                case a: AttributeReference =>
                  // the maintained sketch is hll_sketch_agg's: only its
                  // input types are maintainable, and its precision is the
                  // default lgK — validate BOTH here so the user gets this
                  // message, not a DATATYPE_MISMATCH from deep inside
                  // state creation (which would also strand a state dir)
                  a.dataType match {
                    case IntegerType | LongType | StringType | BinaryType =>
                    case dt => return scala.Left(
                      s"approx_count_distinct over ${dt.simpleString} is not " +
                        "maintainable — the sketch state supports int, bigint, " +
                        "string, binary inputs")
                  }
                  if (h.relativeSD != 0.05) return scala.Left(
                    "approx_count_distinct with an explicit relativeSD is not " +
                      "supported — the maintained sketch has fixed default " +
                      "precision; drop the second argument")
                  Some(("hll", a.name))
                case _ => None
              }
              case _ => GraftMvRewrite.aggSpec(fn)
            }
            spec match {
              case Some((kind, input)) => Some(MvAgg(al.name, kind, input))
              case None => return scala.Left(
                s"unsupported aggregate ${al.sql} — count/sum/avg/min/max over " +
                  "a column or row-local expression, approx_count_distinct over " +
                  "a column (no DISTINCT, no FILTER)")
            }
          case e => return scala.Left(s"unsupported select item ${e.sql} — " +
            "alias every aggregate (e.g. count(1) AS n)")
        }
        if (aggs.isEmpty) scala.Left("the definition needs at least one aggregate")
        else scala.Right((path, dims, aggs, join, filterSql, dimExprs.toMap))
      // SELECT DISTINCT analyzes as Distinct(Project): refuse by name,
      // pointing at the maintainable equivalent (the no-agg grouping
      // SERVING means DISTINCT queries still ride a plain GROUP BY view)
      case _: Distinct =>
        scala.Left("SELECT DISTINCT is not a maintainable definition — " +
          "define the columns as GROUP BY dims with at least one aggregate " +
          "(count(1) AS n); DISTINCT queries over the base are then served " +
          "from the view's dim rows by the automatic rewrite")
      // HAVING resolves to a Filter above the Aggregate: refuse by name
      // (the filter reads aggregated values, which the signed-delta
      // maintenance cannot re-derive per group without the full state)
      case f: Filter if f.child.exists(_.isInstanceOf[Aggregate]) =>
        scala.Left("HAVING is not maintainable in a materialized view " +
          "definition — materialize the plain aggregate; HAVING queries " +
          "over it are served by the automatic rewrite")
      case _ => scala.Left("the definition must be a single GROUP BY aggregate " +
        "over a graft table")
    }
}
