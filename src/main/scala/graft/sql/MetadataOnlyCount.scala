package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, In, InSet, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.LakeTable
import graft.sources.{GraftCatalogTable, GraftRelation}

/** Answer unfiltered `count(*)` / `min(col)` / `max(col)` over a graft
  * table from commit-log stats — zero data files opened (Delta's
  * metadata-only query idea). At 100 TB this turns a full-table scan into
  * one driver-side metadata read.
  *
  * The rewrite fires only when the metadata answer is EXACT:
  *   - plain snapshot reads (no incremental/CDF window, no `_ro`/`_rt`
  *     view override), optionally time-traveled;
  *   - `count(*)`: no live MoR log files ([[LakeTable.exactRowCount]] —
  *     log rows over-count contested keys); deletion vectors stay exact
  *     (rows − dvRows);
  *   - `min`/`max`: additionally no DVs at all (one could have killed the
  *     extremal row), the column is the record key or a declared stats
  *     column, every live file has non-sentinel stats
  *     ([[LakeTable.fileExtremes]]), and the type round-trips the rendered
  *     footer form exactly (integral, float/double via Java's reversible
  *     toString, string, date, timestamp — graft writes files with parquet's
  *     default untruncated footer statistics);
  *   - nothing between the aggregate and the scan but aliases/projections
  *     of the scan's own attributes (resolved by exprId, so a renaming
  *     projection bails out rather than answering for the wrong column);
  *   - every aggregate is bare and non-distinct with no FILTER clause.
  *
  * Escape hatch: `spark.graft.metadataCount.enabled=false`.
  */
object GraftMetadataOnlyCount extends Rule[LogicalPlan] {

  private sealed trait Want
  private case object WantCount extends Want
  private case class WantExtreme(name: String, dt: DataType, isMin: Boolean) extends Want
  /** `SUM(col)` from stored per-file sums; `resultDt` is Spark's Sum
    * result type (LongType for integral input, widened decimal for
    * decimal input) so the LocalRelation value matches the plan's type. */
  private case class WantSum(name: String, resultDt: DataType) extends Want
  /** `COUNT(col)` — non-null count from the same stored per-file pairs. */
  private case class WantNonNull(name: String) extends Want

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    if (!spark.conf.get("spark.graft.metadataCount.enabled", "true").toBoolean) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, aggs, child, _) if aggs.nonEmpty =>
        (for {
          (path, resolveAsOf, relOut, allowed) <- scanTarget(child)
          wants <- traverse(aggs)(classify(_, relOut))
          values <- answer(spark, path, resolveAsOf, wants, allowed)
        } yield LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
          .getOrElse(agg)
    }
  }

  /** Decompose a filter condition into "partition attribute ∈ literal set"
    * — EqualTo / IN / InSet on ONE attribute, AND-composed. Values are
    * rendered to the stored partitionValue string form (exact for string
    * and integral types only). Anything else → None (rule bails). */
  private def partitionPredicate(cond: Expression,
      relOut: Seq[AttributeReference]): Option[(String, Set[String])] = {
    def lit2s(l: Literal): Option[String] = l match {
      case Literal(null, _) => None // = NULL matches nothing; bail
      case Literal(v: UTF8String, StringType) => Some(v.toString)
      case Literal(v, ByteType | ShortType | IntegerType | LongType) => Some(v.toString)
      case _ => None
    }
    def nameOf(a: AttributeReference): Option[String] =
      relOut.find(_.exprId == a.exprId).map(_.name)
    cond match {
      case EqualTo(a: AttributeReference, l: Literal) =>
        for { n <- nameOf(a); s <- lit2s(l) } yield (n, Set(s))
      case EqualTo(l: Literal, a: AttributeReference) =>
        for { n <- nameOf(a); s <- lit2s(l) } yield (n, Set(s))
      case In(a: AttributeReference, ls) if ls.forall(_.isInstanceOf[Literal]) =>
        for {
          n <- nameOf(a)
          ss <- traverse(ls)(l => lit2s(l.asInstanceOf[Literal]))
        } yield (n, ss.toSet)
      case InSet(a: AttributeReference, vs) =>
        nameOf(a).map(n => (n, vs.filter(_ != null).map {
          case u: UTF8String => u.toString
          case v => v.toString
        }.toSet))
      case And(x, y) =>
        for {
          (nx, vx) <- partitionPredicate(x, relOut)
          (ny, vy) <- partitionPredicate(y, relOut)
          if nx == ny
        } yield (nx, vx.intersect(vy))
      case _ => None
    }
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }

  private def classify(e: NamedExpression,
      relOut: Seq[AttributeReference]): Option[Want] = {
    val ae = e match {
      case Alias(a: AggregateExpression, _) => Some(a)
      case a: AggregateExpression => Some(a)
      case _ => None
    }
    ae.flatMap {
      case AggregateExpression(Count(children), Complete, false, None, _)
          if children.forall { case Literal(v, _) => v != null; case _ => false } =>
        Some(WantCount)
      case AggregateExpression(Count(Seq(a: AttributeReference)), Complete, false, None, _) =>
        relOut.find(_.exprId == a.exprId).map(r => WantNonNull(r.name))
      case AggregateExpression(Min(a: AttributeReference), Complete, false, None, _) =>
        relOut.find(_.exprId == a.exprId).map(r => WantExtreme(r.name, r.dataType, isMin = true))
      case AggregateExpression(Max(a: AttributeReference), Complete, false, None, _) =>
        relOut.find(_.exprId == a.exprId).map(r => WantExtreme(r.name, r.dataType, isMin = false))
      case AggregateExpression(s @ Sum(a: AttributeReference, _), Complete, false, None, _) =>
        relOut.find(_.exprId == a.exprId).map(r => WantSum(r.name, s.dataType))
      case _ => None
    }
  }

  /** The aggregate's child must bottom out in a plain graft snapshot scan
    * through row-count-preserving nodes only; scan attributes are tracked
    * by exprId so projection renames cannot mislabel a column. The time
    * travel version is resolved LAZILY (a function of the loaded table) so
    * `timestampAsOf` reads answer for the right snapshot. */
  private def scanTarget(p: LogicalPlan): Option[(String,
      LakeTable => Option[Long], Seq[AttributeReference],
      Option[(String, Set[String])])] =
    p match {
      case SubqueryAlias(_, c) => scanTarget(c)
      case Project(_, c) => scanTarget(c)
      // a partition-predicate Filter keeps the plan answerable: the
      // metadata restricts to the allowed partitionValues (validated
      // against the table's partition column inside `answer`)
      case Filter(cond, c) =>
        scanTarget(c).flatMap { case (path, r, out, prev) =>
          partitionPredicate(cond, out).flatMap { case (name, vals) =>
            prev match {
              case None => Some((path, r, out, Some((name, vals))))
              case Some((pn, pv)) if pn == name =>
                Some((path, r, out, Some((name, pv.intersect(vals)))))
              case _ => None
            }
          }
        }
      case lr @ LogicalRelation(rel: GraftRelation, _, _, _, _)
          if !rel.parameters.contains("incremental.since") &&
            !rel.parameters.contains("changes.since") &&
            rel.parameters.getOrElse("view", "snapshot").equalsIgnoreCase("snapshot") =>
        val resolve: LakeTable => Option[Long] = t =>
          rel.parameters.get("versionAsOf").map(_.toLong)
            .orElse(rel.parameters.get("timestampAsOf")
              .map(s => t.versionAt(LakeTable.parseUserTimestamp(s))))
        Some((rel.path, resolve,
          lr.output.collect { case a: AttributeReference => a }, None))
      case r: DataSourceV2Relation =>
        r.table match {
          case t: GraftCatalogTable =>
            Some((t.path, _ => t.asOf,
              r.output.collect { case a: AttributeReference => a }, None))
          case _ => None
        }
      case _ => None
    }

  private def answer(spark: SparkSession, path: String,
      resolveAsOf: LakeTable => Option[Long], wants: Seq[Want],
      allowed: Option[(String, Set[String])]): Option[Seq[Any]] =
    try {
      val t = LakeTable.load(spark, path)
      val asOf = resolveAsOf(t)
      // a filter is only answerable when it constrains the partition column
      allowed.foreach { case (name, _) =>
        if (!t.specAt(asOf).partition.exists(_.equalsIgnoreCase(name))) return None
      }
      val vals = allowed.map(_._2)
      traverse(wants) {
        case WantCount => vals match {
          case None => t.exactRowCount(asOf).map(n => n: Any)
          case Some(vs) => t.partitionRowCounts(asOf)
            .map(m => vs.toSeq.map(v => m.getOrElse(v, 0L)).sum: Any)
        }
        case WantExtreme(name, dt, isMin) => vals match {
          case None => metaExtreme(t, name, dt, isMin, asOf)
          case Some(vs) => metaExtremeByPartition(t, name, dt, isMin, asOf).map { m =>
            val sel = m.collect { case (pv, v) if vs.contains(pv) => v }
            // empty selection = no rows in the allowed partitions → NULL,
            // the exact SQL answer for MIN/MAX over zero rows
            if (sel.isEmpty) null
            else sel.reduce((a, b) => if (isMin == lessThan(a, b)) a else b)
          }
        }
        case WantSum(name, resultDt) =>
          metaSumPairs(t, name, asOf, vals).flatMap(ps => renderSum(ps, resultDt))
        case WantNonNull(name) =>
          metaSumPairs(t, name, asOf, vals).map(ps => ps.map(_._2).sum: Any)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The live (sum, nonNull) pairs of a stat'd column, optionally
    * restricted to a set of stored partitionValue strings. */
  private def metaSumPairs(t: LakeTable, name: String, asOf: Option[Long],
      allowed: Option[Set[String]]): Option[Seq[(String, Long)]] =
    allowed match {
      case None => t.fileSums(name, asOf)
      case Some(vs) => t.fileSumsWithPartition(name, asOf)
        .map(_.collect { case (pv, sv) if vs.contains(pv) => sv })
    }

  /** Fold stored per-file sums into Spark's internal value for the Sum
    * result type: Long for integral input (bail rather than reproduce
    * overflow wrap), Decimal for decimal input, NULL over zero non-null
    * rows (the SQL answer). Wrapped in Some(Some(v))-style Option[Any]
    * where the inner value may legally be null. */
  private def renderSum(pairs: Seq[(String, Long)], resultDt: DataType): Option[Any] = {
    if (pairs.forall(_._2 == 0L)) return Some(null)
    val total = pairs.filter(_._2 > 0)
      .map(p => new java.math.BigDecimal(p._1)).reduce(_ add _)
    resultDt match {
      case LongType =>
        try Some(total.longValueExact())
        catch { case _: ArithmeticException => None }
      case d: DecimalType =>
        val v = org.apache.spark.sql.types.Decimal(total)
        if (v.changePrecision(d.precision, d.scale)) Some(v) else None
      case _ => None
    }
  }

  /** Exact commit-log min/max of a stat'd column in Spark's internal form —
    * None whenever metadata can't answer exactly (shared with the DSv2
    * aggregate push-down, [[graft.sources.GraftScanBuilder]]). */
  private[graft] def metaExtreme(t: LakeTable, name: String, dt: DataType,
      isMin: Boolean, asOf: Option[Long]): Option[Any] =
    t.fileExtremes(name, asOf).flatMap { perFile =>
      val side = perFile.map(mm => if (isMin) mm._1 else mm._2)
      traverse(side)(parse(_, dt)).map(_.reduce { (a, b) =>
        val lt = lessThan(a, b)
        if (isMin == lt) a else b
      })
    }

  /** Per-PARTITION exact min/max of a stat'd column, keyed by the stored
    * partitionValue string — the grouped sibling of [[metaExtreme]] behind
    * the `GROUP BY <partition>` DSv2 aggregate push-down. */
  private[graft] def metaExtremeByPartition(t: LakeTable, name: String,
      dt: DataType, isMin: Boolean, asOf: Option[Long]): Option[Map[String, Any]] =
    t.fileExtremesWithPartition(name, asOf).flatMap { perFile =>
      val reduced = perFile.groupBy(_._1).map { case (pv, files) =>
        val side = files.map { case (_, mm) => if (isMin) mm._1 else mm._2 }
        traverse(side)(parse(_, dt)).map(v => pv -> v.reduce { (a, b) =>
          if (isMin == lessThan(a, b)) a else b
        })
      }
      if (reduced.exists(_.isEmpty)) None else Some(reduced.map(_.get).toMap)
    }

  /** Exact commit-log SUM of a sum-stat'd column in Spark's internal form
    * (value may legally be null — SUM over zero non-null rows); None when
    * metadata can't answer exactly. Shared with the DSv2 push-down. */
  private[graft] def metaSum(t: LakeTable, name: String, resultDt: DataType,
      asOf: Option[Long]): Option[Any] =
    t.fileSums(name, asOf).flatMap(ps => renderSum(ps, resultDt))

  /** Per-PARTITION exact SUM, keyed by stored partitionValue string. */
  private[graft] def metaSumByPartition(t: LakeTable, name: String,
      resultDt: DataType, asOf: Option[Long]): Option[Map[String, Any]] =
    t.fileSumsWithPartition(name, asOf).flatMap { perFile =>
      val grouped = perFile.groupBy(_._1).map { case (pv, fs) =>
        renderSum(fs.map(_._2), resultDt).map(pv -> _)
      }
      if (grouped.exists(_.isEmpty)) None else Some(grouped.map(_.get).toMap)
    }

  /** Exact commit-log COUNT(col) (non-null count). */
  private[graft] def metaNonNull(t: LakeTable, name: String,
      asOf: Option[Long]): Option[Long] =
    t.fileSums(name, asOf).map(_.map(_._2).sum)

  /** Per-PARTITION exact COUNT(col). */
  private[graft] def metaNonNullByPartition(t: LakeTable, name: String,
      asOf: Option[Long]): Option[Map[String, Long]] =
    t.fileSumsWithPartition(name, asOf).map(_.groupBy(_._1)
      .map { case (pv, fs) => pv -> fs.map(_._2._2).sum })

  /** A stored partitionValue string in Spark's internal form (null
    * partition sentinel → null). Only exact-round-trip types. */
  private[graft] def parsePartitionValue(pv: String, dt: DataType): Option[Any] =
    if (pv == "__HIVE_DEFAULT_PARTITION__") Some(null) else parse(pv, dt)

  /** Parse a FooterStats-rendered value back to Spark's internal form —
    * only for types where the string round-trip is exact. */
  private def parse(s: String, dt: DataType): Option[Any] = dt match {
    case LongType => s.toLongOption
    case IntegerType => s.toIntOption
    case ShortType => s.toShortOption
    case ByteType => s.toByteOption
    case DoubleType => s.toDoubleOption
    case FloatType => s.toFloatOption
    case StringType => Some(UTF8String.fromString(s))
    case DateType => s.toIntOption // parquet DATE = int32 days, Spark internal too
    case TimestampType => s.toLongOption // int64 micros on both sides
    case TimestampNTZType => s.toLongOption // ditto (Spark 4 reads no-tz parquet as NTZ)
    case _ => None
  }

  private def lessThan(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    case (x: Short, y: Short) => x < y
    case (x: Byte, y: Byte) => x < y
    case (x: Double, y: Double) => x < y
    case (x: Float, y: Float) => x < y
    case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
    case _ => false
  }
}
