package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One aggregate of a materialized view: `kind` ∈ count | sum | avg | min |
  * max over `input` (a base-table column; `"*"` only for count). `name` is
  * the output column. */
case class MvAgg(name: String, kind: String, input: String) {
  require(Set("count", "sum", "avg", "min", "max").contains(kind), s"unknown agg kind $kind")
  require(kind == "count" || input != "*", s"$kind requires a column input")
}

/** Incrementally-maintained aggregate over a CoW [[LakeTable]] — the
  * materialized-view pattern a 100 TB pipeline needs: the base table takes
  * continuous upserts/deletes, and `refresh()` brings the aggregate up to
  * date at a cost proportional to the CHURN since the last refresh, never
  * to the base table size.
  *
  * How: [[LakeTable.windowDelta]] yields the rows of window-added live
  * files (`plus`) and window-removed files (`minus`); copy-on-write
  * rewrites put carried-over rows in both sides, so they cancel under any
  * linear aggregate. One hash-aggregate over `plus ∪ minus` (signed)
  * computes per-group deltas; the deltas merge into the stored state by
  * key. Groups whose row count reaches zero are deleted.
  *
  *   - count / sum / avg: pure delta merge — never touches the base table.
  *     Use exact input types (integers, DECIMAL) for bit-exact maintenance;
  *     floating-point sums would drift under cancellation.
  *   - min / max: delta-merged (`least`/`greatest`) for groups that saw
  *     only additions; a group that LOST rows may have lost its extremum,
  *     so exactly those groups are re-aggregated from the base snapshot
  *     (one scan filtered to the affected groups — still churn-bounded).
  *
  * State is itself a [[LakeTable]] (keyed on the null-safe dim tuple, so
  * refreshes are versioned, time-travelable, and stats-pruned like any
  * other table). The refresh window must lie within the base table's
  * vacuum retention — same constraint as any incremental/CDF consumer.
  */
class MaterializedView private (val spark: SparkSession, val path: String) {
  import MaterializedView._

  private def conf: Configuration = spark.sessionState.newHadoopConf()

  def meta: MvMeta = readMeta(path, conf)

  /** The backing state table (internal columns; use [[read]] for results). */
  def state: LakeTable = LakeTable.load(spark, new Path(path, "state").toString)

  /** The maintenance cursor, read from the state table's LATEST commit
    * (the `txn` watermark a refresh records ATOMICALLY with its data —
    * see [[refresh]]); the meta JSON holds the create-time value and a
    * display mirror. Returns (fact version, dim version). */
  private def cursorOf(st: LakeTable): (Long, Long) = {
    val packed = CommitLog.read(st.path, st.latestVersion,
      spark.sessionState.newHadoopConf()).txn.get(CURSOR_APP)
    packed.map(unpackCursor).getOrElse {
      val m = meta
      (m.lastVersion, m.join.map(_.dimVersion).getOrElse(0L))
    }
  }

  def lastRefreshedVersion: Long = cursorOf(state)._1

  /** For a star-join view: the dim version the state reflects. */
  def dimRefreshedVersion: Option[Long] = meta.join.map(_ => cursorOf(state)._2)

  /** Finalized view: dims + one column per declared aggregate. Sums and
    * averages over a group whose inputs are all NULL finalize to NULL,
    * matching SQL aggregate semantics (the stored delta is 0-based).
    * Dead groups (every row removed) persist as `GRP_N ≤ 0` tombstone
    * rows — retained so a refresh is ONE commit — and are filtered here. */
  def read(): DataFrame = {
    val m = meta
    val cols = m.dims.map(col) ++ m.aggs.map {
      case MvAgg(n, "sum", _) => when(col(cntCol(n)) > 0, col(sumCol(n))).as(n)
      case MvAgg(n, "avg", _) =>
        when(col(cntCol(n)) > 0, col(sumCol(n)).cast(DoubleType) / col(cntCol(n))).as(n)
      case MvAgg(n, _, _) => col(n)
    }
    state.read().filter(col(GRP_N) > 0).select(cols: _*)
  }

  /** Finalized view re-aggregated to a COARSER dim subset — the rollup
    * half of MV rewrite: a view grouped on {a,b} answers `GROUP BY a`
    * because count/sum re-aggregate by summing the stored partials,
    * min/max by min/max of the group extrema, and avg from the stored
    * sum+count pair — never touching the base table. `preFilters`
    * (dim-only predicates, resolved by name against the state table)
    * apply BEFORE re-aggregation so a predicate on a rolled-away dim
    * still works. Empty `rollDims` = global aggregate (count finalizes
    * to 0 over an empty state, matching SQL `count(*)` over no rows). */
  private[graft] def readRollup(rollDims: Seq[String],
      preFilters: Seq[Column] = Nil): DataFrame = {
    val m = meta
    require(rollDims.forall(d => m.dims.exists(_.equalsIgnoreCase(d))),
      s"rollup dims [${rollDims.mkString(",")}] must be a subset of view dims " +
        s"[${m.dims.mkString(",")}]")
    val stSchema = state.schema
    val st = preFilters.foldLeft(
      state.read().filter(col(GRP_N) > 0))((acc, c) => acc.filter(c))
    val aggCols: Seq[Column] = m.aggs.map {
      case MvAgg(n, "count", _) => coalesce(sum(col(n)), lit(0L)).cast(LongType).as(n)
      case MvAgg(n, "sum", _) =>
        // cast the re-sum back to the stored (= original query) sum type;
        // validity from the non-null input count, as in read()
        when(sum(col(cntCol(n))) > 0,
          sum(col(sumCol(n))).cast(stSchema(sumCol(n)).dataType)).as(n)
      case MvAgg(n, "avg", _) =>
        when(sum(col(cntCol(n))) > 0,
          sum(col(sumCol(n))).cast(DoubleType) / sum(col(cntCol(n)))).as(n)
      case MvAgg(n, "min", _) => min(col(n)).as(n)
      case MvAgg(n, "max", _) => max(col(n)).as(n)
    }
    st.groupBy(rollDims.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Bring the view up to date with the base table's latest version (and,
    * for a star-join view, the dim table's).
    *
    * Join maintenance is the signed multiset identity
    * `Δ(F ⋈ D) = ΔF ⋈ D_old + F_new ⋈ ΔD`: fact churn joins against the
    * dim AS OF the last refresh (cost ∝ fact churn — the fact table is
    * never scanned), and dim churn joins the current fact snapshot
    * against only the CHANGED dim rows (cost ∝ the changed keys'
    * matching fact rows; the fact scan is key-restricted by the join,
    * so stats/bloom pruning applies). Carried-over rows of a CoW
    * rewrite appear in both plus and minus and cancel after the join
    * exactly as they do without one.
    *
    * Concurrency: a refresh is a read-compute-write transaction, made
    * safe by refresh-level OCC. The maintenance cursor lives in the
    * state table's commit `txn` map — atomic with the data it
    * describes — the old state is read PINNED at the observed state
    * version, and the single output commit is claimed at exactly
    * observed+1 ([[LakeTable.upsertPinned]]). A racing refresh that
    * lands first makes this one's claim fail; it then re-reads the
    * (advanced) cursor and recomputes — usually finding nothing left to
    * do. Dead groups are retained as `GRP_N ≤ 0` tombstone rows
    * (filtered by [[read]]) precisely so the whole refresh is ONE
    * commit: a separate delete could interleave with a racer. */
  def refresh(): MaterializedView = {
    var attempt = 0
    var done = false
    while (!done) {
      try done = refreshOnce()
      catch {
        case _: CommitConflictException =>
          attempt += 1
          if (attempt >= 10) throw new java.util.ConcurrentModificationException(
            s"materialized view at $path: gave up after $attempt conflicting refreshes")
          Thread.sleep(scala.util.Random.between(5L, 50L * attempt))
      }
    }
    this
  }

  /** One optimistic refresh attempt: true = up to date (applied here or
    * nothing to do); throws [[CommitConflictException]] when a racer
    * committed to the state table after this attempt's snapshot read. */
  private def refreshOnce(): Boolean = {
    val m = meta
    val st = state
    val vState = st.latestVersion
    val (lastV, dimV) = cursorOf(st)
    val base = LakeTable.load(spark, m.basePath)
    val upTo = base.latestVersion
    val dimOpt = m.join.map(j => (j, LakeTable.load(spark, j.dimPath)))
    val dimUpTo = dimOpt.map(_._2.latestVersion)
    if (upTo <= lastV && dimOpt.forall(_ => dimUpTo.get <= dimV)) return true
    val dims = m.dims
    val stSchema = st.schema
    def stType(c: String): DataType = stSchema(c).dataType

    val inputs = m.aggs.map(_.input).filter(_ != "*").distinct
    val need = (dims ++ inputs).distinct
    val contrib = dimOpt match {
      case None =>
        val (plus, minus) = base.windowDelta(lastV, upTo)
        val proj = need.map(col)
        plus.select(proj: _*).withColumn(SGN, lit(1L))
          .unionByName(minus.select(proj: _*).withColumn(SGN, lit(-1L)))
      case Some((j, dim)) =>
        val (factCols, dimCols) = sideSplit(base.schema, dim.schema, need, j)
        val outCols = (need :+ SGN).map(col)
        // ΔF ⋈ D_old — fact churn against the dim as of the last refresh
        val (plusF, minusF) = base.windowDelta(lastV, upTo)
        val fProj = (j.factKey +: factCols).distinct.map(col)
        val fDelta = plusF.select(fProj: _*).withColumn(SGN, lit(1L))
          .unionByName(minusF.select(fProj: _*).withColumn(SGN, lit(-1L)))
        val dProj = (j.dimKey +: dimCols).distinct.map(col)
        val dOld = dim.read(Some(dimV)).select(dProj: _*)
        val cF = fDelta.join(dOld, col(j.factKey) === col(j.dimKey))
        // F_new ⋈ ΔD — only the changed dim rows ever reach the join
        val (plusD, minusD) = dim.windowDelta(dimV, dimUpTo.get)
        val dDelta = plusD.select(dProj: _*).withColumn(SGN, lit(1L))
          .unionByName(minusD.select(dProj: _*).withColumn(SGN, lit(-1L)))
        val fNew = base.read(Some(upTo)).select(fProj: _*)
        val cD = fNew.join(dDelta, col(j.factKey) === col(j.dimKey))
        cF.select(outCols: _*).unionByName(cD.select(outCols: _*))
    }

    // one signed hash-aggregate computes every per-group delta at once
    val sgn = col(SGN)
    val deltaAggs: Seq[Column] =
      Seq(sum(sgn).as(DN), max(when(sgn === -1, 1).otherwise(0)).as(HASM)) ++
        m.aggs.flatMap {
          case MvAgg(n, "count", in) =>
            val c = if (in == "*") sum(sgn) else sum(when(col(in).isNotNull, sgn).otherwise(0L))
            Seq(c.as(dCol(n)))
          case MvAgg(n, "sum", in) => Seq(
            sum(when(sgn === 1, col(in)).otherwise(-col(in))).as(dCol(sumCol(n))),
            sum(when(col(in).isNotNull, sgn).otherwise(0L)).as(dCol(cntCol(n))))
          case MvAgg(n, "avg", in) => Seq(
            sum(when(sgn === 1, col(in)).otherwise(-col(in))).as(dCol(sumCol(n))),
            sum(when(col(in).isNotNull, sgn).otherwise(0L)).as(dCol(cntCol(n))))
          case MvAgg(n, "min", in) => Seq(min(when(sgn === 1, col(in))).as(pCol(n)))
          case MvAgg(n, "max", in) => Seq(max(when(sgn === 1, col(in))).as(pCol(n)))
        }
    val delta = contrib.groupBy(dims.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .withColumn(MVKEY, mvKeyCol(dims))

    val internalCols = stateValueCols(m.aggs)
    // the OLD state pinned at the observed version — a racer's commit
    // after this point can change neither what we read nor what we
    // publish (the pinned claim fails instead)
    val old = st.read(Some(vState)).select((MVKEY +: internalCols).map(col): _*)
    val merged = delta.as("d").join(old.as("o"), Seq(MVKEY), "left")

    def d(c: String) = col(s"d.$c")
    def o(c: String) = col(s"o.$c")
    // both sides 0-coalesced: a window can contribute only-NULL inputs for
    // an agg (null delta) without erasing the stored value. A DEAD stored
    // row's linear values are exactly 0 (everything cancelled on the way
    // down), so rebirth arithmetic continues from the zeroed baseline.
    def plusOld(name: String, deltaName: String): Column =
      (coalesce(o(name), lit(0)) + coalesce(d(deltaName), lit(0))).cast(stType(name)).as(name)

    // a dead row's stored extremum is stale — rebirth must not inherit it
    def oLive(name: String): Column = when(o(GRP_N) > 0, o(name))

    val newN = (coalesce(o(GRP_N), lit(0L)) + d(DN)).cast(LongType)
    val valueCols: Seq[Column] = m.aggs.flatMap {
      case MvAgg(n, "count", _) => Seq(plusOld(n, dCol(n)))
      case MvAgg(n, "sum", _) =>
        Seq(plusOld(sumCol(n), dCol(sumCol(n))), plusOld(cntCol(n), dCol(cntCol(n))))
      case MvAgg(n, "avg", _) =>
        Seq(plusOld(sumCol(n), dCol(sumCol(n))), plusOld(cntCol(n), dCol(cntCol(n))))
      case MvAgg(n, "min", _) =>
        // sound only for groups with no removals; removal groups get
        // re-aggregated below and this placeholder is overridden
        Seq(when(d(HASM) === 0, least(oLive(n), d(pCol(n)))).cast(stType(n)).as(n))
      case MvAgg(n, "max", _) =>
        Seq(when(d(HASM) === 0, greatest(oLive(n), d(pCol(n)))).cast(stType(n)).as(n))
    }
    val newRows = merged.select(
      (dims.map(x => d(x).as(x)) :+ col(MVKEY) :+ newN.as(GRP_N)) ++
        valueCols :+ d(HASM).as(HASM): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val minMax = m.aggs.filter(a => a.kind == "min" || a.kind == "max")
      val patched =
        if (minMax.isEmpty) newRows.drop(HASM)
        else {
          // LIVE groups that lost rows may have lost their extremum:
          // re-aggregate exactly those groups from the base (or joined)
          // snapshot; dead rows keep their null placeholders
          val reKeys = newRows.filter(col(GRP_N) > 0 && col(HASM) > 0).select(MVKEY)
          val reAggs = minMax.map {
            case MvAgg(n, "min", in) => min(col(in)).as(reCol(n))
            case MvAgg(n, _, in) => max(col(in)).as(reCol(n))
          }
          val snap = dimOpt match {
            case None => base.read(Some(upTo))
            case Some((j, dim)) =>
              val (factCols, dimCols) = sideSplit(base.schema, dim.schema, need, j)
              base.read(Some(upTo))
                .select((j.factKey +: factCols).distinct.map(col): _*)
                .join(dim.read(Some(dimUpTo.get))
                    .select((j.dimKey +: dimCols).distinct.map(col): _*),
                  col(j.factKey) === col(j.dimKey))
          }
          val re = snap.withColumn(MVKEY, mvKeyCol(dims))
            .join(reKeys, Seq(MVKEY), "left_semi")
            .groupBy(MVKEY).agg(reAggs.head, reAggs.tail: _*)
          val keep = newRows.columns.filterNot(c => c == HASM || minMax.exists(_.name == c))
          newRows.join(re, Seq(MVKEY), "left")
            .select(keep.map(col) ++ minMax.map(a =>
              coalesce(col(reCol(a.name)), col(a.name)).cast(stType(a.name)).as(a.name)): _*)
        }

      // ONE commit: touched groups (live AND dead tombstones) upserted,
      // pinned at the observed state version, with the new cursor in the
      // commit's txn map — data and cursor can never disagree
      st.upsertPinned(patched.withColumn(MVVER, lit(upTo)), vState,
        txn = Some((CURSOR_APP,
          packCursor(upTo, dimUpTo.getOrElse(0L)))))
    } finally {
      newRows.unpersist(blocking = false)
      ()
    }
    // Done ONLY if the now-recorded cursor covers this attempt's windows
    // component-wise. The pinned commit can silently no-op on the packed
    // txn watermark when a racer recorded a HIGHER pack (fact bits
    // dominate) that still covers LESS of one component — e.g. a racing
    // fact-window refresh (f2, d0) outranks this dim-window one (f1, d2)
    // without applying d0→d2; returning false re-runs from the racer's
    // cursor and applies the missing window.
    val (cf, cd) = cursorOf(state)
    val covered = cf >= upTo && dimOpt.forall(_ => cd >= dimUpTo.get)
    if (covered) {
      // display mirror only — the authoritative cursor is in the state commit
      writeMeta(path, m.copy(lastVersion = cf,
        join = m.join.map(_.copy(dimVersion = cd))), conf)
    }
    covered
  }
}

object MaterializedView {
  private val mapper = new ObjectMapper()

  private[lake] val MVKEY = "_mv_key"
  private[lake] val MVVER = "_mv_ver"
  private[lake] val GRP_N = "_grp_n"

  /** txn appId carrying the packed maintenance cursor on every refresh
    * commit of the state table (see [[MaterializedView.refresh]]). */
  private val CURSOR_APP = "graft.mv.cursor"
  /** (factVersion, dimVersion) packed into one monotone txn watermark —
    * fact in the high 32 bits, dim in the low 31 (both versions only ever
    * grow, so the pack grows on every real refresh). */
  private def packCursor(factV: Long, dimV: Long): Long = {
    require(factV >= 0 && factV < (1L << 31) && dimV >= 0 && dimV < (1L << 31),
      s"cursor versions out of range: $factV / $dimV")
    (factV << 31) | dimV
  }
  private def unpackCursor(packed: Long): (Long, Long) =
    (packed >> 31, packed & ((1L << 31) - 1))
  private val SGN = "_sgn"
  // agg output names are required to be plain identifiers (no leading `_`),
  // so the `_`-prefixed internal names below can never collide with
  // `dCol`/`pCol`/`reCol` of a user agg
  private val DN = "_d0"
  private val HASM = "_hasm"
  private def dCol(n: String) = s"_d_$n"
  private def pCol(n: String) = s"_p_$n"
  private def reCol(n: String) = s"_re_$n"
  private def sumCol(n: String) = s"${n}__sum"
  private def cntCol(n: String) = s"${n}__cnt"

  /** Null-safe, collision-free dim-tuple key: each dim base64-encoded (no
    * `,` in the alphabet) with a `v`/`n` null marker, comma-joined — so no
    * concatenation of values can alias another tuple. */
  private def mvKeyCol(dims: Seq[String]): Column =
    concat_ws(",",
      dims.map(d =>
        coalesce(concat(lit("v"), base64(col(d).cast(StringType).cast(BinaryType))),
          lit("n"))): _*)

  /** Internal stored columns for the declared aggregates (plus [[GRP_N]]). */
  private def stateValueCols(aggs: Seq[MvAgg]): Seq[String] =
    GRP_N +: aggs.flatMap {
      case MvAgg(n, "sum", _) => Seq(sumCol(n), cntCol(n))
      case MvAgg(n, "avg", _) => Seq(sumCol(n), cntCol(n))
      case a => Seq(a.name)
    }

  private def fullState(base: DataFrame, dims: Seq[String], aggs: Seq[MvAgg],
      version: Long): DataFrame = {
    val exprs: Seq[Column] = count(lit(1)).as(GRP_N) +: aggs.flatMap {
      case MvAgg(n, "count", in) =>
        Seq((if (in == "*") count(lit(1)) else count(col(in))).as(n))
      case MvAgg(n, "sum", in) =>
        Seq(coalesce(sum(col(in)), lit(0)).as(sumCol(n)), count(col(in)).as(cntCol(n)))
      case MvAgg(n, "avg", in) =>
        Seq(coalesce(sum(col(in)), lit(0)).as(sumCol(n)), count(col(in)).as(cntCol(n)))
      case MvAgg(n, "min", in) => Seq(min(col(in)).as(n))
      case MvAgg(n, "max", in) => Seq(max(col(in)).as(n))
    }
    base.groupBy(dims.map(col): _*).agg(exprs.head, exprs.tail: _*)
      .withColumn(MVKEY, mvKeyCol(dims))
      .withColumn(MVVER, lit(version))
  }

  /** Star-join half of a view: the fact (base) table equi-joins the dim
    * lake table at `dimPath` on `factKey = dimKey`. `dimVersion` is the
    * dim version the stored state reflects — pinned at create, advanced
    * by every refresh (the incremental-maintenance cursor, exactly like
    * `lastVersion` for the fact side). */
  case class MvJoin(dimPath: String, factKey: String, dimKey: String,
      dimVersion: Long = 0L)

  case class MvMeta(basePath: String, dims: Seq[String], aggs: Seq[MvAgg],
      lastVersion: Long, join: Option[MvJoin] = None)

  /** Assign each needed output column to the fact or dim side, rejecting
    * names present in both (the view definition must be unambiguous). */
  private def sideSplit(factSchema: StructType, dimSchema: StructType,
      need: Seq[String], j: MvJoin): (Seq[String], Seq[String]) = {
    need.foreach { c =>
      val inF = factSchema.fieldNames.contains(c)
      val inD = dimSchema.fieldNames.contains(c)
      require(inF || inD, s"view column $c is in neither fact nor dim schema")
      require(!(inF && inD), s"view column $c is ambiguous (fact AND dim)")
    }
    (need.filter(factSchema.fieldNames.contains),
      need.filter(dimSchema.fieldNames.contains))
  }

  private def metaFile(path: String) = new Path(path, "_graft_mv.json")

  private def writeMeta(path: String, m: MvMeta, conf: Configuration): Unit = {
    val root = mapper.createObjectNode()
    root.put("basePath", m.basePath)
    val dn = root.putArray("dims"); m.dims.foreach(dn.add)
    val an = root.putArray("aggs")
    m.aggs.foreach { a =>
      val n = an.addObject(); n.put("name", a.name); n.put("kind", a.kind); n.put("input", a.input)
    }
    root.put("lastVersion", m.lastVersion)
    m.join.foreach { j =>
      val n = root.putObject("join")
      n.put("dimPath", j.dimPath); n.put("factKey", j.factKey)
      n.put("dimKey", j.dimKey); n.put("dimVersion", j.dimVersion)
    }
    val target = metaFile(path)
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target.getParent)
    val tmp = new Path(path, s".mv-${java.util.UUID.randomUUID()}.json.tmp")
    val out = fs.create(tmp, true)
    out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target)) throw new java.io.IOException(s"cannot publish $target")
  }

  private def readMeta(path: String, conf: Configuration): MvMeta = {
    val p = metaFile(path)
    val in = p.getFileSystem(conf).open(p)
    val root = try mapper.readTree(in) finally in.close()
    val dims = scala.collection.mutable.ArrayBuffer.empty[String]
    root.get("dims").asInstanceOf[ArrayNode].forEach(x => dims += x.asText)
    val aggs = scala.collection.mutable.ArrayBuffer.empty[MvAgg]
    root.get("aggs").asInstanceOf[ArrayNode].forEach { n =>
      aggs += MvAgg(n.get("name").asText, n.get("kind").asText, n.get("input").asText)
    }
    val join =
      if (!root.hasNonNull("join")) None
      else {
        val n = root.get("join")
        Some(MvJoin(n.get("dimPath").asText, n.get("factKey").asText,
          n.get("dimKey").asText, n.get("dimVersion").asLong))
      }
    MvMeta(root.get("basePath").asText, dims.toSeq, aggs.toSeq,
      root.get("lastVersion").asLong, join)
  }

  /** Define + fully compute the view at the base table's current version.
    * With `join`, the view aggregates `base ⋈ dim` (equi-join on
    * `factKey = dimKey`, dim rows latest-as-of-create): dims and agg
    * inputs may come from either side, and `refresh()` maintains the
    * state incrementally under churn on BOTH tables. */
  def create(spark: SparkSession, path: String, base: LakeTable,
      dims: Seq[String], aggs: Seq[MvAgg],
      join: Option[MvJoin] = None): MaterializedView = {
    require(!base.spec.mor, "materialized views maintain CoW base tables")
    require(dims.nonEmpty, "at least one dim")
    val names = dims ++ aggs.map(_.name)
    require(names.distinct.size == names.size, "dim/agg output names must be unique")
    aggs.foreach(a => require(a.name.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"agg name ${a.name} must be a plain identifier (internal columns are _-prefixed)"))
    val conf = spark.sessionState.newHadoopConf()
    val v = base.latestVersion
    val need = (dims ++ aggs.map(_.input).filter(_ != "*")).distinct
    val (snap, pinned) = join match {
      case None => (base.read(Some(v)), None)
      case Some(j0) =>
        val dim = LakeTable.load(spark, j0.dimPath)
        require(!dim.spec.mor, "star-join views maintain CoW dim tables")
        require(j0.factKey != j0.dimKey,
          s"factKey and dimKey must have distinct names (got ${j0.factKey})")
        val (factCols, dimCols) = sideSplit(base.schema, dim.schema, need, j0)
        val dv = dim.latestVersion
        val joined = base.read(Some(v))
          .select((j0.factKey +: factCols).distinct.map(col): _*)
          .join(dim.read(Some(dv)).select((j0.dimKey +: dimCols).distinct.map(col): _*),
            col(j0.factKey) === col(j0.dimKey))
        (joined, Some(j0.copy(dimVersion = dv)))
    }
    val st = fullState(snap, dims, aggs, v)
    LakeTable.create(spark, new Path(path, "state").toString,
      TableSpec(MVKEY, MVVER), st)
    writeMeta(path, MvMeta(base.path, dims, aggs, v, pinned), conf)
    new MaterializedView(spark, path)
  }

  def load(spark: SparkSession, path: String): MaterializedView = {
    val conf = spark.sessionState.newHadoopConf()
    require(metaFile(path).getFileSystem(conf).exists(metaFile(path)), s"no MV at $path")
    new MaterializedView(spark, path)
  }
}
