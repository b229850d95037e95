package graft.lake

import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A graft lake table: Parquet data files + a JSON commit log, providing the
  * reference's Hudi/Delta capabilities (SURVEY.md §2.1, §2.8) on stock Spark:
  *
  *   - keyed upsert with precombine latest-wins (Hudi CoW,
  *     `/root/reference/README.md:448-461`) — copy-on-write file rewrite
  *   - merge-on-read: updates land in log files; `readOptimized` (`_ro`)
  *     serves base files only, `realtime` (`_rt`) merges on read
  *     (`/root/reference/README.md:605-607,918-920`)
  *   - DELETE events are tombstones, never applied
  *     (`/root/reference/README.md:529,1148`) unless `applyDeletes`
  *   - versioned commits, time travel, compaction, vacuum
  *     (`/root/reference/README.md:1230-1240`)
  *   - Hudi-shaped meta columns `_commit_time/_commit_seqno/_record_key/
  *     _partition_path/_file_name` (`/root/reference/README.md:299-303`)
  *
  * Scale posture: all data movement is DataFrame ops (Catalyst-planned,
  * shuffle-aware); driver code touches only file *metadata*. Upserts prune
  * candidate files by partition value and key min/max from the log before any
  * scan, then narrow to files actually containing incoming keys via a
  * semi-join — only those are rewritten.
  */
class LakeTable private (val spark: SparkSession, val path: String) {
  import LakeTable._

  private def conf: Configuration = spark.sessionState.newHadoopConf()
  private[graft] val dataDir = new Path(path, "data").toString

  // ---- log access ------------------------------------------------------

  def commits: Seq[Commit] =
    CommitLog.listVersions(path, conf).map(CommitLog.read(path, _, conf))

  def latestVersion: Long = CommitLog.latestVersion(path, conf).getOrElse(-1L)

  /** (live file count, live row count) from commit-log metadata — no scan.
    * Rows are the per-file totals; for MoR the log rows count too (they
    * are post-images, so this over-counts contested keys — same caveat as
    * Hudi's timeline row stats). */
  def liveFileStats: (Long, Long) = {
    val live = liveFiles(None)
    (live.size.toLong, live.map(a => a.rows - a.dvRows).sum)
  }

  /** Version whose snapshot was current at `epochMillis` (Delta
    * `TIMESTAMP AS OF` semantics): the newest commit at-or-before the
    * instant. Commit times are UTC-millisecond, strictly monotonic. */
  def versionAt(epochMillis: Long): Long = {
    val cs = commits
    val at = cs.filter(c => LakeTable.commitTimeMillis(c.commitTime) <= epochMillis)
    require(at.nonEmpty,
      s"timestamp $epochMillis predates the table's first commit " +
        s"(${cs.headOption.map(_.commitTime).getOrElse("none")})")
    at.map(_.version).max
  }

  /** Snapshot row count from commit-log metadata alone, when it is EXACT:
    * base-file rows minus DV-killed rows. Live MoR log files make the
    * metadata count an over-estimate (contested keys merge at read), so the
    * answer is None and callers must fall back to a scan. Feeds the
    * metadata-only `count(*)` rewrite ([[graft.sql.GraftMetadataOnlyCount]]). */
  def exactRowCount(asOf: Option[Long] = None): Option[Long] = {
    val live = liveFiles(asOf)
    if (live.exists(_.log)) None
    else Some(live.map(a => a.rows - a.dvRows).sum)
  }

  /** Per-live-file (min, max) of `colName` in FooterStats' rendered string
    * forms, when they are EXACT for the whole snapshot: the record key and
    * declared `statsColumns` carry file stats; live MoR logs, tombstones,
    * or deletion vectors (which may have killed an extremal row), or any
    * file with sentinel/partial stats, make the metadata inexact → None.
    * Feeds the metadata-only MIN/MAX rewrite. */
  def fileExtremes(colName: String, asOf: Option[Long] = None): Option[Seq[(String, String)]] =
    fileExtremesWithPartition(colName, asOf).map(_.map(_._2))

  /** [[fileExtremes]] with each file's partitionValue attached (null
    * partition = `__HIVE_DEFAULT_PARTITION__`) — feeds the
    * partition-grouped metadata aggregate. Same exactness gates. */
  def fileExtremesWithPartition(colName: String, asOf: Option[Long] = None):
      Option[Seq[(String, (String, String))]] = {
    val live = liveFiles(asOf)
    if (live.isEmpty) return None
    if (live.exists(a => a.log || a.dv.isDefined || a.dvRows > 0)) return None
    val sp = specAt(asOf)
    // after a partition evolution, an old-era file's stored partitionValue
    // belongs to a DIFFERENT column — grouped answers would mis-attribute
    if (mixedPartitionEras(live, sp)) return None
    val perFile = live.map { a =>
      val mm =
        if (colName.equalsIgnoreCase(sp.key)) Some((a.minKey, a.maxKey))
        else a.colStats.collectFirst { case (c, s) if c.equalsIgnoreCase(colName) => s }
      mm.map(a.partitionValue.getOrElse("__HIVE_DEFAULT_PARTITION__") -> _)
    }
    // sentinel whole-range stats ("", "￿") mean "unknown" — an actual
    // empty-string minimum is indistinguishable, so treat both as opaque
    if (perFile.exists(s => s.isEmpty || s.get._2._1.isEmpty || s.get._2._2 == "￿")) None
    else Some(perFile.map(_.get))
  }

  /** Per-live-file (exact sum string, non-null count) of `colName`, when
    * the snapshot-wide total is EXACT: every live file must carry sums for
    * the column (files written before the column joined `sumColumns`
    * don't), and live MoR logs, tombstones, or deletion vectors (which
    * drop rows the stored sums still include) all make metadata inexact →
    * None. Feeds the metadata-only SUM/COUNT(col) rewrite. */
  def fileSums(colName: String, asOf: Option[Long] = None): Option[Seq[(String, Long)]] =
    fileSumsWithPartition(colName, asOf).map(_.map(_._2))

  /** [[fileSums]] with each file's partitionValue attached — feeds the
    * partition-grouped metadata aggregate. Same exactness gates. */
  def fileSumsWithPartition(colName: String, asOf: Option[Long] = None):
      Option[Seq[(String, (String, Long))]] = {
    val live = liveFiles(asOf)
    if (live.isEmpty) return None
    if (live.exists(a => a.log || a.tombstone || a.dv.isDefined || a.dvRows > 0)) return None
    // partition-evolution era guard — see fileExtremesWithPartition
    if (mixedPartitionEras(live, specAt(asOf))) return None
    // files store PHYSICAL names (column mapping), callers pass LOGICAL
    val phys = specAt(asOf).physical(colName)
    val perFile = live.map { a =>
      a.colSums.collectFirst { case (c, sv) if c.equalsIgnoreCase(phys) => sv }
        .map(a.partitionValue.getOrElse("__HIVE_DEFAULT_PARTITION__") -> _)
    }
    if (perFile.exists(_.isEmpty)) None else Some(perFile.map(_.get))
  }

  /** Exact per-partition live row counts from commit-log metadata (DV'd
    * files discounted); None for unpartitioned tables or when live MoR
    * logs make counts inexact. Keys are the stored partitionValue strings
    * (null partition = `__HIVE_DEFAULT_PARTITION__`). */
  def partitionRowCounts(asOf: Option[Long] = None): Option[Map[String, Long]] = {
    if (specAt(asOf).partition.isEmpty) return None
    val live = liveFiles(asOf)
    // partition-evolution era guard — see fileExtremesWithPartition
    if (mixedPartitionEras(live, specAt(asOf))) return None
    if (live.exists(_.log)) None
    else Some(live.groupBy(_.partitionValue.getOrElse("__HIVE_DEFAULT_PARTITION__"))
      .map { case (pv, as) => pv -> as.map(a => a.rows - a.dvRows).sum })
  }

  /** Total on-disk bytes of the live snapshot, from commit-log metadata —
    * the table-size statistic Catalyst's join planner consumes (a small dim
    * table under `spark.sql.autoBroadcastJoinThreshold` then broadcasts
    * without a hint). Files recorded before byte stats existed fall back to
    * one driver-side file-status call each; DV'd files are discounted by
    * the killed-row fraction so a mostly-deleted file doesn't block a
    * broadcast. */
  def sizeBytes(asOf: Option[Long] = None): Long = {
    val fs = new Path(path).getFileSystem(conf)
    liveFiles(asOf).map { a =>
      val physical =
        if (a.bytes > 0) a.bytes
        else try fs.getFileStatus(new Path(s"${a.base.getOrElse(dataDir)}/${a.path}")).getLen
        catch { case scala.util.control.NonFatal(_) => 0L }
      if (a.dvRows > 0 && a.rows > 0)
        (physical * ((a.rows - a.dvRows).toDouble / a.rows)).toLong
      else physical
    }.sum
  }

  private def latestCommit: Commit = CommitLog.read(path, latestVersion, conf)

  def spec: TableSpec = latestCommit.spec

  /** Declared data schema (without meta columns). */
  def schema: StructType =
    DataType.fromJson(latestCommit.schemaJson).asInstanceOf[StructType]

  /** Schema as of a version — time travel reads use the schema that was
    * declared THEN (like Delta), so pre-evolution snapshots keep their
    * original shape. */
  def schemaAt(asOf: Option[Long]): StructType = asOf match {
    case None => schema
    case Some(v) =>
      val target = math.max(0L, math.min(v, latestVersion)) // v<0 = "before v0": v0's schema
      DataType.fromJson(CommitLog.read(path, target, conf).schemaJson).asInstanceOf[StructType]
  }

  /** Spec as of a version (column mapping travels with the schema). */
  private[graft] def specAt(asOf: Option[Long]): TableSpec = asOf match {
    case None => spec
    case Some(v) =>
      val target = math.max(0L, math.min(v, latestVersion))
      CommitLog.read(path, target, conf).spec
  }

  /** Checkpoint-aware: latest checkpoint + commit tail, not a full replay. */
  private[graft] def liveFiles(asOf: Option[Long]): Seq[FileAction] =
    CommitLog.liveFiles(path, asOf, conf)

  /** Record identity: (key, partition) when partitioned — Hudi's
    * non-global-index semantics, where the same key in two partitions is
    * two records. Used consistently by batch dedup, upsert contested
    * splits, realtime merge, and compaction, so a partition-value change
    * behaves identically on every path (new record; the old row stays). */
  private def idCols: Seq[String] = spec.key +: spec.partition.toSeq

  /** Identity JOINS need a null-safe partition id: SQL `=` never matches a
    * NULL partition value, so a using-column join on the raw partition
    * column would treat every null-partition row as brand-new. Both sides
    * get a sentinel-coalesced copy, join on it, drop it after. (groupBy —
    * dedupLatest — is already null-safe and keeps using the raw columns.) */
  private val PID = "_graft_pid"
  private def withJoinIds(df: DataFrame): DataFrame = spec.partition match {
    case Some(p) => df.withColumn(PID,
      coalesce(col(p).cast(StringType), lit("__HIVE_DEFAULT_PARTITION__")))
    case None => df
  }
  private def joinIdCols: Seq[String] = spec.key +: spec.partition.map(_ => PID).toSeq

  // ---- reads -----------------------------------------------------------

  /** Snapshot read: CoW latest state; for MoR this is the `_rt` view
    * (matches `spark.read.format("hudi")` snapshot semantics, S2). */
  def read(asOf: Option[Long] = None): DataFrame =
    if (spec.mor) realtime(asOf)
    else ordered(readFiles(liveFiles(asOf), asOf = asOf), asOf)

  /** Snapshot read with file-level DATA SKIPPING for the pushed filters:
    * files whose commit-log stat ranges (record key, declared
    * `statsColumns`, partition value) cannot satisfy the filters are
    * dropped before the scan is even planned. MoR with outstanding logs
    * prunes its BASE files the same way and merges them against ALL log
    * files ([[realtimePruned]]) — log files are churn-sized, and a
    * pruned base file cannot hold a filter-matching key, so the
    * latest-wins merge of the survivors is unchanged for every matching
    * row. Like the CoW path, candidate files contribute non-matching
    * rows — callers re-apply their predicate. */
  def readWhere(filters: Seq[org.apache.spark.sql.sources.Filter],
      asOf: Option[Long] = None): DataFrame =
    readWherePruned(filters, identity, asOf)

  /** [[readWhere]] with an additional caller-supplied file-level pruner,
    * applied to the base/CoW actions AFTER the stats/bucket/bloom pass
    * (MoR log files are never pruned). The caller owns the pruner's
    * soundness: it must only drop files that cannot contribute a row the
    * caller needs — used by [[MaterializedView]]'s expression-dim repair
    * (monotonic bucket-transform skipping the built-in filters cannot
    * express). */
  /** Debug-only phase timer (GRAFT_MV_PHASES=1), shared by the pruned-read
    * and write paths — zero overhead when the env is absent. */
  private def dbgT[A](tag: String)(body: => A): A =
    if (!sys.env.contains("GRAFT_MV_PHASES")) body
    else {
      val t0 = System.nanoTime(); val r = body
      println(f"LTPHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

  private[lake] def readWherePruned(
      filters: Seq[org.apache.spark.sql.sources.Filter],
      extra: Seq[FileAction] => Seq[FileAction],
      asOf: Option[Long] = None): DataFrame = {
    val live = dbgT("rwp-liveFiles")(liveFiles(asOf))
    if (live.exists(_.log)) realtimePruned(asOf, filters, extra)
    else {
      val fsz = filters.map {
        case org.apache.spark.sql.sources.In(c, vs) => s"In($c,${vs.length})"
        case f => f.getClass.getSimpleName
      }.mkString(",")
      val pruned = dbgT(s"rwp-prune-n=${live.size}-f=$fsz")(extra(pruneByFilters(live, filters)))
      val rf = dbgT(s"rwp-readFiles-n=${pruned.size}")(readFiles(pruned, asOf = asOf))
      dbgT("rwp-ordered")(ordered(rf, asOf))
    }
  }

  /** [[skipByStats]] + [[bucketSkip]] + [[bloomSkip]] for the DSv2 scan
    * builder: plan-time file pruning from commit-log stats, the bucket
    * layout, and bloom sidecars against the pushed V1 filters. */
  private[graft] def pruneByFilters(actions: Seq[FileAction],
      filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[FileAction] =
    bloomSkip(bucketSkip(skipByStats(actions, filters), filters), filters)

  /** Bucket-index pruning (the Hudi bucket-index READ half): on a
    * bucketed table an equality/IN filter on the record key pins the only
    * bucket(s) matching rows can inhabit — `pmod(murmur3(key), buckets)`
    * is the write-side layout rule, so it is evaluated here on the
    * literal, driver-side, with the same Murmur3 seed Spark's `hash()`
    * uses. A point lookup then opens 1/buckets of the table even when
    * every file's key RANGE covers the probe (random keys — exactly where
    * min/max stats prune nothing). Files not written under the current
    * bucket layout (foreign/converted bases, no `_bucket=` dir) are
    * always kept; an unevaluable literal (type mismatch) keeps the file —
    * skipping is only ever an optimization, never a semantics change. */
  private def bucketSkip(actions: Seq[FileAction],
      filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[FileAction] = {
    import org.apache.spark.sql.sources._
    if (spec.buckets <= 0 || actions.isEmpty || filters.isEmpty) return actions
    val keyType = schema.fields.find(_.name.equalsIgnoreCase(spec.key))
      .map(_.dataType).getOrElse(return actions)
    def bucketOf(v: Any): Option[Int] = scala.util.Try {
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(v, keyType)
      val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(lit))
        .eval(null).asInstanceOf[Int]
      ((h % spec.buckets) + spec.buckets) % spec.buckets
    }.toOption
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // each key-equality conjunct independently pins an allowed-bucket set;
    // rows must satisfy ALL conjuncts, so the sets intersect
    val pins = filters.flatMap(conjuncts).flatMap {
      case EqualTo(c, v) if c.equalsIgnoreCase(spec.key) && v != null =>
        bucketOf(v).map(Set(_))
      case EqualNullSafe(c, v) if c.equalsIgnoreCase(spec.key) && v != null =>
        bucketOf(v).map(Set(_))
      case In(c, vs) if c.equalsIgnoreCase(spec.key) && vs != null && vs.nonEmpty =>
        val bs = vs.toSeq.filter(_ != null).map(bucketOf)
        if (bs.forall(_.isDefined)) Some(bs.flatten.toSet) else None
      case _ => None
    }
    if (pins.isEmpty) return actions
    val allowed = pins.reduce(_ intersect _)
    actions.filter { a =>
      if (!partitionColOf(a).contains(TableSpec.BUCKET_COL)) true
      else a.partitionValue.flatMap(_.toIntOption).forall(allowed.contains)
    }
  }

  /** Physical column names present in a live graft-written file: the
    * declared schema of the commit that wrote it, derived from the file's
    * `_v=<writeId>/` dir (writeId / WRITE_SLOTS = version). Lets the v2
    * scan serve ADDITIVELY evolved tables — files older than an added
    * column simply surface nulls for it. None when the path doesn't carry
    * a graft write-id (foreign/converted files — not v2-scan candidates). */
  private[graft] def fileColumns(a: FileAction): Option[Set[String]] = {
    val head = a.path.takeWhile(_ != '/')
    if (!head.startsWith(s"$WRITE_ID=")) return None
    head.drop(WRITE_ID.length + 1).toLongOption.map { wid =>
      val v = wid / LakeTable.WRITE_SLOTS
      DataType.fromJson(CommitLog.read(path, v, conf).schemaJson)
        .asInstanceOf[StructType].fieldNames.toSet
    }
  }

  /** The schema a file was WRITTEN with (its commit's declared schema) —
    * after a type widening this is narrower than today's; None when the
    * path carries no write-id dir (foreign base). */
  private[graft] def fileSchemaOf(a: FileAction): Option[StructType] = {
    val head = a.path.takeWhile(_ != '/')
    if (!head.startsWith(s"$WRITE_ID=")) return None
    head.drop(WRITE_ID.length + 1).toLongOption.map { wid =>
      val v = wid / LakeTable.WRITE_SLOTS
      DataType.fromJson(CommitLog.read(path, v, conf).schemaJson).asInstanceOf[StructType]
    }
  }

  /** The hive-style dir column a file was physically WRITTEN under, parsed
    * from its own path (`_v=N/<col>=<val>/part-*.parquet`) — the file's
    * PARTITION ERA. After [[changePartition]] eras differ per file; the
    * layout is self-describing, so evolution needed no commit-log change.
    * None = flat layout (unpartitioned era) or a foreign/converted base.
    * Returns the PHYSICAL dir name (`_bucket` for bucketed files). */
  private[graft] def partitionColOf(a: FileAction): Option[String] = {
    val segs = a.path.split("/")
    if (segs.length >= 3 && segs(0).startsWith(s"$WRITE_ID=")) {
      val d = segs(1)
      val i = d.indexOf('=')
      if (i > 0) Some(LakeTable.unescapePathName(d.substring(0, i))) else None
    } else None
  }

  /** The dir column files of spec `sp` are written under: the partition
    * column, or `_bucket` for bucketed tables. */
  private def expectedDirCol(sp: TableSpec): Option[String] =
    if (sp.buckets > 0) Some(TableSpec.BUCKET_COL) else sp.partition

  /** True when any live file predates the current partitioning layout —
    * possible only after [[changePartition]], until a full rewrite
    * (compact()/zorder()) migrates every row forward. Every metadata
    * shortcut keyed on `partitionValue` must refuse mixed-era snapshots:
    * an old-era file's stored value belongs to a DIFFERENT column. */
  private[graft] def mixedPartitionEras(live: Seq[FileAction], sp: TableSpec): Boolean = {
    val want = expectedDirCol(sp)
    live.exists(a => partitionColOf(a) != want)
  }

  /** A file's recorded (min, max) stat strings for `c`: key-range for the
    * record key, the file's own partition value for its partition-era
    * column, declared statsColumns otherwise. None = no stats recorded;
    * sentinel bounds ("" / "￿") pass through — callers must treat them
    * as unknown, exactly like [[skipByStats]] does. */
  private[lake] def statRange(a: FileAction, c: String): Option[(String, String)] =
    if (c.equalsIgnoreCase(spec.key)) Some((a.minKey, a.maxKey))
    else if (partitionColOf(a).exists(_.equalsIgnoreCase(c))) a.partitionValue.map(p => (p, p))
    else a.colStats.find(_._1.equalsIgnoreCase(c)).map(_._2)

  /** Conservative file-level skipping: top-level AND conjuncts only;
    * unknown filter shapes, missing/sentinel stats, non-numeric non-ASCII
    * comparisons all KEEP the file (never wrong, only less pruning). */
  private def skipByStats(actions: Seq[FileAction],
      filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[FileAction] = {
    import org.apache.spark.sql.sources._
    if (filters.isEmpty || actions.isEmpty) return actions
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val cj0 = filters.flatMap(conjuncts)
    // hidden partitioning: filters on a generated partition column's SOURCE
    // column prune through the (monotonic) transform — pure additions to
    // the conjunction, so this can only skip more, never change results
    val cj = cj0 ++ (for {
      p <- spec.partition.toSeq
      gen <- spec.generated.find(_._1.equalsIgnoreCase(p)).map(_._2).toSeq
      src <- GeneratedCols.monotonicSource(spark, gen).toSeq
      d <- GeneratedCols.derive(spark, p, gen, src, cj0)
    } yield d)
    val declared = schema
    // `spec` is a def (latest-commit read behind a log-dir LISTING) —
    // hoist the key name once: rangeOf runs per (file x filter-value)
    // and a filesystem call inside that loop is a driver-side scale bug
    // (measured: a 3.4k-value IN over 6 files cost 5s; see round-13
    // BASELINE.md scale block)
    val keyName = spec.key
    // numeric-comparable stat columns: plain numerics, plus date/timestamp
    // — their INT64-micros / INT32-days footer stats render as plain
    // numbers (see FooterStats + the TIMESTAMP_MICROS writer setting), so
    // time-RANGE filters (the dominant 100 TB scan pattern) file-prune
    // exactly like numeric ranges. Micros fit a Double exactly (< 2^53
    // until year ~2255); legacy INT96-written files carry sentinel stats
    // and fall through to keep, never mis-prune.
    def numericCol(c: String): Boolean =
      declared.fields.find(_.name.equalsIgnoreCase(c)).exists(_.dataType match {
        case _: NumericType | DateType | TimestampType | TimestampNTZType => true
        case _ => false
      })
    def rangeOf(a: FileAction, c: String): Option[(String, String)] =
      if (c.equalsIgnoreCase(keyName)) Some((a.minKey, a.maxKey))
      // era-aware: the stored partitionValue belongs to the column this
      // FILE was partitioned under (which, after changePartition, may not
      // be the spec's) — so old-era files keep pruning on their own column
      // and never mis-prune on the current one
      else if (partitionColOf(a).exists(_.equalsIgnoreCase(c))) a.partitionValue.map(p => (p, p))
      else a.colStats.find(_._1.equalsIgnoreCase(c)).map(_._2)
    def toD(v: Any): Option[Double] = {
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      v match {
        case n: java.lang.Number => Some(n.doubleValue)
        // temporal filter values, in BOTH external forms Spark pushes
        // (java.sql.* and, under datetime.java8API, java.time.*) —
        // normalized with Spark's OWN converters to the stats' internal
        // unit (micros / epoch days), so the compare is exactly the
        // engine's
        case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t).toDouble)
        case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i).toDouble)
        case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d).toDouble)
        case d: java.time.LocalDate => Some(DateTimeUtils.localDateToDays(d).toDouble)
        case dt: java.time.LocalDateTime =>
          Some(DateTimeUtils.localDateTimeToMicros(dt).toDouble)
        case _ => None
      }
    }
    def ascii(x: String): Boolean = x.forall(_ < 0x80)
    // compare a stored stat bound against the literal; None = can't decide.
    // Numeric-comparable columns try the numeric compare first; when the
    // STAT isn't a plain number (a date/timestamp PARTITION value is its
    // hive-dir string, and hidden partitioning derives String filter
    // values for it) both sides fall back to the ASCII string compare —
    // the pre-temporal behavior for exactly those pairs.
    def cmpStat(c: String, stat: String, v: Any): Option[Int] = {
      if (stat.isEmpty || stat == "￿") return None // sentinel bound
      val statNum =
        if (numericCol(c)) scala.util.Try(stat.toDouble).toOption else None
      (statNum, toD(v)) match {
        case (Some(s), Some(d)) => Some(s.compare(d))
        case (Some(_), None) => None // numeric stat, unintelligible value
        case _ => v match {
          case str: String if ascii(stat) && ascii(str) => Some(stat.compareTo(str))
          case _ => None
        }
      }
    }
    def covers(a: FileAction, c: String, v: Any): Boolean =
      rangeOf(a, c).forall { case (mn, mx) =>
        cmpStat(c, mn, v).forall(_ <= 0) && cmpStat(c, mx, v).forall(_ >= 0)
      }
    // IN-list pruning precompute: for a numeric-comparable column whose
    // values ALL convert, sort the values once and decide each file by a
    // binary range probe — O(F·logV) instead of O(F·V) per-value compares
    // (REPAIR/transition-derived IN lists legitimately carry thousands of
    // keys; the per-value loop over many files was the other half of the
    // measured driver stall)
    val sortedIn: Map[Filter, Array[Double]] = cj.flatMap {
      case f @ In(c, vs) if vs != null && vs.nonEmpty && numericCol(c) =>
        val ds = vs.flatMap(v => toD(v))
        if (ds.length == vs.length) Some((f: Filter) -> ds.sorted.toArray)
        else None
      case _ => None
    }.toMap
    def parseStat(stat: String): Option[Double] =
      if (stat == null || stat.isEmpty || stat == "￿") None
      else scala.util.Try(stat.toDouble).toOption
    def keep(a: FileAction, f: Filter): Boolean = f match {
      case EqualTo(c, v) => covers(a, c, v)
      case In(c, vs) if sortedIn.contains(f) =>
        // any value within [mn, mx]? binary search for the first value
        // >= mn; undecidable bounds keep the file, like cmpStat
        rangeOf(a, c).forall { case (mnS, mxS) =>
          (parseStat(mnS), parseStat(mxS)) match {
            case (Some(mn), Some(mx)) =>
              val ds = sortedIn(f)
              val ix = {
                var lo = 0; var hi = ds.length
                while (lo < hi) {
                  val mid = (lo + hi) >>> 1
                  if (ds(mid) < mn) lo = mid + 1 else hi = mid
                }
                lo
              }
              ix < ds.length && ds(ix) <= mx
            case _ => true
          }
        }
      case In(c, vs) => vs.isEmpty || vs.exists(v => covers(a, c, v))
      case GreaterThan(c, v) =>
        rangeOf(a, c).forall { case (_, mx) => cmpStat(c, mx, v).forall(_ > 0) }
      case GreaterThanOrEqual(c, v) =>
        rangeOf(a, c).forall { case (_, mx) => cmpStat(c, mx, v).forall(_ >= 0) }
      case LessThan(c, v) =>
        rangeOf(a, c).forall { case (mn, _) => cmpStat(c, mn, v).forall(_ < 0) }
      case LessThanOrEqual(c, v) =>
        rangeOf(a, c).forall { case (mn, _) => cmpStat(c, mn, v).forall(_ <= 0) }
      case _ => true
    }
    actions.filter(a => cj.forall(f => keep(a, f)))
  }

  /** MoR `_ro`: base files only — stale until compaction (S9/J3). */
  def readOptimized(asOf: Option[Long] = None): DataFrame =
    ordered(readFiles(liveFiles(asOf).filterNot(_.log), asOf = asOf), asOf)

  /** MoR `_rt`: base ∪ logs with latest-wins merge at read (J3).
    *
    * Only keys that appear in log files are contested — base rows without a
    * log entry pass through UNSHUFFLED (anti-join against the small log-key
    * set, which Spark broadcasts), and the dedup shuffle carries just the
    * contested rows. Read cost scales with log size, not table size: at
    * 100 TB that is the difference between a merge and a full re-shuffle. */
  def realtime(asOf: Option[Long] = None): DataFrame =
    realtimePruned(asOf, Nil)

  /** [[realtime]] with BASE-file pruning against `baseFilters`
    * (stats/bucket/bloom skipping; log files are never pruned — they are
    * churn-sized and a log row may supersede a pruned base row's key).
    * Sound for callers that re-apply their predicate on the merged rows:
    * pruning only drops base files that cannot contain a matching key,
    * and the latest-wins merge of the remaining files is unchanged for
    * every surviving key. */
  private def realtimePruned(asOf: Option[Long],
      baseFilters: Seq[org.apache.spark.sql.sources.Filter],
      extra: Seq[FileAction] => Seq[FileAction] = identity): DataFrame = {
    val live = liveFiles(asOf)
    val (logActions, baseActions0) = live.partition(_.log)
    val baseActions = extra(
      if (baseFilters.isEmpty) baseActions0
      else pruneByFilters(baseActions0, baseFilters))
    if (logActions.isEmpty)
      return ordered(readFiles(baseActions, asOf = asOf), asOf)
    val (tombActions, dataLogs) = logActions.partition(_.tombstone)
    val base = withJoinIds(readFiles(baseActions, keepWriteId = true, asOf = asOf))
    val logs = withJoinIds(readFiles(dataLogs, keepWriteId = true, asOf = asOf))
    val tombs = tombMax(tombActions, asOf)
    // tombstoned keys are contested too: their base rows must enter the
    // merge so the tombstone filter can kill them
    val logKeys = contestedLogKeys(logs, tombs)
    val passThrough = base.join(logKeys, joinIdCols, "left_anti")
    val contested = applyTombstones(
      base.join(logKeys, joinIdCols, "left_semi").unionByName(logs), tombs)
    val merged = dedupLatest(contested, idCols, spec.precombine, col(WRITE_ID))
      .unionByName(passThrough)
      .drop(WRITE_ID, PID)
    ordered(merged, asOf)
  }

  /** Existence probe: the DISTINCT values of `keys`' `spec.key` column
    * already present in the snapshot — the upsert's pruned detection scan
    * exposed standalone (the primitive behind incremental cross-snapshot
    * dedup: "which of these fingerprints has the corpus already seen?").
    *
    * CoW snapshots scan only candidate files — partition, key-range and
    * bloom-sidecar pruning narrow the file set exactly as `upsert` does —
    * so probe cost scales with the batch and its matching files, never the
    * table. MoR snapshots with live logs probe through the merged realtime
    * read instead (a tombstoned key must NOT report as existing). Key-only
    * semantics: on partitioned tables a key reports existing in ANY
    * partition. */
  def containsKeys(keys: DataFrame): DataFrame = {
    val k = keys.select(col(spec.key)).filter(col(spec.key).isNotNull).distinct()
    val live = liveFiles(None)
    val present =
      if (live.exists(_.log)) realtime().select(col(spec.key))
      else readFiles(pruneCandidates(live, k)).select(col(spec.key))
    k.join(present, Seq(spec.key), "left_semi")
  }

  /** Pruned candidate read for a key set: the rows of files that MIGHT
    * hold one of `keys` (same partition/key-range/bloom pruning as the
    * upsert detection scan), so cost ∝ batch and its matching files, never
    * the table. Candidate files can contribute non-matching rows — callers
    * filter/join on the key themselves. MoR with live logs reads through
    * the merged realtime view (a tombstoned key must not surface). */
  def readForKeys(keys: DataFrame): DataFrame = {
    val k = keys.select(col(spec.key)).filter(col(spec.key).isNotNull).distinct()
    val live = liveFiles(None)
    if (live.exists(_.log)) realtime()
    else ordered(readFiles(pruneCandidates(live, k)))
  }

  /** Max tombstone write-id per record identity — the one scan of the
    * (churn-bounded) tombstone files a read needs; both its consumers (the
    * contested-key union and the kill filter) reference the same subplan,
    * which Spark collapses via exchange reuse. */
  private def tombMax(tombActions: Seq[FileAction],
      asOf: Option[Long] = None): Option[DataFrame] =
    if (tombActions.isEmpty) None
    else Some(withJoinIds(readFiles(tombActions, keepWriteId = true, asOf = asOf))
      .groupBy(joinIdCols.map(col): _*).agg(max(col(WRITE_ID)).as(TOMB_V)))

  /** Kill rows superseded by a newer tombstone: a keyed MoR delete lands as
    * a tombstone log row ([[FileAction.tombstone]]) that deletes whatever
    * was live at its commit — any same-key row with a LOWER write-id; a
    * later upsert (higher write-id) reinserts the key. `df` must carry the
    * join ids and [[WRITE_ID]]. */
  private def applyTombstones(df: DataFrame, tombs: Option[DataFrame]): DataFrame =
    tombs.fold(df) { t =>
      df.join(t, joinIdCols, "left")
        .filter(col(TOMB_V).isNull || col(WRITE_ID) > col(TOMB_V))
        .drop(TOMB_V)
    }

  /** Contested identities of a MoR read: every data-log key plus every
    * tombstoned key (their base rows must enter the merge to be killed). */
  private def contestedLogKeys(logs: DataFrame, tombs: Option[DataFrame]): DataFrame = {
    val lk = logs.select(joinIdCols.map(col): _*)
    tombs.fold(lk)(t => lk.unionByName(t.select(joinIdCols.map(col): _*))).distinct()
  }

  private def ordered(df: DataFrame, asOf: Option[Long] = None): DataFrame = {
    val cols = META_COLS.map(col) ++ schemaAt(asOf).fieldNames.map(col)
    df.select(cols: _*)
  }

  /** Read a set of live files as one pruned, partition-aware scan. The
    * data schema is passed EXPLICITLY (no footer inference): files written
    * before an additive schema evolution simply surface nulls for the new
    * columns, and read planning skips footer merging entirely.
    *
    * Files live in the table's own `data/` dir except for shallow-clone /
    * converted-in-place references ([[FileAction.base]]); each distinct base
    * becomes its own scan (so `_v=`/partition dirs still parse against the
    * right root) and the scans union. `relFile = true` attaches the
    * `_rel_file` column — the action-path-compatible identity the
    * touched-file detection passes join on — computed correctly per group. */
  private def readFiles(actions: Seq[FileAction], keepWriteId: Boolean = false,
      asOf: Option[Long] = None, relFile: Boolean = false,
      keepPos: Boolean = false): DataFrame = {
    val dataSchema = schemaAt(asOf)
    if (actions.isEmpty) {
      val full = StructType(META_SCHEMA.fields ++ dataSchema.fields ++
        (if (keepWriteId) Seq(StructField(WRITE_ID, LongType)) else Nil) ++
        (if (relFile) Seq(StructField(REL_FILE, StringType)) else Nil) ++
        (if (keepPos) Seq(StructField(DV_POS, LongType)) else Nil))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], full)
    }
    // full read schema: meta cols + data cols; partition col (if any) and
    // the write-id dir col are matched by name against the dir structure.
    // Data fields are requested under their PHYSICAL names (column
    // mapping) and aliased back to logical after the scan.
    val cmap = specAt(asOf).columnMap
    val readSchema = StructType(
      META_SCHEMA.fields.filterNot(_.name == "_file_name") ++
        dataSchema.fields.map(f => f.copy(name = cmap.getOrElse(f.name, f.name))) ++
        Seq(StructField(WRITE_ID, LongType)))
    // one scan per (base root, layout, dv-ness); `needIdent` attaches the
    // per-row (file, position) identity deletion vectors are keyed on
    def scanGroup(base: Option[String], acts: Seq[FileAction], needIdent: Boolean): DataFrame = {
      val dir = base.getOrElse(dataDir)
      val paths = acts.map(a => s"$dir/${a.path}")
      val graftLayout = base.isEmpty || acts.forall(_.path.startsWith(s"$WRITE_ID="))
      var df =
        if (graftLayout)
          spark.read.option("basePath", dir).schema(readSchema).parquet(paths: _*)
        else
          // converted-in-place foreign parquet: flat files, nothing to parse
          // from dirs — write-id 0 (pre-history) and the file name as the
          // rel identity (unique: convert sources are a single flat dir)
          spark.read.schema(readSchema).parquet(paths: _*)
            .withColumn(WRITE_ID, coalesce(col(WRITE_ID), lit(0L)))
      if (needIdent)
        df = df.withColumn(DV_POS, col("_metadata").getField("row_index"))
      // input_file_name() is URI-ENCODED (space → %20) while FileAction
      // paths come from FileSystem listings (literal) — decode before any
      // compare, or partition values with URI-special chars silently break
      // touched-file detection, DV anti-joins, and file-restricted scans.
      // '+' is literal in a URI path but form-decoding would turn it into
      // a space, so mask it first.
      def uriDecode(c: Column): Column = url_decode(replace(c, lit("+"), lit("%2B")))
      df = df.withColumn("_file_name",
        uriDecode(element_at(split(input_file_name(), "/"), -1)))
      val rel =
        if (graftLayout) substring_index(uriDecode(input_file_name()), "/data/", -1)
        else uriDecode(element_at(split(input_file_name(), "/"), -1))
      if (relFile || needIdent) df.withColumn(REL_FILE, rel) else df
    }
    // existence defaults: rows in files that PREDATE an added-with-DEFAULT
    // column read the frozen constant instead of null. "Absent" is known
    // per file from its commit's schema (no footers); files carrying the
    // column — genuine nulls included — are untouched. Zero overhead when
    // no existence default is declared (every absent-set is empty).
    val exDefaults: Map[String, String] = {
      val ed = specAt(asOf).existenceDefaults
      if (ed.isEmpty) Map.empty
      else ed.filter { case (c, _) => dataSchema.fieldNames.contains(c) }
    }
    def absentOf(a: FileAction): Set[String] =
      if (exDefaults.isEmpty) Set.empty
      else fileSchemaOf(a) match {
        case Some(fs) => exDefaults.keySet -- fs.fieldNames.toSet
        case None => Set.empty // foreign base: refused at add time
      }
    // fill on the PHYSICAL-named scan output (aliasing to logical happens
    // after the union)
    def fillAbsent(df: DataFrame, absent: Set[String]): DataFrame =
      absent.foldLeft(df)((acc, c) =>
        acc.withColumn(cmap.getOrElse(c, c),
          expr(exDefaults(c)).cast(dataSchema(c).dataType)))
    // one scan per (base, absent-set, PARTITION ERA): after a partition
    // evolution, files written under different partition columns have
    // different dir structures, and Spark's partition discovery requires a
    // uniform layout per read — each era scans separately and the scans
    // union. Every column still resolves for every era: a file's own era
    // column comes from its dirs, every other column from its data.
    val parts = actions.groupBy(a => (a.base, absentOf(a), partitionColOf(a))).toSeq
      .sortBy { case ((base, abs, era), _) =>
        (base.getOrElse(""), abs.toSeq.sorted.mkString(","), era.getOrElse("")) }
      .flatMap { case ((base, absent, _), acts) =>
        val (dvd, plain) = acts.partition(_.dv.isDefined)
        val plainDf =
          if (plain.isEmpty) None
          else {
            val df = fillAbsent(scanGroup(base, plain, needIdent = keepPos), absent)
            Some(if (keepPos && !relFile) df.drop(REL_FILE) else df)
          }
        val dvdDf =
          if (dvd.isEmpty) None
          else {
            // anti-join each row's (file, position) against the union of the
            // referenced DV sidecars: deleted positions vanish at scan time.
            // Only the DV'd files pay; sidecar size ∝ deleted rows, so AQE
            // broadcasts it in the common case.
            val df = scanGroup(base, dvd, needIdent = true)
            val dirs = dvd.flatMap(_.dv).distinct.map(dvRoot)
            val dvRows = spark.read.schema(DV_SCHEMA).parquet(dirs: _*)
            val alive = fillAbsent(df.join(dvRows,
              df(REL_FILE) === dvRows("file") && df(DV_POS) === dvRows("pos"),
              "left_anti"), absent)
            val dropRel = if (relFile) alive else alive.drop(REL_FILE)
            Some(if (keepPos) dropRel else dropRel.drop(DV_POS))
          }
        plainDf.toSeq ++ dvdDf.toSeq
      }
    val joined = parts.reduce(_.unionByName(_))
    val out =
      if (cmap.isEmpty) joined
      else {
        val rev = cmap.map(_.swap)
        joined.select(joined.columns.toSeq.map(c =>
          rev.get(c).map(l => col(c).as(l)).getOrElse(col(c))): _*)
      }
    if (!keepWriteId) out.drop(WRITE_ID) else out
  }

  /** Resolve a [[FileAction.dv]] reference: absolute across-table paths
    * pass through, relative ones live under this table's data dir. */
  private def dvRoot(d: String): String =
    if (d.startsWith("/")) d else s"$dataDir/$d"

  // ---- writes ----------------------------------------------------------

  /** Full load (S6/S8/S10): precombine-dedup, stamp meta, replace content.
    * `mergeSchema` allows additive evolution (new columns widen the table;
    * Delta's mergeSchema analog). */
  def overwrite(df: DataFrame, mergeSchema: Boolean = false,
      txn: Option[(String, Long)] = None): LakeTable = retrying {
    val (withIds, idHighs) = stampIdentity(df, freshForAll = true)
    val (conformed, evolved) = conform(withIds, mergeSchema)
    writeCommit("overwrite", removeAll = true, newSchema = evolved, txn = txn,
      identityHigh = idHighs) { (writeId, commitTime) =>
      val batch = stampMeta(dedupBatch(conformed), commitTime)
      Seq(writeFiles(batch, writeId, log = false))
    }
  }

  /** Delta `replaceWhere`: atomically replace exactly the rows matching
    * `cond` with `df` — ONE commit rewrites the touched files' non-matching
    * rows and adds the new data, so readers never see a half-swapped state.
    * Every incoming row must satisfy `cond` (Delta's constraint): the op is
    * a range/partition swap, not a disguised upsert. Detection is
    * column-pruned to `cond`'s columns; only touched files are rewritten.
    *
    * Keyed-uniqueness contract: a record key must not move ACROSS the
    * predicate boundary — an incoming key that also has a non-matching row
    * elsewhere would duplicate the record (replaceWhere swaps a region,
    * like Delta's; use upsert to move keys). Violations against the
    * touched files' surviving rows are detected and fail loudly; rows in
    * completely untouched files are the caller's contract (checking them
    * would need the full-table scan this operation exists to avoid). */
  def overwriteWhere(df: DataFrame, cond: Column,
      txn: Option[(String, Long)] = None): LakeTable = retrying {
    if (spec.mor && liveFiles(None).exists(_.log)) compact() // see delete()
    val (withIds, idHighs) = stampIdentity(df, freshForAll = true)
    val (conformed, _) = conform(withIds, mergeSchema = false)
    require(conformed.filter(!coalesce(cond, lit(false))).isEmpty,
      "replaceWhere: every incoming row must match the predicate")
    val live = liveFiles(None)
    writeCommit("overwriteWhere", txn = txn, identityHigh = idHighs) { (writeId, commitTime) =>
      val touched = readFiles(live, relFile = true)
        .filter(cond).select(REL_FILE).distinct()
        .collect().map(_.getString(0)).toSeq
      val batch = stampMeta(dedupBatch(conformed), commitTime)
      val kept = if (touched.isEmpty) Seq.empty else {
        val touchedSet = touched.toSet
        // surviving rows of touched files (cond NULL = survives, like DELETE)
        val rows = readFiles(live.filter(a => touchedSet.contains(a.path)))
          .filter(!coalesce(cond, lit(false)))
          .drop("_file_name")
        // keyed-uniqueness guard (see scaladoc): an incoming key surviving
        // outside the predicate in a touched file would duplicate
        val dup = withJoinIds(rows)
          .join(withJoinIds(batch).select(joinIdCols.map(col): _*).distinct(),
            joinIdCols, "left_semi")
        require(dup.isEmpty,
          "replaceWhere: an incoming record key also has rows NOT matching " +
            "the predicate — a key may not move across the replace boundary")
        Seq(writeFiles(rows, writeId + 1, log = false))
      }
      Seq(writeFiles(batch, writeId, log = false).copy(remove = touched)) ++ kept
    }
  }

  /** Dynamic partition overwrite (Spark `partitionOverwriteMode=dynamic`):
    * replace exactly the partitions present in `df`, leave the rest alone.
    * File selection is pure commit-log METADATA (per-file partitionValue) —
    * no detection scan, so the swap costs one write of the incoming data
    * regardless of table size: the partition-load pattern at 100 TB. */
  def overwritePartitions(df: DataFrame,
      txn: Option[(String, Long)] = None): LakeTable = {
    val p0 = spec.partition.getOrElse(throw new IllegalArgumentException(
      "dynamic partition overwrite needs a partitioned table"))
    // partition-evolution era guard: an old-era file interleaves current
    // partition values WITHIN the file, so per-file metadata selection
    // would drop innocent rows — route through row-level replaceWhere
    // (same swap semantics, detection-scan cost) until compact() migrates
    if (mixedPartitionEras(liveFiles(None), spec)) {
      val pvals = df.select(col(p0).cast(StringType)).distinct()
        .collect().map(r => Option(r.getString(0))).toSeq
      val (nulls, vals) = pvals.partition(_.isEmpty)
      var cond = if (vals.nonEmpty) col(p0).cast(StringType).isin(vals.flatten: _*)
        else lit(false)
      if (nulls.nonEmpty) cond = cond || col(p0).isNull
      return overwriteWhere(df, cond, txn)
    }
    overwritePartitionsUniform(df, txn)
  }

  private def overwritePartitionsUniform(df: DataFrame,
      txn: Option[(String, Long)]): LakeTable = retrying {
    val p = spec.partition.getOrElse(throw new IllegalArgumentException(
      "dynamic partition overwrite needs a partitioned table"))
    val (withIds, idHighs) = stampIdentity(df, freshForAll = true)
    val (conformed, _) = conform(withIds, mergeSchema = false)
    val parts = conformed.select(col(p).cast(StringType)).distinct()
      .collect().map(r => Option(r.getString(0))
        .getOrElse("__HIVE_DEFAULT_PARTITION__")).toSet
    val live = liveFiles(None)
    writeCommit("overwritePartitions", txn = txn,
      identityHigh = idHighs) { (writeId, commitTime) =>
      // MoR log files carry partitionValue too — a replaced partition's
      // outstanding logs go with it
      val touched = live.filter(_.partitionValue.exists(parts.contains)).map(_.path)
      val batch = stampMeta(dedupBatch(conformed), commitTime)
      Seq(writeFiles(batch, writeId, log = false).copy(remove = touched))
    }
  }

  /** Live partition values — `SHOW PARTITIONS` from commit-log metadata
    * alone for every file written under the current partition column.
    * After a partition evolution, OLD-ERA files store the current column
    * as plain data, so their values come from a column-pruned distinct
    * scan over just those files — cost ∝ unmigrated data, shrinking to
    * zero as compaction/churn moves the table forward, never ∝ table
    * size. */
  def partitionValues: Seq[String] = {
    val p = spec.partition.getOrElse(
      throw new IllegalArgumentException(s"table at $path is not partitioned"))
    val live = liveFiles(None)
    val (cur, old) = live.partition(a => partitionColOf(a) == spec.partition)
    val fromMeta = cur.flatMap(_.partitionValue)
    val fromScan =
      if (old.isEmpty) Seq.empty
      else readFiles(old).select(col(p).cast(StringType)).distinct()
        .collect().toSeq.flatMap(r => Option(r.getString(0)))
    (fromMeta ++ fromScan).distinct.sorted
  }

  /** Keyed upsert (S7/S9/J2). CoW: rewrite only files holding incoming keys.
    * MoR: new keys → base files, existing keys → log files (which is why a
    * brand-new key surfaces in `_ro` immediately — README.md:993-1012).
    * The deduped batch is persisted for the commit's duration: it feeds the
    * prune aggregate, the touched-file semi-join, and the rewrite union —
    * without caching, the dedup shuffle would run once per consumer. */
  def upsert(df: DataFrame, mergeSchema: Boolean = false,
      txn: Option[(String, Long)] = None,
      copyFiles: Seq[String] = Seq.empty): LakeTable = retrying {
    val (withIds, idHighs) = stampIdentity(df, freshForAll = false)
    val (conformed, evolved) = conform(withIds, mergeSchema)
    val incoming0 = dedupBatch(conformed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (spec.mor) upsertMor(incoming0, evolved, txn, copyFiles, idHighs)
      else upsertCow(incoming0, evolved, txn, copyFiles, idHighs)
    } finally {
      incoming0.unpersist(blocking = false)
      ()
    }
  }

  /** Upsert pinned at `expectedVersion` with NO internal rebase: if any
    * other commit landed after the caller observed `expectedVersion`, the
    * version claim fails and [[CommitConflictException]] propagates — the
    * caller re-reads and recomputes (refresh-level OCC; see
    * [[MaterializedView.refresh]]). CoW only. */
  private[lake] def upsertPinned(df: DataFrame, expectedVersion: Long,
      txnMany: Map[String, Long] = Map.empty): LakeTable = {
    require(!spec.mor, "upsertPinned is a CoW primitive")
    val (withIds, idHighs) = stampIdentity(df, freshForAll = false)
    val (conformed, evolved) = conform(withIds, mergeSchema = false)
    val incoming0 = dedupBatch(conformed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try upsertCow(incoming0, evolved, idHighs = idHighs,
      expectedVersion = Some(expectedVersion), txnMany = txnMany)
    finally {
      incoming0.unpersist(blocking = false)
      ()
    }
  }

  private def upsertCow(incoming: DataFrame, evolved: Option[StructType] = None,
      txn: Option[(String, Long)] = None,
      copyFiles: Seq[String] = Seq.empty,
      idHighs: Map[String, Long] = Map.empty,
      expectedVersion: Option[Long] = None,
      txnMany: Map[String, Long] = Map.empty): LakeTable = {
    val live = dbgT("cow-liveFiles")(liveFiles(None))
    val candidates = dbgT(s"cow-pruneCandidates-n=${live.size}")(pruneCandidates(live, incoming))
    writeCommit("upsert", newSchema = evolved, txn = txn,
      copyFiles = copyFiles, identityHigh = idHighs,
      expectedVersion = expectedVersion, txnMany = txnMany) { (writeId, commitTime) =>
      val inStamped = stampMeta(incoming, commitTime).withColumn(RANK, lit(Long.MaxValue))
      // second element: the incoming batch when nothing is touched, else
      // the full row set of the files being rewritten
      val (touchedPaths, rewriteSet) =
        if (candidates.isEmpty) (Seq.empty[String], inStamped)
        else {
          val cand = withJoinIds(readFiles(candidates, keepWriteId = true, relFile = true))
          val touched = dbgT(s"cow-touchedDetect-n=${candidates.size}")(cand
            .join(withJoinIds(incoming).select(joinIdCols.map(col): _*).distinct(),
              joinIdCols, "left_semi")
            .select(REL_FILE).distinct().collect().map(_.getString(0)).toSeq)
          if (touched.isEmpty) (touched, inStamped)
          else {
            // re-scan ONLY the touched files (the detection scan above is
            // column-pruned to the key): scan cost ∝ touched data and the
            // plan stays O(1) — a literal `isin(touched)` filter would grow
            // an N-ary expression with the touched-file count
            val touchedSet = touched.toSet
            val affected = readFiles(candidates.filter(a => touchedSet.contains(a.path)),
                keepWriteId = true)
              .withColumn(RANK, col(WRITE_ID))
              .drop(WRITE_ID, "_file_name")
            (touched, affected)
          }
        }
      val winner =
        if (touchedPaths.isEmpty) rewriteSet // == inStamped: all inserts, pre-deduped
        else {
          // contested split: rows rewritten only because they share a FILE
          // with a touched key pass through without entering the dedup
          // shuffle; only rows whose KEY is in the batch contest with it.
          // allowMissingColumns: under additive schema evolution the old
          // rows take nulls for the new columns.
          val inKeys = withJoinIds(incoming).select(joinIdCols.map(col): _*).distinct()
          val rewriteIds = withJoinIds(rewriteSet)
          val passThrough = rewriteIds.join(inKeys, joinIdCols, "left_anti")
          val contested = rewriteIds.join(inKeys, joinIdCols, "left_semi")
            .unionByName(withJoinIds(inStamped), allowMissingColumns = true)
          dedupLatest(contested, idCols, spec.precombine, col(RANK))
            .unionByName(passThrough, allowMissingColumns = true)
            .drop(PID)
        }
      Seq(writeFiles(winner.drop(RANK), writeId, log = false)
        .copy(remove = touchedPaths))
    }
  }

  private def upsertMor(incoming: DataFrame, evolved: Option[StructType] = None,
      txn: Option[(String, Long)] = None,
      copyFiles: Seq[String] = Seq.empty,
      idHighs: Map[String, Long] = Map.empty): LakeTable = {
    val live = liveFiles(None)
    writeCommit("upsert", newSchema = evolved, txn = txn,
      copyFiles = copyFiles, identityHigh = idHighs) { (writeId, commitTime) =>
      val stamped = stampMeta(incoming, commitTime)
      if (live.isEmpty) Seq(writeFiles(stamped, writeId, log = false))
      else {
        // key-membership split in ONE pass: left-join a membership flag over
        // a column-pruned scan of live keys, cache the tagged batch, filter
        // twice (anti+semi joins would scan the live key column twice).
        // The scan covers only stats-candidate files: a key outside every
        // file's [min,max] range cannot be existing.
        val existingKeys = withJoinIds(readFiles(pruneCandidates(live, incoming)))
          .select(joinIdCols.map(col): _*).distinct()
          .withColumn("_graft_exists", lit(true))
        val tagged = withJoinIds(stamped).join(existingKeys, joinIdCols, "left")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val newRows = tagged.filter(col("_graft_exists").isNull)
            .drop("_graft_exists", PID)
          val updates = tagged.filter(col("_graft_exists") === true)
            .drop("_graft_exists", PID)
          Seq(
            writeFiles(newRows, writeId, log = false),
            writeFiles(updates, writeId + 1, log = true)
          ).filter(_.add.nonEmpty)
        } finally {
          tagged.unpersist(blocking = false)
          ()
        }
      }
    }
  }

  /** Delta `COPY INTO` analog: file-granular idempotent ingestion from a
    * parquet directory. Every commit that loads files records them
    * ([[graft.lake.Commit.copyFiles]]); re-running the same COPY INTO
    * skips everything already recorded and commits nothing — load a
    * landing directory on a schedule and each file's rows enter exactly
    * once. New files load through the normal keyed upsert (graft tables
    * are keyed, so the blind-append of Delta's COPY INTO would break the
    * key invariant; latest-wins also makes a rare double-load under
    * concurrent COPY INTOs benign). `pattern` is a glob on the path
    * relative to `sourceDir` (Delta's PATTERN). Extra source columns are
    * dropped; missing table columns fail the load.
    *
    * Returns the files THIS call loaded (empty = everything was already
    * in). Scale: listing + set-diff are driver metadata ∝ directory size;
    * the data path is one upsert over only the new files' rows. */
  def copyInto(sourceDir: String, pattern: Option[String] = None): Seq[String] = {
    val src = new Path(sourceDir)
    val fsys = src.getFileSystem(conf)
    val srcRoot = fsys.makeQualified(src).toString.stripSuffix("/")
    val listed = {
      val it = fsys.listFiles(src, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) b += fsys.makeQualified(st.getPath).toString
      }
      b.result()
    }
    val rx = pattern.map { g =>
      java.util.regex.Pattern.compile(
        "\\Q" + g.replace("*", "\\E[^/]*\\Q").replace("?", "\\E.\\Q") + "\\E")
    }
    def rel(f: String): String = f.stripPrefix(srcRoot).stripPrefix("/")
    val eligible = listed
      .filter(f => f.endsWith(".parquet") && !rel(f).startsWith("_"))
      .filter(f => rx.forall(_.matcher(rel(f)).matches))
    val loaded = commits.iterator.flatMap(_.copyFiles).toSet
    val fresh = eligible.filterNot(loaded.contains).sorted
    if (fresh.nonEmpty) {
      val incoming = spark.read.parquet(fresh: _*)
        .select(schema.fieldNames.map(col): _*)
      upsert(incoming, copyFiles = fresh)
    }
    fresh
  }

  /** MERGE with delete application (Delta `WHEN MATCHED AND ... DELETE`
    * extension; the reference never applies deletes — opt-in only). */
  def merge(source: DataFrame, applyDeletes: Boolean = false,
      deleteCond: Column = col("source_metadata.is_deleted")): LakeTable = {
    upsert(source)
    if (applyDeletes) delete(deleteCond) else this
  }

  /** Rewrite files dropping rows matching `cond` (row-level delete). Only
    * rows where `cond` is definitively TRUE are dropped — a NULL-evaluating
    * condition (e.g. a null flag after additive schema evolution) keeps the
    * row, matching Delta DELETE semantics. */
  def delete(cond: Column): LakeTable = retrying {
    // MoR with outstanding logs: a touched LOG file's surviving rows would
    // be rewritten as BASE rows next to the old base rows for the same
    // keys (duplicates), and untouched logs would lose precombine-tie
    // priority to the rewrite's newer write-id. Folding the logs first
    // (same guard optimize() uses) makes the rewrite well-defined.
    if (spec.mor && liveFiles(None).exists(_.log)) compact()
    val live = liveFiles(None)
    writeCommit("delete") { (writeId, _) =>
      // detection pass: column-pruned to cond's columns + the file name
      val touched = readFiles(live, relFile = true)
        .filter(cond).select(REL_FILE).distinct()
        .collect().map(_.getString(0)).toSeq
      if (touched.isEmpty) Seq.empty
      else {
        // rewrite pass: re-scan only the touched files (no literal isin —
        // the plan stays O(1) in the touched-file count)
        val touchedSet = touched.toSet
        val kept = readFiles(live.filter(a => touchedSet.contains(a.path)))
          .filter(!coalesce(cond, lit(false)))
          .drop("_file_name")
        Seq(writeFiles(kept, writeId, log = false).copy(remove = touched))
      }
    }
  }

  /** Row-level delete via DELETION VECTORS (Delta DV analog): instead of
    * rewriting every touched file, record the matched rows' `(file,
    * position)` pairs in a parquet sidecar and re-add the same data files
    * with the DV attached — the rows vanish from every read path at scan
    * time. Cost is O(matched rows + touched file metadata) regardless of
    * file sizes: deleting 100 rows spread over 100 × 1 GB files writes a
    * few KB instead of rewriting 100 GB. A later delete on an already-DV'd
    * file writes a merged sidecar; upsert/compact/optimize rewrites
    * materialize the DV away (their scans never see deleted rows, and the
    * fresh files carry no `dv`). Commit shape is remove+re-add of the same
    * path, so incremental/CDF/materialized-view consumers observe the
    * change like any rewrite. A file whose every row is deleted is simply
    * removed. CoW only — MoR deletes are tombstone log rows already. */
  def deleteVectors(cond: Column): LakeTable = retrying {
    require(!spec.mor, "MoR deletes land as tombstone logs; deletion vectors are the CoW analog")
    val live = liveFiles(None)
    writeCommit("delete") { (writeId, _) =>
      val dvRel = s"$DV_DIR/${WRITE_ID}=$writeId"
      // detection scans DV-filtered rows: already-deleted positions can't
      // re-match, so the new sidecar unions cleanly with the old ones
      val matched = readFiles(live, relFile = true, keepPos = true)
        .filter(cond)
        .select(col(REL_FILE).as("file"), col(DV_POS).as("pos"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val touched = matched.select("file").distinct()
          .collect().map(_.getString(0)).toSeq
        if (touched.isEmpty) Seq.empty
        else {
          val touchedSet = touched.toSet
          val touchedActs = live.filter(a => touchedSet.contains(a.path))
          // prior DV rows of the touched files move into the new sidecar
          // (untouched DV'd files keep referencing their old dirs)
          val oldDirs = touchedActs.flatMap(_.dv).distinct.map(dvRoot)
          val carried =
            if (oldDirs.isEmpty) matched.limit(0)
            else {
              import spark.implicits._
              spark.read.schema(DV_SCHEMA).parquet(oldDirs: _*)
                .join(touched.toDF("file"), Seq("file"), "left_semi")
            }
          val all = matched.unionByName(carried)
          all.write.mode("errorifexists").parquet(s"$dataDir/$dvRel")
          val counts = all.groupBy("file").agg(count(lit(1)).as("c"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          // fully-deleted files are dropped outright instead of re-added
          val adds = touchedActs
            .filter(a => counts.getOrElse(a.path, 0L) < a.rows)
            .map(a => a.copy(dv = Some(dvRel), dvRows = counts.getOrElse(a.path, 0L)))
          Seq(WriteResult(adds, touched))
        }
      } finally {
        matched.unpersist(blocking = false)
        ()
      }
    }
  }

  /** Delta `REORG TABLE … APPLY (PURGE)` analog: physically rewrite ONLY
    * the files carrying deletion vectors, materializing the soft deletes
    * into clean files (fresh footer/bloom/sum stats, no `dv` reference) —
    * after which `vacuum` can reclaim the old files AND the sidecars, and
    * DV-restricted paths (storage-partitioned-join fast path, deep-clone
    * byte-copy, symlink manifests) light up again. Untouched files are
    * never rewritten or even opened: cost ∝ DV'd data, not table size —
    * the reason this exists next to [[compact]] (which rewrites
    * everything). Commit shape is remove+add per purged file, so
    * incremental/CDF consumers observe a rewrite, not a row change. */
  def reorgPurge(): LakeTable = retrying {
    val dvd = liveFiles(None).filter(_.dv.isDefined)
    if (dvd.isEmpty) return this
    writeCommit("reorg") { (writeId, _) =>
      // readFiles applies the DVs at scan time: what it returns IS the
      // purged content; meta columns ride along so rows keep their
      // original commit identity
      val rows = readFiles(dvd).drop("_file_name")
      Seq(writeFiles(rows, writeId, log = false).copy(remove = dvd.map(_.path)))
    }
  }

  /** Row-level UPDATE (Delta `UPDATE t SET … WHERE …`): rewrite only the
    * files holding rows where `cond` is definitively true, applying
    * `assigns` to those rows and passing every other row of the touched
    * files through unchanged. Same stats/detection shape as [[delete]]:
    * detection is column-pruned, the rewrite re-scans only touched files,
    * and rows with a NULL-evaluating condition are left untouched. */
  def update(cond: Column, assigns: Map[String, Column]): LakeTable = retrying {
    val declared = schema
    assigns.keys.foreach { n =>
      require(declared.fieldNames.exists(_.equalsIgnoreCase(n)), s"no column $n")
      require(!n.equalsIgnoreCase(spec.key), s"cannot UPDATE the record key '$n'")
      // a partition change is a record move under (key, partition) identity
      // — and would leave _partition_path stale; route it through
      // delete + insert instead
      require(!spec.partition.exists(_.equalsIgnoreCase(n)),
        s"cannot UPDATE the partition column '$n'")
      require(!spec.identity.keys.exists(_.equalsIgnoreCase(n)),
        s"column '$n' is GENERATED ALWAYS AS IDENTITY and cannot be updated")
    }
    if (spec.mor && liveFiles(None).exists(_.log)) compact() // see delete()
    val live = liveFiles(None)
    writeCommit("update") { (writeId, commitTime) =>
      val touched = readFiles(live, relFile = true)
        .filter(cond).select(REL_FILE).distinct()
        .collect().map(_.getString(0)).toSeq
      if (touched.isEmpty) Seq.empty
      else {
        val touchedSet = touched.toSet
        val hit = coalesce(cond, lit(false))
        val base = readFiles(live.filter(a => touchedSet.contains(a.path)))
        // ONE projection against the PRE-update row: the condition and
        // every assignment RHS see original values (standard UPDATE
        // semantics — `SET a = b, b = a` swaps; sequential withColumn
        // would let later assignments observe earlier ones). Updated rows
        // are restamped so incremental/changes/streaming consumers see
        // this commit's post-images.
        val outCols = base.columns.filterNot(_ == "_file_name").map { c =>
          assigns.find(_._1.equalsIgnoreCase(c)) match {
            case Some((_, v)) =>
              when(hit, v.cast(declared(c).dataType)).otherwise(col(c)).as(c)
            case None if c == "_commit_time" =>
              when(hit, lit(commitTime)).otherwise(col(c)).as(c)
            case None if c == "_commit_seqno" =>
              when(hit, concat_ws("_", lit(commitTime),
                spark_partition_id().cast(StringType),
                monotonically_increasing_id().cast(StringType))).otherwise(col(c)).as(c)
            case None => col(c)
          }
        }
        val rewritten = base.select(outCols.toSeq: _*)
        // CHECK constraints see the post-image of the updated rows
        checkConstraints(rewritten.filter(hit))
        Seq(writeFiles(rewritten, writeId, log = false)
          .copy(remove = touched))
      }
    }
  }

  /** Row-level delete by KEY SET (the `WHEN MATCHED … THEN DELETE` MERGE
    * path): stats-prune candidate files against the key range, narrow to
    * files actually holding a doomed key via a semi-join, rewrite only
    * those with an anti-join — no driver-side key list, no literal `isin`,
    * so the plan is O(1) in both key count and file count. */
  /** Record identity of a caller-supplied key frame: (key, partition) when
    * the table is partitioned AND the frame carries the partition column —
    * then only the matched partition's row dies; a bare key set keeps the
    * historical global semantics (the key dies in every partition). */
  private case class KeyIdentity(idC: Seq[String], jc: Seq[String],
      ids: DataFrame => DataFrame)
  private def keyIdentity(keys: DataFrame): KeyIdentity = {
    val byPartition = spec.partition.exists(keys.columns.contains)
    KeyIdentity(
      if (byPartition) idCols else Seq(spec.key),
      if (byPartition) joinIdCols else Seq(spec.key),
      df => if (byPartition) withJoinIds(df) else df)
  }

  def deleteKeys(keys: DataFrame): LakeTable =
    if (spec.mor) deleteKeysMor(keys) else retrying {
    val live = liveFiles(None)
    // keeping the raw partition column in `k` also lets pruneCandidates
    // partition-prune (see keyIdentity for the semantics)
    val KeyIdentity(idC, jc, ids) = keyIdentity(keys)
    val k = ids(keys.select(idC.map(col): _*)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      writeCommit("delete") { (writeId, _) =>
        val candidates = pruneCandidates(live, k)
        val touched = ids(readFiles(candidates, relFile = true))
          .join(k, jc, "left_semi")
          .select(REL_FILE).distinct().collect().map(_.getString(0)).toSeq
        if (touched.isEmpty) Seq.empty
        else {
          val touchedSet = touched.toSet
          val kept = ids(readFiles(candidates.filter(a => touchedSet.contains(a.path))))
            .join(k, jc, "left_anti")
            .drop(PID)
            .drop("_file_name")
          Seq(writeFiles(kept, writeId, log = false).copy(remove = touched))
        }
      }
    } finally {
      k.unpersist(blocking = false)
      ()
    }
  }

  /** MoR keyed delete: write TOMBSTONE log rows (key/partition real, data
    * columns null, [[FileAction.tombstone]] flagged) instead of folding the
    * logs and rewriting base files — the deletion-vector idea. Cost is
    * O(deleted keys) regardless of table size; `_rt` filters tombstoned
    * rows at read ([[applyTombstones]]), `_ro` stays stale until
    * compaction folds the tombstones away — ordinary MoR staleness. */
  private def deleteKeysMor(keys: DataFrame): LakeTable = retrying {
    val live = liveFiles(None)
    val KeyIdentity(idC, jc, ids) = keyIdentity(keys)
    val k = ids(keys.select(idC.map(col): _*)).distinct()
    writeCommit("delete") { (writeId, commitTime) =>
      // tombstone only keys that exist (stray keys would bloat the logs);
      // the existence probe is a key-column-pruned scan of stats-candidates.
      // The probe must see the full identity: a bare key set still needs
      // the live rows' partition values on the tombstone rows.
      val existing = withJoinIds(readFiles(pruneCandidates(live, k)))
        .join(k.select(jc.map(col): _*), jc, "left_semi")
        .select(idCols.map(col): _*).distinct()
      val row = schema.fields.map { f =>
        if (idCols.exists(_.equalsIgnoreCase(f.name))) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      val doomed = stampMeta(existing.select(row.toSeq: _*), commitTime)
      Seq(writeFiles(doomed, writeId + 1, log = true, tombstone = true))
        .filter(_.add.nonEmpty)
    }
  }

  /** Fold MoR logs (or fragmented CoW files) into fresh base files (M2).
    * Afterwards `_ro ≡ _rt`. Preserves per-row meta columns.
    *
    * @param clusterByKey range-partition + sort the rewrite by record key
    *   (Hudi clustering / Delta OPTIMIZE ZORDER analog for the 1-D case):
    *   files get tight, near-disjoint key ranges, so the commit-log min/max
    *   stats prune far more files on later upserts and point lookups. */
  /** Contested-key merged rewrite set (same shape as realtime()): only keys
    * present in a log file — or duplicated across base rows (bulk-insert
    * legacy) — need the dedup shuffle; every other base row passes through
    * untouched. Contested-key detection is a key-column-only aggregate
    * (column-pruned scan, map-side partial agg), so rewrite cost scales
    * with the log/dup volume, not the table size — at 100 TB the
    * difference between folding a day's updates and re-shuffling the
    * whole table. */
  private def mergedRewrite(live: Seq[FileAction]): DataFrame = {
    val (logActions, baseActions) = live.partition(_.log)
    val (tombActions, dataLogs) = logActions.partition(_.tombstone)
    val base = withJoinIds(readFiles(baseActions, keepWriteId = true))
    val logs = withJoinIds(readFiles(dataLogs, keepWriteId = true))
    val tombs = tombMax(tombActions)
    val logKeys = contestedLogKeys(logs, tombs)
    val dupBaseKeys = base.groupBy(joinIdCols.map(col): _*).count()
      .filter(col("count") > 1).select(joinIdCols.map(col): _*)
    val contestedKeys = logKeys.union(dupBaseKeys).distinct()
    val passThrough = base.join(contestedKeys, joinIdCols, "left_anti")
    val contested = applyTombstones(
      base.unionByName(logs).join(contestedKeys, joinIdCols, "left_semi"), tombs)
    dedupLatest(contested, idCols, spec.precombine, col(WRITE_ID))
      .unionByName(passThrough)
      .drop(WRITE_ID, "_file_name", PID)
  }

  def compact(clusterByKey: Boolean = false, targetFiles: Int = 0): LakeTable = retrying {
    val live = liveFiles(None)
    writeCommit("compact") { (writeId, _) =>
      val rt = mergedRewrite(live)
      val clustered =
        if (clusterByKey && targetFiles > 0)
          rt.repartitionByRange(targetFiles, col(spec.key)).sortWithinPartitions(col(spec.key))
        else if (clusterByKey)
          rt.repartitionByRange(col(spec.key)).sortWithinPartitions(col(spec.key))
        else rt
      Seq(writeFiles(clustered, writeId, log = false)
        .copy(remove = live.map(_.path)))
    }
  }

  /** Multi-dimensional clustering rewrite — Delta `OPTIMIZE ZORDER BY`
    * analog for 2-3 numeric columns: each dimension is bucketed into
    * `2^bitsPerDim` uniform buckets (bounds from one column-pruned min/max
    * job), bucket bits are interleaved into a Z-value (pure codegen'd
    * shift/mask expressions), and the table is range-partitioned + sorted
    * by it. Files then cover small HYPER-RECTANGLES of the dimension
    * space, so parquet row-group stats prune scans filtered on ANY of the
    * clustered columns — the property a 100 TB table needs when queries
    * filter on more than the record key. */
  def zorder(cols: Seq[String], targetFiles: Int = 0, bitsPerDim: Int = 8,
      incremental: Boolean = false): LakeTable = retrying {
    require(cols.size >= 2 && cols.size <= 3, "zorder needs 2-3 columns (1-D: compact(clusterByKey))")
    cols.foreach(c => require(schema.fieldNames.contains(c), s"no column $c"))
    val all = liveFiles(None)
    // incremental (liquid-clustering style): re-cluster ONLY files that no
    // prior zorder produced — cost ∝ data added since the last clustering,
    // never ∝ table size. Already-clustered files keep their tight
    // hyper-rectangles (and their row-group stats keep pruning); the new
    // batch gets its own. A file's provenance is its write-id's commit
    // operation — pure commit-log metadata.
    val live =
      if (!incremental) all
      else {
        require(!all.exists(_.log),
          "incremental zorder needs MoR logs folded first (run compact())")
        val opOf: Map[Long, String] = commits.map(c => c.version -> c.operation).toMap
        all.filterNot { a =>
          val head = a.path.takeWhile(_ != '/')
          head.startsWith(s"$WRITE_ID=") &&
            head.drop(WRITE_ID.length + 1).toLongOption
              .map(_ / LakeTable.WRITE_SLOTS)
              .exists(v => opOf.get(v).exists(_.startsWith("zorder")))
        }
      }
    if (incremental && live.isEmpty) return this // nothing new to cluster
    writeCommit(if (incremental) "zorder_incremental" else "zorder") { (writeId, _) =>
      val rt = mergedRewrite(live)
      val aggExprs = cols.flatMap(c =>
        Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
      val bounds = rt.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
      val n = 1 << bitsPerDim
      val buckets = cols.zipWithIndex.map { case (c, i) =>
        if (bounds.isNullAt(2 * i) || bounds.getDouble(2 * i) == bounds.getDouble(2 * i + 1))
          lit(0L)
        else
          // explicit null branch: least() SKIPS nulls, so a bare
          // least(width_bucket(null,…), n) would land nulls in the TOP
          // bucket instead of the bottom one
          when(col(c).isNull, lit(0L)).otherwise(
            least(width_bucket(col(c).cast("double"),
              lit(bounds.getDouble(2 * i)), lit(bounds.getDouble(2 * i + 1)), lit(n)),
              lit(n.toLong)) - 1L)
      }
      val z = (0 until bitsPerDim).flatMap { b =>
        buckets.zipWithIndex.map { case (bucket, d) =>
          shiftleft(shiftright(bucket, b).bitwiseAND(lit(1L)), b * cols.size + d)
        }
      }.reduce(_ + _)
      val zc = "_graft_z"
      val tagged = rt.withColumn(zc, z)
      val clustered =
        (if (targetFiles > 0) tagged.repartitionByRange(targetFiles, col(zc))
         else tagged.repartitionByRange(col(zc)))
          .sortWithinPartitions(col(zc))
          .drop(zc)
      Seq(writeFiles(clustered, writeId, log = false)
        .copy(remove = live.map(_.path)))
    }
  }

  /** Delta-style OPTIMIZE (`/root/reference/README.md:1240`: "concatenate
    * small files"): rewrite only base files smaller than `smallFileBytes`
    * into consolidated files, leaving right-sized files untouched (compact
    * rewrites everything). MoR log files are left to `compact`. */
  def optimize(smallFileBytes: Long = 64L * 1024 * 1024,
      partitionFilter: Option[String => Boolean] = None): LakeTable = retrying {
    val all = liveFiles(None)
    // MoR with outstanding logs: rewriting base files would give them a
    // newer write-id than the logs and flip precombine-TIE resolution at
    // read (log must beat base for equal precombine) — compact instead,
    // which folds the logs and reaches the same small-file goal.
    if (spec.mor && all.exists(_.log)) {
      require(partitionFilter.isEmpty,
        "partition-scoped OPTIMIZE needs the MoR logs folded first (run compact())")
      return compact()
    }
    val fs = new Path(dataDir).getFileSystem(conf)
    // external references (shallow clone / convert) are not concatenation
    // candidates — compact() is the op that absorbs them into own files.
    // A partition filter (Delta `OPTIMIZE t WHERE part = …`) scopes the
    // concatenation to matching partitions — commit-log metadata only,
    // nothing outside the named partitions is listed or rewritten.
    val small = all.filterNot(_.log).filter(_.base.isEmpty)
      // era guard: a partition-scoped OPTIMIZE matches files against the
      // CURRENT partition column — an old-era file's stored value belongs
      // to a different column, so it never matches (compact() migrates it)
      .filter(a => partitionFilter.forall(f =>
        partitionColOf(a) == spec.partition && a.partitionValue.exists(f)))
      .filter { a =>
        fs.getFileStatus(new Path(s"$dataDir/${a.path}")).getLen < smallFileBytes
      }
    if (small.size < 2) return this // nothing to concatenate
    writeCommit("optimize") { (writeId, _) =>
      val rows = readFiles(small).drop("_file_name")
        .coalesce(math.max(1, small.size / 8))
      Seq(writeFiles(rows, writeId, log = false)
        .copy(remove = small.map(_.path)))
    }
  }

  /** Hudi-style incremental query: the rows written by commits in
    * `(sinceVersion, asOf]` — new inserts and the post-image of updates —
    * latest-wins deduped. The pull reads only the files those commits
    * added (no full-table scan), which is the whole point of incremental
    * consumption at scale. */
  def incremental(sinceVersion: Long, asOf: Option[Long] = None): DataFrame = {
    val upTo = asOf.getOrElse(latestVersion)
    // PHYSICAL-ONLY window (a compaction/zorder landing as its own
    // streaming micro-batch): every added file carries only pre-existing
    // rows, so the post-image set is empty by metadata proof. Without
    // this, a tailing stream READS the whole rewritten table per
    // compaction and then filters every row back out by commit time —
    // cost ∝ table size, exactly what the churn-bounded contract above
    // forbids at 100 TB. Mixed windows (catch-up spans) keep the
    // commit-time filter path: their genuine post-images may live only
    // inside the rewrite's files.
    if (windowPhysicalOnly(sinceVersion, upTo))
      return ordered(readFiles(Nil, asOf = Some(upTo)), Some(upTo))
    val cs = commits // one log read for the window files + sinceTime
    val added = cs
      .filter(c => c.version > sinceVersion && c.version <= upTo)
      .flatMap(_.add)
    // a file added then removed by a later included commit has been
    // rewritten — its surviving rows live in the newer file. Tombstone
    // files carry no post-images (MoR deletes are not surfaced, like
    // Hudi's incremental view) but LIVE tombstones must still suppress
    // post-images of rows they killed.
    val live = liveFiles(Some(upTo))
    val livePaths = live.map(_.path).toSet
    val files = added.filter(a => livePaths.contains(a.path) && !a.tombstone)
    val df = withJoinIds(readFiles(files, keepWriteId = true, asOf = Some(upTo)))
    val alive = applyTombstones(df, tombMax(live.filter(_.tombstone), Some(upTo)))
      .drop(PID)
    val deduped = dedupLatest(alive, idCols, spec.precombine, col(WRITE_ID)).drop(WRITE_ID)
    // rewritten files carry old rows too — keep only rows stamped by the
    // included commits
    val sinceTime = cs.find(_.version == sinceVersion).map(_.commitTime)
    val recent = sinceTime match {
      case Some(ct) => deduped.filter(col("_commit_time") > ct)
      case None => deduped
    }
    ordered(recent, Some(upTo))
  }

  /** Delta change-data-feed-style read: every change in `(since, asOf]`
    * tagged with `_change_type` ∈ insert / update_postimage / delete.
    * Post-images come from [[incremental]] (reads only the window's added
    * files). Insert-vs-update discrimination and delete detection also read
    * ONLY window-touched files — no snapshot-wide key scan — because
    * changing a key always leaves a trace in the window's own file actions:
    *
    *   - CoW update / delete / overwrite rewrites the key's containing
    *     file, so a pre-existing changed key appears in a REMOVED file
    *     that was live at `since`;
    *   - MoR update appends the key to an ADDED log file (and MoR routes
    *     only already-existing keys to logs — a key both log-written and
    *     freshly base-inserted inside the window is the insert-then-update
    *     case, excluded by its `_commit_time` stamp);
    *   - a pre-existing changed key still alive at `asOf` must live in a
    *     file some window commit added (rewrite chains stay in-window),
    *     so "absent from the window's added live files" ⇒ deleted.
    *
    * Cost therefore scales with window churn, not table size — the property
    * that matters when tailing a 100 TB table. Delete rows carry the key
    * and null data columns, like Delta's CDF delete rows.
    *
    * `includePreimages` (Delta CDF parity) additionally emits an
    * `update_preimage` row per updated key: its values AT `since` (the
    * window-initial state — `changes` is net-change over the window, so
    * one pre/post pair per key, not one per intermediate commit). CoW
    * only, and still ∝ churn: preimages are rows of the window-REMOVED
    * files, which a CoW update necessarily rewrote. */
  def changes(since: Long, asOf: Option[Long] = None,
      includePreimages: Boolean = false): DataFrame = {
    val upTo = asOf.getOrElse(latestVersion)
    // physical-only window: no inserts, no updates, no deletes — empty
    // by metadata proof, skipping the rewritten/now key scans entirely
    // (see [[incremental]]; a compaction otherwise costs two full reads
    // here: the removed files AND the added files, to prove no change)
    if (windowPhysicalOnly(since, upTo)) {
      val empty = incremental(since, Some(upTo))
      return empty.withColumn("_change_type", lit(""))
        .filter(lit(false))
    }
    val post = incremental(since, Some(upTo))
    val cs = commits // one log read for window + sinceTime
    val window = cs.filter(c => c.version > since && c.version <= upTo)
    val sinceTime = cs.find(_.version == since).map(_.commitTime)
    // record identity is (key, partition), same as every write path — a
    // null-safe PID join id plus the raw columns (delete rows carry both)
    def ids(df: DataFrame): DataFrame =
      withJoinIds(df).select((idCols ++ spec.partition.map(_ => PID)).map(col): _*)
    val removedPaths = window.flatMap(_.remove).toSet
    val rewrittenRows = readFiles(
      liveFiles(Some(since)).filter(a => removedPaths.contains(a.path)),
      asOf = Some(since))
    val rewrittenKeys = ids(rewrittenRows)
    val logKeys = {
      val logAdded = window.flatMap(_.add).filter(_.log)
      val fresh = readFiles(window.flatMap(_.add).filterNot(_.log), asOf = Some(upTo))
        .filter(sinceTime.map(ct => col("_commit_time") > ct).getOrElse(lit(true)))
      ids(readFiles(logAdded, asOf = Some(upTo)))
        .join(ids(fresh).select(joinIdCols.map(col): _*), joinIdCols, "left_anti")
    }
    val preIds = rewrittenKeys.unionByName(logKeys).distinct()
    val tagged = withJoinIds(post)
      .join(preIds.select(joinIdCols.map(col): _*).distinct()
        .withColumn("_pre", lit(true)), joinIdCols, "left")
      .withColumn("_change_type",
        when(col("_pre").isNotNull, "update_postimage").otherwise("insert"))
      .drop("_pre", PID)
    val liveNow = liveFiles(Some(upTo))
    val liveNowPaths = liveNow.map(_.path).toSet
    // "still alive at asOf": rows of the window's added live files minus
    // tombstone files, with tombstone-killed rows filtered — a key whose
    // only window trace is its tombstone is NOT alive
    val nowIds = applyTombstones(
        withJoinIds(readFiles(
          window.flatMap(_.add).filter(a => liveNowPaths.contains(a.path) && !a.tombstone),
          keepWriteId = true, asOf = Some(upTo))),
        tombMax(liveNow.filter(_.tombstone), Some(upTo)))
      .select(joinIdCols.map(col): _*).distinct()
    val deleted = preIds.join(nowIds, joinIdCols, "left_anti")
      .select(idCols.map(col): _*).distinct()
      .withColumn("_change_type", lit("delete"))
    val base = tagged.unionByName(deleted, allowMissingColumns = true)
    if (!includePreimages) base
    else {
      require(!spec.mor,
        "update_preimage needs a CoW table: a MoR update leaves the old " +
          "value in an un-removed base file — compact() first")
      // updated = has a postimage AND existed before. NOT preIds ∩ nowIds:
      // a CoW rewrite carries unchanged rows into the new file, so they sit
      // in both preIds (removed file) and nowIds (added file) without being
      // updates — only the commit-time-filtered post rows are real changes.
      val updatedIds = withJoinIds(post).select(joinIdCols.map(col): _*)
        .distinct()
        .join(preIds.select(joinIdCols.map(col): _*).distinct(),
          joinIdCols, "left_semi")
      val preimages = withJoinIds(rewrittenRows)
        .join(updatedIds.select(joinIdCols.map(col): _*).distinct(),
          joinIdCols, "left_semi")
        .withColumn("_change_type", lit("update_preimage"))
        .drop(PID)
      base.unionByName(preimages, allowMissingColumns = true)
    }
  }

  /** Net row delta of a CoW table over `(since, upTo]`, as two DataFrames:
    * `plus` = rows of files ADDED in the window and still live at `upTo`,
    * `minus` = rows of files live at `since` and REMOVED by a window commit.
    *
    * A copy-on-write rewrite carries every surviving row of the old file
    * into the new one, so rewritten-but-unchanged rows appear in BOTH sides
    * and cancel under any linear aggregate — `Σf(plus) − Σf(minus)` is
    * exactly the table's aggregate change, with NO key-level diff and cost
    * proportional to window churn, not table size. This is the engine of
    * [[MaterializedView.refresh]]. Both sides read with the `upTo` schema,
    * so mid-window additive evolution surfaces nulls instead of breaking.
    *
    * MoR tables route through [[windowDeltaMor]]: log rows supersede base
    * rows without removing their file, which breaks the file-level
    * cancellation — the MoR delta instead diffs the two MERGED snapshots
    * restricted to the window's touched record identities. */
  /** Metadata-only: is every commit in `(since, upTo]` a physical
    * reorganization (compact / optimize / zorder) — a rewrite that carries
    * rows unchanged? Such a window's true row delta is EMPTY by
    * construction, so [[windowDelta]] answers it without reading a single
    * data file: at a production compaction cadence, registered views must
    * not pay even a netting shuffle for windows that moved only bytes. */
  private[lake] def windowPhysicalOnly(since: Long, upTo: Long): Boolean = {
    val w = commits.filter(c => c.version > since && c.version <= upTo)
    w.nonEmpty && w.forall(c => LakeTable.physicalOps.contains(c.operation))
  }

  /** Pure metadata commit: advance idempotent-transaction watermarks
    * (`txnMany`) without touching a single data file. [[MaterializedView]]
    * publishes its refresh cursor this way when every member's pending
    * window is [[windowPhysicalOnly]] — the delta is empty by metadata
    * proof, so the refresh costs zero Spark jobs and zero file reads.
    * OCC-pinned like any state publish; the multi-watermark no-op rule in
    * [[writeCommit]] applies unchanged. */
  private[lake] def bumpTxn(expectedVersion: Long,
      txnMany: Map[String, Long]): LakeTable =
    writeCommit("cursor_bump", expectedVersion = Some(expectedVersion),
      txnMany = txnMany) { (_, _) => Seq.empty }

  private[lake] def windowDelta(since: Long, upTo: Long): (DataFrame, DataFrame) = {
    if (windowPhysicalOnly(since, upTo)) {
      val empty = readFiles(Nil, asOf = Some(upTo))
      return (empty, empty)
    }
    if (spec.mor) return windowDeltaMor(since, upTo)
    val window = commits.filter(c => c.version > since && c.version <= upTo)
    val liveUp = liveFiles(Some(upTo)).map(_.path).toSet
    val plusActs = window.flatMap(_.add)
      .filter(a => liveUp.contains(a.path) && !a.log && !a.tombstone)
    val removedPaths = window.flatMap(_.remove).toSet
    val minusActs = liveFiles(Some(since)).filter(a => removedPaths.contains(a.path))
    (readFiles(plusActs, asOf = Some(upTo)), readFiles(minusActs, asOf = Some(upTo)))
  }

  /** MoR net row delta over `(since, upTo]`, as (plus, minus) rows of the
    * MERGED realtime view — so an MV over a streaming MoR ingest table
    * maintains without compacting first, `_rt`-consistent by construction.
    *
    * An identity's merged row can differ between the two snapshots only if
    * a window commit touched it: rows of window-ADDED files (base adds,
    * data-log upserts, tombstone keys) or of window-REMOVED files
    * (CoW-style rewrites on a compacted MoR table drop rows with no log
    * trace). With K = those identities,
    * `plus = realtime(upTo) ⋉ K`, `minus = realtime(since) ⋉ K` — every
    * untouched identity cancels by omission, so the delta is exact for
    * upserts, deletes (tombstones), re-inserts, and compactions alike.
    *
    * Cost ∝ churn, not table size: K comes from reading only the window's
    * touched files, and both snapshot reads prune their BASE files against
    * K's (bounded) key set via stats/bloom/bucket skipping — log files are
    * churn-sized already. A compaction inside the window touches every
    * key (its rewrite carries all rows), degrading to two full merged
    * scans whose carried rows cancel — the same cost CoW pays for a
    * full-rewrite window. */
  private def windowDeltaMor(since: Long, upTo: Long): (DataFrame, DataFrame) = {
    val window = commits.filter(c => c.version > since && c.version <= upTo)
    val addActs = window.flatMap(_.add)
    val removedPaths = window.flatMap(_.remove).toSet
    val removedActs = liveFiles(Some(since)).filter(a => removedPaths.contains(a.path))
    val touchedActs = (addActs ++ removedActs)
      .groupBy(_.path).map(_._2.head).toSeq
    if (touchedActs.isEmpty) {
      val empty = readFiles(Nil, asOf = Some(upTo))
      return (empty, empty)
    }
    // recomputed per side (window files are churn-sized); not cached — a
    // lazily-consumed delta must not leak a persisted plan
    val touchedKeys = withJoinIds(readFiles(touchedActs, asOf = Some(upTo)))
      .select(joinIdCols.map(col): _*).distinct()
    // bounded key collect (an optimization seam only — the semi-join
    // below is what bounds the ROWS): within the cap, both snapshot
    // reads stats/bloom/bucket-skip base files against the key set
    val sample = touchedKeys.select(col(spec.key)).distinct()
      .limit(LakeTable.MOR_DELTA_KEY_CAP + 1).collect().map(_.get(0))
    val baseFilters =
      if (sample.length > LakeTable.MOR_DELTA_KEY_CAP || sample.contains(null)) Nil
      else Seq(org.apache.spark.sql.sources.In(spec.key, sample))
    def side(v: Long): DataFrame =
      withJoinIds(realtimePruned(Some(v), baseFilters))
        .join(touchedKeys, joinIdCols, "left_semi")
        .drop(PID)
    (side(upTo), side(since))
  }

  /** Delta `GENERATE symlink_format_manifest` analog: write text manifests
    * under `_symlink_format_manifest/` listing the snapshot's absolute data
    * file paths — one `manifest` per partition directory (unpartitioned:
    * one at the root), so manifest-reading engines (Trino/Presto/Athena
    * symlink tables) can query the exact committed snapshot without
    * understanding the graft log. Refuses MoR logs and deletion vectors
    * (a path list cannot express read-time merges — the same restriction
    * Delta documents for DV tables): compact first. Regenerates from
    * scratch each call (stale partition manifests are removed). Returns
    * the manifest-relative partition dirs written. */
  def generateManifest(): Seq[String] = {
    val live = liveFiles(None)
    require(!live.exists(_.log),
      "manifest generation needs a compacted table: MoR logs cannot be " +
        "expressed as a path list — run compact() first")
    require(live.forall(_.dv.isEmpty),
      "manifest generation cannot express deletion vectors — compact() first")
    val fsys = new Path(path).getFileSystem(conf)
    val manifestRoot = new Path(path, "_symlink_format_manifest")
    if (fsys.exists(manifestRoot)) fsys.delete(manifestRoot, true)
    // era-aware dir naming: each file's manifest entry sits under the
    // partition dir it was PHYSICALLY written with (after a partition
    // evolution, old-era files keep their own column's dirs — external
    // engines read the same layout the filesystem shows)
    val groups = live.groupBy { a =>
      (if (spec.partition.isDefined) partitionColOf(a) else None)
        .flatMap(c => a.partitionValue.map(v => s"$c=$v")).getOrElse("")
    }
    groups.toSeq.sortBy(_._1).map { case (rel, acts) =>
      val dir = if (rel.isEmpty) manifestRoot else new Path(manifestRoot, rel)
      fsys.mkdirs(dir)
      val body = acts.map { a =>
        val base = a.base.getOrElse(dataDir)
        fsys.makeQualified(new Path(s"$base/${a.path}")).toString
      }.sorted.mkString("", "\n", "\n")
      val out = fsys.create(new Path(dir, "manifest"), true)
      out.write(body.getBytes("UTF-8"))
      out.close()
      rel
    }
  }

  /** Delta Lake PROTOCOL interop export: write a `_delta_log/` snapshot
    * (version 00000000000000000000.json, newline-delimited actions —
    * protocol v1/v2, metaData with the Spark schema JSON Delta itself
    * uses as `schemaString`, one `add` per live file with relative
    * URI-encoded path + partitionValues + size) so ANY Delta reader
    * (delta-rs, DuckDB's delta extension, Spark with delta jars, Trino)
    * can query the committed snapshot in place — no copy, the same
    * parquet files. The export is a static snapshot (regenerated per
    * call), the complement of the symlink manifest for engines that speak
    * Delta rather than Hive symlink tables.
    *
    * Same expressibility refusals as the manifest (MoR logs, DVs —
    * compact first), plus: column mapping (files store physical names the
    * exported logical schema would not match), shallow-clone/convert
    * references (Delta add paths must resolve under THIS table root; deep
    * clone first), and mixed partition eras (one declared
    * partitionColumns list cannot describe two layouts — compact
    * migrates). Deterministic apart from file modification times: the
    * table id derives from the path, createdTime from commit 0. Returns
    * the log file path. */
  def generateDeltaLog(): String = {
    val live = liveFiles(None)
    require(!live.exists(_.log),
      "delta-log export needs a compacted table (MoR logs) — run compact() first")
    require(live.forall(_.dv.isEmpty),
      "delta-log export cannot express deletion vectors — compact() or reorgPurge() first")
    require(spec.columnMap.isEmpty,
      "delta-log export of a column-mapped table would mismatch physical names")
    require(live.forall(_.base.isEmpty),
      "delta-log export needs self-contained files (shallow clone/convert) — compact() first")
    require(!mixedPartitionEras(live, spec),
      "delta-log export needs a single partition layout — compact() after partition evolution")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def obj() = mapper.createObjectNode()
    val fsys = new Path(path).getFileSystem(conf)
    // batch one listing per parent dir for (size, modificationTime)
    val statCache = scala.collection.mutable.HashMap.empty[String, Map[String, (Long, Long)]]
    def statOf(rel: String): (Long, Long) = {
      val abs = new Path(s"$dataDir/$rel")
      val dir = abs.getParent.toString
      statCache.getOrElseUpdate(dir, {
        fsys.listStatus(abs.getParent)
          .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime)).toMap
      }).getOrElse(abs.getName, (0L, 0L))
    }
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val protocol = obj()
    protocol.putObject("protocol").put("minReaderVersion", 1).put("minWriterVersion", 2)
    lines += mapper.writeValueAsString(protocol)
    val meta = obj()
    val md = meta.putObject("metaData")
    md.put("id", java.util.UUID.nameUUIDFromBytes(path.getBytes("UTF-8")).toString)
    md.putObject("format").put("provider", "parquet").putObject("options")
    md.put("schemaString", schema.json)
    val pcols = md.putArray("partitionColumns")
    spec.partition.foreach(pcols.add)
    md.putObject("configuration")
    md.put("createdTime",
      java.time.LocalDateTime.parse(CommitLog.read(path, 0L, conf).commitTime,
        LakeTable.TIME_FMT).toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    lines += mapper.writeValueAsString(meta)
    live.sortBy(_.path).foreach { a =>
      val add = obj()
      val n = add.putObject("add")
      val rel = s"data/${a.path}"
      n.put("path", new java.net.URI(null, null, rel, null).toASCIIString)
      val pv = n.putObject("partitionValues")
      spec.partition.foreach { p =>
        a.partitionValue match {
          case Some("__HIVE_DEFAULT_PARTITION__") | None => pv.putNull(p)
          case Some(v) => pv.put(p, v)
        }
      }
      val (len, mod) = statOf(a.path)
      n.put("size", if (a.bytes > 0) a.bytes else len)
      n.put("modificationTime", mod)
      n.put("dataChange", true)
      lines += mapper.writeValueAsString(add)
    }
    val logDir = new Path(path, "_delta_log")
    fsys.mkdirs(logDir)
    // sweep any previous export: a stale higher version would shadow ours
    fsys.listStatus(logDir).filter(_.getPath.getName.endsWith(".json"))
      .foreach(s => fsys.delete(s.getPath, false))
    val target = new Path(logDir, f"${0L}%020d.json")
    val out = fsys.create(target, true)
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
    target.toString
  }

  /** Iceberg-protocol snapshot export — `metadata/v1.metadata.json` +
    * manifest-list/manifest avro per the PUBLIC Iceberg v1 spec, so any
    * Iceberg reader queries the committed snapshot in place (the UniForm
    * idea; [[graft.lake.IcebergExport]] for the format details). SQL:
    * `GENERATE iceberg_metadata FOR TABLE t`. Returns the metadata.json
    * path. Refusals mirror [[generateDeltaLog]] (MoR logs, DVs, column
    * mapping, external file references, mixed partition eras). */
  def generateIcebergMetadata(): String = IcebergExport.write(this, conf)

  /** Physically delete files not live in the `retainVersions` most recent
    * versions (M1) — or, when `retainHours` is set, not live in any version
    * committed within that many hours of the latest commit (Delta's
    * `RETAIN n HOURS` knob, the retention operators actually set). Time
    * travel before the horizon stops working — same trade as Delta VACUUM
    * (`/root/reference/README.md:1240`). `dryRun` (Delta `VACUUM … DRY
    * RUN`) enumerates without deleting. Returns the table-relative paths
    * deleted (or, dry, WOULD be deleted) — driver metadata + one listing,
    * the same work the destructive pass does. */
  /** Hudi savepoint analog: pin version `v` against vacuum — its
    * snapshot's files survive cleaning regardless of the retention
    * window, so `read(Some(v))` / `restore(v)` keep working for as long
    * as the pin exists. Metadata-only commit; the pin set rides the
    * commit log denormalized (like `txn`), OCC-safe. */
  def savepoint(v: Long): LakeTable = retrying {
    require(v >= 0 && v <= latestVersion, s"no version $v to savepoint")
    val cur = latestCommit.savepoints
    if (cur.contains(v)) return this
    writeCommit("savepoint", savepoints = Some((cur :+ v).sorted)) { (_, _) => Seq.empty }
  }

  /** Drop a savepoint pin: the version's files become reclaimable the
    * moment they leave the normal retention window. */
  def releaseSavepoint(v: Long): LakeTable = retrying {
    val cur = latestCommit.savepoints
    require(cur.contains(v), s"no savepoint at version $v")
    writeCommit("release_savepoint",
      savepoints = Some(cur.filterNot(_ == v))) { (_, _) => Seq.empty }
  }

  /** Currently pinned versions. */
  def savepoints: Seq[Long] = latestCommit.savepoints

  def vacuum(retainVersions: Int = 1, retainHours: Option[Double] = None,
      orphanGraceHours: Double = 1.0, dryRun: Boolean = false): Seq[String] = {
    val latest = latestVersion
    val horizon = retainHours match {
      case Some(h) =>
        // commit times are fixed-width UTC "yyyyMMddHHmmssSSS": lexicographic
        // order == chronological, so the cutoff is a string compare
        val cs = commits
        val latestTime = java.time.LocalDateTime.parse(
          cs.map(_.commitTime).max, LakeTable.TIME_FMT)
        val cutoff = latestTime.minusNanos((h * 3600e9).toLong).format(LakeTable.TIME_FMT)
        cs.filter(_.commitTime >= cutoff).map(_.version)
          .minOption.map(v => math.min(v, latest)).getOrElse(latest)
      case None => math.max(0L, latest - (retainVersions - 1))
    }
    // savepointed snapshots survive regardless of the retention window
    val pinned = latestCommit.savepoints.filter(v => v >= 0 && v < horizon)
    val retained = ((horizon to latest) ++ pinned).map(v => liveFiles(Some(v)))
    val keep: Set[String] = retained.flatten.map(_.path).toSet
    // DV sidecar dirs referenced by any retained snapshot must survive;
    // relative refs only (absolute ones belong to another table)
    val keepDv: Set[String] =
      retained.flatten.flatMap(_.dv).filterNot(_.startsWith("/")).toSet
    // files some commit once referenced: superseded data, safe to drop the
    // moment they leave the retained window. A file NO commit ever added is
    // an attempt dir — possibly a CONCURRENT writer's in-flight files, so
    // it only goes once it is older than the orphan grace (multi-writer
    // safety; the same reason Delta vacuums with a retention check).
    val allAdds = commits.flatMap(_.add)
    val everAdded: Set[String] =
      allAdds.filter(_.base.isEmpty).map(_.path).toSet
    val everDv: Set[String] =
      allAdds.flatMap(_.dv).filterNot(_.startsWith("/")).toSet
    val orphanCutoff = System.currentTimeMillis() - (orphanGraceHours * 3600e3).toLong
    val fs = new Path(dataDir).getFileSystem(conf)
    val root = new Path(dataDir)
    val doomed = scala.collection.mutable.ArrayBuffer.empty[String]
    def drop(p: Path, rel: String): Unit = {
      doomed += rel
      if (!dryRun) { fs.delete(p, false); () }
    }
    if (fs.exists(root)) {
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next()
        // LAST occurrence, matching substring_index(input_file_name(),
        // "/data/", -1) in detection — a table path containing "/data/"
        // must not shift the relative path
        val rel = f.getPath.toString.split("/data/").last
        def stale = f.getModificationTime < orphanCutoff
        // DV sidecars first (they are .parquet too): swept per DIR — a
        // referenced dir survives whole, a superseded one goes the moment
        // it leaves the window, an unknown one waits out the orphan grace
        if (rel.startsWith(s"$DV_DIR/")) {
          val dvDir = rel.split("/").take(2).mkString("/")
          if (!keepDv.contains(dvDir) && (everDv.contains(dvDir) || stale))
            drop(f.getPath, rel)
        }
        else if (f.getPath.getName.endsWith(".parquet") && !keep.contains(rel)) {
          if (everAdded.contains(rel) || stale) drop(f.getPath, rel)
        }
        // bloom sidecar goes with its data file (same in-flight guard);
        // column sidecars (`<rel>.<col>.bf`) strip their column segment
        else if (rel.startsWith(".blooms/")) {
          val raw = rel.stripPrefix(".blooms/").stripSuffix(".bf")
          val cut = raw.lastIndexOf(".parquet")
          val dataRel = if (cut >= 0) raw.substring(0, cut + ".parquet".length) else raw
          if (!keep.contains(dataRel) && (everAdded.contains(dataRel) || stale))
            drop(f.getPath, rel)
        }
        // write-id claim markers of dirs that no longer exist
        else if (rel.startsWith(".claims/")) {
          val dir = rel.stripPrefix(".claims/")
          if (!fs.exists(new Path(s"$dataDir/$dir")) && stale)
            drop(f.getPath, rel)
        }
      }
    }
    doomed.toSeq
  }

  /** Delta `FSCK REPAIR TABLE` analog: drop commit-log references to live
    * files whose PHYSICAL data is missing on storage (external deletion,
    * partial restore, lost bucket object) so the table reads again —
    * losing exactly the missing rows instead of failing every query. A
    * file whose DELETION-VECTOR sidecar is gone is dropped too: serving
    * it without the DV would resurrect deleted rows, strictly worse than
    * honest absence. Existence checks batch ONE `listStatus` per parent
    * dir (never one RPC per file), so the repair costs ∝ directory
    * count. `dryRun` reports without committing. Returns the dropped
    * references. History is untouched — time travel to versions whose
    * files still exist keeps working. */
  def repair(dryRun: Boolean = false): Seq[String] = retrying {
    val live = liveFiles(None)
    val dirCache = scala.collection.mutable.HashMap.empty[String, Set[String]]
    def names(dir: Path): Set[String] = dirCache.getOrElseUpdate(dir.toString, {
      val f = dir.getFileSystem(conf)
      if (!f.exists(dir)) Set.empty
      else f.listStatus(dir).map(_.getPath.getName).toSet
    })
    def present(abs: Path): Boolean = names(abs.getParent).contains(abs.getName)
    def dvIntact(a: FileAction): Boolean = a.dv.forall { d =>
      names(new Path(dvRoot(d))).exists(_.endsWith(".parquet"))
    }
    val missing = live.filter(a =>
      !present(new Path(s"${a.base.getOrElse(dataDir)}/${a.path}")) || !dvIntact(a))
    if (missing.nonEmpty && !dryRun)
      writeCommit("fsck") { (_, _) =>
        Seq(WriteResult(Seq.empty, missing.map(_.path)))
      }
    missing.map(_.path)
  }

  /** Shallow clone (Delta `CREATE TABLE … SHALLOW CLONE` analog): a new
    * table at `targetPath` whose bootstrap commit REFERENCES this table's
    * live files — zero data copied, metadata-only, O(file count). Writes to
    * the clone diverge copy-on-write: touched source files are rewritten
    * INTO THE CLONE's own data dir, the source is never modified. The
    * clone's history starts at this table's current version so its write
    * ids stay above every referenced file's (the dedup tiebreak ordering).
    *
    * Caveat (same as Delta's): VACUUM on the SOURCE can remove files a
    * clone still references — clones are for experiments/short-lived forks,
    * or compact() the clone to make it self-contained. */
  def cloneTo(targetPath: String, asOf: Option[Long] = None): LakeTable = {
    require(CommitLog.latestVersion(targetPath, conf).isEmpty,
      s"table exists at $targetPath")
    CommitLog.invalidateTable(targetPath)
    // a source file that is itself external (clone of a clone / of a
    // converted table) keeps its own base
    val refs = liveFiles(asOf).map(a => a.copy(
      base = a.base.orElse(Some(dataDir)),
      // DV refs cross the table boundary too: absolutize relative ones
      dv = a.dv.map(dvRoot)))
    val bootVersion = asOf.getOrElse(latestVersion)
    CommitLog.write(targetPath,
      Commit(bootVersion, LakeTable.commitTimeNow(), "clone",
        schemaAt(asOf).json, spec, refs, Seq.empty,
        // identity never restarts on a clone: carry the source's marks
        identityHigh = CommitLog.read(path, bootVersion, conf).identityHigh), conf)
    new LakeTable(spark, targetPath)
  }

  /** Delta `CREATE TABLE t DEEP CLONE s` analog: a fully independent copy
    * of the snapshot — unlike [[cloneTo]] (shallow), vacuuming or dropping
    * the source can never break a deep clone.
    *
    * Fast path: byte-level file copies distributed over the executors (an
    * IO-bound distcp, no decode/encode — compression, clustering, Z-order
    * and bucket layout survive exactly), with every commit-log stat
    * (key ranges, column stats, row/byte counts, partition values, bloom
    * sidecars) carried over verbatim — at 100 TB nothing is recomputed.
    * The copy is only provably sound when every live file carries the
    * snapshot schema and no DV is outstanding (the clone's single-commit
    * log cannot express per-file schemas or cross-table DV refs), so
    * evolved/DV'd/foreign-based snapshots fall back to a REWRITE
    * materialization (`read(asOf)` + bulk create) — always correct, costs
    * one decode/encode pass, and collapses MoR logs and DVs into clean
    * base files as a side effect. */
  def deepCloneTo(targetPath: String, asOf: Option[Long] = None): LakeTable = {
    require(CommitLog.latestVersion(targetPath, conf).isEmpty,
      s"table exists at $targetPath")
    CommitLog.invalidateTable(targetPath)
    val live = liveFiles(asOf)
    val snapSchema = schemaAt(asOf)
    val snapSpec = specAt(asOf)
    val uniform = live.forall(a =>
      a.base.isEmpty && a.dv.isEmpty && a.path.startsWith(s"$WRITE_ID=")) && {
      val versions = live.map(_.path.takeWhile(_ != '/').drop(WRITE_ID.length + 1))
        .flatMap(_.toLongOption).map(_ / LakeTable.WRITE_SLOTS).distinct
      versions.map(v => CommitLog.read(path, v, conf).schemaJson).distinct
        .forall(_ == snapSchema.json)
    }
    if (!uniform) {
      // rewrite materialization: bulk create from the merged snapshot
      // (logs folded, DVs applied, logical column names restored; a
      // bucketed spec hands partition=None back — create re-derives it)
      val clean = snapSpec.copy(columnMap = Map.empty,
        partition = if (snapSpec.buckets > 0) None else snapSpec.partition)
      // read() prepends META_COLS; create() stamps its own — drop them here
      // or the clone's committed schema would carry duplicates
      val snap = read(asOf)
      val data = snap.select(
        snap.columns.filterNot(LakeTable.META_COLS.contains).map(col): _*)
      // identity fidelity: the materialized rows KEEP their assigned ids
      // (and the source's high-water marks), they are not re-drawn
      return LakeTable.create(spark, targetPath, clean, data, bulkInsert = true,
        presetIdentityHigh =
          CommitLog.read(path, asOf.getOrElse(latestVersion), conf).identityHigh)
    }
    val version = 0L
    val wid = version * LakeTable.WRITE_SLOTS
    val widDir = s"$WRITE_ID=$wid"
    // new leaf names carry a per-file ordinal: two source write dirs may
    // hold identically-named part files, and the copies share one dir
    val copies = live.zipWithIndex.map { case (a, i) =>
      val relNoV = a.path.dropWhile(_ != '/').drop(1)
      val (dirs, leaf) = relNoV.lastIndexOf('/') match {
        case -1 => ("", relNoV)
        case cut => (relNoV.substring(0, cut + 1), relNoV.substring(cut + 1))
      }
      (a, s"$dataDir/${a.path}", s"$widDir/${dirs}c$i-$leaf")
    }
    val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
    val tgtData = s"$targetPath/data"
    val bloomSrcs = copies.map { case (a, src, _) =>
      s"$dataDir/.blooms/${a.path}.bf"
    }
    spark.sparkContext
      .parallelize(copies.map { case (_, s, d) => (s, d) }.zip(bloomSrcs),
        math.max(1, math.min(copies.size, 32)))
      .foreach { case ((src, dstRel), bloomSrc) =>
        val c = sconf.value
        val srcP = new Path(src)
        val fs = srcP.getFileSystem(c)
        val dstP = new Path(s"$tgtData/$dstRel")
        org.apache.hadoop.fs.FileUtil.copy(fs, srcP,
          dstP.getFileSystem(c), dstP, false, c)
        val bp = new Path(bloomSrc)
        if (fs.exists(bp)) {
          val bDst = new Path(s"$tgtData/.blooms/$dstRel.bf")
          org.apache.hadoop.fs.FileUtil.copy(fs, bp,
            bDst.getFileSystem(c), bDst, false, c)
        }
      }
    val adds = copies.map { case (a, _, dstRel) =>
      a.copy(path = dstRel, base = None)
    }
    CommitLog.write(targetPath,
      Commit(version, LakeTable.commitTimeNow(), "deepClone",
        snapSchema.json, snapSpec, adds, Seq.empty,
        identityHigh = CommitLog.read(path,
          asOf.getOrElse(latestVersion), conf).identityHigh), conf)
    new LakeTable(spark, targetPath)
  }

  /** Delta `DESCRIBE HISTORY` analog: one row per commit, newest first. */
  def history: DataFrame = {
    import spark.implicits._
    commits.sortBy(-_.version).map { c =>
      (c.version, c.commitTime, c.operation,
        c.add.size.toLong, c.remove.size.toLong, c.add.map(_.rows).sum)
    }.toDF("version", "commit_time", "operation",
      "n_added_files", "n_removed_files", "n_added_rows")
  }

  /** Delta `RESTORE TABLE … TO VERSION AS OF v` analog: a new commit whose
    * live set (and schema) is exactly version `v`'s — no data is copied,
    * the old files are re-referenced (they must not have been vacuumed).
    * History is preserved: the restore is itself a commit, and time travel
    * to the versions in between still works.
    *
    * Limitation: because restore re-references rows with their ORIGINAL
    * commit times, `incremental`/`changes`/streaming consumers do NOT see
    * the restore as row changes (its rows predate the window) — after a
    * restore, downstream consumers should re-sync from a snapshot, as with
    * Delta's RESTORE + CDF. */
  def restore(v: Long): LakeTable = retrying {
    require(v >= 0 && v <= latestVersion, s"no version $v to restore")
    val target = liveFiles(Some(v))
    val targetPaths = target.map(_.path).toSet
    val current = liveFiles(None).map(_.path).toSet
    // restoring across a partition evolution also restores the partition
    // SPEC — the restored files carry that era's layout, and new writes
    // should land beside them, not under a layout the snapshot predates
    val restoredSpec =
      if (specAt(Some(v)).partition != spec.partition)
        Some(spec.copy(partition = specAt(Some(v)).partition))
      else None
    writeCommit("restore", newSchema = Some(schemaAt(Some(v))),
      newSpec = restoredSpec) { (_, _) =>
      Seq(WriteResult(
        add = target.filterNot(a => current.contains(a.path)),
        remove = (current -- targetPaths).toSeq))
    }
  }

  /** Additive schema evolution WITHOUT data (the `ALTER TABLE ADD COLUMNS`
    * path): a schema-only commit widens the declared schema; existing files
    * simply surface nulls for the new columns at read (readFiles plans with
    * the declared schema, no footer merging). A re-added name whose
    * physical field was used before (dropped or renamed away) gets a FRESH
    * physical mapping, so old on-disk values never resurface. */
  def addColumns(fields: Seq[StructField]): LakeTable =
    addColumns(fields, Map.empty)

  /** `ALTER TABLE … ADD COLUMNS` with optional per-column DEFAULTs — the
    * Delta existence-default semantics: a default given HERE applies in
    * BOTH directions, still without rewriting a byte:
    *
    *   - rows in files that PREDATE the column read the default instead
    *     of null (the "existence default", frozen at add time — the read
    *     paths know per file, from its commit's schema, whether the
    *     column is physically present);
    *   - later writes that OMIT the column stamp it ([[TableSpec.defaults]]);
    *   - a genuine NULL written after the add STAYS null — only
    *     physically-absent columns fill.
    *
    * The expression must fold to a constant (validated here). Tables with
    * foreign-base files (shallow clones of converted tables, convert-in-
    * place) refuse: those files' physical columns aren't described by a
    * commit schema, so "absent" would be a guess. */
  def addColumns(fields: Seq[StructField],
      defaults: Map[String, String]): LakeTable = retrying {
    val declared = schema
    val dup = fields.map(_.name).filter(n => declared.fieldNames.exists(_.equalsIgnoreCase(n)))
    require(dup.isEmpty, s"columns already exist: ${dup.mkString(",")}")
    defaults.keys.foreach { c =>
      require(fields.exists(_.name.equalsIgnoreCase(c)),
        s"DEFAULT given for '$c', which is not among the added columns")
    }
    if (defaults.nonEmpty) {
      require(liveFiles(None).forall(_.base.isEmpty),
        "existence defaults need per-file commit schemas; this table has " +
          "foreign-base files (clone/convert) whose columns are undeclared")
      // the default must be a constant: evaluate it once now, loudly
      defaults.foreach { case (c, e) =>
        val dt = fields.find(_.name.equalsIgnoreCase(c)).get.dataType
        spark.range(1).select(expr(e).cast(dt)).head()
      }
    }
    val used = usedPhysicalNames
    val remap = fields.flatMap { f =>
      if (!used.contains(f.name)) None
      else {
        var i = 1
        while (used.contains(s"${f.name}_$i")) i += 1
        Some(f.name -> s"${f.name}_$i")
      }
    }.toMap
    val newSpec0 =
      if (remap.isEmpty && defaults.isEmpty) None
      else Some(spec.copy(
        columnMap = spec.columnMap ++ remap,
        defaults = spec.defaults ++ defaults,
        existenceDefaults = spec.existenceDefaults ++ defaults))
    writeCommit("evolve",
      newSchema = Some(StructType(declared.fields ++ fields.map(_.copy(nullable = true)))),
      newSpec = newSpec0) {
      (_, _) => Seq.empty
    }
  }

  /** Every PHYSICAL parquet field name any version of this table ever
    * wrote or declared — the collision set for fresh-name assignment. */
  private def usedPhysicalNames: Set[String] =
    commits.flatMap { c =>
      val fields = DataType.fromJson(c.schemaJson).asInstanceOf[StructType].fieldNames
      fields.map(f => c.spec.columnMap.getOrElse(f, f)) ++ c.spec.columnMap.values
    }.toSet

  /** Guard for metadata-only column ops: the key/precombine/partition
    * columns anchor file layout, footer stats, and bloom sidecars; a
    * statsColumns entry anchors data-skipping metadata; a CHECK constraint
    * references columns by name in SQL text. All would silently break
    * under a rename, so they are rejected (Delta blocks these the same
    * way). */
  private def requireMappable(n: String, op: String): Unit = {
    require(!n.equalsIgnoreCase(spec.key) && !n.equalsIgnoreCase(spec.precombine),
      s"cannot $op the key/precombine column '$n'")
    require(!spec.partition.exists(_.equalsIgnoreCase(n)),
      s"cannot $op the partition column '$n'")
    require(!spec.statsColumns.exists(_.equalsIgnoreCase(n)),
      s"cannot $op data-skipping stats column '$n'")
    require(!spec.sumColumns.exists(_.equalsIgnoreCase(n)),
      s"cannot $op sum-stats column '$n'")
    require(!spec.constraints.exists(_._2.toLowerCase.contains(n.toLowerCase)),
      s"cannot $op '$n': referenced by a CHECK constraint")
    require(!spec.identity.keys.exists(_.equalsIgnoreCase(n)),
      s"cannot $op identity column '$n'")
    require(!spec.defaults.keys.exists(_.equalsIgnoreCase(n)),
      s"cannot $op column '$n': it carries a DEFAULT — drop the default first")
  }

  /** `ALTER TABLE … RENAME COLUMN old TO new` — METADATA-ONLY (Delta
    * column-mapping analog): the declared schema renames the field and the
    * column map pins the new logical name to the column's original
    * physical field, so not a byte of data moves. Time travel before the
    * rename still surfaces the old name. */
  def renameColumn(oldName: String, newName: String): LakeTable = retrying {
    val declared = schema
    require(declared.fieldNames.contains(oldName), s"no column '$oldName'")
    require(!declared.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column '$newName' already exists")
    requireMappable(oldName, "rename")
    val phys = spec.physical(oldName)
    val renamed = StructType(declared.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    writeCommit("rename_column", newSchema = Some(renamed),
      newSpec = Some(spec.copy(columnMap = spec.columnMap - oldName + (newName -> phys)))) {
      (_, _) => Seq.empty
    }
  }

  /** `ALTER TABLE … DROP COLUMN` — METADATA-ONLY: the field leaves the
    * declared schema and the map; the physical data stays on disk,
    * unreferenced (and time-travelable), exactly like Delta's drop under
    * column mapping. Re-adding the same name later maps to a fresh
    * physical field ([[addColumns]]), never the dropped data. */
  def dropColumn(name: String): LakeTable = retrying {
    val declared = schema
    require(declared.fieldNames.contains(name), s"no column '$name'")
    require(declared.fields.length > 1, "cannot drop the last column")
    requireMappable(name, "drop")
    writeCommit("drop_column",
      newSchema = Some(StructType(declared.fields.filterNot(_.name == name))),
      newSpec = Some(spec.copy(columnMap = spec.columnMap - name))) {
      (_, _) => Seq.empty
    }
  }

  /** Delta TYPE WIDENING analog (`ALTER TABLE … ALTER COLUMN c TYPE t`):
    * a METADATA-ONLY commit widens the declared type — no file is
    * rewritten, ever. Sound because Spark 4's parquet reader up-converts
    * narrower physical types to the requested read schema natively
    * (int32→long, float→double, decimal re-scale), so old files keep
    * their narrow encoding while reads and new writes use the wide type;
    * per-file stats (key ranges, colStats strings, DECIMAL(38) colSums)
    * are representation-independent and stay valid.
    *
    * Allowed: integral up-chain (byte→short→int→long), float→double,
    * decimal with non-decreasing scale AND integer capacity, integral→
    * decimal with enough integer digits — exactly the value-preserving
    * set; anything lossy (narrowing, long→double, →string) refuses.
    * The record key of a BUCKETED table refuses: `hash(5)` ≠ `hash(5L)`
    * in Spark's Murmur3, so widening would silently re-bucket new writes
    * away from existing rows. */
  def widenColumn(name: String, to: DataType): LakeTable = retrying {
    val declared = schema
    require(declared.fieldNames.contains(name), s"no column '$name'")
    require(!spec.identity.keys.exists(_.equalsIgnoreCase(name)),
      s"cannot widen identity column '$name'")
    require(spec.buckets == 0 || !name.equalsIgnoreCase(spec.key),
      "cannot widen the record key of a bucketed table: the bucket hash is type-dependent")
    val from = declared(name).dataType
    require(LakeTable.widens(from, to),
      s"ALTER COLUMN $name TYPE: ${from.simpleString} -> ${to.simpleString} is not a lossless widening")
    writeCommit("widen_column",
      newSchema = Some(StructType(declared.fields.map(f =>
        if (f.name == name) f.copy(dataType = to) else f)))) { (_, _) => Seq.empty }
  }

  /** Hive-sync analog (S12/S13): register snapshot views in the session
    * catalog — `<name>` for CoW, `<name>_ro`/`<name>_rt` for MoR. */
  def registerViews(name: String): LakeTable = {
    if (spec.mor) {
      readOptimized().createOrReplaceTempView(name + "_ro")
      realtime().createOrReplaceTempView(name + "_rt")
    } else read().createOrReplaceTempView(name)
    this
  }

  // ---- internals -------------------------------------------------------

  /** Reorder/validate an incoming batch against the declared schema.
    * Extra columns: rejected unless `mergeSchema`, in which case they are
    * appended to the declared schema (additive evolution only — drops and
    * type changes are not supported). Returns the conformed batch and the
    * widened schema when evolution happened. */
  private def conform(df0: DataFrame, mergeSchema: Boolean = false): (DataFrame, Option[StructType]) = {
    if (latestVersion < 0) return (df0, None)
    // bucketed tables: (re)stamp the stored bucket id from the key — always
    // recomputed, so a caller-supplied value can never mis-place a row.
    // Hash at the DECLARED key type: Murmur3(Int) != Murmur3(Long), and
    // read-side bucketSkip evaluates the probe literal at the declared
    // type, so a narrower-typed incoming key (Scala Int into a BIGINT
    // column) must be cast BEFORE hashing or write layout and read-time
    // bucket pruning disagree — silent missing rows on point lookups.
    val dfB =
      if (spec.buckets > 0) {
        val keyExpr = schema.fields.find(_.name.equalsIgnoreCase(spec.key))
          .map(f => col(spec.key).cast(f.dataType)).getOrElse(col(spec.key))
        df0.withColumn(TableSpec.BUCKET_COL,
          pmod(hash(keyExpr), lit(spec.buckets)))
      } else df0
    // generated columns: stamp when omitted, validate when supplied
    val dfG = GeneratedCols(dfB, spec.generated)
    // column DEFAULTs: an OMITTED column takes its default expression; a
    // supplied one (nulls included) passes through untouched
    val df = spec.defaults.foldLeft(dfG) { case (acc, (c, e)) =>
      if (acc.columns.exists(_.equalsIgnoreCase(c))) acc
      else acc.withColumn(c, expr(e))
    }
    val declared = schema
    val have = df.columns.toSet
    val missing = declared.fieldNames.filterNot(have)
    require(missing.isEmpty, s"incoming batch missing columns: ${missing.mkString(",")}")
    val extras = df.schema.fields.filterNot(f => declared.fieldNames.contains(f.name))
    val out =
      if (extras.isEmpty)
        (df.select(declared.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*), None)
      else if (!mergeSchema)
        throw new IllegalArgumentException(
          s"incoming batch has columns not in the table schema: " +
            s"${extras.map(_.name).mkString(",")}; pass mergeSchema=true to evolve additively")
      else {
        // a dropped/renamed-away column's physical name must not be
        // silently reused — the old on-disk values would resurface. The
        // addColumns path assigns a fresh physical mapping instead.
        val retired = usedPhysicalNames -- declared.fieldNames.map(spec.physical)
        extras.foreach(f => require(!retired.contains(f.name),
          s"column '${f.name}' was dropped or renamed away; re-add it via addColumns"))
        val widened = StructType(declared.fields ++ extras)
        (df.select(widened.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*),
          Some(widened))
      }
    checkConstraints(out._1)
    out
  }

  /** Enforce every CHECK constraint over an incoming batch in ONE aggregate
    * pass (SQL CHECK semantics: NULL passes, only definitively-FALSE rows
    * violate). Violations name the constraint, like Delta's error. */
  private def checkConstraints(df: DataFrame): Unit = {
    val cons = spec.constraints
    if (cons.isEmpty) return
    val names = cons.keys.toSeq
    val aggs = names.map { n =>
      max(when(!coalesce(expr(cons(n)), lit(true)), lit(1)).otherwise(lit(0))).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val violated = names.zipWithIndex
      .filter { case (_, i) => !row.isNullAt(i) && row.getInt(i) == 1 }.map(_._1)
    if (violated.nonEmpty) throw new IllegalArgumentException(
      "CHECK constraint violated by the incoming batch: " +
        violated.map(n => s"$n CHECK (${cons(n)})").mkString("; "))
  }

  /** Next-unallocated high-water mark of one identity column: the latest
    * commit's denormalized mark, or `start - step` before any allocation. */
  private def identityHighOf(c: String): Long =
    latestCommit.identityHigh.getOrElse(c, {
      val d = spec.identity(c); d.start - d.step
    })

  /** Stamp every GENERATED ALWAYS AS IDENTITY column onto an incoming
    * batch and return the updated high-water marks to commit.
    *
    * Semantics (Delta MERGE parity, re-expressed for a keyed table):
    * identity is 1:1 with the RECORD KEY — an upsert's existing keys keep
    * their current ids (`freshForAll = false`; MERGE UPDATE never touches
    * the column), new keys draw the next ones (MERGE INSERT). Overwrite
    * paths (`freshForAll = true`) re-id every incoming key: the replaced
    * rows are gone and ids are never reused, exactly like a Delta
    * overwrite of an identity table. A supplied identity column is
    * rejected (ALWAYS), except all-null — SQL `INSERT` paths materialize
    * omitted columns as nulls — which is treated as absent.
    *
    * Determinism: new keys are ranked by md5(key) via the two-phase
    * 256-bucket plan (bucket counts → driver prefix offsets → per-bucket
    * window ≈ 1/256th of the batch each; no global window), and
    * `id = high + step · (rank+1)`. The order is content-defined, so
    * reruns of the same batch against the same snapshot allocate
    * identically — and a DuckDB oracle can replay the whole assignment.
    *
    * Scale shape: the existing-key lookup reads only pruned candidate
    * files (partition/key-range/bloom — the upsert's own detection scan),
    * so cost follows the batch and its matching files, never the table.
    * MoR snapshots with live logs look up through the realtime merge (a
    * tombstoned key must re-draw, not resurrect its old id). */
  private def stampIdentity(df0: DataFrame,
      freshForAll: Boolean): (DataFrame, Map[String, Long]) = {
    val ids = spec.identity
    if (ids.isEmpty) return (df0, Map.empty)
    // ALWAYS: a caller-supplied identity column must be absent or all-null
    val supplied = df0.columns.filter(c => ids.keys.exists(_.equalsIgnoreCase(c)))
    val df = if (supplied.isEmpty) df0 else {
      val aggs = supplied.map(c => max(when(col(c).isNotNull, 1).otherwise(0)).as(c))
      val row = df0.agg(aggs.head, aggs.tail.toSeq: _*).head()
      supplied.zipWithIndex.foreach { case (c, i) =>
        require(row.isNullAt(i) || row.getInt(i) == 0,
          s"column '$c' is GENERATED ALWAYS AS IDENTITY and cannot be supplied")
      }
      df0.drop(supplied.toSeq: _*)
    }
    val keys = df.select(col(spec.key)).filter(col(spec.key).isNotNull).distinct()
    val live = if (freshForAll || latestVersion < 0) Seq.empty else liveFiles(None)
    val existing =
      if (live.isEmpty) None
      else {
        val src = if (live.exists(_.log)) realtime()
          else readFiles(pruneCandidates(live, keys))
        val uniq = src.select((spec.key +: ids.keys.toSeq).map(col): _*)
          .join(keys, Seq(spec.key), "left_semi")
          .groupBy(spec.key)
          .agg(ids.keys.toSeq.map(c => max(col(c)).as(c)).head,
            ids.keys.toSeq.map(c => max(col(c)).as(c)).tail: _*)
        Some(uniq)
      }
    val newKeys = existing.fold(keys)(e =>
      keys.join(e.select(spec.key), Seq(spec.key), "left_anti"))
    // two-phase deterministic rank of the new keys (md5-of-key order)
    val tagged = newKeys
      .withColumn("_idh", md5(col(spec.key).cast("string")))
      .withColumn("_idb", conv(substring(col("_idh"), 1, 2), 16, 10).cast("int"))
    val perBucket = tagged.groupBy("_idb").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val total = perBucket.values.sum
    val offsets = (0 until 256).scanLeft(0L)((acc, b) => acc + perBucket.getOrElse(b, 0L))
    val offsetOf = typedLit((0 until 256).map(b => b -> offsets(b)).toMap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_idb").orderBy(col("_idh").asc, col(spec.key).asc)
    val ranked = tagged.withColumn("_idr",
      row_number().over(w).cast("long") - 1L + element_at(offsetOf, col("_idb")))
      .drop("_idh", "_idb")
    val highs = ids.map { case (c, _) => c -> identityHighOf(c) }
    val newIds = ids.foldLeft(ranked) { case (acc, (c, d)) =>
      acc.withColumn(c, lit(highs(c)) + lit(d.step) * (col("_idr") + 1L))
    }.drop("_idr")
    val mapping = existing.fold(newIds)(_.unionByName(newIds))
    val out = df.join(mapping, Seq(spec.key), "left")
    (out, ids.map { case (c, d) => c -> (highs(c) + d.step * total) })
  }

  /** Delta `ALTER TABLE … ADD CONSTRAINT name CHECK (sql)`: existing rows
    * must already satisfy the expression; every later write re-validates
    * its batch. Metadata-only commit. */
  def addConstraint(name: String, sql: String): LakeTable = retrying {
    require(!spec.constraints.keys.exists(_.equalsIgnoreCase(name)),
      s"constraint $name already exists")
    val bad = read().filter(!coalesce(expr(sql), lit(true))).limit(1).count()
    require(bad == 0, s"existing rows violate CHECK ($sql) — constraint not added")
    writeCommit("addConstraint",
      newSpec = Some(spec.copy(constraints = spec.constraints + (name -> sql)))) {
      (_, _) => Seq.empty
    }
  }

  /** `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS …`: one
    * partial-aggregated pass over the snapshot computes the exact row
    * count plus per-column NDV (HLL++, like Spark's own ANALYZE) and null
    * counts, committed as a metadata-only `analyze` commit (OCC-safe).
    * Surfaced through DSv2 statistics so Catalyst's CBO estimates join
    * cardinalities — the input multi-fact join reordering needs. Default
    * = every data column; the pass is one job regardless of column count. */
  def analyze(columns: Seq[String] = Seq.empty): TableStats = retrying {
    val names = if (columns.nonEmpty) columns else schema.fieldNames.toSeq
    names.foreach { n =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(n)),
        s"ANALYZE: no such column '$n'")
    }
    val aggs = names.flatMap { n =>
      Seq(approx_count_distinct(col(n)).as(s"ndv_$n"),
        coalesce(sum(when(col(n).isNull, 1L).otherwise(0L)), lit(0L)).as(s"nulls_$n"))
    }
    val row = read().agg(count(lit(1)).as("rows"), aggs: _*).head()
    val cols = names.zipWithIndex.map { case (n, i) =>
      n -> ColumnStatValues(row.getLong(1 + 2 * i), row.getLong(2 + 2 * i))
    }.toMap
    val ts = TableStats(row.getLong(0), cols)
    writeCommit("analyze", tableStats = Some(ts)) { (_, _) => Seq.empty }
    ts
  }

  /** Newest `ANALYZE` stats at-or-before `asOf` (latest by default):
    * walk the commit tail backwards — reads are memoized, so this is a
    * handful of cached lookups, not a log replay. */
  def tableStats(asOf: Option[Long] = None): Option[TableStats] = {
    var v = asOf.map(a => math.min(a, latestVersion)).getOrElse(latestVersion)
    while (v >= 0) {
      val c = CommitLog.read(path, v, conf)
      if (c.tableStats.isDefined) return c.tableStats
      v -= 1
    }
    None
  }

  /** `ALTER TABLE … SET TBLPROPERTIES` — edit the MUTABLE TableSpec knobs
    * with a metadata-only commit (OCC-safe): auto-maintenance thresholds,
    * bloom sizing, stats columns. Identity properties (key, precombine,
    * partition, buckets, mor) define the table's layout and are rejected.
    * Unknown properties are rejected loudly — a typo must not silently
    * no-op a maintenance policy. */
  def setProperties(props: Map[String, String]): LakeTable = retrying {
    val next = props.foldLeft(spec) { case (s, (k, v)) =>
      k.toLowerCase match {
        case "autocompactfiles" => s.copy(autoCompactFiles = v.toInt)
        case "autocompactlogs" => s.copy(autoCompactLogs = v.toInt)
        case "bloombitsperkey" => s.copy(bloomBitsPerKey = v.toInt)
        case "statscolumns" => s.copy(statsColumns =
          v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case "bloomcolumns" => s.copy(bloomColumns =
          v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case "writesortcolumns" => s.copy(writeSortColumns =
          v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case "key" | "precombine" | "partition" | "buckets" | "mor" =>
          throw new UnsupportedOperationException(
            s"table property '$k' is identity metadata and cannot be altered")
        case other => throw new IllegalArgumentException(
          s"unknown graft table property '$other' (settable: autoCompactFiles, " +
            "autoCompactLogs, bloomBitsPerKey, statsColumns, bloomColumns, " +
            "writeSortColumns)")
      }
    }
    writeCommit("setProperties", newSpec = Some(next)) { (_, _) => Seq.empty }
  }

  /** Drop a named CHECK constraint (metadata-only commit). */
  def dropConstraint(name: String): LakeTable = retrying {
    require(spec.constraints.keys.exists(_.equalsIgnoreCase(name)), s"no constraint $name")
    writeCommit("dropConstraint",
      newSpec = Some(spec.copy(
        constraints = spec.constraints.filterNot(_._1.equalsIgnoreCase(name))))) {
      (_, _) => Seq.empty
    }
  }

  /** Iceberg-style PARTITION EVOLUTION: change the table's partition
    * column in a METADATA-ONLY commit — zero data files touched at any
    * table size (re-laying out a 100 TB table is exactly the rewrite this
    * exists to avoid). Files keep the physical layout of their own ERA:
    * the column a file was partitioned by is self-described by its dir
    * path ([[partitionColOf]]), stored in dirs for that era and as plain
    * data for every other, so a mixed-era table still reads every column
    * for every row — scans group per era ([[readFiles]]) and union.
    *
    * Era discipline: every `partitionValue` metadata shortcut (file
    * skipping, dynamic partition overwrite, SHOW PARTITIONS, metadata-only
    * aggregates, the v2 scan's dir-constant) is era-guarded — old-era
    * files stop qualifying for current-column shortcuts until a full
    * rewrite (compact()/zorder()) migrates them forward, Iceberg's exact
    * contract: correctness immediately, layout benefits as data churns.
    *
    * Record identity follows the SPEC: after evolution, upserts key on
    * (key, new partition column) — the values exist on every row
    * regardless of era. Refused while MoR log/tombstone files are
    * outstanding (a tombstone row carries only key + its OWN era's
    * partition value, so it could not kill base rows under the new
    * identity) — compact() first. Bucketed tables refuse (buckets ARE
    * the layout). */
  def changePartition(newPartition: Option[String]): LakeTable = retrying {
    require(spec.buckets == 0,
      "a bucketed table's layout is its buckets — cannot re-partition")
    require(newPartition.map(_.toLowerCase) != spec.partition.map(_.toLowerCase),
      s"table is already partitioned ${spec.partition.fold("flat")(p => s"by $p")}")
    val resolved = newPartition.map { p0 =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(p0)).getOrElse(
        throw new IllegalArgumentException(s"no column $p0 to partition by"))
      require(spec.physical(f.name) == f.name,
        s"cannot partition by renamed (column-mapped) column ${f.name}: " +
          "dir names must match the stored physical name")
      require(!(f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] || f.dataType == BinaryType),
        s"cannot partition by ${f.name}: ${f.dataType.simpleString} has no dir encoding")
      f.name
    }
    require(!liveFiles(None).exists(_.log),
      "partition evolution with outstanding MoR log/tombstone files would " +
        "orphan their era's record identity — run compact() first")
    writeCommit("changePartitioning",
      newSpec = Some(spec.copy(partition = resolved))) { (_, _) => Seq.empty }
  }

  /** A4 precombine dedup inside one batch: greatest precombine wins; ties
    * broken by a deterministic row hash so re-runs are stable. NULL record
    * keys fail loudly (Hudi errors too) — the group-by would otherwise
    * silently collapse all null-key rows into one. */
  private def dedupBatch(df: DataFrame): DataFrame =
    dedupLatest(
      df.filter(assert_true(col(spec.key).isNotNull,
        lit(s"null record key '${spec.key}' in incoming batch")).isNull),
      idCols, spec.precombine,
      xxhash64(df.columns.map(col): _*))

  private def stampMeta(df: DataFrame, commitTime: String): DataFrame = {
    val partPath = spec.partition.map(p => col(p).cast(StringType)).getOrElse(lit(""))
    df.withColumn("_commit_time", lit(commitTime))
      .withColumn("_commit_seqno",
        concat_ws("_", lit(commitTime), spark_partition_id().cast(StringType),
          monotonically_increasing_id().cast(StringType)))
      .withColumn("_record_key", col(spec.key).cast(StringType))
      .withColumn("_partition_path", partPath)
  }

  /** Stats-based candidate pruning before the touched-file semi-join:
    * partition-value equality and key-range overlap, compared in key space
    * and only for exactly-formattable types (numeric/string) — skipping a
    * prune is always safe, applying a wrong one never is. */
  private def pruneCandidates(live: Seq[FileAction], incoming: DataFrame): Seq[FileAction] = {
    if (live.isEmpty) return live
    val keyType = schema(spec.key).dataType
    val exact = Set[DataType](ByteType, ShortType, IntegerType, LongType, StringType)

    var cands = live
    // partition pruning (skipped when the incoming frame is key-only,
    // e.g. a deleteKeys key set)
    spec.partition.foreach { p =>
      if (incoming.columns.contains(p) && exact.contains(schema(p).dataType)) {
        val inParts = incoming.select(col(p).cast(StringType)).distinct()
          .collect().map(r => Option(r.getString(0))
            .getOrElse("__HIVE_DEFAULT_PARTITION__")).toSet
        // era guard: only a file written under the CURRENT partition
        // column may be pruned by its stored value — an old-era file
        // (post partition evolution) can hold any current-column value
        cands = cands.filter(a =>
          partitionColOf(a) != spec.partition || a.partitionValue.forall(inParts.contains))
      }
    }
    // key-range pruning. The numeric min/max is only computed for numeric
    // key types: casting an arbitrary string key to double would throw
    // under ANSI mode (and is never consulted for string keys anyway).
    if (exact.contains(keyType)) {
      val numeric = keyType != StringType
      val aggCols =
        Seq(min(col(spec.key).cast(StringType)), max(col(spec.key).cast(StringType))) ++
          (if (numeric) Seq(min(col(spec.key).cast("double")), max(col(spec.key).cast("double")))
           else Nil)
      val r = incoming.agg(aggCols.head, aggCols.tail: _*).collect()(0)
      if (!r.isNullAt(0)) {
        cands = cands.filter { a =>
          // sentinel/unparseable stats → keep the file (never prune wrongly)
          if (a.minKey.isEmpty || a.maxKey == "￿") true
          else if (numeric && a.numericKey)
            try a.minKey.toDouble <= r.getDouble(3) && a.maxKey.toDouble >= r.getDouble(2)
            catch { case _: NumberFormatException => true }
          else a.minKey <= r.getString(1) && a.maxKey >= r.getString(0)
        }
      } else cands = Seq.empty // empty incoming batch touches nothing
    }
    // bloom pruning — the stage that still prunes when key RANGES overlap
    // (random churn): probe each surviving candidate's sidecar bloom with
    // the incoming key set. Bounded: keys are broadcast only below a size
    // cap (beyond it the churn is so wide the detection scan reads most
    // files anyway); a missing sidecar keeps its file (never prune wrongly).
    if (spec.bloomBitsPerKey > 0 && cands.nonEmpty) {
      val keys = incoming.select(col(spec.key).cast(StringType).as("k"))
        .filter(col("k").isNotNull).distinct()
        .limit(LakeTable.MAX_BLOOM_PROBE_KEYS + 1)
        .collect().map(_.getString(0))
      if (keys.length <= LakeTable.MAX_BLOOM_PROBE_KEYS) {
        val hit = bloomSurvivors(cands.map(_.path), ".bf", keys)
        cands = cands.filter(a => hit.contains(a.path))
      }
    }
    lastPrunedCandidates = cands.size
    cands
  }

  /** Distributed bloom-sidecar probe: the subset of `rels` whose sidecar
    * at `<rel><suffix>` might contain ANY probe value (absent/torn
    * sidecar = kept — pruning may be suboptimal, never wrong). One tiny
    * job of ≤64 tasks reading a few KB each — never a data-file open. */
  private def bloomSurvivors(rels: Seq[String], suffix: String,
      probes: Array[String]): Set[String] = {
    val bKeys = spark.sparkContext.broadcast(probes)
    // Configuration is not serializable — ship its entries and rebuild
    // in-task (executors need the session's fs credentials/impls)
    val confEntries = {
      val it = conf.iterator(); val buf = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.result()
    }
    val bConf = spark.sparkContext.broadcast(confEntries)
    val dd = dataDir
    spark.sparkContext
      .parallelize(rels, math.max(1, math.min(rels.size, 64)))
      .mapPartitions { it =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        bConf.value.foreach { case (k, v) => c.set(k, v) }
        val fs = new Path(dd).getFileSystem(c)
        it.filter { rel =>
          KeyBloom.readOpt(fs, new Path(s"$dd/.blooms/$rel$suffix")) match {
            case Some(bloom) => bKeys.value.exists(bloom.mightContainString)
            case None => true // absent/torn sidecar: fail open, keep the file
          }
        }
      }.collect().toSet
  }

  /** Bloom-COLUMN file skipping for scans ([[TableSpec.bloomColumns]]):
    * point-lookup conjuncts (`=`, `<=>`, `IN` up to the probe cap) on a
    * bloom-indexed column probe each candidate file's per-column sidecar
    * and drop definite misses before the scan is planned — the non-key
    * equality analog of stats skipping. Only string and integral literals
    * probe (their canonical cast-to-string forms are unambiguous);
    * anything else keeps its files. External/base files never probe
    * (their sidecars live elsewhere — fail-open). */
  private[graft] def bloomSkip(actions: Seq[FileAction],
      filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[FileAction] = {
    import org.apache.spark.sql.sources._
    if (spec.bloomColumns.isEmpty || actions.isEmpty || filters.isEmpty) return actions
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def canon(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
           _: java.lang.Long => Some(v.toString)
      case _ => None
    }
    def bloomColOf(c: String): Option[String] =
      spec.bloomColumns.find(_.equalsIgnoreCase(c)).map(spec.physical)
    var out = actions
    conjuncts(filters.reduce(And)).foreach {
      case EqualTo(c, v) => for (p <- bloomColOf(c); s <- canon(v)) {
        out = probeColumn(out, p, Array(s))
      }
      case EqualNullSafe(c, v) if v != null =>
        for (p <- bloomColOf(c); s <- canon(v)) {
          out = probeColumn(out, p, Array(s))
        }
      case In(c, vs) if vs.nonEmpty && vs.length <= LakeTable.MAX_BLOOM_PROBE_KEYS =>
        for (p <- bloomColOf(c)) {
          val canons = vs.toSeq.map(canon)
          // a null/unconvertible member makes the probe unsound — skip
          if (canons.forall(_.isDefined))
            out = probeColumn(out, p, canons.flatten.toArray)
        }
      case _ => ()
    }
    out
  }

  private def probeColumn(actions: Seq[FileAction], phys: String,
      probes: Array[String]): Seq[FileAction] = {
    if (actions.isEmpty) return actions
    val (own, foreign) = actions.partition(_.base.isEmpty)
    if (own.isEmpty) return actions
    val hit = bloomSurvivors(own.map(_.path), s".$phys.bf", probes)
    own.filter(a => hit.contains(a.path)) ++ foreign
  }

  /** Candidate-file count after the latest pruneCandidates pass — test
    * observability for the stats/bloom pruning stages. */
  private[graft] var lastPrunedCandidates: Int = -1

  /** Run a commit: `body(version, commitTime)` returns per-write FileActions
    * bundles (add+remove); data files land before the commit JSON does. */
  /** One optimistic-concurrency ATTEMPT: snapshot the version, run `body`
    * (which writes data files under this attempt's unique write-id), then
    * claim the version file atomically. A concurrent writer claiming it
    * first surfaces as [[CommitConflictException]] — this attempt's data
    * files are dropped and the exception propagates to [[retrying]], which
    * reruns the whole operation against the fresh snapshot (full
    * serializability: the rerun re-reads everything, so the outcome equals
    * the ops running serially in commit order).
    *
    * `body` receives the attempt's base WRITE-ID (not the version): ids
    * are `version * WRITE_SLOTS + 2*nonce` (+1 for log files), so ids stay
    * monotone in version (the dedup tiebreak) while concurrent attempts at
    * the SAME version write disjoint `_v=` directories instead of clobbering
    * each other's in-flight files.
    *
    * `txn` is the idempotent-transaction guard (Delta txnAppId/txnVersion):
    * when the table has already recorded `appId` at a version >= the given
    * one, the write is a no-op — checked INSIDE the attempt, so a replayed
    * batch racing its duplicate is also suppressed on rebase. */
  private def writeCommit(operation: String, removeAll: Boolean = false,
      newSchema: Option[StructType] = None, txn: Option[(String, Long)] = None,
      newSpec: Option[TableSpec] = None,
      tableStats: Option[TableStats] = None,
      copyFiles: Seq[String] = Seq.empty,
      identityHigh: Map[String, Long] = Map.empty,
      savepoints: Option[Seq[Long]] = None,
      expectedVersion: Option[Long] = None,
      txnMany: Map[String, Long] = Map.empty)(
      body: (Long, String) => Seq[WriteResult]): LakeTable = {
    // one commit-log resolution for everything below (each latestCommit /
    // latestVersion call re-lists the log directory)
    val curV = latestVersion
    if (curV < 0) throw new IllegalStateException("use LakeTable.create")
    val lc = CommitLog.read(path, curV, conf)
    // expectedVersion pins the commit at a version the CALLER observed:
    // any interleaved commit claims expected+1 first, so this attempt's
    // claim fails with CommitConflictException instead of silently
    // landing on top of state the caller never read — the primitive a
    // read-compute-write transaction (e.g. an MV refresh) needs for
    // true optimistic concurrency at ITS level, not just the write's
    val version = expectedVersion.map(_ + 1).getOrElse(curV + 1)
    // multi-watermark idempotence: skip only when EVERY component is
    // already covered (a commit that would advance any one still lands)
    if (txnMany.nonEmpty &&
      txnMany.forall { case (app, v) =>
        lc.txn.get(app).exists(_ >= v) }) return this
    txn.foreach { case (app, v) =>
      if (lc.txn.get(app).exists(_ >= v)) return this
    }
    val commitTime = LakeTable.commitTimeNow()
    val writeId = freshWriteId(version)
    val prevLive = if (removeAll) liveFiles(None).map(_.path) else Seq.empty
    val results = body(writeId, commitTime)
    val schemaJson = newSchema.map(_.json).getOrElse(lc.schemaJson)
    val txnMap = lc.txn ++ txn.toMap ++ txnMany
    try {
      CommitLog.write(path, Commit(version, commitTime, operation, schemaJson,
        newSpec.getOrElse(spec),
        results.flatMap(_.add), (prevLive ++ results.flatMap(_.remove)).distinct,
        txnMap, tableStats, copyFiles,
        identityHigh = lc.identityHigh ++ identityHigh,
        savepoints = savepoints.getOrElse(lc.savepoints)), conf)
    } catch {
      case c: CommitConflictException =>
        // lost the race: drop ONLY the dirs this attempt itself created —
        // i.e. its own write-id dirs (ids in this version's slot range).
        // An attempt can also RE-ADD pre-existing files (restore re-lists
        // an old version's files, clone bodies carry external bases):
        // those are committed data and must never be touched.
        val fsys = new Path(dataDir).getFileSystem(conf)
        Seq(writeId, writeId + 1).foreach { id =>
          scala.util.Try(fsys.delete(new Path(s"$dataDir/${WRITE_ID}=$id"), true))
          scala.util.Try(fsys.delete(new Path(s"$dataDir/$DV_DIR/${WRITE_ID}=$id"), true))
          scala.util.Try(fsys.delete(claimFile(id), false))
        }
        throw c
    }
    CommitLog.maybeCheckpoint(path, version, conf)
    maybeAutoCompact(operation)
    this
  }

  /** Data-write operations that may trigger auto-maintenance — maintenance
    * and metadata commits never re-trigger it (no recursion, no churn). */
  private val AUTO_COMPACT_TRIGGERS = Set(
    "upsert", "delete", "update", "overwrite", "overwriteWhere",
    "overwritePartitions")

  /** Post-commit auto-maintenance ([[TableSpec.autoCompactFiles]] /
    * [[TableSpec.autoCompactLogs]]): when a data write pushes the live
    * file count (or MoR outstanding-log count) over its threshold, fold /
    * concatenate immediately. Best-effort by design: the triggering write
    * has already committed, so a maintenance failure (e.g. OCC retries
    * exhausted under heavy concurrency) must never surface as a write
    * failure — the next write simply re-triggers. Compaction itself runs
    * through the normal retrying OCC path, so concurrent writers stay
    * correct: a loser rebases onto the compacted snapshot. */
  private def maybeAutoCompact(operation: String): Unit = {
    val s = spec
    if ((s.autoCompactFiles <= 0 && s.autoCompactLogs <= 0) ||
      !AUTO_COMPACT_TRIGGERS.contains(operation)) return
    try {
      val live = liveFiles(None)
      val logs = live.count(_.log)
      val overFiles = s.autoCompactFiles > 0 && live.size > s.autoCompactFiles
      val overLogs = s.autoCompactLogs > 0 && logs > s.autoCompactLogs
      if (overLogs || (overFiles && logs > 0)) { compact(); () }
      else if (overFiles) { optimize(); () }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  private def claimFile(id: Long): Path = new Path(s"$dataDir/.claims/${WRITE_ID}=$id")

  /** Allocate this attempt's unique base write-id for `version` (even
    * nonce; `+1` is reserved for the commit's log files). The id is CLAIMED
    * atomically via a marker file (hard-link-exclusive on local paths, like
    * the commit publish), so two concurrent attempts can never share a
    * `_v=` directory even if they draw the same nonce — an exists-probe
    * alone would be check-then-act. */
  private def freshWriteId(version: Long): Long = {
    val fsys = new Path(dataDir).getFileSystem(conf)
    var tries = 0
    while (tries < 32) {
      val nonce = scala.util.Random.between(0L, WRITE_SLOTS / 2 - 1)
      val id = version * WRITE_SLOTS + nonce * 2
      val free = !fsys.exists(new Path(s"$dataDir/${WRITE_ID}=$id")) &&
        !fsys.exists(new Path(s"$dataDir/${WRITE_ID}=${id + 1}"))
      if (free && CommitLog.claimMarker(fsys, claimFile(id))) return id
      tries += 1
    }
    throw new IllegalStateException(s"could not allocate a write id for version $version")
  }

  /** Highest idempotent-transaction version recorded for `appId`
    * (Delta `txnAppId`/`txnVersion` analog) — None when never written. */
  def txnVersion(appId: String): Option[Long] = latestCommit.txn.get(appId)

  /** Rerun `f` on commit conflict: each rerun re-reads the table snapshot,
    * so N racing writers serialize as N successive versions. Bounded —
    * sustained contention past the cap surfaces as
    * ConcurrentModificationException with the last conflict as cause. */
  private def retrying[T](f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case c: CommitConflictException =>
          attempt += 1
          if (attempt >= LakeTable.MAX_COMMIT_RETRIES)
            throw new java.util.ConcurrentModificationException(
              s"gave up after $attempt conflicting commit attempts at $path: ${c.getMessage}")
          // jittered backoff so N racers don't re-collide in lockstep
          Thread.sleep(scala.util.Random.between(5L, 50L * attempt))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write a batch under `data/_v=<writeId>/`, partitioned per spec, and
    * collect per-file stats for the log via a key-column-only scan.
    * Writes unconditionally — a pre-write `isEmpty` would execute the whole
    * upstream pipeline (dedup shuffle included) a second time; an empty
    * batch just yields zero stat rows and no adds. */
  private def writeFiles(batch0: DataFrame, writeId: Long, log: Boolean,
      tombstone: Boolean = false): WriteResult = {
    // column mapping: batches arrive with LOGICAL names; files store
    // PHYSICAL names (stable since each column's creation), so every file
    // of the table stays uniform across renames
    val batch =
      if (spec.columnMap.isEmpty) batch0
      else batch0.select(batch0.columns.toSeq.map(c =>
        spec.columnMap.get(c).map(p => col(c).as(p)).getOrElse(col(c))): _*)
    val target = s"$dataDir/${WRITE_ID}=$writeId"
    // the attempt's write-id dir is freshly allocated (freshWriteId probes
    // existence), so nothing to clear; an attempt that dies before its
    // commit JSON lands leaves an orphan dir that vacuum() sweeps
    // write-side clustering: range-partition + sort by the declared
    // writeSortColumns (physical names; only those present in this batch
    // — tombstone/log writes carry subsets) so per-file ranges come out
    // tight and non-overlapping without any later OPTIMIZE pass
    val sortCols = spec.writeSortColumns.map(spec.physical)
      .filter(c => batch.columns.exists(_.equalsIgnoreCase(c)))
    // NOTE (round-13 optimization audit): a write fan-out was tried here —
    // repartition small batches (optimizer size estimate ≤ 512 MB) to
    // ceil(bytes / 1 MB) tasks so narrow-input writes fill the cores. It
    // measured a LOSS on the interleaved A/B (b1 1.42× slower): the
    // narrow-input case is input-SPLIT-bound (parquet row groups), so the
    // fused scan→encode pipeline already overlaps decode with encode,
    // while the added exchange pays a full shuffle of the wide rows; every
    // other write arrives pre-shuffled from its join/aggregate and needs
    // no help. Kept fused — OPTIMIZATION_r13.md "write fan-out".
    val shuffled = (spec.partition, sortCols) match {
      case (Some(p), Nil) => batch.repartition(col(p))
      case (Some(p), sc) =>
        val keys = col(p) +: sc.map(col)
        batch.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
      case (None, Nil) => batch
      case (None, sc) =>
        batch.repartitionByRange(sc.map(col): _*)
          .sortWithinPartitions(sc.map(col): _*)
    }
    val writer = shuffled.write.mode("errorifexists")
    dbgT(s"wf-write-id=$writeId") {
      spec.partition match {
        case Some(p) => writer.partitionBy(p).parquet(target)
        case None => writer.parquet(target)
      }
    }
    val keyType = schema(spec.key).dataType
    val numericKey = keyType match {
      case _: NumericType => true
      case _ => false
    }
    val fs = new Path(target).getFileSystem(conf)
    val files = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Path, Long)]
      val it = fs.listFiles(new Path(target), true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) out += ((f.getPath, f.getLen))
      }
      out.toSeq
    }
    if (files.isEmpty) return WriteResult(Seq.empty, Seq.empty)
    // per-file stats from parquet FOOTERS — driver-side metadata reads, no
    // executor job, instead of re-scanning everything just written
    val adds = dbgT(s"wf-footerStats-n=${files.size}")(files.map { case (f, len) =>
      // LAST occurrence — see vacuum(); keeps rel paths consistent with
      // the executor-side substring_index detection
      val rel = f.toString.split("/data/").last
      val partVal = spec.partition.flatMap { p =>
        rel.split("/").find(_.startsWith(p + "="))
          // Hive-style unescape, NOT URLDecoder: dir names are Hive-escaped
          // (%XX only) and a literal '+' in a partition value must survive
          .map(s => LakeTable.unescapePathName(s.substring(p.length + 1)))
      }
      val statCols = spec.key +: spec.statsColumns.filterNot(_.equalsIgnoreCase(spec.key))
      val (rows, stats) = FooterStats.fileStats(f, conf, statCols)
      val (mn, mx) = stats(spec.key)
      FileAction(rel, log, rows, mn, mx, numericKey, partVal, tombstone = tombstone,
        colStats = stats - spec.key, bytes = len)
    })
    // a fully-empty batch still emits one 0-row part file — don't log it
    val kept0 = adds.filter(_.rows > 0)
    val kept =
      if (log || kept0.isEmpty) kept0
      else writeSums(target, kept0)
    if ((spec.bloomBitsPerKey > 0 || spec.bloomColumns.nonEmpty) && kept.nonEmpty)
      writeBlooms(target, kept)
    WriteResult(kept, Seq.empty)
  }

  /** Per-file (exact sum, non-null count) for the declared `sumColumns`:
    * ONE aggregation job over the just-written files (cache-hot), emitting
    * one row per file — parquet footers carry min/max/nullCount but never
    * sums, so this is the only way to get them without a later full scan.
    * Sums accumulate in DECIMAL(38,s): exact, order-independent, and
    * practically un-overflowable, so per-file partials re-add to the true
    * total at any scale. Float/double columns are skipped — their sums are
    * order-dependent, so a metadata answer could differ from a scan. */
  private def writeSums(target: String, adds: Seq[FileAction]): Seq[FileAction] = {
    val sumCols = spec.sumColumns.map(spec.physical)
      .filterNot(c => spec.partition.contains(c))
    if (sumCols.isEmpty) return adds
    val src = spark.read.parquet(target)
    val typed = sumCols.flatMap { c =>
      src.schema.fields.find(_.name.equalsIgnoreCase(c)).flatMap(f => f.dataType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
          Some((f.name, DecimalType(38, 0)))
        case d: DecimalType => Some((f.name, DecimalType(38, d.scale)))
        case _ => None // float/double: order-dependent sums — never stored
      })
    }
    if (typed.isEmpty) return adds
    val aggs = typed.flatMap { case (c, dt) =>
      Seq(sum(col(c).cast(dt)).as(s"_sum_$c"), count(col(c)).as(s"_nn_$c"))
    }
    val perFile = src
      .groupBy(input_file_name().as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: one row per just-written file
      .map { r =>
        val rel = LakeTable.decodeFileUri(r.getString(0)).split("/data/").last
        val sums = typed.map { case (c, _) =>
          val d = r.getAs[java.math.BigDecimal](s"_sum_$c")
          val nn = r.getAs[Long](s"_nn_$c")
          c -> (if (d == null) "0" else d.stripTrailingZeros.toPlainString, nn)
        }.toMap
        rel -> sums
      }.toMap
    adds.map(a => a.copy(colSums = perFile.getOrElse(a.path, Map.empty)))
  }

  /** Build one key-bloom sidecar per just-written file (Hudi bloom-index
    * analog, see [[KeyBloom]]): one executor job re-reads only the new
    * files' key column (hot in cache), partial blooms are OR-merged per
    * file, sidecars land under `data/.blooms/<rel>.bf`. */
  /** Build bloom sidecars for the just-written files in ONE pass: the key
    * bloom (when `bloomBitsPerKey` > 0, sidecar `<rel>.bf`) plus one per
    * declared [[TableSpec.bloomColumns]] entry (sidecar
    * `<rel>.<physical>.bf`), all accumulated from the same scan. */
  private def writeBlooms(target: String, adds: Seq[FileAction]): Unit = {
    val bpk = if (spec.bloomBitsPerKey > 0) spec.bloomBitsPerKey else 10
    val rowsByRel = adds.map(a => (a.path, a.rows)).toMap
    // (physical select column, sidecar suffix)
    val bloomCols: Seq[(String, String)] =
      (if (spec.bloomBitsPerKey > 0) Seq(spec.physical(spec.key) -> ".bf") else Seq.empty) ++
        spec.bloomColumns.map(spec.physical).map(p => p -> s".$p.bf")
    if (bloomCols.isEmpty) return
    val n = bloomCols.size
    val written = spark.read.parquet(target)
    // a log/tombstone batch carries only a column subset — index what exists
    val present = bloomCols.zipWithIndex
      .filter { case ((p, _), _) => written.columns.exists(_.equalsIgnoreCase(p)) }
    if (present.isEmpty) return
    val sel = input_file_name().as("_f") +:
      present.map { case ((p, _), i) => col(p).cast(StringType).as(s"_c$i") }
    val partials = written.select(sel: _*)
      .rdd.mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[(String, Int), org.apache.spark.util.sketch.BloomFilter]
        it.foreach { r =>
          val rel = LakeTable.decodeFileUri(r.getString(0)).split("/data/").last
          rowsByRel.get(rel).foreach { rows =>
            var j = 0
            while (j < r.length - 1) {
              val b = acc.getOrElseUpdate((rel, j), KeyBloom.create(rows, bpk))
              if (!r.isNullAt(j + 1)) b.putString(r.getString(j + 1))
              j += 1
            }
          }
        }
        acc.iterator
      }
      .reduceByKey((a, b) => { a.mergeInPlace(b); a })
      .collect()
    val fs = new Path(dataDir).getFileSystem(conf)
    val suffixes = present.map { case ((_, s), _) => s }
    partials.foreach { case ((rel, j), bloom) =>
      KeyBloom.write(fs, new Path(s"$dataDir/.blooms/$rel${suffixes(j)}"), bloom)
    }
  }
}

object LakeTable {
  private[lake] val WRITE_ID = "_v"
  private[lake] val RANK = "_graft_rank"

  /** Commit operations that rewrite files while carrying every row
    * unchanged — the merged table content before and after is identical.
    * Kept deliberately narrow: `restore`/`fsck`/`reorg` also remove files
    * but CHANGE visible content, so they must never appear here. The
    * second set is ops that touch no data file at all (pure table
    * metadata); both leave a window's true row delta empty. */
  private val physicalOps =
    Set("compact", "optimize", "zorder", "zorder_incremental",
      "analyze", "savepoint", "release_savepoint", "setProperties")

  /** Value-preserving type widenings ([[LakeTable.widenColumn]]): every
    * value of `from` maps to exactly itself in `to`. */
  private[graft] def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => false
    // byte/short/int → double is exact too (53-bit mantissa ⊇ 32-bit int);
    // long → double is NOT (Delta's matrix draws the same line)
    case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
    case (ShortType, IntegerType | LongType | DoubleType) => true
    case (IntegerType, LongType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    // integral → decimal with room for every value of the source type
    case (ByteType, t: DecimalType) => t.precision - t.scale >= 3
    case (ShortType, t: DecimalType) => t.precision - t.scale >= 5
    case (IntegerType, t: DecimalType) => t.precision - t.scale >= 10
    case (LongType, t: DecimalType) => t.precision - t.scale >= 19
    case _ => false
  }
  /** Per-scan file identity matching FileAction.path (see readFiles). */
  private[lake] val REL_FILE = "_rel_file"
  /** Decode an input_file_name() URI to the literal path form FileAction
    * paths use (listing-derived). URI.getPath decodes %XX but keeps a
    * literal '+' — unlike form-decoding — matching path semantics. */
  private[lake] def decodeFileUri(s: String): String =
    try new java.net.URI(s).getPath
    catch { case _: java.net.URISyntaxException => s }
  /** Hive `unescapePathName`: decode the %XX escapes partition-dir names
    * use, leaving every other char (notably '+') alone — URLDecoder's
    * form-decoding would corrupt a literal '+' into a space. */
  private[lake] def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
  /** Max tombstone write-id per key during tombstone application. */
  private[lake] val TOMB_V = "_graft_tomb_v"
  /** Deletion-vector sidecar area under `data/` (`_dv/_v=<writeId>/`). */
  private[lake] val DV_DIR = "_dv"
  /** Per-row parquet position (`_metadata.row_index`) during DV work. */
  private[lake] val DV_POS = "_dv_pos"
  /** DV sidecar schema: excluded (file, position) pairs. */
  private[lake] val DV_SCHEMA = StructType(Seq(
    StructField("file", StringType), StructField("pos", LongType)))
  /** Write-id slots per commit version: an attempt's base files take
    * `version*WRITE_SLOTS + 2*nonce`, its log files `+1`. The wide slot
    * space lets concurrent attempts at the same version (optimistic
    * writers) draw disjoint `_v=` directories; ids stay monotone in
    * version, which the precombine-tie dedup relies on. */
  private[lake] val WRITE_SLOTS = 1L << 20

  /** [[LakeTable.windowDelta]] MoR path: collect at most this many touched
    * record keys driver-side to stats/bloom/bucket-prune the two snapshot
    * reads' base files; past it the reads stay unpruned (the semi-join
    * still bounds the rows — a window touching this many keys rewrote a
    * large fraction of the table anyway). */
  private val MOR_DELTA_KEY_CAP = 8192
  /** Op-level rebase attempts before surfacing ConcurrentModificationException. */
  private[lake] val MAX_COMMIT_RETRIES = 10
  /** Above this many distinct incoming keys, skip bloom probing — churn
    * that wide touches most files regardless, and the probe broadcast
    * would not stay cheap. */
  private[lake] val MAX_BLOOM_PROBE_KEYS = 200000

  val META_COLS: Seq[String] =
    Seq("_commit_time", "_commit_seqno", "_record_key", "_partition_path", "_file_name")
  private val META_SCHEMA = StructType(META_COLS.map(StructField(_, StringType)))

  private[lake] case class WriteResult(add: Seq[FileAction], remove: Seq[String])

  private val TIME_FMT = DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
  private val lastTime = new java.util.concurrent.atomic.AtomicLong(0)

  /** Hudi-shaped commit id, strictly monotonic even within one millisecond. */
  /** Parse a commit-log timeline timestamp back to UTC epoch millis. */
  def commitTimeMillis(commitTime: String): Long =
    java.time.LocalDateTime.parse(commitTime, TIME_FMT)
      .toInstant(ZoneOffset.UTC).toEpochMilli

  /** Accepts either epoch millis or an ISO/SQL timestamp string (UTC). */
  def parseUserTimestamp(s: String): Long =
    s.toLongOption.getOrElse {
      val t = s.trim.replace(' ', 'T')
      try java.time.LocalDateTime.parse(t).toInstant(ZoneOffset.UTC).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.Instant.parse(if (t.endsWith("Z")) t else t + "Z").toEpochMilli
      }
    }

  private[lake] def commitTimeNow(): String = {
    val now = System.currentTimeMillis()
    val t = lastTime.updateAndGet(prev => math.max(prev + 1, now))
    ZonedDateTime.ofInstant(java.time.Instant.ofEpochMilli(t), ZoneOffset.UTC).format(TIME_FMT)
  }

  /** Latest-wins per key: greatest (precombine, tiebreak) survives (A4/J3).
    * Implemented as `max_by` over a (precombine, tiebreak) ordering struct:
    * a hash aggregate with map-side partial aggregation — one shuffle of
    * one row per key, no per-key sort (a row_number window would
    * shuffle+sort every row; at 100 TB that difference is the job). */
  def dedupLatest(df: DataFrame, key: String, precombine: String, tiebreak: Column): DataFrame =
    dedupLatest(df, Seq(key), precombine, tiebreak)

  def dedupLatest(df: DataFrame, keys: Seq[String], precombine: String,
      tiebreak: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(cols.map(col).toSeq: _*),
        struct(col(precombine), tiebreak)).as(RANK + "_row"))
      .select(col(RANK + "_row.*"))
  }

  /** Create a new table at `path` with `df` as version 0.
    *
    * @param bulkInsert skip the precombine dedup, matching Hudi's INSERT /
    *   BULK_INSERT operations (`hoodie.combine.before.insert=false` is the
    *   Hudi default for inserts — `/root/reference/README.md:276-290` runs
    *   INSERT for the full load). Input rows pass through verbatim; with
    *   duplicate keys the snapshot shows duplicates until an upsert or
    *   compaction collapses them, exactly like Hudi. Default keeps the
    *   dedup (unique-key base invariant). */
  def create(spark: SparkSession, path: String, spec0: TableSpec, df0: DataFrame,
      bulkInsert: Boolean = false,
      presetIdentityHigh: Map[String, Long] = Map.empty): LakeTable = {
    val conf = spark.sessionState.newHadoopConf()
    require(CommitLog.latestVersion(path, conf).isEmpty, s"table exists at $path")
    CommitLog.invalidateTable(path) // a dropped table may have lived here
    // hash-bucketed layout: the bucket id is a STORED column laid out as the
    // table's (hive-style) partition dirs, so every partition-aware path
    // (pruning, dynamic overwrite, SHOW PARTITIONS) works unchanged and the
    // DSv2 scan can report KeyGroupedPartitioning for shuffle-free joins
    val (spec, dfB) =
      if (spec0.buckets > 0) {
        require(spec0.partition.isEmpty,
          "buckets and partition are mutually exclusive (buckets ARE the layout)")
        (spec0.copy(partition = Some(TableSpec.BUCKET_COL)),
          df0.withColumn(TableSpec.BUCKET_COL,
            pmod(hash(col(spec0.key)), lit(spec0.buckets))))
      } else (spec0, df0)
    val dfG = GeneratedCols(dfB, spec.generated)
    // DEFAULT columns omitted at create are stamped so the declared
    // schema carries them from version 0
    val df = spec.defaults.foldLeft(dfG) { case (acc, (c, e)) =>
      if (acc.columns.exists(_.equalsIgnoreCase(c))) acc
      else acc.withColumn(c, expr(e))
    }
    spec.defaults.keys.foreach { c =>
      require(!spec.generated.keys.exists(_.equalsIgnoreCase(c)) &&
        !spec.identity.keys.exists(_.equalsIgnoreCase(c)),
        s"default column '$c' cannot also be generated or identity")
    }
    spec.partition.foreach(p => require(df.columns.contains(p), s"missing partition col $p"))
    require(df.columns.contains(spec.key) && df.columns.contains(spec.precombine),
      s"key/precombine not in schema")
    spec.identity.keys.foreach { c =>
      require(!c.equalsIgnoreCase(spec.key) && !c.equalsIgnoreCase(spec.precombine) &&
        !spec.partition.exists(_.equalsIgnoreCase(c)) &&
        !spec.generated.keys.exists(_.equalsIgnoreCase(c)),
        s"identity column '$c' cannot also be the key/precombine/partition/generated column")
    }
    val t = new LakeTable(spark, path)
    // bootstrap commit 0 by hand (writeCommit requires an existing schema)
    val version = 0L
    val commitTime = commitTimeNow()
    val boot0 = Commit(version, commitTime, "create", df.schema.json, spec, Seq.empty, Seq.empty)
    CommitLog.write(path, boot0, conf)
    // identity columns stamp AFTER the provisional boot (stampIdentity reads
    // spec through the log); the final commit 0 carries the widened schema
    // and the allocated high-water marks. presetIdentityHigh: the rows
    // already carry authoritative ids (deep-clone materialization).
    val (dfI, idHighs) =
      if (presetIdentityHigh.nonEmpty) (df, presetIdentityHigh)
      else t.stampIdentity(df, freshForAll = true)
    val boot = boot0.copy(schemaJson = dfI.schema.json, identityHigh = idHighs)
    val batch = t.stampMeta(if (bulkInsert) dfI else t.dedupBatch(dfI), commitTime)
    val res = t.writeFiles(batch, t.freshWriteId(version), log = false)
    // amend: rewrite commit 0 with the files (single-writer, pre-publish)
    val fs = CommitLog.logDir(path).getFileSystem(conf)
    fs.delete(new Path(CommitLog.logDir(path), f"$version%020d.json"), false)
    CommitLog.invalidate(path, version) // the one place a commit file is replaced
    CommitLog.write(path, boot.copy(add = res.add), conf)
    t
  }

  /** Convert a plain parquet directory into a graft table IN PLACE (Delta
    * `CONVERT TO DELTA` / Hudi bootstrap analog): no data is rewritten —
    * the bootstrap commit references the existing files (with footer-derived
    * key stats for pruning), and the commit log lands in `<dir>/_graft_log`.
    * Later writes rewrite touched files into the table's own `data/` dir;
    * the originals are simply de-referenced (never deleted — they remain
    * the user's files). Flat, non-partitioned sources only; rows in
    * converted files carry null meta columns until first rewritten. */
  def convert(spark: SparkSession, dir: String, spec: TableSpec): LakeTable = {
    val conf = spark.sessionState.newHadoopConf()
    require(spec.partition.isEmpty, "convert supports flat, non-partitioned sources")
    require(!spec.mor, "convert bootstraps a CoW table")
    require(spec.identity.isEmpty,
      "convert cannot declare identity columns — the existing files were never stamped")
    require(CommitLog.latestVersion(dir, conf).isEmpty, s"table exists at $dir")
    CommitLog.invalidateTable(dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath, st.getLen))
    require(files.nonEmpty, s"no parquet files to convert at $dir")
    val schema = spark.read.parquet(dir).schema
    require(schema.fieldNames.contains(spec.key) &&
      schema.fieldNames.contains(spec.precombine), "key/precombine not in schema")
    val numericKey = schema(spec.key).dataType.isInstanceOf[NumericType]
    val baseDir = fs.makeQualified(root).toUri.getPath
    val adds = files.map { case (f, len) =>
      val (rows, mn, mx) = FooterStats.keyStats(f, conf, spec.key)
      FileAction(f.getName, log = false, rows, mn, mx, numericKey,
        partitionValue = None, base = Some(baseDir), bytes = len)
    }
    CommitLog.write(dir,
      Commit(0L, commitTimeNow(), "convert", schema.json, spec, adds, Seq.empty), conf)
    new LakeTable(spark, dir)
  }

  /** Open an existing table. */
  def load(spark: SparkSession, path: String): LakeTable = {
    require(CommitLog.latestVersion(path, spark.sessionState.newHadoopConf()).isDefined,
      s"no graft table at $path")
    new LakeTable(spark, path)
  }
}
