package graft.lake

/** Declarative table metadata for a graft lake table.
  *
  * Mirrors the option surface of the reference's Hudi writes
  * (`/root/reference/README.md:276-290`: RECORDKEY_FIELD=pk_id,
  * PRECOMBINE_FIELD=updated_at, PARTITIONPATH_FIELD=created_at,
  * STORAGE_TYPE COPY_ON_WRITE|MERGE_ON_READ) without the format jars.
  *
  * @param key        record key column — upserts are keyed on it
  * @param precombine ordering column: within a batch and between batches the
  *                   row with the greatest value wins; incoming wins ties
  *                   (Hudi DefaultHoodieRecordPayload `>=` semantics)
  * @param partition  optional hive-style partition column
  * @param mor        merge-on-read: updates land in log files; `_ro` serves
  *                   base files only, `_rt` merges on the fly
  * @param bloomBitsPerKey per-file key bloom sidecars at this many bits per
  *                   key (0 = off). Hudi bloom-index analog: prunes upsert/
  *                   delete candidate files when key RANGES overlap (random
  *                   churn), where min/max stats prune nothing. 10 ⇒ ~1%
  *                   false positives; a false positive only costs reading
  *                   one extra candidate file.
  * @param constraints named CHECK constraints (Delta `ALTER TABLE … ADD
  *                   CONSTRAINT name CHECK (expr)` analog): every write
  *                   validates each SQL expression over the incoming batch
  *                   and fails loudly on a violating row. Names are
  *                   case-insensitive-unique.
  * @param statsColumns extra columns to collect per-file (min, max) footer
  *                   stats for (the record key always has stats): scans
  *                   filtered on these columns skip whole files from
  *                   commit-log metadata — Delta data-skipping analog.
  *                   Pairs naturally with `zorder(...)` over the same
  *                   columns, which makes per-file ranges tight.
  */
case class TableSpec(
    key: String,
    precombine: String,
    partition: Option[String] = None,
    mor: Boolean = false,
    bloomBitsPerKey: Int = 0,
    constraints: Map[String, String] = Map.empty,
    statsColumns: Seq[String] = Seq.empty,
    /** Columns to collect per-file (exact sum, non-null count) for at
      * write time: unfiltered `SUM(col)` / `COUNT(col)` (and hence any
      * sum/count-derived AVG) then answer from commit-log metadata alone —
      * zero data files opened at 100 TB. Restricted to integral and
      * decimal columns, whose sums are exact and addition-order-
      * independent (a float sum is neither, so it can never be answered
      * from per-file partials without changing the result). Costs one
      * extra aggregation pass over just-written files per commit (the
      * files are cache-hot; parquet footers carry min/max but no sums). */
    sumColumns: Seq[String] = Seq.empty,
    /** Column mapping (Delta name-mapping analog): LOGICAL column name →
      * PHYSICAL parquet field name. Empty/absent entries mean identity.
      * RENAME/DROP COLUMN are metadata-only commits that edit this map and
      * the declared schema; data files keep their original field names
      * forever, so no rewrite ever happens and a re-added logical name gets
      * a fresh physical name instead of resurrecting dropped data. */
    columnMap: Map[String, String] = Map.empty,
    /** Hash-bucket the table into this many buckets on the record key
      * (0 = off). Writes stamp and store a `_bucket` column
      * (pmod(hash(key), buckets)) laid out as a hive-style dir per bucket;
      * the DSv2 catalog scan then reports KeyGroupedPartitioning on
      * `_bucket`, so a join of two same-bucketed tables that includes
      * `_bucket` in its keys plans WITHOUT a shuffle on either side
      * (Spark storage-partitioned join). Mutually exclusive with
      * `partition` (buckets ARE the partition layout). */
    buckets: Int = 0,
    /** Auto-maintenance (Delta auto-OPTIMIZE analog): after any data-write
      * commit, when the live file count exceeds this, small files are
      * concatenated (MoR logs folded) automatically — best-effort and
      * OCC-safe, so a stream of small upserts can never accrete unbounded
      * file counts without anyone running OPTIMIZE. 0 = off. */
    autoCompactFiles: Int = 0,
    /** MoR: fold logs automatically when the outstanding log-file count
      * exceeds this (bounds read-time merge work under continuous
      * upserts). 0 = off. */
    autoCompactLogs: Int = 0,
    /** Generated columns (Delta `GENERATED ALWAYS AS (expr)` analog):
      * logical column name → SQL generation expression over the other
      * columns. Every write computes a missing generated column
      * automatically and VALIDATES a caller-supplied one (null-safe
      * equality, fails loudly on the first divergent batch — Delta's
      * contract). Partitioning on a generated column gives HIDDEN
      * PARTITIONING: when the expression is a recognized monotonic
      * transform of one source column (`to_date`, `date_trunc`, `year`,
      * zero-padded `date_format`, `div` by a positive constant, casts),
      * scans filtered on the SOURCE column prune partitions through the
      * transform — `WHERE ts BETWEEN a AND b` skips date partitions a
      * query never has to name (see [[GeneratedCols]]). */
    generated: Map[String, String] = Map.empty,
    /** Identity columns (Delta `GENERATED ALWAYS AS IDENTITY (START WITH s
      * INCREMENT BY k)` analog): column name → allocation rule. The engine
      * assigns every value — a caller may never supply one (an all-null
      * supplied column, e.g. from SQL `INSERT`, is treated as absent) —
      * and never reuses one: a cumulative high-water mark per column rides
      * the commit log (denormalized like `txn`), so deletes/overwrites
      * can't resurrect an id. Assignment is per RECORD KEY and
      * deterministic (md5-of-key order within the batch's new keys): an
      * upsert's existing keys KEEP their ids (Delta MERGE UPDATE parity),
      * new keys draw the next ids (MERGE INSERT parity). */
    identity: Map[String, IdentityDef] = Map.empty,
    /** Column DEFAULT expressions (SQL `DEFAULT` / Delta default-columns
      * analog, write-side): when a write OMITS the column entirely, it is
      * stamped with this SQL expression; a SUPPLIED column — including
      * explicit nulls — passes through untouched (the difference from
      * [[generated]], which validates supplied values). Defaults do not
      * rewrite history: rows written before a default was declared keep
      * their stored values. */
    defaults: Map[String, String] = Map.empty,
    /** Existence defaults (Delta `ADD COLUMN … DEFAULT` read-side half):
      * rows in files that PREDATE the column — known per file from its
      * commit's schema — read this constant instead of null; files that
      * carry the column (genuine nulls included) are untouched. Set only
      * by [[graft.lake.LakeTable.addColumns]] with defaults; frozen
      * constants (never re-evaluated against later spec changes). */
    existenceDefaults: Map[String, String] = Map.empty,
    /** Bloom filter indexes (Delta `CREATE BLOOMFILTER INDEX` analog):
      * per-file bloom sidecars for these NON-KEY columns, built in the
      * same one-pass job as the key bloom. Point-lookup scans
      * (`WHERE col = v` / `IN`) probe a few KB of sidecar per candidate
      * file instead of opening it — the non-key equality story at 100 TB,
      * where min/max stats prune nothing for high-cardinality columns
      * scattered across files. Fail-open like the key bloom: a missing or
      * torn sidecar keeps its file. Sizing follows `bloomBitsPerKey`
      * (default 10 bits/value ≈ 1% FP when unset). */
    bloomColumns: Seq[String] = Seq.empty,
    /** Write-side clustering (Delta `CLUSTER BY`/optimized-write analog):
      * every write range-partitions and sorts its files by these columns
      * (after the hive partition column when one is declared), so
      * per-file min/max ranges are TIGHT and non-overlapping from the
      * first commit — filters on these columns prune files without ever
      * running OPTIMIZE/ZORDER. Pair with `statsColumns` on the same
      * columns so the ranges reach the commit log. Columns missing from a
      * batch (tombstone/log subsets) are skipped for that write. */
    writeSortColumns: Seq[String] = Seq.empty) {

  /** Physical parquet field name of a logical column. */
  def physical(logical: String): String = columnMap.getOrElse(logical, logical)
}

object TableSpec {
  /** The stored bucket-id column of a bucketed table. */
  val BUCKET_COL = "_bucket"
}

/** Allocation rule of one identity column: first value `start`, spaced
  * `step` apart (positive or negative, never 0). Values are BIGINTs. */
case class IdentityDef(start: Long = 1L, step: Long = 1L) {
  require(step != 0L, "identity INCREMENT BY must not be 0")
}
