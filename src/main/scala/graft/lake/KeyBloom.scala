package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file key bloom sidecars — the graft analog of Hudi's bloom index.
  *
  * Range stats (FileAction min/max key) prune nothing when key ranges
  * overlap across files (random-key churn): every file is a candidate and
  * the upsert's touched-file detection reads the key column of the whole
  * table. A small sidecar bloom per data file lets the detection test
  * "could any incoming key live here?" from a few KB of metadata instead,
  * so detection I/O scales with the CHURN, not the table.
  *
  * Keys are hashed in their canonical string form (the same form the range
  * stats compare). The filter itself is Spark's bundled
  * `org.apache.spark.util.sketch.BloomFilter`. Sidecars are written
  * write-then-rename (like commit JSONs) and read FAIL-OPEN: a missing or
  * torn sidecar keeps its file as a candidate — pruning can be suboptimal,
  * never wrong.
  */
object KeyBloom {

  /** `bitsPerKey` ↦ false-positive probability (10 bits/key ≈ 1%). */
  def create(expectedKeys: Long, bitsPerKey: Int): BloomFilter = {
    val fpp = math.max(1e-6, math.pow(0.6185, bitsPerKey.toDouble))
    BloomFilter.create(math.max(64L, expectedKeys), fpp)
  }

  def write(fs: FileSystem, path: Path, b: BloomFilter): Unit = {
    fs.mkdirs(path.getParent)
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    val out = fs.create(tmp, true)
    try b.writeTo(out) finally out.close()
    if (fs.exists(path)) fs.delete(path, false) // retry of a dead attempt
    if (!fs.rename(tmp, path)) throw new IllegalStateException(
      s"bloom sidecar rename failed: $path")
  }

  /** None when the sidecar is absent or unreadable (torn write, old
    * format) — callers must treat None as "keep the file". */
  def readOpt(fs: FileSystem, path: Path): Option[BloomFilter] =
    try {
      if (!fs.exists(path)) None
      else {
        val in = fs.open(path)
        try Some(BloomFilter.readFrom(in)) finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
