package graft.lake

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-file key bloom filter — the graft analog of Hudi's bloom index.
  *
  * Range stats (FileAction min/max key) prune nothing when key ranges
  * overlap across files (random-key churn): every file is a candidate and
  * the upsert's touched-file detection reads the key column of the whole
  * table. A small sidecar bloom per data file lets the detection test
  * "could any incoming key live here?" from a few KB of metadata instead,
  * so detection I/O scales with the CHURN, not the table.
  *
  * Keys are hashed in their canonical string form (the same form the
  * range stats compare). Double hashing (h1 + i·h2) over two seeded
  * FNV-1a 64 passes; bit count is sized per file at `bitsPerKey` (10 ⇒
  * ~1% false positives — a false positive only costs reading one extra
  * candidate file, never correctness).
  */
final class KeyBloom(val numHashes: Int, val bits: Array[Long]) extends Serializable {
  private val mMask = bits.length * 64 - 1 // bit count is a power of two

  def add(key: String): Unit = {
    val h1 = KeyBloom.fnv64(key, 0xcbf29ce484222325L)
    val h2 = KeyBloom.fnv64(key, 0x100000001b3L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((h1 + i * h2) & Long.MaxValue).toInt & mMask
      bits(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  def mightContain(key: String): Boolean = {
    val h1 = KeyBloom.fnv64(key, 0xcbf29ce484222325L)
    val h2 = KeyBloom.fnv64(key, 0x100000001b3L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((h1 + i * h2) & Long.MaxValue).toInt & mMask
      if ((bits(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def or(other: KeyBloom): KeyBloom = {
    require(other.bits.length == bits.length && other.numHashes == numHashes,
      "cannot OR blooms of different shape")
    val merged = new Array[Long](bits.length)
    var i = 0
    while (i < bits.length) { merged(i) = bits(i) | other.bits(i); i += 1 }
    new KeyBloom(numHashes, merged)
  }
}

object KeyBloom {
  private val MAGIC = 0x47424631 // "GBF1"

  /** Sized for `expectedKeys` at `bitsPerKey`; bit count rounded up to a
    * power of two (min 1024) so indexing is a mask. */
  def empty(expectedKeys: Long, bitsPerKey: Int): KeyBloom = {
    val want = math.max(1024L, expectedKeys * bitsPerKey)
    var m = 1024L
    while (m < want && m < (1L << 30)) m <<= 1
    val k = math.max(1, math.round(bitsPerKey * 0.69).toInt)
    new KeyBloom(k, new Array[Long]((m / 64).toInt))
  }

  private[lake] def fnv64(s: String, seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def serialize(b: KeyBloom): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeInt(MAGIC); d.writeInt(b.numHashes); d.writeInt(b.bits.length)
    b.bits.foreach(d.writeLong)
    d.flush()
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): KeyBloom = {
    val d = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(d.readInt() == MAGIC, "not a graft bloom sidecar")
    val k = d.readInt()
    val words = new Array[Long](d.readInt())
    var i = 0
    while (i < words.length) { words(i) = d.readLong(); i += 1 }
    new KeyBloom(k, words)
  }

  def write(fs: FileSystem, path: Path, b: KeyBloom): Unit = {
    val out = fs.create(path, true)
    try out.write(serialize(b)) finally out.close()
  }

  def read(fs: FileSystem, path: Path): KeyBloom = {
    val in = fs.open(path)
    try {
      val len = fs.getFileStatus(path).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(buf)
      deserialize(buf)
    } finally in.close()
  }
}
