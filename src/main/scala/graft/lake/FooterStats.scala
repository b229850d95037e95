package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation

import scala.jdk.CollectionConverters._

/** Per-file key statistics straight from parquet footers — the metadata the
  * commit log stores for file pruning. Footer reads are driver-side and
  * O(footer size); the alternative (re-scanning written files with a
  * group-by) costs a full executor job per commit. Falls back to sentinel
  * whole-range stats when the footer lacks usable statistics (pruning then
  * simply keeps the file — always safe).
  */
object FooterStats {

  /** @return (rowCount, minKey, maxKey) with keys rendered as the plain
    *         string forms FileAction stores. */
  def keyStats(file: Path, conf: Configuration, key: String): (Long, String, String) = {
    val (rows, m) = fileStats(file, conf, Seq(key))
    val (mn, mx) = m(key)
    (rows, mn, mx)
  }

  /** One footer read covering several columns: per-column (min, max) in the
    * plain string forms FileAction stores, plus the row count. A column
    * whose stats are unusable in ANY row group gets the whole-range
    * sentinel — the recorded range would otherwise understate the file and
    * data skipping could wrongly drop it. */
  def fileStats(file: Path, conf: Configuration,
      cols: Seq[String]): (Long, Map[String, (String, String)]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      val out = cols.map { name =>
        var mn: Option[Any] = None
        var mx: Option[Any] = None
        var partial = false
        blocks.foreach { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString.equalsIgnoreCase(name)) match {
            case Some(c) =>
              val st = c.getStatistics
              if (st != null && st.hasNonNullValue) {
                val (lo, hi) = (st.genericGetMin, st.genericGetMax)
                if (mn.isEmpty || cmp(lo, mn.get) < 0) mn = Some(lo)
                if (mx.isEmpty || cmp(hi, mx.get) > 0) mx = Some(hi)
              } else if (b.getRowCount > 0) partial = true
            case None => if (b.getRowCount > 0) partial = true
          }
        }
        val stat =
          if (partial) ("", "￿")
          else (mn.map(render).getOrElse(""), mx.map(render).getOrElse("￿"))
        name -> stat
      }.toMap
      (rows, out)
    } finally reader.close()
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
    case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
    case (x: java.lang.Float, y: java.lang.Float) => x.compareTo(y)
    case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
    case (x: Binary, y: Binary) => x.compareTo(y)
    case _ => 0
  }

  private def render(v: Any): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => String.valueOf(other)
  }
}
