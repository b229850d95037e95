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
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      var mn: Option[Any] = None
      var mx: Option[Any] = None
      // if ANY row group lacks usable stats (e.g. truncated long-binary
      // min/max), the recorded range would understate the file and pruning
      // could wrongly drop it — fall back to the whole-range sentinel
      var partial = false
      blocks.foreach { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString.equalsIgnoreCase(key)) match {
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
      if (partial) (rows, "", "￿")
      else (rows, mn.map(render).getOrElse(""), mx.map(render).getOrElse("￿"))
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
