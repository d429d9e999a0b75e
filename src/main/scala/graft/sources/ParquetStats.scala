package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Driver-side reads of parquet FOOTER column statistics — metadata
  * only, never a Spark job. The min/max every parquet writer records
  * per column chunk is exactly what an iterative operator needs for a
  * tight data-dependent bound (e.g. pointer-doubling round count from
  * the key domain's bit length) without paying a full-scan
  * aggregation job first.
  *
  * Cost model at 100 TB: one footer read per file (a few KB each,
  * seek-to-tail). That is the same metadata Spark's own scan planning
  * touches to split the files, so a bound derived here is strictly
  * cheaper than any Spark job — no tasks, no shuffle, no stage. For
  * catalog-backed tables the same numbers come from table statistics
  * without touching files at all; this helper is the no-catalog path.
  */
object ParquetStats {

  /** Max value of an integral column across all row groups of all
    * parquet files under `path` (a single file or a directory of
    * `part-*.parquet`). None when no file carries statistics for the
    * column (callers fall back to their data-free bound).
    */
  /** All parquet part files under `path` (a single file or a
    * directory tree). Recurses into subdirectories (Hive-partitioned
    * layouts nest part files one level per partition column) — a
    * non-recursive listing would silently skip those files and return
    * PARTIAL statistics, and a too-small bound is worse than none
    * (callers use these as hard convergence guards / dial inputs).
    * Hidden files/dirs (_SUCCESS, .staging) are skipped at every
    * level, same as Spark's own file index. None when `path` does not
    * exist.
    */
  private def parquetFiles(conf: Configuration, path: String)
      : Option[Seq[Path]] = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    def listParquet(p: Path): Seq[Path] = {
      val st = fs.getFileStatus(p)
      val n = p.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath).flatMap(listParquet)
      else if (n.endsWith(".parquet")) Seq(p)
      else Nil
    }
    Some(
      if (fs.getFileStatus(root).isDirectory) listParquet(root)
      else Seq(root))
  }

  /** EXACT row count from parquet footers (the per-block row counts
    * every parquet file records — not column statistics, so it cannot
    * be absent or null-skewed): the driver-side, zero-job equivalent
    * of `df.count()` for the size-derived dials (BlockDials) that
    * several indexed-similarity queries compute before planning. None
    * when the path does not exist (callers fall back to the count
    * job).
    */
  def rowCount(conf: Configuration, path: String): Option[Long] =
    parquetFiles(conf, path).map { files =>
      files.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }.sum
    }

  def maxLong(conf: Configuration, path: String, column: String)
      : Option[Long] = {
    val files: Seq[Path] = parquetFiles(conf, path) match {
      case None     => return None
      case Some(fs) => fs
    }
    val maxes = files.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.flatMap { block =>
          block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .flatMap { chunk =>
              val st = chunk.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else st.genericGetMax match {
                case l: java.lang.Long    => Some(l.longValue)
                case i: java.lang.Integer => Some(i.longValue)
                case _                    => None // non-integral: no bound
              }
            }
        }
      } finally reader.close()
    }
    maxes.reduceOption(_ max _)
  }
}
