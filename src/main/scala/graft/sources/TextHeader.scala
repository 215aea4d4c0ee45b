package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Driver-side header extraction for line-oriented genomic text formats
  * (SAM `@`-lines, VCF `#`-lines). Headers are a contiguous prefix of each
  * file, so we stream just the first bytes of every matched file instead of
  * running a distributed filter over the whole dataset — at 100 TB the old
  * `.filter(_.startsWith("@")).collect()` scanned every record to recover a
  * few KB that live in the first split (reference delegates the same
  * short-read to htsjdk's SAMFileReader header pass). */
object TextHeader {

  /** Files matched by `path` (a file, directory, or glob), in name order —
    * the same order Spark's text reader assigns partitions. */
  private def filesOf(spark: SparkSession, path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)).filter(_.nonEmpty)
      .getOrElse(Array(fs.getFileStatus(p)))
    matched.toSeq.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath)
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName).map(_.getPath).toSeq
      else Seq(st.getPath)
    }
  }

  /** The contiguous run of lines starting with `prefix` at the head of each
    * matched file, concatenated in file order. Reads stop at the first
    * non-header line — bounded by header size, never by data size. BGZF /
    * gzip compressed files (.gz/.bgz) are decompressed streaming. */
  def headerLines(spark: SparkSession, path: String, prefix: String): Seq[String] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    filesOf(spark, path).flatMap { f =>
      val raw = fs.open(f)
      val in: java.io.InputStream =
        if (f.getName.endsWith(".gz") || f.getName.endsWith(".bgz"))
          Bgzf.inputStream(raw)
        else raw
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      try Iterator.continually(br.readLine())
        .takeWhile(l => l != null && l.startsWith(prefix)).toVector
      finally br.close()
    }
  }
}
