package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-file output merge (util/FileMerger.scala:35-125 — a Hadoop FS
  * utility with no Spark equivalent, kept as such). Concatenates the
  * part-files of a written directory into one file, with an optional
  * header prepended. Driver-side streaming copy; used by every
  * `asSingleFile=true` sink.
  */
object FileMerger {

  def mergeToSingleFile(
      spark: SparkSession,
      partsDir: String,
      outPath: String,
      header: Option[String] = None,
      deleteParts: Boolean = true): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(partsDir)
    val fs = dir.getFileSystem(conf)
    val out = fs.create(new Path(outPath), true)
    try {
      header.foreach(h => out.write(h.getBytes("UTF-8")))
      val parts = fs.listStatus(dir)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      val buf = new Array[Byte](1 << 20)
      parts.foreach { p =>
        val in = fs.open(p.getPath)
        try {
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
    } finally out.close()
    if (deleteParts) fs.delete(dir, true)
  }

  /** Binary variant: concatenate part files between raw header and trailer
    * bytes (e.g. a BGZF header member and the BGZF EOF marker — BGZF
    * streams are valid under concatenation). */
  def mergeBinary(
      spark: SparkSession,
      partsDir: String,
      outPath: String,
      header: Array[Byte],
      trailer: Array[Byte],
      deleteParts: Boolean = true): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(partsDir)
    val fs = dir.getFileSystem(conf)
    val out = fs.create(new Path(outPath), true)
    try {
      out.write(header)
      val parts = fs.listStatus(dir)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      val buf = new Array[Byte](1 << 20)
      parts.foreach { p =>
        val in = fs.open(p.getPath)
        try {
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
      out.write(trailer)
    } finally out.close()
    if (deleteParts) fs.delete(dir, true)
  }
}
