package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

/** Splittable reading of BGZF-compressed TEXT files (.vcf.gz, .bed.gz,
  * .gff3.gz … — bgzip output, the standard genomics compressor). Plain
  * gzip is not block-addressable, so Spark reads a 100 GB .vcf.gz on one
  * core; BGZF members let every (file, byte-range) split decompress
  * independently (boundary scan — any offset is within 64 KiB of a member
  * start) with exactly-once line ownership by terminator block
  * ([[Bgzf.splitLines]]). Files whose first member is NOT BGZF fall back
  * to a single whole-file gzip stream per file.
  *
  * The reference reads bgzipped text through hadoop-bam's BGZFCodec
  * (ADAMContext loaders accept .gz/.bgz); this is the from-spec
  * equivalent.
  */
object BgzfText {

  private def listFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile)
        .filterNot(f => f.getPath.getName.startsWith("_") ||
          f.getPath.getName.startsWith("."))
        .map(f => (f.getPath.toString, f.getLen)).sortBy(_._1).toIndexedSeq
    else Seq((path, fs.getFileStatus(p).getLen))
  }

  private def headerBytes(spark: SparkSession, file: String): Array[Byte] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](64)
      var got = 0
      var r = 0
      while (got < b.length && r >= 0) {
        r = in.read(b, got, b.length - got)
        if (r > 0) got += r
      }
      b.take(got)
    } finally in.close()
  }

  /** Distributed lines of BGZF text file(s); block-level splits. */
  def readLines(
      spark: SparkSession, path: String,
      splitSize: Long = 32L << 20): Dataset[String] = {
    import spark.implicits._
    val files = listFiles(spark, path)
    val bgzf = files.headOption.exists { case (f, _) =>
      Bgzf.isBgzf(headerBytes(spark, f)) }

    val confB = spark.sparkContext.broadcast(HadoopConf(spark))
    if (!bgzf) {
      // plain gzip: not splittable — one task per file
      val rdd = spark.sparkContext
        .parallelize(files.map(_._1), math.max(1, files.length))
        .flatMap { f =>
          val fp = new Path(f)
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            new java.util.zip.GZIPInputStream(
              fp.getFileSystem(confB.value.value).open(fp)), "UTF-8"))
          Iterator.continually(in.readLine()).takeWhile(_ != null)
        }
      return spark.createDataset(rdd)
    }

    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      if (len <= splitSize + splitSize / 2) Seq((f, 0L, len))
      else {
        val n = math.max(1, (len / splitSize).toInt)
        val step = len / n
        (0 until n).map(i =>
          (f, i * step, if (i == n - 1) len else (i + 1) * step))
      }
    }
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(1, splits.length))
      .flatMap { case (f, s, e) =>
        val fp = new Path(f)
        val fs = fp.getFileSystem(confB.value.value)
        val len = fs.getFileStatus(fp).getLen
        val raw = fs.open(fp)
        Bgzf.splitLines(raw, len, s, e, off => raw.seek(off))
      }
    spark.createDataset(rdd)
  }

  /** Write lines as a single BGZF file (driver-streamed) or distributed
    * BGZF part files. */
  def writeLines(
      lines: Dataset[String], path: String,
      asSingleFile: Boolean = true, header: Option[String] = None): Unit = {
    val spark = lines.sparkSession
    if (asSingleFile) {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = new Bgzf.BgzfOutputStream(fs.create(p, true))
      try {
        header.foreach(h => out.write(h.getBytes("UTF-8")))
        lines.toLocalIterator().forEachRemaining { l =>
          out.write(l.getBytes("UTF-8")); out.write('\n')
        }
      } finally out.close()
    } else {
      val dir = new Path(path)
      val fs0 = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs0.mkdirs(dir)
      val headerB = spark.sparkContext.broadcast(header)
      val confB = spark.sparkContext.broadcast(HadoopConf(spark))
      lines.rdd.mapPartitionsWithIndex { (pid, it) =>
        val part = new Path(dir, f"part-$pid%05d.gz")
        val fs = part.getFileSystem(confB.value.value)
        val out = new Bgzf.BgzfOutputStream(fs.create(part, true))
        try {
          if (pid == 0) headerB.value.foreach(h => out.write(h.getBytes("UTF-8")))
          it.foreach { l => out.write(l.getBytes("UTF-8")); out.write('\n') }
        } finally out.close()
        Iterator.single(1)
      }.count()
      ()
    }
  }
}
