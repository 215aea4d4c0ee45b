package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.model.ReferenceRegion

/** FASTA index (.fai) — the samtools faidx 5-column format (name, sequence
  * length, byte offset of first base, bases per line, bytes per line) —
  * and random-access extraction against it, the reference's
  * `util/IndexedFastaFile.scala` equivalent: a region is served by seeking
  * to offset + line arithmetic instead of loading the contig. Broadcast
  * the [[IndexedFasta]] handle and extract per-task, or use
  * `core/ReferenceContigs` when whole contigs in memory are acceptable. */
object Fai {

  case class Entry(
      name: String, length: Long, offset: Long,
      lineBases: Int, lineWidth: Int)

  def parse(lines: Seq[String]): Seq[Entry] =
    lines.filter(_.nonEmpty).map { l =>
      val f = l.split("\t")
      Entry(f(0), f(1).toLong, f(2).toLong, f(3).toInt, f(4).toInt)
    }

  def format(entries: Seq[Entry]): String =
    entries.map(e =>
      s"${e.name}\t${e.length}\t${e.offset}\t${e.lineBases}\t${e.lineWidth}")
      .mkString("", "\n", "\n")

  /** Build the index by one sequential scan of the FASTA bytes. */
  def build(in: java.io.InputStream): Seq[Entry] = {
    val br = new java.io.BufferedInputStream(in)
    val entries = Seq.newBuilder[Entry]
    var name: String = null
    var length = 0L
    var offset = 0L
    var lineBases = 0
    var lineWidth = 0
    var firstLine = true
    var pos = 0L
    val lineBuf = new java.lang.StringBuilder(256)

    def flush(): Unit =
      if (name != null) entries += Entry(name, length, offset, lineBases, lineWidth)

    var b = br.read()
    while (b >= 0) {
      if (b == '\n') {
        val line = lineBuf.toString
        val lineLen = line.length
        lineBuf.setLength(0)
        if (line.startsWith(">")) {
          flush()
          name = line.substring(1).takeWhile(_ != ' ')
          length = 0L; offset = pos + lineLen + 1
          lineBases = 0; lineWidth = 0; firstLine = true
        } else if (line.nonEmpty) {
          if (firstLine) { lineBases = lineLen; lineWidth = lineLen + 1; firstLine = false }
          length += lineLen
        }
        pos += lineLen + 1
      } else lineBuf.append(b.toChar)
      b = br.read()
    }
    if (lineBuf.length() > 0) { // unterminated final line
      val line = lineBuf.toString
      if (!line.startsWith(">") && line.nonEmpty) {
        if (firstLine) { lineBases = line.length; lineWidth = line.length + 1 }
        length += line.length
      }
    }
    flush()
    entries.result()
  }

  /** Random-access handle; safe to broadcast (opens the file per call).
    * Implements [[graft.core.ReferenceSource]], so realignment / MD
    * tagging can run against a seek-based reference without holding the
    * genome in memory. */
  case class IndexedFasta(path: String, entries: Seq[Entry],
      conf: Option[HadoopConf] = None)
      extends graft.core.ReferenceSource {
    @transient private lazy val byName = entries.map(e => e.name -> e).toMap

    def extract(region: ReferenceRegion): String = {
      val e = byName.getOrElse(region.referenceName,
        throw new NoSuchElementException(s"contig ${region.referenceName}"))
      val start = math.max(0L, region.start)
      val end = math.min(e.length, region.end)
      if (end <= start) return ""
      val byteStart = e.offset + (start / e.lineBases) * e.lineWidth + start % e.lineBases
      val byteEnd = e.offset + ((end - 1) / e.lineBases) * e.lineWidth + (end - 1) % e.lineBases + 1
      val p = new Path(path)
      val fs = p.getFileSystem(conf.map(_.value)
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
      val in = fs.open(p)
      try {
        in.seek(byteStart)
        val raw = new Array[Byte]((byteEnd - byteStart).toInt)
        in.readFully(raw)
        val sb = new java.lang.StringBuilder((end - start).toInt)
        raw.foreach { b => if (b != '\n' && b != '\r') sb.append(b.toChar) }
        sb.toString
      } finally in.close()
    }
  }

  /** Load (or build + persist) the .fai for a FASTA and return the handle. */
  def open(spark: SparkSession, fastaPath: String,
      writeIfMissing: Boolean = true): IndexedFasta = {
    val p = new Path(fastaPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val faiPath = new Path(fastaPath + ".fai")
    val entries =
      if (fs.exists(faiPath)) {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(faiPath), "UTF-8"))
        try parse(Iterator.continually(in.readLine())
          .takeWhile(_ != null).toVector)
        finally in.close()
      } else {
        val in = fs.open(p)
        val built = try build(in) finally in.close()
        if (writeIfMissing) {
          val out = fs.create(faiPath, true)
          try out.write(format(built).getBytes("UTF-8")) finally out.close()
        }
        built
      }
    IndexedFasta(fastaPath, entries, Some(HadoopConf(spark)))
  }
}
