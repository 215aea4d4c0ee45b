package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import scala.collection.mutable.ArrayBuffer

/** External-process dataflow operator — pipe records through a command per
  * partition (SURVEY.md §2.11; reference GenomicDataset.pipe GD:786-917
  * with InFormatter/OutFormatter pairs, ds/InFormatter.scala:45-72,
  * ds/OutFormatter.scala:85-97).
  *
  * Mechanics mirror the reference exactly: per partition, start a
  * ProcessBuilder, a feeder thread serializes records to the child's
  * stdin via the [[InFormatter]], the parent iterator drains stdout
  * through the [[OutFormatter]]. Partition-level parallelism; no driver
  * involvement. Flank/dedup concerns of the reference's genome-binned
  * pipe are handled upstream by `repartitionByRange` on region bins.
  */
object Pipe {

  /** Serializes records (plus an optional header) into the child's stdin. */
  trait InFormatter[T] extends Serializable {
    def header: Seq[String] = Seq.empty
    def format(record: T): String
  }

  /** Parses the child's stdout lines back into records. */
  trait OutFormatter[U] extends Serializable {
    def parse(lines: Iterator[String]): Iterator[U]
  }

  def pipe[T, U: Encoder](
      ds: Dataset[T],
      command: Seq[String],
      inFormatter: InFormatter[T],
      outFormatter: OutFormatter[U],
      environment: Map[String, String] = Map.empty): Dataset[U] = {
    ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pb = new ProcessBuilder(command: _*)
        environment.foreach { case (k, v) => pb.environment().put(k, v) }
        pb.redirectErrorStream(false)
        val proc = pb.start()

        // feeder thread: header + records -> stdin
        val feeder = new Thread(() => {
          val w = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
          try {
            inFormatter.header.foreach { h => w.write(h); w.newLine() }
            it.foreach { r => w.write(inFormatter.format(r)); w.newLine() }
          } finally w.close()
        }, "graft-pipe-feeder")
        feeder.setDaemon(true)
        feeder.start()

        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null)
        val out = outFormatter.parse(lines)

        // wrap to ensure process reaped after the iterator drains
        new Iterator[U] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) { reader.close(); proc.waitFor() }
            h
          }
          def next(): U = out.next()
        }
      }
    }
  }

  /** Genome-binned pipe (the reference's full pipe() operator,
    * GD:786-917): records are keyed into genome bins WITH flanked copies
    * (a record lands in its own bin plus any bin within `flank` bases, so
    * the child process sees boundary context), each bin's records run
    * through the command together, and outputs are deduplicated by keeping
    * only records whose start lies in the bin's own range — the flank-dedup
    * rule of GD:897-916.
    *
    * `regionOf` extracts (referenceName, start) from a record; `startOf`
    * extracts the output record's coordinates for dedup.
    */
  def pipeBinned[T, U: Encoder](
      ds: Dataset[T],
      command: Seq[String],
      inFormatter: InFormatter[T],
      outFormatter: OutFormatter[U],
      regionOf: T => (String, Long, Long),
      startOf: U => (String, Long),
      binSize: Long = 1000000L,
      flank: Long = 0L,
      environment: Map[String, String] = Map.empty)(
      implicit tEnc: Encoder[T]): Dataset[U] = {
    import ds.sparkSession.implicits._
    val keyed = ds.flatMap { t =>
      val (ref, start, end) = regionOf(t)
      val lo = math.max(0L, start - flank) / binSize
      val hi = (math.max(start, end - 1) + flank) / binSize
      (lo to hi).map(b => (s"$ref:$b", t))
    }(Encoders.tuple(Encoders.STRING, tEnc))

    keyed.groupByKey(_._1)
      .flatMapGroups { (binKey: String, it: Iterator[(String, T)]) =>
        val records = it.map(_._2).toSeq
        val Array(ref, binStr) = binKey.split(":", 2)
        val bin = binStr.toLong
        val lo = bin * binSize
        val hi = lo + binSize

        val pb = new ProcessBuilder(command: _*)
        environment.foreach { case (k, v) => pb.environment().put(k, v) }
        val proc = pb.start()
        val feeder = new Thread(() => {
          val w = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
          try {
            inFormatter.header.foreach { h => w.write(h); w.newLine() }
            records.foreach { r => w.write(inFormatter.format(r)); w.newLine() }
          } finally w.close()
        }, "graft-pipe-feeder")
        feeder.setDaemon(true)
        feeder.start()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null)
        val out = outFormatter.parse(lines).filter { u =>
          // flank dedup: only the owning bin emits a record
          val (oref, ostart) = startOf(u)
          oref == ref && ostart >= lo && ostart < hi
        }.toVector
        reader.close(); proc.waitFor()
        out.iterator
      }
  }

  // ---------------- formatter pairs for the engine's types ----------------

  /** SAM in/out (reference SAMInFormatter / AnySAMOutFormatter). */
  class SamInFormatter(headerLines: Seq[String]) extends InFormatter[graft.model.Alignment] {
    override def header: Seq[String] = headerLines
    def format(r: graft.model.Alignment): String = graft.sources.SamIO.toSamLine(r)
  }

  object SamOutFormatter extends OutFormatter[graft.model.Alignment] {
    def parse(lines: Iterator[String]): Iterator[graft.model.Alignment] =
      lines.filterNot(l => l.isEmpty || l.startsWith("@"))
        .map(graft.sources.SamIO.parseRecord)
  }

  /** BED feature in/out (reference BEDInFormatter / BEDOutFormatter). */
  object BedInFormatter extends InFormatter[graft.model.Feature] {
    def format(f: graft.model.Feature): String = graft.sources.FeatureIO.toBedLine(f)
  }

  object BedOutFormatter extends OutFormatter[graft.model.Feature] {
    def parse(lines: Iterator[String]): Iterator[graft.model.Feature] =
      lines.filter(_.nonEmpty).map { l =>
        val f = l.split("\t", -1)
        graft.model.Feature(
          referenceName = Some(f(0)),
          start = Some(f(1).toLong), end = Some(f(2).toLong),
          name = f.lift(3).filter(v => v.nonEmpty && v != "."),
          score = f.lift(4).filter(v => v.nonEmpty && v != ".").map(_.toDouble))
      }
  }

  /** GFF3 features in/out (reference GFF3InFormatter/GFF3OutFormatter). */
  object Gff3InFormatter extends InFormatter[graft.model.Feature] {
    def format(f: graft.model.Feature): String = graft.sources.FeatureIO.toGff3Line(f)
  }

  /** FASTA sequences in (reference FASTAInFormatter). */
  object FastaInFormatter extends InFormatter[graft.model.Sequence] {
    def format(s: graft.model.Sequence): String =
      ">" + s.name.getOrElse("") + "\n" + s.sequence.getOrElse("")
  }

  /** FASTQ reads in/out (reference FASTQInFormatter). NOTE out-parsing
    * assumes well-formed 4-line records from the child process. */
  object FastqInFormatter extends InFormatter[graft.model.Read] {
    def format(r: graft.model.Read): String =
      "@" + r.name.getOrElse("") + "\n" + r.sequence.getOrElse("") +
        "\n+\n" + r.qualityScores.getOrElse("")
  }

  object FastqOutFormatter extends OutFormatter[graft.model.Read] {
    def parse(lines: Iterator[String]): Iterator[graft.model.Read] =
      lines.grouped(4).withPartial(false).map { g =>
        graft.model.Read(
          name = Some(g(0).stripPrefix("@").takeWhile(_ != ' ')),
          sequence = Some(g(1)),
          length = Some(g(1).length.toLong),
          qualityScores = Some(g(3)))
      }
  }

  /** VCF in/out over VariantContexts (reference VCFInFormatter:100 /
    * VCFOutFormatter:131). In-formatter emits a minimal header; the
    * out-parser needs the child's #CHROM sample list, which it reads
    * inline. */
  class VcfInFormatter(samples: Seq[String]) extends InFormatter[graft.model.VariantContext] {
    override def header: Seq[String] =
      Seq("##fileformat=VCFv4.2",
        (Seq("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO") ++
          (if (samples.nonEmpty) "FORMAT" +: samples else Nil)).mkString("\t"))
    def format(vc: graft.model.VariantContext): String =
      graft.sources.VcfIO.toVcfLine(vc, samples)
  }

  object VcfOutFormatter extends OutFormatter[graft.model.VariantContext] {
    def parse(lines: Iterator[String]): Iterator[graft.model.VariantContext] = {
      var samples: Seq[String] = Seq.empty
      lines.flatMap {
        case l if l.startsWith("#CHROM") =>
          samples = l.split("\t").drop(9).toSeq; Iterator.empty
        case l if l.startsWith("#") || l.isEmpty => Iterator.empty
        case l => graft.sources.VcfIO.parseLine(l, samples).iterator
      }
    }
  }

  /** Plain text lines (the generic escape hatch). */
  object TextInFormatter extends InFormatter[String] {
    def format(s: String): String = s
  }

  object TextOutFormatter extends OutFormatter[String] {
    def parse(lines: Iterator[String]): Iterator[String] = lines
  }
}
