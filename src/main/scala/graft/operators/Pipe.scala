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
    /** Output lines for one record — override for records that serialize
      * to several lines (interleaved FASTQ) or may be dropped (improper
      * pairs). Default: one line via [[format]]. */
    def formatAll(record: T): Iterator[String] = Iterator.single(format(record))
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
            it.foreach(r => inFormatter.formatAll(r)
              .foreach { l => w.write(l); w.newLine() })
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
            records.foreach(r => inFormatter.formatAll(r)
              .foreach { l => w.write(l); w.newLine() })
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

  // ------- Bowtie/BWA interop formatters over Fragment (reference
  // ds/fragment/Tab5InFormatter.scala / Tab6InFormatter.scala /
  // InterleavedFASTQInFormatter.scala; per-read field prep =
  // AlignmentConverter.prepareFastq:250-295) -------

  /** FASTQ-ready (name, sequence, quality) of one read: optional "/1"-"/2"
    * name suffix, reverse-complement + reversed quality on the negative
    * strand, 'B'-filled quality when unknown. */
  private def prepFastq(
      r: graft.model.Alignment, addSuffix: Boolean): (String, String, String) = {
    val name0 = r.readName.getOrElse("")
    val suffix =
      if (addSuffix && !hasPairSuffix(name0) && r.readPaired.getOrElse(false))
        "/" + (r.readInFragment.getOrElse(0) + 1)
      else ""
    val seq0 = r.sequence.getOrElse("")
    val qual0 = r.qualityScores.filter(_ != "*").getOrElse("B" * seq0.length)
    val neg = r.readNegativeStrand.getOrElse(false)
    (name0 + suffix,
      if (neg) graft.functions.GenomicFunctions.reverseComplement(seq0) else seq0,
      if (neg) qual0.reverse else qual0)
  }

  private def hasPairSuffix(n: String): Boolean =
    n.length > 2 && n.charAt(n.length - 2) == '/' &&
      (n.last == '1' || n.last == '2')

  private def trimPairSuffix(n: String): String =
    if (hasPairSuffix(n)) n.dropRight(2) else n

  /** Bowtie tab5 in: one line per fragment — unpaired
    * `[name]\t[seq]\t[qual]`, paired
    * `[trimmed name]\t[seq1]\t[qual1]\t[seq2]\t[qual2]` (suffix always
    * trimmed; reference Tab5InFormatter + convertToTab5:383). */
  object Tab5InFormatter extends InFormatter[graft.model.Fragment] {
    def format(f: graft.model.Fragment): String = {
      val reads = f.alignments.take(2)
      val (n, s, q) = prepFastq(reads.head, addSuffix = false)
      val first = s"${trimPairSuffix(n)}\t$s\t$q"
      if (reads.size == 1) first
      else {
        val (_, s2, q2) = prepFastq(reads(1), addSuffix = false)
        s"$first\t$s2\t$q2"
      }
    }
    override def formatAll(f: graft.model.Fragment): Iterator[String] =
      if (f.alignments.isEmpty) Iterator.empty else Iterator.single(format(f))
  }

  /** Bowtie tab6 in: like tab5 but the second end keeps its own name —
    * `[name1]\t[seq1]\t[qual1]\t[name2]\t[seq2]\t[qual2]` (reference
    * Tab6InFormatter + convertToTab6:353). */
  class Tab6InFormatter(writeSuffixes: Boolean = false)
    extends InFormatter[graft.model.Fragment] {
    def format(f: graft.model.Fragment): String =
      f.alignments.take(2).map { r =>
        val (n, s, q) = prepFastq(r, addSuffix = writeSuffixes)
        s"$n\t$s\t$q"
      }.mkString("\t")
    override def formatAll(f: graft.model.Fragment): Iterator[String] =
      if (f.alignments.isEmpty) Iterator.empty else Iterator.single(format(f))
  }

  /** Interleaved FASTQ in: paired fragments only, read 1 then read 2 (the
    * reference drops unpaired fragments and improper pairs —
    * InterleavedFASTQInFormatter.scala:59-95). */
  class InterleavedFastqInFormatter(writeSuffixes: Boolean = false)
    extends InFormatter[graft.model.Fragment] {
    def format(f: graft.model.Fragment): String = formatAll(f).mkString("\n")
    override def formatAll(f: graft.model.Fragment): Iterator[String] = {
      val reads = f.alignments.take(2)
      if (reads.size < 2) Iterator.empty
      else {
        val sorted = reads.sortBy(_.readInFragment.getOrElse(-1))
        if (sorted(0).readInFragment.contains(0) &&
          sorted(1).readInFragment.contains(1)) {
          sorted.iterator.flatMap { r =>
            val (n, s, q) = prepFastq(r, addSuffix = writeSuffixes)
            Iterator("@" + n, s, "+", q)
          }
        } else Iterator.empty // improper pair
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
