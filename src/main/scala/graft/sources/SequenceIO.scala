package graft.sources

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import graft.model.{Read, Sequence, Slice}

/** FASTA / FASTQ IO (SURVEY.md §2.1; reference: FastaConverters.scala,
  * io/FastqRecordReader.java, ADAMContext.scala:2468-2637, 3882-3953).
  *
  * Multi-line record stitching across partition boundaries uses the
  * two-pass mapPartitions pattern: pass 1 counts record starts per
  * partition (tiny driver collect of one long per partition — bounded by
  * partition count, not data size), pass 2 assigns globally consistent
  * record ids; then records assemble with one shuffle on record id. This is
  * the scalable equivalent of the reference's custom Hadoop record readers.
  */
object SequenceIO {

  private implicit val seqEnc: org.apache.spark.sql.Encoder[Sequence] =
    Encoders.product[Sequence]
  private implicit val sliceEnc: org.apache.spark.sql.Encoder[Slice] =
    Encoders.product[Slice]
  private implicit val readEnc: org.apache.spark.sql.Encoder[Read] =
    Encoders.product[Read]

  /** Lines tagged with a global record id: a new record starts when
    * `isStart(line)` holds. Record id = (records in earlier partitions) +
    * (records so far in this partition). Lines before the first start get
    * id -1 (dropped). */
  private def tagRecords(
      spark: SparkSession, path: String,
      isStart: String => Boolean): org.apache.spark.rdd.RDD[(Long, (Long, String))] = {
    val lines = spark.sparkContext.textFile(path)
      .zipWithIndex().map(_.swap) // (lineIdx, line)
    val startsPerPartition = lines
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator((pid, it.count(kv => isStart(kv._2)).toLong))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = startsPerPartition.scanLeft(0L)(_ + _)
    val offsetsB = spark.sparkContext.broadcast(offsets)
    lines.mapPartitionsWithIndex { (pid, it) =>
      var rec = offsetsB.value(pid) - 1
      it.map { case (idx, l) =>
        if (isStart(l)) rec += 1
        (rec, (idx, l))
      }
    }.filter(_._1 >= 0)
  }

  // -------------------------------- FASTA ----------------------------------

  /** FASTA → Dataset[Sequence]: one record per `>` header; description =
    * text after first token; alphabet tagged by the caller
    * (loadFastaDna/Rna/Protein, ADAMContext.scala:3882-3953). */
  def readFasta(spark: SparkSession, path: String,
      alphabet: String = "DNA"): Dataset[Sequence] = {
    val grouped = tagRecords(spark, path, _.startsWith(">"))
      .groupByKey()
      .map { case (_, lines) =>
        val sorted = lines.toSeq.sortBy(_._1).map(_._2)
        val header = sorted.head.stripPrefix(">")
        val (name, desc) = header.indexOf(' ') match {
          case -1 => (header, None)
          case i  => (header.substring(0, i), Some(header.substring(i + 1)))
        }
        val seq = sorted.tail.mkString("")
        Sequence(
          name = Some(name), description = desc,
          alphabet = Some(alphabet), sequence = Some(seq),
          length = Some(seq.length.toLong))
      }
    spark.createDataset(grouped)
  }

  /** FASTA → fixed-width slices (loadFastaDna(maxLength) → SliceDataset,
    * SequenceDataset.slice semantics, SequenceDataset.scala:306-371). */
  def readFastaSlices(spark: SparkSession, path: String,
      maxLength: Long = 10000L): Dataset[Slice] = {
    import spark.implicits._
    readFasta(spark, path).flatMap { s =>
      val seq = s.sequence.getOrElse("")
      val total = seq.length.toLong
      val n = math.max(1L, (total + maxLength - 1) / maxLength).toInt
      (0 until n).map { i =>
        val start = i * maxLength
        val end = math.min(total, start + maxLength)
        Slice(
          name = s.name, description = s.description, alphabet = s.alphabet,
          sequence = Some(seq.substring(start.toInt, end.toInt)),
          start = Some(start), end = Some(end),
          strand = Some("FORWARD"),
          length = Some(end - start), totalLength = Some(total),
          index = Some(i), slices = Some(n))
      }
    }
  }

  def writeFasta(ds: Dataset[Sequence], path: String, lineWidth: Int = 60): Unit = {
    import ds.sparkSession.implicits._
    ds.map { s =>
      val header = ">" + s.name.getOrElse("") +
        s.description.map(d => " " + d).getOrElse("")
      val body = s.sequence.getOrElse("").grouped(lineWidth).mkString("\n")
      header + "\n" + body
    }.write.mode("overwrite").text(path)
  }

  // -------------------------------- FASTQ ----------------------------------

  private def fastqRecordsFrom(sorted: Seq[String]): Read = {
    val name = sorted.head.stripPrefix("@").takeWhile(_ != ' ')
    val seq = sorted(1)
    val qual = if (sorted.length > 3) sorted(3) else ""
    Read(
      name = Some(name), sequence = Some(seq),
      length = Some(seq.length.toLong),
      qualityScores = Some(qual))
  }

  /** FASTQ → Dataset[Read]. Uses line-index arithmetic (records are exactly
    * 4 lines) rather than content sniffing — '@' is a legal quality char,
    * so `startsWith("@")` is not a record-start predicate
    * (the classic FASTQ pitfall; reference handles it in
    * io/FastqRecordReader.java). */
  def readFastq(spark: SparkSession, path: String): Dataset[Read] = {
    val grouped = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .filter(_._1.nonEmpty)
      .map { case (l, idx) => (idx / 4, (idx, l)) }
      .groupByKey()
      .map { case (_, lines) =>
        fastqRecordsFrom(lines.toSeq.sortBy(_._1).map(_._2))
      }
    spark.createDataset(grouped)
  }

  /** Interleaved paired FASTQ → (read1, read2) per fragment
    * (loadPairedFastq validation semantics, AC:2468-2637). */
  def readInterleavedFastq(spark: SparkSession, path: String): Dataset[(Read, Read)] = {
    implicit val pairEnc: org.apache.spark.sql.Encoder[(Read, Read)] =
      Encoders.tuple(readEnc, readEnc)
    val grouped = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .filter(_._1.nonEmpty)
      .map { case (l, idx) => (idx / 8, (idx, l)) }
      .groupByKey()
      .map { case (_, lines) =>
        val sorted = lines.toSeq.sortBy(_._1).map(_._2)
        val r1 = fastqRecordsFrom(sorted.take(4))
        val r2 = fastqRecordsFrom(sorted.drop(4))
        require(r1.name == r2.name ||
          r1.name.map(_.stripSuffix("/1")) == r2.name.map(_.stripSuffix("/2")),
          s"Interleaved FASTQ pair mismatch: ${r1.name} vs ${r2.name}")
        (r1, r2)
      }
    spark.createDataset(grouped)
  }

  def writeFastq(ds: Dataset[Read], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      "@" + r.name.getOrElse("") + "\n" + r.sequence.getOrElse("") +
        "\n+\n" + r.qualityScores.getOrElse("")
    }.write.mode("overwrite").text(path)
  }

  /** Paired FASTQ save (saveAsPairedFastq, AlignmentDataset.scala:
    * 1394-1572): first-of-fragment reads to `r1Path`, second to `r2Path`,
    * both name-sorted so line N of each file is the same fragment.
    * Negative-strand reads are restored to sequenced orientation (reverse
    * complement + reversed qualities), as the reference does on FASTQ
    * export. `strict` validates the two sides pair one-to-one. */
  def writePairedFastq(
      reads: Dataset[graft.model.Alignment],
      r1Path: String, r2Path: String,
      strict: Boolean = true): Unit = {
    val spark = reads.sparkSession
    import spark.implicits._
    def fastqLine(r: graft.model.Alignment, suffix: String): (String, String) = {
      val neg = r.readNegativeStrand.getOrElse(false)
      val seq0 = r.sequence.getOrElse("")
      val q0 = r.qualityScores.getOrElse("")
      val seq = if (neg) graft.functions.GenomicFunctions.reverseComplement(seq0) else seq0
      val q = if (neg) q0.reverse else q0
      val name = r.readName.getOrElse("")
      (name, s"@$name$suffix\n$seq\n+\n$q")
    }
    val r1 = reads.filter((r: graft.model.Alignment) => r.readInFragment.contains(0))
      .map(fastqLine(_, "/1"))
    val r2 = reads.filter((r: graft.model.Alignment) => r.readInFragment.contains(1))
      .map(fastqLine(_, "/2"))
    if (strict) {
      val n1 = r1.count(); val n2 = r2.count()
      require(n1 == n2, s"unpaired FASTQ export: $n1 first reads vs $n2 second")
      val unmatched = r1.select($"_1").except(r2.select($"_1")).count()
      require(unmatched == 0, s"$unmatched first-of-pair reads lack a mate")
    }
    r1.orderBy($"_1").select($"_2").write.mode("overwrite").text(r1Path)
    r2.orderBy($"_1").select($"_2").write.mode("overwrite").text(r2Path)
  }
}
