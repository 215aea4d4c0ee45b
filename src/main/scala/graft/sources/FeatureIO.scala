package graft.sources

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import graft.model.Feature

/** Line-format feature IO: BED / GFF3 / GTF / NarrowPeak / IntervalList
  * (SURVEY.md §2.1-2.2; reference parsers ds/feature/FeatureParser.scala:
  * 60-411, writers FeatureDataset.scala:161-292, 784-934). Public format
  * specs (UCSC BED, GFF3/GTF, ENCODE narrowPeak, Picard interval_list).
  *
  * Readers: `spark.read.text` + per-line parse into Dataset[Feature] —
  * parallel per file split, no driver involvement. Writers: map to the
  * line serialization + `write.text`.
  */
object FeatureIO {

  private implicit val featureEnc: org.apache.spark.sql.Encoder[Feature] =
    Encoders.product[Feature]

  private def lines(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    // bgzipped feature files (.bed.gz, .gff3.gz, ...) read through the
    // splittable BGZF text path; plain text through the native reader
    val raw =
      if (path.endsWith(".gz") || path.endsWith(".bgz"))
        BgzfText.readLines(spark, path)
      else spark.read.textFile(path)
    raw.filter((l: String) => l.nonEmpty)
  }

  private def opt(s: String): Option[String] =
    if (s == null || s.isEmpty || s == "." || s == "*") None else Some(s)

  private def strandOf(s: String): Option[String] = s match {
    case "+" => Some("FORWARD")
    case "-" => Some("REVERSE")
    case "." => Some("INDEPENDENT")
    case _   => None
  }

  private def strandSymbol(s: Option[String]): String = s match {
    case Some("FORWARD") => "+"
    case Some("REVERSE") => "-"
    case _ => "."
  }

  // -------------------------------- BED -----------------------------------
  // BED3..BED12; 0-based half-open (FeatureParser BEDParser:311).

  def readBed(spark: SparkSession, path: String): Dataset[Feature] =
    lines(spark, path)
      .filter((l: String) => !l.startsWith("#") && !l.startsWith("track") &&
        !l.startsWith("browser"))
      .map { l =>
        val f = l.split("\t", -1)
        val attrs = Map.newBuilder[String, String]
        if (f.length > 6) attrs += ("thickStart" -> f(6))
        if (f.length > 7) attrs += ("thickEnd" -> f(7))
        if (f.length > 8) attrs += ("itemRgb" -> f(8))
        if (f.length > 9) attrs += ("blockCount" -> f(9))
        if (f.length > 10) attrs += ("blockSizes" -> f(10))
        if (f.length > 11) attrs += ("blockStarts" -> f(11))
        Feature(
          referenceName = Some(f(0)),
          start = Some(f(1).toLong),
          end = Some(f(2).toLong),
          name = if (f.length > 3) opt(f(3)) else None,
          score = if (f.length > 4) opt(f(4)).map(_.toDouble) else None,
          strand = if (f.length > 5) strandOf(f(5)) else None,
          attributes = attrs.result())
      }

  def toBedLine(f: Feature): String = {
    val base = Seq(
      f.referenceName.getOrElse("."),
      f.start.map(_.toString).getOrElse("."),
      f.end.map(_.toString).getOrElse("."),
      f.name.getOrElse("."),
      f.score.map(s => if (s == s.floor) s.toLong.toString else s.toString)
        .getOrElse("."),
      strandSymbol(f.strand))
    base.mkString("\t")
  }

  def writeBed(ds: Dataset[Feature], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(toBedLine).write.mode("overwrite").text(path)
  }

  // ------------------------------- GFF3 ------------------------------------
  // seqid source type start end score strand phase attributes(k=v;…);
  // 1-based closed input → 0-based half-open internal (GFF3Parser:155).

  private def parseGffAttrs(s: String, sep: Char, kvSep: String): Map[String, String] =
    s.split(sep).iterator.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
      if (kvSep == "=") {
        val i = kv.indexOf('=')
        if (i > 0) Some(kv.substring(0, i) -> kv.substring(i + 1)) else None
      } else {
        // GTF: key "value"
        val i = kv.indexOf(' ')
        if (i > 0) Some(kv.substring(0, i) ->
          kv.substring(i + 1).stripPrefix("\"").stripSuffix("\""))
        else None
      }
    }.toMap

  private def featureFromGffFields(
      f: Array[String], attrs: Map[String, String],
      ids: (Option[String], Option[String], Option[String], Option[String], Option[String]),
      parents: Seq[String]): Feature =
    Feature(
      referenceName = Some(f(0)),
      source = opt(f(1)),
      featureType = opt(f(2)),
      start = Some(f(3).toLong - 1),
      end = Some(f(4).toLong),
      score = opt(f(5)).map(_.toDouble),
      strand = strandOf(f(6)),
      phase = opt(f(7)).map(_.toInt),
      featureId = ids._1, name = ids._2, geneId = ids._3,
      transcriptId = ids._4, exonId = ids._5,
      parentIds = parents,
      attributes = attrs -- Seq("ID", "Name", "Parent", "gene_id",
        "transcript_id", "exon_id"))

  def readGff3(spark: SparkSession, path: String): Dataset[Feature] =
    lines(spark, path)
      .filter((l: String) => !l.startsWith("#"))
      .map { l =>
        val f = l.split("\t", -1)
        val attrs = parseGffAttrs(f(8), ';', "=")
        featureFromGffFields(f, attrs,
          (attrs.get("ID"), attrs.get("Name"), attrs.get("gene_id"),
            attrs.get("transcript_id"), attrs.get("exon_id")),
          attrs.get("Parent").toSeq.flatMap(_.split(',')))
      }

  def toGff3Line(f: Feature): String = {
    val attrs = Seq(
      f.featureId.map(v => s"ID=$v"),
      f.name.map(v => s"Name=$v"),
      if (f.parentIds.nonEmpty) Some(s"Parent=${f.parentIds.mkString(",")}") else None
    ).flatten ++ f.attributes.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
    Seq(
      f.referenceName.getOrElse("."),
      f.source.getOrElse("."),
      f.featureType.getOrElse("."),
      f.start.map(s => (s + 1).toString).getOrElse("."),
      f.end.map(_.toString).getOrElse("."),
      f.score.map(_.toString).getOrElse("."),
      strandSymbol(f.strand),
      f.phase.map(_.toString).getOrElse("."),
      if (attrs.isEmpty) "." else attrs.mkString(";")
    ).mkString("\t")
  }

  def writeGff3(ds: Dataset[Feature], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(toGff3Line).write.mode("overwrite").text(path)
  }

  // -------------------------------- GTF ------------------------------------

  def readGtf(spark: SparkSession, path: String): Dataset[Feature] =
    lines(spark, path)
      .filter((l: String) => !l.startsWith("#"))
      .map { l =>
        val f = l.split("\t", -1)
        val attrs = parseGffAttrs(f(8), ';', " ")
        featureFromGffFields(f, attrs,
          (None, attrs.get("gene_name"), attrs.get("gene_id"),
            attrs.get("transcript_id"), attrs.get("exon_id")),
          Seq.empty)
      }

  def toGtfLine(f: Feature): String = {
    val attrs =
      (f.geneId.map(v => s"""gene_id "$v"""") ++
        f.transcriptId.map(v => s"""transcript_id "$v"""") ++
        f.exonId.map(v => s"""exon_id "$v"""") ++
        f.attributes.toSeq.sortBy(_._1).map { case (k, v) => s"""$k "$v"""" })
        .mkString("; ")
    Seq(
      f.referenceName.getOrElse("."), f.source.getOrElse("."),
      f.featureType.getOrElse("."),
      f.start.map(s => (s + 1).toString).getOrElse("."),
      f.end.map(_.toString).getOrElse("."),
      f.score.map(_.toString).getOrElse("."),
      strandSymbol(f.strand), f.phase.map(_.toString).getOrElse("."),
      if (attrs.isEmpty) "." else attrs + ";"
    ).mkString("\t")
  }

  def writeGtf(ds: Dataset[Feature], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(toGtfLine).write.mode("overwrite").text(path)
  }

  // ----------------------------- NarrowPeak --------------------------------
  // BED6 + signalValue pValue qValue peak (NarrowPeakParser:366).

  def readNarrowPeak(spark: SparkSession, path: String): Dataset[Feature] =
    lines(spark, path).map { l =>
      val f = l.split("\t", -1)
      val attrs = Map.newBuilder[String, String]
      if (f.length > 6) attrs += ("signalValue" -> f(6))
      if (f.length > 7) attrs += ("pValue" -> f(7))
      if (f.length > 8) attrs += ("qValue" -> f(8))
      if (f.length > 9) attrs += ("peak" -> f(9))
      Feature(
        referenceName = Some(f(0)),
        start = Some(f(1).toLong),
        end = Some(f(2).toLong),
        name = if (f.length > 3) opt(f(3)) else None,
        score = if (f.length > 4) opt(f(4)).map(_.toDouble) else None,
        strand = if (f.length > 5) strandOf(f(5)) else None,
        attributes = attrs.result())
    }

  def toNarrowPeakLine(f: Feature): String = Seq(
    f.referenceName.getOrElse("."),
    f.start.map(_.toString).getOrElse("."),
    f.end.map(_.toString).getOrElse("."),
    f.name.getOrElse("."),
    f.score.map(s => s.toLong.toString).getOrElse("0"),
    strandSymbol(f.strand),
    f.attributes.getOrElse("signalValue", "0"),
    f.attributes.getOrElse("pValue", "-1"),
    f.attributes.getOrElse("qValue", "-1"),
    f.attributes.getOrElse("peak", "-1")
  ).mkString("\t")

  def writeNarrowPeak(ds: Dataset[Feature], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(toNarrowPeakLine).write.mode("overwrite").text(path)
  }

  // ---------------------------- IntervalList -------------------------------
  // Picard: @-header (SAM-style) + name chr start end strand; 1-based closed
  // (IntervalListParser:229).

  def readIntervalList(spark: SparkSession, path: String): Dataset[Feature] =
    lines(spark, path)
      .filter((l: String) => !l.startsWith("@"))
      .map { l =>
        val f = l.split("\t", -1)
        Feature(
          referenceName = Some(f(0)),
          start = Some(f(1).toLong - 1),
          end = Some(f(2).toLong),
          strand = if (f.length > 3) strandOf(f(3)) else None,
          name = if (f.length > 4) opt(f(4)) else None)
      }

  def toIntervalListLine(f: Feature): String = Seq(
    f.referenceName.getOrElse("."),
    f.start.map(s => (s + 1).toString).getOrElse("."),
    f.end.map(_.toString).getOrElse("."),
    strandSymbol(f.strand),
    f.name.getOrElse(".")
  ).mkString("\t")

  def writeIntervalList(ds: Dataset[Feature], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(toIntervalListLine).write.mode("overwrite").text(path)
  }

  /** Extension-dispatch loader (loadFeatures routing,
    * ADAMContext.scala:3432). */
  def readFeatures(spark: SparkSession, path: String): Dataset[Feature] = {
    // compression suffixes route inside lines(); dispatch on the format
    val p = path.toLowerCase.stripSuffix(".gz").stripSuffix(".bgz")
    if (p.endsWith(".bed")) readBed(spark, path)
    else if (p.endsWith(".gff3") || p.endsWith(".gff")) readGff3(spark, path)
    else if (p.endsWith(".gtf")) readGtf(spark, path)
    else if (p.endsWith(".narrowpeak")) readNarrowPeak(spark, path)
    else if (p.endsWith(".interval_list")) readIntervalList(spark, path)
    else throw new IllegalArgumentException(s"Unknown feature format: $path")
  }
}
