package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import graft.model.ReferenceRegion

/** Random-access reference genome interface (the reference's
  * util/ReferenceFile.scala:32): implemented by the broadcast in-memory
  * [[ReferenceContigs]] and by the seek-based
  * [[graft.sources.Fai.IndexedFasta]] handle (IndexedFastaFile analog —
  * no whole-genome memory, one seek per extract). */
trait ReferenceSource extends Serializable {
  def extract(region: ReferenceRegion): String
}

/** Random-access reference genome held driver-side and broadcast
  * (SURVEY.md §2.1: util/ReferenceFile.scala:32, TwoBitFile.scala:59,
  * IndexedFastaFile.scala in the reference). Backed by an in-memory contig
  * map built from FASTA — the broadcast pattern is identical; a 2bit
  * packed representation is a storage detail behind the same interface. */
case class ReferenceContigs(contigs: Map[String, String]) extends ReferenceSource {

  /** Bases for a region (clamped to the contig). */
  def extract(region: ReferenceRegion): String = {
    val seq = contigs.getOrElse(region.referenceName,
      throw new NoSuchElementException(s"Unknown contig ${region.referenceName}"))
    val s = math.max(0L, region.start).toInt
    val e = math.min(seq.length.toLong, region.end).toInt
    if (e <= s) "" else seq.substring(s, e)
  }

  def length(referenceName: String): Long =
    contigs.get(referenceName).map(_.length.toLong).getOrElse(0L)
}

object ReferenceContigs {

  /** Load from FASTA via the distributed reader, collected driver-side
    * (a genome reference is bounded; the reference does the same with
    * TwoBitFile — loadReferenceFile, ADAMContext.scala:3492-3518). */
  def fromFasta(spark: SparkSession, path: String): ReferenceContigs =
    ReferenceContigs(
      graft.sources.SequenceIO.readFasta(spark, path).collect()
        .flatMap(s => s.name.zip(s.sequence)).toMap)

  def broadcastFrom(spark: SparkSession, contigs: ReferenceContigs): Broadcast[ReferenceContigs] =
    spark.sparkContext.broadcast(contigs)
}
