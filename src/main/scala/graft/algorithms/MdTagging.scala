package graft.algorithms

import org.apache.spark.sql.{Dataset, Encoders}
import graft.core.{ReferenceContigs, ReferenceSource}
import graft.functions.GenomicFunctions
import graft.model.{Alignment, Cigar, ReferenceRegion}

/** MD-tag computation against a broadcast reference
  * (computeMismatchingPositions, AlignmentDataset.scala:1320-1357;
  * ds/read/MDTagging.scala:41-93). Per-row map with the reference genome
  * broadcast once — no shuffle. */
object MdTagging {

  private implicit val alignEnc: org.apache.spark.sql.Encoder[Alignment] =
    Encoders.product[Alignment]

  def tagReads(
      reads: Dataset[Alignment],
      reference: ReferenceSource,
      overwrite: Boolean = true): Dataset[Alignment] = {
    val refB = reads.sparkSession.sparkContext.broadcast(reference)
    reads.map { r =>
      val ok = r.readMapped.getOrElse(false) && r.cigar.isDefined &&
        r.sequence.isDefined && r.referenceName.isDefined && r.start.isDefined &&
        (overwrite || r.mismatchingPositions.isEmpty)
      if (!ok) r
      else {
        val refLen = Cigar.referenceLength(r.cigar.get)
        val window = refB.value.extract(ReferenceRegion(
          r.referenceName.get, r.start.get, r.start.get + refLen))
        if (window.length < refLen) r // read hangs off the contig: skip
        else r.copy(mismatchingPositions = Some(
          GenomicFunctions.buildMdTag(r.sequence.get, r.cigar.get, window)))
      }
    }
  }
}
