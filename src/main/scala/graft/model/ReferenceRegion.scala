package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Strand of a genomic interval. Mirrors the semantics of the reference's
  * strand enum (reference: bdg-formats Strand; used throughout
  * adam-core/src/main/scala/org/bdgenomics/adam/models/ReferenceRegion.scala).
  */
sealed trait Strand extends Serializable { def symbol: String }
object Strand {
  case object Forward extends Strand { val symbol = "+" }
  case object Reverse extends Strand { val symbol = "-" }
  case object Independent extends Strand { val symbol = "." }
  def fromSymbol(s: String): Strand = s match {
    case "+" => Forward
    case "-" => Reverse
    case _   => Independent
  }
}

/** 0-based, half-open genomic interval with a full interval algebra.
  *
  * Re-expression of the reference's coordinate model
  * (adam-core/.../models/ReferenceRegion.scala:411-768 — merge:439,
  * intersection:469, hull:485, isAdjacent:499, isNearby:514, distance:534,
  * overlapsBy:578, pad:612, contains:635, covers:648, overlaps:671,
  * compareTo:693, subtract:733). Pure Scala; the columnar twin lives in
  * [[RegionColumns]] so Catalyst can push the same predicates down to parquet.
  */
case class ReferenceRegion(
    referenceName: String,
    start: Long,
    end: Long,
    strand: Strand = Strand.Independent)
  extends Ordered[ReferenceRegion] with Serializable {

  require(start >= 0 && end >= start, s"Invalid region [$start,$end)")

  def width: Long = end - start
  def isEmpty: Boolean = width == 0

  /** Strict strand equality (reference ReferenceRegion.sameStrand:703). */
  def sameStrand(o: ReferenceRegion): Boolean = strand == o.strand

  def sameReferenceName(o: ReferenceRegion): Boolean =
    referenceName == o.referenceName

  private def sameContig(o: ReferenceRegion): Boolean =
    sameReferenceName(o) && sameStrand(o)

  /** Strand-independent overlap: the two half-open intervals share at least
    * one base on the same reference sequence (reference covers:648). */
  def covers(o: ReferenceRegion): Boolean =
    sameReferenceName(o) && start < o.end && o.start < end

  /** Covers, or within `threshold` ignoring strand (reference covers:661). */
  def covers(o: ReferenceRegion, threshold: Long): Boolean =
    isNearby(o, threshold, requireStranded = false)

  /** True iff the intervals share a base AND are on the same strand
    * (reference overlaps:671 = sameStrand && covers). */
  def overlaps(o: ReferenceRegion): Boolean = sameStrand(o) && covers(o)

  /** Overlaps, or within `threshold` on the same strand (reference :683). */
  def overlaps(o: ReferenceRegion, threshold: Long): Boolean =
    isNearby(o, threshold)

  /** Number of overlapping bases, if any. */
  def overlapsBy(o: ReferenceRegion): Option[Long] =
    if (overlaps(o)) Some(math.min(end, o.end) - math.max(start, o.start)) else None

  /** True iff this region fully contains the other. */
  def contains(o: ReferenceRegion): Boolean =
    sameContig(o) && start <= o.start && o.end <= end

  def contains(refName: String, pos: Long): Boolean =
    referenceName == refName && start <= pos && pos < end

  /** Abut without overlapping — defined via distance, exactly as the
    * reference does (isAdjacent:499 = distance.contains(1)). */
  def isAdjacent(o: ReferenceRegion): Boolean = distance(o).contains(1L)

  /** Minimum distance between any point of this region and any point of the
    * other: overlap -> 0, abutting -> 1, else greater (reference
    * distance:534). None on different contigs or strands. */
  def distance(o: ReferenceRegion): Option[Long] =
    if (!sameContig(o)) None
    else if (overlaps(o)) Some(0L)
    else Some(math.max(start, o.start) - math.min(end, o.end) + 1)

  /** [[distance]] ignoring strand (reference unstrandedDistance:558). */
  def unstrandedDistance(o: ReferenceRegion): Option[Long] =
    if (!sameReferenceName(o)) None
    else if (covers(o)) Some(0L)
    else Some(math.max(start, o.start) - math.min(end, o.end) + 1)

  /** Within `threshold` bases (the flank/as-of tolerance used by the
    * reference's joins; reference isNearby:514). Distance counts abutting
    * as 1, so `isNearby(o, k)` admits gaps of at most k-1 bases. */
  def isNearby(o: ReferenceRegion, threshold: Long,
               requireStranded: Boolean = true): Boolean =
    distance(o).exists(_ <= threshold) ||
      (!requireStranded && unstrandedDistance(o).exists(_ <= threshold))

  /** Union of two overlapping-or-adjacent regions. */
  def merge(o: ReferenceRegion): ReferenceRegion = {
    require(overlaps(o) || isAdjacent(o), s"Cannot merge non-touching $this / $o")
    hull(o)
  }

  /** Smallest region covering both (contigs must match). */
  def hull(o: ReferenceRegion): ReferenceRegion = {
    require(sameContig(o), s"Cannot hull across contigs $this / $o")
    ReferenceRegion(referenceName, math.min(start, o.start), math.max(end, o.end), strand)
  }

  def intersection(o: ReferenceRegion): ReferenceRegion = {
    require(overlaps(o), s"Cannot intersect non-overlapping $this / $o")
    ReferenceRegion(referenceName, math.max(start, o.start), math.min(end, o.end), strand)
  }

  /** This region minus the other; 0, 1 or 2 fragments. */
  def subtract(o: ReferenceRegion): Seq[ReferenceRegion] =
    if (!overlaps(o)) Seq(this)
    else {
      val left =
        if (start < o.start) Some(copy(end = o.start)) else None
      val right =
        if (o.end < end) Some(copy(start = o.end)) else None
      (left ++ right).toSeq
    }

  /** Symmetric pad by `by` bases, floored at 0. */
  def pad(by: Long): ReferenceRegion = pad(by, by)

  def pad(byStart: Long, byEnd: Long): ReferenceRegion =
    ReferenceRegion(referenceName, math.max(0L, start - byStart), end + byEnd, strand)

  /** Lexicographic (referenceName, start, end) ordering — the engine's sort
    * key (reference ReferenceRegion.compareTo:693). */
  override def compare(o: ReferenceRegion): Int = {
    val c = referenceName.compareTo(o.referenceName)
    if (c != 0) c
    else if (start != o.start) java.lang.Long.compare(start, o.start)
    else java.lang.Long.compare(end, o.end)
  }

  /** Bin ids this region touches at bin width `binSize` — the key domain of
    * the binned interval join (SURVEY.md §2.4 mapping). */
  def bins(binSize: Long): Range.Inclusive =
    (start / binSize).toInt to ((math.max(start, end - 1)) / binSize).toInt
}

object ReferenceRegion {
  /** Merge a sorted-by-(name,start) sequence, fusing touching intervals —
    * driver-side twin of the distributed collapse in
    * [[graft.operators.CoverageOps.collapse]]. */
  def mergeSorted(rs: Seq[ReferenceRegion]): Seq[ReferenceRegion] =
    rs.foldLeft(List.empty[ReferenceRegion]) {
      case (acc @ (h :: t), r) if h.overlaps(r) || h.isAdjacent(r) => h.merge(r) :: t
      case (acc, r) => r :: acc
    }.reverse
}

/** Column-expression twins of the region algebra, so the same predicates run
  * inside whole-stage codegen and push down to parquet scans (SURVEY.md §1.4
  * "Spark mapping"; reference pushdown: models/ReferenceRegion.scala:392-409).
  */
object RegionColumns {
  /** Overlap predicate between (name1,start1,end1) and (name2,start2,end2). */
  def overlaps(name1: Column, start1: Column, end1: Column,
               name2: Column, start2: Column, end2: Column): Column =
    name1 === name2 && start1 < end2 && start2 < end1

  /** Region filter usable directly on a dataset with
    * referenceName/start/end columns — pushed down by Catalyst. */
  def overlapsRegion(r: ReferenceRegion): Column =
    col("referenceName") === lit(r.referenceName) &&
      col("start") < lit(r.end) && col("end") > lit(r.start)

  /** Disjunction filter for a set of query regions. */
  def overlapsAny(rs: Seq[ReferenceRegion]): Column =
    rs.map(overlapsRegion).reduceLeft(_ || _)

  /** All bin ids a [start,end) interval touches, as an array column —
    * `explode` of this is the binned-join key (SURVEY.md §2.4). */
  def binsOf(start: Column, end: Column, binSize: Long): Column =
    sequence(
      (start / binSize).cast("long"),
      (greatest(start, end - 1) / binSize).cast("long"))
}
