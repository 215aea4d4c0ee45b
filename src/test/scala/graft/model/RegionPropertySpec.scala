package graft.model

import org.scalacheck.{Gen, Prop, Properties}
import Prop.{forAll, propBoolean}

/** ScalaCheck property laws for the region algebra (SURVEY §5: the
  * reference has no property tests — these pin the interval semantics the
  * join rewrite and coverage operators depend on). */
object RegionPropertySpec extends Properties("ReferenceRegion") {

  private val genRegion: Gen[ReferenceRegion] = for {
    ref <- Gen.oneOf("chr1", "chr2")
    start <- Gen.choose(0L, 1000L)
    width <- Gen.choose(1L, 200L)
  } yield ReferenceRegion(ref, start, start + width)

  private val genStranded: Gen[ReferenceRegion] = for {
    r <- genRegion
    s <- Gen.oneOf(Strand.Forward, Strand.Reverse, Strand.Independent)
  } yield r.copy(strand = s)

  property("overlap symmetric; overlap implies same contig") =
    forAll(genRegion, genRegion) { (a, b) =>
      a.overlaps(b) == b.overlaps(a) &&
        (!a.overlaps(b) || a.referenceName == b.referenceName)
    }

  property("intersection contained in both, width = overlapsBy") =
    forAll(genRegion, genRegion) { (a, b) =>
      !a.overlaps(b) || {
        val i = a.intersection(b)
        a.contains(i) && b.contains(i) && i.width == a.overlapsBy(b).get
      }
    }

  property("merge/hull contain both inputs") =
    forAll(genRegion, genRegion) { (a, b) =>
      (a.referenceName != b.referenceName) || {
        val h = a.hull(b)
        val hullOk = h.contains(a) && h.contains(b)
        val mergeOk = !(a.overlaps(b) || a.isAdjacent(b)) || {
          val m = a.merge(b)
          m.contains(a) && m.contains(b) && m.width <= a.width + b.width
        }
        hullOk && mergeOk
      }
    }

  property("subtract removes exactly the intersection") =
    forAll(genRegion, genRegion) { (a, b) =>
      (a.referenceName != b.referenceName) || {
        val parts = a.subtract(b)
        val disjoint = parts.forall(p => !p.overlaps(b) && a.contains(p))
        val removed = if (a.overlaps(b)) a.overlapsBy(b).get else 0L
        disjoint && parts.map(_.width).sum == a.width - removed
      }
    }

  property("distance symmetric; overlap -> 0; adjacency -> 1") =
    forAll(genRegion, genRegion) { (a, b) =>
      a.distance(b) == b.distance(a) &&
        (!a.overlaps(b) || a.distance(b).contains(0L)) &&
        (!a.isAdjacent(b) || a.distance(b).contains(1L))
    }

  property("stranded laws: overlaps = sameStrand && covers; distances consistent") =
    forAll(genStranded, genStranded) { (a, b) =>
      val strandOk = a.overlaps(b) == (a.strand == b.strand && a.covers(b))
      val coversSym = a.covers(b) == b.covers(a)
      val unstrandedSym = a.unstrandedDistance(b) == b.unstrandedDistance(a)
      // stranded distance defined only on same strand; equals unstranded there
      val distLaw =
        if (a.strand == b.strand) a.distance(b) == a.unstrandedDistance(b)
        else a.distance(b).isEmpty
      // unstranded distance 0 exactly when the intervals share a base
      val zeroLaw = (a.referenceName != b.referenceName) ||
        (a.unstrandedDistance(b).contains(0L) == a.covers(b))
      strandOk && coversSym && unstrandedSym && distLaw && zeroLaw
    }

  property("pad contains original; width grows by both pads") =
    forAll(genRegion, Gen.choose(0L, 50L)) { (r, by) =>
      val p = r.pad(by)
      p.contains(r) && (p.width == r.width + 2 * by || p.start == 0L)
    }

  property("bins span from start bin to last-base bin") =
    forAll(genRegion, Gen.oneOf(10L, 100L, 1000L)) { (r, binSize) =>
      val bs = r.bins(binSize)
      bs.head == r.start / binSize && bs.last == (r.end - 1) / binSize
    }

  property("overlapping regions share a bin (join-rewrite kernel)") =
    forAll(genRegion, genRegion, Gen.oneOf(10L, 100L, 1000L)) { (a, b, binSize) =>
      !a.overlaps(b) ||
        a.bins(binSize).toSet.intersect(b.bins(binSize).toSet).nonEmpty
    }

  property("mergeSorted: disjoint, ordered, coverage-preserving") =
    forAll(Gen.listOfN(20, genRegion)) { rs =>
      val sorted = rs.sortBy(r => (r.referenceName, r.start, r.end))
      val merged = ReferenceRegion.mergeSorted(sorted)
      val pairwiseOk = merged.sliding(2).forall {
        case Seq(x, y) if x.referenceName == y.referenceName =>
          !x.overlaps(y) && !x.isAdjacent(y) && x.start <= y.start
        case _ => true
      }
      pairwiseOk && rs.forall(r => merged.exists(_.contains(r)))
    }
}
