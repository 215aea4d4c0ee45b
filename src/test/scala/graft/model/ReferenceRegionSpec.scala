package graft.model

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Region algebra unit + randomized property tests (laws the reference
  * exercises in models/ReferenceRegionSuite; the randomized properties are
  * our addition — SURVEY.md §5). Seeded RNG → deterministic. */
class ReferenceRegionSpec extends AnyFunSuite {

  private def randomRegions(n: Int, seed: Long): Seq[ReferenceRegion] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val ref = if (rnd.nextBoolean()) "chr1" else "chr2"
      val start = rnd.nextLong(1000L)
      ReferenceRegion(ref, start, start + 1 + rnd.nextLong(100L))
    }
  }

  test("overlap basics") {
    val a = ReferenceRegion("chr1", 10, 20)
    assert(a.overlaps(ReferenceRegion("chr1", 19, 25)))
    assert(!a.overlaps(ReferenceRegion("chr1", 20, 25))) // half-open
    assert(!a.overlaps(ReferenceRegion("chr2", 10, 20)))
    assert(a.isAdjacent(ReferenceRegion("chr1", 20, 30)))
    assert(a.overlapsBy(ReferenceRegion("chr1", 15, 25)).contains(5L))
    assert(a.contains(ReferenceRegion("chr1", 12, 18)))
    assert(!a.contains(ReferenceRegion("chr1", 12, 21)))
  }

  test("distance and nearby (reference semantics: overlap->0, abut->1)") {
    val a = ReferenceRegion("chr1", 10, 20)
    // min point-to-point distance: last base 19 to first base 30 = 11
    assert(a.distance(ReferenceRegion("chr1", 30, 40)).contains(11L))
    assert(a.distance(ReferenceRegion("chr1", 20, 30)).contains(1L)) // abutting
    assert(a.distance(ReferenceRegion("chr2", 30, 40)).isEmpty)
    assert(a.distance(ReferenceRegion("chr1", 15, 25)).contains(0L))
    assert(a.isNearby(ReferenceRegion("chr1", 25, 30), 6L))
    assert(!a.isNearby(ReferenceRegion("chr1", 26, 30), 6L))
  }

  test("stranded algebra: overlaps requires strand, covers ignores it") {
    val fwd = ReferenceRegion("chr1", 10, 20, Strand.Forward)
    val rev = ReferenceRegion("chr1", 15, 25, Strand.Reverse)
    assert(!fwd.overlaps(rev) && fwd.covers(rev))
    assert(fwd.distance(rev).isEmpty)
    assert(fwd.unstrandedDistance(rev).contains(0L))
    assert(!fwd.isNearby(rev, 10L))
    assert(fwd.isNearby(rev, 10L, requireStranded = false))
    val farRev = ReferenceRegion("chr1", 25, 30, Strand.Reverse)
    assert(fwd.unstrandedDistance(farRev).contains(6L))
    assert(fwd.covers(farRev, 6L) && !fwd.covers(farRev, 5L))
  }

  test("pad floors at zero") {
    assert(ReferenceRegion("chr1", 3, 10).pad(5) == ReferenceRegion("chr1", 0, 15))
  }

  test("subtract fragments") {
    val a = ReferenceRegion("chr1", 10, 30)
    assert(a.subtract(ReferenceRegion("chr1", 15, 20)) ==
      Seq(ReferenceRegion("chr1", 10, 15), ReferenceRegion("chr1", 20, 30)))
    assert(a.subtract(ReferenceRegion("chr1", 0, 15)) ==
      Seq(ReferenceRegion("chr1", 15, 30)))
    assert(a.subtract(ReferenceRegion("chr1", 0, 40)).isEmpty)
    assert(a.subtract(ReferenceRegion("chr2", 0, 40)) == Seq(a))
  }

  test("bins cover the interval") {
    val r = ReferenceRegion("chr1", 9999, 20001)
    assert(r.bins(10000L) == (0 to 2))
    assert(ReferenceRegion("chr1", 0, 1).bins(10000L) == (0 to 0))
    assert(ReferenceRegion("chr1", 10000, 10001).bins(10000L) == (1 to 1))
  }

  test("property: overlap symmetric; hull/intersection laws; subtract partitions") {
    val rs = randomRegions(200, seed = 42)
    for (a <- rs; b <- rs.take(50)) {
      assert(a.overlaps(b) == b.overlaps(a))
      if (a.referenceName == b.referenceName) {
        val h = a.hull(b)
        assert(h.contains(a) && h.contains(b))
        if (a.overlaps(b)) {
          val i = a.intersection(b)
          assert(a.contains(i) && b.contains(i))
          assert(a.overlapsBy(b).contains(i.width))
          assert(a.subtract(b).map(_.width).sum + i.width == a.width)
        }
      }
    }
  }

  test("property: mergeSorted is non-overlapping and covers input") {
    val sorted = randomRegions(300, seed = 7).sorted
    val merged = ReferenceRegion.mergeSorted(sorted)
    merged.sliding(2).foreach {
      case Seq(x, y) =>
        if (x.referenceName == y.referenceName)
          assert(!x.overlaps(y) && !x.isAdjacent(y))
      case _ =>
    }
    assert(sorted.forall(r => merged.exists(_.contains(r))))
  }

  test("sequence dictionary union laws") {
    val d1 = SequenceDictionary(Seq(SequenceRecord("chr1", 100)))
    val d2 = SequenceDictionary(Seq(
      SequenceRecord("chr1", 100), SequenceRecord("chr2", 200)))
    assert((d1 ++ d2).records.map(_.name) == Seq("chr1", "chr2"))
    assertThrows[IllegalArgumentException] {
      d1 ++ SequenceDictionary(Seq(SequenceRecord("chr1", 999)))
    }
  }
}
