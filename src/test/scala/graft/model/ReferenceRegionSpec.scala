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

  test("distance and nearby") {
    val a = ReferenceRegion("chr1", 10, 20)
    assert(a.distance(ReferenceRegion("chr1", 30, 40)).contains(10L))
    assert(a.distance(ReferenceRegion("chr2", 30, 40)).isEmpty)
    assert(a.distance(ReferenceRegion("chr1", 15, 25)).contains(0L))
    assert(a.isNearby(ReferenceRegion("chr1", 25, 30), 5L))
    assert(!a.isNearby(ReferenceRegion("chr1", 26, 30), 5L))
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
