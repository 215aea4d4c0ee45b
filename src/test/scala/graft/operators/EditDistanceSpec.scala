package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PassJoin edit-distance near-dup join: completeness proven against a
  * local brute-force over every pair (the blocking must never LOSE a pair
  * — that is the theorem being exercised, not just the happy path). */
class EditDistanceSpec extends SparkSpec {

  /** Classic DP Levenshtein, the local ground truth. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def bruteForce(
      strs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- strs
      (ib, sb) <- strs
      if ia < ib
      dist = lev(sa, sb)
      if dist <= d
    } yield (ia, ib, dist)).toSet

  private def run(strs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    DedupOps.editDistanceNearDuplicates(
      strs.toDF("doc_id", "s"), "doc_id", "s", maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("passJoinSegments: longer segments first, exact cover") {
    assert(DedupOps.passJoinSegments(10, 2).toSeq ==
      Seq((0, 4), (4, 3), (7, 3)))
    assert(DedupOps.passJoinSegments(9, 2).toSeq ==
      Seq((0, 3), (3, 3), (6, 3)))
    assert(DedupOps.passJoinSegments(2, 2).toSeq ==
      Seq((0, 1), (1, 1), (2, 0)))
  }

  test("finds exactly the brute-force pair set on adversarial edits") {
    val strs = Seq(
      1L -> "abcdefghij",
      2L -> "abcdefghij",   // dist 0
      3L -> "abcdefghi",    // deletion at end
      4L -> "Xbcdefghij",   // substitution at head (first segment touched)
      5L -> "abcdeYghij",   // substitution mid
      6L -> "abZcdefghij",  // insertion early (shifts all later segments)
      7L -> "abcdefghijKL", // two insertions at end
      8L -> "zyxwvutsrq",   // far
      9L -> "abcdefclose",  // dist > 2 from 1
      10L -> "ab")          // short string, segments of len 1/1/0
    assert(run(strs, 2) == bruteForce(strs, 2))
  }

  test("completeness on a deterministic random corpus (200 strings, d=2)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc" // small alphabet forces many near pairs
    def randStr(n: Int) = (0 until n).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString
    val strs = (1L to 200L).map(i => i -> randStr(4 + rnd.nextInt(8)))
    val expected = bruteForce(strs, 2)
    assert(expected.nonEmpty) // the fixture must actually exercise pairs
    assert(run(strs, 2) == expected)
  }

  test("d=1 tighter radius") {
    val strs = Seq(1L -> "hello", 2L -> "hallo", 3L -> "hxllx", 4L -> "help")
    assert(run(strs, 1) == bruteForce(strs, 1))
  }
}
