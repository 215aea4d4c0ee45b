package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 fifth batch vs hand references: JSON key profiling and
  * per-group distribution moments. */
class Round13eOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------
  // jsonKeyProfile
  // ------------------------------------------------------------------

  test("jsonKeyProfile: key presence, type census, cardinality, and " +
      "malformed accounting on a hand corpus") {
    import spark.implicits._
    val rows = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2.5, "b": "x", "c": true}""",
      """{"a": null, "d": [1, 2]}""",
      """{"a": "1e3"}""",   // a quoted numeric STRING classifies as num
      "not json",
      null.asInstanceOf[String])
    val got = ProfileOps.jsonKeyProfile(rows.toDF("j"), "j")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    def f(r: org.apache.spark.sql.Row, n: String) =
      r.getLong(r.schema.fieldNames.indexOf(n))
    assert(f(a, "n_present") == 4L)
    assert(f(a, "n_rows") == 6L && f(a, "n_bad") == 2L)
    assert(f(a, "present_permille") == 666L)
    assert(f(a, "n_null") == 1L)
    // values "1", "2.5", "1e3" all classify as numbers (string-census
    // semantics: the profiler sees value text, not JSON types)
    assert(f(a, "n_num") == 3L)
    assert(f(a, "n_distinct") == 3L, "null excluded from distinct")
    val b = got("b")
    assert(f(b, "n_present") == 2L && f(b, "n_str") == 2L &&
      f(b, "n_distinct") == 1L)
    assert(f(got("c"), "n_bool") == 1L)
    assert(f(got("d"), "n_nested") == 1L)
  }

  test("jsonKeyProfile: all-malformed input yields no key rows, not a " +
      "crash") {
    import spark.implicits._
    val got = ProfileOps.jsonKeyProfile(
      Seq("{{", "nope").toDF("j"), "j").collect()
    assert(got.isEmpty)
  }

  // ------------------------------------------------------------------
  // momentsByGroup
  // ------------------------------------------------------------------

  test("momentsByGroup: symmetric data has skew exactly 0 by the " +
      "replayed chain; a right tail skews positive; flats are NULL") {
    import spark.implicits._
    // symmetric around 20: {10, 20, 30}; right-tailed: {1,1,1,97}
    val rows = Seq(("s", 10L), ("s", 20L), ("s", 30L),
      ("t", 1L), ("t", 1L), ("t", 1L), ("t", 97L),
      ("flat", 5L), ("flat", 5L), ("one", 9L))
    val got = Stats.momentsByGroup(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    def chain(xs: Seq[Long]): (Double, Double, Double, Double) = {
      val n = xs.size.toDouble
      val (s1, s2, s3, s4) = (xs.map(BigInt(_)).sum,
        xs.map(x => BigInt(x) * x).sum,
        xs.map(x => BigInt(x) * x * x).sum,
        xs.map(x => BigInt(x) * x * x * x).sum)
      val mu = s1.toDouble / n
      val m2 = s2.toDouble / n - mu * mu
      val m3 = s3.toDouble / n - 3.0 * mu * (s2.toDouble / n) +
        2.0 * mu * mu * mu
      val m4 = s4.toDouble / n - 4.0 * mu * (s3.toDouble / n) +
        6.0 * mu * mu * (s2.toDouble / n) - 3.0 * mu * mu * mu * mu
      (mu, m2, m3 / math.sqrt(m2 * m2 * m2), m4 / (m2 * m2) - 3.0)
    }
    val (mu, m2, sk, ku) = chain(Seq(10L, 20L, 30L))
    val s = got("s")
    assert(s.getDouble(2) == mu && s.getDouble(3) == m2)
    assert(s.getDouble(4) == sk, "bit-for-bit vs the replayed chain")
    assert(math.abs(sk) < 1e-10, "symmetric data: skew ~ 0 (the chain " +
      "carries r2's 1400/3 rounding, so not a hard 0.0)")
    assert(s.getDouble(5) == ku)
    val (_, _, skT, _) = chain(Seq(1L, 1L, 1L, 97L))
    assert(got("t").getDouble(4) == skT && skT > 1.0)
    assert(got("flat").isNullAt(4) && got("flat").isNullAt(5))
    assert(got("one").isNullAt(4), "n < 2 shape is NULL")
  }
}
