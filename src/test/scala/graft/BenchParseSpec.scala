package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for the round-14 bench-guard bug: the committed
  * record was pretty-printed and the timing regex required `":<num>`
  * with no whitespace, so the baseline guard compared an EMPTY common
  * set and silently no-oped. Both record layouts must parse. */
class BenchParseSpec extends AnyFunSuite {

  test("parseQueryTimings reads single-line and pretty-printed records") {
    val flat = """{"metric":"total","value":1.5,"unit":"sec",""" +
      """"queries":{"q01_a":0.5,"q98_b":1.0E-1},"errors":{}}"""
    assert(Bench.parseQueryTimings(flat) ==
      Map("q01_a" -> 0.5, "q98_b" -> 0.1))
    val pretty =
      """{
        | "metric": "total",
        | "value": 1.5,
        | "queries": {
        |  "q01_a": 0.5,
        |  "q98_b": 1.0E-1
        | },
        | "errors": {}
        |}""".stripMargin
    assert(Bench.parseQueryTimings(pretty) ==
      Map("q01_a" -> 0.5, "q98_b" -> 0.1))
    // non-query keys (value, n_queries) never leak into the map
    assert(!Bench.parseQueryTimings(pretty).contains("value"))
  }

  test("the committed round-14 record parses to its full catalog") {
    val f = new java.io.File("BENCH_LOCAL_r14.json")
    assume(f.exists())
    val src = scala.io.Source.fromFile(f)
    val txt = try src.mkString finally src.close()
    val qs = Bench.parseQueryTimings(txt)
    assert(qs.size == 217, s"expected 217 queries, parsed ${qs.size}")
    assert(qs.keys.forall(_.startsWith("q")))
  }
}
