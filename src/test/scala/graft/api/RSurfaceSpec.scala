package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** r/graft/R/graft.R calls `graft.api.JavaApi` via SparkR's reflective
  * backend, so — exactly like the Python wrapper (PythonSurfaceSpec) — a
  * facade rename or arity change breaks R callers at runtime. This spec
  * parses every `sparkR.callJStatic(.jvm, "method", args...)` invocation
  * out of the R source (paren-depth-aware argument counting) and asserts
  * the (name, arity) pair exists on JavaApi. The container has no R
  * runtime, so this static pin is the contract check; it also catches the
  * reverse drift (an R file calling a method that was never added). */
class RSurfaceSpec extends AnyFunSuite {

  /** (method, argCount) for each callJStatic in the R source; argCount
    * excludes the class-name and method-name arguments. */
  private def calledSurface(src: String): Seq[(String, Int)] = {
    val marker = "callJStatic(.jvm,"
    Iterator.iterate(src.indexOf(marker))(i =>
      src.indexOf(marker, i + 1)).takeWhile(_ >= 0).map { at =>
      val open = at + "callJStatic".length // the '(' opening the call
      var depth = 0
      var i = open
      var commas = 0
      var done = false
      while (!done) {
        src(i) match {
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) done = true
          case ',' if depth == 1 => commas += 1
          case _ =>
        }
        i += 1
      }
      // args = commas (".jvm" is before the first comma we count from the
      // method-name string onward): total segments = commas + 1 =
      // [.jvm, "method", a1..an] => n = commas - 1
      val m = """"(\w+)"""".r.findFirstMatchIn(src.substring(open, i)).get
      (m.group(1), commas - 1)
    }.toSeq
  }

  test("JavaApi exposes every (method, arity) the R wrapper calls") {
    val src = scala.io.Source.fromFile("r/graft/R/graft.R", "UTF-8").mkString
    val called = calledSurface(src)
    assert(called.size >= 40, s"R surface unexpectedly small: ${called.size}")
    val surface = graft.api.JavaApi.getClass.getMethods
      .map(m => m.getName -> m.getParameterCount).toSet
    called.foreach { e =>
      assert(surface.contains(e), s"JavaApi missing R-called method $e")
    }
    // every R-visible function name follows the graft. prefix contract
    // claimed by NAMESPACE's exportPattern
    val fnNames = """(?m)^([A-Za-z.][\w.]*)\s*<-\s*function""".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    val public = fnNames.filterNot(_.startsWith("."))
    assert(public.nonEmpty && public.forall(_.startsWith("graft.")), public)
  }

  test("the arg counter handles nested calls") {
    val sample =
      """x <- function(a) {
        |  .gdf(SparkR::sparkR.callJStatic(.jvm, "foo", a@sdf,
        |                                  as.integer(f(1, 2)), "s"))
        |}""".stripMargin
    assert(calledSurface(sample) == Seq(("foo", 3)))
  }
}
