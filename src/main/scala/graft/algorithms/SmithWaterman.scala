package graft.algorithms

/** Smith-Waterman local pairwise alignment (the public 1981 algorithm;
  * reference implementation shape: algorithms/smithwaterman/
  * SmithWaterman.scala:201 with constant gap scoring). Used per-group
  * inside realignment — never distributed itself (SURVEY.md §2.9).
  */
object SmithWaterman {

  case class Alignment(
      score: Double,
      xStart: Int, yStart: Int,
      xEnd: Int, yEnd: Int,
      cigarX: String, cigarY: String)

  /** Align x (e.g. read) against y (e.g. reference window).
    * Default scores mirror the reference's ConsensusGenerator usage
    * (wMatch=1, wMismatch=-0.333..., wInsert/wDelete=-0.5 — values from
    * SmithWatermanConstantGapScoring defaults in the reference). */
  def align(
      x: String, y: String,
      wMatch: Double = 1.0, wMismatch: Double = -1.0 / 3.0,
      wInsert: Double = -0.5, wDelete: Double = -0.5): Alignment = {

    val n = x.length; val m = y.length
    val score = Array.ofDim[Double](n + 1, m + 1)
    val move = Array.ofDim[Byte](n + 1, m + 1) // 0 stop, 1 diag, 2 up(x gap... ins), 3 left
    var best = 0.0; var bi = 0; var bj = 0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val sub = score(i - 1)(j - 1) +
          (if (Character.toUpperCase(x.charAt(i - 1)) ==
            Character.toUpperCase(y.charAt(j - 1))) wMatch else wMismatch)
        val ins = score(i - 1)(j) + wInsert // consumes x only
        val del = score(i)(j - 1) + wDelete // consumes y only
        var s = 0.0; var mv: Byte = 0
        if (sub > s) { s = sub; mv = 1 }
        if (ins > s) { s = ins; mv = 2 }
        if (del > s) { s = del; mv = 3 }
        score(i)(j) = s; move(i)(j) = mv
        if (s > best) { best = s; bi = i; bj = j }
        j += 1
      }
      i += 1
    }

    // traceback
    val opsX = new StringBuilder; val opsY = new StringBuilder
    var ci = bi; var cj = bj
    while (ci > 0 && cj > 0 && move(ci)(cj) != 0) {
      move(ci)(cj) match {
        case 1 => opsX.append('M'); opsY.append('M'); ci -= 1; cj -= 1
        case 2 => opsX.append('I'); opsY.append('D'); ci -= 1
        case 3 => opsX.append('D'); opsY.append('I'); cj -= 1
      }
    }

    def toCigar(ops: String): String = {
      if (ops.isEmpty) return ""
      val rev = ops.reverse
      val sb = new StringBuilder
      var run = 1
      var k = 1
      while (k <= rev.length) {
        if (k < rev.length && rev.charAt(k) == rev.charAt(k - 1)) run += 1
        else { sb.append(run); sb.append(rev.charAt(k - 1)); run = 1 }
        k += 1
      }
      sb.toString
    }

    Alignment(best, ci, cj, bi, bj, toCigar(opsX.toString), toCigar(opsY.toString))
  }
}
