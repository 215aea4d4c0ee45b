package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §7 step 10 extensions). All per-row column expressions —
  * zero shuffles, full whole-stage codegen, trivially scale to 100 TB.
  *
  * Oracle-friendliness: every function here is also expressible in ANSI SQL
  * (see the paired entries in graft.SparkEntry.oracleSql), so the driver's
  * DuckDB harness can hash-match the results. Ratios are int/int divisions
  * in IEEE double — bit-identical across engines.
  */
object TextOps {

  /** Whitespace token count. `size(split(trim(x), '\\s+'))`, with empty →
    * 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Count of characters matching a single-char regex class: length minus
    * length after deleting the matches. */
  private def countMatches(text: Column, pattern: String): Column =
    length(text) - length(regexp_replace(text, pattern, ""))

  /** Quality-score feature columns: length, tokens, punctuation ratio,
    * digit ratio, uppercase ratio, whitespace ratio. Ratios are int/int
    * divisions in double — bit-exact across engines. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text),
    "n_tokens" -> tokenCount(text),
    "punct_ratio" ->
      countMatches(text, "[.,;:!?'\"()-]").cast("double") / length(text),
    "digit_ratio" ->
      countMatches(text, "[0-9]").cast("double") / length(text),
    "upper_ratio" ->
      countMatches(text, "[A-Z]").cast("double") / length(text),
    "ws_ratio" ->
      countMatches(text, "[ ]").cast("double") / length(text)
  )

  /** Composite heuristic quality score in [0,1] — long-enough, mostly
    * letters, sane punctuation. Modeled on public C4/Gopher-style filters. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenOk = when(f("n_chars") >= 200 && f("n_chars") <= 20000, 1.0).otherwise(0.0)
    val punctOk = when(f("punct_ratio") <= 0.1, 1.0).otherwise(0.0)
    val digitOk = when(f("digit_ratio") <= 0.2, 1.0).otherwise(0.0)
    val upperOk = when(f("upper_ratio") <= 0.3, 1.0).otherwise(0.0)
    (lenOk + punctOk + digitOk + upperOk) / 4.0
  }

  /** Stopword-evidence language ID. Counts occurrences of high-frequency
    * function words per language (padded with spaces so they only match as
    * whole words) and argmaxes with a fixed preference order — a standard
    * public n-gram/stopword heuristic (cf. CLD/langid literature). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is ", " of "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "es" -> Seq(" el ", " los ", " es ", " y "))

  def langScore(text: Column, markers: Seq[String]): Column = {
    // occurrences(kw) = (len(t) - len(replace(t, kw, ''))) / len(kw);
    // pure integer arithmetic → engine-portable.
    // `replace` (literal, not regex) matches DuckDB's replace() exactly —
    // both remove left-to-right non-overlapping occurrences.
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map { kw =>
      (length(padded) - length(replace(padded, lit(kw), lit("")))) / kw.length
    }.reduce(_ + _)
  }

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, kws) => lang -> langScore(text, kws) }
    // Deterministic argmax: first language in declaration order wins ties.
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * The exact-dedup key (see [[DedupOps.exactDuplicates]]). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))
}
