package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Query-catalog plumbing shared by the relational / genomic / pipeline
  * query sets. Each query = a Spark implementation plus (usually) a DuckDB
  * oracle SQL string, registered pairwise so the driver's harness
  * (CORRECTNESS_r{N}.json) can hash-match them.
  *
  * Engine-portability conventions (Spark vs DuckDB must agree bit-for-bit):
  *  - money sums → integer cents: `CAST(floor(x*100 + 0.5) AS BIGINT)`;
  *    floor(+0.5) not round() because round's half-way rule differs across
  *    engines while floor is unambiguous IEEE;
  *  - never sum raw doubles (FP addition is order-sensitive across engines);
  *  - ratios = int/int division in double (bit-exact IEEE in both);
  *  - timestamps → epoch seconds/millis as BIGINT;
  *  - counts → BIGINT on both sides (DuckDB sum(int) is INT128 → cast).
  */
case class Query(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QuerySet {
  def queries: Seq[Query]

  /** Shorthand table loader. */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Integer cents of a double money column — engine-portable exact sum
    * input. */
  protected def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long")

  /** Same at 4 decimal digits (for discounted prices). */
  protected def tenthCents(c: Column): Column =
    floor(c * 10000 + 0.5).cast("long")

  /** DuckDB twin of [[graft.operators.Stats.limbDouble]]: the
    * engine-identical double view of a wide exact-integer SQL
    * expression. NEVER `CAST(hugeint AS DOUBLE)` past 2^53 — DuckDB's
    * cast is not correctly rounded there (measured, q199/q206); this
    * splits |e| into three sub-2^53 limbs with exact integer `//`/`%`
    * (operands non-negative, where the engines' division semantics
    * agree), casts each limb exactly, and recombines in the same fixed
    * left-associated double expression the Spark side uses. */
  protected def limbSql(e: String): String =
    s"(CAST(ABS($e) // 1125899906842624 // 1125899906842624 AS DOUBLE)" +
      s" * 1.2676506002282294e30" +
      s" + CAST(ABS($e) // 1125899906842624 % 1125899906842624 AS DOUBLE)" +
      s" * 1.125899906842624e15" +
      s" + CAST(ABS($e) % 1125899906842624 AS DOUBLE))" +
      s" * (CASE WHEN ($e) < 0 THEN -1.0 ELSE 1.0 END)"
}
