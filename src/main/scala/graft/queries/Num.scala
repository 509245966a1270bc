package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric determinism helpers for the oracle gate.
  *
  * Money columns in the testdata are 2-dp decimals stored as doubles.
  * Summing them as doubles is order-dependent (Spark and DuckDB
  * accumulate in different orders), and rounding a product of 2-dp
  * values to 2 dp hits exact .xx5 ties where the engines' round
  * implementations disagree. Doing the arithmetic in DECIMAL is exact
  * and order-independent; converting the exact result to DOUBLE at the
  * end is deterministic on both engines.
  *
  * At 100 TB this is also the right call for correctness, not just for
  * test parity: decimal sums don't drift with partition count.
  */
object Num {
  /** Exact 2-dp view of a money double. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** `x * (1 - y)` in exact decimal (revenue idiom). */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast("decimal(18,2)") - dec2(discount))

  /** Exact decimal sum rendered as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact-sum average rendered as rounded double. */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(dec2(c)).cast("double") / count(lit(1)), scale)

  /** DuckDB-side equivalents (string SQL fragments). */
  def sqlDec2(e: String): String = s"CAST($e AS DECIMAL(18,2))"
  def sqlRevenue(p: String, d: String): String =
    s"${sqlDec2(p)} * (CAST(1 AS DECIMAL(18,2)) - ${sqlDec2(d)})"
  def sqlDsum(e: String): String = s"CAST(SUM(${sqlDec2(e)}) AS DOUBLE)"
  def sqlDavg(e: String, scale: Int = 4): String =
    s"ROUND(CAST(SUM(${sqlDec2(e)}) AS DOUBLE) / COUNT(*), $scale)"
}
