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

  // ---- Fixed-point fast lane -------------------------------------------
  //
  // The same exactness via scaled-integer arithmetic: a 2-dp money double
  // becomes round(x*100) as LONG, per-row products/sums run in integer
  // registers inside whole-stage codegen, and the final /100.0 (or
  // /10000.0 for a product of two 2-dp values) is a single correctly-
  // rounded double division. For any true 2-dp value the result is
  // bit-for-bit identical to the DECIMAL formulation (both compute the
  // exact rational, then round once to double), but ~2x faster at the
  // bench scale (decimal sum 0.79s vs 0.43s on sf0.1 q1). Only valid on
  // columns that really carry <=2 fractional digits and |x| < 2^53/100;
  // arbitrary doubles would tie-break differently than the decimal cast.
  //
  // Accumulator choice is a scale decision: a LONG sum of qty/price lanes
  // (<=1e7 per row) overflows ANSI-loudly only past ~1.8e15 rows per
  // group — safe at 100 TB. A product lane (<=1e9 per row) would overflow
  // past ~2e10 rows per group, so frevenueSum accumulates in
  // DECIMAL(38,0): the per-row work stays integer codegen, only the
  // accumulator widens.

  /** Exact scaled-integer view of a 2-dp fixed-point double. */
  def fx(c: Column): Column = round(c * 100).cast("long")

  /** Exact fixed-point sum rendered as double (long accumulator). */
  def fsum(c: Column): Column = sum(fx(c)) / 100.0

  /** Exact-sum average rendered as rounded double. */
  def favg(c: Column, scale: Int = 4): Column =
    round((sum(fx(c)) / 100.0) / count(lit(1)), scale)

  /** Per-row `p * (1 - d)` exactly, rendered as double. */
  def frevenue(p: Column, d: Column): Column =
    (fx(p) * (lit(100L) - fx(d))) / 10000.0

  /** Exact revenue sum: integer per-row product, DECIMAL(38,0)
    * accumulator (see overflow note above), one double division. */
  def frevenueSum(p: Column, d: Column): Column =
    sum((fx(p) * (lit(100L) - fx(d))).cast("decimal(38,0)"))
      .cast("double") / 10000.0

  /** DuckDB-side equivalents (string SQL fragments). */
  def sqlDec2(e: String): String = s"CAST($e AS DECIMAL(18,2))"
  def sqlRevenue(p: String, d: String): String =
    s"${sqlDec2(p)} * (CAST(1 AS DECIMAL(18,2)) - ${sqlDec2(d)})"
  def sqlDsum(e: String): String = s"CAST(SUM(${sqlDec2(e)}) AS DOUBLE)"
  def sqlDavg(e: String, scale: Int = 4): String =
    s"ROUND(CAST(SUM(${sqlDec2(e)}) AS DOUBLE) / COUNT(*), $scale)"
}
