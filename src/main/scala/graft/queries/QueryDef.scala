package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark-side implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare deterministic:
  *   - every result carries an unambiguous total ORDER BY in BOTH engines;
  *   - every floating-point aggregate is rounded (2–4 dp) in BOTH engines;
  *   - DuckDB integer sums are CAST to BIGINT (DuckDB widens to HUGEINT,
  *     Spark stays at LongType);
  *   - column names are aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    tags: Set[String] = Set.empty)

trait QueryGroup {
  def defs: Seq[QueryDef]

  /** Oracle SQL helper: tables are referenced as bare names; the driver
    * (and our local checker) resolves them to `<sfDir>/<name>.parquet`.
    */
  protected def q(
      name: String,
      oracle: String = null,
      tags: Set[String] = Set.empty)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Option(oracle), tags)
}
