package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "data card" stats block computed in ONE
  * aggregate pass: per column, non-null count, null count, exact
  * distinct count, and min/max (rendered as strings so heterogeneous
  * columns share a long-format output).
  *
  * Scale shape: a single global aggregation; counts and min/max fold
  * map-side. The exact `count(DISTINCT c)` per column makes Catalyst
  * plan one Expand (a row per profiled column per input row) feeding a
  * partial-aggregable two-phase distinct — linear in rows × profiled
  * columns, no joins, no windows. For very wide profiles at 100 TB
  * swap `countDistinct` for `approx_count_distinct` (same plan minus
  * the Expand) — the calling convention stays identical.
  */
object Profile {

  /** Long-format profile: (column, metric, value) rows, metrics
    * `n` / `nulls` / `distinct` / `min` / `max`, values stringified. */
  private val metrics = Seq("n", "nulls", "distinct", "min", "max")

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    // duplicates would produce ambiguous duplicate aggregate outputs
    require(cols.distinct.size == cols.size,
      s"duplicate columns in profile: ${cols.diff(cols.distinct).distinct.mkString(",")}")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)),
        count(lit(1)) - count(col(c)),
        countDistinct(col(c)),
        min(col(c)).cast("string"),
        max(col(c)).cast("string"))
    }
    // outputs are consumed POSITIONALLY (toDF renames by position), so
    // no profiled column name — dots, backticks, whatever — can break
    // or ambiguate the lookup
    val one = df.agg(aggs.head, aggs.tail: _*)
      .toDF(aggs.indices.map(i => s"__m$i"): _*)
    val rows = cols.zipWithIndex.flatMap { case (c, ci) =>
      metrics.zipWithIndex.map { case (m, mi) =>
        struct(lit(c).as("column"), lit(m).as("metric"),
          col(s"__m${ci * metrics.size + mi}").cast("string").as("value"))
      }
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select("p.column", "p.metric", "p.value")
  }
}
