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
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.flatMap { c =>
      Seq("n", "nulls", "distinct", "min", "max").map { m =>
        // backtick-quoted: a profiled column named "a.b" must resolve
        // as the literal alias, not as a struct-field path
        struct(lit(c).as("column"), lit(m).as("metric"),
          col(s"`__${m}_$c`").cast("string").as("value"))
      }
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select("p.column", "p.metric", "p.value")
  }
}
