package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL via
  * Spark's `hll_sketch_agg` family) — the 100 TB pattern for corpus
  * statistics that must update incrementally: each shard/day/source
  * contributes a small binary sketch, and any rollup (per-language,
  * per-source, global) is a UNION of sketches — never a rescan of the
  * data. Unlike `approx_count_distinct`, whose estimate is consumed
  * inside one query, the sketch is a value: storable in a stats table,
  * joinable, and mergeable across jobs.
  */
object Sketch {

  /** One HLL sketch per group over `valueCol` (binary, ~2^lgK bytes
    * max; lgK 12 ≈ 1.6% rsd). Partial aggregation merges sketches
    * map-side, so the shuffle carries one sketch per group per
    * partition, never rows. */
  def grouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
              lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll previously-built sketches up to a coarser grouping (empty
    * `groupCols` = one global row): union the binaries, keep the merged
    * sketch (for further increments) and its estimate.
    * `allowDifferentLgK` tolerates mixed-precision inputs (the union
    * downgrades to the coarsest). */
  def rollup(sketches: DataFrame, groupCols: Seq[String],
             sketchCol: String = "sketch",
             allowDifferentLgK: Boolean = false): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(allowDifferentLgK)).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))
}
