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

  /** One DataSketches KLL quantile sketch per group over a bigint
    * `valueCol` — same incremental contract as the HLL pair above:
    * shards contribute fixed-size binaries (k=200 ≈ 1.65% normalized
    * rank error at 99% confidence), rollups MERGE binaries, and any
    * quantile is read off the merged sketch without rescanning rows.
    * Partial aggregation merges map-side, so the shuffle carries one
    * sketch per group per partition. */
  def quantileGrouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kll_sketch_agg_bigint(col(valueCol).cast("long"), k).as("qsketch"))

  /** Merge previously-built KLL sketches to a coarser grouping and
    * read off the requested quantiles (`qs` in [0,1]) plus the exact
    * ingested-row count `n` — `n` equals the true row count by sketch
    * construction, so a dropped shard or a broken merge is detectable
    * exactly, not just statistically. */
  def quantileRollup(sketches: DataFrame, groupCols: Seq[String],
                     qs: Seq[Double],
                     sketchCol: String = "qsketch"): DataFrame = {
    val merged = sketches.groupBy(groupCols.map(col): _*)
      .agg(kll_merge_agg_bigint(col(sketchCol)).as("qsketch"))
    // exact labels ("q50", "q99_5") — rounding to whole percents would
    // collide nearby quantiles (0.995 and 1.0 both "q100")
    def label(p: Double): String = {
      // decimal via the shortest string form — p*100 in binary would
      // stamp float dust into names (0.29*100 = 28.999999999999996)
      val s = (BigDecimal(p.toString) * 100)
        .underlying.stripTrailingZeros.toPlainString
      "q" + s.replace('.', '_').replace("-", "m")
    }
    val labels = qs.map(label)
    require(labels.distinct.size == labels.size,
      s"duplicate quantile labels: ${labels.mkString(",")}")
    val qCols = qs.zip(labels).map { case (p, l) =>
      kll_sketch_get_quantile_bigint(col("qsketch"), lit(p)).as(l)
    }
    merged.select(
      (groupCols.map(col) :+
        kll_sketch_get_n_bigint(col("qsketch")).as("n")) ++ qCols: _*)
  }
}
