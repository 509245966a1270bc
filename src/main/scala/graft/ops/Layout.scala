package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan
  * pruning — the lever that makes "WHERE user BETWEEN ... AND ts
  * BETWEEN ..." prune files on BOTH dimensions at 100 TB. Rows are
  * clustered along an interleaved-bit space-filling curve, so each
  * written file covers a small hyper-rectangle of the dimension space
  * and parquet min/max footer stats can exclude it for any dimension's
  * predicate (the same layout trick Delta/Iceberg OPTIMIZE ZORDER
  * applies; re-derived here from the published Morton construction).
  *
  * Scale design: one tiny global min/max aggregate per layout job
  * (k×2 scalars, broadcast back), then a pure per-row bit-interleave
  * expression and ONE range shuffle on the z-value. No windows, no
  * rank — rank-normalization would need a per-dimension sort; linear
  * min/max scaling is the standard approximation and keeps the job at
  * one pass + one shuffle.
  */
object Layout {

  /** The Morton z-value of `dims`, each linearly scaled from its
    * [min, max] (taken from `stats`, a 1-row frame with `__min_i` /
    * `__max_i` columns) into `bits`-bit integers, bit-interleaved
    * dimension-major. `bits * dims.length` must fit a long (≤ 62). */
  private def zExpr(dims: Seq[Column], mins: Seq[Column],
                    maxs: Seq[Column], bits: Int): Column = {
    val k = dims.length
    val top = (1L << bits) - 1
    val scaled = dims.zipWithIndex.map { case (d, i) =>
      // (v - min) * top / (max - min), guarded for constant dimensions;
      // double math is exact enough for a LAYOUT decision (ties land in
      // the same file either way)
      val span = maxs(i) - mins(i)
      when(span <= 0, lit(0L)).otherwise(
        least(lit(top), greatest(lit(0L),
          floor((d.cast("double") - mins(i)) / span * top).cast("long"))))
    }
    (for (b <- 0 until bits; i <- 0 until k) yield
      shiftleft(shiftright(scaled(i), b).bitwiseAND(1), b * k + i))
      .reduce(_ bitwiseOR _)
  }

  /** `df` with a `__z` Morton column over `dimCols` (numeric or
    * timestamp-castable). The min/max pass is one scalar aggregate. */
  def withZValue(df: DataFrame, dimCols: Seq[String],
                 bits: Int = 16): DataFrame = {
    require(dimCols.nonEmpty, "need at least one dimension")
    require(bits > 0 && bits * dimCols.length <= 62,
      s"bits * dims must fit a long, got $bits * ${dimCols.length}")
    val dims = dimCols.map(c => col(c).cast("double"))
    val aggs = dims.zipWithIndex.flatMap { case (d, i) =>
      Seq(min(d).as(s"__min_$i"), max(d).as(s"__max_$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val mins = dimCols.indices.map(i => col(s"__min_$i"))
    val maxs = dimCols.indices.map(i => col(s"__max_$i"))
    joined.withColumn("__z", zExpr(dims, mins, maxs, bits))
      .drop(dimCols.indices.flatMap(i =>
        Seq(s"__min_$i", s"__max_$i")): _*)
  }

  /** Cluster `df` along the z-curve into `numFiles` ranges — the frame
    * to hand to `.write.parquet` so each output file covers a compact
    * hyper-rectangle and min/max footer pruning works on EVERY
    * dimension, not just a lexicographic sort's first one. */
  def zorder(df: DataFrame, dimCols: Seq[String], numFiles: Int,
             bits: Int = 16): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    withZValue(df, dimCols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Persist `df` bucketed + sorted by `key` as a catalog table — the
    * co-located layout that makes every future equi-join or
    * aggregation on `key` between same-bucketed tables SHUFFLE-FREE
    * (asserted on the physical plan in PlanQualitySpec "bucketed
    * tables join without a shuffle"). Bucket counts must match across
    * the tables that will join; at 100 TB pick buckets so one bucket
    * of the largest table fits an executor (e.g. 4096 for a 10 TB
    * fact). This is the standard write-side investment for a table
    * that is joined on the same key by many downstream jobs — pay one
    * write-time shuffle, never shuffle that key again. */
  def bucketedWrite(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)
  }
}
