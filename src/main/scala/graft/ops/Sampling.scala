package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset-split operators
  * for training-data pipelines.
  *
  * Everything here keys off `md5(key)` — a content hash both Spark and
  * any ANSI engine compute identically — instead of `rand()`: the
  * sample is reproducible across runs, engines, cluster sizes and
  * partitionings, membership is stable under re-runs over changed data
  * (a doc keeps its split when other docs arrive), and the DuckDB
  * oracle can verify row-identical output. `rand()`-based sampling has
  * none of those properties.
  *
  * Scale shape: [[bucket]] / [[sampleByHash]] / [[split]] are pure
  * per-row projections/filters — no shuffle, fully codegen'd, and the
  * filter prunes before any downstream shuffle. [[stratified]] is one
  * window shuffle on the stratum key (the exact-k-per-group analogue
  * of a reservoir sample) — rank by hash inside each stratum, keep k.
  */
object Sampling {

  /** 256-bucket hash lane: first hex byte of md5(key), '00'..'ff'.
    * String form keeps the predicate portable to any SQL engine. */
  def bucket(key: Column): Column = substring(md5(key.cast("string")), 1, 2)

  /** Deterministic ~`pct`/256 Bernoulli sample (granularity 1/256).
    * `pct256` is the number of buckets kept, 0..256. */
  def sampleByHash(df: DataFrame, key: Column, pct256: Int): DataFrame = {
    require(pct256 >= 0 && pct256 <= 256, "pct256 out of range")
    df.where(bucket(key) < lit(f"$pct256%02x"))
  }

  /** Deterministic train/val/test assignment by hash bucket:
    * `[0, trainHi)` → train, `[trainHi, valHi)` → val, rest → test
    * (bucket bounds in 0..256). Defaults ≈ 80/10/10. */
  def split(key: Column, trainHi: Int = 204, valHi: Int = 230): Column = {
    val b = bucket(key)
    when(b < lit(f"$trainHi%02x"), "train")
      .when(b < lit(f"$valHi%02x"), "val")
      .otherwise("test")
  }

  /** Deterministic weighted (importance) sampling: keep a row iff its
    * md5-derived uniform in [0,1) is below `weight` (a per-row keep
    * probability, e.g. a quality score). The uniform is the first 8
    * hex digits of md5(key) scaled by 2^-32 — reproducible in any
    * engine, and a row's fate depends only on its own key and weight,
    * so re-runs and engine swaps keep the same sample. Pure per-row
    * filter, no shuffle. */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  def sampleByWeight(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.where(hashUniform(key) < weight)

  /** Exact-k-per-stratum deterministic sample: rank rows inside each
    * stratum by md5(key) (a uniform, reproducible order) and keep the
    * first k. The distributed twin of per-group reservoir sampling. */
  def stratified(df: DataFrame, stratum: Seq[String], key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum.map(col): _*)
      .orderBy(md5(key.cast("string")))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }
}
