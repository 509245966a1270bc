package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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
  * filter prunes before any downstream shuffle. [[stratified]] is a
  * bounded-buffer partial aggregate on the stratum key (the
  * exact-k-per-group analogue of a reservoir sample) — ≤ k hash values
  * per stratum per partition cross the shuffle, never whole strata.
  */
object Sampling {

  /** 256-bucket hash lane: first hex byte of md5(key), '00'..'ff'.
    * String form keeps the predicate portable to any SQL engine. */
  def bucket(key: Column): Column = substring(md5(key.cast("string")), 1, 2)

  /** `bucket(key) < bound` as a portable 2-hex-char compare; bound 256
    * means "every bucket" — f"%02x" would render it as the 3-char
    * "100", and a lexicographic compare of 2-char buckets against that
    * keeps only "00".."0f" and "10" (~17/256), so it must short-circuit
    * to `true` instead of ever reaching the string compare. */
  private def bucketBelow(b: Column, bound: Int): Column =
    if (bound >= 256) lit(true) else b < lit(f"$bound%02x")

  /** Deterministic ~`pct`/256 Bernoulli sample (granularity 1/256).
    * `pct256` is the number of buckets kept, 0..256. */
  def sampleByHash(df: DataFrame, key: Column, pct256: Int): DataFrame = {
    require(pct256 >= 0 && pct256 <= 256, "pct256 out of range")
    if (pct256 >= 256) df else df.where(bucketBelow(bucket(key), pct256))
  }

  /** Deterministic global corpus shuffle + sharding for training-data
    * writes: every row gets a reproducible pseudo-random rank
    * (`shuffle_rank` = md5(seed ‖ key)) and a `shard` from the rank's
    * first 8 hex digits mod `shards`, then rows are hash-partitioned by
    * shard and sorted by rank WITHIN each partition — one hash shuffle
    * plus per-partition sorts, never a global total-order barrier (the
    * OrderBarrier a naive `orderBy(rand)` pays). Shard sizes balance by
    * hashing; assignment and order depend only on (seed, key), so the
    * same corpus shuffles identically on any cluster, partitioning, or
    * rerun, and a different seed is a fresh epoch-order. Write with
    * `.write.partitionBy("shard")` (or feed shards to workers directly);
    * readers consuming files in rank order replay the shuffle. */
  def shuffleShards(df: DataFrame, key: Column, shards: Int, seed: String): DataFrame = {
    require(shards > 0, "shards must be positive")
    val h = md5(concat(lit(seed), key.cast("string")))
    df.withColumn("shuffle_rank", h)
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_rank"), 1, 8), 16, 10).cast("long"),
          lit(shards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "shuffle_rank")
  }

  /** Deterministic train/val/test assignment by hash bucket:
    * `[0, trainHi)` → train, `[trainHi, valHi)` → val, rest → test
    * (bucket bounds in 0..256). Defaults ≈ 80/10/10. */
  def split(key: Column, trainHi: Int = 204, valHi: Int = 230): Column = {
    require(trainHi >= 0 && trainHi <= valHi && valHi <= 256,
      "split bounds must satisfy 0 <= trainHi <= valHi <= 256")
    val b = bucket(key)
    when(bucketBelow(b, trainHi), "train")
      .when(bucketBelow(b, valHi), "val")
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

  /** Merge two asc-sorted distinct lists, keep the k smallest distinct
    * values — the string twin of [[TopK.mergeK]]. */
  private[graft] def mergeSmallK(k: Int, a: List[String], b: List[String]): List[String] = {
    val out = List.newBuilder[String]
    var (x, y, n) = (a, b, 0)
    var last: String = null
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      val v =
        if (y.isEmpty || (x.nonEmpty && x.head <= y.head)) { val h = x.head; x = x.tail; h }
        else { val h = y.head; y = y.tail; h }
      if (v != last) { out += v; last = v; n += 1 }
    }
    out.result()
  }

  /** Long twin of [[mergeSmallK]]. */
  private[graft] def mergeSmallKL(k: Int, a: List[Long], b: List[Long]): List[Long] = {
    val out = List.newBuilder[Long]
    var (x, y, n) = (a, b, 0)
    var last: Long = Long.MinValue
    var first = true
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      val v =
        if (y.isEmpty || (x.nonEmpty && x.head <= y.head)) { val h = x.head; x = x.tail; h }
        else { val h = y.head; y = y.tail; h }
      if (first || v != last) { out += v; last = v; first = false; n += 1 }
    }
    out.result()
  }

  /** [[KSmallestAgg]] on the integral lane: the k smallest distinct
    * longs per group with map-side combine. Callers must pre-filter
    * nulls (the primitive encoder would read them as 0). */
  final class KSmallestLongAgg(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(buf: List[Long], in: Long): List[Long] = {
      // rejection fast path: once the buffer is full (the steady state),
      // a value >= the max cannot enter — one allocation-free walk
      // instead of an O(k) list rebuild per row
      var n = 0; var it = buf; var last = Long.MinValue
      while (it.nonEmpty && n < k) { last = it.head; it = it.tail; n += 1 }
      if (n == k && last <= in) buf
      else mergeSmallKL(k, buf, List(in))
    }
    override def merge(a: List[Long], b: List[Long]): List[Long] =
      mergeSmallKL(k, a, b)
    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Bounded-buffer aggregate: the k smallest distinct string values.
    * Partial aggregation caps each map-side buffer at k, so at most k
    * values per (stratum, partition) ever cross the shuffle. */
  final class KSmallestAgg(k: Int) extends Aggregator[String, List[String], Seq[String]] {
    override def zero: List[String] = Nil
    override def reduce(buf: List[String], in: String): List[String] =
      if (in == null) buf
      else {
        // rejection fast path: a full buffer (the steady state) whose
        // max <= in cannot change — one allocation-free walk instead
        // of an O(k) list rebuild per row
        var n = 0; var it = buf; var last: String = null
        while (it.nonEmpty && n < k) { last = it.head; it = it.tail; n += 1 }
        if (n == k && last <= in) buf
        else mergeSmallK(k, buf, List(in))
      }
    override def merge(a: List[String], b: List[String]): List[String] =
      mergeSmallK(k, a, b)
    override def finish(r: List[String]): Seq[String] = r
    override def bufferEncoder: Encoder[List[String]] =
      ExpressionEncoder[List[String]]()
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** Exact-k-per-stratum deterministic sample: rank rows inside each
    * stratum by md5(key) (a uniform, reproducible order) and keep the
    * first k.
    *
    * Scale shape: NOT the `row_number().over(partitionBy(stratum))`
    * window idiom — that shuffles every row to its stratum and sorts
    * the whole stratum (terabytes per stratum at 100 TB when strata are
    * coarse, e.g. language). Instead a bounded-buffer aggregate (the
    * [[TopK.TopKAgg]] shape on the hash lane) computes the k smallest
    * hashes per stratum with map-side combine — ≤ k values per stratum
    * per partition cross the shuffle — and the tiny survivor set
    * (#strata × k rows) is broadcast-joined back to pick the rows. Two
    * scans of the input, no per-stratum sort, skew-immune.
    *
    * Assumes `key` is unique per row within a stratum (the usual doc-id
    * case); duplicate keys would all survive the join-back together, and
    * rows with a NULL key share the empty-string hash (which sorts
    * before every hex digest — the nulls-first preference the window
    * idiom had). Null stratum values form their own stratum (null-safe
    * join-back). The broadcast survivor set is the SAMPLE itself
    * (#strata × k 32-byte hashes) — by contract small; a sample too big
    * to broadcast is too big to be a sample. */
  def stratified(df: DataFrame, stratum: Seq[String], key: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val h = coalesce(md5(key.cast("string")), lit(""))
    val agg = udaf(new KSmallestAgg(k))
    val keep = df.groupBy(stratum.map(col): _*)
      .agg(agg(h).as("__hs"))
      .select(stratum.map(col) :+ explode(col("__hs")).as("__h"): _*)
    val left = df.withColumn("__h", h).alias("__l")
    val right = keep.alias("__r")
    val cond = (stratum :+ "__h")
      .map(c => col(s"__l.$c") <=> col(s"__r.$c")).reduce(_ && _)
    left.join(broadcast(right), cond, "left_semi").drop("__h")
  }
}
