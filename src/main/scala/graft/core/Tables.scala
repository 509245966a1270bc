package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access over the driver-generated TPC-H-ish parquet layout
  * (TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * All engine queries read through here so that scan-level concerns
  * (pushdown-friendly reads, schema expectations) live in one place.
  * At 100 TB these would be partitioned/ bucketed tables registered in a
  * catalog; the accessor indirection means swapping `spark.read.parquet`
  * for `spark.table` is a one-line change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // events needs its conf + ts normalisation on EVERY access path —
    // generic resolvers (Lower's table resolver, the CLI) come through
    // here, and without the reroute they'd only work if some earlier
    // events accessor had already set the session conf
    if (name == "events") events(spark, sfDir)
    else raw(spark, sfDir, name)

  /** Stored-order access: the raw scan, guaranteed free of any
    * compute-spread repartition. Document-mode semantics depend on the
    * table's stored row order (`$.t.first()`, enumerate, keep-first
    * dedup over the document array), so the doc-rung collector must see
    * rows exactly as the parquet lays them out.
    */
  def stored(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsNorm(raw(spark, sfDir, name))
    else raw(spark, sfDir, name)

  private def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  // ── compute-spread: repartition unsplittable inputs under HEAVY
  //    per-row operators ──
  // The local testdata ships one single-row-group parquet file per
  // table, so every scan is ONE task no matter the core count — exactly
  // the "one huge unsplittable file" input-skew case (optimization
  // guide §2.5): per-row work serializes on one core until the first
  // exchange. Remedy per the guide: repartition immediately after the
  // read. Round 11 first applied this to EVERY table read and measured
  // the full bench both ways: per-row-HEAVY lanes (interpreter rungs,
  // string-split array chains, map-object rebuilds, shingle/minhash
  // signatures) win 1.2×–3.3×, but scan-light lanes LOSE 1.3×–2.3× —
  // the round-robin exchange ships every row that a map-side partial
  // aggregate would have collapsed in place, and its deterministic
  // local sort (sortBeforeRepartition) runs inside the single scan
  // task. So the spread is NOT a table-read policy; the specific
  // operators whose per-row cost measurably exceeds one narrow-row
  // shuffle call [[spreadCompute]] on their input themselves.
  //
  // Scale-adaptive by construction: the trigger compares the actual
  // scan partition count against the cluster's defaultParallelism — at
  // production scale, where files are split properly, the check is
  // false and no exchange is added. `spark.graft.scan.spread=false`
  // disables globally.
  def spreadCompute(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // .rdd is illegal on a streaming frame
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.scan.spread", "true").toBoolean) return df
    val want = spark.sparkContext.defaultParallelism
    if (want <= 2) return df
    val have =
      try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => return df }
    if (have * 2 >= want) df else df.repartition(want)
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet vintages: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects outright — read as raw
    * nanos under the legacy conf and truncate) and plain timestamp[us]
    * (read as TIMESTAMP_NTZ). Both are surfaced as the same microsecond
    * TimestampType column — with the session zone pinned to UTC that is
    * exactly the value DuckDB sees, so oracle comparisons on `ts` agree.
    */
  def events(s: SparkSession, d: String): DataFrame =
    eventsNorm(raw(s, d, "events"))

  private def eventsNorm(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
