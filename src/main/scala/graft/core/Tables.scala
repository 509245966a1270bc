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

  private def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    val df = raw(s, d, "events")
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
