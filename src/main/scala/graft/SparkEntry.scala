package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference README's headline pipeline
    * (`$.orders.filter(status == "paid").sort_by(-total).take(2)
    * .map({id, total})`, /root/reference/README.md:43-62) over the
    * driver's orders table: filter → top-k → shaped projection.
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderstatus") === "O")
      .orderBy(col("o_totalprice").desc)
      .limit(2)
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("total"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Catalog.oracles
}
