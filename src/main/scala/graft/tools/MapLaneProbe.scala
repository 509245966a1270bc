package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev CLI: decompose b_map_lane's cost — scan+parse vs each projected
  * output column — to find the hot sub-expression. */
object MapLaneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ev: DataFrame = graft.core.Tables.events(spark, sfDir).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    def lane(expr: String): DataFrame =
      graft.plans.Lower.compile(expr, _ => ev)
    def time(name: String, fn: => DataFrame): Unit = {
      // warm once, then min of 2
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mlp] $name%-14s min=${ts.drop(1).min}%.3f first=${ts.head}%.3f")
    }
    time("parse_only", ev)
    time("mg", lane("$.events.map({id: event_id, mg: props.transform_values(@).merge({z: 9}).values().sum()})"))
    time("ks", lane("$.events.map({id: event_id, ks: props.set(\"w\", 3).keys().join(\",\")})"))
    time("iv", lane("$.events.map({id: event_id, iv: props.invert().keys().first()})"))
    time("all", lane("$.events.map({id: event_id," +
      " mg: props.transform_values(@).merge({z: 9}).values().sum()," +
      " ks: props.set(\"w\", 3).keys().join(\",\")," +
      " iv: props.invert().keys().first()})"))
    spark.stop()
  }
}
