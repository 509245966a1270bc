package graft.tools

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke: run SparkEntry.entry and
  * assert rows > 0. Usage: runMain graft.tools.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned no rows")
    spark.stop()
  }
}
