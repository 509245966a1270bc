package graft.tools
import org.apache.spark.sql.SparkSession
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.printSchema()
    e.select("event_id", "ts").orderBy("event_id").show(3, false)
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.select("o_orderkey","o_orderdate").orderBy("o_orderkey").show(3, false)
  }
}
