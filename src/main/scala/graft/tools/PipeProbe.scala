package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jexpr.{Jetro, JValue}
import graft.plans.Lower

/** Scratch probe: pipe-stage free-function semantics, lowered vs interp. */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").appName("pipe-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docType = StructType(Seq(
      StructField("a", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("t", StringType, nullable = true)))
    import spark.implicits._
    val df = Seq((3.14159, "hello", "WORLD"), (2.71828, "abc", "DEF"))
      .toDF("a", "s", "t")
    val doc = struct(col("a"), col("s"), col("t"))
    val queries = Seq("$.a | round(2)", "$.s | upper($.t)")
    queries.foreach { q =>
      val lowered = Lower.compileDocColumn(q, doc, docType)
      val lv = lowered.map(c => df.select(c.cast("string")).collect().map(_.getString(0)).toSeq)
      val jq = Jetro.compile(q)
      val iv = df.toJSON.collect().toSeq.map(j => jq.evalValue(JValue.parse(j)).render)
      println(s"QUERY: $q")
      println(s"  lowered: ${lv.getOrElse("BAILED")}")
      println(s"  interp : $iv")
    }
    spark.stop()
  }
}
