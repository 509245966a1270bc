package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the driver contract): how the JSON source
  * treats bare-scalar root values under inference and FAILFAST. */
object JsonProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def probe(label: String, rows: Seq[String]): Unit = {
      val ds = spark.createDataset(rows)
      val df = spark.read.json(ds)
      println(s"[probe] $label schema: ${df.schema.simpleString}")
      println(s"[probe] $label rows: " + df.collect().mkString(" | "))
      val df2 = spark.read.schema(df.schema).option("mode", "FAILFAST").json(ds)
      try println(s"[probe] $label failfast rows: " + df2.collect().mkString(" | "))
      catch { case e: Throwable => println(s"[probe] $label FAILFAST ERR: " + e.getMessage.take(300)) }
    }
    probe("scalar-str", Seq("\"foo\"", "\"bar\""))
    probe("scalar-num", Seq("5", "6.5"))
    probe("mixed-obj", Seq("""{"a":1}""", """{"a":2,"b":"x"}"""))
    // explicit-schema PERMISSIVE over scalars: does it reproduce the
    // inference path's _corrupt_record column (incl. the corrupt-only
    // projection restriction)?
    val ds = spark.createDataset(Seq("\"foo\"", "\"bar\""))
    val sch = spark.read.json(ds).schema
    val dfp = spark.read.schema(sch).json(ds)
    try println("[probe] scalar-str permissive-explicit rows: " + dfp.collect().mkString(" | "))
    catch { case e: Throwable => println("[probe] scalar-str permissive-explicit ERR: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
