package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the driver contract): exact JSON-inference
  * shapes the static-schema shortcut must reproduce — field ORDER in
  * inferred structs, the all-null column type, whole-double handling,
  * and nested struct/array canonicalisation. */
object InferProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def probe(label: String, rows: Seq[String]): Unit = {
      val ds = spark.createDataset(rows)
      val df = spark.read.json(ds)
      println(s"[probe] $label schema: ${df.schema.sql}")
      println(s"[probe] $label rows: " + df.collect().mkString(" | "))
    }
    probe("field-order", Seq("""{"z":1,"a":"x","m":true}"""))
    probe("all-null", Seq("""{"a":null,"b":1}""", """{"a":null,"b":2}"""))
    probe("all-null-arr", Seq("""{"a":[null],"b":[]}""", """{"a":null,"b":[]}"""))
    probe("whole-double", Seq("""{"a":3.0}""", """{"a":4.5}"""))
    probe("nested", Seq("""{"o":{"z":1,"a":[{"q":2,"b":"s"}]}}"""))
    probe("missing-field", Seq("""{"a":1}""", """{"a":2,"b":"x"}"""))
    probe("bool-null", Seq("""{"a":true}""", """{"a":null}"""))
    probe("long-vs-double", Seq("""{"a":1}""", """{"a":2.5}"""))
    spark.stop()
  }
}
