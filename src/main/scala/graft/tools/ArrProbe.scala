package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot probe for the Spark array-function edge behaviors the
  * array-lane lowerings depend on (slice length 0, get OOB/negative,
  * flatten over null elements, array_position, sequence bounds,
  * greatest/least null skipping, zip_with padding). Run once per Spark
  * upgrade; results are cited in Lower.scala comments.
  */
object ArrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(1).toDF("x")
    def p(label: String, c: org.apache.spark.sql.Column): Unit = {
      val v = try df.select(c).collect()(0).get(0) catch { case e: Throwable => s"ERROR: ${e.getClass.getSimpleName} ${e.getMessage.take(80)}" }
      println(s"[arrprobe] $label = $v")
    }
    val a = array(lit(1), lit(2), lit(3))
    p("slice(a,1,0)", slice(a, lit(1), lit(0)))
    p("slice(a,2,5) overrun", slice(a, lit(2), lit(5)))
    p("slice(a,1,-1)", slice(a, lit(1), lit(-1)))
    p("get(a,-1)", get(a, lit(-1)))
    p("get(a,9)", get(a, lit(9)))
    p("get(empty, size-1)", get(array().cast("array<int>"), size(array().cast("array<int>")) - 1))
    p("flatten([[1],null,[2]])", flatten(array(array(lit(1)), lit(null).cast("array<int>"), array(lit(2)))))
    p("array_position([a,b,a],a)", array_position(array(lit("a"), lit("b"), lit("a")), lit("a")))
    p("array_position([a],z)", array_position(array(lit("a")), lit("z")))
    p("sequence(1,0)", sequence(lit(1), lit(0)))
    p("greatest(null,5)", greatest(lit(null).cast("double"), lit(5.0)))
    p("least(null,5)", least(lit(null).cast("double"), lit(5.0)))
    p("zip_with pad", zip_with(array(lit(1), lit(2)), array(lit(10)), (x, y) => x + y))
    p("array_repeat(n,0)", array_repeat(lit(1), 0))
    p("array_repeat(n,-1)", array_repeat(lit(1), -1))
    p("nan<=>nan", lit(Double.NaN) <=> lit(Double.NaN))
    p("-0.0<=>0.0", lit(-0.0) <=> lit(0.0))
    p("cast(-0.0 as string)", lit(-0.0).cast("string"))
    p("conv(FF,16,10)", conv(lit("FF"), 16, 10))
    p("hex(encode(é))", hex(encode(lit("é"), "UTF-8")))
    p("transform idx type", transform(a, (x, i) => i).cast("string"))
    p("array_contains([a],null)", array_contains(array(lit("a")), lit(null).cast("string")))
    p("upper(ß) len", length(upper(lit("ß"))))
    p("lower(İ)", lower(lit("İ")))
    p("lower(İ) len", length(lower(lit("İ"))))
    p("substring(İfull,1,1)", substring(lower(lit("İ")), 1, 1))
    p("aggregate concat scan", aggregate(a.cast("array<double>"), array().cast("array<double>"),
      (acc, x) => concat(acc, array(coalesce(get(acc, size(acc) - 1), lit(0.0)) + x))).cast("string"))
    spark.stop()
  }
}
