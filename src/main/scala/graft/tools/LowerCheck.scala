package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev CLI: compile a jetro expression against the testdata tables and
  * print the physical plan, or the bail reason when lowering refuses —
  * `runMain graft.tools.LowerCheck '$.region.map(r_name)'`. */
object LowerCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (e <- args) {
      println(s"======== $e ========")
      try {
        val df = graft.plans.Lower.compile(e, t => graft.core.Tables(spark, dir, t))
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      } catch { case ex: Throwable => println(s"[lowercheck] ${ex.getMessage}") }
    }
    spark.stop()
  }
}
