package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev CLI: print the physical plan of catalog queries by name —
  * `runMain graft.tools.PlanCheck q_profile q_mix`. Complements
  * Explain (which walks the bench headline set) for plan-audits of
  * individual catalog entries. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try
      for (n <- args) {
        println(s"======== $n ========")
        graft.queries.Catalog.queries.get(n) match {
          case Some(fn) =>
            try println(fn(spark, dir).queryExecution.explainString(
              org.apache.spark.sql.execution.SimpleMode))
            catch { case e: Exception => println(s"[plancheck] $n failed: $e") }
          case None => println(s"[plancheck] unknown query: $n")
        }
      }
    finally spark.stop()
  }
}
