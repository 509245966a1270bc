package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the bench headline set — the
  * plan-review loop: PushedFilters reach the scan, ReadSchema is pruned,
  * small joins broadcast, sort+limit becomes TakeOrderedAndProject,
  * WholeStageCodegen spans are wide.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.headOption
    graft.Bench.headline
      .filter { case (n, _) => only.forall(_ == n) }
      .foreach { case (name, fn) =>
        println(s"\n======== $name ========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
