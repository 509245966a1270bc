package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev CLI: sweep every catalog query plan for scale red-flags
  * (cartesian products, nested-loop joins, single-partition exchanges,
  * windows). Flags are HEURISTIC leads for a human plan audit — oracle
  * queries legitimately carry total sorts and bounded collects; see
  * SCALE.md for the per-operator contracts. Complements PlanCheck. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.queries.Catalog.queries.keys.toSeq.sorted
    for (n <- names) {
      try {
        val plan = graft.queries.Catalog.queries(n)(spark, dir)
          .queryExecution.executedPlan.toString
        val flags = Seq(
          "cartesian" -> plan.contains("CartesianProduct"),
          "bnlj" -> plan.contains("BroadcastNestedLoopJoin"),
          "single_exchange" -> plan.contains("Exchange SinglePartition"),
          "window" -> plan.contains("Window"),
          "global_sort_nolimit" -> (plan.contains("Sort [") && !plan.contains("TakeOrdered") && plan.contains("Exchange rangepartitioning"))
        ).collect { case (f, true) => f }
        if (flags.nonEmpty) println(s"[sweep] $n: ${flags.mkString(",")}")
      } catch { case e: Exception => println(s"[sweep] $n ERROR: ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
