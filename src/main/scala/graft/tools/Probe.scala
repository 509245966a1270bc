package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Num

/** Scratch micro-profiler for plan/perf experiments (not part of the
  * driver contract). Times labelled variants of a hot query with the
  * same noop-sink methodology as [[graft.Bench]].
  */
object Probe {
  private def runOnce(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(name: String)(df: => DataFrame): Unit = {
    def once(): Double = {
      val t0 = System.nanoTime(); runOnce(df); (System.nanoTime() - t0) / 1e9
    }
    val best = Seq(once(), once(), once()).min
    println(f"[probe] $name%-28s $best%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runOnce(Tables.region(spark, d).select(count(lit(1))))

    val li = Tables.lineitem(spark, d)
    time("scan_count") { li.agg(count(lit(1))) }
    time("scan_4col_noop") { li.select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice") }
    time("q1_decimal") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base"),
        sum(Num.revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("cnt"))
    }
    time("q1_double") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("cnt"))
    }
    def s100(c: Column) = round(c * 100).cast("long")
    time("q1_longscaled") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        (sum(s100(col("l_quantity"))) / 100.0).as("sum_qty"),
        (sum(s100(col("l_extendedprice"))) / 100.0).as("sum_base"),
        (sum(s100(col("l_extendedprice")) * (lit(100L) - s100(col("l_discount")))) / 10000.0).as("sum_disc"),
        round((sum(s100(col("l_quantity"))) / 100.0) / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
    }
    time("q1_longscaled_decacc") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        (sum(s100(col("l_quantity")).cast("decimal(38,0)")).cast("double") / 100.0).as("sum_qty"),
        (sum(s100(col("l_extendedprice")).cast("decimal(38,0)")).cast("double") / 100.0).as("sum_base"),
        (sum((s100(col("l_extendedprice")) * (lit(100L) - s100(col("l_discount")))).cast("decimal(38,0)")).cast("double") / 10000.0).as("sum_disc"),
        round((sum(s100(col("l_quantity")).cast("decimal(38,0)")).cast("double") / 100.0) / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
    }
    time("q1_hybrid") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        (sum(s100(col("l_quantity"))) / 100.0).as("sum_qty"),
        (sum(s100(col("l_extendedprice"))) / 100.0).as("sum_base"),
        (sum((s100(col("l_extendedprice")) * (lit(100L) - s100(col("l_discount")))).cast("decimal(38,0)")).cast("double") / 10000.0).as("sum_disc"),
        round((sum(s100(col("l_quantity"))) / 100.0) / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
    }
    // exactness check: hybrid must equal the decimal formulation bit-for-bit
    val a = li.groupBy("l_returnflag", "l_linestatus").agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base"),
        sum(Num.revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc"),
        Num.davg(col("l_quantity")).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    val b = li.groupBy("l_returnflag", "l_linestatus").agg(
        (sum(s100(col("l_quantity"))) / 100.0).as("sum_qty"),
        (sum(s100(col("l_extendedprice"))) / 100.0).as("sum_base"),
        (sum((s100(col("l_extendedprice")) * (lit(100L) - s100(col("l_discount")))).cast("decimal(38,0)")).cast("double") / 10000.0).as("sum_disc"),
        round((sum(s100(col("l_quantity"))) / 100.0) / count(lit(1)), 4).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    println(s"[probe] exact_match ${a.toSeq == b.toSeq}")
    if (a.toSeq != b.toSeq) { a.zip(b).foreach { case (x, y) => if (x != y) println(s"[probe]   $x\n[probe]   $y") } }
    time("q1_decimal_repart") {
      li.repartition(32).groupBy("l_returnflag", "l_linestatus").agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base"),
        sum(Num.revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("cnt"))
    }
    // doc-query floor: hash-shuffle groupBy + range-shuffle orderBy vs
    // one range shuffle satisfying both requirements
    def docsHash() = li.groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(col("l_quantity").as("qty"))).as("items"))
      .select(col("okey"), size(col("items")).as("n"))
      .orderBy("okey")
    def docsRange() = li.repartitionByRange(32, col("l_orderkey"))
      .groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(col("l_quantity").as("qty"))).as("items"))
      .select(col("okey"), size(col("items")).as("n"))
      .orderBy("okey")
    time("docs_hash_then_range") { docsHash() }
    time("docs_range_once") { docsRange() }
    // lowered-window stage costs
    val ev = Tables.events(spark, d)
    time("ev_scan") { ev.select("event_id", "value") }
    time("ev_range") { ev.select("event_id", "value").repartitionByRange(col("event_id")) }
    time("lw_full") {
      graft.plans.Lower.compile(
        "$.events.sort_by(event_id).map(value).rolling_sum(8)",
        t => Tables(spark, d, t))
    }
    val lw = graft.plans.Lower.compile(
      "$.events.sort_by(event_id).map(value).rolling_sum(8)",
      t => Tables(spark, d, t))
    val planStr = lw.queryExecution.executedPlan.toString
    println("[probe] lw exchanges=" +
      "Exchange".r.findAllIn(planStr).length +
      " sorts=" + "Sort ".r.findAllIn(planStr).length +
      " scans=" + "Scan parquet".r.findAllIn(planStr).length)
    lw.explain()
    spark.stop()
  }
}
