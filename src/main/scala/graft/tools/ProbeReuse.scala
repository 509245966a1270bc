package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // reference: single-task global window rolling sum over event_id order
    val ev = Tables.events(spark, sf).select(col("event_id"), col("value"))
    val ref = ev.withColumn("rs",
        when(row_number().over(Window.orderBy("event_id")) >= 8,
          sum(col("value").cast("double")).over(
            Window.orderBy("event_id").rowsBetween(-7, 0))))
      .select(col("event_id"), col("rs"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    for (trial <- 1 to 3) {
      val low = graft.plans.Lower.compile(
        "$.events.sort_by(event_id).map({eid: event_id, v: value}).map(v).rolling_sum(8)",
        t => Tables(spark, sf, t))
      // single-column lane: need event_id to join back — use enumerate-free compare:
      // collect values sorted and compare multisets positionally is weaker; instead
      // rely on the returned order columns
      val vals = low.collect()
      println(s"trial=$trial cols=${low.columns.mkString(",")} rows=${vals.length}")
    }
    // stronger: blockedWindow with id visible via map shape not possible (single lane);
    // instead compare the lowered window SUM aggregate: total of rolling sums
    for (trial <- 1 to 3) {
      val low = graft.plans.Lower.compile(
        "$.events.sort_by(event_id).map(value).rolling_sum(8)",
        t => Tables(spark, sf, t))
      val s = low.agg(sum(low.columns.head |> (c => col(c)))).collect()(0)
      val refSum = ref.values.filterNot(_.isNaN).sum
      println(f"trial=$trial loweredSum=${s.getDouble(0)}%.6f refSum=$refSum%.6f match=${math.abs(s.getDouble(0)-refSum) < 1e-6}")
    }
    spark.stop()
  }
  implicit class PipeOp[A](val a: A) extends AnyVal { def |>[B](f: A => B): B = f(a) }
}
