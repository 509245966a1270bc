package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.functions._

/** Pins the distributed order machinery's load-bearing physical
  * assumption (r11 verdict item 2 / ADVICE): `withGlobalRn` and
  * `runningOverOrder` read ONE range exchange from TWO consumers (the
  * per-partition counts/aggregate side and the sorted row side) and
  * join them on `spark_partition_id()` — correctness requires (a) the
  * exchange to be REUSED, not re-sampled (range boundaries are sampled
  * per execution, so two independent exchanges could disagree on pid →
  * silently wrong global row numbers), and (b) both reads to observe
  * identical partitioning (no one-sided AQE coalescing / local reads).
  *
  * r12 passes an explicit partition count to `repartitionByRange`
  * (REPARTITION_BY_NUM), which AQE never coalesces or locally re-reads;
  * this spec asserts the resulting invariants on executed plans and the
  * end-to-end permutation property over a SKEWED multi-partition input
  * with AQE partition coalescing both on and off.
  */
class OrderMachinerySpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case q: QueryStageExec        => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => Nil
    }
    p +: (p.children ++ extra).flatMap(nodes)
  }

  /** 5,000 rows, heavily skewed sort key (93% share one value, so one
    * range partition owns most rows), spread over 8 input partitions. */
  private def skewed: DataFrame = {
    import spark.implicits._
    spark.range(0, 5000, 1, 8)
      .select(col("id"),
        when(col("id") % 15 =!= 0, lit(42L))
          .otherwise(col("id")).as("k"),
        (col("id") % 97).cast("double").as("v"))
  }

  private def withCoalesce[A](on: Boolean)(body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, on.toString)
    try body finally spark.conf.set(key, prev)
  }

  test("global row numbers are a permutation of 0..n-1 over a skewed input, AQE coalescing on AND off") {
    for (coalesce <- Seq(true, false)) withCoalesce(coalesce) {
      val df = graft.plans.Lower.compile(
        "$.t.sort_by(k).enumerate()", _ => skewed)
      val idx = df.select("index").collect().map(_.getLong(0)).sorted
      assert(idx.length == 5000, s"coalesce=$coalesce: ${idx.length} rows")
      assert(idx.sameElements(0L until 5000L),
        s"coalesce=$coalesce: row numbers are not a permutation " +
          s"(head=${idx.take(5).mkString(",")}, last=${idx.last})")
    }
  }

  test("the two consumers share ONE reused range exchange, never coalesced or locally re-read") {
    val df = graft.plans.Lower.compile(
      "$.t.sort_by(k).enumerate()", _ => skewed)
    df.collect()
    val all = nodes(executed(df))
    def isRange(p: SparkPlan): Boolean = p match {
      case s: ShuffleExchangeExec =>
        s.outputPartitioning.isInstanceOf[RangePartitioning]
      case _ => false
    }
    // two stage reads of range-partitioned data …
    val rangeStages = all.collect {
      case s: ShuffleQueryStageExec
        if isRange(s.plan) || (s.plan match {
          case r: ReusedExchangeExec => isRange(r.child)
          case _                     => false
        }) => s
    }
    assert(rangeStages.size >= 2,
      s"expected both consumers to read the range exchange:\n${executed(df)}")
    // … backed by exactly one physical exchange (reuse fired)
    val distinctExchanges = rangeStages.map(_.plan match {
      case r: ReusedExchangeExec => r.child
      case p                     => p
    }).distinct
    assert(distinctExchanges.size == 1,
      s"range exchange not reused — pid join keys may disagree:\n${executed(df)}")
    // … and never re-read through an AQE shuffle read (coalesce/skew
    // splitting of ONE consumer would silently corrupt the pid join)
    val aqeReads = all.collect {
      case a: AQEShuffleReadExec if nodes(a.child).exists {
        case s: ShuffleQueryStageExec => rangeStages.exists(_ eq s)
        case _                        => false
      } => a
    }
    assert(aqeReads.isEmpty,
      s"AQE re-read the user-numbered range exchange:\n${executed(df)}")
  }

  test("runningOverOrder (accumulate) matches the single-window reference on a skewed input, both AQE settings") {
    import org.apache.spark.sql.expressions.Window
    // unique sort key (ties would make the running sum tie-order
    // dependent in ANY engine); skewed VALUE distribution
    val base = spark.range(0, 4000, 1, 8)
      .select(col("id").as("k"), (col("id") % 13).cast("double").as("v"))
    val expect = base
      .withColumn("r", sum("v").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)))
      .select("k", "r").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    for (co <- Seq(true, false)) withCoalesce(co) {
      val got = graft.plans.Lower.runningOverOrder(
          base, Seq(col("k").asc), col("v"), sum,
          (pre, w) => coalesce(pre + w, pre, w), "r")
        .select("k", "r").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.length == 4000)
      got.foreach { case (k, r) =>
        assert(math.abs(r - expect(k)) < 1e-9, s"coalesce=$co k=$k: $r vs ${expect(k)}")
      }
    }
  }
}
