package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Bloom

/** Contract of the Bloom-pruned joins: bit-identical results to the
  * plain semi/anti join at ANY false-positive rate (the probe has no
  * false negatives and every survivor is re-checked), plus the raw
  * probe's no-false-negative property itself. */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private lazy val orders = Tables.orders(spark, sf)
  private lazy val goodCust = Tables.customer(spark, sf)
    .where(col("c_acctbal") > 5000)

  test("semiPruned == plain left_semi, even at an absurd fpp") {
    val plain = orders
      .join(goodCust, orders("o_custkey") === goodCust("c_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted
    for (fpp <- Seq(0.5, 0.03)) {
      val pruned = Bloom.semiPruned(
          orders, "o_custkey", goodCust, "c_custkey",
          expectedItems = 10000L, fpp = fpp)
        .select("o_orderkey").as[Long].collect().sorted
      assert(pruned.toSeq == plain.toSeq, s"fpp=$fpp")
    }
    assert(plain.nonEmpty)
  }

  test("antiPruned == plain left_anti, and null keys are kept") {
    val big = orders.select(
      when(col("o_orderkey") % 97 === 0, lit(null).cast("long"))
        .otherwise(col("o_custkey")).as("k"),
      col("o_orderkey"))
    val plain = big
      .join(goodCust, big("k") === goodCust("c_custkey"), "left_anti")
      .select("o_orderkey").as[Long].collect().sorted
    val pruned = Bloom.antiPruned(
        big, "k", goodCust, "c_custkey", expectedItems = 10000L)
      .select("o_orderkey").as[Long].collect().sorted
    assert(pruned.toSeq == plain.toSeq)
    // the nulled keys must all be present (anti join keeps unmatchable rows)
    val nulls = big.where(col("k").isNull).select("o_orderkey")
      .as[Long].collect().toSet
    assert(nulls.nonEmpty && nulls.subsetOf(pruned.toSet))
  }

  test("probe has no false negatives; undersizing only weakens pruning") {
    val keys = (0L until 2000L).toDF("k")
    // deliberately undersized: expectedItems 100 for 2000 inserts
    val bytes = Bloom.buildBytes(keys, col("k"), expectedItems = 100L)
    val misses = keys.where(!Bloom.mightContain(bytes, col("k"))).count()
    assert(misses == 0L, "a member was rejected — false negative")
  }

  test("empty build side: semi empty, anti keeps everything") {
    val none = goodCust.where(lit(false))
    assert(Bloom.semiPruned(orders, "o_custkey", none, "c_custkey", 100L)
      .count() == 0L)
    assert(Bloom.antiPruned(orders, "o_custkey", none, "c_custkey", 100L)
      .count() == orders.count())
  }

  test("the probe predicate evaluates at the big side, before the join") {
    val df = Bloom.semiPruned(orders, "o_custkey", goodCust, "c_custkey", 10000L)
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(s.contains("might_contain"), s)
    // the filter must sit in the orders branch (below the join), not above it
    val joinLine = s.linesIterator.indexWhere(_.contains("Join"))
    val probeLine = s.linesIterator.indexWhere(_.contains("might_contain"))
    assert(joinLine >= 0 && probeLine > joinLine,
      s"probe should appear under the join operator in the tree: $s")
  }
}
