package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** approx_count_distinct (HLL++) verification — the estimate cannot
  * hash-match another engine, so it is bounded instead: exact at small
  * cardinalities (HLL++ keeps a sparse exact set well past these
  * sizes) and inside the 3-sigma rsd band everywhere else. The catalog
  * query q_approx_distinct asserts the same band through the DuckDB
  * oracle gate. */
class ApproxDistinctSpec extends SparkSpec {

  test("exact at small cardinalities (sparse HLL++ regime)") {
    // 3 distinct return flags, ≤7 distinct line numbers — far inside
    // the sparse-representation regime where HLL++ stores the observed
    // hashes and the estimate is exact
    val li = Tables.lineitem(spark, sf)
    for (c <- Seq("l_returnflag", "l_linenumber")) {
      val r = li.agg(
        approx_count_distinct(c, 0.05).as("a"),
        countDistinct(col(c)).as("e")).head()
      assert(r.getLong(0) == r.getLong(1), s"$c: ${r.getLong(0)} != ${r.getLong(1)}")
    }
  }

  test("inside the 3-sigma rsd band at the largest sf0.001 cardinality") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.05).as("a"),
        countDistinct("l_partkey").as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e) <= math.max(3 * 0.05 * e, 1.0),
        s"${r.getString(0)}: approx $a vs exact $e outside 3-sigma band")
    }
  }
}
