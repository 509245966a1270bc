package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.ops.Frequent

/** Misra-Gries contracts: the no-false-negative guarantee and count
  * error bound of the bounded summary (under real partitioned merges),
  * and exactness of the two-pass heavy hitters against a plain
  * groupBy-count oracle. */
class FrequentSpec extends SparkSpec {

  import spark.implicits._

  // Zipf-ish skewed stream: value v_i with weight ~ 1/(i+1)
  private def zipf(n: Int, domain: Int, seed: Long): Seq[String] = {
    val r = new Random(seed)
    val weights = (0 until domain).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val tot = cum.last
    Seq.fill(n) {
      val x = r.nextDouble() * tot
      s"v${cum.indexWhere(x <= _)}"
    }
  }

  test("MG candidates: every value above N/(m+1) survives; counts are lower bounds within N/(m+1)") {
    val data = zipf(20000, 500, fuzzSeed(42))
    val df = data.toDF("v").repartition(8) // force real partial merges
    val m = 25
    val mg = Frequent.candidates(df, "v", m)
      .as[(String, Long)].collect().toMap
    assert(mg.size <= m)
    val exact = data.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val bound = data.size.toLong / (m + 1)
    for ((v, c) <- exact if c > bound)
      assert(mg.contains(v), s"$v (count $c > $bound) missing from MG summary")
    for ((v, lb) <- mg) {
      val t = exact(v)
      assert(lb <= t && t - lb <= bound, s"$v lb=$lb true=$t bound=$bound")
    }
  }

  test("heavyHitters == exact groupBy-count cut, for several denominators") {
    val data = zipf(30000, 2000, fuzzSeed(7))
    val df = data.toDF("v").repartition(8)
    val n = data.size.toLong
    val exact = data.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    for (denom <- Seq(20L, 100L, 400L)) {
      val got = Frequent.heavyHitters(df, "v", denom)
        .as[(String, Long)].collect().toMap
      val want = exact.filter { case (_, c) => c * denom >= n }
      assert(got == want, s"denom=$denom got=${got.size} want=${want.size}")
    }
  }

  test("nulls are ignored; empty input yields no hitters") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("v")
    val got = Frequent.heavyHitters(df, "v", 2L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L)) // N=3 non-null; a:2*2>=3, b:1*2<3
    assert(Frequent.heavyHitters(df.where(lit(false)), "v", 2L).count() == 0L)
  }

  test("a denom too fine for the default counter budget fails loudly") {
    val df = Seq("a", "b").toDF("v")
    intercept[IllegalArgumentException] {
      Frequent.heavyHitters(df, "v", denom = 1000000L)
    }
    // an explicit m below denom would void the recall guarantee — the
    // guard refuses it rather than silently capping
    intercept[IllegalArgumentException] {
      Frequent.heavyHitters(df, "v", denom = 1000000L, m = 8)
    }
    // m >= denom restores the call (caller owns the memory bound);
    // at N=2 every value clears the 1/1000000 cut and the MG map only
    // ever holds as many entries as distinct values seen
    assert(Frequent.heavyHitters(df, "v", denom = 1000000L, m = 1000000)
      .count() == 2L)
  }

  test("merge rule is associative-enough: one partition == many partitions") {
    val data = zipf(10000, 300, fuzzSeed(99))
    val one = Frequent.heavyHitters(data.toDF("v").coalesce(1), "v", 50L)
      .as[(String, Long)].collect().toMap
    val many = Frequent.heavyHitters(data.toDF("v").repartition(16), "v", 50L)
      .as[(String, Long)].collect().toMap
    assert(one == many)
  }

  test("the exact pass groups only the candidate set (partial agg, no wide groupBy)") {
    val df = zipf(5000, 100, 1L).toDF("v")
    val plan = Frequent.heavyHitters(df, "v", 20L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan) // candidate semi-join broadcasts, never shuffles the stream side
  }
}
