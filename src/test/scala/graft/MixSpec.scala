package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Mix

/** Contract of corpus mixing: the scarcest targeted group is kept
  * whole, output proportions hit the targets within hash granularity,
  * untargeted groups drop, and membership is deterministic. */
class MixSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
  private val targets = Map("en" -> 0.6, "de" -> 0.2, "fr" -> 0.2)

  test("rates: binding group keeps rate 1.0; T = min(n_g/t_g)") {
    val n = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val caps = targets.map { case (g, t) => g -> n(g) / t }
    val binding = caps.minBy(_._2)._1
    val rates = Mix.rates(docs, "lang", targets)
      .as[(String, Double)].collect().toMap
    assert(rates.keySet == targets.keySet)
    assert(rates(binding) == 1.0)
    val tMin = caps.values.min
    for ((g, r) <- rates)
      assert(math.abs(r - math.min(1.0, targets(g) * tMin / n(g))) < 1e-12)
  }

  test("output proportions match targets within hash granularity; untargeted groups drop") {
    val mixed = Mix.toProportions(docs, "lang", col("doc_id"), targets)
    val got = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got.keySet == targets.keySet) // es/zh dropped
    val total = got.values.sum.toDouble
    for ((g, t) <- targets) {
      val frac = got(g) / total
      // ~64-218 rows per group at sf0.001..sf0.01 → hash noise ~ 1/sqrt(n)
      assert(math.abs(frac - t) < 0.12, s"$g frac=$frac target=$t")
    }
    // schema/column order preserved
    assert(mixed.columns.toSeq == docs.columns.toSeq)
  }

  test("membership is deterministic under repartitioning") {
    val a = Mix.toProportions(docs, "lang", col("doc_id"), targets)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Mix.toProportions(docs.repartition(7), "lang", col("doc_id"), targets)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("temperature: α=1 keeps everything, α→0 flattens toward uniform") {
    val n = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // α = 1: natural proportions → every rate is 1 → identity corpus
    assert(Mix.temperature(docs, "lang", col("doc_id"), 1.0).count() == docs.count())
    // α = 0.5: the scarcest group keeps (near-)all rows, head groups damp
    val t = Mix.temperature(docs, "lang", col("doc_id"), 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val scarcest = n.minBy(_._2)._1
    assert(t(scarcest) >= (n(scarcest) * 0.93).toLong, (n, t))
    // flattening: the head/tail ratio strictly shrinks vs natural
    val head = n.maxBy(_._2)._1
    val natural = n(head).toDouble / n(scarcest)
    val mixed = t(head).toDouble / t(scarcest)
    assert(mixed < natural && mixed >= 0.8 * math.sqrt(natural), (natural, mixed))
    // deterministic under reruns
    val again = Mix.temperature(docs, "lang", col("doc_id"), 0.5)
      .agg(sum("doc_id")).head.getLong(0)
    assert(again == t.keys.toSeq.sorted.headOption.map(_ =>
      Mix.temperature(docs, "lang", col("doc_id"), 0.5)
        .agg(sum("doc_id")).head.getLong(0)).get)
    intercept[IllegalArgumentException] {
      Mix.temperature(docs, "lang", col("doc_id"), 0.0)
    }
    // a degenerate group column fails loudly instead of collecting the
    // corpus's key space on the driver
    val e = intercept[IllegalArgumentException] {
      Mix.temperature(docs, "doc_id", col("doc_id"), 0.5, maxGroups = 10)
    }
    assert(e.getMessage.contains("more than 10 groups"), e.getMessage)
  }

  test("invalid targets are rejected") {
    intercept[IllegalArgumentException] {
      Mix.rates(docs, "lang", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Mix.rates(docs, "lang", Map("en" -> 0.0))
    }
  }

  test("numeric group columns round-trip through rates") {
    import org.apache.spark.sql.functions.{col => c}
    val df = docs.withColumn("g", (c("doc_id") % 3).cast("int"))
    val r = Mix.toProportions(df, "g", c("doc_id"),
      Map("0" -> 0.5, "1" -> 0.25, "2" -> 0.25))
    assert(r.count() > 0)
    assert(r.select("g").distinct().count() == 3)
    // non-integral numeric group column: join coercion must carry the
    // membership check too (1.0 matches target "1"), not a string compare
    val dfd = docs.withColumn("g", (c("doc_id") % 2).cast("double"))
    val rd = Mix.toProportions(dfd, "g", c("doc_id"),
      Map("0" -> 0.5, "1" -> 0.5))
    assert(rd.select("g").distinct().count() == 2)
  }

  test("a targeted group with no rows is a loud error, not a skewed mix") {
    val e = intercept[IllegalArgumentException] {
      Mix.rates(docs, "lang", Map("en" -> 0.5, "xx" -> 0.5))
    }
    assert(e.getMessage.contains("xx"))
  }
}
