package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Sampling

/** Deterministic sampling semantics: bucket-bound edges (incl. the
  * 256 = "every bucket" bound, where a naive f"%02x" render would
  * lexicographically keep ~17/256), split-bound edges, and the
  * bounded-aggregate stratified sample against the row_number window
  * idiom it replaced. */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("shuffleShards: deterministic, balanced, rank-sorted, no global sort barrier") {
    val n = docs.count()
    val shards = 8
    val a = Sampling.shuffleShards(docs, col("doc_id"), shards, "ep0")
    // total preservation + every shard populated + hash-balanced
    val sizes = a.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == n && sizes.keySet == (0L until shards).toSet)
    val expect = n.toDouble / shards
    sizes.values.foreach(s => assert(math.abs(s - expect) < expect * 0.5, sizes))
    // reruns replay bit-identically; a new seed is a different order
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id", "shard", "shuffle_rank").orderBy("shard", "shuffle_rank")
        .collect().toSeq
    assert(key(a) == key(Sampling.shuffleShards(docs, col("doc_id"), shards, "ep0")))
    assert(key(a) != key(Sampling.shuffleShards(docs, col("doc_id"), shards, "ep1")))
    // rows arrive rank-sorted within each partition (the write order)
    val sortedWithin = a.select("shard", "shuffle_rank")
      .mapPartitions { it =>
        val v = it.map(r => (r.getLong(0), r.getString(1))).toVector
        Iterator.single(v == v.sorted)
      }(org.apache.spark.sql.Encoders.scalaBoolean)
      .collect()
    assert(sortedWithin.forall(identity))
    // the plan is a hash exchange + local sorts — a global range sort
    // (the orderBy(rand) OrderBarrier) must never appear
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"), plan)
  }

  test("sampleByHash bounds: 0 keeps nothing, 256 keeps everything") {
    val n = docs.count()
    assert(Sampling.sampleByHash(docs, col("doc_id"), 0).count() == 0L)
    assert(Sampling.sampleByHash(docs, col("doc_id"), 256).count() == n)
  }

  test("sampleByHash is monotone in pct256 and ~proportional") {
    val n = docs.count().toDouble
    val at64 = Sampling.sampleByHash(docs, col("doc_id"), 64)
    val at128 = Sampling.sampleByHash(docs, col("doc_id"), 128)
    val c64 = at64.count()
    val c128 = at128.count()
    // nested membership: every row kept at 64 is kept at 128
    assert(at64.exceptAll(at128).count() == 0L)
    assert(math.abs(c64 / n - 0.25) < 0.05, s"c64=$c64 n=$n")
    assert(math.abs(c128 / n - 0.50) < 0.05, s"c128=$c128 n=$n")
  }

  test("split with trainHi=valHi=256 assigns every row to train") {
    val splits = docs
      .select(Sampling.split(col("doc_id"), 256, 256).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train"), splits)
  }

  test("split with valHi=256 produces no test rows") {
    val splits = docs
      .select(Sampling.split(col("doc_id"), 204, 256).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val"), splits)
  }

  test("split rejects out-of-order bounds") {
    intercept[IllegalArgumentException] {
      Sampling.split(col("doc_id"), 230, 204)
    }
  }

  test("stratified matches the row_number window idiom row-for-row") {
    val k = 7
    val viaAgg = Sampling.stratified(docs, Seq("lang"), col("doc_id"), k)
      .select("doc_id", "lang")
    val w = Window.partitionBy("lang").orderBy(md5(col("doc_id").cast("string")))
    val viaWindow = docs
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select("doc_id", "lang")
    assert(viaAgg.exceptAll(viaWindow).count() == 0L)
    assert(viaWindow.exceptAll(viaAgg).count() == 0L)
  }

  test("stratified keeps every row of a stratum smaller than k") {
    val tiny = docs.limit(3)
    val out = Sampling.stratified(tiny, Seq("lang"), col("doc_id"), 100)
    assert(out.count() == tiny.count())
  }

  test("stratified: null strata form a stratum; null keys sort first") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("en")), (Some(2L), Some("en")), (Some(3L), Some("en")),
      (Some(10L), None), (Some(11L), None), (Some(12L), None),
      (None, Some("de")), (Some(20L), Some("de")), (Some(21L), Some("de")))
      .toDF("id", "lang")
    val out = Sampling.stratified(df, Seq("lang"), col("id"), k = 2)
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.getString(1))))
    // the null-lang stratum contributes exactly k rows (not zero)
    assert(out.count(_._2.isEmpty) == 2)
    assert(out.count(_._2.contains("en")) == 2)
    // a null key hashes to "" (sorts before every hex digest) so the
    // null-id row is always among de's k survivors
    assert(out.exists(r => r._1.isEmpty && r._2.contains("de")))
    assert(out.length == 6)
  }

  test("mergeSmallK keeps the k smallest distinct values, sorted") {
    val a = List("aa", "cc", "ee")
    val b = List("aa", "bb", "cc", "dd")
    assert(Sampling.mergeSmallK(3, a, b) == List("aa", "bb", "cc"))
    assert(Sampling.mergeSmallK(10, a, b) == List("aa", "bb", "cc", "dd", "ee"))
    assert(Sampling.mergeSmallK(2, Nil, b) == List("aa", "bb"))
    assert(Sampling.mergeSmallK(2, a, Nil) == List("aa", "cc"))
  }
}
