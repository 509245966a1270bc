package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.AsOf
import scala.jdk.CollectionConverters._

/** AsOf.joinAsOf vs a brute-force in-memory as-of computation, over a
  * corpus with equal-timestamp ties (probe==build), null payload
  * values on the freshest build row, keys with no build rows, and
  * multiple probes between build points. Both inclusive and strict
  * tie semantics are pinned.
  */
class AsOfSpec extends SparkSpec {

  private val probeSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("pid", LongType, nullable = false)))
  private val buildSchema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  // key 1: build at t=10 (v=a), t=20 (v=null!), t=30 (v=c)
  // key 2: no build rows at all
  // key 3: build exactly at the probe times (tie semantics)
  private val builds = Seq(
    (1L, 10L, "a"), (1L, 20L, null), (1L, 30L, "c"),
    (3L, 5L, "x"), (3L, 15L, "y"))
  private val probes = Seq(
    (1L, 5L, 100L), (1L, 10L, 101L), (1L, 15L, 102L), (1L, 25L, 103L),
    (1L, 35L, 104L), (2L, 10L, 200L), (3L, 5L, 300L), (3L, 15L, 301L))

  // Note: a matched-but-null payload and an unmatched probe both
  // surface as null in the joined frame (exactly like SQL ASOF LEFT
  // JOIN) — the null-payload assertions below pin that running-last
  // does NOT skip past a null to an older non-null value.
  private def expected(strict: Boolean): Map[Long, String] =
    probes.map { case (k, t, pid) =>
      val cand = builds.filter(b =>
        b._1 == k && (if (strict) b._2 < t else b._2 <= t))
      pid -> cand.sortBy(_._2).lastOption.map(_._3).orNull
    }.toMap

  private def run(strict: Boolean): Map[Long, String] = {
    val p = spark.createDataFrame(
      new java.util.ArrayList[Row](
        probes.map(x => Row(x._1, x._2, x._3)).asJava), probeSchema)
    val b = spark.createDataFrame(
      new java.util.ArrayList[Row](
        builds.map(x => Row(x._1, x._2, x._3)).asJava), buildSchema)
    AsOf.joinAsOf(p, b, Seq("k"), "t", Seq("v"), strict = strict)
      .collect()
      .map(r => r.getLong(2) -> r.getString(3))
      .toMap
  }

  test("inclusive as-of matches brute force (ties match, null payload kept)") {
    val got = run(strict = false)
    assert(got == expected(strict = false))
    // the null-payload build row must win over the older non-null "a"
    assert(got(103L) == null)
    // tie at t matches inclusively
    assert(got(301L) == "y")
  }

  test("strict as-of excludes equal timestamps") {
    val got = run(strict = true)
    assert(got == expected(strict = true))
    assert(got(300L) == null)   // tie at t=5 excluded
    assert(got(301L) == "x")    // only the strictly-earlier row visible
  }

  test("probe columns pass through and unmatched keys get nulls") {
    val p = spark.createDataFrame(
      new java.util.ArrayList[Row](
        probes.map(x => Row(x._1, x._2, x._3)).asJava), probeSchema)
    val b = spark.createDataFrame(
      new java.util.ArrayList[Row](
        builds.map(x => Row(x._1, x._2, x._3)).asJava), buildSchema)
    val out = AsOf.joinAsOf(p, b, Seq("k"), "t", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "pid", "v"))
    assert(out.where(col("k") === 2).collect().forall(_.getString(3) == null))
    assert(out.count() == probes.size)
  }
}
