package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.RangeJoin
import scala.jdk.CollectionConverters._

/** RangeJoin vs brute force: the banded interval join and proximity
  * pairs must exactly reproduce the naive O(n·m) predicate evaluation
  * on corpora that straddle band boundaries (points exactly on band
  * edges, intervals spanning 0..many bands, empty build side, ties on
  * the point value, negative coordinates).
  */
class RangeJoinSpec extends SparkSpec {

  private val ptSchema = StructType(Seq(
    StructField("pid", LongType, nullable = false),
    StructField("pt", LongType, nullable = false)))
  private val ivSchema = StructType(Seq(
    StructField("bid", LongType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))

  private def mkDf(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)

  test("intervalJoin matches brute force incl. band-edge points") {
    val pts = (0L until 60L).map(i => Row(i, i * 7 - 100)) // negatives too
    val ivs = Seq(
      Row(1L, -50L, -20L), Row(2L, 0L, 0L),   // degenerate single point
      Row(3L, 10L, 200L),                      // spans many bands
      Row(4L, 100L, 110L), Row(5L, 105L, 130L), // overlapping
      Row(6L, 300L, 310L))                     // matches nothing
    val p = mkDf(pts, ptSchema)
    val b = mkDf(ivs, ivSchema)
    for (w <- Seq(1L, 7L, 64L, 1000L, 0L)) { // 0 = auto width
      val got = RangeJoin.intervalJoin(p, "pt", b, "lo", "hi", w)
        .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        Row(pid: Long, pt: Long) <- pts
        Row(bid: Long, lo: Long, hi: Long) <- ivs
        if pt >= lo && pt <= hi
      } yield (pid, bid)).toSet
      assert(got == want, s"width=$w")
    }
  }

  test("proximityPairs matches brute force, each pair exactly once") {
    val pts = Seq(0L, 1L, 5L, 10L, 10L, 11L, 29L, 30L, 31L, 100L, -7L, -40L)
      .zipWithIndex.map { case (p, i) => Row(i.toLong, p) }
    val df = mkDf(pts, ptSchema).withColumnRenamed("pid", "id")
    val got = RangeJoin.proximityPairs(df, "id", "pt", radius = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      Row(ia: Long, pa: Long) <- pts
      Row(ib: Long, pb: Long) <- pts
      if ia < ib && math.abs(pb - pa) <= 10L
    } yield (ia, ib, pb - pa)).toSet
    assert(got.toSet == want)
    assert(got.length == want.size, "no duplicate pairs")
  }
}
