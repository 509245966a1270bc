package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.TopK
import scala.jdk.CollectionConverters._

/** TopK.perGroup vs brute force on data engineered to stress the
  * bounded-buffer merge: value ties (id-asc tiebreak), groups smaller
  * than k, and many partitions so cross-partition merge actually runs.
  */
class TopKSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  test("matches brute force with ties and small groups") {
    val rows = (0 until 500).map { i =>
      // values collide heavily (v in 0..9) → tiebreaks decide ranks
      Row((i % 7).toLong, (i % 10).toDouble, i.toLong)
    } ++ Seq(Row(99L, 5.0, 9001L)) // group with 1 member < k
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), schema).repartition(8)
    val got = TopK.perGroup(df, Seq("g"), "v", "id", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val want = rows.groupBy(_.getLong(0)).flatMap { case (g, rs) =>
      rs.map(r => (r.getDouble(1), r.getLong(2)))
        .sortBy { case (v, id) => (-v, id) }
        .take(3).zipWithIndex
        .map { case ((v, id), i) => (g, (i + 1).toLong, v, id) }
    }.toSet
    assert(got == want)
  }
}
