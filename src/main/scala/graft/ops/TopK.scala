package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact top-k per group as a typed [[Aggregator]] (custom aggregate
  * function — the Spark-first alternative to the
  * `row_number().over(partitionBy(...)) <= k` idiom).
  *
  * The window idiom shuffles EVERY row to its group's partition and
  * sorts the whole group just to keep k rows. The aggregator instead
  * keeps a bounded k-buffer per group inside partial aggregation:
  * map-side combine reduces each partition to at most k candidates per
  * group BEFORE the shuffle, so the exchange carries ~groups x k rows
  * instead of the full table, no per-group sort ever materialises, and
  * a skewed group costs the same as any other. At 100 TB with
  * k << group size this is the difference between shuffling the table
  * and shuffling the answer.
  *
  * Buffers hold (value, id) pairs ordered desc by value with id as the
  * deterministic tiebreak (smaller id wins at equal values).
  */
object TopK {

  type Pair = (Double, Long)

  private def better(a: Pair, b: Pair): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Merge two desc-ordered candidate lists, keep the best k. Shared
    * with the streaming running-top-k state update (StreamOps). */
  private[graft] def mergeK(k: Int, a: List[Pair], b: List[Pair]): List[Pair] = {
    val out = List.newBuilder[Pair]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  /** Typed aggregator: top `k` (value, id) pairs, desc by value,
    * id-asc tiebreak. Buffer is the ≤k candidate list itself. */
  final class TopKAgg(k: Int) extends Aggregator[Pair, List[Pair], Seq[Pair]] {
    override def zero: List[Pair] = Nil
    override def reduce(buf: List[Pair], in: Pair): List[Pair] = {
      // rejection fast path: once the buffer is full (the steady
      // state), a candidate that does not beat the current k-th entry
      // cannot enter — one allocation-free walk instead of an O(k)
      // list rebuild per row
      var n = 0; var it = buf; var kth: Pair = null
      while (it.nonEmpty && n < k) { kth = it.head; it = it.tail; n += 1 }
      if (n == k && !better(in, kth)) buf
      else mergeK(k, buf, List(in))
    }
    override def merge(a: List[Pair], b: List[Pair]): List[Pair] =
      mergeK(k, a, b)
    override def finish(r: List[Pair]): Seq[Pair] = r
    override def bufferEncoder: Encoder[List[Pair]] =
      ExpressionEncoder[List[Pair]]()
    override def outputEncoder: Encoder[Seq[Pair]] =
      ExpressionEncoder[Seq[Pair]]()
  }

  /** Long-format top-k: one row per (group, rank) with rank 1..k.
    * `valueCol` desc, `idCol` asc tiebreak. */
  def perGroup(
      df: DataFrame, groupCols: Seq[String],
      valueCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = udaf(new TopKAgg(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double"), col(idCol).cast("long"))
        .as("__topk"))
      .select(
        groupCols.map(col) :+
          posexplode(col("__topk")).as(Seq("__r", "__p")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          (col("__r") + 1).cast("long").as("rank"),
          col("__p._1").as(valueCol),
          col("__p._2").as(idCol)): _*)
  }
}
