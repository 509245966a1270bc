package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded value domain — the two-pass
  * corpus pattern (frequent tokens, boilerplate lines, hot URLs/domains)
  * where a plain `groupBy(value).count()` would shuffle one row per
  * DISTINCT value (billions of group keys at 100 TB) just to discard
  * all but the few frequent ones.
  *
  * Pass 1 is a Misra-Gries summary (Agarwal et al., "Mergeable
  * Summaries", PODS'12 merge rule): a bounded map of at most `m`
  * counters per aggregation buffer, combined map-side, so the shuffle
  * carries ≤ m entries per partition and the result is ≤ m candidate
  * values with the guarantee that every value occurring more than
  * N/(m+1) times IS present (no false negatives; counts are lower
  * bounds). Pass 2 semi-joins the tiny candidate set back (broadcast,
  * bounded by m at build time) and counts ONLY those values exactly —
  * the group-by's key domain is now ≤ m, not the distinct-value count.
  *
  * Thresholds are integer fractions (keep values with cnt·denom ≥ N)
  * so the cut replays bit-identically in any engine — no float
  * boundary ties. MG counter budgets grow with the threshold's
  * fineness (m = 2·denom); for very fine thresholds (denom ≫ 10⁴)
  * prefer a sampling or count-min pre-pass instead.
  */
object Frequent {

  /** One Misra-Gries step: count v, evicting via global decrement when
    * all `m` counters are taken. */
  private[graft] def mgReduce(
      m: Int, map: Map[String, Long], v: String): Map[String, Long] =
    if (map.contains(v)) map.updated(v, map(v) + 1L)
    else if (map.size < m) map.updated(v, 1L)
    else map.collect { case (k, c) if c > 1L => k -> (c - 1L) }

  /** Mergeable-summaries combine: sum counters, then subtract the
    * (m+1)-th largest count from all and drop the non-positive — the
    * error of the merged summary stays ≤ N/(m+1) over the COMBINED
    * stream, which is what makes map-side partial aggregation sound. */
  private[graft] def mgMerge(
      m: Int, a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
      sum.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  /** Typed bounded-counter aggregator (≤ m entries per buffer). */
  final class MGAgg(m: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) buf else mgReduce(m, buf, v)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(m, a, b)
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** MG candidate values of `valueCol` with their lower-bound counts:
    * ≤ m rows, containing every value with true count > N/(m+1). */
  def candidates(df: DataFrame, valueCol: String, m: Int): DataFrame = {
    require(m > 0, "m must be positive")
    val agg = udaf(new MGAgg(m))
    df.agg(agg(col(valueCol).cast("string")).as("__mg"))
      .select(explode(col("__mg")).as(Seq("value", "count_lb")))
  }

  /** Exact (value, cnt) for every value with cnt·denom ≥ N (frequency
    * at least 1/denom of non-null rows). m = 2·denom counters makes the
    * MG error ≤ N/(2·denom+1) < N/denom, so recall is GUARANTEED — which
    * is why an m too small for the requested denom is a loud error, not
    * a silent cap. Exactly two scans: pass 1 is one aggregate producing
    * the bounded candidate map AND the total count together (the driver
    * fetch is ≤ m entries — bounded by construction, the same contract
    * as a Bloom build); pass 2 counts only the broadcast candidates. */
  def heavyHitters(df: DataFrame, valueCol: String, denom: Long,
                   m: Int = 0): DataFrame = {
    require(denom > 1, "denom must exceed 1")
    require(m > 0 || denom <= 500000L,
      s"default m = 2*denom would need ${2 * denom} counters; pass m " +
        "explicitly (and mind the memory) for thresholds finer than 1/500000")
    val mm = if (m > 0) m else (2L * denom).toInt
    // the recall guarantee needs the MG error bound N/(mm+1) strictly
    // below the threshold N/denom — an explicit m below denom would
    // silently void the no-false-negative contract, so it is refused
    require(mm >= denom,
      s"m=$mm counters cannot guarantee recall at threshold 1/$denom " +
        "(Misra-Gries error N/(m+1) must fall below N/denom): pass m >= denom")
    val rows = df.select(col(valueCol).cast("string").as("value"))
      .where(col("value").isNotNull)
    val agg = udaf(new MGAgg(mm))
    val pass1 = rows
      .agg(agg(col("value")).as("__mg"), count(lit(1)).as("__n"))
      .select(col("__n"), map_keys(col("__mg")).as("__vals"))
      .head()
    val n = pass1.getLong(0)
    val cand = pass1.getSeq[String](1)
    if (cand.isEmpty) return rows.limit(0)
      .groupBy("value").agg(count(lit(1)).as("cnt"))
    val candDf = df.sparkSession.createDataFrame(
      cand.map(Tuple1(_))).toDF("value")
    rows.join(broadcast(candDf), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * denom >= n)
  }
}
