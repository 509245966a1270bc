package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** SURVEY §2.5 — window / rolling / sequence analytics, re-expressed as
  * Spark window functions. The reference operates positionally over an
  * array (array order = the only order); here the stable sequence is
  * `event_id` within a `user_id` partition, which is the scalable analogue:
  * partitions parallelise per user, and each frame is bounded.
  */
object WindowQueries extends QueryGroup {

  private val winSql =
    "WINDOW w AS (PARTITION BY user_id ORDER BY event_id)"
  private def w = Window.partitionBy("user_id").orderBy("event_id")

  /** events range-partitioned on user_id. One exchange serves the whole
    * family: RangePartitioning(user_id) satisfies the window's
    * ClusteredDistribution(user_id), any post-window groupBy on a
    * user_id-prefixed key, AND the final ORDER BY (user_id, ...) via
    * the prefix rule — so these queries run on a single shuffle where
    * hash-for-window + range-for-sort used to be planned. Hot users are
    * the window's own skew either way. */
  private def evByUser(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).repartitionByRange(col("user_id"))

  /** `rolling_sum/avg/min/max(3)` — M:246-253. Exact decimal window sums
    * (see [[Num]]): deterministic regardless of how the engine folds the
    * frame. */
  private val rolling = q(
    "q_rolling",
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w3 AS DOUBLE) AS roll_sum,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
      |        / COUNT(*) OVER w3, 4) AS roll_avg,
      |  MIN(value) OVER w3 AS roll_min,
      |  MAX(value) OVER w3 AS roll_max
      |FROM events
      |WINDOW w3 AS (PARTITION BY user_id ORDER BY event_id
      |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w3 = w.rowsBetween(-2, 0)
    evByUser(s, d).select(
      col("event_id"), col("user_id"),
      (sum(Num.fx(col("value"))).over(w3) / 100.0).as("roll_sum"),
      round(
        (sum(Num.fx(col("value"))).over(w3) / 100.0) /
          count(lit(1)).over(w3), 4).as("roll_avg"),
      min("value").over(w3).as("roll_min"),
      max("value").over(w3).as("roll_max"))
      .orderBy("user_id", "event_id")
  }

  /** `lag(n)` / `lead(n)` + `diff_window()` — M:254-259. */
  private val lagLead = q(
    "q_lag_lead",
    s"""SELECT event_id, user_id,
      |  LAG(value, 1) OVER w AS prev_v,
      |  LEAD(value, 1) OVER w AS next_v,
      |  value - LAG(value, 1) OVER w AS diff
      |FROM events $winSql ORDER BY user_id, event_id""".stripMargin) {
    (s, d) =>
      evByUser(s, d).select(
        col("event_id"), col("user_id"),
        lag("value", 1).over(w).as("prev_v"),
        lead("value", 1).over(w).as("next_v"),
        (col("value") - lag("value", 1).over(w)).as("diff"))
        .orderBy("user_id", "event_id")
  }

  /** `pct_change()` — M:260-261. Same-operand IEEE division: identical
    * doubles on both engines, no rounding needed. A zero base yields
    * null (jetro O:collection.rs:264 — and ANSI mode would error). */
  private val pctChange = q(
    "q_pct_change",
    s"""SELECT event_id, user_id,
      |  (value - LAG(value, 1) OVER w) / NULLIF(LAG(value, 1) OVER w, 0) AS pct
      |FROM events $winSql ORDER BY user_id, event_id""".stripMargin) {
    (s, d) =>
      evByUser(s, d).select(
        col("event_id"), col("user_id"),
        ((col("value") - lag("value", 1).over(w)) /
          nullif(lag("value", 1).over(w), lit(0))).as("pct"))
        .orderBy("user_id", "event_id")
  }

  /** `cum_max()` / `cum_min()` — M:262-265. */
  private val cumExtrema = q(
    "q_cum_extrema",
    """SELECT event_id, user_id,
      |  MAX(value) OVER wc AS cmax, MIN(value) OVER wc AS cmin
      |FROM events
      |WINDOW wc AS (PARTITION BY user_id ORDER BY event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val wc = w.rowsBetween(Window.unboundedPreceding, 0)
    evByUser(s, d).select(
      col("event_id"), col("user_id"),
      max("value").over(wc).as("cmax"),
      min("value").over(wc).as("cmin"))
      .orderBy("user_id", "event_id")
  }

  /** `zscore()` — M:266-267 (O:collection.rs:322): per-group mean and
    * sample stddev from exact decimal sums so both engines see identical
    * doubles before the final subtract/divide.
    *
    * Two-pass formulation, NOT `Window.partitionBy(event_type)`: the
    * group key has ~5 values, so a window would funnel 100 TB into 5
    * tasks. The aggregate reduces map-side to 5 tiny rows which then
    * broadcast-join back onto the stream — scales with the cluster. */
  private val zscore = q(
    "q_zscore",
    """SELECT event_id, event_type,
      |  ROUND((value - m) / NULLIF(sqrt((ss - n * m * m) / (n - 1)), 0), 6) AS z
      |FROM events JOIN (
      |  SELECT event_type,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS m,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
      |         AS DOUBLE) AS ss,
      |    COUNT(*) AS n
      |  FROM events GROUP BY event_type) USING (event_type)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val fv = Num.fx(col("value"))
    val stats = Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        ((sum(fv) / 100.0) / count(lit(1))).as("m"),
        (sum(fv * fv) / 10000.0).as("ss"),
        count(lit(1)).as("n"))
    Tables.events(s, d)
      .join(broadcast(stats), Seq("event_type"))
      .select(
        col("event_id"), col("event_type"),
        round(
          (col("value") - col("m")) /
            nullif(sqrt((col("ss") - col("n") * col("m") * col("m")) /
              (col("n") - 1)), lit(0)), 6).as("z"))
      .orderBy("event_id")
  }

  /** `enumerate()` — M:142-143: 0-based index in sequence order. */
  private val enumerate0 = q(
    "q_enumerate",
    s"""SELECT event_id, user_id,
      |  ROW_NUMBER() OVER w - 1 AS idx
      |FROM events $winSql ORDER BY user_id, event_id""".stripMargin) {
    (s, d) =>
      evByUser(s, d).select(
        col("event_id"), col("user_id"),
        (row_number().over(w) - 1).cast("long").as("idx"))
        .orderBy("user_id", "event_id")
  }

  /** `pairwise()` — M:144-145: consecutive (prev, cur) pairs. */
  private val pairwise0 = q(
    "q_pairwise",
    s"""SELECT user_id, LAG(event_id, 1) OVER w AS prev_id, event_id
      |FROM events $winSql
      |QUALIFY LAG(event_id, 1) OVER w IS NOT NULL
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    evByUser(s, d).select(
      col("user_id"),
      lag("event_id", 1).over(w).as("prev_id"),
      col("event_id"))
      .filter(col("prev_id").isNotNull)
      .orderBy("user_id", "event_id")
  }

  /** `chunk(4)` (alias `batch`) — M:148-149: non-overlapping chunks in
    * sequence order, aggregated per chunk. */
  private val chunk0 = q(
    "q_chunk",
    """SELECT user_id, chunk_id, COUNT(*) AS n,
      |  array_to_string(list_sort(list(event_id)), ',') AS ids
      |FROM (SELECT user_id, event_id,
      |        CAST((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1)
      |             // 4 AS BIGINT) AS chunk_id
      |      FROM events)
      |GROUP BY user_id, chunk_id ORDER BY user_id, chunk_id""".stripMargin) {
    (s, d) =>
      evByUser(s, d)
        .withColumn("chunk_id",
          floor((row_number().over(w) - 1) / 4).cast("long"))
        .groupBy("user_id", "chunk_id")
        .agg(
          count(lit(1)).as("n"),
          array_join(sort_array(collect_list("event_id")), ",").as("ids"))
        .orderBy("user_id", "chunk_id")
  }

  /** `window(3)` sliding windows — M:146-147: materialised frames. */
  private val sliding = q(
    "q_window_sliding",
    """SELECT event_id, user_id,
      |  array_to_string(list(event_id) OVER w3, ',') AS frame
      |FROM events
      |WINDOW w3 AS (PARTITION BY user_id ORDER BY event_id
      |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w3 = w.rowsBetween(-2, 0)
    evByUser(s, d).select(
      col("event_id"), col("user_id"),
      array_join(collect_list("event_id").over(w3), ",").as("frame"))
      .orderBy("user_id", "event_id")
  }

  /** `accumulate(+, 0)` running fold — M:160-161: exact decimal running
    * sum rendered as double. */
  private val accumulate0 = q(
    "q_accumulate",
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wc AS DOUBLE) AS running
      |FROM events
      |WINDOW wc AS (PARTITION BY user_id ORDER BY event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val wc = w.rowsBetween(Window.unboundedPreceding, 0)
    evByUser(s, d).select(
      col("event_id"), col("user_id"),
      (sum(Num.fx(col("value"))).over(wc) / 100.0).as("running"))
      .orderBy("user_id", "event_id")
  }

  def defs = Seq(
    rolling, lagLead, pctChange, cumExtrema, zscore, enumerate0,
    pairwise0, chunk0, sliding, accumulate0)
}
