package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Spark-native capability upside beyond the reference's catalog.
  *
  * SURVEY §2.4/§2.5 note the reference has NO grouping sets / cube /
  * rollup, no percentile/median, no stddev/variance, and no ranking
  * functions (rank/dense_rank/ntile) — a user migrating from the
  * reference gains these for free because Catalyst implements them
  * natively (partial-aggregable `Expand` for rollup/cube, a single-pass
  * sort-based exact percentile, window ranking without materialising
  * per-group arrays). Exposing them as catalog queries makes the upside
  * a verified part of the engine surface rather than a claim.
  */
object NativeUpsideQueries extends QueryGroup {

  /** `ROLLUP(a, b)` — subtotals + grand total in one Expand pass (one
    * shuffle, 3× the group rows — no per-level rescan of lineitem). */
  private val rollup0 = q(
    "q_rollup",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), Num.fsum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** `CUBE(a, b)` — all 2^k grouping sets in one pass. */
  private val cube0 = q(
    "q_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`) + sample stddev/variance per group. Rounded on
    * both sides: the aggregation tree shape differs between engines. */
  private val stats0 = q(
    "q_percentile_stats",
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
      |  ROUND(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price,
      |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
      |  ROUND(var_samp(l_quantity), 4) AS var_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95_price"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"))
        .orderBy("l_returnflag")
  }

  /** Ranking window functions — rank / dense_rank / ntile / row_number
    * partitioned by event type. Tie-broken on event_id so both engines
    * order identically. Partition-parallel: one shuffle on the
    * partition key, per-partition sort, no global barrier. */
  private val rank0 = q(
    "q_rank",
    """SELECT event_type, event_id,
      |  rank()       OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  ntile(4)     OVER w AS quartile,
      |  row_number() OVER w AS rn
      |FROM events WHERE value > 200
      |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
      |ORDER BY event_type, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d)
      .filter(col("value") > 200)
      .select(
        col("event_type"), col("event_id"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        row_number().over(w).as("rn"))
      .orderBy("event_type", "rn")
  }

  /** Array-utility surface (doc-mode `append/flatten/join/index`,
    * O:collection.rs:379-500) in relational form: arrays built per
    * group, then element-level ops via codegen'd collection functions —
    * no UDFs, stays inside whole-stage codegen. */
  private val arrayUtils = q(
    "q_array_utils",
    """WITH g AS (
      |  SELECT event_type, list_sort(list(event_id)) AS ids, MIN(event_id) AS lo
      |  FROM events WHERE value > 250 GROUP BY event_type)
      |SELECT event_type,
      |  array_to_string(list_append(ids, -1), ',') AS appended,
      |  array_to_string(list_prepend(-2, ids), ',') AS prepended,
      |  array_to_string(flatten([ids, [lo]]), ',') AS flat,
      |  array_to_string(ids, ',') AS joined,
      |  CAST(list_position(ids, lo) AS BIGINT) AS pos
      |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("value") > 250)
      .groupBy("event_type")
      .agg(
        sort_array(collect_list("event_id")).as("ids"),
        min("event_id").as("lo"))
      .select(
        col("event_type"),
        array_join(concat(col("ids"), array(lit(-1L))), ",").as("appended"),
        array_join(concat(array(lit(-2L)), col("ids")), ",").as("prepended"),
        array_join(flatten(array(col("ids"), array(col("lo")))), ",").as("flat"),
        array_join(col("ids"), ",").as("joined"),
        array_position(col("ids"), col("lo")).as("pos"))
      .orderBy("event_type")
  }

  /** Salted skew join (graft.ops.Skew): events fan out on the 5-value
    * event_type key — the canonical hot-key shape. The salted plan must
    * return exactly what the plain join returns (the oracle computes the
    * plain join); only the shuffle distribution differs. Broadcast is
    * disabled for the dim side via a shuffle hint so the salt actually
    * exercises the hash-join path at test scale. */
  private val skewJoin = q(
    "q_skew_salted_join",
    """SELECT e.event_id, d.label FROM events e
      |JOIN (SELECT DISTINCT event_type, UPPER(event_type) AS label
      |      FROM events) d USING (event_type)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val dim = events.select(col("event_type")).distinct()
      .withColumn("label", upper(col("event_type")))
      .hint("shuffle_hash")
    graft.ops.Skew
      .saltedJoin(events, dim, "event_type", salts = 8, saltOn = Seq("event_id"))
      .select("event_id", "label")
      .orderBy("event_id")
  }

  /** Batch sessionization (§2.10 analogue of StreamOps.sessionize):
    * gaps-and-islands — a new session starts when the gap to the
    * previous event exceeds 30 minutes; one window pass assigns ids,
    * one aggregation summarises. The same result the streaming session
    * window produces once the watermark closes. */
  private val sessionize = q(
    "q_sessionize",
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
      |         OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM marked)
      |SELECT user_id, sid, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("new_s",
          when(unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)) > 1800
            || lag("ts", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sid", sum("new_s").over(wRun))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"), Num.fsum(col("value")).as("total"))
        .orderBy("user_id", "sid")
  }

  def defs = Seq(rollup0, cube0, stats0, rank0, arrayUtils, skewJoin, sessionize)
}
