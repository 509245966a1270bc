package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Foundation slice of the SURVEY §2 inventory: projections, filters,
  * sorts/limits, equi-joins, and the headline aggregations.
  *
  * Each query mirrors a reference operator (cites in Scaladoc per entry)
  * re-expressed declaratively so Catalyst gets pushdown/pruning/top-k
  * for free. See SURVEY.md §2.2–§2.6 mappings.
  */
object CoreQueries extends QueryGroup {

  /** `$.orders.id` field access — SURVEY §2.2 (ast.rs:300). Pure
    * projection; must prune to a 2-column parquet read. */
  private val fieldAccess = q(
    "q_field_access",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey") {
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
  }

  /** `filter(pred)` — SURVEY §2.2 (M:82-91). Conjunctive predicate,
    * pushed to the parquet scan. */
  private val filter0 = q(
    "q_filter",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 150000 && col("o_orderstatus") === "O")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** `map(expr)` projection with arithmetic — SURVEY §2.2 (M:84-85).
    * Exact decimal product (see [[Num]]) rendered as double.
    * (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    * `revenue` completes the total order — without it the tie order was
    * physical-row-order luck on both engines (flushed out when round
    * 11's scan-spread permuted the base scan). */
  private val mapProject = q(
    "q_map_project",
    s"""SELECT l_orderkey, l_linenumber,
      |  CAST(${Num.sqlRevenue("l_extendedprice", "l_discount")} AS DOUBLE) AS revenue
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Num.frevenue(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
        .orderBy("l_orderkey", "l_linenumber", "revenue")
  }

  /** Grouped aggregation suite (`sum/avg/min/max/count`) — SURVEY §2.4.
    * TPC-H Q1 shape: partial aggregation map-side, single shuffle on the
    * two low-cardinality group keys. */
  private val agg1 = q(
    "q1_agg",
    s"""SELECT l_returnflag, l_linestatus,
      |  ${Num.sqlDsum("l_quantity")} AS sum_qty,
      |  ${Num.sqlDsum("l_extendedprice")} AS sum_base,
      |  CAST(SUM(${Num.sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc,
      |  ${Num.sqlDavg("l_quantity")} AS avg_qty,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.fsum(col("l_quantity")).as("sum_qty"),
        Num.fsum(col("l_extendedprice")).as("sum_base"),
        Num.frevenueSum(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc"),
        Num.favg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** `sort(-key).take(k)` top-k — SURVEY §2.6 (ir.rs:197-207). Catalyst
    * plans TakeOrderedAndProject: no full sort, bounded heap per
    * partition then merge — exactly the reference's SortTopK. */
  private val sortTopK = q(
    "q_sort_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
  }

  /** `skip(n).take(m)` — SURVEY §2.6 (M:126-129). */
  private val skipTake = q(
    "q_skip_take",
    """SELECT o_orderkey, o_custkey FROM orders
      |ORDER BY o_orderkey LIMIT 20 OFFSET 100""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
      .offset(100)
      .limit(20)
  }

  /** `equi_join` — SURVEY §2.3 (O:array.rs:489-548). Shuffle hash/SMJ
    * on o_custkey; at scale both sides partition on the join key. */
  private val joinEqui = q(
    "q_join_equi",
    """SELECT o_orderkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** `index_by` + lookup broadcast-join idiom — SURVEY §2.3
    * (SYNTAX.md:666-672). The explicit broadcast hint goes on `nation`,
    * a dimension whose cardinality is bounded (25 rows) at EVERY scale
    * factor — hinting a table that grows with SF (part, supplier) is an
    * executor-OOM risk at 100 TB, so the supplier join is left to the
    * planner/AQE, which broadcasts it at test scale and shuffles it at
    * cluster scale. */
  private val joinBroadcast = q(
    "q_join_broadcast",
    s"""SELECT n_name,
      |  CAST(SUM(${Num.sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    l.join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy("n_name")
      .agg(
        Num.frevenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** semi-join (`filter(other.includes(key))` idiom) — SURVEY §2.3. */
  private val joinSemi = q(
    "q_join_semi",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** anti-join (`filter(not other.includes(key))`) — SURVEY §2.3. */
  private val joinAnti = q(
    "q_join_anti",
    """SELECT c_custkey, c_nationkey FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")
      .orderBy("c_custkey")
  }

  /** `count_by(key)` — SURVEY §2.4 (M:70-71). */
  private val countBy = q(
    "q_count_by",
    """SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
  }

  /** `group_by(key)` materialising per-group arrays — SURVEY §2.4
    * (M:68-69, D:1242). Sorted inside each group for determinism. */
  private val groupCollect = q(
    "q_group_collect",
    """SELECT c_nationkey, array_to_string(list_sort(list(c_custkey)), ',') AS custs
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) {
    (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(array_join(sort_array(collect_list("c_custkey")), ",").as("custs"))
        .orderBy("c_nationkey")
  }

  /** `unique()` — SURVEY §2.6 (M:94-97). */
  private val unique0 = q(
    "q_unique",
    "SELECT DISTINCT c_mktsegment AS seg FROM customer ORDER BY seg") {
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment").as("seg"))
        .distinct()
        .orderBy("seg")
  }

  /** min/max/avg per group — SURVEY §2.4 (M:48-53). */
  private val minMax = q(
    "q_minmax",
    s"""SELECT c_nationkey,
      |  MIN(c_acctbal) AS min_bal,
      |  MAX(c_acctbal) AS max_bal,
      |  ${Num.sqlDavg("c_acctbal")} AS avg_bal
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) {
    (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          min("c_acctbal").as("min_bal"),
          max("c_acctbal").as("max_bal"),
          Num.favg(col("c_acctbal")).as("avg_bal"))
        .orderBy("c_nationkey")
  }

  /** `a if c else b` ternary — SURVEY §2.2 (ast.rs:134-142). */
  private val ternary = q(
    "q_ternary",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'big'
      |       WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("small").as("bucket"))
      .orderBy("o_orderkey")
  }

  /** `?? / or(default)` coalesce — SURVEY §2.2 (ast.rs:53-54). */
  private val coalesce0 = q(
    "q_coalesce",
    """SELECT o_orderkey,
      |  COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'was-urgent') AS prio
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        coalesce(
          nullif(col("o_orderpriority"), lit("1-URGENT")),
          lit("was-urgent")).as("prio"))
      .orderBy("o_orderkey")
  }

  /** `as <type>` casts — SURVEY §2.2 (ast.rs:160-166). FLOOR before the
    * int cast: Spark truncates double→long, DuckDB rounds — FLOOR makes
    * both sides explicit and identical. */
  private val casts = q(
    "q_cast",
    """SELECT o_orderkey,
      |  CAST(FLOOR(o_totalprice) AS BIGINT) AS total_int,
      |  CAST(o_orderkey AS VARCHAR) AS key_str
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("total_int"),
        col("o_orderkey").cast("string").as("key_str"))
      .orderBy("o_orderkey")
  }

  /** keep-first `unique_by(key)` — SURVEY §2.6: Spark dropDuplicates
    * keeps an arbitrary row, so keep-first is row_number()==1 over an
    * explicit order (the reference's array order ≈ our key order). */
  private val uniqueBy = q(
    "q_unique_by",
    """SELECT c_nationkey, c_custkey, c_name FROM (
      |  SELECT c_nationkey, c_custkey, c_name,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
      |  FROM customer) WHERE rn = 1
      |ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    // keep-first as a min_by AGGREGATION, not a row_number window: the
    // group key has ~25 values, so a window would put everything in 25
    // tasks; the aggregate reduces map-side and shuffles 25 rows.
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .agg(
        min("c_custkey").as("c_custkey"),
        expr("min_by(c_name, c_custkey)").as("c_name"))
      .orderBy("c_nationkey")
  }

  /** `max_by/min_by` — SURVEY §2.4 (M:64-67). Keys are unique doubles;
    * deterministic without tie-breaks at this data scale. */
  private val maxBy = q(
    "q_max_by",
    """SELECT o_orderpriority,
      |  MAX_BY(o_orderkey, o_totalprice) AS top_order,
      |  MIN_BY(o_orderkey, o_totalprice) AS bottom_order
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          expr("max_by(o_orderkey, o_totalprice)").as("top_order"),
          expr("min_by(o_orderkey, o_totalprice)").as("bottom_order"))
        .orderBy("o_orderpriority")
  }

  def defs: Seq[QueryDef] = Seq(
    fieldAccess, filter0, mapProject, agg1, sortTopK, skipTake,
    joinEqui, joinBroadcast, joinSemi, joinAnti,
    countBy, groupCollect, unique0, minMax,
    ternary, coalesce0, casts, uniqueBy, maxBy)
}
