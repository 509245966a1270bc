package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.plans.Lower

/** Queries expressed in the jetro language itself and compiled by
  * [[graft.plans.Lower]] into Catalyst plans — the end-to-end proof
  * that the engine's relational mode (SURVEY §7.0 mode 1) works inside
  * the DuckDB correctness gate, not just in unit tests. Each entry's
  * oracle describes the same semantics in ANSI SQL.
  */
object LoweredQueries extends QueryGroup {

  private def lower(s: org.apache.spark.sql.SparkSession, d: String, expr: String) =
    Lower.compile(expr, t => Tables(s, d, t))

  /** The reference README's headline pipeline shape, compiled. */
  private val headline = q(
    "q_lower_pipeline",
    """SELECT o_orderkey AS id, o_totalprice AS total FROM orders
      |WHERE o_orderstatus = 'O'
      |ORDER BY o_orderkey DESC LIMIT 5""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.orders{o_orderstatus == "O"}
        |.sort_by(-o_orderkey).take(5)
        |.map({id: o_orderkey, total: o_totalprice})""".stripMargin)
  }

  /** filter + count through the compiler (demand ≈ ValueNeed::None —
    * Catalyst prunes every column out of the scan). */
  private val aggCount = q(
    "q_lower_count",
    """SELECT CAST(COUNT(*) AS BIGINT) AS count FROM lineitem
      |WHERE l_quantity > 45 AND l_discount < 0.02""".stripMargin) { (s, d) =>
    lower(s, d, "$.lineitem.filter(l_quantity > 45 and l_discount < 0.02).count()")
  }

  /** count_by through the compiler; deterministic order imposed after
    * compilation (jetro objects are insertion-ordered; tables aren't). */
  private val countBy = q(
    "q_lower_count_by",
    """SELECT c_mktsegment AS key, COUNT(*) AS n FROM customer
      |GROUP BY key ORDER BY key""".stripMargin) { (s, d) =>
    lower(s, d, "$.customer.count_by(c_mktsegment)").orderBy("key")
  }

  /** Scalar-function + f-string projection through the compiler. */
  private val scalars = q(
    "q_lower_scalars",
    """SELECT s_suppkey AS k, UPPER(s_name) AS up,
      |  's' || s_suppkey AS tag,
      |  CASE WHEN s_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sign
      |FROM supplier ORDER BY k""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.supplier.map({k: s_suppkey, up: s_name.upper(), tag: f"s{s_suppkey}",
        |  sign: "neg" if s_acctbal < 0 else "pos"})""".stripMargin)
      .orderBy("k")
  }

  /** Nested comprehension (cross join + equi predicate) through the
    * compiler — Catalyst plans it as a broadcast equi-join. */
  private val comp = q(
    "q_lower_comp",
    """SELECT n.n_name AS nname, r.r_name AS rname
      |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY nname""".stripMargin) { (s, d) =>
    lower(s, d,
      """[{nname: n.n_name, rname: r.r_name}
        | for n in $.nation for r in $.region
        | if n.n_regionkey == r.r_regionkey]""".stripMargin)
      .orderBy("nname")
  }

  /** Index-join idiom through the compiler (broadcast hash join). */
  private val idxJoin = q(
    "q_lower_index_join",
    """SELECT n.n_nationkey AS nkey, r.r_name AS rname
      |FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY nkey""".stripMargin) { (s, d) =>
    lower(s, d,
      """let ridx = $.region.index_by(r_regionkey) in
        |$.nation.map({nkey: n_nationkey, rname: ridx[to_string(n_regionkey)].r_name})""".stripMargin)
      .orderBy("nkey")
  }

  /** group_by + transform_values aggregate idiom through the compiler —
    * fused into one groupBy().agg() (map-side partial aggregation). */
  private val groupAgg = q(
    "q_lower_group_agg",
    """SELECT o_orderpriority AS key,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS value
      |FROM orders GROUP BY key ORDER BY key""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.orders.group_by(o_orderpriority).transform_values(lambda v: v.sum(o_orderkey))")
      .orderBy("key")
  }

  /** `last(n)` through the compiler — reversed-order top-k
    * (TakeOrderedAndProject), re-sorted forward; the `map` before it
    * carries the sequence through the projection as a hidden column. */
  private val lastN = q(
    "q_lower_last",
    """SELECT id FROM (
      |  SELECT o_orderkey AS id FROM orders ORDER BY o_orderkey DESC LIMIT 3)
      |ORDER BY id""".stripMargin) { (s, d) =>
    lower(s, d, "$.orders.sort_by(o_orderkey).map({id: o_orderkey}).last(3)")
  }

  /** `nth(i)` through the compiler — offset+limit on the active order. */
  private val nth0 = q(
    "q_lower_nth",
    """SELECT o_orderkey AS id, o_totalprice AS total FROM orders
      |ORDER BY o_orderkey OFFSET 5 LIMIT 1""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.orders.sort_by(o_orderkey).nth(5).map({id: o_orderkey, total: o_totalprice})")
  }

  /** `rolling_sum(3)` through the compiler. The lane is integral (ids
    * cast to double) so the windowed float sum is exact on both engines
    * regardless of summation association. */
  private val rollingSum = q(
    "q_lower_rolling",
    """SELECT val AS event_id FROM (
      |  SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
      |    CASE WHEN ROW_NUMBER() OVER (ORDER BY event_id) >= 3
      |         THEN SUM(CAST(event_id AS DOUBLE)) OVER
      |              (ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |    END AS val
      |  FROM events WHERE event_id <= 500)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.events{event_id <= 500}.sort_by(event_id).map(event_id).rolling_sum(3)")
  }

  /** `pct_change()` through the compiler (guarded division — no ANSI
    * div-by-zero escape). */
  private val pct = q(
    "q_lower_pct",
    """SELECT val AS event_id FROM (
      |  SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
      |    CASE WHEN LAG(CAST(event_id AS DOUBLE)) OVER (ORDER BY event_id) IS NOT NULL
      |          AND LAG(CAST(event_id AS DOUBLE)) OVER (ORDER BY event_id) <> 0
      |         THEN (CAST(event_id AS DOUBLE)
      |               - LAG(CAST(event_id AS DOUBLE)) OVER (ORDER BY event_id))
      |              / LAG(CAST(event_id AS DOUBLE)) OVER (ORDER BY event_id)
      |    END AS val
      |  FROM events WHERE event_id <= 500 AND event_id > 0)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.events{event_id <= 500 and event_id > 0}.sort_by(event_id).map(event_id).pct_change()")
  }

  /** `pivot(row, col, val)` through the compiler — native Spark pivot;
    * duplicate cells resolve to max (a table has no document order for
    * last-wins to mean anything). */
  private val pivotL = q(
    "q_lower_pivot",
    """SELECT user_id,
      |  MAX(value) FILTER (WHERE event_type = 'click') AS click,
      |  MAX(value) FILTER (WHERE event_type = 'error') AS error,
      |  MAX(value) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  MAX(value) FILTER (WHERE event_type = 'signup') AS signup,
      |  MAX(value) FILTER (WHERE event_type = 'view') AS "view"
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    lower(s, d, "$.events.pivot(user_id, event_type, value)").orderBy("user_id")
  }

  /** Shaped group aggregate through the compiler: a lambda whose body
    * is an object of aggregates fuses into ONE groupBy().agg() — single
    * shuffle, map-side partials for every lane. */
  private val groupShapeL = q(
    "q_lower_group_shape",
    """SELECT o_orderpriority AS key,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS total,
      |  COUNT(*) AS n,
      |  MAX(o_totalprice) AS hi
      |FROM orders GROUP BY key ORDER BY key""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.orders.group_by(o_orderpriority).transform_values(
        |  lambda v: {total: v.sum(o_orderkey), n: v.count(), hi: v.max(o_totalprice)})""".stripMargin)
      .orderBy("key")
  }

  /** `try body else default` through the compiler — the body's ANSI
    * division-by-zero is CAUGHT by the TryOrNull expression (not merely
    * null-coalesced): event_ids divisible by 7 raise, and the else arm
    * supplies -1. */
  private val tryL = q(
    "q_lower_try",
    """SELECT event_id AS id,
      |  COALESCE(100.0 / NULLIF(CAST(event_id % 7 AS DOUBLE), 0), -1) AS safe
      |FROM events ORDER BY id""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.events.map({id: event_id, safe: try (100 / (event_id % 7)) else -1}).sort_by(id)")
  }

  /** `accumulate(+)` through the compiler — seeded running sum over
    * the explicit order (integral lane → exact on both engines). */
  private val accumulateL = q(
    "q_lower_accumulate",
    """SELECT val AS event_id FROM (
      |  SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
      |    CAST(100 + SUM(event_id) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS val
      |  FROM events WHERE event_id <= 500)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.events{event_id <= 500}.sort_by(event_id).map(event_id).accumulate(lambda a, x: a + x, 100)")
  }

  /** `cum_max()` through the compiler — comparison-only running
    * extremum (exact on doubles, no arithmetic). */
  private val cumMax = q(
    "q_lower_cum_max",
    """SELECT val AS value FROM (
      |  SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
      |    MAX(value) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS val
      |  FROM events WHERE event_id <= 500)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.events{event_id <= 500}.sort_by(event_id).map(value).cum_max()")
  }

  /** `lag(2)` through the compiler. */
  private val lagL = q(
    "q_lower_lag",
    """SELECT val AS event_id FROM (
      |  SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
      |    LAG(CAST(event_id AS DOUBLE), 2) OVER (ORDER BY event_id) AS val
      |  FROM events WHERE event_id <= 500)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.events{event_id <= 500}.sort_by(event_id).map(event_id).lag(2)")
  }

  /** Suffix slice `[-n:]` through the compiler — reversed-order top-k
    * re-sorted forward. */
  private val suffixSlice = q(
    "q_lower_suffix_slice",
    """SELECT id FROM (
      |  SELECT o_orderkey AS id FROM orders ORDER BY o_orderkey DESC LIMIT 5)
      |ORDER BY id""".stripMargin) { (s, d) =>
    lower(s, d, "$.orders.sort_by(o_orderkey)[-5:].map({id: o_orderkey})")
  }

  /** `reverse()` through the compiler — flips the active order. */
  private val reverseL = q(
    "q_lower_reverse",
    """SELECT n_nationkey AS k, n_name AS name FROM nation
      |ORDER BY n_nationkey DESC""".stripMargin) { (s, d) =>
    lower(s, d, "$.nation.sort_by(n_nationkey).reverse().map({k: n_nationkey, name: n_name})")
  }

  /** The scalar string-function surface through the compiler, checked
    * cross-engine (DuckDB strpos/regexp agree with the Spark
    * lowerings on literal semantics). */
  private val scalarFns = q(
    "q_lower_scalar_fns",
    """SELECT r_regionkey AS k,
      |  CAST(strpos(r_name, 'A') - 1 AS BIGINT) AS iof,
      |  contains(r_name, 'ME') AS m,
      |  regexp_replace(r_name, 'A', '@') AS rep,
      |  CASE WHEN starts_with(r_name, 'A') THEN r_name[2:] ELSE r_name END AS sp,
      |  CASE WHEN suffix(r_name, 'CA') THEN r_name[1:LENGTH(r_name)-2] ELSE r_name END AS ss,
      |  regexp_full_match(r_name, '[0-9]+') AS num,
      |  regexp_full_match(r_name, '\pL+') AS alpha
      |FROM region ORDER BY k""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.region.sort_by(r_regionkey).map({
        |  k: r_regionkey,
        |  iof: r_name.index_of("A"),
        |  m: r_name.matches("ME"),
        |  rep: r_name.replace("A", "@"),
        |  sp: r_name.strip_prefix("A"),
        |  ss: r_name.strip_suffix("CA"),
        |  num: r_name.is_numeric(),
        |  alpha: r_name.is_alpha()})""".stripMargin)
  }

  /** Patch block through the compiler: per-row guarded rewrite of a
    * column, `@` bound to the old leaf — one projection, no UDF. */
  private val patchL = q(
    "q_lower_patch",
    """SELECT event_id,
      |  CASE WHEN value < 100 THEN value * 2 ELSE value END AS value
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    lower(s, d, "patch $ { events[*].value: @ * 2 when @ < 100 }")
      .select("event_id", "value").orderBy("event_id")
  }

  /** keep-FIRST `unique_by` through the compiler (reference
    * defs.rs:1424-1427): the surviving row's non-key columns prove which
    * row won — DuckDB's arg_min is the keep-first oracle. */
  private val uniqueByL = q(
    "q_lower_unique_by",
    """SELECT n_regionkey, MIN(n_nationkey) AS n_nationkey,
      |  arg_min(n_name, n_nationkey) AS n_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, d) =>
    lower(s, d, "$.nation.sort_by(n_nationkey).unique_by(n_regionkey)")
      .select("n_regionkey", "n_nationkey", "n_name")
      .orderBy("n_regionkey")
  }

  /** last-wins `index_by` through the compiler (reference defs.rs:1328). */
  private val indexByL = q(
    "q_lower_index_by",
    """SELECT user_id, MAX(event_id) AS event_id,
      |  arg_max(value, event_id) AS value
      |FROM events WHERE event_id <= 2000
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    lower(s, d, "$.events{event_id <= 2000}.sort_by(event_id).index_by(user_id)")
      .select("user_id", "event_id", "value")
      .orderBy("user_id")
  }

  /** `enumerate()` through the compiler — 0-based index over the active
    * order ({index, value} objects, Builtins enumerate). */
  private val enumerateL = q(
    "q_lower_enumerate",
    """SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS idx,
      |  c_custkey AS value
      |FROM customer ORDER BY idx""".stripMargin) { (s, d) =>
    lower(s, d, "$.customer.sort_by(c_custkey).map(c_custkey).enumerate()")
      .withColumnRenamed("index", "idx")
      .orderBy("idx")
  }

  /** `chunk(7)` through the compiler — non-overlapping frames in the
    * active order, flattened to a CSV lane for the scalar-only gate. */
  private val chunkL = q(
    "q_lower_chunk",
    """SELECT MIN(c_custkey) AS first,
      |  string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS ids
      |FROM (SELECT c_custkey,
      |        CAST((ROW_NUMBER() OVER (ORDER BY c_custkey) - 1) // 7 AS BIGINT) AS cid
      |      FROM customer)
      |GROUP BY cid ORDER BY first""".stripMargin) { (s, d) =>
    lower(s, d, "$.customer.sort_by(c_custkey).map(c_custkey).chunk(7)")
      .select(
        element_at(col("c_custkey"), 1).as("first"),
        array_join(transform(col("c_custkey"), _.cast("string")), ",").as("ids"))
      .orderBy("first")
  }

  /** `pairwise()` through the compiler — consecutive [prev, cur] pairs
    * in the active order (reference M:142-149; runtime body
    * O:collection.rs:556-582), flattened to two scalar lanes for the
    * gate. */
  private val pairwiseL = q(
    "q_lower_pairwise",
    """SELECT prev, cur FROM (
      |  SELECT LAG(c_custkey) OVER (ORDER BY c_custkey) AS prev,
      |    c_custkey AS cur
      |  FROM customer)
      |WHERE prev IS NOT NULL ORDER BY cur""".stripMargin) { (s, d) =>
    lower(s, d, "$.customer.sort_by(c_custkey).map(c_custkey).pairwise()")
      .select(
        element_at(col("c_custkey"), 1).as("prev"),
        element_at(col("c_custkey"), 2).as("cur"))
      .orderBy("cur")
  }

  /** `window(6)` through the compiler — sliding frames of exactly n in
    * the active order, partial leading frames dropped (reference
    * M:142-149; runtime body O:collection.rs:556-582); frames flattened
    * to a CSV lane for the scalar-only gate. */
  private val windowL = q(
    "q_lower_window",
    """SELECT last, ids FROM (
      |  SELECT c_custkey AS last,
      |    ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn,
      |    string_agg(CAST(c_custkey AS VARCHAR), ',')
      |      OVER (ORDER BY c_custkey ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS ids
      |  FROM customer)
      |WHERE rn >= 6 ORDER BY last""".stripMargin) { (s, d) =>
    lower(s, d, "$.customer.sort_by(c_custkey).map(c_custkey).window(6)")
      .select(
        element_at(col("c_custkey"), 6).as("last"),
        array_join(transform(col("c_custkey"), _.cast("string")), ",").as("ids"))
      .orderBy("last")
  }

  /** `zscore()` through the compiler — whole-sequence population z-score
    * as aggregate + broadcast (no window). Both engines compute in
    * doubles with different summation association → ROUND(6) on both. */
  private val zscoreL = q(
    "q_lower_zscore",
    """SELECT z FROM (
      |  SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
      |    ROUND((value - AVG(value) OVER ()) /
      |          stddev_pop(value) OVER (), 6) AS z
      |  FROM events)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    lower(s, d, "$.events.sort_by(event_id).map(value).zscore()")
      .select(round(col("value"), 6).as("z"))
  }

  /** lowered `group_by` materialising per-group row arrays — the array
    * follows the ACTIVE order (descending here), proving the
    * deterministic-order contract (reference D:1242). */
  private val groupCollectL = q(
    "q_lower_group_collect",
    """SELECT n_regionkey AS key,
      |  string_agg(CAST(n_nationkey AS VARCHAR), ',' ORDER BY n_nationkey DESC) AS ids
      |FROM nation GROUP BY key ORDER BY key""".stripMargin) { (s, d) =>
    lower(s, d, "$.nation.sort_by(-n_nationkey).group_by(n_regionkey)")
      .select(col("key"),
        array_join(transform(col("rows"),
          r => r.getField("n_nationkey").cast("string")), ",").as("ids"))
      .orderBy("key")
  }

  /** `partition(pred)` through the compiler: {"true": […], "false": […]}
    * group arrays in the ACTIVE order (reference regression.rs:351-357),
    * rendered as joined id strings for the scalar-only oracle compare. */
  private val partitionL = q(
    "q_lower_partition",
    """SELECT CASE WHEN c_acctbal > 0 THEN 'true' ELSE 'false' END AS side,
      |  string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS ids
      |FROM customer GROUP BY side ORDER BY side""".stripMargin) { (s, d) =>
    lower(s, d, "$.customer.sort_by(c_custkey).partition(c_acctbal > 0)")
      .select(col("side"),
        array_join(transform(col("rows"),
          r => r.getField("c_custkey").cast("string")), ",").as("ids"))
      .orderBy("side")
  }

  /** `$..key` deep descent through the compiler — the jetro text builds
    * a two-level struct, `..key` expands both matches per row from the
    * plan schema (StructOps.descendantPaths) and flattens pre-order. */
  private val deepL = q(
    "q_lower_deep",
    """SELECT value FROM (
      |  SELECT n_nationkey AS o, 0 AS p, CAST(n_regionkey AS BIGINT) AS value
      |  FROM nation
      |  UNION ALL
      |  SELECT n_nationkey AS o, 1 AS p, CAST(n_regionkey * 10 AS BIGINT) AS value
      |  FROM nation)
      |ORDER BY o, p""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.nation.sort_by(n_nationkey)
        |.map({id: n_nationkey, geo: {key: n_regionkey, inner: {key: n_regionkey * 10}}})
        |..key""".stripMargin)
  }

  /** `..shape({k,…})` through the compiler — schema-directed deep
    * object search: both nested structs carry {key, tag}, the row
    * object does not; every match is a static struct path checked with
    * native per-row predicates (Lower.deepShapeStep), flattened
    * pre-order like the interpreter's walk. */
  private val deepShapeL = q(
    "q_lower_deep_shape",
    """SELECT key, tag FROM (
      |  SELECT n_nationkey AS o, 0 AS p,
      |    CAST(n_regionkey AS BIGINT) AS key, 'g' AS tag FROM nation
      |  UNION ALL
      |  SELECT n_nationkey AS o, 1 AS p,
      |    CAST(n_nationkey + 100 AS BIGINT) AS key, 'm' AS tag FROM nation)
      |ORDER BY o, p""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.nation.sort_by(n_nationkey)
        |.map({id: n_nationkey, geo: {key: n_regionkey, tag: "g"},
        |      meta: {key: n_nationkey + 100, tag: "m"}})
        |..shape({key, tag})""".stripMargin)
  }

  /** `..like({k: lit})` through the compiler — the shape walk plus a
    * null-safe literal equality per key: only the `meta` branch
    * survives `tag == "m"`. */
  private val deepLikeL = q(
    "q_lower_deep_like",
    """SELECT CAST(n_nationkey + 100 AS BIGINT) AS key, 'm' AS tag
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.nation.sort_by(n_nationkey)
        |.map({id: n_nationkey, geo: {key: n_regionkey, tag: "g"},
        |      meta: {key: n_nationkey + 100, tag: "m"}})
        |..like({tag: "m"})""".stripMargin)
  }

  /** `zip(other)` through the compiler — positional row_number join of
    * two independently-ordered (bounded) lanes. */
  private val zipL = q(
    "q_lower_zip",
    """WITH o AS (SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey DESC) AS rn
      |           FROM orders ORDER BY o_orderkey DESC LIMIT 10),
      |     c AS (SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
      |           FROM customer ORDER BY c_custkey LIMIT 10)
      |SELECT o.o_orderkey AS a, c.c_custkey AS b
      |FROM o JOIN c USING (rn) ORDER BY a DESC""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.orders.sort_by(-o_orderkey).take(10).map(o_orderkey)
        |.zip($.customer.sort_by(c_custkey).take(10).map(c_custkey))""".stripMargin)
      .select(
        element_at(col("value"), 1).as("a"),
        element_at(col("value"), 2).as("b"))
      .orderBy(col("a").desc)
  }

  /** `diff(other)` through the compiler — whole-row anti join keeping
    * the receiver's duplicates (reference M:136-137). */
  private val setExceptL = q(
    "q_lower_set_except",
    """SELECT n_regionkey FROM nation
      |WHERE n_regionkey NOT IN
      |  (SELECT r_regionkey FROM region WHERE r_regionkey < 2)
      |ORDER BY n_regionkey""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.nation.map(n_regionkey).diff($.region{r_regionkey < 2}.map(r_regionkey))")
      .orderBy("n_regionkey")
  }

  /** `union(other)` through the compiler — deduped value union. */
  private val setUnionL = q(
    "q_lower_set_union",
    """SELECT n_regionkey AS v FROM nation
      |UNION SELECT r_regionkey FROM region ORDER BY v""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.nation.map({v: n_regionkey}).union($.region.map({v: r_regionkey}))")
      .orderBy("v")
  }

  /** `find_index(pred)` through the compiler — 0-based first-match
    * position over the active order via min(global row number). */
  private val findIndexL = q(
    "q_lower_find_index",
    """SELECT CAST(MIN(CASE WHEN value > 300 THEN idx END) AS BIGINT) AS find_index
      |FROM (SELECT ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS idx, value
      |      FROM events)""".stripMargin) { (s, d) =>
    lower(s, d, "$.events.sort_by(event_id).find_index(value > 300)")
  }

  /** `indices_where(pred)` through the compiler — every matching
    * 0-based position, ascending. */
  private val indicesL = q(
    "q_lower_indices",
    """SELECT idx AS value
      |FROM (SELECT ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS idx, value
      |      FROM events WHERE event_id <= 2000)
      |WHERE value > 250 ORDER BY value""".stripMargin) { (s, d) =>
    lower(s, d, "$.events{event_id <= 2000}.sort_by(event_id).indices_where(value > 250)")
  }

  /** `remove(lambda)` through the compiler — predicate-form removal is
    * a negated filter that keeps null-predicate rows (D:148-163
    * filterNot(truthy)). */
  private val removeL = q(
    "q_lower_remove",
    """SELECT event_id AS id, value AS v FROM events
      |WHERE NOT (value > 450) ORDER BY id""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.events.sort_by(event_id).map({id: event_id, v: value}).remove(x => x.v > 450)")
  }

  /** `implode(field)` through the compiler — rows sharing the residual
    * key collapse into an array that follows the active order
    * (O:collection.rs:525; array flattened to a csv lane for the
    * scalar-only driver compare). */
  private val implodeL = q(
    "q_lower_implode",
    """SELECT t, string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS ids
      |FROM (SELECT event_type AS t, event_id AS id FROM events WHERE value > 250)
      |GROUP BY t ORDER BY t""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.events{value > 250}.map({t: event_type, id: event_id}).sort_by(id).implode("id")""")
      .select(col("t"),
        array_join(transform(col("id"), x => x.cast("string")), ",").as("ids"))
      .orderBy("t")
  }

  /** Comparator-lambda sort (reference examples.rs:411) through the
    * compiler: `λ a,b: K(a) > K(b)` rewrites to the descending key
    * form (Lower.comparatorKey). Key injective over c_custkey (< 7919)
    * so the top-10 cut is deterministic for the oracle. */
  private val sortCmp = q(
    "q_lower_sort_cmp",
    """SELECT c_custkey AS k, c_custkey * 7 % 7919 AS ord FROM customer
      |ORDER BY ord DESC LIMIT 10""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.customer.sort(lambda a, b: a.c_custkey * 7 % 7919 > b.c_custkey * 7 % 7919)
        |.take(10).map({k: c_custkey, ord: c_custkey * 7 % 7919})""".stripMargin)
  }

  /** The distributed per-row fallback rung (Graft.rowwiseCompile): an
    * element-wise pipeline containing `rec` — the one construct with NO
    * relational lowering by design (a fixpoint has no static plan,
    * SURVEY §8; `rec(@)` is the identity fixpoint, converging in one
    * step) — bails out of Lower — but instead of collecting the table
    * on the driver, each row is evaluated by the interpreter against
    * its own singleton `{documents: [row]}` document on the executors
    * (the reference's per-element VM dispatch, defs.rs:74-90). The
    * oracle replays the token-count and blank-test semantics. */
  private val rowwiseFb = q(
    "q_lower_rowwise_fallback",
    """SELECT doc_id AS id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS nw,
      |  trim(text) = '' AS blank
      |FROM documents WHERE lang = 'en' ORDER BY id""".stripMargin) { (s, d) =>
    val e = """$.documents.filter(lang == "en")
              |.map({id: doc_id, nw: text.words().len().rec(@),
              |      blank: text.is_blank().rec(@)})""".stripMargin
    assert(graft.Graft.backend(s, d, e) == "rowwise",
      "expression must exercise the rowwise rung")
    graft.Graft.query(s, d, e).orderBy("id")
  }

  /** `$..field` under MAP values — dynamic keys match at runtime via a
    * map_entries walk in STORED entry order (parquet/from_json keep
    * parse order — the interpreter's insertion-order object walk), so
    * map-typed schemas no longer bail to doc mode. The map column is
    * resolver-shaped (from_json over the events props JSON); the
    * oracle replays the per-row key lookup in event order. */
  private val deepMapL = q(
    "q_lower_deep_map",
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS value
      |FROM events WHERE event_id < 3000 ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile("$.events{event_id < 3000}.sort_by(event_id)..k", _ => ev)
  }

  /** Round-9 MAP lane (Lower.mapMethod): the object builtins over a
    * `map<string, V>` column — keys/values/len, filter/transform,
    * merge/defaults (update-in-place + append order), invert
    * (val_to_key display keys), set/update (2-arg value forms; the
    * 1-arg shapes are chain-WRITES and stay on the document rungs —
    * Lower.isRootChainWrite), rename. Entry-order rules are pinned
    * differentially by MapColumnSpec; this row proves the lane
    * end-to-end against DuckDB's json functions over the same
    * resolver-shaped from_json column q_lower_deep_map uses. */
  private val mapOpsL = q(
    "q_lower_map_ops",
    """SELECT event_id AS id,
      |  array_to_string(json_keys(props), ',') AS ks,
      |  CAST(len(json_keys(props)) AS BIGINT) AS n,
      |  CAST(2 * CAST(json_extract(props, '$.k') AS BIGINT) AS BIGINT) AS tv,
      |  CAST(CAST(json_extract(props, '$.k') AS BIGINT) + 9 AS BIGINT) AS mg,
      |  array_to_string(json_keys(props), ',') || ',z' AS mk,
      |  CAST(CAST(json_extract(props, '$.k') AS BIGINT) + 5 AS BIGINT) AS df,
      |  CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR) AS iv,
      |  CAST(7 AS BIGINT) AS st,
      |  array_to_string(json_keys(props), ',') || ',w' AS s2,
      |  CAST(CAST(json_extract(props, '$.k') AS BIGINT) + 1 AS BIGINT) AS up,
      |  'kk' AS rn
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id,
        |  ks: props.keys().join(","),
        |  n: props.len(),
        |  tv: props.transform_values((@ ?? 0) * 2).values().sum(),
        |  mg: props.transform_values(@).merge({z: 9}).values().sum(),
        |  mk: props.transform_values(@).merge({z: 9}).keys().join(","),
        |  df: props.defaults({k: 0, d: 5}).values().sum(),
        |  iv: props.invert().keys().first(),
        |  st: props.set("k", 7).values().sum(),
        |  s2: props.set("w", 3).keys().join(","),
        |  up: props.update("k", (@ ?? 0) + 1).values().sum(),
        |  rn: props.rename("k", "kk").keys().join(",")})""".stripMargin,
      _ => ev)
  }

  /** Static field access straight into a `map<string,V>` column
    * (`props.k`): GetMapValue is null-on-missing-key even under ANSI —
    * exactly the interpreter's fs.get → JNull — and the lowering now
    * carries V statically, so typed chains (`?? `, arithmetic) keep
    * compiling after the access. The `nope` lane pins the miss path
    * (always-null → coalesce). */
  private val mapFieldL = q(
    "q_lower_map_field",
    """SELECT event_id AS id,
      |  CAST(COALESCE(CAST(json_extract(props,'$.k') AS BIGINT), -1) AS BIGINT) AS v,
      |  CAST(COALESCE(CAST(json_extract(props,'$.k') AS BIGINT), 0) + 1 AS BIGINT) AS s,
      |  CAST(-1 AS BIGINT) AS m
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id,
        |  v: props.k ?? -1,
        |  s: (props.k ?? 0) + 1,
        |  m: props.nope ?? -1})""".stripMargin,
      _ => ev)
  }

  /** Membership over the map lane: the `has` operator and the
    * has/missing/includes method forms, all total-on-data here (the
    * null-receiver/null-item corners are pinned differentially in
    * MapColumnSpec — membership never returns SQL null). */
  private val mapHasL = q(
    "q_lower_map_has",
    """SELECT event_id AS id,
      |  list_contains(json_keys(props),'k') AS h,
      |  NOT list_contains(json_keys(props),'nope') AS m,
      |  list_contains(json_keys(props),'k') AS i
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id,
        |  h: props has "k",
        |  m: props.missing("nope"),
        |  i: props.includes("k")})""".stripMargin,
      _ => ev)
  }

  /** Dot-path ops over the map lane: literal `get_path`/`has_path`
    * walk getField statically (null on miss; has_path = non-null test;
    * null-receiver/null-valued-entry corners pinned in MapColumnSpec). */
  private val getPathL = q(
    "q_lower_get_path",
    """SELECT event_id AS id,
      |  CAST(COALESCE(CAST(json_extract(props,'$.k') AS BIGINT), -1) AS BIGINT) AS v,
      |  list_contains(json_keys(props),'k') AS hp,
      |  NOT list_contains(json_keys(props),'nope') AS np
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id,
        |  v: props.get_path("k") ?? -1,
        |  hp: props.has_path("k"),
        |  np: props.has_path("nope") == false})""".stripMargin,
      _ => ev)
  }

  /** Round-10 STRUCT path-write lane (Lower.structPathMethod): multi-
    * segment literal `set_path`/`del_path`/`del_paths` over struct
    * columns — in-place 2-segment writes, append-at-end new keys,
    * {}-coercion through a non-object intermediate (price is a double),
    * fresh 2-level creation, identity deletes, the del_paths fold, and
    * `has_path` turning constant-false over schema-deleted segments.
    * Null/order corners are pinned differentially in StructPathSpec;
    * this row proves the lane end-to-end against DuckDB replaying each
    * scalar read-back. */
  private val setPathDeepL = q(
    "q_lower_set_path_deep",
    """SELECT o_orderkey AS okey,
      |  o_totalprice * 2 AS disc,
      |  TRUE AS hp,
      |  FALSE AS np,
      |  o_orderkey AS z,
      |  CAST(5 AS BIGINT) AS w,
      |  o_orderstatus AS st,
      |  FALSE AS delp,
      |  o_orderstatus AS st2
      |FROM orders ORDER BY okey""".stripMargin) { (s, d) =>
    val nested = Tables.orders(s, d).select(
      col("o_orderkey").as("okey"),
      struct(col("o_totalprice").as("price"),
        struct(col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio")).as("inner")).as("s"))
    Lower.compile(
      """$.orders.sort_by(okey).map({
        |  okey: okey,
        |  disc: s.set_path("inner.disc", s.price * 2).inner.disc,
        |  hp: s.set_path("inner.disc", 1).has_path("inner.disc"),
        |  np: s.del_path("inner.prio").has_path("inner.prio"),
        |  z: s.set_path("price.z", okey).price.z,
        |  w: s.set_path("extra.deep.w", 5).extra.deep.w,
        |  st: s.del_path("nope.x").inner.st,
        |  delp: s.del_paths(["inner.prio", "price"]).has_path("price"),
        |  st2: s.del_paths(["inner.prio", "price"]).inner.st})""".stripMargin,
      _ => nested)
  }

  /** Round-10 object-valued merge lanes: `deep_merge` recursing
    * schema-directed over STRUCT receivers (Lower.structMergeMethod —
    * in-place updates, appended keys, the shape union embedding both
    * sides) and over `map<string, struct>` columns (Lower.mapMethod),
    * plus shallow `merge`'s whole-value replacement of a common object
    * field. Null/order corners are pinned differentially in
    * StructMergeSpec; this row replays every scalar read-back in
    * DuckDB. */
  private val deepMergeL = q(
    "q_lower_deep_merge",
    """SELECT n_nationkey AS id,
      |  n_name AS nm,
      |  n_nationkey AS ln,
      |  n_regionkey AS d,
      |  n_regionkey + 1 AS e,
      |  CAST(NULL AS VARCHAR) AS mnm,
      |  n_nationkey AS mln,
      |  n_regionkey AS pu,
      |  n_nationkey * 10 AS pw,
      |  n_nationkey AS qu,
      |  CAST(NULL AS INTEGER) AS qw
      |FROM nation ORDER BY id""".stripMargin) { (s, d) =>
    val nested = Tables.nation(s, d).select(
      col("n_nationkey").as("id"),
      struct(struct(col("n_name").as("nm")).as("a"),
        col("n_regionkey").as("dd")).as("x"),
      struct(struct(col("n_nationkey").as("ln")).as("a"),
        (col("n_regionkey") + 1).as("e")).as("y"),
      map(lit("p"), struct(col("n_regionkey").as("u")),
          lit("q"), struct(col("n_nationkey").as("u"))).as("nmap"),
      map(lit("p"), struct((col("n_nationkey") * 10).as("w"))).as("qmap"))
    Lower.compile(
      """$.nation.sort_by(id).map({
        |  id: id,
        |  nm: x.deep_merge(y).a.nm,
        |  ln: x.deep_merge(y).a.ln,
        |  d: x.deep_merge(y).dd,
        |  e: x.deep_merge(y).e,
        |  mnm: x.merge(y).a.nm,
        |  mln: x.merge(y).a.ln,
        |  pu: nmap.deep_merge(qmap).get_path("p.u"),
        |  pw: nmap.deep_merge(qmap).get_path("p.w"),
        |  qu: nmap.deep_merge(qmap).get_path("q.u"),
        |  qw: nmap.deep_merge(qmap).get_path("q.w")})""".stripMargin,
      _ => nested)
  }

  /** Round-10 follow-on: deep `set_path`/`del_path` INTO `map<string,
    * struct>` entries (Lower.mapMethod) — first segment is the map
    * key, the rest walks the one entry's struct; untouched entries
    * re-shape with nulls for appended fields, del_path nulls the leaf
    * inside the entry (≡ absent through the bridge) so the value type
    * never changes. Null/identity corners are pinned differentially in
    * StructMergeSpec; this row replays every scalar read-back in
    * DuckDB. */
  private val mapSetDeepL = q(
    "q_lower_map_set_deep",
    """SELECT n_nationkey AS id,
      |  CAST(99 AS BIGINT) AS pu,
      |  CAST(n_nationkey AS BIGINT) AS qu,
      |  CAST(n_nationkey * 2 AS BIGINT) AS pz,
      |  CAST(NULL AS BIGINT) AS qz,
      |  CAST(7 AS BIGINT) AS zz,
      |  'p,q,zz' AS ks,
      |  CAST(NULL AS INTEGER) AS du,
      |  n_nationkey AS dq,
      |  FALSE AS dh
      |FROM nation ORDER BY id""".stripMargin) { (s, d) =>
    val nested = Tables.nation(s, d).select(
      col("n_nationkey").as("id"),
      map(lit("p"), struct(col("n_regionkey").as("u"), col("n_name").as("v")),
          lit("q"), struct(col("n_nationkey").as("u"), upper(col("n_name")).as("v")))
        .as("m"))
    Lower.compile(
      """$.nation.sort_by(id).map({
        |  id: id,
        |  pu: m.set_path("p.u", 99).get_path("p.u"),
        |  qu: m.set_path("p.u", 99).get_path("q.u"),
        |  pz: m.set_path("p.z", id * 2).get_path("p.z"),
        |  qz: m.set_path("p.z", id * 2).get_path("q.z"),
        |  zz: m.set_path("zz.u", 7).get_path("zz.u"),
        |  ks: m.set_path("zz.u", 7).keys().join(","),
        |  du: m.del_path("p.u").get_path("p.u"),
        |  dq: m.del_path("p.u").get_path("q.u"),
        |  dh: m.del_path("p.u").has_path("p.u")})""".stripMargin,
      _ => nested)
  }

  /** Round-11 deep_merge over MAP-OF-MAP and struct-under-map lanes
    * (Lower.deepMergeType/deepMergeMapCol): the (object, object)
    * collision recursion is schema-directed to the static type's
    * depth — colliding map entries deep-merge per level (x-entries in
    * place, y-only appended — VectorMap `++`), struct values recurse
    * through mergeStructCol including their MAP-typed fields, and a
    * PRESENT-null struct field ≡ absent (bridge) so the other side's
    * value survives. Mixed struct-vs-map collisions and non-unifiable
    * kinds still bail to doc mode. */
  private val deepMergeMapL = q(
    "q_lower_deep_merge_map",
    """SELECT n_nationkey AS id,
      |  n_nationkey AS px,
      |  n_nationkey * 10 AS py,
      |  7 AS pz,
      |  n_regionkey AS qx,
      |  1 AS rw,
      |  'p,q,r' AS ks,
      |  n_nationkey AS ax,
      |  n_regionkey * 2 AS ay,
      |  n_name AS at,
      |  upper(n_name) AS bt,
      |  'a,b' AS sk
      |FROM nation ORDER BY id""".stripMargin) { (s, d) =>
    val nested = Tables.nation(s, d).select(
      col("n_nationkey").as("id"),
      map(lit("p"), map(lit("x"), col("n_nationkey"), lit("y"), col("n_regionkey")),
          lit("q"), map(lit("x"), col("n_regionkey"))).as("m1"),
      map(lit("p"), map(lit("y"), col("n_nationkey") * 10, lit("z"), lit(7)),
          lit("r"), map(lit("w"), lit(1))).as("m2"),
      map(lit("a"), struct(map(lit("x"), col("n_nationkey")).as("im"),
        col("n_name").as("t"))).as("s1"),
      map(lit("a"), struct(map(lit("y"), col("n_regionkey") * 2).as("im"),
            lit(null).cast("string").as("t")),
          lit("b"), struct(map(lit("x"), lit(5)).as("im"),
            upper(col("n_name")).as("t"))).as("s2"))
    Lower.compile(
      """$.nation.sort_by(id).map({
        |  id: id,
        |  px: m1.deep_merge(m2).get_path("p.x"),
        |  py: m1.deep_merge(m2).get_path("p.y"),
        |  pz: m1.deep_merge(m2).get_path("p.z"),
        |  qx: m1.deep_merge(m2).get_path("q.x"),
        |  rw: m1.deep_merge(m2).get_path("r.w"),
        |  ks: m1.deep_merge(m2).keys().join(","),
        |  ax: s1.deep_merge(s2).get_path("a.im.x"),
        |  ay: s1.deep_merge(s2).get_path("a.im.y"),
        |  at: s1.deep_merge(s2).get_path("a.t"),
        |  bt: s1.deep_merge(s2).get_path("b.t"),
        |  sk: s1.deep_merge(s2).keys().join(",")})""".stripMargin,
      _ => nested)
  }

  /** Round-11 MID-path map crossings (Lower.setPathDeepType/Col,
    * delDeepTP): `set_path`/`del_path`/`del_paths` whose literal path
    * crosses a string-keyed MAP level mid-walk, both ways —
    * struct→map→struct (`s.m.p.u`) and map→struct→map (`mm.a.im.x`).
    * The addressed entry rewrites in place (appends at the END when
    * new), untouched entries re-shape into the widened value type with
    * nulls (≡ absent through the bridge), deletes FILTER at a map leaf
    * and NULL OUT inside the shared entry shape, and a walk that dies
    * (missing entry-struct key) is delPath's identity. */
  private val setPathMapMidL = q(
    "q_lower_set_path_map_mid",
    """SELECT n_nationkey AS id,
      |  CAST(99 AS BIGINT) AS su,
      |  CAST(n_nationkey AS BIGINT) AS sq,
      |  CAST(n_nationkey * 2 AS BIGINT) AS sz,
      |  CAST(NULL AS BIGINT) AS zq,
      |  CAST(7 AS BIGINT) AS nw,
      |  'p,q,zz' AS nk,
      |  n_regionkey AS dd,
      |  CAST(NULL AS INTEGER) AS du,
      |  n_nationkey AS dq,
      |  'q' AS dk,
      |  'p,q' AS di,
      |  CAST(5 AS BIGINT) AS iy,
      |  CAST(n_nationkey AS BIGINT) AS ix,
      |  n_name AS it,
      |  FALSE AS dx,
      |  n_name AS dt2
      |FROM nation ORDER BY id""".stripMargin) { (s, d) =>
    val nested = Tables.nation(s, d).select(
      col("n_nationkey").as("id"),
      struct(
        map(lit("p"), struct(col("n_regionkey").as("u"), col("n_name").as("v")),
            lit("q"), struct(col("n_nationkey").as("u"), upper(col("n_name")).as("v")))
          .as("m"),
        col("n_regionkey").as("dd")).as("s"),
      map(lit("a"), struct(map(lit("x"), col("n_nationkey")).as("im"),
        col("n_name").as("t"))).as("mm"))
    Lower.compile(
      """$.nation.sort_by(id).map({
        |  id: id,
        |  su: s.set_path("m.p.u", 99).get_path("m.p.u"),
        |  sq: s.set_path("m.p.u", 99).get_path("m.q.u"),
        |  sz: s.set_path("m.p.z", id * 2).get_path("m.p.z"),
        |  zq: s.set_path("m.p.z", id * 2).get_path("m.q.z"),
        |  nw: s.set_path("m.zz.u", 7).get_path("m.zz.u"),
        |  nk: s.set_path("m.zz.u", 7).m.keys().join(","),
        |  dd: s.set_path("m.p.u", 99).dd,
        |  du: s.del_path("m.p.u").get_path("m.p.u"),
        |  dq: s.del_path("m.p.u").get_path("m.q.u"),
        |  dk: s.del_path("m.p").m.keys().join(","),
        |  di: s.del_path("m.nope.u").m.keys().join(","),
        |  iy: mm.set_path("a.im.y", 5).get_path("a.im.y"),
        |  ix: mm.set_path("a.im.y", 5).get_path("a.im.x"),
        |  it: mm.set_path("a.im.y", 5).get_path("a.t"),
        |  dx: mm.del_path("a.im.x").has_path("a.im.x"),
        |  dt2: mm.del_paths(["a.im.x"]).get_path("a.t")})""".stripMargin,
      _ => nested)
  }

  /** Round-10 object builtins over STRUCT lanes
    * (Lower.structObjMethod): keys/len/values/entries as presence-
    * filtered walks of the static fields, pick/omit as typed subsets,
    * defaults as the precedence mirror of shallow merge, invert via
    * val_to_key display keys. Null/bridge corners pinned differentially
    * in StructMergeSpec; this row replays the scalar read-backs in
    * DuckDB. */
  private val structObjL = q(
    "q_lower_struct_obj",
    """SELECT n_nationkey AS id,
      |  'a,dd' AS ks,
      |  CAST(2 AS BIGINT) AS ln,
      |  n_name || '|' || upper(n_name) AS vs,
      |  CAST(4 AS BIGINT) AS es,
      |  'dd' AS pd,
      |  CAST(1 AS BIGINT) AS om,
      |  CAST(7 AS BIGINT) AS df,
      |  CAST(n_regionkey AS VARCHAR) AS iv,
      |  '{"a":{"nm":"' || n_name || '"},"dd":' || n_regionkey || '}' AS tj,
      |  CAST(2 AS BIGINT) AS fk,
      |  n_name AS uf,
      |  CAST(1 AS BIGINT) AS fky,
      |  upper(n_name) AS tv,
      |  n_regionkey AS tk,
      |  n_name || '|' || CAST(n_regionkey AS VARCHAR) AS hj,
      |  CAST(2 AS BIGINT) AS he,
      |  CAST(n_regionkey AS VARCHAR) AS vj
      |FROM nation ORDER BY id""".stripMargin) { (s, d) =>
    val nested = Tables.nation(s, d).select(
      col("n_nationkey").as("id"),
      struct(struct(col("n_name").as("nm")).as("a"),
        col("n_regionkey").as("dd")).as("x"),
      struct(col("n_name").as("s1"), upper(col("n_name")).as("s2")).as("m2"),
      struct(col("n_name").as("s1"), col("n_regionkey").as("rk")).as("m3"))
    Lower.compile(
      """$.nation.sort_by(id).map({
        |  id: id,
        |  ks: x.keys().join(","),
        |  ln: x.len(),
        |  vs: m2.values().join("|"),
        |  es: m2.entries().flatten().len(),
        |  pd: x.pick("dd").keys().join(","),
        |  om: x.omit("a").len(),
        |  df: x.defaults({q: 7}).q,
        |  iv: x.pick("dd").invert().keys().first(),
        |  tj: x.to_json(),
        |  fk: x.flatten_keys().len(),
        |  uf: x.flatten_keys().unflatten_keys().a.nm,
        |  fky: x.filter_keys(@ == "dd").len(),
        |  tv: m2.transform_values(@.upper()).s1,
        |  tk: x.transform_keys(@.upper()).DD,
        |  hj: m3.values().join("|"),
        |  he: m3.entries().len(),
        |  vj: m3.pick("rk").values().join(",")})""".stripMargin,
      _ => nested)
  }

  /** `.type()/.type_of()` — static per lane (JValue.kind) except the
    * null test; map lanes read "object", their values "number". The
    * null corners (null map → "null", missing key → "null") are pinned
    * differentially in MapColumnSpec. */
  private val typeL = q(
    "q_lower_type",
    """SELECT event_id AS id, 'object' AS tp, 'number' AS tk
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id, tp: props.type(), tk: props.k.type_of()})""".stripMargin,
      _ => ev)
  }

  /** One-segment `set_path`/`del_path(s)` over the map lane — exactly
    * set(k,v) / key removal, with delPath's null-receiver-unchanged
    * rule pinned differentially in MapColumnSpec. */
  private val setPathL = q(
    "q_lower_set_path",
    """SELECT event_id AS id,
      |  CAST(CAST(json_extract(props,'$.k') AS BIGINT) + 42 AS BIGINT) AS sv,
      |  CAST(0 AS BIGINT) AS dn
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id,
        |  sv: props.set_path("z", 42).values().sum(),
        |  dn: props.del_paths(["k", "nope"]).len()})""".stripMargin,
      _ => ev)
  }

  /** `.to_json()`/`.to_string()` over the map lane = recv.render —
    * compact JSON in stored entry order (null/empty/null-value corners
    * pinned differentially in MapColumnSpec). The oracle rebuilds the
    * compact form (DuckDB's JSON cast keeps source spacing). */
  private val toJsonMapL = q(
    "q_lower_map_json",
    """SELECT event_id AS id,
      |  '{"k":' || CAST(json_extract(props,'$.k') AS BIGINT) || '}' AS j
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id)
        |.map({id: event_id, j: props.to_json()})""".stripMargin,
      _ => ev)
  }

  /** Free-function call style `f(x, rest…) ≡ x.f(rest…)` (reference
    * SYNTAX.md free functions; Interp.globalCall catch-all) — the
    * global-call rewrite reuses every method lane. */
  private val freeFnL = q(
    "q_lower_freefn",
    """SELECT event_id AS id, UPPER(event_type) AS u,
      |  CAST(length(event_type) AS BIGINT) AS n,
      |  list_contains(json_keys(props),'k') AS i
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id, u: upper(event_type), n: len(event_type),
        |  i: includes(props, "k")})""".stripMargin,
      _ => ev)
  }

  /** VALUE pipes: `@` threads stage to stage (write-shaped stages and
    * binds stay doc-mode); `| f()` desugars to a method on `@` and the
    * scalar display lane renders to_string. */
  private val pipeL = q(
    "q_lower_pipe",
    """SELECT event_id AS id,
      |  CAST(CAST(json_extract(props,'$.k') AS BIGINT) * 2 + 1 AS BIGINT) AS v,
      |  UPPER(event_type) AS u,
      |  CAST(CAST(json_extract(props,'$.k') AS BIGINT) AS VARCHAR) AS s
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id,
        |  v: ((props.k ?? 0) | @ * 2 | @ + 1),
        |  u: (event_type | upper()),
        |  s: ((props.k ?? 0) | to_string())})""".stripMargin,
      _ => ev)
  }

  /** Global `range` (exclusive upper, wrong-sign/zero step → []) and
    * `chain` (array concat, scalar push-through) — DuckDB's range has
    * the same exclusive-stop contract, so the lists replay directly. */
  private val rangeL = q(
    "q_lower_range",
    """SELECT event_id AS id,
      |  COALESCE(array_to_string(range(CAST(CAST(json_extract(props,'$.k') AS BIGINT) % 5 AS BIGINT)), ','), '') AS r,
      |  CAST(len(range(2, 20, 3)) AS BIGINT) AS n,
      |  CAST(3 AS BIGINT) AS c
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]()).as("props"))
    Lower.compile(
      """$.events{event_id < 3000}.sort_by(event_id).map({
        |  id: event_id,
        |  r: range(props.k % 5).map(@.to_string()).join(","),
        |  n: range(2, 20, 3).len(),
        |  c: chain(range(2), 9).len()})""".stripMargin,
      _ => ev)
  }

  /** Patch writes INTO a `map<string,V>` column (`events[*].props.k`)
    * lower through the map-level rewrite: guarded in-place update on an
    * existing key, append-at-END for a new key (VectorMap `+` order,
    * pinned by the ks lane), `@`/guards reading the pre-batch leaf.
    * Differential branch coverage (null maps, missing keys, deletes)
    * lives in GraftCompileSpec; this row is the end-to-end DuckDB
    * proof on real parquet. */
  private val patchMapL = q(
    "q_lower_patch_map",
    """SELECT event_id AS id,
      |  CASE WHEN CAST(json_extract(props,'$.k') AS BIGINT) < 50
      |       THEN CAST(json_extract(props,'$.k') AS BIGINT) * 2
      |       ELSE CAST(json_extract(props,'$.k') AS BIGINT) END AS k,
      |  CAST(9 AS BIGINT) AS z,
      |  'k,z' AS ks
      |FROM events WHERE event_id < 3000 ORDER BY id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .filter(col("event_id") < 3000)
      .select(col("event_id"),
        from_json(col("props"), "map<string,bigint>",
          new java.util.HashMap[String, String]()).as("props"))
    val patched = Lower.compile(
      """patch $ { events[*].props.k: @ * 2 when @ < 50,
        |          events[*].props.z: 9 }""".stripMargin, _ => ev)
    patched.select(col("event_id").as("id"),
      col("props").getField("k").as("k"),
      col("props").getField("z").as("z"),
      array_join(map_keys(col("props")), ",").as("ks"))
      .orderBy("id")
  }

  /** `{...@, …}` spread-of-row shapes now lower: the spread inserts
    * every column in schema order and a later key overrides IN PLACE
    * (the interpreter's VectorMap-update position rule) — the common
    * "keep the row, add/patch a column" idiom stays one Catalyst
    * projection instead of bailing to doc mode. */
  private val spreadL = q(
    "q_lower_spread",
    """SELECT n_nationkey, LOWER(n_name) AS n_name, n_regionkey,
      |  CAST(n_nationkey * 2 AS BIGINT) AS dbl
      |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.nation.sort_by(n_nationkey)
        |.map({...@, dbl: n_nationkey * 2, n_name: n_name.lower()})""".stripMargin)
  }

  /** `explode(field)` on the rowwise rung: the pipeline contains a
    * non-lowerable builtin (`words()`) so Lower bails, but every stage
    * — including the per-row fan-out of `explode` (reference
    * collection.rs:497-520) — distributes over stream concatenation,
    * so it runs as a distributed per-row interpreter map instead of
    * the capped driver fallback. The oracle replays the tokenize +
    * unnest semantics. */
  private val rowwiseExplode = q(
    "q_rowwise_explode",
    """SELECT id, w FROM (
      |  SELECT doc_id AS id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents WHERE lang = 'en')
      |ORDER BY id, w""".stripMargin) { (s, d) =>
    val e = """$.documents.filter(lang == "en")
              |.map({id: doc_id, w: text.words()}).explode("w")""".stripMargin
    assert(graft.Graft.backend(s, d, e) == "rowwise",
      "expression must exercise the rowwise rung")
    graft.Graft.query(s, d, e).orderBy("id", "w")
  }

  /** Element-wise chain-write (`$.t{pred}.f.modify(@ * 2)`, reference
    * chain-write desugar M:232-235) on the rowwise rung: chain-writes
    * have no relational lowering, but a row-iterating write patches
    * each row independently, so the patched table comes back as
    * distributed rows — non-matching rows pass through unpatched. The
    * oracle replays the guarded in-place update over every column. */
  private val rowwiseSetWrite = q(
    "q_rowwise_setwrite",
    """SELECT doc_id, lang,
      |  CASE WHEN lang = 'en' THEN n_chars * 2 ELSE n_chars END AS n_chars,
      |  source, text
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val e = """$.documents{lang == "en"}.n_chars.modify(@ * 2)"""
    assert(graft.Graft.backend(s, d, e) == "rowwise",
      "expression must exercise the rowwise rung")
    graft.Graft.query(s, d, e).orderBy("doc_id")
  }

  /** `trace_path()` through the compiler — `{path, value}` rows for
    * every leaf in document order (reference Deep.tracePaths): leaf
    * paths enumerate from the static schema at plan time, the `$[i]`
    * row index comes from the distributed global-rn machinery (no
    * OrderBarrier). The oracle replays the path rendering and the
    * (row, leaf pre-order) output order. */
  private val tracePathL = q(
    "q_lower_trace_path",
    """WITH r AS (SELECT c_name, c_mktsegment,
      |    row_number() OVER (ORDER BY c_custkey) - 1 AS i
      |  FROM customer WHERE c_custkey <= 40)
      |SELECT path, value FROM (
      |  SELECT i, 0 AS fo, '$[' || i || '].name' AS path, c_name AS value FROM r
      |  UNION ALL
      |  SELECT i, 1, '$[' || i || '].seg', c_mktsegment FROM r)
      |ORDER BY i, fo""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.customer{c_custkey <= 40}.sort_by(c_custkey).map({name: c_name, seg: c_mktsegment}).trace_path()""")
  }

  /** `$..field` through ARRAY elements — matches inside an array of
    * structs lower with transform+flatten HOFs in element order (no
    * interpreter, no bail); the array itself is built by the new
    * array-literal lowering inside the map shape. The oracle replays
    * the per-row element order with a UNION ALL position column. */
  private val deepArrL = q(
    "q_lower_deep_arr",
    """SELECT v AS value FROM (
      |  SELECT c_custkey AS o, 0 AS p, c_name AS v
      |  FROM customer WHERE c_custkey <= 60
      |  UNION ALL
      |  SELECT c_custkey, 1, c_mktsegment
      |  FROM customer WHERE c_custkey <= 60)
      |ORDER BY o, p""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.customer{c_custkey <= 60}.sort_by(c_custkey)
        |.map({id: c_custkey, kids: [{v: c_name}, {v: c_mktsegment}]})
        |..v""".stripMargin)
  }

  /** `walk(fn)` through the compiler — the kind-guarded scalar-
    * transform subset compiles to ONE projection (string leaves
    * lowered, numbers untouched via the identity branch); the active
    * sort rides on hidden pre-walk copies so transforming the sort
    * key's column cannot reorder the stream. */
  private val walkL = q(
    "q_lower_walk",
    """SELECT LOWER(c_name) AS name, LOWER(c_mktsegment) AS seg,
      |  c_acctbal AS bal
      |FROM customer WHERE c_custkey <= 100
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    lower(s, d,
      """$.customer{c_custkey <= 100}.sort_by(c_custkey)
        |.map({name: c_name, seg: c_mktsegment, bal: c_acctbal})
        |.walk(lambda x: x.lower() if x is string else x)""".stripMargin)
  }

  /** Top-level `walk(fn)` on the ROWWISE rung: the conjunctive guard
    * (`x is string and x != ""`) bails the relational walk lowering
    * (exact-KindIs-only), but the guard still provably maps ARRAY
    * nodes to themselves — the reference applies the lambda to the
    * receiver too (walk_apply root, array.rs:693-737), and a non-array
    * kind guard makes that application identity on both the full
    * stream and the per-row singleton, so the walk distributes. The
    * oracle replays the guarded upper-casing per string leaf. */
  private val rowwiseWalk = q(
    "q_rowwise_walk",
    """SELECT doc_id AS id,
      |  CASE WHEN lang <> '' THEN upper(lang) ELSE lang END AS lg,
      |  CASE WHEN source <> '' THEN upper(source) ELSE source END AS src
      |FROM documents ORDER BY id""".stripMargin) { (s, d) =>
    val e = """$.documents.map({id: doc_id, lg: lang, src: source})
              |.walk(lambda x: x.upper() if x is string and x != "" else x)""".stripMargin
    assert(graft.Graft.backend(s, d, e) == "rowwise",
      "expression must exercise the rowwise rung")
    graft.Graft.query(s, d, e).orderBy("id")
  }

  /** `rec(fn)` (bounded fixpoint, reference rec_apply array.rs:752-755)
    * on the ROWWISE rung: rec has no relational lowering by design (a
    * fixpoint has no static plan), but inside an element-wise map body
    * it runs per row on the executors — here iterated integer
    * subtraction until the guard releases. The oracle replays the
    * fixpoint's closed form (r = 94 + ((c - 101) % 7) for c > 100). */
  private val rowwiseRec = q(
    "q_rowwise_rec",
    """SELECT doc_id AS id,
      |  CAST(CASE WHEN n_chars > 100 THEN 94 + ((n_chars - 101) % 7)
      |       ELSE n_chars END AS BIGINT) AS r
      |FROM documents ORDER BY id""".stripMargin) { (s, d) =>
    val e = """$.documents.map({id: doc_id,
              |  r: n_chars.rec(@ - 7 if @ is number and @ > 100 else @)})""".stripMargin
    assert(graft.Graft.backend(s, d, e) == "rowwise",
      "expression must exercise the rowwise rung")
    graft.Graft.query(s, d, e).orderBy("id")
  }

  /** Round-9 string-builtin surface, scalar tier: Unicode-White_Space
    * trim over constructed whitespace, whole-string capitalize, center,
    * code-point last_index_of, strict to_bool vs lenient parse_bool,
    * ANSI-absorbed parse_int/parse_float, ordered html_escape fold
    * (reference builtins/ops/string.rs; all differentially fuzz-pinned
    * by StringFuzzSpec, here also DuckDB-verified). The receiver
    * literals embed REAL tab characters — the jetro parser reads string
    * bodies raw. */
  private val strEdge = q(
    "q_lower_str_edge",
    """SELECT p_partkey AS k,
      |  regexp_replace(chr(9) || ' ' || p_name || ' ' || chr(9), '^[\s]+|[\s]+$', '', 'g') AS tr,
      |  UPPER(p_name[1]) || LOWER(p_name[2:]) AS cap,
      |  CASE WHEN LENGTH(p_brand) >= 12 THEN p_brand
      |       ELSE repeat('*', (12 - LENGTH(p_brand)) // 2) || p_brand ||
      |            repeat('*', (12 - LENGTH(p_brand)) - (12 - LENGTH(p_brand)) // 2)
      |  END AS ctr,
      |  CAST(CASE WHEN strpos(reverse(p_name), 'd') = 0 THEN -1
      |       ELSE LENGTH(p_name) - strpos(reverse(p_name), 'd') END AS BIGINT) AS lio,
      |  CASE WHEN p_partkey % 3 = 0 THEN true ELSE CAST(NULL AS BOOLEAN) END AS tb,
      |  CASE WHEN p_partkey % 2 = 0 THEN true ELSE false END AS pb,
      |  CASE WHEN p_partkey % 2 = 0 THEN 42 ELSE CAST(NULL AS BIGINT) END AS pi,
      |  CASE WHEN p_partkey % 3 = 0 THEN 150.0 ELSE CAST(NULL AS DOUBLE) END AS pf,
      |  replace(replace(replace(replace(replace('<' || p_name || '&>',
      |    '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '''', '&#39;') AS hesc
      |FROM part WHERE p_partkey < 300 ORDER BY k""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.part{p_partkey < 300}.sort_by(p_partkey).map({\n" +
      "  k: p_partkey,\n" +
      "  tr: (\"\t \" + p_name + \" \t\").trim(),\n" +
      "  cap: p_name.capitalize(),\n" +
      "  ctr: p_brand.center(12, \"*\"),\n" +
      "  lio: p_name.last_index_of(\"d\"),\n" +
      "  tb: (\"true\" if p_partkey % 3 == 0 else \"x\").to_bool(),\n" +
      "  pb: (\" ON \" if p_partkey % 2 == 0 else \"no\").parse_bool(),\n" +
      "  pi: (\" 42 \" if p_partkey % 2 == 0 else \"4 2\").parse_int(),\n" +
      "  pf: (\"1.5e2\" if p_partkey % 3 == 0 else \"x\").parse_float(),\n" +
      "  hesc: (\"<\" + p_name + \"&>\").html_escape()})")
  }

  /** Round-9 string-builtin surface, array tier: non-overlapping
    * literal scan, regex split/first/all in the RE2∩Java dialect,
    * literal-needle contains_any/contains_all, per-code-point chars_of,
    * and Rust str::lines (\r\n normalized, one trailing empty dropped)
    * over a receiver with REAL embedded newline/CR chars. */
  private val strArr = q(
    "q_lower_str_arr",
    """SELECT doc_id AS k,
      |  COALESCE(array_to_string(regexp_extract_all(text, 'the'), '|'), '') AS sc,
      |  array_to_string(regexp_split_to_array(text, ' '), '|') AS rs,
      |  CASE WHEN regexp_matches(text, 's[a-z]+') THEN regexp_extract(text, 's[a-z]+', 0)
      |       ELSE CAST(NULL AS VARCHAR) END AS rm1,
      |  COALESCE(array_to_string(regexp_extract_all(text, '[a-z]*k'), '|'), '') AS rma,
      |  (contains(text, 'spark') OR contains(text, 'hash')) AS ca,
      |  (contains(text, 'the') AND contains(text, 'scan')) AS cal,
      |  array_to_string(regexp_extract_all(lang, '(?s).'), '|') AS ch,
      |  array_to_string(string_split(regexp_replace('l1' || chr(10) || 'l2' || chr(13) || chr(10) || lang,
      |    chr(13) || chr(10), chr(10), 'g'), chr(10)), '|') AS ln
      |FROM documents WHERE doc_id < 200 ORDER BY k""".stripMargin) { (s, d) =>
    val df = lower(s, d,
      "$.documents{doc_id < 200}.sort_by(doc_id).map({\n" +
      "  k: doc_id,\n" +
      "  sc: text.scan(\"the\"),\n" +
      "  rs: text.re_split(\" \"),\n" +
      "  rm1: text.re_match_first(\"s[a-z]+\"),\n" +
      "  rma: text.re_match_all(\"[a-z]*k\"),\n" +
      "  ca: text.contains_any([\"spark\", \"hash\"]),\n" +
      "  cal: text.contains_all([\"the\", \"scan\"]),\n" +
      "  ch: lang.chars_of(),\n" +
      "  ln: (\"l1\nl2\r\n\" + lang).lines()})")
    // the checker compares scalar columns only — display the array
    // columns through the same '|' join as the oracle's array_to_string
    Seq("sc", "rs", "rma", "ch", "ln").foldLeft(df) { (acc, n) =>
      acc.withColumn(n, array_join(col(n), "|")) }
  }

  /** Round-9 caseWords family + line ops, lowered: snake/kebab/camel/
    * pascal_case ride a regex pipeline (camel-boundary mark → separator
    * collapse → strip → lower; reference helpers.rs:9-34), camel/pascal
    * re-capitalize per word with an indexed transform; indent/dedent
    * ride the lines() machinery with an aggregate-min margin. DuckDB
    * replays the same pipeline with RE2 + list lambdas (ASCII data —
    * the Unicode-property edges are StringFuzzSpec's job). */
  private val strCase = q(
    "q_lower_str_case",
    """WITH s AS (
      |  SELECT p_partkey, p_name || ' XMLHttpRequest_v2Beta theQuick-Fox' AS raw,
      |    '  a' || chr(10) || '   ' || p_name || chr(10) || chr(10) || ' x' AS ml
      |  FROM part WHERE p_partkey < 300),
      |sn AS (
      |  SELECT p_partkey, ml,
      |    lower(regexp_replace(regexp_replace(regexp_replace(raw,
      |      '([a-z])([A-Z])', '\1_\2', 'g'), '[\s_-]+', '_', 'g'),
      |      '^_+|_+$', '', 'g')) AS snake
      |  FROM s),
      |w AS (SELECT p_partkey, ml, snake, str_split(snake, '_') AS ws,
      |        string_split(ml, chr(10)) AS ls FROM sn),
      |g AS (SELECT *, COALESCE(list_min(list_transform(list_filter(ls,
      |        x -> NOT regexp_matches(x, '^[\s]*$')),
      |        x -> length(x) - length(regexp_replace(x, '^[\s]+', '')))), 0) AS margin
      |      FROM w)
      |SELECT p_partkey AS k, snake AS sn,
      |  replace(snake, '_', '-') AS kb,
      |  ws[1] || COALESCE(list_aggregate(list_transform(ws[2:],
      |    x -> upper(x[1]) || x[2:]), 'string_agg', ''), '') AS cm,
      |  COALESCE(list_aggregate(list_transform(ws,
      |    x -> upper(x[1]) || x[2:]), 'string_agg', ''), '') AS ps,
      |  list_aggregate(list_transform(ls, x -> '  ' || x), 'string_agg', chr(10)) AS ind,
      |  list_aggregate(list_transform(ls,
      |    x -> CASE WHEN length(x) >= margin THEN x[margin+1:] ELSE x END),
      |    'string_agg', chr(10)) AS ded
      |FROM g ORDER BY k""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.part{p_partkey < 300}.sort_by(p_partkey).map({\n" +
      "  k: p_partkey,\n" +
      "  sn: (p_name + \" XMLHttpRequest_v2Beta theQuick-Fox\").snake_case(),\n" +
      "  kb: (p_name + \" XMLHttpRequest_v2Beta theQuick-Fox\").kebab_case(),\n" +
      "  cm: (p_name + \" XMLHttpRequest_v2Beta theQuick-Fox\").camel_case(),\n" +
      "  ps: (p_name + \" XMLHttpRequest_v2Beta theQuick-Fox\").pascal_case(),\n" +
      "  ind: (\"  a\n   \" + p_name + \"\n\n x\").indent(2),\n" +
      "  ded: (\"  a\n   \" + p_name + \"\n\n x\").dedent()})")
  }

  /** Round-9 regex first-match family: native expressions
    * (functions/RegexFirst.scala) running the interpreter's exact
    * java.util.regex calls — replace-FIRST (regexp_replace is
    * replace-all in Spark), first-match capture groups as an array,
    * all-match capture rows. DuckDB replays via RE2's
    * first-match-by-default regexp_replace and guarded regexp_extract
    * (the unmatched-optional-group null, which RE2 cannot replay, is
    * pinned differentially by StringFuzzSpec instead). */
  private val regexFirstL = q(
    "q_lower_regex_first",
    """SELECT doc_id AS k,
      |  regexp_replace(text, '\s+', '_') AS rf,
      |  CASE WHEN regexp_matches(text, '(\w+)\s+(\w+)')
      |       THEN regexp_extract(text, '(\w+)\s+(\w+)', 1) END AS g1,
      |  CASE WHEN regexp_matches(text, '(\w+)\s+(\w+)')
      |       THEN regexp_extract(text, '(\w+)\s+(\w+)', 2) END AS g2,
      |  CASE WHEN regexp_matches(text, '[aeiou]+')
      |       THEN regexp_extract(text, '[aeiou]+', 0) END AS m0,
      |  CAST(len(regexp_extract_all(text, '(\w+)', 0)) AS BIGINT) AS n
      |FROM documents WHERE doc_id < 300 ORDER BY k""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.documents{doc_id < 300}.sort_by(doc_id).map({\n" +
      "  k: doc_id,\n" +
      "  rf: text.re_replace(\"\\s+\", \"_\"),\n" +
      "  g1: text.re_captures(\"(\\w+)\\s+(\\w+)\").nth(1),\n" +
      "  g2: text.re_captures(\"(\\w+)\\s+(\\w+)\").last(),\n" +
      "  m0: text.re_captures(\"[aeiou]+\").first(),\n" +
      "  n: text.re_captures_all(\"(\\w+)\").len()})")
  }

  /** Round-9 array-lane widening, structural tier: element pushes,
    * splices, positional search (val_to_key equality), prefix cuts,
    * reshapes (window/chunk/pairwise), zips and keyed set ops — all as
    * higher-order-function pipelines over a per-row `split` lane
    * (reference builtins/ops/collection.rs; differentially pinned by
    * DocColumnSpec, here DuckDB-verified end-to-end). Arrays surface
    * as scalars (joins/lens/firsts) because the gate hashes scalar
    * cells only. */
  private val arrOps = q(
    "q_lower_arr_ops",
    """WITH s AS (
      |  SELECT doc_id, str_split(text, ' ') AS ws, str_split(lang, '-') AS lg
      |  FROM documents WHERE doc_id < 300),
      |c AS (
      |  SELECT *, ws[1:4] || ws[3:6] AS cat,
      |    list_filter(ws[1:6], x -> list_contains(ws[4:9], x)) AS itf,
      |    list_position(ws, 'the') AS pos
      |  FROM s)
      |SELECT doc_id AS k,
      |  COALESCE(array_to_string(ws[2:4], '|'), '') AS sl,
      |  COALESCE(array_to_string(list_filter(ws, x -> x != 'the'), '|'), '') AS rm,
      |  COALESCE(array_to_string(list_filter(ws, x -> length(x) >= 4), '|'), '') AS rl,
      |  CAST(NULLIF(pos, 0) - 1 AS BIGINT) AS io,
      |  CAST(len(list_filter(ws, x -> x = 'the')) AS BIGINT) AS ic,
      |  CAST(NULLIF(pos, 0) - 1 AS BIGINT) AS i0,
      |  COALESCE(array_to_string(lg || ['z'], '|'), '') AS ap,
      |  COALESCE(array_to_string(['x'] || lg, '|'), '') AS pp,
      |  COALESCE(array_to_string(list_filter(cat, (x, i) -> list_position(cat, x) = i), '|'), '') AS un,
      |  COALESCE(array_to_string(list_filter(ws[1:6], x -> NOT list_contains(ws[1:2], x)), '|'), '') AS df,
      |  COALESCE(array_to_string(list_filter(itf, (x, i) -> list_position(itf, x) = i), '|'), '') AS it,
      |  CAST(CASE WHEN pos = 0 THEN len(ws) ELSE pos - 1 END AS BIGINT) AS tw,
      |  CAST(len(ws) - CASE WHEN pos = 0 THEN len(ws) ELSE pos - 1 END AS BIGINT) AS dw,
      |  CASE WHEN len(ws) >= 3 THEN array_to_string(ws[1:3], ',') ELSE '' END AS w1,
      |  CAST(GREATEST(len(ws) - 2, 0) AS BIGINT) AS wc,
      |  CASE WHEN len(ws) = 0 THEN ''
      |       ELSE array_to_string(ws[(CAST(ceil(len(ws) / 4.0) AS INT) - 1) * 4 + 1 : len(ws)], ',')
      |  END AS cl,
      |  CAST(ceil(len(ws) / 4.0) AS BIGINT) AS cc,
      |  CAST(GREATEST(len(ws) - 1, 0) AS BIGINT) AS pw,
      |  CASE WHEN len(ws) = 0 THEN '' ELSE ws[1] || ',' || ws[len(ws)] END AS z1,
      |  (list_filter(ws, x -> length(x) > 5))[1] AS ff
      |FROM c ORDER BY k""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.documents{doc_id < 300}.sort_by(doc_id).map({\n" +
      "  k: doc_id,\n" +
      "  sl: text.split(\" \").slice(1, 4).join(\"|\"),\n" +
      "  rm: text.split(\" \").remove(\"the\").join(\"|\"),\n" +
      "  rl: text.split(\" \").remove(lambda x: x.len() < 4).join(\"|\"),\n" +
      "  io: text.split(\" \").index_of(\"the\"),\n" +
      "  ic: text.split(\" \").indices_of(\"the\").len(),\n" +
      "  i0: text.split(\" \").indices_of(\"the\").first(),\n" +
      "  ap: lang.split(\"-\").append(\"z\").join(\"|\"),\n" +
      "  pp: lang.split(\"-\").prepend(\"x\").join(\"|\"),\n" +
      "  un: text.split(\" \").slice(0, 4).union(text.split(\" \").slice(2, 6)).join(\"|\"),\n" +
      "  df: text.split(\" \").slice(0, 6).diff(text.split(\" \").slice(0, 2)).join(\"|\"),\n" +
      "  it: text.split(\" \").slice(0, 6).intersect(text.split(\" \").slice(3, 9)).join(\"|\"),\n" +
      "  tw: text.split(\" \").take_while(@ != \"the\").len(),\n" +
      "  dw: text.split(\" \").drop_while(@ != \"the\").len(),\n" +
      "  w1: text.split(\" \").window(3).first().join(\",\"),\n" +
      "  wc: text.split(\" \").window(3).len(),\n" +
      "  cl: text.split(\" \").chunk(4).last().join(\",\"),\n" +
      "  cc: text.split(\" \").chunk(4).len(),\n" +
      "  pw: text.split(\" \").pairwise().len(),\n" +
      "  z1: text.split(\" \").zip(text.split(\" \").reverse()).first().join(\",\"),\n" +
      "  ff: text.split(\" \").find_first(@.len() > 5)})")
  }

  /** Round-9 array-lane widening, numeric-sequence tier: the
    * lag/lead/diff_window/pct_change/cum/rolling/zscore family over a
    * per-row double lane (reference defs.rs window ops). Every output
    * reduces through an EXACT path — max/min/first/last/telescoping
    * sums over integer-valued doubles, and zscore/pct_change replayed
    * in DuckDB with the identical left-fold operation order — so the
    * gate's bit-exact float hash holds. */
  private val arrSeq = q(
    "q_lower_arr_seq",
    """WITH s AS (
      |  SELECT doc_id,
      |    list_transform(str_split(text, ' '), x -> CAST(length(x) AS BIGINT)) AS ls
      |  FROM documents WHERE doc_id < 300),
      |z AS (
      |  SELECT *, list_transform(ls, x -> CAST(x AS DOUBLE)) AS ld,
      |    list_reduce(list_transform(ls, x -> CAST(x AS DOUBLE)), (a, b) -> a + b)
      |      / len(ls) AS mean
      |  FROM s),
      |z2 AS (
      |  SELECT *, sqrt(list_reduce(list_transform(ld, y -> (y - mean) * (y - mean)),
      |    (a, b) -> a + b) / len(ld)) AS sd
      |  FROM z)
      |SELECT doc_id AS k,
      |  COALESCE(CAST(list_sum(ls[1:len(ls) - 1]) AS DOUBLE), 0.0) AS lgs,
      |  CASE WHEN len(ls) >= 3 THEN CAST(ls[1] AS DOUBLE) END AS lgf,
      |  CAST(GREATEST(len(ls) - 1, 0) AS BIGINT) AS lds,
      |  CASE WHEN len(ls) >= 2 THEN CAST(ls[len(ls)] - ls[1] AS DOUBLE) ELSE 0.0 END AS dws,
      |  list_max([CAST(ls[i] - ls[i-1] AS DOUBLE) / ls[i-1]
      |            for i in range(2, len(ls) + 1) if ls[i-1] != 0]) AS pcm,
      |  CAST(list_max(ls) AS DOUBLE) AS cmx,
      |  CASE WHEN len(ls) >= 3 THEN CAST(list_min(ls[1:3]) AS DOUBLE) END AS cmn,
      |  list_max([CAST(ls[i-1] + ls[i] AS DOUBLE)
      |            for i in range(2, len(ls) + 1)]) AS rs2,
      |  list_max([CAST(ls[i-2] + ls[i-1] + ls[i] AS DOUBLE) / 3
      |            for i in range(3, len(ls) + 1)]) AS ra3,
      |  CASE WHEN len(ls) >= 2 THEN CAST(list_min(ls) AS DOUBLE) END AS rmn,
      |  list_max(list_transform(ld, x ->
      |    CASE WHEN sd = 0 THEN 0.0 ELSE (x - mean) / sd END)) AS zsx
      |FROM z2 ORDER BY k""".stripMargin) { (s, d) =>
    lower(s, d,
      "$.documents{doc_id < 300}.sort_by(doc_id).map({\n" +
      "  k: doc_id,\n" +
      "  lgs: text.split(\" \").map(@.len()).lag().compact().sum(),\n" +
      "  lgf: text.split(\" \").map(@.len()).lag(2).compact().first(),\n" +
      "  lds: text.split(\" \").map(@.len()).lead(1).compact().len(),\n" +
      "  dws: text.split(\" \").map(@.len()).diff_window().compact().sum(),\n" +
      "  pcm: text.split(\" \").map(@.len()).pct_change().compact().max(),\n" +
      "  cmx: text.split(\" \").map(@.len()).cum_max().last(),\n" +
      "  cmn: text.split(\" \").map(@.len()).cum_min().nth(2),\n" +
      "  rs2: text.split(\" \").map(@.len()).rolling_sum(2).compact().max(),\n" +
      "  ra3: text.split(\" \").map(@.len()).rolling_avg(3).compact().max(),\n" +
      "  rmn: text.split(\" \").map(@.len()).rolling_min(2).compact().min(),\n" +
      "  zsx: text.split(\" \").map(@.len()).zscore().max()})")
  }

  def defs = Seq(headline, aggCount, countBy, scalars, comp, idxJoin, groupAgg,
    groupShapeL, lastN, nth0, rollingSum, pct, pivotL, tryL, patchL,
    accumulateL, suffixSlice, reverseL, scalarFns, cumMax, lagL,
    uniqueByL, indexByL, enumerateL, chunkL, pairwiseL, windowL, zscoreL,
    groupCollectL, partitionL, deepL, deepShapeL, deepLikeL,
    zipL, setExceptL, setUnionL, findIndexL, indicesL, removeL, implodeL,
    sortCmp, rowwiseFb, tracePathL, walkL, deepArrL,
    rowwiseExplode, rowwiseSetWrite, deepMapL, spreadL,
    rowwiseWalk, rowwiseRec, strEdge, strArr, strCase, arrOps, arrSeq,
    regexFirstL, mapOpsL, mapFieldL, patchMapL, mapHasL, getPathL, typeL,
    setPathL, setPathDeepL, deepMergeL, deepMergeMapL, mapSetDeepL,
    setPathMapMidL, structObjL,
    toJsonMapL, freeFnL, pipeL, rangeL)
}
