package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY §2.4 — remaining aggregation operators: quantifiers, keyed
  * reducers, pivot, explode/implode, shaping sinks, HLL. All single
  * shuffle on the group key with map-side partial aggregation.
  */
object AggQueries extends QueryGroup {

  /** `any(pred)` / `all(pred)` — M:56-59: existential / universal per
    * group, as bool_or/bool_and (partial-aggregable, no row transfer). */
  private val anyAll = q(
    "q_any_all",
    """SELECT user_id,
      |  bool_or(value > 400) AS has_big,
      |  bool_and(value > 0.05) AS all_pos,
      |  COUNT(*) FILTER (WHERE value > 400) AS n_big
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          expr("bool_or(value > 400)").as("has_big"),
          expr("bool_and(value > 0.05)").as("all_pos"),
          count(when(col("value") > 400, 1)).as("n_big"))
        .orderBy("user_id")
  }

  /** `partition(pred)` — M:162-163: split into pass/fail groups; the
    * relational form is a groupBy on the predicate value. */
  private val partition0 = q(
    "q_partition",
    """SELECT (value > 100) AS pass_side, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY pass_side ORDER BY pass_side""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy((col("value") > 100).as("pass_side"))
        .agg(count(lit(1)).as("n"), Num.fsum(col("value")).as("total"))
        .orderBy("pass_side")
  }

  /** `pivot(row, col, val)` — M:194-195: native Spark pivot with an
    * explicit value list (no extra distinct-scan job); missing cells
    * coalesced to 0 to match the FILTER-count oracle. */
  private val pivot0 = q(
    "q_pivot",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
    (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(
        col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
  }

  /** `index_by(key)` (last wins) — M:72-73: latest row per key via
    * max_by on the sequence column — one agg pass, no window sort. */
  private val indexBy = q(
    "q_index_by",
    """SELECT user_id, MAX(event_id) AS last_id,
      |  max_by(event_type, event_id) AS last_type,
      |  max_by(value, event_id) AS last_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max("event_id").as("last_id"),
          expr("max_by(event_type, event_id)").as("last_type"),
          expr("max_by(value, event_id)").as("last_value"))
        .orderBy("user_id")
  }

  /** `approx_count_distinct()` — M:158-159: native HLL++. The raw
    * estimate is engine-specific, so it cannot be hashed against
    * DuckDB — instead the query emits the exact count plus a boolean
    * asserting the estimate sits inside the 3-sigma band of the
    * requested rsd (|approx − exact| ≤ max(3·0.05·exact, 1)); the
    * oracle expects TRUE, so a drifting estimator fails the driver's
    * hash gate rather than hiding behind rows-only. Exactness at small
    * cardinalities is additionally pinned in ApproxDistinctSpec. */
  private val approxDistinct = q(
    "q_approx_distinct",
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  TRUE AS approx_in_band
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.05).as("__approx"),
        countDistinct("l_partkey").as("exact_parts"))
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        (abs(col("__approx") - col("exact_parts")) <=
          greatest(col("exact_parts") * 0.15, lit(1.0))).as("approx_in_band"))
      .orderBy("l_returnflag")
  }

  /** `fanout(e1, e2, …)` — M:168-169: N aggregates of one receiver
    * packed into an array, then unpacked to scalar lanes for the
    * driver's scalar-only hash compare (the array build + element
    * access stays in the plan). */
  private val fanout0 = q(
    "q_fanout",
    """SELECT event_type,
      |  CAST(COUNT(*) AS DOUBLE) AS s_cnt, MIN(value) AS s_min,
      |  MAX(value) AS s_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(array(
          count(lit(1)).cast("double"),
          min("value"), max("value")).as("stats"))
        .select(
          col("event_type"),
          col("stats").getItem(0).as("s_cnt"),
          col("stats").getItem(1).as("s_min"),
          col("stats").getItem(2).as("s_max"))
        .orderBy("event_type")
  }

  /** `zip_shape(a: e1, b: e2)` — M:170-171: named exprs → struct,
    * flattened back to scalar columns on output. */
  private val zipShape = q(
    "q_zip_shape",
    """SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(struct(
          min("value").as("lo"), max("value").as("hi")).as("rng"))
        .select(col("event_type"),
          col("rng").getField("lo").as("lo"),
          col("rng").getField("hi").as("hi"))
        .orderBy("event_type")
  }

  /** Time-bucketed aggregation (streaming §2.10 batch analogue):
    * group by year over the orders date column. */
  private val byYear = q(
    "q_group_year",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY yr ORDER BY yr""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"), Num.fsum(col("o_totalprice")).as("total"))
      .orderBy("yr")
  }

  /** `count_by` on a computed bucket (histogram idiom). */
  private val histogram = q(
    "q_histogram",
    """SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket, COUNT(*) AS n
      |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** `explode(field)` — M:76-77: unnest array elements to rows with
    * position. */
  private val explode0 = q(
    "q_explode",
    """SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
      |  unnest(embedding) AS val
      |FROM embeddings WHERE vec_id < 20 ORDER BY vec_id, pos""".stripMargin) {
    (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 20)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")
  }

  /** `implode(field)` — M:78-79: inverse of explode — collapse rows
    * sharing the residual key back into an array. */
  private val implode0 = q(
    "q_implode",
    """SELECT event_type, array_to_string(list_sort(list(event_id)), ',') AS ids,
      |  COUNT(*) AS n
      |FROM events WHERE value > 250
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("value") > 250)
      .groupBy("event_type")
      .agg(
        array_join(sort_array(collect_list("event_id")), ",").as("ids"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Mergeable HLL sketch pipeline (ops.Sketch): fine-grained
    * per-(lang, source) sketches rolled up to per-lang by UNIONING the
    * binaries — the incremental-stats pattern (a new shard contributes
    * a sketch, rollups never rescan). The oracle expects every rolled-up
    * estimate inside a generous accuracy band of the exact distinct
    * count (lgK=12 ≈ 1.6% rsd; band 15% or ±1), so a broken merge — not
    * just a broken sketch — fails the hash gate. */
  private val sketchDistinct = q(
    "q_sketch_distinct",
    """SELECT lang,
      |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact,
      |  TRUE AS sketch_in_band
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val fine = graft.ops.Sketch.grouped(docs, Seq("lang", "source"), "text")
    val perLang = graft.ops.Sketch.rollup(fine, Seq("lang"))
    val exact = docs.groupBy("lang").agg(countDistinct("text").as("n_exact"))
    perLang.join(exact, "lang")
      .select(col("lang"), col("n_exact"),
        (abs(col("estimate") - col("n_exact")) <=
          greatest(col("n_exact") * 0.15, lit(1.0))).as("sketch_in_band"))
      .orderBy("lang")
  }

  /** Mergeable KLL quantile-sketch pipeline (ops.Sketch): per-(lang,
    * source) sketches of the per-doc token count, MERGED to per-lang,
    * quantiles read off the merged binaries. Exactness hooks for the
    * hash gate: the sketch's ingested-row count `n` must equal the
    * true count (a dropped shard or broken merge fails exactly), and
    * each quantile estimate must sit between the exact percentiles at
    * q∓5% (KLL k=200 ≈ 1.65% rank error — generous band, but a wrong
    * merge lands far outside it). */
  private val sketchQuantile = q(
    "q_sketch_quantile",
    """WITH tc AS (SELECT lang,
      |  len(string_split_regex(text, '\s+')) AS tc FROM documents)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  TRUE AS p50_in_band, TRUE AS p90_in_band
      |FROM tc GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("source"),
        graft.functions.Text.tokenCount(col("text")).as("tc"))
    val fine = graft.ops.Sketch.quantileGrouped(docs, Seq("lang", "source"), "tc")
    val perLang = graft.ops.Sketch.quantileRollup(fine, Seq("lang"), Seq(0.5, 0.9))
    val bounds = docs.groupBy("lang").agg(
      expr("percentile(tc, 0.45)").as("lo50"), expr("percentile(tc, 0.55)").as("hi50"),
      expr("percentile(tc, 0.85)").as("lo90"), expr("percentile(tc, 0.95)").as("hi90"))
    perLang.join(bounds, "lang")
      .select(col("lang"), col("n"),
        (col("q50") >= floor(col("lo50")) && col("q50") <= ceil(col("hi50")))
          .as("p50_in_band"),
        (col("q90") >= floor(col("lo90")) && col("q90") <= ceil(col("hi90")))
          .as("p90_in_band"))
      .orderBy("lang")
  }

  private def profileOracle(cols: Seq[String]): String =
    cols.flatMap { c =>
      Seq(
        s"""SELECT '$c' AS "column", 'n' AS metric, CAST(COUNT($c) AS VARCHAR) AS value FROM documents""",
        s"""SELECT '$c', 'nulls', CAST(COUNT(*) - COUNT($c) AS VARCHAR) FROM documents""",
        s"""SELECT '$c', 'distinct', CAST(COUNT(DISTINCT $c) AS VARCHAR) FROM documents""",
        s"""SELECT '$c', 'min', CAST(MIN($c) AS VARCHAR) FROM documents""",
        s"""SELECT '$c', 'max', CAST(MAX($c) AS VARCHAR) FROM documents""")
    }.mkString("", " UNION ALL ", """ ORDER BY "column", metric""")

  /** One-pass dataset profile (ops.Profile): per-column non-null /
    * null / exact-distinct / min / max in long format — the data-card
    * stats block. The oracle recomputes every cell independently. */
  private val profile = q(
    "q_profile",
    profileOracle(Seq("doc_id", "lang", "source", "n_chars"))) { (s, d) =>
    graft.ops.Profile.describe(
        Tables.documents(s, d), Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy("column", "metric")
  }

  def defs = Seq(
    anyAll, partition0, pivot0, indexBy, approxDistinct, fanout0,
    zipShape, byYear, histogram, explode0, implode0, sketchDistinct,
    sketchQuantile, profile)
}
