package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY §2.2/§2.3/§2.7 — array-valued operators (slice, flat_map,
  * remove/compact, membership, positional zip) and set-theoretic ops
  * (union/except/intersect, cross join). Array ops run inside
  * whole-stage codegen via higher-order functions — no UDFs.
  */
object ArraySetQueries extends QueryGroup {

  /** `[a:b]` slice — ast.rs:312-313: Spark slice(col, start, len) ==
    * DuckDB arr[start : start+len-1] (both 1-based inclusive). The
    * sliced window is emitted as scalar columns (exact float→double
    * widening on both engines) so the driver's hash compare sees no
    * array-typed cells. */
  private val slice0 = q(
    "q_slice",
    """SELECT vec_id,
      |  CAST(embedding[2] AS DOUBLE) AS s1, CAST(embedding[3] AS DOUBLE) AS s2,
      |  CAST(embedding[4] AS DOUBLE) AS s3, CAST(embedding[5] AS DOUBLE) AS s4
      |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin) {
    (s, d) =>
      val sub = slice(col("embedding"), 2, 4)
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(col("vec_id") +:
          (1 to 4).map(i => sub.getItem(i - 1).cast("double").as(s"s$i")): _*)
        .orderBy("vec_id")
  }

  /** `flat_map(expr)` — M:86-87: tokenize + explode with position. */
  private val flatMap0 = q(
    "q_flat_map",
    """SELECT doc_id,
      |  CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
      |  unnest(string_split(text, ' ')) AS word
      |FROM documents WHERE doc_id < 10 ORDER BY doc_id, pos""".stripMargin) {
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 10)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .orderBy("doc_id", "pos")
  }

  /** `remove(v)` — M:134-135: drop matching elements from an array;
    * re-joined to a string for the driver's scalar-only hash compare. */
  private val remove0 = q(
    "q_array_remove",
    """SELECT doc_id,
      |  array_to_string(list_filter(string_split(text, ' '), x -> x <> 'the'),
      |                  '|') AS words
      |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin) {
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          array_join(array_remove(split(col("text"), " "), "the"), "|")
            .as("words"))
        .orderBy("doc_id")
  }

  /** `compact()` — M:116-117: drop nulls (row-level form). */
  private val compact0 = q(
    "q_compact",
    """SELECT event_id, NULLIF(event_type, 'error') AS et
      |FROM events WHERE NULLIF(event_type, 'error') IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), nullif(col("event_type"), lit("error")).as("et"))
      .filter(col("et").isNotNull)
      .orderBy("event_id")
  }

  /** `has` / `includes` membership — grammar.pest:131-139: array
    * membership and substring containment. */
  private val membership = q(
    "q_membership",
    """SELECT doc_id,
      |  list_contains(string_split(text, ' '), 'spark') AS has_word,
      |  contains(text, 'join') AS has_substr
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) {
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          array_contains(split(col("text"), " "), "spark").as("has_word"),
          col("text").contains("join").as("has_substr"))
        .orderBy("doc_id")
  }

  /** `zip(other)` + fold — M:164-167: positional pairing of two lanes
    * folded to a dot product (zip_with + aggregate HOFs; stays in
    * codegen). Both engines sum 32 double products — rounded to absorb
    * sub-ulp association differences. */
  private val zipDot = q(
    "q_zip_dot",
    """SELECT vec_id, ROUND(SUM(CAST(embedding[i] AS DOUBLE)
      |                        * CAST(embedding[i + 32] AS DOUBLE)), 4) AS dot
      |FROM embeddings, generate_series(1, 32) AS t(i)
      |WHERE vec_id < 20 GROUP BY vec_id ORDER BY vec_id""".stripMargin) {
    (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 20)
        .select(col("vec_id"),
          round(expr(
            """aggregate(
              |  zip_with(slice(embedding, 1, 32), slice(embedding, 33, 32),
              |           (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin), 4)
            .as("dot"))
        .orderBy("vec_id")
  }

  /** `zip(other)` at DataFrame level — M:164-165: positional join of two
    * independently-ordered row streams via row_number (SURVEY §2.3's
    * "join on window row_number" mapping). Each side sorts in parallel
    * on its own key; the join is a small sorted-key equi-join. */
  private val zipTables = q(
    "q_zip_tables",
    """WITH o AS (SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |           FROM orders LIMIT 10),
      |     c AS (SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
      |           FROM customer LIMIT 10)
      |SELECT o.rn AS rn, o_orderkey, c_custkey FROM o JOIN c USING (rn)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // top-k FIRST (TakeOrderedAndProject, bounded heap), then number the
    // 10 survivors — never a global row_number window over the full
    // table. The window input is the 10-row top-k survivors, so
    // single-partition is the point; the key must be NON-foldable
    // (Lower.onePartition) or EliminateWindowPartitions strips it
    val wo = Window.partitionBy(graft.plans.Lower.onePartition(col("o_orderkey")))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wc = Window.partitionBy(graft.plans.Lower.onePartition(col("c_custkey")))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val o = Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(wo)).drop("o_totalprice")
    val c = Tables.customer(s, d)
      .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(10)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(wc)).drop("c_acctbal")
    o.join(c, "rn").select("rn", "o_orderkey", "c_custkey").orderBy("rn")
  }

  /** `zip_longest(other)` — M:166-167: positional pairing padded with
    * nulls past the shorter side — the zip_tables shape with a FULL
    * outer join on the positional key. */
  private val zipLongest = q(
    "q_zip_longest",
    """WITH o AS (SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |           FROM orders LIMIT 10),
      |     c AS (SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
      |           FROM customer LIMIT 6)
      |SELECT COALESCE(o.rn, c.rn) AS rn, o_orderkey, c_custkey
      |FROM o FULL JOIN c USING (rn)
      |ORDER BY rn""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wo = Window.partitionBy(graft.plans.Lower.onePartition(col("o_orderkey")))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wc = Window.partitionBy(graft.plans.Lower.onePartition(col("c_custkey")))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val o = Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(wo)).drop("o_totalprice")
    val c = Tables.customer(s, d)
      .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(6)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(wc)).drop("c_acctbal")
    o.join(c, Seq("rn"), "full_outer")
      .select("rn", "o_orderkey", "c_custkey").orderBy("rn")
  }

  /** `diff` (set difference) — M:136-137: nations having customers but
    * no suppliers. */
  private val setExcept = q(
    "q_set_except",
    """SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      |EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000
      |ORDER BY nk""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nk")).distinct()
      .except(Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("nk")).distinct())
      .orderBy("nk")
  }

  /** `intersect` — M:138-139. */
  private val setIntersect = q(
    "q_set_intersect",
    """SELECT DISTINCT c_nationkey AS nk FROM customer
      |INTERSECT SELECT DISTINCT s_nationkey AS nk FROM supplier
      |ORDER BY nk""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nk")).distinct()
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")).distinct())
      .orderBy("nk")
  }

  /** `union` — M:140-141 (dedup union). */
  private val setUnion = q(
    "q_set_union",
    """SELECT DISTINCT nk FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  UNION SELECT s_nationkey AS nk FROM supplier)
      |ORDER BY nk""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")
  }

  /** cross join / `product(a, b)` — SYNTAX.md:510: comprehension over
    * two sources. */
  private val crossJoin = q(
    "q_cross_join",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.region(s, d).select("r_name")
      .crossJoin(Tables.nation(s, d).select("n_name"))
      .orderBy("r_name", "n_name")
  }

  /** `try body else default` — ast.rs:144-150: error-absorbing eval
    * (division by zero → NULL, then defaulted). */
  private val try0 = q(
    "q_try",
    """SELECT event_id,
      |  COALESCE(CASE WHEN CAST(FLOOR(value) AS BIGINT) % 7 = 0 THEN NULL
      |    ELSE 100 / (CAST(FLOOR(value) AS BIGINT) % 7) END, -1) AS safe_div
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        coalesce(
          try_divide(lit(100), floor(col("value")).cast("long") % 7),
          lit(-1).cast("double")).as("safe_div"))
      .orderBy("event_id")
  }

  def defs = Seq(
    slice0, flatMap0, remove0, compact0, membership, zipDot, zipTables,
    zipLongest, setExcept, setIntersect, setUnion, crossJoin, try0)
}
