package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.jexpr.Jetro

/** Document mode at scale (SURVEY §7.0 mode 2): full jetro expressions —
  * pipelines, recursive descent, patches — evaluated per row over a JSON
  * column by the broadcast-compiled interpreter, with the SAME answers
  * computed relationally by the DuckDB oracle. This is the strongest
  * differential test in the suite: two unrelated execution paths
  * (tree-walk interpreter vs SQL) must agree on every row.
  *
  * Scale design: the expression is parsed once per executor JVM
  * (Jetro's plan cache); evaluation is embarrassingly parallel across
  * rows — no shuffle beyond the doc-construction groupBy.
  */
object DocQueries extends QueryGroup {

  /** lineitem range-partitioned on the doc key. Every doc query here
    * groups by l_orderkey AND orders its output by it; RANGE
    * partitioning satisfies both the groupBy's clustering requirement
    * and the final sort's ordered distribution, so the whole query
    * runs on ONE shuffle instead of hash-for-agg + range-for-sort
    * (measured 0.78s → 0.47s on the sf0.1 floor). */
  private def liByOrder(s: org.apache.spark.sql.SparkSession, d: String) =
    // spreadCompute first: on an unsplittable single-task scan the range
    // exchange's sampling pass and map side otherwise run on one core
    // under the per-row interpreter lanes (measured 0.75–0.92× with the
    // spread vs without, r11 bench)
    Tables.spreadCompute(Tables.lineitem(s, d))
      .repartitionByRange(col("l_orderkey"))

  /** Per-order nested JSON doc built from lineitem: `{"items":[{"qty":…,
    * "price":…}, …]}`. Quantities are integral doubles, so float sums
    * are order-independent (exact in FP). */
  private def orderDocs(s: org.apache.spark.sql.SparkSession, d: String) =
    liByOrder(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"))).as("items"))
      .select(col("okey"), to_json(struct(col("items"))).as("doc"))

  /** The reference's headline pipeline shape (README.md:43-62) —
    * `$.items.filter(qty > 25).count()` + jetro's `sum` (empty → 0,
    * pipeline.rs:320-328) run per document. */
  private val docPipeline = q(
    "q_doc_pipeline",
    """SELECT l_orderkey AS okey,
      |  CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
      |  CAST(COALESCE(SUM(l_quantity) FILTER (WHERE l_quantity > 25), 0)
      |       AS DOUBLE) AS qty_big
      |FROM lineitem GROUP BY okey ORDER BY okey""".stripMargin) { (s, d) =>
    orderDocs(s, d)
      .select(
        col("okey"),
        Jetro.jetroEvalMany(Seq(
          "$.items.filter(qty > 25).count()",
          "$.items.filter(qty > 25).map(qty).sum()"), col("doc")).as("r"))
      .select(
        col("okey"),
        element_at(col("r"), 1).cast("long").as("n_big"),
        element_at(col("r"), 2).cast("double").as("qty_big"))
      .orderBy("okey")
  }

  /** The SAME headline pipeline through the native columnar backend
    * (Jetro.evalNative / Lower.compileDocColumn): the per-document
    * pipeline compiles to codegen'd higher-order functions over the
    * struct column — no to_json, no JSON parse, no interpreter UDF.
    * This is the reference's compile-when-possible execution ladder
    * (ir/physical.rs:219-230) applied per row; q_doc_pipeline keeps the
    * interpreter pillar honest, this row keeps the compiled one fast.
    * Same oracle as q_doc_pipeline — two more unrelated paths agreeing. */
  private val docNative = q(
    "q_doc_native",
    """SELECT l_orderkey AS okey,
      |  CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
      |  CAST(COALESCE(SUM(l_quantity) FILTER (WHERE l_quantity > 25), 0)
      |       AS DOUBLE) AS qty_big
      |FROM lineitem GROUP BY okey ORDER BY okey""".stripMargin) { (s, d) =>
    val docs = liByOrder(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"))).as("items"))
    val docType = org.apache.spark.sql.types.StructType(
      docs.schema.filter(_.name == "items"))
    val doc = struct(col("items"))
    def native(expr: String) = Jetro.evalNative(expr, doc, docType)
      .getOrElse(sys.error(s"q_doc_native must lower: $expr"))
    docs.select(
      col("okey"),
      native("$.items.filter(qty > 25).count()").as("n_big"),
      native("$.items.filter(qty > 25).map(qty).sum()")
        .cast("double").as("qty_big"))
      .orderBy("okey")
  }

  /** The SAME headline pipeline through the struct-fed interpreter
    * (Jetro.jetroEvalMany struct overload / RowBridge): the tree-walk
    * interpreter still evaluates every row, but its input tree is built
    * directly from the Tungsten-decoded struct — no to_json, no JSON
    * parse. Middle rung of the execution ladder: q_doc_pipeline keeps
    * the full text round-trip honest, q_doc_native is the compiled
    * ceiling, this row isolates what serialization costs. Same oracle
    * as both. */
  private val docRow = q(
    "q_doc_row",
    """SELECT l_orderkey AS okey,
      |  CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
      |  CAST(COALESCE(SUM(l_quantity) FILTER (WHERE l_quantity > 25), 0)
      |       AS DOUBLE) AS qty_big
      |FROM lineitem GROUP BY okey ORDER BY okey""".stripMargin) { (s, d) =>
    val docs = liByOrder(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"))).as("items"))
    val docType = org.apache.spark.sql.types.StructType(
      docs.schema.filter(_.name == "items"))
    docs.select(
      col("okey"),
      Jetro.jetroEvalMany(Seq(
        "$.items.filter(qty > 25).count()",
        "$.items.filter(qty > 25).map(qty).sum()"),
        struct(col("items")), docType).as("r"))
      .select(
        col("okey"),
        element_at(col("r"), 1).cast("long").as("n_big"),
        element_at(col("r"), 2).cast("double").as("qty_big"))
      .orderBy("okey")
  }

  /** The q_doc_top2 pipeline (in-row sort_by → take → f-string map)
    * through the NATIVE columnar path: the new array_sort lowering
    * keeps the reference's cold-bench shape fully codegen'd per row —
    * no interpreter UDF. Must lower (getOrElse errors), and the DuckDB
    * oracle hash-checks the result at the driver's scale. */
  private val docNativeTopK = q(
    "q_doc_native_topk",
    """SELECT okey, string_agg('q' || qty, ',' ORDER BY rn) AS tags
      |FROM (
      |  SELECT l_orderkey AS okey,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_quantity DESC, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 2 GROUP BY okey ORDER BY okey""".stripMargin) { (s, d) =>
    val docs = liByOrder(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(
        col("l_quantity").cast("long").as("qty"),
        col("l_linenumber").as("ln"))).as("items"))
    val docType = org.apache.spark.sql.types.StructType(
      docs.schema.filter(_.name == "items"))
    def native(e: String) = Jetro.evalNative(e, struct(col("items")), docType)
      .getOrElse(sys.error(s"q_doc_native_topk must lower: $e"))
    docs.select(
      col("okey"),
      native("""$.items.sort_by(-qty * 1000 + ln).take(2).map(f"q{qty}").join(",")""")
        .as("tags"))
      .orderBy("okey")
  }

  /** Recursive descent `$..k` (opcode.rs:206-209) over a two-level doc:
    * `{"root":{"k":okey},"items":[{"k":qty},…]}` — deep-sum must equal
    * okey + Σqty. */
  private val docDeep = q(
    "q_doc_deep",
    """SELECT l_orderkey AS okey,
      |  CAST(l_orderkey + SUM(l_quantity) AS DOUBLE) AS deep_sum
      |FROM lineitem GROUP BY okey ORDER BY okey""".stripMargin) { (s, d) =>
    liByOrder(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(col("l_quantity").as("k"))).as("items"))
      .select(col("okey"), to_json(struct(
        struct(col("okey").as("k")).as("root"), col("items"))).as("doc"))
      .select(
        col("okey"),
        Jetro.jetroEvalStr("$..k.sum()", col("doc"))
          .cast("double").as("deep_sum"))
      .orderBy("okey")
  }

  /** Patch blocks (ast.rs:168-208): structural update `patch $ {k: @*2+1}`
    * over the events props column, then read the patched leaf back. */
  private val docPatch = q(
    "q_doc_patch",
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) * 2 + 1 AS patched
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        Jetro.jetroEvalStr("patch $ { k: @ * 2 + 1 }.k", col("props"))
          .cast("long").as("patched"))
      .orderBy("event_id")
  }

  /** Comprehension + f-string + sort_by/take through the interpreter:
    * top-2 items per order doc as formatted tags (SYNTAX.md
    * comprehensions + f-strings). Output is a JSON array of strings per
    * row; oracle rebuilds it with DuckDB list ops. */
  private val docTop2 = q(
    "q_doc_top2",
    """SELECT okey, '[' || string_agg('"q' || qty || '"', ',' ORDER BY rn) || ']' AS tags
      |FROM (
      |  SELECT l_orderkey AS okey,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_quantity DESC, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 2 GROUP BY okey ORDER BY okey""".stripMargin) { (s, d) =>
    liByOrder(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(collect_list(struct(
        col("l_quantity").cast("long").as("qty"),
        col("l_linenumber").as("ln"))).as("items"))
      .select(col("okey"), to_json(struct(col("items"))).as("doc"))
      .select(
        col("okey"),
        Jetro.jetroEval(
          "$.items.sort_by(-qty * 1000 + ln).take(2).map(f\"q{qty}\")",
          col("doc")).as("tags"))
      .orderBy("okey")
  }

  /** Structural schema inference per document (reference O:schema.rs:219
    * via Builtins.schemaOf): a synthesised JSON doc exercises every
    * branch — Int/String scalars, an explicitly-null field (marked
    * nullable and dropped from `required`), and a mixed-type array
    * (items unify to Mixed). The oracle replays the exact rendered
    * schema text per row, so the whole inference walk hash-verifies. */
  private val schemaQ = q(
    "q_schema",
    """SELECT event_id AS id,
      |  '{"type":"Object","required":["id","typ"' ||
      |  CASE WHEN CAST(FLOOR(value) AS BIGINT) % 2 = 0 THEN '' ELSE ',"v"' END ||
      |  ',"tags"],"fields":{"id":{"type":"Int"},"typ":{"type":"String"},"v":' ||
      |  CASE WHEN CAST(FLOOR(value) AS BIGINT) % 2 = 0 THEN '{"type":"Null","nullable":true}'
      |       ELSE '{"type":"Int"}' END ||
      |  ',"tags":{"type":"Array","len":2,"items":{"type":"Mixed"}}}}' AS sch
      |FROM events WHERE event_id <= 500 ORDER BY id""".stripMargin) { (s, d) =>
    val doc = concat(
      lit("{\"id\": "), col("event_id"),
      lit(", \"typ\": \""), col("event_type"), lit("\""),
      lit(", \"v\": "),
      when(col("value").cast("long") % 2 === 0, lit("null"))
        .otherwise(col("value").cast("long").cast("string")),
      lit(", \"tags\": [\"a\", "), col("user_id"), lit("]}"))
    Tables.events(s, d)
      .filter(col("event_id") <= 500)
      .select(col("event_id").as("id"),
        Jetro.jetroEval("$.schema()", doc).as("sch"))
      .orderBy("id")
  }

  def defs = Seq(docPipeline, docNative, docRow, docNativeTopK, docDeep,
    docPatch, docTop2, schemaQ)
}
