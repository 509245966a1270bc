package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY §2.2 / §2.8 long tail: object shaping (`pick` / `omit` /
  * `group_shape`), dynamic indexing, map/object ops over a JSON column,
  * kind checks, and `to_csv`. All relational-mode: plain Column
  * expressions that stay inside whole-stage codegen.
  */
object ShapeQueries extends QueryGroup {

  /** `pick(key: src, …)` — project-with-rename (M:174-175,
    * O:path.rs:225). */
  private val pick0 = q(
    "q_pick",
    """SELECT p_partkey AS key, p_brand AS brand, p_retailprice AS price
      |FROM part ORDER BY key""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey").as("key"),
        col("p_brand").as("brand"),
        col("p_retailprice").as("price"))
      .orderBy("key")
  }

  /** `omit(keys…)` — drop fields (M:176-177, O:path.rs:292). */
  private val omit0 = q(
    "q_omit",
    """SELECT * EXCLUDE (c_mktsegment) FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .drop("c_mktsegment")
      .orderBy("c_custkey")
  }

  /** `group_shape(key, shape)` — group then shape each group into an
    * object (M:74-75, O:array.rs:841). */
  private val groupShape = q(
    "q_group_shape",
    """SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
      |FROM customer GROUP BY seg ORDER BY seg""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2)
          .as("total"))
      .orderBy("seg")
  }

  /** `[expr]` dynamic index (ast.rs:310-311): runtime-computed index
    * into the word array of p_name. `try_element_at` mirrors jetro's
    * null-on-OOB (ANSI mode would throw). */
  private val dynIndex = q(
    "q_dyn_index",
    """SELECT p_partkey,
      |  list_extract(string_split(p_name, ' '),
      |               CAST(p_partkey % 3 + 1 AS INT)) AS word
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        expr("try_element_at(split(p_name, ' '), CAST(p_partkey % 3 + 1 AS INT))")
          .as("word"))
      .orderBy("p_partkey")
  }

  /** Object/map ops over the events `props` JSON column —
    * keys/values/element access (M:20-33: `keys values entries`,
    * `get_path`). Spark parses to a real MapType; DuckDB stays in
    * json-land — same answers. */
  private val mapOps = q(
    "q_map_ops",
    """SELECT event_id,
      |  array_to_string(list_sort(json_keys(props)), ',') AS ks,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS kval,
      |  CAST(LENGTH(json_keys(props)) AS BIGINT) AS n_keys
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin) {
    (s, d) =>
      val m = from_json(col("props"), "map<string,bigint>",
        new java.util.HashMap[String, String]())
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          array_join(sort_array(map_keys(m)), ",").as("ks"),
          m.getItem("k").as("kval"),
          size(map_keys(m)).cast("long").as("n_keys"))
        .orderBy("event_id")
  }

  /** `kind` / `is [not]` runtime type checks (ast.rs:43-51) — document
    * mode per row via the jetro interpreter; DuckDB oracle maps its
    * json_type names onto jetro kind names. */
  private val kind0 = q(
    "q_kind",
    """SELECT event_id,
      |  CASE WHEN json_type(props, '$.k') IN
      |    ('UBIGINT','BIGINT','DOUBLE') THEN 'true' ELSE 'false' END AS k_is_num,
      |  CASE WHEN json_type(props, '$.missing') IS NULL
      |    THEN 'true' ELSE 'false' END AS miss_is_null
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          graft.jexpr.Jetro.jetroEvalStr("$.k is number", col("props"))
            .as("k_is_num"),
          graft.jexpr.Jetro.jetroEvalStr("$.missing is null", col("props"))
            .as("miss_is_null"))
        .orderBy("event_id")
  }

  /** `to_csv()` (M:215-217, O:misc.rs:5): array-of-objects → CSV text,
    * header + one line per element. Lines sorted for determinism (the
    * distributed collect has no inherent order). */
  private val toCsv = q(
    "q_to_csv",
    """SELECT 's_suppkey,s_name' || chr(10) ||
      |  string_agg(s_suppkey || ',' || s_name, chr(10) ORDER BY s_suppkey)
      |  AS csv
      |FROM supplier""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .select(struct(
        col("s_suppkey").as("k"),
        concat_ws(",", col("s_suppkey"), col("s_name")).as("v")).as("kv"))
      .agg(concat(
        lit("s_suppkey,s_name\n"),
        array_join(
          transform(array_sort(collect_list("kv")), x => x.getField("v")),
          "\n")).as("csv"))
  }

  /** Dot-path ops on nested structs (§2.8, O:path.rs): `set_path` ≡
    * `withField`, `del_path` ≡ `dropFields`, `get_path` ≡ nested
    * getField — all static-schema struct rewrites inside codegen, no
    * JSON round-trip. Output is flattened (`flatten_keys`) to scalar
    * columns so the oracle compares plain values. */
  private val structPath = q(
    "q_struct_path",
    """SELECT o_orderkey AS okey,
      |  o_totalprice AS price,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |    * CAST(0.9 AS DECIMAL(18,2)) AS DOUBLE) AS disc,
      |  o_orderstatus AS st
      |FROM orders ORDER BY okey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey").as("okey"), struct(
        col("o_totalprice").as("price"),
        struct(col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio")).as("inner")).as("s"))
      // set_path("disc", …): add a computed nested leaf
      .withColumn("s", col("s").withField("disc",
        (col("s.price").cast("decimal(18,2)") *
          lit(0.9).cast("decimal(18,2)")).cast("double")))
      // del_path("inner.prio"): drop one nested leaf
      .withColumn("s", col("s").dropFields("inner.prio"))
      // flatten_keys + get_path: nested leaves out as scalar columns
      .select(
        col("okey"),
        col("s.price").as("price"),
        col("s.disc").as("disc"),
        col("s.inner.st").as("st"))
      .orderBy("okey")
  }

  /** `flatten_keys()` (O:path.rs) — schema-directed: walk the
    * StructType and emit every leaf as `a.b.c`, the compile-time
    * analogue of the reference's structural-index path expansion
    * (SURVEY §2.8 strategy (a)). */
  private val flattenKeys = q(
    "q_flatten_keys",
    """SELECT n_nationkey AS id,
      |  n_name AS geo_name, n_regionkey AS geo_region_key,
      |  LENGTH(n_name) AS meta_name_len
      |FROM nation ORDER BY id""".stripMargin) { (s, d) =>
    val nested = Tables.nation(s, d)
      .select(col("n_nationkey").as("id"), struct(
        col("n_name").as("name"),
        struct(col("n_regionkey").as("key")).as("region")).as("geo"),
        struct(length(col("n_name")).as("name_len")).as("meta"))
    // "_" separator: parquet (the verify sink) forbids dots in names
    graft.ops.StructOps.flattenKeys(nested, sep = "_").orderBy("id")
  }

  /** `$..key` deep descent via schema-directed path expansion
    * (StructOps.descend, SURVEY §2.8 strategy (a)): the same field name
    * at two nesting depths collected into one array at plan time. */
  private val deepDescend = q(
    "q_deep_descend",
    """SELECT n_nationkey AS id,
      |  array_to_string([n_regionkey, n_regionkey * 10], ',') AS keys,
      |  CAST(n_regionkey + n_regionkey * 10 AS BIGINT) AS key_sum
      |FROM nation ORDER BY id""".stripMargin) { (s, d) =>
    val nested = Tables.nation(s, d).select(
      col("n_nationkey").as("id"),
      struct(col("n_regionkey").as("key"),
        struct((col("n_regionkey") * 10).as("key")).as("inner")).as("geo"))
    nested.select(
      col("id"),
      array_join(graft.ops.StructOps.descend(nested, "key"), ",").as("keys"),
      aggregate(graft.ops.StructOps.descend(nested, "key"),
        lit(0L), (acc, x) => acc + x.cast("long")).as("key_sum"))
      .orderBy("id")
  }

  /** `to_tsv()` (M:215-217) — same construction as to_csv with a tab
    * separator. */
  private val toTsv = q(
    "q_to_tsv",
    """SELECT 'r_regionkey' || chr(9) || 'r_name' || chr(10) ||
      |  string_agg(r_regionkey || chr(9) || r_name, chr(10) ORDER BY r_regionkey)
      |  AS tsv
      |FROM region""".stripMargin) { (s, d) =>
    Tables.region(s, d)
      .select(struct(
        col("r_regionkey").as("k"),
        concat_ws("\t", col("r_regionkey"), col("r_name")).as("v")).as("kv"))
      .agg(concat(
        lit("r_regionkey\tr_name\n"),
        array_join(
          transform(array_sort(collect_list("kv")), x => x.getField("v")),
          "\n")).as("tsv"))
  }

  def defs = Seq(pick0, omit0, groupShape, dynIndex, mapOps, kind0, toCsv,
    toTsv, structPath, flattenKeys, deepDescend)
}
