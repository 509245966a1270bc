package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY §2.8 — the scalar function surface: strings, regex, math,
  * f-strings, JSON path access, date parts. Everything here is a native
  * Spark function (codegen'd); the jetro-specific casings that Spark
  * lacks (snake/kebab) compose from lower/replace.
  */
object ScalarQueries extends QueryGroup {

  /** Core string ops — builtins/ops/string.rs: upper lower trim pad
    * substr replace len. Lengths cast to BIGINT (DuckDB's width). */
  private val strFuncs = q(
    "q_str_funcs",
    """SELECT s_suppkey,
      |  UPPER(s_name) AS up, LOWER(s_name) AS lo,
      |  LPAD(CAST(s_suppkey AS VARCHAR), 8, '0') AS pad,
      |  SUBSTR(s_name, 1, 8) AS sub,
      |  REPLACE(s_name, '#', '-') AS rep,
      |  CAST(LENGTH(s_name) AS BIGINT) AS len
      |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    Tables.supplier(s, d).select(
      col("s_suppkey"),
      upper(col("s_name")).as("up"), lower(col("s_name")).as("lo"),
      lpad(col("s_suppkey").cast("string"), 8, "0").as("pad"),
      substring(col("s_name"), 1, 8).as("sub"),
      regexp_replace(col("s_name"), lit("#"), lit("-")).as("rep"),
      length(col("s_name")).cast("long").as("len"))
      .orderBy("s_suppkey")
  }

  /** More string ops — reverse repeat starts/ends_with index_of
    * translate strip_prefix. */
  private val strFuncs2 = q(
    "q_str_funcs2",
    """SELECT p_partkey,
      |  REVERSE(p_name) AS rev,
      |  REPEAT('*', CAST(p_partkey % 4 AS INT)) AS stars,
      |  starts_with(p_name, 'small') AS sw,
      |  ends_with(p_name, 'widget') AS ew,
      |  CAST(INSTR(p_name, 'wid') AS BIGINT) AS idx,
      |  TRANSLATE(p_name, 'aeiou', 'AEIOU') AS tr,
      |  CASE WHEN starts_with(p_name, 'small ')
      |       THEN SUBSTR(p_name, 7) ELSE p_name END AS stripped
      |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin) {
    (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          reverse(col("p_name")).as("rev"),
          expr("repeat('*', CAST(p_partkey % 4 AS INT))").as("stars"),
          col("p_name").startsWith("small").as("sw"),
          col("p_name").endsWith("widget").as("ew"),
          instr(col("p_name"), "wid").cast("long").as("idx"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          when(col("p_name").startsWith("small "),
            expr("substr(p_name, 7)")).otherwise(col("p_name")).as("stripped"))
        .orderBy("p_partkey")
  }

  /** Casing conversions — snake_case / kebab_case (M:270-393 family):
    * compose from lower/replace (no UDF needed for the common case). */
  private val caseConv = q(
    "q_case_conv",
    """SELECT p_partkey,
      |  LOWER(REPLACE(p_type, ' ', '_')) AS snake,
      |  LOWER(REPLACE(p_type, ' ', '-')) AS kebab,
      |  UPPER(SUBSTR(p_name, 1, 1)) || SUBSTR(p_name, 2) AS capitalized
      |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin) {
    (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          lower(translate(col("p_type"), " ", "_")).as("snake"),
          lower(translate(col("p_type"), " ", "-")).as("kebab"),
          concat(upper(substring(col("p_name"), 1, 1)),
            expr("substr(p_name, 2)")).as("capitalized"))
        .orderBy("p_partkey")
  }

  /** Regex family — builtins/ops/regex.rs: match / extract / replace-all
    * / split. Patterns kept in the RE2∩Java-regex common dialect. */
  private val regex0 = q(
    "q_regex",
    """SELECT p_partkey,
      |  regexp_matches(p_name, 'wid|bolt') AS has_pat,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  regexp_replace(p_name, '[aeiou]', '.', 'g') AS masked,
      |  CAST(LENGTH(regexp_split_to_array(p_name, '\s+')) AS BIGINT) AS n_tokens
      |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin) {
    (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          col("p_name").rlike("wid|bolt").as("has_pat"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", ".").as("masked"),
          size(split(col("p_name"), "\\s+")).cast("long").as("n_tokens"))
        .orderBy("p_partkey")
  }

  /** Math ops — M:238-245: ceil floor round abs (+ sqrt/power rounded to
    * absorb libm ulp differences). */
  private val math0 = q(
    "q_math",
    """SELECT c_custkey,
      |  ABS(c_acctbal) AS abs_bal,
      |  CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
      |  CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
      |  ROUND(c_acctbal, 1) AS round_bal,
      |  ROUND(SQRT(ABS(c_acctbal)), 6) AS sqrt_bal,
      |  ROUND(POWER(ABS(c_acctbal), 0.5) + LN(ABS(c_acctbal) + 1), 6) AS transcendental
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      abs(col("c_acctbal")).as("abs_bal"),
      ceil(col("c_acctbal")).cast("long").as("ceil_bal"),
      floor(col("c_acctbal")).cast("long").as("floor_bal"),
      round(col("c_acctbal"), 1).as("round_bal"),
      round(sqrt(abs(col("c_acctbal"))), 6).as("sqrt_bal"),
      round(pow(abs(col("c_acctbal")), 0.5) + log(abs(col("c_acctbal")) + 1), 6)
        .as("transcendental"))
      .orderBy("c_custkey")
  }

  /** F-strings `f"{expr:format}"` — ast.rs:259-275: printf-style
    * formatting. */
  private val fstring = q(
    "q_fstring",
    """SELECT event_id,
      |  printf('%s-%03d', event_type, user_id) AS tag,
      |  printf('u%d spent %.2f', user_id, value) AS msg
      |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .select(
          col("event_id"),
          format_string("%s-%03d", col("event_type"), col("user_id")).as("tag"),
          format_string("u%d spent %.2f", col("user_id"), col("value")).as("msg"))
        .orderBy("event_id")
  }

  /** JSON access `get_path` / `to_json` — M:41-43, M:198-211: extract a
    * field from a JSON string column; serialise a struct to JSON. */
  private val json0 = q(
    "q_json",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  to_json(struct_pack(event_id := event_id, event_type := event_type)) AS js
      |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          to_json(struct(col("event_id"), col("event_type"))).as("js"))
        .orderBy("event_id")
  }

  /** Date parts + formatting over the orders timestamp column. */
  private val dateParts = q(
    "q_date_parts",
    """SELECT o_orderkey,
      |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
      |  CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dy,
      |  strftime(o_orderdate, '%Y-%m') AS ym
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dy"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy("o_orderkey")
  }

  def defs = Seq(
    strFuncs, strFuncs2, caseConv, regex0, math0, fstring, json0, dateParts)
}
