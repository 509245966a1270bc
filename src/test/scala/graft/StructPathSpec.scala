package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jexpr.{JArr, JBool, JFloat, JInt, JNull, JObj, JStr, JValue, Jetro}
import scala.collection.immutable.VectorMap

/** Differential contract for multi-segment `set_path`/`del_path`/
  * `del_paths` over STRUCT lanes (Lower.structPathMethod): the lowered
  * column must produce the value the document interpreter produces over
  * the to_json'd row — through the null-omitting bridge view, where a
  * null struct field ≡ an absent key (the struct-`has` doctrine).
  *
  * Comparison is bridge-canonical: null object entries drop from BOTH
  * sides, then objects compare as entry SEQUENCES — so in-place update
  * vs append-at-end order (VectorMap `+`, Builtins.setPath) stays
  * pinned while the representational difference (typed null field vs
  * absent key) normalizes away.
  */
class StructPathSpec extends SparkSpec {

  private val docType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cfg", StructType(Seq(
      StructField("a", StructType(Seq(
        StructField("b", LongType),
        StructField("c", StringType))), nullable = true),
      StructField("d", LongType))), nullable = true),
    StructField("meta", StructType(Seq(
      StructField("x", StringType))), nullable = true),
    StructField("mix", StructType(Seq(
      StructField("n", LongType),
      StructField("mp", MapType(StringType, LongType,
        valueContainsNull = true)))), nullable = true),
    StructField("mm", MapType(StringType, StructType(Seq(
      StructField("im", MapType(StringType, LongType,
        valueContainsNull = true)),
      StructField("t", StringType))), valueContainsNull = true),
      nullable = true)))

  /** Null at every level somewhere in the corpus: whole cfg (row 3),
    * cfg.a (row 6), cfg.a.b (row 9), cfg.a.c (row 12), mix (row 4). */
  private lazy val docs = {
    val rows = (0 until 24).map { i =>
      val a =
        if (i % 24 == 6) null
        else Row(
          if (i % 24 == 9) null else java.lang.Long.valueOf(i * 3L),
          if (i % 24 == 12) null else s"c$i")
      val cfg = if (i % 24 == 3) null else Row(a, java.lang.Long.valueOf(i % 5L))
      val meta = if (i % 2 == 0) null else Row(s"x$i")
      val mix =
        if (i % 24 == 4) null
        else Row(java.lang.Long.valueOf(i.toLong),
          scala.collection.immutable.ListMap("k" -> java.lang.Long.valueOf(i % 7L)))
      // map→struct→map shape, with nulls at every level somewhere:
      // whole mm (row 5), one entry's value (row 7), inner im (row 10)
      val mm =
        if (i % 24 == 5) null
        else scala.collection.immutable.ListMap(
          "a" -> (if (i % 24 == 7) null
                  else Row(
                    if (i % 24 == 10) null
                    else scala.collection.immutable.ListMap(
                      "x" -> java.lang.Long.valueOf(i % 4L)),
                    s"t$i")),
          "b" -> Row(scala.collection.immutable.ListMap(
            "x" -> java.lang.Long.valueOf(i % 3L)), s"u$i"))
      Row(i.toLong, cfg, meta, mix, mm)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), docType)
  }

  private def toJ(v: Any): JValue = v match {
    case null => JNull
    case r: Row =>
      JObj(VectorMap.from(r.schema.fieldNames.zipWithIndex.map {
        case (n, i) => n -> toJ(r.get(i))
      }))
    case m: scala.collection.Map[_, _] =>
      JObj(VectorMap.from(m.toSeq.map { case (k, v) => k.toString -> toJ(v) }))
    case s: scala.collection.Seq[_] => JArr(s.map(toJ).toVector)
    case l: Long    => JInt(l)
    case i: Int     => JInt(i.toLong)
    case d: Double  => JFloat(d)
    case s: String  => JStr(s)
    case b: Boolean => JBool(b)
    case other      => fail(s"unmapped Spark value $other (${other.getClass})")
  }

  /** Bridge canonicalization: drop null-valued OBJECT entries
    * recursively (a typed null struct field and an absent key are the
    * same document through the bridge); arrays keep their nulls. With
    * `sortKeys` the object order normalizes away too — a typed lane
    * has ONE field order per schema, so on rows where a written key's
    * parent (or the key itself) is null-bridged-to-absent, the
    * interpreter's append-at-end is unrepresentable; order stays
    * pinned separately on fully-defined rows. */
  private def bridgeCanon(v: JValue, sortKeys: Boolean): JValue = v match {
    case JObj(fs) =>
      val kept = fs.toVector.collect {
        case (k, x) if x != JNull => k -> bridgeCanon(x, sortKeys)
      }
      JObj(VectorMap.from(if (sortKeys) kept.sortBy(_._1) else kept))
    case JArr(xs) => JArr(xs.map(bridgeCanon(_, sortKeys)))
    case other    => other
  }

  private def jEq(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JInt(x), JFloat(y)) => x.toDouble == y
    case (JFloat(x), JInt(y)) => x == y.toDouble
    case (JArr(xs), JArr(ys)) =>
      xs.length == ys.length && xs.lazyZip(ys).forall(jEq)
    case (JObj(xs), JObj(ys)) =>
      xs.size == ys.size &&
        xs.toVector.lazyZip(ys.toVector).forall {
          case ((k1, v1), (k2, v2)) => k1 == k2 && jEq(v1, v2)
        }
    case _ => a == b
  }

  private def differential(expr: String, sortKeys: Boolean = true,
      rows: org.apache.spark.sql.DataFrame = docs): Unit = {
    val doc = struct(docType.fieldNames.map(col): _*)
    val nativeCol = Jetro.evalNative(expr, doc, docType)
      .getOrElse(fail(s"did not lower: $expr"))
    val both = rows
      .select(col("id"), nativeCol.as("native"), to_json(doc).as("json"))
      .orderBy("id")
      .collect()
    val compiled = Jetro.compile(expr)
    both.foreach { r =>
      val native = bridgeCanon(toJ(r.get(1)), sortKeys)
      val interp = bridgeCanon(
        try compiled.evalValue(JValue.parse(r.getString(2)))
        catch { case _: jexpr.EvalException => JNull }, sortKeys)
      assert(jEq(native, interp),
        s"row id=${r.getLong(0)} expr=$expr native=${native.render} interp=${interp.render}")
    }
  }

  private def refuses(expr: String): Unit = {
    val doc = struct(docType.fieldNames.map(col): _*)
    assert(Jetro.evalNative(expr, doc, docType).isEmpty,
      s"should stay doc-mode: $expr")
  }

  private val writeExprs = Seq(
    // in-place 2-segment write over an existing leaf (type kept/changed)
    "$.cfg.set_path(\"a.b\", 99)",
    "$.cfg.set_path(\"a.b\", \"s\")",
    // append at the END of the nested struct (VectorMap `+`)
    "$.cfg.set_path(\"a.z\", 7)",
    // 1-segment form on a struct lane (top-level in-place / append)
    "$.cfg.set_path(\"d\", 42)",
    "$.cfg.set_path(\"q\", 1)",
    // write through a NON-OBJECT intermediate: d is a long → {} coercion
    "$.cfg.set_path(\"d.z\", 5)",
    // create two fresh levels through a missing top key
    "$.cfg.set_path(\"extra.deep.w\", 5)",
    // 3 segments through existing + coerced levels
    "$.cfg.set_path(\"a.b.c\", 1)",
    // computed value (row-dependent, possibly null through the bridge;
    // the ?? keeps the null in the VALUE tier — bare `$.cfg.d * 2`
    // would hit the documented cell-null arithmetic divergence,
    // SCALE.md: the interpreter's numOp raises where the lowering
    // null-propagates)
    "$.cfg.set_path(\"a.b\", ($.cfg.d ?? 1) * 2)",
    "$.cfg.set_path(\"a.c2\", $.meta.x)",
    // read-back chains through the rewritten type (dtOf mirror)
    "$.cfg.set_path(\"a.z\", 7).a.z",
    "$.cfg.set_path(\"extra.deep.w\", 5).extra.deep.w + 1",
    "$.cfg.set_path(\"a.b\", 99).get_path(\"a.b\")",
    "$.cfg.set_path(\"a.b\", 99).has_path(\"a.b\")",
    // a MAP-typed value leaf is fine (only map SEGMENTS bail)
    "$.cfg.set_path(\"a.b\", $.mix.mp)")

  private val deleteExprs = Seq(
    // 2-segment delete of an existing leaf
    "$.cfg.del_path(\"a.b\")",
    "$.cfg.del_path(\"a.b\").a",
    // 1-segment delete
    "$.cfg.del_path(\"d\")",
    // identity: missing leaf / missing top / non-object intermediate
    "$.cfg.del_path(\"a.zz\")",
    "$.cfg.del_path(\"zz.b\")",
    "$.cfg.del_path(\"d.z\")",
    // fold in order; second path identity / typed off first result
    "$.cfg.del_paths([\"a.b\", \"d\"])",
    "$.cfg.del_paths([\"a.b\", \"nope.x\"]).has_path(\"a.b\")",
    // has_path over schema-deleted segments is constantly false
    "$.cfg.del_path(\"a.b\").has_path(\"a.b\")",
    "$.cfg.has_path(\"nope.deep\")")

  test("multi-segment set_path over struct lanes matches the interpreter") {
    writeExprs.foreach(differential(_))
  }

  test("multi-segment del_path/del_paths over struct lanes matches the interpreter") {
    deleteExprs.foreach(differential(_))
  }

  test("paths crossing a MAP level lower and match the interpreter (round 11)") {
    Seq(
      // struct→map: in-place entry write, appended entry, deletes
      "$.mix.set_path(\"mp.k\", 5)",
      "$.mix.set_path(\"mp.new\", 9)",
      "$.mix.set_path(\"mp.k\", $.id * 2)",
      "$.mix.del_path(\"mp.k\")",
      "$.mix.del_path(\"mp.nope\")",
      "$.mix.del_paths([\"mp.k\", \"n\"])",
      // read-backs through the rewritten type (dtOf mirror)
      "$.mix.set_path(\"mp.z\", 1).get_path(\"mp.z\")",
      "$.mix.set_path(\"mp.z\", 1).has_path(\"mp.z\")",
      "$.mix.del_path(\"mp.k\").get_path(\"mp.k\")",
      // map→struct→map, both write directions + deletes + identity
      "$.mm.set_path(\"a.im.y\", 5)",
      "$.mm.set_path(\"a.im.x\", $.id)",
      "$.mm.set_path(\"a.t\", \"zz\")",
      "$.mm.set_path(\"c.im.x\", 1)",     // fresh entry, nested map kept
      "$.mm.del_path(\"a.im.x\")",
      "$.mm.del_path(\"a.t\")",           // struct leaf inside map: null-out
      "$.mm.del_path(\"a.nope\")",
      "$.mm.del_paths([\"a.im.x\", \"b.t\"])",
      "$.mm.set_path(\"a.im.y\", 5).get_path(\"a.im.y\")",
      "$.mm.del_path(\"a.im.x\").has_path(\"a.im.x\")"
    ).foreach(differential(_))
  }

  test("dynamic paths, empty segments, kind flips, and empty-struct drops stay doc-mode") {
    refuses("$.cfg.set_path($.meta.x, 1)")       // dynamic path
    refuses("$.cfg.set_path(\"a..b\", 1)")       // empty segment
    refuses("$.cfg.set_path(\"\", 1)")           // empty path
    // a map-entry write that re-KINDS the shared value type has no
    // static lane (long entries can't live beside a string entry)
    refuses("$.mix.set_path(\"mp.k\", \"s\")")
    // writing THROUGH a non-object map VALUE coerces one entry to an
    // object — untouched long entries can't widen into that shape
    refuses("$.mix.set_path(\"mp.k.q\", 1)")
    refuses("$.meta.del_path(\"x\")")            // would drop every field
    refuses("$.cfg.del_path(\"a.b\").del_path(\"a.c\")") // fold empties a
  }

  test("write order (in-place vs append) is pinned on fully-defined rows") {
    // rows where cfg, cfg.a, cfg.a.b, cfg.a.c are all present: the
    // interpreter's VectorMap order and the struct field order must
    // agree exactly — in-place update keeps position, a new key
    // appends at the END. (On null-bridged rows the interpreter
    // re-appends the key; a typed lane cannot reorder per row — that
    // representational limit is the sorted-canon differential above.)
    val defined = docs.filter(!col("id").isin(3L, 6L, 9L, 12L))
    Seq(
      "$.cfg.set_path(\"a.b\", 99)",
      "$.cfg.set_path(\"a.z\", 7)",
      "$.cfg.set_path(\"q\", 1)",
      "$.cfg.set_path(\"extra.deep.w\", 5)",
      "$.cfg.del_path(\"a.b\")",
      "$.cfg.del_paths([\"a.b\", \"d\"])"
    ).foreach(differential(_, sortKeys = false, rows = defined))
  }

  test("randomized struct path chains: lowered == interpreter") {
    val rng = new scala.util.Random(fuzzSeed(20260815))
    val keys = Vector("a.b", "a.c", "a.z", "d", "d.z", "q.w", "a.b.c", "extra.deep.w")
    val vals = Vector("1", "\"v\"", "$.cfg.d", "$.cfg.a.b ?? -1", "$.id * 2")
    (0 until 60).foreach { _ =>
      val steps = (0 to rng.nextInt(2)).map { _ =>
        if (rng.nextBoolean())
          s""".set_path("${keys(rng.nextInt(keys.length))}", ${vals(rng.nextInt(vals.length))})"""
        else
          s""".del_path("${keys(rng.nextInt(keys.length))}")"""
      }.mkString
      val e = s"$$.cfg$steps"
      val doc = struct(docType.fieldNames.map(col): _*)
      // a generated fold may legitimately bail (e.g. it empties a
      // struct); every chain that lowers must match the interpreter
      if (Jetro.evalNative(e, doc, docType).isDefined) differential(e)
    }
  }
}
