package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.jexpr.{JArr, JBool, JFloat, JInt, JNull, JObj, JStr, JValue, Jetro}
import scala.collection.immutable.{ListMap, VectorMap}

/** Differential contract for the MAP-typed lane (Lower.mapMethod): the
  * object builtins over `map<string, V>` columns must produce identical
  * values through the columnar lowering and the document interpreter
  * over the to_json'd row — DocColumnSpec's two-backend guarantee for
  * the map analogue of the array lane. Order rules are load-bearing
  * (VectorMap first-position-last-value, merge update-in-place,
  * rename-to-end), so most cases pin them through `keys()`/`entries()`
  * arrays, which compare order-sensitively.
  */
class MapColumnSpec extends SparkSpec {

  private val docType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("props", MapType(StringType, LongType, valueContainsNull = true),
      nullable = true),
    StructField("attrs", MapType(StringType, StringType, valueContainsNull = true),
      nullable = true),
    StructField("extra", MapType(StringType, LongType, valueContainsNull = true),
      nullable = true),
    StructField("pairs",
      ArrayType(ArrayType(StringType, containsNull = true), containsNull = true),
      nullable = true)))

  /** Deterministic corpus: varied sizes and entry orders, an empty
    * map, a null map, null values, overlapping keys across props/extra
    * (merge/defaults in-place vs append), duplicate and malformed
    * pairs. */
  private lazy val docs = {
    val keyPool = Vector("alpha", "beta", "ax", "bx", "c", "k")
    val rows = (0 until 36).map { i =>
      val props =
        if (i == 5) null
        else ListMap((0 until i % 5).map { j =>
          keyPool((i + j) % keyPool.length) ->
            (if ((i + j) % 7 == 0) null
             else java.lang.Long.valueOf((i * 3 + j) % 9L))
        }: _*)
      val attrs =
        if (i == 9) null
        else ListMap((0 until i % 4).map { j =>
          keyPool((i * 2 + j) % keyPool.length) -> s"v${(i + j) % 5}"
        }: _*)
      val extra =
        if (i == 13) null
        else ListMap((0 until (i + 2) % 4).map { j =>
          keyPool((i + j + 3) % keyPool.length) ->
            java.lang.Long.valueOf((i + j * 5) % 11L)
        }: _*)
      val pairs =
        if (i == 17) null
        else (0 until i % 5).map { j =>
          if ((i + j) % 9 == 0) Seq(s"only${j}")            // malformed: len 1
          else Seq(keyPool((i * j) % keyPool.length), s"p${(i + j) % 4}")
        }
      Row(i.toLong, props, attrs, extra, pairs)
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

  /** Order-SENSITIVE structural equality: objects compare as entry
    * SEQUENCES, because entry order is part of the lane contract. */
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

  /** Returns true when the expression lowered (and matched); with
    * `mustLower = false` a non-lowering chain is skipped, not failed —
    * the generator test uses that to sample a random pool. */
  private def differential(expr: String, mustLower: Boolean = true): Boolean = {
    val doc = struct(docType.fieldNames.map(col): _*)
    val nativeCol = Jetro.evalNative(expr, doc, docType) match {
      case Some(c)            => c
      case None if !mustLower => return false
      case None               => fail(s"did not lower: $expr")
    }
    val both = docs
      .select(col("id"), nativeCol.as("native"), to_json(doc).as("json"))
      .orderBy("id")
      .collect()
    val compiled = Jetro.compile(expr)
    both.foreach { r =>
      val native = toJ(r.get(1))
      val interp =
        try compiled.evalValue(JValue.parse(r.getString(2)))
        catch { case _: jexpr.EvalException => jexpr.JNull }
      assert(jEq(native, interp),
        s"row id=${r.getLong(0)} expr=$expr native=${native.render} interp=${interp.render}")
    }
    true
  }

  private val exprs = Seq(
    // projections
    "$.props.keys()",
    "$.props.values()",
    "$.props.len()",
    "$.attrs.entries()",
    "$.attrs.to_pairs()",
    // filters (order kept)
    "$.props.filter_keys(@.starts_with(\"a\")).keys()",
    "$.props.filter_values(@ != null and @ > 3).values()",
    "$.attrs.filter_values(@.ends_with(\"1\")).entries()",
    // value/key transforms
    "$.props.transform_values(@ ?? 0).values()",
    "$.attrs.transform_values(@.upper()).entries()",
    "$.attrs.transform_keys(@.upper()).keys()",
    // collisions: a constant key collapses EVERYTHING to one entry —
    // first position, LAST value; len() collides equal-length keys
    "$.attrs.transform_keys(\"k\").entries()",
    "$.props.transform_keys(@.len()).keys()",
    "$.props.transform_keys(@.len()).values()",
    // merge/defaults: in-place updates vs appended keys, struct-literal
    // and map-column args (keys+values pin order over the long maps,
    // where the [k, v] entries pair would be heterogeneous)
    "$.props.transform_values(@).merge({alpha: 99, zz: 1}).keys()",
    "$.props.transform_values(@).merge({alpha: 99, zz: 1}).values()",
    "$.props.transform_values(@).merge($.extra).keys()",
    "$.props.transform_values(@).merge($.extra).values()",
    // deep_merge over non-object values ≡ merge (right wins per key)
    "$.props.transform_values(@).deep_merge($.extra).keys()",
    "$.props.transform_values(@).deep_merge($.extra).values()",
    "$.props.defaults({alpha: 0, zz: 7}).keys()",
    "$.props.defaults({alpha: 0, zz: 7}).values()",
    "$.props.defaults($.extra).keys()",
    "$.props.defaults($.extra).values()",
    // invert: display keys, dup collapse (result is a string map)
    "$.attrs.invert().entries()",
    "$.props.invert().entries()",
    // set/update: in-place or append-at-end
    "$.props.set(\"alpha\", 42).keys()",
    "$.props.set(\"alpha\", 42).values()",
    "$.props.set(\"brandnew\", 7).keys()",
    "$.props.set(\"brandnew\", 7).values()",
    "$.props.update(\"alpha\", @ ?? -1).values()",
    "$.props.update(\"brandnew\", 5 if @ == null else @).keys()",
    "$.props.update(\"brandnew\", 5 if @ == null else @).values()",
    // rename: positional form; to-end vs in-place-at-target
    "$.props.rename(\"alpha\", \"omega\").keys()",
    "$.props.rename(\"alpha\", \"beta\").keys()",
    "$.props.rename(\"alpha\", \"beta\").values()",
    "$.props.rename(\"nope\", \"x\").keys()",
    // from_pairs over the pairs lane: malformed skipped, dups collapse
    "$.pairs.from_pairs().entries()",
    "$.pairs.from_pairs().keys()",
    // pick/omit over map lanes (round 10): pick emits the named keys
    // in ARG order (miss → null entry, null receiver → null); omit is
    // an order-keeping entry filter (null receiver unchanged)
    "$.props.pick(\"alpha\", \"nope\").keys()",
    "$.props.pick(\"alpha\", \"nope\").values()",
    "$.props.pick(\"alpha\", \"k\", \"alpha\").keys()",
    "$.props.pick(\"nope\").values()",
    "$.attrs.pick(\"beta\").entries()",
    "$.props.omit(\"alpha\").keys()",
    "$.props.omit(\"alpha\", \"k\").values()",
    "$.props.omit(\"nope\").len()",
    // static field access over a map lane: null on missing, value
    // type statically known (string methods lower on string values)
    "$.props.alpha",
    "$.props.alpha ?? -1",
    "$.attrs.alpha.upper()",
    "$.props.nope",
    // key membership: hit, miss, null receiver (row 5 — interpreter
    // membership(JNull) = false, so the lowering must two-value it in
    // value position), and a null-VALUED key still counts as present
    "$.props has \"alpha\"",
    "$.props has \"nope\"",
    "$.attrs has \"beta\"",
    "1 if $.props has \"k\" else 0",
    // method-form membership over map and array lanes; the
    // values().has($.props.nope) case probes a NULL item against an
    // array that may hold null elements (JValue.eq finds them —
    // array_contains would null out)
    "$.props.has(\"alpha\")",
    "$.props.missing(\"alpha\")",
    "$.props.includes(\"k\")",
    "$.attrs.contains(\"beta\")",
    "$.props.values().has(3)",
    "$.props.values().has($.props.nope)",
    "$.props.values().missing(5)",
    // .type(): static per lane except null (null map → "null", long
    // value hit → "number", miss → "null")
    "$.props.type()",
    "$.attrs.type_of()",
    "$.props.alpha.type()",
    "$.pairs.type()",
    "$.id.type()",
    // value pipes: `@` threads stage to stage; bare idents in a stage
    // resolve against the stage value (struct current → element scope)
    "$.props.values().compact().sum() | @ * 2 | @ + 1",
    "($.attrs.beta ?? \"x\") | upper()",
    "$.props | @.keys().join(\",\")",
    "$.props | keys() | @.join(\",\")",
    "$.props | @.set_path(\"z\", 5).len()",
    "$.id | to_string()",
    "$ | props.len() ?? -1",
    // range: exclusive upper, wrong-sign/zero step → []; chain/join:
    // array concat with scalars (and null arrays/values) pushing
    // through as single elements
    "range(5)",
    "range($.id)",
    "range(2, $.id)",
    "range($.id, 0, -2)",
    "range(1, 10, 3)",
    "range(3, 3)",
    "range(5, 1)",
    "range(1, 5, 0)",
    "chain($.props.values(), $.extra.values())",
    "chain($.props.values(), 7)",
    "chain(1, 2)",
    "chain($.props.values(), $.props.nope)",
    "chain($.pairs, $.pairs).len()",
    // zip/zip_longest globals ARE the free-function rewrite; product
    // is row-major [x,y] pairs, null on non-array operands
    "zip($.props.keys(), $.extra.keys()).len()",
    "zip_longest($.props.values(), $.extra.values()).flatten().compact().sum()",
    "product($.props.keys(), $.attrs.keys()).len()",
    "product($.props.keys(), $.attrs.keys()).flatten().join(\"|\")",
    // free-function style: f(x, rest) ≡ x.f(rest) — reuses the method
    // lanes through the global-call rewrite
    "upper($.attrs.beta ?? \"x\")",
    "len($.props)",
    "keys($.props)",
    "includes($.props, \"k\")",
    "missing($.props, \"nope\")",
    "type_of($.props)",
    "trim(\"  pad  \")",
    // struct-receiver membership (the row doc itself): the bridge
    // omits null fields, so `has` = field non-null; includes keeps the
    // null-receiver fallthrough (root is never null here)
    "$.has(\"props\")",
    "$.missing(\"props\")",
    "$.includes(\"attrs\")",
    "$.has(\"nope\")",
    "$.missing(\"nope\")",
    // to_json/to_string = recv.render: null receiver → the text
    // "null", empty map → "{}", null VALUES kept as :null, entry
    // order preserved
    "$.props.to_json()",
    "$.attrs.to_json()",
    "$.props.to_string()",
    "$.props.transform_values(@).merge({z: 1}).to_json()",
    // one-segment set_path/del_path(s): exactly set/key-removal, with
    // delPath's null-receiver-unchanged rule (row 5 reads through as
    // objOnly {} on the terminal)
    "$.props.set_path(\"alpha\", 42).values().compact().sum()",
    "$.props.set_path(\"newk\", 1).keys()",
    "$.props.del_path(\"alpha\").keys()",
    "$.props.del_paths([\"alpha\", \"k\"]).keys()",
    "$.attrs.del_path(\"nope\").entries()",
    // dot-path walks over maps (and through the root struct): field
    // miss and null receivers read as JNull; has_path is the non-null
    // test
    "$.props.get_path(\"alpha\") ?? -1",
    "$.props.has_path(\"alpha\")",
    "$.props.has_path(\"nope\")",
    "$.get_path(\"props.alpha\") ?? -1",
    "$.get_path(\"attrs.beta\") ?? \"-\"",
    "$.has_path(\"props.k\")",
    "($.props.get_path(\"alpha\") ?? 0) * 3",
    "$.get_path(\"attrs.beta\").upper() ?? \"-\"",
    // chains off map results
    "$.props.keys().sort().join(\",\")",
    "$.props.values().compact().sum()",
    "$.props.transform_values(@).merge($.extra).len()",
    "$.attrs.transform_keys(@.upper()).filter_keys(@.len() > 1).entries()")

  exprs.foreach { e =>
    test(s"native == interpreter: $e") { differential(e) }
  }

  test("randomized map-op chains: compiled == interpreted") {
    // generator-based arm over the same corpus: 1-3 kind-tracked map
    // ops then an order-pinning terminal, every chain asserted to
    // LOWER. Sweep extra seeds with GRAFT_FUZZ_SEED=<n>.
    val rng = new scala.util.Random(FuzzSeed(31847))
    val keyPool = Seq("alpha", "beta", "ax", "bx", "c", "k", "newk")
    def key() = keyPool(rng.nextInt(keyPool.length))
    // kind: true = long-valued lane, false = string-valued
    def op(longKind: Boolean): (String, Boolean) = rng.nextInt(12) match {
      case 10 => (s""".del_path("${key()}")""", longKind)
      case 11 =>
        (if (longKind) s""".set_path("${key()}", ${rng.nextInt(9)})"""
         else s""".set_path("${key()}", "p${rng.nextInt(4)}")""", longKind)
      case 0 => (s""".filter_keys(@.starts_with("${key().take(1)}"))""", longKind)
      case 1 =>
        (if (longKind) ".filter_values(@ != null and @ > 2)"
         else ".filter_values(@.len() > 1)", longKind)
      case 2 =>
        (if (longKind) s".transform_values((@ ?? ${rng.nextInt(5)}) * 2)"
         else ".transform_values(@.upper())", longKind)
      case 3 => (rng.nextInt(3) match {
        case 0 => ".transform_keys(@.upper())"
        case 1 => ".transform_keys(@.len())"
        case _ => ".transform_keys(\"k\")"
      }, longKind)
      case 4 =>
        val m = if (rng.nextBoolean()) "merge" else "deep_merge"
        (if (longKind) s""".$m({${key()}: ${rng.nextInt(9)}, zz: 1})"""
         else s""".$m({${key()}: "q", zz: "w"})""", longKind)
      case 5 =>
        (if (longKind) s""".defaults({${key()}: ${rng.nextInt(9)}})"""
         else s""".defaults({${key()}: "d"})""", longKind)
      case 6 => (".invert()", false)
      case 7 =>
        (if (longKind) s""".set("${key()}", ${rng.nextInt(9)})"""
         else s""".set("${key()}", "s${rng.nextInt(4)}")""", longKind)
      case 8 =>
        (if (longKind) s""".update("${key()}", (@ ?? 0) + 1)"""
         else s""".update("${key()}", (@ ?? "") + "u")""", longKind)
      case _ => (s""".rename("${key()}", "${key()}")""", longKind)
    }
    def terminal(longKind: Boolean): String = rng.nextInt(13) match {
      case 9  => ".to_json()"
      case 10 => ".type()"
      case 11 => " | @.len()"                // pipe: @ = the piped map
      case 12 => s""" | @.has("${key()}")""" // pipe + membership
      case 0 => ".keys()"
      case 1 => ".values()"
      case 2 => ".len()"
      case 3 => ".keys().join(\"|\")"
      case 4 => s""".has("${key()}")"""
      case 5 => s""".missing("${key()}")"""
      case 6 => s""".includes("${key()}")"""
      case 7 => s""" has "${key()}""""
      case _ => if (longKind) ".values().compact().sum()" else ".keys()"
    }
    (0 until 100).foreach { _ =>
      val (recv, kind0) = rng.nextInt(3) match {
        case 0 => ("$.props", true)
        case 1 => ("$.attrs", false)
        case _ => ("$.extra", true)
      }
      var kind = kind0
      val n = 1 + rng.nextInt(3)
      val sb = new StringBuilder(recv)
      (0 until n).foreach { i =>
        var (s, k2) = op(kind)
        // a write-shaped first step (merge/deep_merge on a root path)
        // is a chain-WRITE — keep the generated chains in read position
        if (i == 0 && (s.startsWith(".merge") || s.startsWith(".deep_merge"))) {
          sb ++= ".transform_values(@)"
        }
        sb ++= s; kind = k2
      }
      sb ++= terminal(kind)
      differential(sb.toString)
    }
  }

  test("map ops stay on the compiled rung at table scope") {
    // the table analogue: a resolver-shaped map column flows through
    // Lower.compile with no doc/rowwise bail
    val ev = docs.select(col("id"), col("props"), col("attrs"))
    val out = graft.plans.Lower.tryCompile(
      """$.t.sort_by(id).map({id: id, ks: props.keys().join("|"),
        |  n: props.merge({z: 1}).len()})""".stripMargin,
      _ => ev)
    assert(out.nonEmpty, "map chain should lower at table scope")
    assert(out.get.count() == 36)
  }
}
