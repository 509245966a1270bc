package graft

import org.apache.spark.sql.DataFrame

/** Contract of the distributed per-row document-mode fallback
  * (Graft.rowwiseCompile) and the docFallback row cap.
  *
  * The fallback ladder mirrors the reference's backend-preference lists
  * (ir/physical.rs:219-230): relational lowering first, then — NEW in
  * round 7 — per-row interpreter dispatch for element-wise pipelines
  * (the reference's per-element VM dispatch, defs.rs:74-90), and only
  * then the whole-document driver-side interpreter, now bounded by
  * `spark.graft.docFallback.maxRows`.
  */
class RowwiseFallbackSpec extends SparkSpec {

  /** Rows as a sorted set of JSON texts — schema-inference order and
    * partition order are both irrelevant to the comparison. */
  private def rowsOf(df: DataFrame): Vector[String] =
    df.toJSON.collect().toVector.sorted

  // `rec` is the one construct with no relational lowering by design
  // (a fixpoint has no static plan, SURVEY §8); `rec(@)` is the
  // identity fixpoint, so wrapping any subexpression in it keeps the
  // value while forcing the chain off the compiled rung — the
  // canonical "bails relationally, runs distributed" marker.
  private val rowwiseExpr =
    """$.supplier.filter(s_acctbal >= 0).map({k: s_suppkey, nw: s_name.words().len().rec(@)})"""

  test("element-wise non-lowerable pipeline picks the rowwise backend") {
    assert(!Graft.lowers(spark, sf, rowwiseExpr))
    assert(Graft.backend(spark, sf, rowwiseExpr) == "rowwise")
  }

  test("rowwise result equals the whole-document interpreter result") {
    val rw  = Graft.rowwiseCompile(spark, sf, rowwiseExpr).get
    val doc = Graft.docFallback(spark, sf, rowwiseExpr)
    val got = rowsOf(rw)
    assert(got.nonEmpty && got == rowsOf(doc))
  }

  test("rowwise plan stays distributed: parquet scan, no driver collect") {
    val rw = Graft.rowwiseCompile(spark, sf, rowwiseExpr).get
    // spark.read.json over a derived Dataset shows as Scan ExistingRDD;
    // the proof of distribution is the RDD lineage: the parquet scan
    // (FileScanRDD) feeds the executors directly, with no driver-side
    // parallelized local collection anywhere in the chain
    val lineage = rw.rdd.toDebugString
    assert(lineage.contains("FileScanRDD"), lineage)
    assert(!lineage.contains("ParallelCollectionRDD"), lineage)
  }

  test("cross-element stages refuse the rowwise backend") {
    // sort_by over a non-lowerable key: neither relational nor row-wise
    val e = """$.supplier.sort_by(s_name.rec(@)).map({k: s_suppkey})"""
    assert(Graft.backend(spark, sf, e) == "document")
  }

  test("a nested $ reference breaks per-row independence and is refused") {
    // each element reads a global: correct only with the whole document
    val e = """$.nation.map({k: n_nationkey, total: $.region.count()})"""
    assert(Graft.rowwiseCompile(spark, sf, e).isEmpty)
  }

  test("lowerable pipelines never reach the rowwise rung") {
    val e = """$.supplier.filter(s_acctbal >= 0).map({k: s_suppkey, up: s_name.upper()})"""
    assert(Graft.backend(spark, sf, e) == "relational")
  }

  // ── round 8: explode / chain-writes / patch $ on the rowwise rung ──

  test("explode(field) qualifies as element-wise and fans out per row") {
    val e = """$.documents.map({k: doc_id, w: text.words().rec(@)}).explode("w")"""
    assert(Graft.backend(spark, sf, e) == "rowwise")
    val rw = Graft.rowwiseCompile(spark, sf, e).get
    assert(rowsOf(rw) == rowsOf(Graft.docFallback(spark, sf, e)))
    // genuinely fanned out: more word rows than documents
    assert(rw.count() > graft.core.Tables(spark, sf, "documents").count())
  }

  test("row-iterating chain-write runs distributed as a per-row patch") {
    // non-lowerable leaf (rec) → bails relationally; the rewrite
    // (expr).supplier unions per-row patched docs into table rows
    val e = """$.supplier{s_acctbal >= 0}.s_name.modify(@.words().len().rec(@))"""
    assert(!Graft.lowers(spark, sf, e))
    assert(Graft.backend(spark, sf, e) == "rowwise")
    val rw  = Graft.rowwiseCompile(spark, sf, e).get
    val doc = Graft.docFallback(spark, sf, s"($e).supplier")
    val got = rowsOf(rw)
    assert(got.nonEmpty && got == rowsOf(doc))
    // unmatched rows pass through unpatched, so every row survives
    assert(rw.count() == 10)
  }

  test("chain-delete over matching rows is a distributed filter-out") {
    val e = """$.supplier{s_acctbal < 0 or s_name.rec(@) == ""}.delete()"""
    assert(Graft.backend(spark, sf, e) == "rowwise")
    val rw  = Graft.rowwiseCompile(spark, sf, e).get
    assert(rowsOf(rw) == rowsOf(Graft.docFallback(spark, sf, s"($e).supplier")))
  }

  test("patch $ over one table's rows takes the rowwise rung when leaves don't lower") {
    val e = """patch $ { supplier[*].s_name: @.upper().rec(@) }"""
    assert(!Graft.lowers(spark, sf, e))
    assert(Graft.backend(spark, sf, e) == "rowwise")
    val rw = Graft.rowwiseCompile(spark, sf, e).get
    assert(rowsOf(rw) == rowsOf(Graft.docFallback(spark, sf, s"($e).supplier")))
  }

  test("deep descent and ..shape/..like distribute on the rowwise rung") {
    // non-lowerable nesting (rec) → bails relationally; the descent
    // walks each row's own nodes, so it distributes
    val e1 = """$.supplier.map({k: s_suppkey, a: {v: s_name.upper().rec(@)}})..v"""
    assert(Graft.backend(spark, sf, e1) == "rowwise")
    assert(rowsOf(Graft.rowwiseCompile(spark, sf, e1).get) ==
      rowsOf(Graft.docFallback(spark, sf, e1)))
    val e2 = """$.supplier.map({k: s_suppkey, a: {v: s_name.upper().rec(@), tag: "x"}})
               |..shape({v, tag})""".stripMargin
    assert(Graft.backend(spark, sf, e2) == "rowwise")
    assert(rowsOf(Graft.rowwiseCompile(spark, sf, e2).get) ==
      rowsOf(Graft.docFallback(spark, sf, e2)))
    // ..find's predicate ranges over ALL nodes including the receiver
    // array itself — not per-row; refused
    assert(Graft.rowwisePlan(
      """$.supplier.map({k: s_suppkey, a: {v: s_name.upper().rec(@)}})..find(v != null)""").isEmpty)
  }

  test("non-row-iterating or trailing-read chain-writes are refused") {
    // write must be the LAST step — a read after it sees the whole doc
    assert(Graft.rowwiseCompile(spark, sf,
      "$.supplier[*].s_acctbal.set(0).count()").isEmpty)
    // path must fan over rows first — a whole-table write isn't per-row
    assert(Graft.rowwiseCompile(spark, sf,
      """$.supplier.s_name.set("x")""").isEmpty)
    // a $ reference in the value reads across rows
    assert(Graft.rowwiseCompile(spark, sf,
      "$.supplier[*].s_acctbal.set($.region.count())").isEmpty)
    // patch batches over two tables can't run per-row on one
    assert(Graft.rowwiseCompile(spark, sf,
      "patch $ { supplier[*].s_acctbal: @.abs(), region[*].r_name: @.upper().rec(@) }").isEmpty)
  }

  // ── round 10: (table, expr)-keyed LRU + static-schema shortcut ──

  test("interleaved rowwise queries do not evict each other's cache") {
    // two distinct rowwise pipelines alternate: with the (table, expr)
    // LRU (Graft.rowwiseCache) every materialization after the first
    // reads the persisted string cache — the single-generation slot of
    // rounds 7-9 would re-run the interpreter once per switch
    Graft.clearRowwiseCache()
    val c = Graft.rowwiseCounters(spark)
    val ea = """$.region.map({k: r_regionkey, u: r_name.title_case().rec(@)})"""
    val eb = """$.nation.map({k: n_nationkey, u: n_name.title_case().rec(@)})"""
    val na = graft.core.Tables(spark, sf, "region").count()
    val nb = graft.core.Tables(spark, sf, "nation").count()
    val before = c.evaluated.value
    val dfa = Graft.rowwiseCompile(spark, sf, ea).get
    val dfb = Graft.rowwiseCompile(spark, sf, eb).get
    dfa.collect(); dfb.collect()
    // one interpreter pass each (these chains carry rec → inference path)
    assert(c.evaluated.value - before == na + nb,
      s"expected ${na + nb} evaluations, got ${c.evaluated.value - before}")
    // alternating re-materializations and re-compiles stay free
    dfa.collect(); dfb.collect()
    Graft.rowwiseCompile(spark, sf, ea).get.collect()
    Graft.rowwiseCompile(spark, sf, eb).get.collect()
    assert(c.evaluated.value - before == na + nb,
      s"re-evaluated: ${c.evaluated.value - before} != ${na + nb}")
  }

  test("static schema shortcut matches what inference would produce") {
    // provable pipelines: the derived schema must equal the schema
    // spark.read.json infers from the actual interpreter output —
    // field order (alphabetical), widths (long/double), nullability
    val exprs = Seq(
      """$.supplier.filter(s_acctbal >= 0).map({k: s_suppkey, nw: s_name.words().len(), half: s_acctbal / 2})""",
      """$.customer{c_acctbal > 0}.map({k: c_custkey, w: c_mktsegment.words(), nest: {a: c_name, b: c_nationkey}})""",
      """$.documents.filter(lang == "en").map({id: doc_id, w: text.words()}).explode("w")""",
      """$.customer.pick("c_custkey", "c_mktsegment")""",
      """$.nation.omit("n_comment")""",
      """$.supplier.map({k: s_suppkey, big: s_acctbal when s_acctbal > 100})""",
      // chain-write / patch rewrites `(expr).table` (round-10 widening):
      // table schema with the written fields' types adjusted — only
      // SAME-json-kind writes are provable (see the cross-kind test)
      """$.documents{lang == "en"}.n_chars.modify(@ * 2)""",
      """$.supplier{s_acctbal < 0}.delete()""",
      """patch $ { documents[*].n_chars: @ * 2 when @ < 50, documents[*].lang: @.upper() }""")
    exprs.foreach { e =>
      val (table, evalExpr) = Graft.rowwisePlan(e).get
      val src = graft.core.Tables(spark, sf, table)
      val stat = graft.plans.Lower.rowwiseStaticSchema(src.schema, evalExpr)
      assert(stat.isDefined, s"should prove: $e")
      val inferred = spark.read.json(Graft.rowwiseJson(src, table, evalExpr)).schema
      assert(stat.get == inferred, s"static ${stat.get.sql} != inferred ${inferred.sql} for $e")
    }
    // NOT provable: rec (untypeable leaf), compact (per-row shape),
    // dynamic keys, scalar streams, presence-changing writes (unset
    // drops a column from every matched line), kind-flipping writes
    Seq(
      """$.region.map({k: r_regionkey, u: r_name.upper().rec(@)})""",
      """$.region.map({k: r_regionkey}).compact()""",
      """$.region.map(r_regionkey)""",
      """$.documents[*].unset("lang")""",
      """$.documents{lang == "en"}.n_chars.modify("s")""").foreach { e =>
      val plan = Graft.rowwisePlan(e)
      assert(plan.isDefined, e)
      val src = graft.core.Tables(spark, sf, plan.get._1)
      assert(graft.plans.Lower.rowwiseStaticSchema(src.schema, plan.get._2).isEmpty,
        s"should NOT prove: $e")
    }
  }

  test("cross-numeric-kind writes keep the inference path (no 1.0-vs-1 drift)") {
    // round-10 ADVICE: the inferred kind of a long column written with
    // doubles depends on which rows the fan matches at RUNTIME — a [*]
    // fan or an all/zero-match guard leaves only ONE numeric kind in the
    // JSON, so inference gives LONG where a static long∪double union
    // said DOUBLE (long values would then parse as doubles and render
    // 1.0). Cross-kind writes must therefore not prove a static schema.
    Seq(
      """$.documents{lang == "en"}.n_chars.set(@ * 1.5)""", // long ← double, guarded
      """$.documents[*].n_chars.set(@ * 1.5)""",            // long ← double, all rows
      """patch $ { documents[*].n_chars: @ * 1.5 }""").foreach { e =>
      val plan = Graft.rowwisePlan(e)
      assert(plan.isDefined, e)
      val src = graft.core.Tables(spark, sf, plan.get._1)
      assert(graft.plans.Lower.rowwiseStaticSchema(src.schema, plan.get._2).isEmpty,
        s"cross-kind write must not prove: $e")
    }
    // behavioral pin: a zero-match guard leaves every n_chars a LONG —
    // the inference path keeps them longs (renders 42, never 42.0),
    // matching the whole-document interpreter bit-for-bit
    val e = """$.documents{lang == "zz-none"}.n_chars.set(@ * 1.5)"""
    val rw  = Graft.rowwiseCompile(spark, sf, e).get
    val doc = Graft.docFallback(spark, sf, s"($e).documents")
    val got = rowsOf(rw)
    assert(got.nonEmpty && got == rowsOf(doc))
    assert(!got.head.matches(""".*"n_chars":\d+\.0.*"""), got.head)
  }

  test("provable chains compile with ZERO interpreter work (no inference scan)") {
    Graft.clearRowwiseCache()
    val c = Graft.rowwiseCounters(spark)
    // the guarded field bails the relational shape lowering (shapeCols:
    // "map shape field unsupported") but still types statically, so the
    // chain lands on the rowwise rung WITH a proven schema
    val e = """$.supplier.map({k: s_suppkey, nw: s_name.words().len(),
              |               big: s_acctbal when s_acctbal > 100})""".stripMargin
    assert(Graft.backend(spark, sf, e) == "rowwise")
    val before = c.evaluated.value
    val rw = Graft.rowwiseCompile(spark, sf, e).get // static schema: no inference pass
    assert(c.evaluated.value == before,
      s"compile ran the interpreter ${c.evaluated.value - before} times")
    val n = graft.core.Tables(spark, sf, "supplier").count()
    rw.collect() // the one interpreter pass, materialising the cache
    rw.collect() // cached
    assert(c.evaluated.value - before == n,
      s"interpreter ran ${c.evaluated.value - before} times for $n rows")
    // and the rows equal the document interpreter's (inference path)
    assert(rowsOf(rw) == rowsOf(Graft.docFallback(spark, sf, e)))
  }

  test("docFallback is capped by spark.graft.docFallback.maxRows") {
    val key = "spark.graft.docFallback.maxRows"
    spark.conf.set(key, "3") // supplier has 10 rows at sf0.001
    try {
      val e = """$.supplier.sort_by(s_name.rec(@)).map({k: s_suppkey})"""
      val err = intercept[IllegalStateException] {
        Graft.query(spark, sf, e).collect()
      }
      assert(err.getMessage.contains(key) &&
        err.getMessage.contains("does not lower"), err.getMessage)
    } finally spark.conf.unset(key)
  }

  test("under the cap the document fallback still answers") {
    val e = """$.region.sort_by(r_name.rec(@)).map({k: r_regionkey})"""
    assert(Graft.backend(spark, sf, e) == "document")
    assert(Graft.query(spark, sf, e).count() == 5)
  }

  test("walk/walk_pre/rec qualify only with an array-identity kind guard") {
    // reference walk_apply/rec_apply transform the RECEIVER too
    // (array.rs:693-755) — the full stream in doc mode, a singleton
    // here — so only lambdas provably identity on arrays distribute
    val guarded =
      """$.supplier.map({k: s_suppkey, n: s_name})
        |.walk(lambda x: x.upper() if x is string and x != "" else x)""".stripMargin
    assert(Graft.rowwisePlan(guarded).isDefined)
    assert(rowsOf(Graft.rowwiseCompile(spark, sf, guarded).get) ==
      rowsOf(Graft.docFallback(spark, sf, guarded)))
    val pre = guarded.replace(".walk(", ".walk_pre(")
    assert(Graft.rowwisePlan(pre).isDefined)
    assert(rowsOf(Graft.rowwiseCompile(spark, sf, pre).get) ==
      rowsOf(Graft.docFallback(spark, sf, pre)))
    // guarded rec at top level: identity on the stream — but the
    // QUALIFICATION is what distributes; result matches doc mode
    val recTop =
      """$.supplier.map({k: s_suppkey, b: s_acctbal})
        |.rec(@ - 9 if @ is number and @ > 100 else @)""".stripMargin
    assert(Graft.rowwisePlan(recTop).isDefined)
    assert(rowsOf(Graft.rowwiseCompile(spark, sf, recTop).get) ==
      rowsOf(Graft.docFallback(spark, sf, recTop)))
    // refused: no guard (the lambda would see the whole stream array)
    assert(Graft.rowwisePlan(
      "$.supplier.map({k: s_suppkey}).walk(lambda x: x)").isEmpty)
    // refused: an array guard transforms the receiver itself
    assert(Graft.rowwisePlan(
      "$.supplier.map({k: s_suppkey}).walk(lambda x: x.reverse() if x is array else x)").isEmpty)
    // refused: kind guard not the FIRST conjunct
    assert(Graft.rowwisePlan(
      """$.supplier.map({k: s_suppkey, n: s_name})
        |.walk(lambda x: x.upper() if x != "" and x is string else x)""".stripMargin).isEmpty)
    // refused: else branch is not the bare parameter
    assert(Graft.rowwisePlan(
      "$.supplier.map({k: s_suppkey}).walk(lambda x: x.upper() if x is string else 0)").isEmpty)
    // refused: a $ reference reads across rows
    assert(Graft.rowwisePlan(
      "$.supplier.map({k: s_suppkey}).walk(lambda x: $.region.count() if x is number else x)").isEmpty)
  }

  test("per-row eval errors drop the row AND tick graft.rowwise.erroredRows") {
    // the SCALE.md per-row tier: an EvalException nulls the row and the
    // explode drops it — but the dropped mass must be OBSERVABLE.
    // Division by a zero denominator errors loudly in the interpreter
    // (reference-exact), so every supplier row is dropped and counted.
    val c = Graft.rowwiseCounters(spark)
    val before = c.errored.value
    val e = "$.supplier.map({k: s_suppkey, x: 10 / (s_acctbal - s_acctbal)})"
    val rw = Graft.rowwiseCompile(spark, sf, e).get
    assert(rw.count() == 0)
    val n = graft.core.Tables(spark, sf, "supplier").count()
    assert(c.errored.value - before == n,
      s"expected $n dropped rows counted, got ${c.errored.value - before}")
    // a healthy query leaves the counter untouched
    val mid = c.errored.value
    Graft.rowwiseCompile(spark, sf, rowwiseExpr).get.collect()
    assert(c.errored.value == mid)
  }
}
