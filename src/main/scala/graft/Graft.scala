package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.jexpr.{Expr, Jetro, JValue}
import graft.plans.Lower

/** Public engine entry point: run a jetro expression against the tables
  * under `sfDir`.
  *
  * Backend preference mirrors the reference's per-node backend lists
  * (ir/physical.rs:219-230): try the relational lowering first — the
  * whole pipeline becomes one Catalyst plan, scaling with the cluster —
  * and only if some construct can't lower, fall back to the document
  * interpreter over a single collected document. The fallback preserves
  * the language's full semantics but materialises the source table on
  * the driver, so it is only for small/interactive use; the lowering
  * covers the table-scale subset.
  */
object Graft {

  def query(spark: SparkSession, sfDir: String, expr: String): DataFrame =
    Lower.tryCompile(expr, t => Tables(spark, sfDir, t))
      .orElse(rowwiseCompile(spark, sfDir, expr))
      .getOrElse(docFallback(spark, sfDir, expr))

  /** True when the expression fully lowers to a Catalyst plan. */
  def lowers(spark: SparkSession, sfDir: String, expr: String): Boolean =
    Lower.tryCompile(expr, t => Tables(spark, sfDir, t)).isDefined

  /** Which execution path [[query]] takes for `expr`:
    *   - `"relational"` — full Catalyst lowering ([[Lower]]);
    *   - `"rowwise"`    — distributed per-row interpreter fallback;
    *   - `"document"`   — driver-side whole-document interpreter. */
  def backend(spark: SparkSession, sfDir: String, expr: String): String =
    if (lowers(spark, sfDir, expr)) "relational"
    else if (rowwisePlan(expr).exists(p => Tables.names.contains(p._1))) "rowwise"
    else "document"

  /** Pipeline stages that distribute over stream concatenation:
    * `f(rowsA ++ rowsB) == f(rowsA) ++ f(rowsB)` because each element
    * is mapped/kept/dropped independently of every other element
    * (`explode(field)` qualifies: each row fans out to its own
    * sub-rows, reference collection.rs:497-520). Any stage that looks
    * across elements (sort, agg, window, zip, take, index…) is
    * excluded — those either lower relationally or go to the
    * whole-document interpreter. */
  private val rowwiseMethods = Set(
    "filter", "where", "find_all", "map", "flat_map", "compact",
    "pick", "omit", "remove", "explode")

  private def elementwiseStep(s: Expr.Step): Boolean = {
    import Expr._
    s match {
      // a nested `$` reference (another table, or the table itself as a
      // whole — e.g. dividing each row by a global sum) breaks per-row
      // independence, so any Root in an argument disqualifies the stage
      case Step.Method(m, args) if rowwiseMethods(m) =>
        !args.exists(a => containsRoot(a.e))
      case Step.InlineFilter(p) => !containsRoot(p)
      case Step.MapShape(p, sh) =>
        !p.exists(containsRoot) && !containsRoot(sh)
      // deep descent walks the receiver array's ELEMENTS in order
      // (Deep.descend arrays recurse per element; `..` drops the
      // receiver itself) — pure concatenation of per-element matches
      case Step.Descendant(_) => true
      // walk/walk_pre/rec apply their lambda to the RECEIVER node too
      // (reference walk_apply transforms the root, rec_apply fixpoints
      // the whole value — array.rs:693-755), and the receiver is the
      // full stream array in doc mode but a singleton here. They
      // qualify only when the lambda provably takes the identity
      // branch on ARRAY nodes — a kind-guarded transform
      // `T(x) if x is <non-array kind> [and …] else x` — so the root
      // application is identity on both shapes and what remains is the
      // per-element recursion, which concatenates.
      case Step.Method("walk" | "walk_pre" | "rec", args) =>
        args.length == 1 && arrayIdentityGuarded(args(0).e)
      // ..shape/..like candidates are OBJECTS only, so the receiver
      // array node can never match — per-element again. `..find` is
      // NOT here: its predicate ranges over ALL nodes including the
      // receiver array, which differs between the singleton and the
      // full stream.
      case Step.DeepMethod("shape" | "deep_shape" | "like" | "deep_like", args) =>
        !args.exists(a => containsRoot(a.e))
      case Step.Optional => true
      case _             => false
    }
  }

  /** Distributed per-row document-mode fallback (the middle rung
    * between [[Lower]] and [[docFallback]]): when the expression is a
    * single-table pipeline of element-wise stages, evaluate it per row
    * against the singleton document `{table: [row]}` and union the
    * per-row contributions with `explode`. Full interpreter semantics —
    * including constructs with no relational lowering (dynamic shapes,
    * long-tail builtins) — but the table never leaves the executors,
    * mirroring the reference's per-element VM dispatch (defs.rs:74-90)
    * instead of its whole-document tape. Output order is the source
    * partition order (element-wise stages are order-independent). */
  /** The single-table element-wise qualification check, shared by the
    * batch rung and the streaming rung (StreamOps.rowwiseStream):
    * `Some((table, evalExpr))` when the expression distributes over
    * stream concatenation. `evalExpr` is the expression to evaluate per
    * row — the original text for element-wise pipelines; for root
    * chain-writes and `patch $` blocks that fan over one table's rows,
    * the rewrite `(expr).table` so the per-row patched document unions
    * back into patched table ROWS (the same table-level convention
    * Lower.patchTable gives `patch $ {t[*]…}` relationally). */
  private[graft] def rowwisePlan(expr: String): Option[(String, String)] = {
    val ast =
      try jexpr.Parser.parse(expr)
      catch { case _: jexpr.ParseException => return None }
    ast match {
      case Expr.Chain(Expr.Root, steps) if steps.length >= 2 =>
        steps.head match {
          case Expr.Step.Field(table) =>
            if (steps.tail.forall(elementwiseStep)) Some((table, expr))
            else if (rowwiseChainWrite(steps.tail))
              Some((table, s"($expr).$table"))
            else None
          case _ => None
        }
      case Expr.Patch(Expr.Root, fields) =>
        rowwisePatchTable(fields).map(t => (t, s"($expr).$t"))
      case _ => None
    }
  }

  /** True when the post-table steps form a row-iterating chain-write
    * (`$.t[*].price.set(@ * 2)`, `$.t{pred}.f.modify(…)`, `.delete()`,
    * `.unset(k)`, `.merge(o)`): the first path step must fan over rows
    * (`[*]` / `{pred}`) so each row is patched independently, the rest
    * of the path stays WITHIN the row, and the write is the chain's
    * last step — anything after it reads the patched whole document
    * and would not distribute. Guards and values bind only `@` (the
    * pre-patch leaf, PatchEval.scala:48-58); a `$` reference reads
    * across rows and disqualifies. Mirrors the reference's rooted
    * chain-write desugar (jetro-core chain writes, M:232-235) run as a
    * distributed per-element patch. */
  private def rowwiseChainWrite(steps: Vector[Expr.Step]): Boolean = {
    import Expr._
    if (steps.length < 2) return false
    val (path, write) = (steps.init, steps.last)
    val writeOk = write match {
      case Step.Method("set" | "modify" | "unset", as) =>
        as.length == 1 && !as.exists(a => containsRoot(a.e))
      case Step.Method("delete", as) => as.isEmpty
      case Step.Method("merge" | "deep_merge", as) =>
        as.nonEmpty && !as.exists(a => containsRoot(a.e))
      case _ => false
    }
    val headOk = path.head match {
      case Step.MapShape(None, Current) => true // `[*]`
      case Step.InlineFilter(p)         => !containsRoot(p)
      case _                            => false
    }
    // within-row path steps (Interp.chainWrite's static subset — a
    // dynamic index resolves against the root scope and would see a
    // different document per rung)
    def withinRow(s: Step): Boolean = s match {
      case Step.Field(_)                     => true
      case Step.Index(Lit(jexpr.JInt(_)))    => true
      case Step.Descendant(Some(_))          => true
      case Step.MapShape(None, Current)      => true
      case Step.InlineFilter(p)              => !containsRoot(p)
      case _                                 => false
    }
    writeOk && headOk && path.tail.forall(withinRow)
  }

  /** `patch $ {t[*]…: …}` whose every path fans over the SAME table's
    * rows first: the batch applies per row independently (PatchEval
    * folds fields left with `@` bound to the pre-batch leaf), so when
    * the leaf expressions don't lower relationally the patch can still
    * run distributed on the rowwise rung. */
  private def rowwisePatchTable(
      fields: Vector[Expr.PatchField]): Option[String] = {
    import Expr._
    def fieldTable(f: PatchField): Option[String] = f.path.toList match {
      case PatchStep.Field(t) :: second :: rest =>
        val fanOk = second match {
          case PatchStep.Wild      => true
          case PatchStep.WildIf(p) => !containsRoot(p)
          case _                   => false
        }
        val restOk = rest.forall {
          case PatchStep.WildIf(p) => !containsRoot(p)
          case _                   => true
        }
        val leafOk =
          !f.value.exists(containsRoot) && !f.when.exists(containsRoot)
        if (fanOk && restOk && leafOk) Some(t) else None
      case _ => None
    }
    val tables = fields.map(fieldTable)
    if (fields.nonEmpty && tables.forall(_.isDefined) &&
        tables.flatten.distinct.size == 1) tables.head
    else None
  }

  /** Per-query observability counters for the per-row rungs: `evaluated`
    * counts interpreter invocations (rows fed to the per-row UDF),
    * `errored` counts rows silently DROPPED by the per-row error tier
    * (SCALE.md: an EvalException nulls the row and the explode drops
    * it — a malformed row must not kill a 100 TB job, but the dropped
    * mass must be observable). One pair per session, registered as
    * named Spark accumulators (visible in the UI) and logged at query
    * end whenever the dropped count grew. */
  final class RowwiseCounters private[Graft] (
      val evaluated: org.apache.spark.util.LongAccumulator,
      val errored: org.apache.spark.util.LongAccumulator)

  private val countersBySession =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, RowwiseCounters]

  /** The session's rowwise counters (created on first use). `errored`
    * staying 0 is the healthy steady state; any growth is logged after
    * the query that caused it. */
  def rowwiseCounters(spark: SparkSession): RowwiseCounters =
    countersBySession.computeIfAbsent(spark, { s =>
      val ev = s.sparkContext.longAccumulator("graft.rowwise.evaluatedRows")
      val er = s.sparkContext.longAccumulator("graft.rowwise.erroredRows")
      val lastLogged = new java.util.concurrent.atomic.AtomicLong(0L)
      s.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        private def report(): Unit = {
          val v = er.value
          val prev = lastLogged.getAndSet(v)
          if (v > prev)
            org.slf4j.LoggerFactory.getLogger("graft.Graft").warn(
              s"rowwise rung dropped ${v - prev} malformed row(s) " +
                s"(total $v) — see graft.rowwise.erroredRows")
        }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = report()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = report()
      })
      new RowwiseCounters(ev, er)
    })

  /** Per-row interpreter projection: each row evaluated against its own
    * singleton `{table: [row]}` document on the executors, per-row
    * contributions flattened with `explode`, results as JSON strings.
    * Stateless and shuffle-free, so it runs identically on a bounded
    * frame or a streaming micro-batch. Interpreter invocations and
    * error-dropped rows tick the session's [[rowwiseCounters]]. */
  private[graft] def rowwiseJson(
      df: DataFrame, table: String, expr: String): org.apache.spark.sql.Dataset[String] = {
    import org.apache.spark.sql.functions.{array, col, explode, struct}
    import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
    // {table: [row]} — same shape docFallback builds, one row deep,
    // fed to the interpreter as a STRUCT through RowBridge (no per-row
    // to_json + JSON parse on the input side)
    val docType = StructType(Seq(
      StructField(table, ArrayType(df.schema), nullable = false)))
    val doc = struct(
      array(struct(df.columns.map(col).toIndexedSeq: _*)).as(table))
    val counters = rowwiseCounters(df.sparkSession)
    df.select(
      explode(Jetro.jetroEvalElemsStruct(expr, doc, docType,
        Some(counters.evaluated), Some(counters.errored))).as("__j"))
      .select(col("__j"))
      .as(org.apache.spark.sql.Encoders.STRING)
  }

  // Rowwise string-cache generations: rowwiseCompile persists the
  // interpreter output so schema inference (when needed — see the
  // static-schema shortcut below) and the parse pass both read the SAME
  // materialised strings instead of re-running the interpreter. A small
  // LRU keyed by (session, sfDir, table, expr) — rather than the single
  // latest-generation slot rounds 7-9 kept — lets two interleaved
  // rowwise queries coexist without evicting each other (each eviction
  // costs one extra interpreter pass on the next materialization).
  // Eviction is always safe because the parse carries an EXPLICIT
  // schema — a recompute is ONE interpreter pass, never inference+parse.
  private final case class RowwiseKey(
      session: SparkSession, sfDir: String, table: String, expr: String)
  private final case class RowwiseGen(
      ds: org.apache.spark.sql.Dataset[String],
      schema: org.apache.spark.sql.types.StructType,
      static: Boolean)

  private val rowwiseCacheCap = 4
  private val rowwiseCache =
    new java.util.LinkedHashMap[RowwiseKey, RowwiseGen](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[RowwiseKey, RowwiseGen]): Boolean = {
        val evict = size() > rowwiseCacheCap
        if (evict) safeUnpersist(e.getValue.ds)
        evict
      }
    }

  private def safeUnpersist(ds: org.apache.spark.sql.Dataset[String]): Unit =
    // a stale generation may belong to a SparkSession that has since
    // stopped (its blocks died with the context) — eviction is
    // best-effort bookkeeping, never worth failing the new query over
    try {
      if (!ds.sparkSession.sparkContext.isStopped)
        ds.unpersist(blocking = false)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Drop every retained rowwise string cache generation (e.g. between
    * benchmark sweeps). Queries already compiled stay correct — they
    * reparse with their explicit schema in one interpreter pass. */
  def clearRowwiseCache(): Unit = rowwiseCache.synchronized {
    rowwiseCache.values().forEach(g => safeUnpersist(g.ds))
    rowwiseCache.clear()
  }

  private[graft] def rowwiseCompile(
      spark: SparkSession, sfDir: String, expr: String): Option[DataFrame] =
    rowwisePlan(expr).filter(p => Tables.names.contains(p._1)).map {
      case (table, evalExpr) =>
        val key = RowwiseKey(spark, sfDir, table, evalExpr)
        val hit = rowwiseCache.synchronized {
          Option(rowwiseCache.get(key)) match {
            case Some(g) if g.ds.sparkSession.sparkContext.isStopped =>
              // purge on access: a stopped session's blocks are gone,
              // but the entry would otherwise hold the dead session
              // until capacity eviction
              rowwiseCache.remove(key); None
            case other => other
          }
        }
        val gen = hit.getOrElse {
          // ONE distributed interpreter pass, not two: schema inference
          // over spark.read.json is a full scan of the UDF output, and
          // the parse is a second — so persist the string dataset
          // (MEMORY_AND_DISK: at scale the spill is the price of not
          // re-running the interpreter) and parse the CACHE with an
          // EXPLICIT schema. When the static walker proves the
          // pipeline's output shape (Lower.rowwiseStaticSchema), the
          // inference full-scan is skipped entirely; otherwise
          // inference runs once and materialises the cache as before.
          // PERMISSIVE (default) mode keeps scalar-stream behavior
          // byte-identical to the inference path (bare scalars land in
          // _corrupt_record, exactly as docFallback's read.json does) —
          // the static path only ever proves object streams, where no
          // corrupt-record line can occur.
          // per-row interpreter work dwarfs one narrow-row shuffle, so
          // spread an under-parallelised scan first (rowwise chains are
          // per-row independent — input order never matters here)
          val src = Tables.spreadCompute(Tables(spark, sfDir, table))
          val ds = rowwiseJson(src, table, evalExpr)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val staticSchema = Lower.rowwiseStaticSchema(src.schema, evalExpr)
          val schema = staticSchema.getOrElse(spark.read.json(ds).schema)
          val g = RowwiseGen(ds, schema, staticSchema.isDefined)
          // two concurrent misses on the same key can both reach here;
          // re-check under the lock so exactly one generation survives
          // and the loser's persisted blocks are released (a bare
          // put-over-existing would strand the overwritten generation —
          // removeEldestEntry never sees it)
          rowwiseCache.synchronized {
            Option(rowwiseCache.get(key))
              .filter(w => !w.ds.sparkSession.sparkContext.isStopped) match {
              case Some(winner) =>
                safeUnpersist(g.ds)
                winner
              case None =>
                val prev = rowwiseCache.put(key, g)
                if (prev != null) safeUnpersist(prev.ds)
                g
            }
          }
        }
        // STATIC path: parse with the from_json EXPRESSION, not
        // DataFrameReader.json — the reader form calls `.rdd` on the
        // string dataset, and under AQE a plan carrying an exchange
        // (the compute-spread) then materialises its query stages AT
        // COMPILE TIME, running the interpreter pass eagerly. from_json
        // keeps the whole pipeline lazy. Semantically identical here:
        // the static walker only ever proves OBJECT streams, where no
        // corrupt-record line can occur, and both forms drive the same
        // JacksonParser in PERMISSIVE mode. The inference path keeps
        // the reader form — its schema may carry _corrupt_record
        // semantics from bare-scalar streams.
        if (gen.static) {
          import org.apache.spark.sql.functions.{col, from_json}
          gen.ds.select(
            from_json(col(gen.ds.columns.head), gen.schema).as("__r"))
            .select(col("__r.*"))
        } else spark.read.schema(gen.schema).json(gen.ds)
    }

  /** Document-mode fallback: build `{table: [rows…]}` for every table
    * the expression references, evaluate with the interpreter, and read
    * the result back as a DataFrame (JSON-inferred schema).
    *
    * This path materialises every referenced table ON THE DRIVER — it is
    * the small/interactive contract (the analogue of the reference's
    * single-node VM), and `spark.graft.docFallback.maxRows` (default
    * 1,000,000) makes that boundary real: past the cap the query fails
    * with an explanatory error instead of an opaque driver OOM. */
  private[graft] def docFallback(spark: SparkSession, sfDir: String, expr: String): DataFrame = {
    val ast = jexpr.Parser.parse(expr)
    val tables = referencedTables(ast)
    require(tables.nonEmpty, s"no table reference in: $expr")
    val maxRows = spark.conf
      .get("spark.graft.docFallback.maxRows", "1000000").toLong
    val docFields = tables.toVector.sorted.map { t =>
      // stored-order access: the document array's element order IS the
      // table's stored row order (first/nth/enumerate semantics), so
      // the collector must bypass the scan-spread repartition
      val tdf = Tables.stored(spark, sfDir, t)
      val n = tdf.count()
      if (n > maxRows) throw new IllegalStateException(
        s"expression does not lower relationally and the document " +
        s"fallback is capped: table `$t` has $n rows > " +
        s"spark.graft.docFallback.maxRows=$maxRows. Rewrite the query " +
        s"with lowerable stages, or raise the cap for interactive use.")
      val rows = tdf.toJSON.collect()
      s""""$t": [${rows.mkString(",")}]"""
    }
    val doc = docFields.mkString("{", ",", "}")
    val out = Jetro.compile(expr).evalValue(JValue.parse(doc))
    val rows = out match {
      case jexpr.JArr(xs) => xs.map(_.render)
      case scalar         => Vector(s"""{"value": ${scalar.render}}""")
    }
    import scala.jdk.CollectionConverters._
    spark.read.json(spark.createDataset(rows.asJava.asScala.toSeq)(
      org.apache.spark.sql.Encoders.STRING))
  }

  /** Tables named as `$.<name>` anywhere in the expression. */
  private def referencedTables(e: Expr): Set[String] = {
    import Expr._
    def walk(x: Expr): Set[String] = x match {
      case Chain(Root, steps) =>
        val head = steps.headOption.collect { case Step.Field(t) => t }.toSet
        head ++ steps.flatMap(walkStep)
      case Chain(b, steps)  => walk(b) ++ steps.flatMap(walkStep)
      case Pipe(b, steps)   => walk(b) ++ steps.flatMap {
        case PipeStep.Forward(f) => walk(f); case _ => Set.empty[String] }
      case Binary(_, l, r)  => walk(l) ++ walk(r)
      case Unary(_, i)      => walk(i)
      case IfElse(c, t, f)  => walk(c) ++ walk(t) ++ walk(f)
      case TryElse(b, d)    => walk(b) ++ walk(d)
      case Let(bs, body)    => bs.flatMap(b => walk(b._2)).toSet ++ walk(body)
      case Comp(_, k, v, cls, cond) =>
        walk(k) ++ v.toSeq.flatMap(walk) ++ cls.flatMap(c => walk(c._2)) ++
          cond.toSeq.flatMap(walk)
      case ObjLit(fs)  => fs.flatMap {
        case ObjField.KV(k, v, w) => walk(k) ++ walk(v) ++ w.toSeq.flatMap(walk)
        case ObjField.OptKV(k, v) => walk(k) ++ walk(v)
        case ObjField.Dyn(k, v)   => walk(k) ++ walk(v)
        case ObjField.Spread(s)   => walk(s)
        case ObjField.SpreadDeep(s) => walk(s)
        case _ => Set.empty[String]
      }.toSet
      case ArrLit(es) => es.flatMap {
        case ArrElem.One(a) => walk(a); case ArrElem.Spread(a) => walk(a) }.toSet
      case GlobalCall(_, args) => args.flatMap(a => walk(a.e)).toSet
      case Patch(t, fs) =>
        // `patch $ {t[*]…}` names its table in the patch PATH — collect
        // path-head fields that are actual tables (plus any `$.x` in
        // WildIf guards) so the document fallback materialises them
        val pathTables = t match {
          case Root => fs.flatMap(_.path.headOption.collect {
            case PatchStep.Field(n) if Tables.names.contains(n) => n })
          case _ => Vector.empty
        }
        walk(t) ++ pathTables ++ fs.flatMap(f =>
          f.value.toSeq.flatMap(walk) ++ f.when.toSeq.flatMap(walk) ++
          f.path.flatMap {
            case PatchStep.WildIf(p) => walk(p)
            case _                   => Set.empty[String] })
      case Cast(i, _)   => walk(i)
      case KindIs(i, _, _) => walk(i)
      case FString(ps)  => ps.flatMap {
        case FPart.Interp(i, _) => walk(i); case _ => Set.empty[String] }.toSet
      case _ => Set.empty
    }
    def walkStep(s: Expr.Step): Set[String] = s match {
      case Step.Method(_, args)     => args.flatMap(a => walk(a.e)).toSet
      case Step.DeepMethod(_, args) => args.flatMap(a => walk(a.e)).toSet
      case Step.Index(i)            => walk(i)
      case Step.DynField(i)         => walk(i)
      case Step.InlineFilter(p)     => walk(p)
      case Step.MapShape(p, sh)     => p.toSeq.flatMap(walk).toSet ++ walk(sh)
      case _                        => Set.empty
    }
    walk(e)
  }

  /** True when a walk/walk_pre/rec transform argument provably maps
    * ARRAY nodes to themselves: a one-param lambda (or `@`-form body)
    * shaped `T if <param> is <kind≠array> [and …] else <param>`. The
    * kind guard must be the FIRST conjunct (so an array short-circuits
    * to the else branch before any further test), the else branch must
    * be the bare parameter, and nothing may read `$` (cross-row). */
  private def arrayIdentityGuarded(e: Expr): Boolean = {
    import Expr._
    def paramRef(x: Expr, p: Option[String]): Boolean = (x, p) match {
      case (Current, None)        => true
      case (Ident(n), Some(q))    => n == q
      case _                      => false
    }
    def nonArrayGuard(cond: Expr, p: Option[String]): Boolean = cond match {
      case KindIs(x, k, false) if k != "array" && k != "lambda" =>
        paramRef(x, p)
      case Binary("and", l, r) => nonArrayGuard(l, p) && !containsRoot(r)
      case _ => false
    }
    e match {
      case Lambda(Vector(p), IfElse(c, t, Ident(p2))) if p2 == p =>
        nonArrayGuard(c, Some(p)) && !containsRoot(t) && !containsRoot(c)
      case IfElse(c, t, Current) =>
        nonArrayGuard(c, None) && !containsRoot(t) && !containsRoot(c)
      case _ => false
    }
  }

  /** Any `$` (Root) reference anywhere in the expression tree. */
  private def containsRoot(e: Expr): Boolean = {
    import Expr._
    def any(x: Expr): Boolean = x match {
      case Root             => true
      case Chain(b, steps)  => any(b) || steps.exists(stepAny)
      case Pipe(b, steps)   => any(b) || steps.exists {
        case PipeStep.Forward(f) => any(f); case _ => false }
      case Binary(_, l, r)  => any(l) || any(r)
      case Unary(_, i)      => any(i)
      case IfElse(c, t, f)  => any(c) || any(t) || any(f)
      case TryElse(b, d)    => any(b) || any(d)
      case Let(bs, body)    => bs.exists(b => any(b._2)) || any(body)
      case Lambda(_, b)     => any(b)
      case Comp(_, k, v, cls, cond) =>
        any(k) || v.exists(any) || cls.exists(c => any(c._2)) || cond.exists(any)
      case ObjLit(fs) => fs.exists {
        case ObjField.KV(k, v, w)   => any(k) || any(v) || w.exists(any)
        case ObjField.OptKV(k, v)   => any(k) || any(v)
        case ObjField.Dyn(k, v)     => any(k) || any(v)
        case ObjField.Spread(s)     => any(s)
        case ObjField.SpreadDeep(s) => any(s)
        case _                      => false
      }
      case ArrLit(es) => es.exists {
        case ArrElem.One(a) => any(a); case ArrElem.Spread(a) => any(a) }
      case GlobalCall(_, args) => args.exists(a => any(a.e))
      case Patch(t, fs) => any(t) || fs.exists(f =>
        f.value.exists(any) || f.when.exists(any))
      case Cast(i, _)      => any(i)
      case KindIs(i, _, _) => any(i)
      case FString(ps) => ps.exists {
        case FPart.Interp(i, _) => any(i); case _ => false }
      case _ => false
    }
    def stepAny(s: Expr.Step): Boolean = s match {
      case Step.Method(_, args)     => args.exists(a => any(a.e))
      case Step.DeepMethod(_, args) => args.exists(a => any(a.e))
      case Step.Index(i)            => any(i)
      case Step.DynField(i)         => any(i)
      case Step.InlineFilter(p)     => any(p)
      case Step.MapShape(p, sh)     => p.exists(any) || any(sh)
      case _                        => false
    }
    any(e)
  }

}
