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
      .getOrElse(docFallback(spark, sfDir, expr))

  /** True when the expression fully lowers to a Catalyst plan. */
  def lowers(spark: SparkSession, sfDir: String, expr: String): Boolean =
    Lower.tryCompile(expr, t => Tables(spark, sfDir, t)).isDefined

  /** Document-mode fallback: build `{table: [rows…]}` for every table
    * the expression references, evaluate with the interpreter, and read
    * the result back as a DataFrame (JSON-inferred schema). */
  private[graft] def docFallback(spark: SparkSession, sfDir: String, expr: String): DataFrame = {
    val ast = jexpr.Parser.parse(expr)
    val tables = referencedTables(ast)
    require(tables.nonEmpty, s"no table reference in: $expr")
    val docFields = tables.toVector.sorted.map { t =>
      val rows = Tables(spark, sfDir, t).toJSON.collect()
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
      case Patch(t, fs) => walk(t) ++ fs.flatMap(f =>
        f.value.toSeq.flatMap(walk) ++ f.when.toSeq.flatMap(walk))
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
}
