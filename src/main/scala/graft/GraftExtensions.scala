package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashSignature, RegexCapturesAll, RegexCapturesFirst, RegexFirst, RegexReplaceFirst, SimHash64, TryOrNull, WordNgrams}

/** Spark session extension: makes the engine's native expressions
  * available to every session created with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — the deployment-grade alternative to the per-session
  * `VectorFunctions.register`/`TextFunctions.register` calls (which the
  * library still performs lazily so programmatic use needs no config).
  * Injected functions resolve in SQL text, views, and thriftserver
  * sessions alike.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("try_or_null"),
      new ExpressionInfo(classOf[TryOrNull].getName, "try_or_null"),
      (exprs: Seq[Expression]) => TryOrNull(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => WordNgrams(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"word_ngrams: n must be an integer literal, got $other")
      })))
    // Regex first-match family (see graft.functions.RegexFirst):
    // patterns and replacements are plan-time string literals — the
    // Pattern compiles once at resolution, matching the lowered lane.
    def strLit(e: Expression, what: String): String = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
        if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    ext.injectFunction((
      FunctionIdentifier("re_captures"),
      new ExpressionInfo(classOf[RegexCapturesFirst].getName, "re_captures"),
      (exprs: Seq[Expression]) => RegexCapturesFirst(
        exprs(0), strLit(exprs(1), "re_captures pattern"))))
    ext.injectFunction((
      FunctionIdentifier("re_captures_all"),
      new ExpressionInfo(classOf[RegexCapturesAll].getName, "re_captures_all"),
      (exprs: Seq[Expression]) => RegexCapturesAll(
        exprs(0), strLit(exprs(1), "re_captures_all pattern"))))
    ext.injectFunction((
      FunctionIdentifier("re_replace_first"),
      new ExpressionInfo(classOf[RegexReplaceFirst].getName, "re_replace_first"),
      (exprs: Seq[Expression]) => {
        val p = strLit(exprs(1), "re_replace_first pattern")
        val r = strLit(exprs(2), "re_replace_first replacement")
        if (!RegexFirst.replacementOk(
            r, java.util.regex.Pattern.compile(p).matcher("").groupCount()))
          throw new IllegalArgumentException(
            s"re_replace_first: replacement '$r' references groups the " +
              s"pattern '$p' does not define")
        RegexReplaceFirst(exprs(0), p, r)
      }))
    // Planner-level banded range join (see graft.plans.BandedRangeJoin):
    // off until spark.graft.rangeJoin.bandWidth is set, so injection is
    // free for sessions that never use it.
    ext.injectOptimizerRule(graft.plans.BandedRangeJoin)
  }
}
