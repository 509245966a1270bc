package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native first-match regex family (reference builtins/string.rs
  * capture/replace-first surface). Spark's built-in regex functions
  * cannot express these exactly: `regexp_replace` replaces ALL
  * occurrences, and `regexp_extract` collapses an UNMATCHED optional
  * group and an empty match to the same `""`, where the interpreter
  * (Strings.scala:245-256) keeps the distinction (null vs ""). Each
  * expression here runs the identical `java.util.regex` calls the
  * interpreter makes, with the Pattern compiled once at plan time and
  * shared via a codegen reference object — so compiled and interpreted
  * backends agree byte-for-byte, including inline flags and Java
  * replacement escapes.
  *
  * The pattern (and replacement) are plan-time literals by
  * construction: `Lower` bails to the per-row rungs for dynamic
  * patterns, matching the loud-error behavior there.
  */
private[graft] object RegexFirst {
  /** Group values of one match: group 0..n, unmatched groups null. */
  def groups(m: java.util.regex.Matcher): GenericArrayData = {
    val n = m.groupCount() + 1
    val out = new Array[Any](n)
    var g = 0
    while (g < n) {
      val s = m.group(g)
      out(g) = if (s == null) null else UTF8String.fromString(s)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Would `Matcher.appendReplacement` accept this replacement for a
    * pattern with `groups` capture groups? Java throws on a trailing
    * lone `\` or `$`, a `$` not followed by a digit, and a first group
    * digit beyond the group count; `${name}` references we don't
    * analyze — callers bail to the interpreter for those.
    */
  def replacementOk(repl: String, groups: Int): Boolean = {
    var i = 0
    while (i < repl.length) {
      repl.charAt(i) match {
        case '\\' =>
          if (i + 1 >= repl.length) return false
          i += 2
        case '$' =>
          if (i + 1 >= repl.length) return false
          val c = repl.charAt(i + 1)
          if (!c.isDigit || (c - '0') > groups) return false
          i += 2
          // Java consumes further digits greedily but never throws on
          // them — they become part of the group number or literals
          while (i < repl.length && repl.charAt(i).isDigit) i += 1
        case _ => i += 1
      }
    }
    true
  }
}

private[graft] abstract class RegexFirstBase extends UnaryExpression {
  def pattern: String
  @transient protected lazy val compiled: Pattern = Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  protected def patternRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
}

/** `re_captures(p)`: groups of the FIRST match as `array<string>`
  * (group 0 = whole match, unmatched groups null); null when the
  * pattern does not match (Strings.scala:245-248).
  */
case class RegexCapturesFirst(child: Expression, pattern: String)
    extends RegexFirstBase {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "re_captures_first"

  override def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.toString)
    if (m.find()) RegexFirst.groups(m) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pat = patternRef(ctx)
      val m = ctx.freshName("m")
      s"""
         |java.util.regex.Matcher $m = $pat.matcher($x.toString());
         |if ($m.find()) {
         |  ${ev.value} = graft.functions.RegexFirst.groups($m);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RegexCapturesFirst =
    copy(child = newChild)
}

/** `re_captures_all(p)`: one group-array per match, in match order;
  * `[]` when nothing matches (Strings.scala:249-254).
  */
case class RegexCapturesAll(child: Expression, pattern: String)
    extends RegexFirstBase {

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = true), containsNull = false)
  override def prettyName: String = "re_captures_all"

  override def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.toString)
    val out = new java.util.ArrayList[Any]()
    while (m.find()) out.add(RegexFirst.groups(m))
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pat = patternRef(ctx)
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |java.util.regex.Matcher $m = $pat.matcher($x.toString());
         |java.util.ArrayList<Object> $acc = new java.util.ArrayList<Object>();
         |while ($m.find()) {
         |  $acc.add(graft.functions.RegexFirst.groups($m));
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($acc.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RegexCapturesAll =
    copy(child = newChild)
}

/** `re_replace(p, r)`: `Matcher.replaceFirst` with Java replacement
  * semantics (`$1` group refs, backslash escapes) — replace-FIRST,
  * which `regexp_replace` (replace-all) cannot express
  * (Strings.scala:256). The replacement is validated against the
  * pattern's group count at lowering time, so the per-row call cannot
  * throw.
  */
case class RegexReplaceFirst(child: Expression, pattern: String, replacement: String)
    extends RegexFirstBase {

  override def dataType: DataType = StringType
  override def prettyName: String = "re_replace_first"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(compiled.matcher(input.toString).replaceFirst(replacement))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pat = patternRef(ctx)
      val repl = ctx.addReferenceObj("replacement", replacement, "java.lang.String")
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $pat.matcher($x.toString()).replaceFirst($repl));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RegexReplaceFirst =
    copy(child = newChild)
}

object RegexCapturesFirst {
  def column(c: Column, pattern: String): Column =
    ColumnBridge.column(RegexCapturesFirst(ColumnBridge.expression(c), pattern))
}
object RegexCapturesAll {
  def column(c: Column, pattern: String): Column =
    ColumnBridge.column(RegexCapturesAll(ColumnBridge.expression(c), pattern))
}
object RegexReplaceFirst {
  def column(c: Column, pattern: String, replacement: String): Column =
    ColumnBridge.column(RegexReplaceFirst(ColumnBridge.expression(c), pattern, replacement))
}
