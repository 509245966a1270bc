package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram builder: one fused pass producing the
  * space-joined n-grams of a token array — the exact semantics of the
  * HOF formulation (`transform(sequence(1, m-n+1), i ->
  * concat_ws(" ", slice(toks, i, n)))`, kept as `Text.wordNgramsHof`
  * for differential tests), which evaluates three interpreted lambdas
  * plus an array copy PER GRAM and dominated gram-heavy pipelines
  * (duplicate-span dedup spent more time building grams than joining
  * them). Null elements are skipped by the join exactly like
  * `concat_ws`; arrays shorter than `n` give an empty result; a null
  * array gives null.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val m = xs.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = if (xs.isNullAt(i + j)) null else xs.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $m = $x.numElements();
         |Object[] $out = new Object[$m < $n ? 0 : $m - $n + 1];
         |for (int $i = 0; $i <= $m - $n; $i++) {
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $x.isNullAt($i + $j) ? null : $x.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $utf8.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def column(toks: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(toks), n))
}
