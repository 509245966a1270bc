package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native one-pass MinHash signature over a hashed-shingle column.
  *
  * Semantics are EXACTLY `array(lane_0 … lane_{k-1})` where
  * `lane_i = coalesce(array_min(transform(sh, s -> xxhash64(s, i))), Long.MaxValue)`
  * — the HOF formulation in `graft.functions.Text.minhashSignature` —
  * because each salted hash is the same two-step xxhash64 chain
  * (seed 42 → hashLong(elem) → hashInt(lane)) Spark's XxHash64
  * expression computes. The native form hashes each element ONCE and
  * updates all k lane minima in a single pass, instead of k interpreted
  * `transform` passes each allocating an intermediate array.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "minhash_sig expects (array<bigint>, int literal k)")
  }

  private lazy val k: Int = right.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullable: Boolean = left.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) return null
    val xs = arr.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      // null element: XxHash64 leaves the running hash at the seed
      val h1 =
        if (xs.isNullAt(i)) 42L
        else org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(xs.getLong(i), 42L)
      var lane = 0
      while (lane < k) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(lane, h1)
        if (h < mins(lane)) mins(lane) = h
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val lane = ctx.freshName("lane")
    val h1 = ctx.freshName("h1")
    val h = ctx.freshName("h")
    val n = ctx.freshName("n")
    val code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = ${leftGen.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  long[] $mins = new long[$k];
        |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |  int $n = ${leftGen.value}.numElements();
        |  for (int $i = 0; $i < $n; $i++) {
        |    long $h1 = ${leftGen.value}.isNullAt($i)
        |      ? 42L
        |      : $xxh.hashLong(${leftGen.value}.getLong($i), 42L);
        |    for (int $lane = 0; $lane < $k; $lane++) {
        |      long $h = $xxh.hashInt($lane, $h1);
        |      if ($h < $mins[$lane]) $mins[$lane] = $h;
        |    }
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

object TextFunctions {
  /** Register `minhash_sig(shingleHashes, k)` (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val name = org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig")
    registry.registerFunction(
      name,
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0), exprs(1)))
  }
}
