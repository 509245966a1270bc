package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane LSH signature: one pass over the embedding
  * computes all `bits` signed projections and packs the sign bits into
  * one long.
  *
  * Fold order per plane is ascending-index — the same sequential sum the
  * `aggregate(zip_with(...))` HOF in `Similarity.lshSignature` performs —
  * so the resulting signature is bit-identical while touching each
  * vector element once instead of `bits` interpreted passes.
  *
  * Constructed programmatically with the plane matrix baked in
  * (deterministic seed), so it has no SQL registration: use
  * [[HyperplaneSignature.column]].
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_sig"

  @transient private lazy val flat: Array[Double] = planes.flatten
  @transient private lazy val bits: Int = planes.length
  @transient private lazy val dim: Int = if (planes.isEmpty) 0 else planes(0).length

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), dim)
    var sig = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      val off = b * dim
      while (i < n) { dot += xs.getFloat(i).toDouble * flat(off + i); i += 1 }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val flatRef = ctx.addReferenceObj("planes", flat, "double[]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $dim);
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  double $dot = 0.0;
         |  int $off = $b * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $x.getFloat($i) * $flatRef[$off + $i];
         |  }
         |  if ($dot >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  def column(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(
      HyperplaneSignature(ColumnBridge.expression(vec), planes))
}
