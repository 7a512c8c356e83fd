package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.Bridge

/** Custom Catalyst expressions for the embedding-similarity hot path.
  *
  * The built-in spelling `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * correct but runs as interpreted higher-order lambdas — per-pair tree
  * walks over 64 elements. This expression is a tight codegen'd loop
  * (whole-stage-codegen friendly), accumulating float products in double
  * with left-to-right order, so results are bit-identical to the HOF
  * spelling and the DuckDB oracle's per-element CAST(… AS DOUBLE) sum.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("FloatDot expects two array<float> inputs")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double ${ev.value}Acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${ev.value}Acc +=
            ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = ${ev.value}Acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatDot = copy(newLeft, newRight)
}

object VectorExprs {
  /** dot(a, b) over array<float> columns, double accumulation. */
  def fdot(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))

  /** |a| — L2 norm. */
  def fnorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(fdot(a, a))
}
