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

/** Random-hyperplane sign buckets for multi-table LSH, EXACTLY
  * reproducible by an external SQL engine: the vector is quantized to
  * integers with an unambiguous tie rule, q_i = ⌊1000·v_i + 0.5⌋ —
  * float32 × 1000 CAN land on an exact .5 (any odd multiple of 1/16,
  * e.g. -0.0625f → -62.5), and half-up (Java Math.round) vs
  * half-away-from-zero (SQL ROUND) then disagree on negatives, so both
  * engines spell the same floor(x + 0.5) — and the hyperplanes are
  * small-integer lattice vectors from a fixed formula
  * h(t,j,i) = ((7j + 13i + 29t) mod 17) − 8, so every sign decision is
  * exact integer arithmetic — no float dot whose near-zero sign could
  * differ between engines. Evaluates to array<int> of length `tables`;
  * bucket_t = Σ_j [⟨q, h(t,j,·)⟩ > 0] · 2^j.
  *
  * A lattice of (2·8+1)^d directions is plenty for sign-LSH: what
  * matters is that the family is fixed, diverse across (t, j), and
  * independent of the data — the classic seeded-gaussian family is kept
  * in Similarity.randomHyperplanes for recall experiments; this one
  * trades a bit of isotropy for cross-engine exactness. */
case class RpBuckets(child: Expression, tables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(tables > 0 && bits > 0 && bits < 31, "bad RpBuckets geometry")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("rp_buckets expects an array<float> input")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = Math.floor(v.getFloat(i) * 1000.0 + 0.5).toLong; i += 1
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        var dot = 0L
        var k = 0
        while (k < n) {
          dot += q(k) * (((7 * j + 13 * k + 29 * t) % 17) - 8)
          k += 1
        }
        if (dot > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(x => x: Any))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val q = ctx.freshName("q")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
        int $n = $v.numElements();
        long[] $q = new long[$n];
        for (int $i = 0; $i < $n; $i++) {
          $q[$i] = (long) java.lang.Math.floor(
            ((double) $v.getFloat($i)) * 1000.0 + 0.5);
        }
        int[] $out = new int[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          int $bucket = 0;
          for (int $j = 0; $j < $bits; $j++) {
            long $dot = 0L;
            for (int $k = 0; $k < $n; $k++) {
              $dot += $q[$k] * (long) (((7 * $j + 13 * $k + 29 * $t) % 17) - 8);
            }
            if ($dot > 0) $bucket |= (1 << $j);
          }
          $out[$t] = $bucket;
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RpBuckets = copy(child = newChild)
}

object VectorExprs {
  /** dot(a, b) over array<float> columns, double accumulation. */
  def fdot(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))

  /** |a| — L2 norm. */
  def fnorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(fdot(a, a))

  /** Multi-table sign-LSH bucket ids (array<int>, one per table). */
  def rpBuckets(a: Column, tables: Int, bits: Int): Column =
    Bridge.column(RpBuckets(Bridge.expression(a), tables, bits))
}
