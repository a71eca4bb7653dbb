package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native left-fold dot product of two numeric-array columns in double —
  * bit-identical to the composed form
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, (acc, v) => acc + v)` (asserted in PortableSpec), which is also
  * exactly what the DuckDB oracle's `list_reduce(list_prepend(0.0, ...))`
  * computes: products and sums run strictly in index order, so the IEEE
  * result is the same double on both engines.
  *
  * The composed plan is TWO interpreted higher-order functions
  * (`ZipWith` materializes a product array, `ArrayAggregate` folds it,
  * both CodegenFallback with a lambda-variable binding per element) —
  * that is the innermost loop of every similarity operator (brute-force
  * cosine, IVF assignment |vectors|x|centroids|, PQ codebooks, hybrid
  * retrieval). This expression is one fused multiply-add loop per row
  * and stays inside whole-stage codegen.
  *
  * Null semantics match the composed form: null array -> null; length
  * mismatch -> null (zip_with pads with null, the null product poisons
  * the fold); any null element -> null; two empty arrays -> 0.0.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  // element-kind codes for compute(): the per-element conversion is the
  // same widening Cast-to-double the composed form applied
  private def kindOf(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (kindOf(left.dataType) >= 0 && kindOf(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE|INT|BIGINT> on both sides, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      kindOf(left.dataType), kindOf(right.dataType))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotRes")
      s"""
         |java.lang.Double $r = graft.functions.VecDot.compute(
         |  $a, $b, ${kindOf(left.dataType)}, ${kindOf(right.dataType)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Index-order fold of sum(a[i]*b[i]) in double; null on length
    * mismatch or any null element (the composed form's semantics).
    * Kind: 0=float, 1=double, 2=int, 3=long — each converted to double
    * exactly as Cast does. */
  def compute(a: ArrayData, b: ArrayData,
      aKind: Int, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aKind)
      val y = elem(b, i, bKind)
      acc += x * y
      i += 1
    }
    acc
  }

  private def elem(arr: ArrayData, i: Int, kind: Int): Double = kind match {
    case 0 => arr.getFloat(i).toDouble
    case 1 => arr.getDouble(i)
    case 2 => arr.getInt(i).toDouble
    case _ => arr.getLong(i).toDouble
  }
}
