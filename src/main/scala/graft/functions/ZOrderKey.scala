package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression computing a two-dimensional Z-order
  * (Morton) key: the low 16 bits of each input interleaved, left-first.
  * This is the locality primitive behind the reference's
  * `OPTIMIZE … ZORDER BY (a, b)` (/root/reference/utils/optimize_tables.py:24-32):
  * sorting by the interleaved key places rows close in BOTH dimensions
  * into the same parquet files, so min/max data skipping works for
  * predicates on either column — a plain range-cluster only skips on the
  * leading one.
  *
  * Inputs are grid cells in [0, 65535] (see
  * [[graft.maintenance.Maintenance.clusterZ]] for the min/max
  * normalization that produces them); a 65k × 65k grid is far finer than
  * file granularity at any realistic file count, so the quantization
  * never limits skipping. Implemented with `doGenCode` so the key
  * computation stays inside whole-stage codegen during the rewrite scan.
  */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got ${children.map(_.dataType).mkString(", ")}")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderKey.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Interleave the low 16 bits: bit i of `a` lands at 2i+1, bit i of `b`
    * at 2i — so `a` is the higher-order dimension on ties. Static and
    * branch-free for the generated code.
    *
    * Inputs OUTSIDE [0, 65535] are rejected: a raw column value passed in
    * place of a pre-normalized grid cell would otherwise alias (key = low
    * 16 bits only) and silently destroy locality. The guard costs one
    * branch; normalization lives in `Maintenance.clusterZ`. */
  def interleave(a: Long, b: Long): Long = {
    if ((a | b) >>> 16 != 0L || a < 0L || b < 0L)
      throw new IllegalArgumentException(
        s"zorder_key: inputs must be grid cells in [0, 65535], got ($a, $b); " +
          "normalize raw column values first (see Maintenance.clusterZ)")
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i + 1) | ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  val functionName = "zorder_key"

  private val usage = "zorder_key(a, b) - Interleaves the bits of two grid " +
    "cells a, b, each REQUIRED to be in [0, 65535] (pre-normalize raw values " +
    "onto the 65k grid first); raises on out-of-range input."

  private def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2, s"$functionName expects (a, b)")
    ZOrderKey(Cast(children(0), LongType), Cast(children(1), LongType))
  }

  private def info = new ExpressionInfo(
    classOf[ZOrderKey].getName, null, functionName, usage, "")

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(functionName), info, builder(_))

  /** For `spark.sql.extensions`-based deployment. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(functionName), info, builder))
}
