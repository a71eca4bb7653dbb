package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for geohash encoding — the "custom
  * Expression with doGenCode" tier of SURVEY §4: unlike a Scala UDF it
  * stays inside whole-stage codegen (no boxing, no closure call per
  * row, no optimizer black-box), and unlike the expr-string variant in
  * [[Geo.geohash]] it is a single tight static call instead of ~50
  * generated arithmetic sub-expressions.
  *
  * Same integer formula as [[Geo.geohash]]/[[Geo.geohashUdf]] (the three
  * agree bit-for-bit; GeoSpec asserts it): first 20 bits of each
  * normalized coordinate fraction, interleaved lon-first, base-32.
  */
case class GeohashEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(DoubleType, DoubleType, IntegerType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (DOUBLE, DOUBLE, INT), got ${actual.mkString(", ")}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash_encode"

  override def nullSafeEval(lat: Any, lon: Any, precision: Any): Any =
    UTF8String.fromString(GeohashEncode.encode(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision.asInstanceOf[Int]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, p) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GeohashEncode.encode($lat, $lon, $p))")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GeohashEncode {
  private val Base32 = Geo.Base32

  /** Static encoder the generated code calls — one virtual-free call per
    * row inside the codegen'd stage. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    val latI = math.min(((lat + 90.0) / 180.0 * 1048576.0).toLong, 1048575L)
    val lonI = math.min(((lon + 180.0) / 360.0 * 1048576.0).toLong, 1048575L)
    val sb = new java.lang.StringBuilder(precision)
    var j = 0
    while (j < precision) {
      var c = 0
      var t = 0
      while (t < 5) {
        val p = j * 5 + t
        val bit = if (p % 2 == 0) (lonI >> (19 - p / 2)) & 1L else (latI >> (19 - (p - 1) / 2)) & 1L
        c = (c << 1) | bit.toInt
        t += 1
      }
      sb.append(Base32.charAt(c))
      j += 1
    }
    sb.toString
  }

  val functionName = "geohash_encode"

  /** SQL builder — coerces numeric literals (DECIMAL `48.85`, INT `8`)
    * the way ImplicitCastInputTypes would (that trait is private[sql]). */
  private def builder(children: Seq[Expression]): Expression = {
    require(children.size == 3, s"$functionName expects (lat, lon, precision)")
    GeohashEncode(Cast(children(0), DoubleType), Cast(children(1), DoubleType),
      Cast(children(2), IntegerType))
  }

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[GeohashEncode].getName, functionName),
      builder(_))

  /** For `spark.sql.extensions`-based deployment. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[GeohashEncode].getName, functionName),
      builder))
}

/** Optimizer rule: rewrite calls to the registered `calculate_geohash`
  * Scala UDF (the reference-parity surface, gold_pipeline.py:101-103)
  * into the native [[GeohashEncode]] expression. The UDF is an optimizer
  * black box that breaks whole-stage codegen and blocks pushdown past
  * it; after this rewrite the plan is indistinguishable from one written
  * against the native function — existing user code gets the codegen
  * path for free. Null semantics are identical (both return null on
  * null lat/lon), so the substitution is observationally exact.
  */
object RewriteGeohashUdf
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.ScalaUDF
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case u: ScalaUDF if u.udfName.contains("calculate_geohash") && u.children.size == 3 =>
      GeohashEncode(Cast(u.children(0), DoubleType), Cast(u.children(1), DoubleType),
        Cast(u.children(2), IntegerType))
  }
}

/** Session-extension entry point:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GeohashEncode.inject(ext)
    IcoHex.inject(ext)
    ZOrderKey.inject(ext)
    ext.injectOptimizerRule(_ => RewriteGeohashUdf)
    ext.injectOptimizerRule(_ => RewriteMd5Prefix)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
