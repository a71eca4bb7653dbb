package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for the engine's portable hash primitives
  * ([[graft.llm.Portable]]): the first `nibbles` hex digits of md5(input)
  * as a non-negative long — bit-identical to
  * `conv(substring(md5(x), 1, nibbles), 16, 10)` but computed straight
  * from the digest bytes: no hex-string materialization, no substring
  * copy, no radix parse, and the MessageDigest instance is reused per
  * thread instead of looked up per row. These hashes sit in the hottest
  * loops the engine has (per-shingle in MinHash, per-token in SimHash and
  * fingerprints, per-row in splits/stratification), so the three avoided
  * allocations per call are corpus-sized savings at 100 TB.
  *
  * The hex-prefix value is digit arithmetic over the digest bytes: hex
  * char 2i is the high nibble of byte i, char 2i+1 the low nibble, so the
  * first 2k chars are the big-endian value of bytes [0,k) and an odd
  * prefix appends one high nibble. 15 nibbles (h60) and 8 nibbles (h32)
  * both fit a long with headroom.
  */
case class Md5PrefixLong(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15, s"nibbles must be in [1,15], got $nibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING or BINARY, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  // deferred: at construction the child may still be unresolved (no
  // dataType yet); only analysis-time callers may touch this
  private lazy val isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any = {
    val bytes = if (isString) input.asInstanceOf[UTF8String].getBytes
      else input.asInstanceOf[Array[Byte]]
    Md5PrefixLong.compute(bytes, nibbles)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes: String => String =
      if (isString) in => s"$in.getBytes()" else in => in
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.Md5PrefixLong.compute(${toBytes(in)}, $nibbles)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: rewrite the composed spelling
  * `conv(substring(md5(x), 1, n), 16, 10)` (optionally under a cast to
  * long) into the native [[Md5PrefixLong]] — the pattern every
  * hand-written hash-bucket/split expression uses. Same philosophy as
  * [[RewriteGeohashUdf]]: user code written against builtins gets the
  * allocation-free codegen path without being touched. Bit-exact by
  * PortableSpec; applies only for n ≤ 15 (larger prefixes overflow a
  * long, and the composed form's conv would too — left untouched). */
object RewriteMd5Prefix
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // only the long-cast spelling rewrites: a bare conv() is STRING-typed,
    // and Md5PrefixLong is LONG — replacing it would change the type
    case Cast(Conv(Substring(Md5(input), Literal(pos, _), Literal(len, _)),
        Literal(16, _), Literal(10, _), _),
        org.apache.spark.sql.types.LongType, _, _)
        if pos == 1 && len.isInstanceOf[Int] &&
          len.asInstanceOf[Int] >= 1 && len.asInstanceOf[Int] <= 15 =>
      Md5PrefixLong(input, len.asInstanceOf[Int])
  }
}

object Md5PrefixLong {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First `nibbles` hex digits of md5(bytes) as a long. */
  def compute(bytes: Array[Byte], nibbles: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(bytes)
    var v = 0L
    var i = 0
    val full = nibbles / 2
    while (i < full) {
      v = (v << 8) | (digest(i) & 0xFFL)
      i += 1
    }
    if ((nibbles & 1) == 1) v = (v << 4) | ((digest(full) & 0xFFL) >>> 4)
    v
  }
}
