package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingle hashing: distinct 32-bit hashes of the 3-word
  * shingles of a token array — bit-identical to the composed form
  * `array_distinct(transform(sequence(1, size(t)-2),
  * i -> md5prefix(concat_ws(' ', t[i], t[i+1], t[i+2]), 8)))` (asserted
  * in PortableSpec), which is also exactly what the DuckDB oracle
  * computes. The composed plan materializes an index array, three
  * element_at lookups and a concat per shingle, then a distinct pass;
  * this expression walks the token array once, reuses one byte buffer
  * for the joined shingle, and dedups with an open-address set — the
  * MinHash pipeline's hottest per-row loop (every document, every
  * shingle) with the allocations removed.
  *
  * Duplicate-elimination order matters and is preserved: first
  * occurrence wins, matching both `array_distinct` and DuckDB's
  * `list_distinct` on this data.
  */
case class ShingleHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash32"

  override def nullSafeEval(input: Any): Any =
    ShingleHash32.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.ShingleHash32.compute($in)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash32 {
  private val space = " ".getBytes("UTF-8")

  /** Distinct h32 of each 3-token shingle, first-occurrence order. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val out = new java.util.ArrayList[Long](n - 2)
    val seen = new java.util.HashSet[Long](math.max(4, (n - 2) * 2))
    var i = 0
    while (i < n - 2) {
      val a = tokens.getUTF8String(i).getBytes
      val b = tokens.getUTF8String(i + 1).getBytes
      val c = tokens.getUTF8String(i + 2).getBytes
      val joined = new Array[Byte](a.length + b.length + c.length + 2)
      System.arraycopy(a, 0, joined, 0, a.length)
      joined(a.length) = space(0)
      System.arraycopy(b, 0, joined, a.length + 1, b.length)
      joined(a.length + 1 + b.length) = space(0)
      System.arraycopy(c, 0, joined, a.length + 2 + b.length, c.length)
      val h = Md5PrefixLong.compute(joined, 8)
      if (seen.add(h)) out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }
}
