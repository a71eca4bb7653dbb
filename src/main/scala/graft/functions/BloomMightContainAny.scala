package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `BloomMightContainAny(bloom, hashes)` — true when the serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (the binary produced by
  * Spark's `BloomFilterAggregate`) MIGHT contain ANY of the given 64-bit
  * hashes; false only when every hash is provably absent.
  *
  * Spark's own `BloomFilterMightContain` requires the bloom side to be a
  * constant (it exists for runtime join filters, where one bloom guards a
  * whole scan); this expression instead takes the bloom from a per-row
  * column, which is what per-FILE bloom indexes need — the file-entry
  * frame carries one bloom per (file, column) and the skip predicate
  * evaluates it row by row.
  *
  * Cost model: evaluated over the file-entry frame during data skipping —
  * one deserialization per (file, predicate), O(files) not O(rows), so an
  * interpreted eval is the right cost point (CodegenFallback). The ANY
  * fold keeps IN-list probes to a single deserialization per file.
  */
case class BloomMightContainAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType &&
        (right.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_any expects (BINARY, ARRAY<BIGINT>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(bloom: Any, hashes: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    val arr = hashes.asInstanceOf[ArrayData]
    val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    var i = 0
    var hit = false
    while (!hit && i < arr.numElements()) {
      // a null hash comes only from a null literal in the probe list —
      // equality with NULL matches no row, so it proves nothing
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i))) hit = true
      i += 1
    }
    hit
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
