package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension tier (SURVEY §4 / brief tier (c)): per-key
  * top-k as a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`.
  *
  * Why an operator and not a window: `row_number() OVER (PARTITION BY k
  * ORDER BY o) <= n` SORTS every partition's full row set to keep n of
  * them. This operator keeps a bounded heap per key — O(rows · log k)
  * with NO sort of the non-survivors — and, crucially, runs a PARTIAL
  * pass before the exchange (the aggregation-style two-phase shape), so
  * the shuffle moves at most k rows per key per input partition instead
  * of every row. At 100 TB with a selective k the exchange shrinks by
  * orders of magnitude; a window cannot do this because row_number is
  * not decomposable — top-k is.
  *
  * Determinism contract: `order` must be a TOTAL order (include a unique
  * tiebreaker) — with ties past rank k, which tied row survives would
  * otherwise depend on partitioning.
  */
case class TopKPerKeyNode(k: Int, key: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Two-phase physical operator. `partial = true` runs before the
  * exchange with no distribution requirement; the final instance
  * demands clustering on the key, so EnsureRequirements inserts exactly
  * one hash exchange of the pre-pruned rows. */
case class TopKPerKeyExec(k: Int, key: Seq[Expression], order: Seq[SortOrder],
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def nodeName: String = if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(key))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = key
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord: Ordering[InternalRow] = RowOrdering.create(sortOrder, schema)
      // max-heap under `ord`: head = the row ranked LAST among the kept
      // k, evicted first when a better row arrives
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val keyRow = keyProj(row)
        var heap = heaps.get(keyRow)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(keyRow.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via required
  * distribution) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, key, order, child) =>
      TopKPerKeyExec(k, key, order, partial = false,
        TopKPerKeyExec(k, key, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Register the strategy on the session (idempotent). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Per-key top-k of `df`: the first `k` rows of each key group under
    * `orderBy` — (column, ascending) pairs; include a unique tiebreaker
    * (see determinism contract above). Output order within the result is
    * unspecified, like any aggregate. */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(c: String): Attribute =
      analyzed.output.find(_.name == c)
        .getOrElse(sys.error(s"TopK.perKey: no column $c in ${analyzed.output.map(_.name)}"))
    val keyExprs: Seq[Expression] = keyCols.map(attr)
    val orderExprs: Seq[SortOrder] = orderBy.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftSqlShim.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKeyNode(k, keyExprs, orderExprs, analyzed))
  }
}
