package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door the engine needs: constructing a
  * DataFrame from a custom logical plan (`Dataset.ofRows`). Everything
  * else in graft.* uses public APIs; this shim exists so the custom
  * operator nodes (graft.plans) can enter a query without reflection.
  * Standard technique for plan-level Spark extensions. */
object GraftSqlShim {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): classic.DataFrame =
    classic.Dataset.ofRows(spark, plan)

  def expression(col: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(col)

  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Collapse a batch plan into ONE streaming-marked RDD leaf — for a
    * `getBatch` whose plan contains joins/aggregates that must NOT be
    * re-planned incrementally (leaf-marking via [[asStreaming]] would
    * turn a batch full-outer join into a watermarkless stream-stream
    * join that holds every row in state). The RDD is lazy: the batch
    * plan executes inside the micro-batch job, through the ordinary
    * batch planner — the `internalCreateDataFrame(_, _, isStreaming)`
    * door Spark's own sources use. */
  def asStreamingRdd(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** Detach a micro-batch's incremental frame into a plain BATCH frame —
    * what a DSv1 `Sink.addBatch` must do before handing the rows to a
    * batch writer (writing the streaming-marked frame directly would
    * re-enter the incremental planner). Delta's own V1 sink uses this
    * exact door; the RDD is lazy, so the batch executes inside the
    * micro-batch job. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }

  /** Re-mark a batch plan's leaf relations as streaming — what a DSv1
    * streaming source's `getBatch` must return (MicroBatchExecution
    * asserts `isStreaming`; Delta's own streaming source performs the
    * same marking from inside the sql package tree). */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val plan = cdf.queryExecution.analyzed.transformUp {
      case lr: execution.datasources.LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
      case lr: catalyst.plans.logical.LocalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
      case rdd: execution.LogicalRDD if !rdd.isStreaming =>
        rdd.copy(isStreaming = true)(cdf.sparkSession, None, None)
    }
    classic.Dataset.ofRows(cdf.sparkSession, plan)
  }
}
