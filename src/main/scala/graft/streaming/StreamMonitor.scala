package graft.streaming

import graft.quality.Expectations
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming data-quality monitor: per-micro-batch quality metrics as
  * named observed metrics, the streaming counterpart of
  * [[graft.quality.Expectations]] (the reference platform surfaces the
  * same counters in its pipeline event log —
  * /root/reference/expectations/data_quality.py applied in the DLT
  * pipelines).
  *
  * Mechanics: batch code reads an [[org.apache.spark.sql.Observation]]
  * after the action, but an Observation is single-action — on a stream
  * the metrics must come from each micro-batch's
  * `StreamingQueryProgress.observedMetrics` instead, keyed by the
  * observation name. Same aggregates, different plumbing.
  *
  * Scale notes: observed metrics ride the micro-batch's existing job as
  * accumulator-style partial aggregates — no extra pass, no extra
  * shuffle, constant state per rule. The monitor never collects data
  * rows; a 100 TB/day stream reports the same few counters per batch.
  */
object StreamMonitor {

  /** Attach rows-seen + per-rule violation counters to a streaming
    * frame. Track/Fail rules are counted; Drop rules are filters and
    * belong in [[Expectations.clean]] before this call. */
  def monitored(df: DataFrame, name: String,
      rules: Seq[Expectations.Expectation]): DataFrame = {
    val tracked = rules.filterNot(_.action == Expectations.Drop)
    val metrics = count(lit(1)).as("rows_seen") +:
      tracked.map(r => sum(when(!expr(r.predicate), 1L).otherwise(0L)).as(r.name))
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Observed metrics of every completed micro-batch, oldest first —
    * one map per batch that actually processed rows. */
  def batchMetrics(q: StreamingQuery, name: String): Seq[Map[String, Long]] =
    q.recentProgress.toSeq.flatMap { p =>
      Option(p.observedMetrics.get(name)).map { row =>
        row.schema.fieldNames.map(f => f -> row.getAs[Long](f)).toMap
      }
    }

  /** Post-run gate for Fail rules: throws naming the rule and the batch
    * totals if any micro-batch saw a violation. The streaming analogue
    * of [[Expectations.assertFailRules]]. */
  def assertFailRules(q: StreamingQuery, name: String,
      rules: Seq[Expectations.Expectation]): Unit = {
    val batches = batchMetrics(q, name)
    rules.filter(_.action == Expectations.Fail).foreach { r =>
      val violations = batches.map(_.getOrElse(r.name, 0L)).sum
      require(violations == 0L,
        s"expect_or_fail '${r.name}' violated $violations time(s) across " +
          s"${batches.size} micro-batch(es)")
    }
  }
}
