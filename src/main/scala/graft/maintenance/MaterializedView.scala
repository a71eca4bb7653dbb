package graft.maintenance

import graft.sources.DeltaLog
import org.apache.spark.sql.SparkSession

/** Incrementally-maintained materialized aggregate between two Delta
  * tables: `gold = source.groupBy(keys).agg(count, sum(sumCols))`, kept
  * current by folding [[DeltaLog.changesBetween]] row deltas into the
  * previous gold state ([[IncrementalAgg.applyDelta]]) instead of
  * rescanning the source — O(delta) per refresh where the reference
  * schedules nightly full rebuilds (gold_pipeline.py:358-369).
  *
  * Exactly-once without an external offset store: the gold table's own
  * SetTransaction state records the last folded source version, and the
  * fold + offset advance land in ONE atomic gold commit. A crashed or
  * replayed refresh re-reads the same `consumed` version and rewrites
  * gold to the same state — idempotent by construction. Updates are
  * handled exactly: with the copy-on-write [[DeltaLog.mergeUpsert]]
  * upstream, a MERGE surfaces as cancelling delete+insert pairs for
  * rewritten-unchanged rows and delete(old)+insert(new) for real
  * changes, and [[IncrementalAgg]] sums are DECIMAL-exact, so
  * maintained gold ≡ full recompute bit-for-bit (spec-asserted).
  *
  * Scale: the refresh shuffles only the delta (keyed by `keys`) plus a
  * key-equi join against the previous gold; gold itself is
  * aggregate-sized. If the source log was vacuumed past the consumer
  * (changesBetween refuses), the refresh falls back to one full rebuild
  * and resumes incrementally from there.
  */
object MaterializedView {

  private def appId(source: String) = s"graft-mv:$source"

  /** Bring `gold` up to the source's current version. Returns the source
    * version now reflected in gold (no-op when already current). */
  def refresh(spark: SparkSession, source: String, gold: String,
      keys: Seq[String], sumCols: Seq[String]): Long = {
    val sv = DeltaLog.snapshot(spark, source).version
    val consumed =
      if (!DeltaLog.isDeltaTable(spark, gold)) None
      else DeltaLog.lastTxn(spark, gold, appId(source))
    if (consumed.contains(sv)) return sv

    def rebuild(): Unit = {
      val full = IncrementalAgg.materialize(
        DeltaLog.read(spark, source, Some(sv)), keys, sumCols)
      DeltaLog.write(spark, full, gold, "overwrite",
        txn = Some(appId(source) -> sv))
      ()
    }

    consumed match {
      case None => rebuild()
      case Some(from) =>
        val delta =
          try DeltaLog.changesBetween(spark, source, from, sv)
          catch {
            // source log vacuumed past the consumer: one full rebuild,
            // then incremental resumes from sv
            case e: IllegalArgumentException if e.getMessage.contains("truncated") =>
              rebuild(); return sv
          }
        val next = IncrementalAgg.applyDelta(
          DeltaLog.read(spark, gold), delta, keys, sumCols)
        DeltaLog.write(spark, next, gold, "overwrite",
          txn = Some(appId(source) -> sv))
    }
    sv
  }
}
