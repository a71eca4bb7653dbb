package graft.maintenance

import graft.sources.DeltaLog
import org.apache.spark.sql.SparkSession

/** Incrementally-maintained materialized aggregate between two Delta
  * tables: `gold = source.groupBy(keys).agg(count, sum(sumCols))`, kept
  * current by folding [[DeltaLog.changesBetween]] row deltas into the
  * previous gold state instead of rescanning the source — O(delta) per
  * refresh where the reference schedules nightly full rebuilds
  * (gold_pipeline.py:358-369).
  *
  * Exactly-once without an external offset store: the gold table's own
  * SetTransaction state records the last folded source version, and the
  * fold + offset advance land in ONE atomic gold commit. Concurrency is
  * pinned to a SINGLE gold snapshot: the consumed offset is read from
  * it, the previous gold state is read AT it, and the commit carries it
  * as `baseVersion` — so two overlapping refreshes cannot both land
  * (the loser fails loudly instead of silently double-folding the same
  * delta), and a crashed or replayed refresh recomputes the identical
  * state. Updates are handled exactly: with the copy-on-write
  * [[DeltaLog.mergeUpsert]] upstream, a MERGE surfaces as cancelling
  * delete+insert pairs for rewritten-unchanged rows and
  * delete(old)+insert(new) for real changes, and [[IncrementalAgg]]
  * sums are DECIMAL-exact, so maintained gold ≡ full recompute
  * bit-for-bit (spec-asserted).
  *
  * Scale: the refresh shuffles only the delta (keyed by `keys`) plus a
  * key-equi join against the previous gold, and the WRITE is O(changed
  * groups) too — [[IncrementalAgg.changedGroups]] emits only the groups
  * the delta touched and [[DeltaLog.mergeGroups]] rewrites only the
  * gold files containing them (deleting groups whose count hits zero),
  * so a high-cardinality gold (per-user, per-doc) never pays an
  * O(gold) overwrite for an O(delta) change. If the source log was
  * vacuumed past the consumer (changesBetween refuses), the refresh
  * falls back to one full rebuild and resumes incrementally from there.
  */
object MaterializedView {

  private def appId(source: String) = s"graft-mv:$source"

  /** Bring `gold` up to the source's current version. Returns the source
    * version now reflected in gold (no-op when already current). */
  def refresh(spark: SparkSession, source: String, gold: String,
      keys: Seq[String], sumCols: Seq[String]): Long = {
    val sv = DeltaLog.snapshot(spark, source).version

    def rebuild(goldBase: Option[Long]): Unit = {
      val full = IncrementalAgg.materialize(
        DeltaLog.read(spark, source, Some(sv)), keys, sumCols)
      DeltaLog.write(spark, full, gold, "overwrite",
        txn = Some(appId(source) -> sv), baseVersion = goldBase)
      ()
    }

    if (!DeltaLog.isDeltaTable(spark, gold)) { rebuild(None); return sv }

    // ONE pinned gold snapshot: the consumed offset, the gold state
    // read, and the commit's baseVersion all derive from it — the
    // anti-double-fold invariant
    val goldSnap = DeltaLog.snapshot(spark, gold)
    val consumed = goldSnap.txns.get(appId(source))
    if (consumed.contains(sv)) return sv

    consumed match {
      case None => rebuild(Some(goldSnap.version))
      case Some(from) =>
        val delta =
          try DeltaLog.changesBetween(spark, source, from, sv)
          catch {
            // source log vacuumed past the consumer: one full rebuild,
            // then incremental resumes from sv
            case e: IllegalArgumentException if e.getMessage.contains("truncated") =>
              rebuild(Some(goldSnap.version)); return sv
          }
        val changed = IncrementalAgg.changedGroups(
          DeltaLog.read(spark, gold, Some(goldSnap.version)), delta, keys, sumCols)
        DeltaLog.mergeGroups(spark, gold, changed, keys, "__delete",
          Some(appId(source) -> sv), goldSnap)
    }
    sv
  }
}
