package graft.llm

import graft.sources.DeltaLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MinHash-LSH near-duplicate index.
  *
  * At 100 TB you cannot re-run LSH over the whole corpus every time a
  * crawl batch lands: the full self-join touches every document. What
  * production dedup actually does is maintain the LSH artifacts as
  * TABLES — (doc_id, band-key) and (doc_id, shingle-set) — and, per
  * ingest batch, (1) compute artifacts for the NEW docs only, (2) probe
  * the band table with the new docs' band keys, (3) Jaccard-verify just
  * those candidates, (4) append the new artifacts. Work per batch is
  * O(batch + matched candidates), independent of corpus size; the big
  * join is new-bands ⋈ indexed-bands, shuffled on the band key with the
  * small (batch-sized) side broadcastable.
  *
  * Both tables live on the open Delta-log protocol ([[DeltaLog]]), so
  * the index itself is time-travelable and transactionally appended —
  * a crashed ingest leaves no partial index state, and a replayed batch
  * can be made idempotent with the same txn guard the streaming sink
  * uses.
  *
  * Uses the same shingle/band functions as the one-shot
  * [[Dedup.nearDupPairs]] (same 16 signatures, 4×4 bands, Jaccard ≥
  * 0.8), so incremental results are exactly the one-shot results
  * restricted to pairs that touch the new batch — asserted by
  * `IncrementalDedupSpec`.
  */
object IncrementalDedup {

  private def bandsTable(root: String) = s"$root/bands"
  private def shinglesTable(root: String) = s"$root/shingles"

  // explicit log-existence probe, NOT Try(snapshot).isSuccess: an
  // unreadable index (transient IO, corrupt log) must fail the batch,
  // not flip the writer to overwrite and silently truncate the index
  private def isTable(spark: SparkSession, path: String): Boolean =
    DeltaLog.isDeltaTable(spark, path)

  private def hasIndex(spark: SparkSession, root: String): Boolean =
    isTable(spark, bandsTable(root))

  /** Near-dup pairs (doc_a, doc_b, jaccard) between `newDocs` and
    * everything indexed so far (plus within-batch pairs), then extend
    * the index with the batch's artifacts. Returns the verified pairs
    * — doc_a < doc_b, Jaccard ≥ 0.8, same thresholds as the one-shot
    * pipeline. `newDocs` must be documents-shaped (`doc_id`, `text`)
    * with doc_ids not already indexed.
    *
    * `batchId` (with the index root as the txn appId) makes the extend
    * IDEMPOTENT per table: each table's commit carries a SetTransaction
    * action, and a replayed batch — after a crash between the two
    * commits, or a re-run ingest job — re-appends only to the table
    * that missed it. The probe's result frame stays correct on replay
    * because already-indexed batch rows are excluded from the "indexed"
    * side before the union (the batch artifacts are recomputed, not
    * double-counted). */
  def probeAndExtend(spark: SparkSession, root: String, newDocs: DataFrame,
      batchId: Option[Long] = None): DataFrame = {
    // batch artifacts: computed once, reused by probe + verify + append
    // (localCheckpoint: the batch is small relative to the corpus, and
    // three consumers would otherwise recompute the shingling)
    val newSh = Dedup.shingleFrame(newDocs).localCheckpoint(true)
    val newBands = Dedup.bandKeys(newSh).localCheckpoint(true)
    val batchIds = newSh.select("doc_id").distinct()

    // on replay, a table that already took this batch must not feed the
    // batch's own rows into the "indexed so far" side (they'd duplicate
    // the recomputed artifacts and double-join the verification)
    def indexed(table: String, applied: Boolean): Option[DataFrame] =
      if (!isTable(spark, table)) None
      else {
        val t = DeltaLog.read(spark, table)
        Some(if (applied) t.join(batchIds, Seq("doc_id"), "left_anti") else t)
      }
    def alreadyApplied(table: String): Boolean = batchId.exists(b =>
      DeltaLog.lastTxn(spark, table, root).exists(_ >= b))

    val bandsApplied = alreadyApplied(bandsTable(root))
    val shApplied = alreadyApplied(shinglesTable(root))
    val allBands = indexed(bandsTable(root), bandsApplied)
      .fold(newBands)(_.unionByName(newBands))
    val allSh = indexed(shinglesTable(root), shApplied)
      .fold(newSh)(_.unionByName(newSh))

    // probe: candidates must touch the batch — new side left, full index
    // right; a < b normalization after the join so within-batch pairs
    // appear once. The batch side is the small side (broadcastable when
    // the batch is; the index side shuffles on bk only).
    val cand = newBands.as("n").join(allBands.as("i"),
        col("n.bk") === col("i.bk") && col("n.doc_id") =!= col("i.doc_id"))
      .select(least(col("n.doc_id"), col("i.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("i.doc_id")).as("doc_b"))
      .distinct()

    val verified = cand
      .join(allSh.select(col("doc_id"), col("shash").as("sa")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(allSh.select(col("doc_id"), col("shash").as("sb")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(col("sa"), x => array_contains(col("sb"), x))).cast("double") /
          (size(col("sa")) + size(col("sb")) -
            size(filter(col("sa"), x => array_contains(col("sb"), x)))))
          .as("jaccard"))
      .where(col("jaccard") >= 0.8)
      .localCheckpoint(true) // materialize BEFORE the appends move the tables forward

    val txn = batchId.map(root -> _)
    if (!shApplied)
      DeltaLog.write(spark, newSh, shinglesTable(root),
        if (isTable(spark, shinglesTable(root))) "append" else "overwrite", txn = txn)
    if (!bandsApplied)
      DeltaLog.write(spark, newBands, bandsTable(root),
        if (isTable(spark, bandsTable(root))) "append" else "overwrite", txn = txn)
    verified
  }

  /** Indexed doc count (distinct doc_ids in the shingle table). */
  def indexedDocs(spark: SparkSession, root: String): Long =
    if (!hasIndex(spark, root)) 0L
    else DeltaLog.read(spark, shinglesTable(root)).select("doc_id").distinct().count()
}
