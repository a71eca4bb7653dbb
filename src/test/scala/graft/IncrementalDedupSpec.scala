package graft

import java.nio.file.Files

import graft.llm.{Dedup, IncrementalDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incrementally-maintained LSH index must produce, per ingest
  * batch, exactly the one-shot pipeline's verified pairs restricted to
  * pairs touching that batch — across multiple increments.
  */
class IncrementalDedupSpec extends SparkSpec {

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental probe+extend equals one-shot dedup restricted to new docs") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    // three ingest batches by doc_id range (sf0.001 has 50 docs)
    val cut1 = 30L
    val cut2 = 40L
    val b0 = docs.where(col("doc_id") < cut1)
    val b1 = docs.where(col("doc_id") >= cut1 && col("doc_id") < cut2)
    val b2 = docs.where(col("doc_id") >= cut2)
    val root = Files.createTempDirectory("graft-lshidx-").toString

    // batch 0 bootstraps the index; its pairs are the one-shot pairs of b0
    val p0 = pairs(IncrementalDedup.probeAndExtend(spark, root, b0))
    assert(p0 == pairs(Dedup.verifiedPairsOf(b0)))

    // batch 1: pairs touching b1 (b1×b0 and b1×b1)
    val p1 = pairs(IncrementalDedup.probeAndExtend(spark, root, b1))
    val upTo2 = docs.where(col("doc_id") < cut2)
    val expect1 = pairs(Dedup.verifiedPairsOf(upTo2))
      .filter { case (a, b) => a >= cut1 || b >= cut1 }
    assert(p1 == expect1)

    // batch 2: pairs touching b2, against the whole corpus
    val p2 = pairs(IncrementalDedup.probeAndExtend(spark, root, b2))
    val expect2 = pairs(Dedup.verifiedPairsOf(docs))
      .filter { case (a, b) => a >= cut2 || b >= cut2 }
    assert(p2 == expect2)

    // cumulative union across batches = the full one-shot result
    assert((p0 ++ p1 ++ p2) == pairs(Dedup.verifiedPairsOf(docs)))

    // the index holds every shingled doc (short docs have no shingles)
    val shingled = Dedup.shingleFrame(docs).count()
    assert(IncrementalDedup.indexedDocs(spark, root) == shingled)

    // and the index tables are protocol tables: time travel sees the
    // pre-batch-2 band count
    val bandsNow = graft.sources.DeltaLog.read(spark, s"$root/bands").count()
    val bandsV1 = graft.sources.DeltaLog.read(spark, s"$root/bands", Some(1L)).count()
    assert(bandsNow > bandsV1)
  }

  test("replayed batch is idempotent; a crash between the two commits heals") {
    import graft.sources.DeltaLog
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val b0 = docs.where(col("doc_id") < 30L)
    val b1 = docs.where(col("doc_id") >= 30L)
    val root = Files.createTempDirectory("graft-lshidx2-").toString

    val p0 = pairs(IncrementalDedup.probeAndExtend(spark, root, b0, Some(0L)))
    val sh0 = DeltaLog.read(spark, s"$root/shingles").count()

    // full replay of batch 0 (the at-least-once ingest case): same
    // pairs back, no rows double-appended to either table
    val p0r = pairs(IncrementalDedup.probeAndExtend(spark, root, b0, Some(0L)))
    assert(p0r == p0)
    assert(DeltaLog.read(spark, s"$root/shingles").count() == sh0)

    // simulated crash in batch 1: shingles committed (it goes first),
    // bands not — the replay must append ONLY the missing bands table
    // and still report batch-1 pairs exactly once
    val newSh1 = Dedup.shingleFrame(b1)
    DeltaLog.write(spark, newSh1, s"$root/shingles", "append", txn = Some(root -> 1L))
    val bandsBefore = DeltaLog.read(spark, s"$root/bands").count()
    val p1 = pairs(IncrementalDedup.probeAndExtend(spark, root, b1, Some(1L)))
    val expect1 = pairs(Dedup.verifiedPairsOf(docs))
      .filter { case (a, b) => a >= 30L || b >= 30L }
    assert(p1 == expect1)
    // shingles not duplicated, bands appended exactly once
    assert(DeltaLog.read(spark, s"$root/shingles").count() == sh0 + newSh1.count())
    assert(DeltaLog.read(spark, s"$root/bands").count() > bandsBefore)
    assert(IncrementalDedup.indexedDocs(spark, root) ==
      Dedup.shingleFrame(docs).count())
  }
}
