package graft

import java.nio.file.Files

import graft.llm.{IncrementalAnn, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The cell-partitioned IVF postings table must (a) give single-probe
  * results identical to the one-shot in-memory IVF search after any
  * number of ingest batches, and (b) prune the postings scan to the
  * probed cells via the partition column.
  */
class IncrementalAnnSpec extends SparkSpec {

  private def results(df: DataFrame): Set[(Long, Long, Int)] =
    df.select(col("query_id"), col("cand_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("two-batch index equals one-shot IVF search; probes prune partitions") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val cents = Similarity.trainCentroids(emb, k = 4, iters = 2)
    val root = Files.createTempDirectory("graft-ivfidx-").toString

    // ingest in two batches
    IncrementalAnn.extend(spark, root, emb.where(col("vec_id") < 100), cents)
    IncrementalAnn.extend(spark, root, emb.where(col("vec_id") >= 100), cents)

    // single-probe search over the table == in-memory ivfSearch on the
    // same centroids (first 5 vectors as queries)
    val queries = emb.where(col("vec_id") < 5)
    val fromTable = IncrementalAnn.search(spark, root, queries, cents, topk = 3, nprobe = 1)
    val oneShot = Similarity.ivfSearch(emb, cents, col("vec_id") < 5, topk = 3)
    assert(results(fromTable) == results(oneShot))
    assert(results(fromTable).nonEmpty)

    // multi-probe strictly widens the candidate pool (recall can only
    // improve; with 4 cells, nprobe=4 is exact brute force over all cells)
    val allProbe = IncrementalAnn.search(spark, root, queries, cents, topk = 3, nprobe = 4)
    assert(results(allProbe).nonEmpty)

    // partition pruning: the postings scan carries a partition filter on
    // `cell`, so only probed directories are listed
    val plan = fromTable.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(2000))

    // the postings table is a protocol table: batch 1 is time-travelable
    val v0 = graft.sources.DeltaLog.read(spark, s"$root/postings", Some(0L)).count()
    val now = graft.sources.DeltaLog.read(spark, s"$root/postings").count()
    assert(v0 < now && now == emb.count())

    // cell histogram covers every vector exactly once
    val hist = IncrementalAnn.cellHistogram(spark, root)
      .agg(sum(col("n_vectors"))).collect()(0).getLong(0)
    assert(hist == emb.count())
  }

  test("k=256 index takes the bulk-assignment path and matches one-shot search") {
    // 256 centroids is past literalAssignMaxK, so extend/search assign
    // and score against the single array literal instead of 256 unrolled
    // expressions — the production-IVF plan-size regime
    assert(256 > Similarity.literalAssignMaxK)
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val cents = Similarity.trainCentroids(emb, k = 256, iters = 0)
    val root = Files.createTempDirectory("graft-ivfidx256-").toString
    IncrementalAnn.extend(spark, root, emb.where(col("vec_id") < 250), cents)
    IncrementalAnn.extend(spark, root, emb.where(col("vec_id") >= 250), cents)
    val queries = emb.where(col("vec_id") < 5)
    val fromTable = IncrementalAnn.search(spark, root, queries, cents, topk = 3, nprobe = 1)
    val oneShot = Similarity.ivfSearch(emb, cents, col("vec_id") < 5, topk = 3)
    assert(results(fromTable) == results(oneShot))
    assert(results(fromTable).nonEmpty)
    // pruning still holds with the literal-array probe list
    val plan = fromTable.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(2000))
  }

  test("replayed ingest batch is skipped by the txn guard") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val cents = Similarity.trainCentroids(emb, k = 4, iters = 1)
    val root = Files.createTempDirectory("graft-ivfidx2-").toString
    assert(IncrementalAnn.extend(spark, root, emb, cents, Some(0L)) >= 0L)
    val n = graft.sources.DeltaLog.read(spark, s"$root/postings").count()
    assert(IncrementalAnn.extend(spark, root, emb, cents, Some(0L)) == -1L)
    assert(graft.sources.DeltaLog.read(spark, s"$root/postings").count() == n)
  }
}
