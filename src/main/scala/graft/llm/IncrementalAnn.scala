package graft.llm

import graft.sources.DeltaLog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained IVF ANN index as a cell-partitioned Delta
  * table — the lakehouse rendering of an inverted-file vector index.
  *
  * The postings table holds (vec_id, embedding, nrm) PARTITIONED BY
  * `cell` (the nearest-centroid assignment). That partitioning IS the
  * inverted list: a search that probes `nprobe` cells filters on the
  * partition column, so partition pruning reduces the scan to exactly
  * the probed cells' files — at 100 TB with 4096 cells and nprobe=4,
  * ~0.1% of the data is read per query batch, the same locality a
  * native IVF index gets from its list offsets.
  *
  * Ingest batches append through the Delta log: assignment is a pure
  * map-side pass against literal centroids ([[Similarity.assignCells]]),
  * so extending the index never touches existing postings — O(batch)
  * work per batch, and the index is transactional and time-travelable
  * like any other protocol table.
  *
  * The centroid set is fixed at index creation (standard IVF practice:
  * re-training centroids means re-building the index; drift is handled
  * by monitoring the quantizer objective and rebuilding offline).
  */
object IncrementalAnn {

  private def postings(root: String) = s"$root/postings"

  // explicit log-existence probe, NOT Try(snapshot).isSuccess: an
  // unreadable index (transient IO, corrupt log) must fail the batch,
  // not flip the writer to overwrite and silently truncate the postings
  private def hasIndex(spark: SparkSession, root: String): Boolean =
    DeltaLog.isDeltaTable(spark, postings(root))

  /** Assign `newVecs` (vec_id, embedding) to cells and append to the
    * postings table. Returns the committed Delta version. `batchId`
    * makes the append idempotent via a SetTransaction action (a
    * replayed ingest batch is skipped); -1 is returned for a skip. */
  def extend(spark: SparkSession, root: String, newVecs: DataFrame,
      cents: Array[Array[Double]], batchId: Option[Long] = None): Long = {
    if (batchId.exists(b =>
        DeltaLog.lastTxn(spark, postings(root), root).exists(_ >= b))) -1L
    else {
      val assigned = Similarity.assignCells(newVecs, cents)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      val mode = if (hasIndex(spark, root)) "append" else "overwrite"
      DeltaLog.write(spark, assigned, postings(root), mode,
        partitionBy = Seq("cell"), txn = batchId.map(root -> _))
    }
  }

  /** Top-k cosine search over the postings table, probing the `nprobe`
    * nearest cells per query. The query set is assigned cell
    * probe-lists against the same literal centroids, then broadcast;
    * the postings scan carries `cell IN (probed)` — a partition-column
    * filter, so pruning reads only the probed cells' files. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      cents: Array[Array[Double]], topk: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= cents.length, s"nprobe=$nprobe")
    // per-query probe list: rank all cells by cosine(query, centroid) —
    // unrolled expressions for small k, one array literal above the
    // threshold (same plan-size switch as Similarity.assignCells)
    def scoredArr: Column =
      if (cents.length <= Similarity.literalAssignMaxK)
        array(cents.zipWithIndex.map { case (cw, ci) =>
          val cnrm = math.sqrt(cw.map(x => x * x).sum)
          struct(
            (Similarity.dot(col("embedding"), array(cw.map(lit): _*)) /
              (col("q_nrm") * lit(cnrm))).as("cos"),
            lit(ci).as("cell"))
        }.toSeq: _*)
      else Similarity.centScoresArr(col("embedding"), col("q_nrm"), cents)
    val q = queries
      .withColumn("q_nrm", sqrt(Similarity.dot(col("embedding"), col("embedding"))))
      .withColumn("probes",
        slice(reverse(array_sort(scoredArr)), 1, nprobe))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("q_nrm"), transform(col("probes"), p => p.getField("cell")).as("probe_cells"))
    val probed = q.select(explode(col("probe_cells")).as("probe_cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // partition-column IN-filter: prunes the postings scan to the probed
    // cells' directories before any row is read
    val posts = DeltaLog.read(spark, postings(root))
      .where(col("cell").isin(probed: _*))
    posts.join(broadcast(q),
        array_contains(col("probe_cells"), col("cell")) &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (Similarity.dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .where(col("rnk") <= topk)
  }

  /** Postings count per cell — the list-length skew report an IVF
    * operator needs (hot cells → probe cost variance). */
  def cellHistogram(spark: SparkSession, root: String): DataFrame =
    DeltaLog.read(spark, postings(root))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
}
