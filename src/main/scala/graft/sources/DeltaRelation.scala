package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** A LIVE relation over a protocol table — the integration shape
  * delta-spark itself uses (a lazy [[FileIndex]] inside a
  * `HadoopFsRelation`): the file list resolves from the CURRENT
  * snapshot at every physical planning, not at DataFrame construction.
  *
  * Why it exists: a stream-static join re-plans its STATIC side on
  * every micro-batch, so a dimension table read through this relation
  * picks up rows appended between batches — `DeltaLog.read` materializes
  * its file list once and would serve a frozen dimension forever. Same
  * for a long-lived notebook frame over a table other writers update.
  *
  * Contract (all failures are LOUD, never silent wrong answers):
  *   - schema pinned at construction, like the streaming source — a
  *     commit changing names/types/nullability fails the next listing
  *     with a rebuild hint (metadata-only churn keeps working);
  *   - deletion vectors cannot be expressed through a bare parquet
  *     scan — a DV appearing on any live file fails the listing
  *     (`DeltaLog.read` applies them; REORG PURGE materializes them);
  *   - unpartitioned, unmapped tables (partition values live in the
  *     log, not the parquet; physical names differ under mapping).
  *
  * Scale: each listing collects the live (path, size, mtime) triples —
  * O(files) driver work per planning, exactly what delta-spark's
  * TahoeFileIndex pays; the guards ride the same collect. */
final class GraftDeltaFileIndex(spark: SparkSession, table: String,
    baseline: StructType) extends FileIndex {

  private val rootPath: Path = {
    val p = new Path(table)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
  }

  override def rootPaths: Seq[Path] = Seq(rootPath)
  override def partitionSchema: StructType = new StructType()
  override def refresh(): Unit = ()

  private def strip(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, strip(f.dataType), f.nullable)))
    case a: ArrayType => a.copy(elementType = strip(a.elementType))
    case m: MapType =>
      m.copy(keyType = strip(m.keyType), valueType = strip(m.valueType))
    case other => other
  }

  /** Live (path, size, modificationTime) triples from the CURRENT
    * snapshot, with the schema-drift and deletion-vector guards. */
  private def currentFiles(): Array[(String, Long, Long)] = {
    val snap = DeltaLog.snapshot(spark, table)
    snap.schema.foreach { s =>
      if (strip(s) != strip(baseline)) throw new IllegalStateException(
        s"graft-delta live relation on $table: schema changed since the " +
          s"relation was built (${baseline.simpleString} -> " +
          s"${s.simpleString}) — rebuild the DataFrame to pick it up")
    }
    val rows = snap.allFiles
      .select(col("path"), col("size"), col("modificationTime"),
        col("deletionVector.storageType"))
      .collect()
    rows.foreach { r =>
      if (!r.isNullAt(3)) throw new IllegalStateException(
        s"graft-delta live relation on $table: file ${r.getString(0)} " +
          "carries a deletion vector, which a bare parquet scan would " +
          "resurrect — read via DeltaLog.read, or REORG ... APPLY (PURGE)")
    }
    rows.map(r => (r.getString(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2)))
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val files = currentFiles().map { case (p, sz, mt) =>
      new FileStatus(sz, false, 1, 128L * 1024 * 1024, mt,
        new Path(rootPath, p))
    }
    Seq(PartitionDirectory(InternalRow.empty, files))
  }

  override def inputFiles: Array[String] =
    currentFiles().map(t => new Path(rootPath, t._1).toString)

  override def sizeInBytes: Long = {
    import org.apache.spark.sql.functions.sum
    val r = DeltaLog.snapshot(spark, table).allFiles
      .agg(sum(col("size"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}

object DeltaRelation {

  /** Build the live DataFrame (see [[GraftDeltaFileIndex]]). Also the
    * batch half of `spark.read.format("graft-delta").load(path)`. */
  def readLive(spark: SparkSession, table: String): DataFrame = {
    val snap = DeltaLog.snapshot(spark, table)
    val schema = snap.schema.getOrElse(
      sys.error(s"graft-delta live relation: $table declares no schema"))
    require(snap.partitionColumns.isEmpty,
      s"graft-delta live relation: $table is partitioned — partition " +
        "values live in the log, not the parquet; use DeltaLog.read")
    require(snap.columnMappingMode == "none",
      s"graft-delta live relation: $table uses column mapping " +
        "(physical names differ); use DeltaLog.read")
    val relation = relationOf(spark, table, schema)
    org.apache.spark.sql.GraftSqlShim.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(relation, isStreaming = false))
  }

  private[graft] def relationOf(spark: SparkSession, table: String,
      schema: StructType): HadoopFsRelation =
    HadoopFsRelation(
      location = new GraftDeltaFileIndex(spark, table, schema),
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
