package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructField, StructType}

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
  * Pruning happens INSIDE the listing, like delta-spark's file index:
  *   - partition filters evaluate against each directory's partition
  *     values (mandatory — Spark drops partition predicates from the
  *     data filters and relies on the index to apply them);
  *   - data filters feed the zone-map/bloom skip machinery
  *     ([[DeltaLog.pruneFiles]]) via a conservative SQL round-trip —
  *     any untranslatable filter just means no file skipping, never a
  *     wrong answer.
  *
  * Contract (failures are LOUD, never silent wrong answers):
  *   - schema pinned at construction, like the streaming source — a
  *     commit changing names/types/nullability fails the next listing
  *     with a rebuild hint (metadata-only churn keeps working);
  *   - deletion vectors cannot be expressed through a bare parquet
  *     scan — a DV appearing on any live file fails the listing
  *     (`DeltaLog.read` applies them; REORG PURGE materializes them);
  *   - column-mapped tables refuse at construction (physical names).
  *
  * Scale: each listing collects the live (path, size, mtime, pv)
  * rows — O(files) driver work per planning, exactly what
  * delta-spark's TahoeFileIndex pays; the guards ride the same
  * collect, and data-filter pruning collects survivors only. */
final class GraftDeltaFileIndex(spark: SparkSession, table: String,
    baseline: StructType, partCols: Seq[String],
    pinnedVersion: Option[Long] = None) extends FileIndex {

  private val rootPath: Path = {
    val p = new Path(table)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
  }

  override def rootPaths: Seq[Path] = Seq(rootPath)

  override val partitionSchema: StructType =
    StructType(partCols.map(c => baseline.fields.find(_.name == c).getOrElse(
      sys.error(s"partition column $c not in schema")).copy(nullable = true)))

  override def refresh(): Unit = ()

  private def strip(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, strip(f.dataType), f.nullable)))
    case a: ArrayType => a.copy(elementType = strip(a.elementType))
    case m: MapType =>
      m.copy(keyType = strip(m.keyType), valueType = strip(m.valueType))
    case other => other
  }

  /** Fresh snapshot with the schema-drift guard applied — or, for a
    * time-travel relation, the PINNED version's snapshot (frozen by
    * definition; the guard is then a no-op). */
  private def guardedSnapshot(): DeltaLog.Snapshot = {
    val snap = DeltaLog.snapshot(spark, table, pinnedVersion)
    snap.schema.foreach { s =>
      if (strip(s) != strip(baseline)) throw new IllegalStateException(
        s"graft-delta live relation on $table: schema changed since the " +
          s"relation was built (${baseline.simpleString} -> " +
          s"${s.simpleString}) — rebuild the DataFrame to pick it up")
    }
    snap
  }

  /** Live (path, size, mtime, partitionValues) with the DV guard. */
  private def currentFiles(snap: DeltaLog.Snapshot)
      : Array[(String, Long, Long, Map[String, String])] = {
    val rows = snap.allFiles
      .select(col("path"), col("size"), col("modificationTime"),
        col("deletionVector.storageType"), col("partitionValues"))
      .collect()
    rows.foreach { r =>
      if (!r.isNullAt(3)) throw new IllegalStateException(
        s"graft-delta live relation on $table: file ${r.getString(0)} " +
          "carries a deletion vector, which a bare parquet scan would " +
          "resurrect — read via DeltaLog.read, or REORG ... APPLY (PURGE)")
    }
    rows.map { r =>
      val pv =
        if (r.isNullAt(4)) Map.empty[String, String]
        else r.getMap[String, String](4).toMap
      (r.getString(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2), pv)
    }
  }

  private def statusOf(t: (String, Long, Long, Map[String, String])): FileStatus =
    new FileStatus(t._2, false, 1, 128L * 1024 * 1024, t._3,
      new Path(rootPath, t._1))

  /** Partition value string → catalyst value of the declared type. */
  private def castPv(s: String, dt: DataType): Any =
    if (s == null) null
    else Cast(Literal.create(s, StringType), dt,
      Option(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val snap = guardedSnapshot()
    // zone-map / bloom skipping from the data filters — conservative
    // SQL round-trip (expression -> sql text -> Column); anything that
    // does not translate means NO skipping, never a missed row
    val survivors: Option[Set[String]] =
      if (dataFilters.isEmpty) None
      else scala.util.Try {
        val pred = dataFilters
          .map(e => org.apache.spark.sql.functions.expr(e.sql))
          .reduce(_ && _)
        DeltaLog.pruneFiles(spark, snap, pred, Some(table)).toSet
      }.toOption
    val all = currentFiles(snap)
    val kept = survivors.fold(all)(s => all.filter(t => s.contains(t._1)))
    if (partitionSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, kept.map(statusOf)))
    else {
      val dirs = kept.groupBy(_._4).toSeq.map { case (pv, ts) =>
        val values = InternalRow.fromSeq(partitionSchema.fields.map(f =>
          castPv(pv.getOrElse(f.name, null), f.dataType)).toSeq)
        PartitionDirectory(values, ts.map(statusOf))
      }
      // partition predicates are the index's to apply: Spark removed
      // them from the data filters and trusts the listing
      val pred = partitionFilters.reduceOption(And).map { e =>
        Predicate.create(e.transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }, Nil)
      }
      dirs.filter(d => pred.forall(_.eval(d.values)))
    }
  }

  override def inputFiles: Array[String] =
    currentFiles(guardedSnapshot()).map(t => new Path(rootPath, t._1).toString)

  override def sizeInBytes: Long = {
    import org.apache.spark.sql.functions.sum
    val r = DeltaLog.snapshot(spark, table, pinnedVersion).allFiles
      .agg(sum(col("size"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}

object DeltaRelation {

  /** Build the live DataFrame (see [[GraftDeltaFileIndex]]) — also the
    * batch half of `spark.read.format("graft-delta").load(path)`.
    * Columns surface in the table's DECLARED order (Spark appends
    * partition columns last internally; the select restores parity
    * with `DeltaLog.read`). */
  def readLive(spark: SparkSession, table: String): DataFrame = {
    val snap = DeltaLog.snapshot(spark, table)
    val schema = snap.schema.getOrElse(
      sys.error(s"graft-delta live relation: $table declares no schema"))
    require(snap.columnMappingMode == "none",
      s"graft-delta live relation: $table uses column mapping " +
        "(physical names differ); use DeltaLog.read")
    val df = org.apache.spark.sql.GraftSqlShim.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(
        relationOf(spark, table, schema, snap.partitionColumns),
        isStreaming = false))
    df.select(schema.fieldNames.map(col).toSeq: _*)
  }

  private[graft] def relationOf(spark: SparkSession, table: String,
      schema: StructType, partCols: Seq[String],
      pinnedVersion: Option[Long] = None): HadoopFsRelation = {
    val partSet = partCols.toSet
    val index = new GraftDeltaFileIndex(spark, table, schema, partCols,
      pinnedVersion)
    HadoopFsRelation(
      location = index,
      // the index's own ordering — PartitionDirectory rows are built in
      // partitionSchema field order and the scan trusts it
      partitionSchema = index.partitionSchema,
      dataSchema = StructType(schema.fields.filterNot(f => partSet.contains(f.name))),
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
  }
}
