package graft.streaming

import graft.sources.DeltaLog
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming source over the engine's Delta-protocol tables —
  * the reference's S2 shape (`dlt.read_stream` from a managed table,
  * /root/reference/pipelines/silver_pipeline.py:107) on the open log:
  *
  * {{{
  *   spark.readStream.format("graft-delta").load("/path/to/table")
  * }}}
  *
  * Offsets ARE log versions: each micro-batch reads exactly the files
  * ADDED in `(lastCommittedVersion, latestVersion]` via
  * [[DeltaLog.addedSince]] — the log IS the write-ahead queue, so no
  * directory diffing, no reprocessing, and the engine's offset
  * checkpointing gives crash-resume for free (a restarted query resumes
  * from the last committed version). The very first batch reads the full
  * snapshot at the then-latest version. Deletion vectors apply on both
  * paths: a masked row never enters the stream.
  *
  * Commits that REMOVE files (MERGE/DELETE/OPTIMIZE with dataChange)
  * refuse loudly — an append-only feed cannot represent them; pass
  * `.option("skipChangeCommits", "true")` (Delta's option of the same
  * name) to skip such commits whole instead.
  *
  * Scale: per micro-batch work is O(new commits) driver metadata + a
  * distributed scan of only the added files. A 100 TB table with a
  * trickle of appends streams the trickle.
  */
final class DeltaStreamSource(ctx: SQLContext, table: String,
    skipChangeCommits: Boolean) extends Source {

  private val spark = ctx.sparkSession
  require(DeltaLog.isDeltaTable(spark, table),
    s"graft-delta stream source: not a Delta table: $table")

  override val schema: StructType = DeltaStreamSource.schemaOf(ctx, table)

  private def toVersion(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().trim.toLong
  }

  override def getOffset: Option[OffsetV1] =
    DeltaLog.latestVersion(spark, table).map(LongOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val to = toVersion(end)
    val df = start.map(toVersion) match {
      // first batch: the full snapshot at the stream's starting version
      case None => DeltaLog.read(spark, table, Some(to))
      case Some(from) if from >= to =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(from) => DeltaLog.addedSince(spark, table, from, to, skipChangeCommits)
    }
    // normalize to the declared column order (a partitioned read
    // surfaces partition columns last); the engine asserts getBatch
    // frames are MARKED streaming, hence the shim
    org.apache.spark.sql.GraftSqlShim.asStreaming(
      df.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def stop(): Unit = ()

  override def toString: String = s"DeltaStreamSource[$table]"
}

object DeltaStreamSource {
  private[streaming] def schemaOf(ctx: SQLContext, table: String): StructType =
    DeltaLog.snapshot(ctx.sparkSession, table).schema.getOrElse(
      throw new IllegalArgumentException(
        s"graft-delta stream source: table $table declares no schema"))
}

/** `format("graft-delta")` registration (DSv1 streaming source — the
  * same integration layer Delta Lake's own streaming source uses). */
final class DeltaStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta stream source needs a table path: .load(\"/path/to/table\")"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft-delta", schema.getOrElse(DeltaStreamSource.schemaOf(ctx, tableOf(parameters))))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaStreamSource(ctx, tableOf(parameters),
      parameters.get("skipChangeCommits").exists(_.equalsIgnoreCase("true")))
}
