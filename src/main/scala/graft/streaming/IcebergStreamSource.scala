package graft.streaming

import graft.sources.IcebergTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming source over the engine's Iceberg tables — the
  * `dlt.read_stream` shape (/root/reference/pipelines/silver_pipeline.py:107)
  * on the SECOND open format, the dual of [[DeltaStreamSource]] with
  * the row-level changelog ([[IcebergTable.changes]]) as the feed:
  *
  * {{{
  *   spark.readStream.format("graft-iceberg").load("/path/to/table")
  * }}}
  *
  * Offsets ARE snapshot ids (monotone by construction: this writer
  * mints `now*1000+version`), so the commit chain is the write-ahead
  * queue: the very first batch reads the full snapshot at the
  * then-current head (merge-on-read mask applied — a position- or
  * equality-deleted row never enters the stream), and every later
  * micro-batch is exactly `changes(lastCommitted, latest]` — one
  * batched diff pass, O(changed bytes), never a directory listing.
  * Offset checkpointing gives crash-resume for free; a restarted query
  * replays only the uncommitted suffix (the no-reprocess contract,
  * spec-asserted like the Delta source's).
  *
  * Non-append commits (DELETE / UPDATE / MERGE) refuse loudly — an
  * append-only feed cannot represent a retraction; pass
  * `.option("skipChangeCommits", "true")` to skip them whole (only the
  * append commits' inserted rows stream — `replace` compactions are
  * no logical change and always pass silently). A schema-evolving
  * commit fails the stream loudly; a restart picks up the new shape.
  *
  * `.option("startingSnapshot", "latest")` (or an explicit snapshot
  * id) skips the initial snapshot and tails only newer commits — at
  * 100 TB the difference between re-reading the table and tailing the
  * trickle. `.option("maxSnapshotsPerTrigger", n)` bounds a catch-up
  * batch to n commits.
  *
  * Scale: per-trigger planning is one metadata JSON read + a parent
  * walk (driver, O(new commits)); the batch plan is the changelog's
  * single chunked scan of added files. */
final class IcebergStreamSource(ctx: SQLContext, table: String,
    skipChangeCommits: Boolean,
    startingSnapshot: Option[String],
    maxSnapshotsPerTrigger: Option[Int]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val spark = ctx.sparkSession
  require(IcebergTable.isIcebergTable(spark, table),
    s"graft-iceberg stream source: not an Iceberg table: $table")
  maxSnapshotsPerTrigger.foreach(n =>
    require(n > 0, s"maxSnapshotsPerTrigger must be positive, got $n"))

  override val schema: StructType = IcebergStreamSource.schemaOf(ctx, table)

  /** Tail mode: anchor at this snapshot (exclusive) and never emit the
    * initial snapshot. The anchor rides the FIRST checkpointed offset
    * (an empty batch), so restarts pin the same boundary. */
  private val tailAnchor: Option[Long] = startingSnapshot.map { sv =>
    sv.trim.toLowerCase match {
      case "latest" => IcebergTable.headAndSchema(spark, table)._1
      case n => n.toLong
    }
  }
  private def tailMode: Boolean = tailAnchor.isDefined

  private def parse(o: OffsetV1): Long = o match {
    case s: SerializedOffset => s.json.trim.toLong
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong
  }

  /** The last snapshot id this source planned or recovered. */
  private var highWater: Option[Long] = None

  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(IcebergTable.headAndSchema(spark, table)._1)

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.map(o => LongOffset(parse(o))).orNull

  override def getOffset: Option[OffsetV1] = {
    val head = IcebergTable.headAndSchema(spark, table)._1
    val latest = availableNowCap.fold(head)(math.min(head, _))
    val next = highWater match {
      case None => tailAnchor match {
        // tail mode: the first offset IS the anchor (empty batch) so
        // the checkpoint pins the boundary before any data flows
        case Some(a) => a
        case None => latest
      }
      case Some(hw) if hw >= latest => hw
      case Some(hw) =>
        maxSnapshotsPerTrigger match {
          case None => latest
          case Some(cap) =>
            val ids = IcebergTable.chainOps(spark, table, Some(hw), latest)
              .map(_._1)
            if (ids.size <= cap) latest else ids(cap - 1)
        }
    }
    if (!highWater.exists(_ >= next)) highWater = Some(next)
    Some(LongOffset(next))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val e = parse(end)
    if (!highWater.exists(_ >= e)) highWater = Some(e) // restart recovery
    def empty: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val df = start.map(parse) match {
      case None if tailMode =>
        // the anchored first batch is empty by construction
        empty
      case None =>
        // initial snapshot at the first offset — deterministic on
        // restart (the id is in the checkpoint, not re-resolved)
        IcebergTable.read(spark, table, snapshotId = Some(e))
      case Some(s) if s >= e => empty
      case Some(s) =>
        // streaming contract: schema fixed at start, evolution fails
        // loudly (a restart picks up the new shape)
        val nowSchema = IcebergTable.headAndSchema(spark, table)._2
        if (nowSchema.fieldNames.toSeq != schema.fieldNames.toSeq ||
          !nowSchema.fields.zip(schema.fields).forall { case (a, b) =>
            org.apache.spark.sql.types.DataType
              .equalsStructurally(a.dataType, b.dataType, true) })
          throw new IllegalStateException(
            s"graft-iceberg stream on $table: schema changed (stream " +
              s"started with ${schema.simpleString}, table now " +
              s"${nowSchema.simpleString}) — restart the stream to pick " +
              "up the new schema")
        val ops = IcebergTable.chainOps(spark, table, Some(s), e)
        val changing = ops.filter { case (_, op) =>
          op != "append" && op != "replace" }
        if (changing.nonEmpty && !skipChangeCommits)
          throw new UnsupportedOperationException(
            s"graft-iceberg stream on $table: snapshot ${changing.head._1} " +
              s"is a ${changing.head._2} (DELETE/UPDATE/MERGE) — an " +
              "append-only stream cannot represent it. Set " +
              ".option(\"skipChangeCommits\", \"true\") to skip such " +
              "commits whole.")
        // the changelog's batched diff; keeping only `insert` rows skips
        // change commits WHOLE (their rows are delete/update_* typed)
        IcebergTable.changes(spark, table,
          fromSnapshotExclusive = Some(s), toSnapshot = Some(e))
          .where(col("_change_type") === "insert")
          .drop("_change_type", "_change_ordinal")
    }
    // collapse to ONE streaming RDD leaf: the batch plan carries joins
    // (the changelog's path lookup, the merge-on-read delete anti-join)
    // that must execute through the BATCH planner inside the micro-batch
    // job, never re-plan incrementally as stateful stream joins
    org.apache.spark.sql.GraftSqlShim.asStreamingRdd(
      df.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def stop(): Unit = ()

  override def toString: String = s"IcebergStreamSource[$table]"
}

object IcebergStreamSource {
  private[streaming] def schemaOf(ctx: SQLContext, table: String): StructType =
    IcebergTable.headAndSchema(ctx.sparkSession, table)._2
}

/** Change-data-feed mode of the graft-iceberg stream source — the
  * `readChangeFeed` contract on the second format:
  *
  * {{{
  *   spark.readStream.format("graft-iceberg")
  *     .option("readChangeFeed", "true")
  *     .option("startingSnapshot", <id>)   // default: only NEW commits
  *     .load("/path/to/table")
  * }}}
  *
  * Each micro-batch emits the row-level changelog of the commits in
  * `(lastCommitted, latest]` — inserts, exact deleted rows (position
  * AND equality deletes), update pre/post pairs — stamped
  * `_change_type` + `_commit_snapshot_id` (the ordinal→snapshot map is
  * driver metadata, O(commits in batch)). Offsets are snapshot ids;
  * checkpoint recovery replays exactly the uncommitted suffix. Scale:
  * per batch O(changed bytes of its commits) via the one-pass batched
  * changelog diff. */
final class IcebergCdfStreamSource(ctx: SQLContext, table: String,
    startingSnapshot: Option[String],
    maxSnapshotsPerTrigger: Option[Int]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val spark = ctx.sparkSession
  require(IcebergTable.isIcebergTable(spark, table),
    s"graft-iceberg CDF stream source: not an Iceberg table: $table")
  maxSnapshotsPerTrigger.foreach(n =>
    require(n > 0, s"maxSnapshotsPerTrigger must be positive, got $n"))

  private val baseSchema: StructType =
    IcebergTable.headAndSchema(spark, table)._2
  override val schema: StructType =
    IcebergCdfStreamSource.schemaOf(ctx, table)

  /** The anchor (exclusive): the requested snapshot, else the current
    * head — an unanchored CDF stream reads only FUTURE commits, the
    * Delta CDF default. */
  private val initialFrom: Long = startingSnapshot.map(_.trim.toLong)
    .getOrElse(IcebergTable.headAndSchema(spark, table)._1)

  private var highWater: Long = initialFrom
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(IcebergTable.headAndSchema(spark, table)._1)

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.map(o => LongOffset(parseV(o))).orNull

  private def parseV(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  override def getOffset: Option[OffsetV1] = {
    val head = IcebergTable.headAndSchema(spark, table)._1
    val latest = availableNowCap.fold(head)(math.min(head, _))
    val next =
      if (highWater >= latest) highWater
      else maxSnapshotsPerTrigger match {
        case None => latest
        case Some(cap) =>
          val ids = IcebergTable.chainOps(spark, table, Some(highWater), latest)
            .map(_._1)
          if (ids.size <= cap) latest else ids(cap - 1)
      }
    if (next > highWater) highWater = next
    Some(LongOffset(highWater))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    import org.apache.spark.sql.functions.{element_at, lit, map}
    val e = parseV(end)
    if (e > highWater) highWater = e // restart recovery
    val s = start.map(parseV).getOrElse(initialFrom)
    val df =
      if (s >= e)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val nowSchema = IcebergTable.headAndSchema(spark, table)._2
        if (nowSchema.fieldNames.toSeq != baseSchema.fieldNames.toSeq ||
          !nowSchema.fields.zip(baseSchema.fields).forall { case (a, b) =>
            org.apache.spark.sql.types.DataType
              .equalsStructurally(a.dataType, b.dataType, true) })
          throw new IllegalStateException(
            s"graft-iceberg CDF stream on $table: schema changed (stream " +
              s"started with ${baseSchema.simpleString}, table now " +
              s"${nowSchema.simpleString}) — restart the stream to pick " +
              "up the new schema")
        // ordinal -> snapshot id: driver metadata, O(commits in batch)
        val ids = IcebergTable.chainOps(spark, table, Some(s), e).map(_._1)
        val idOf = map(ids.zipWithIndex.flatMap { case (id, i) =>
          Seq(lit(i + 1), lit(id)) }: _*)
        IcebergTable.changes(spark, table,
          fromSnapshotExclusive = Some(s), toSnapshot = Some(e))
          .withColumn("_commit_snapshot_id",
            element_at(idOf, col("_change_ordinal")))
          .drop("_change_ordinal")
      }
    org.apache.spark.sql.GraftSqlShim.asStreamingRdd(
      df.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def stop(): Unit = ()
  override def toString: String = s"IcebergCdfStreamSource[$table]"
}

object IcebergCdfStreamSource {
  private[streaming] def schemaOf(ctx: SQLContext, table: String): StructType =
    StructType(IcebergStreamSource.schemaOf(ctx, table).fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_snapshot_id",
        org.apache.spark.sql.types.LongType)))
}

/** `spark.readStream.format("graft-iceberg").load(path)`. */
final class IcebergStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg stream source needs a table path: .load(\"/path/to/table\")"))

  private def isCdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft-iceberg", schema.getOrElse(
      if (isCdf(parameters))
        IcebergCdfStreamSource.schemaOf(ctx, tableOf(parameters))
      else IcebergStreamSource.schemaOf(ctx, tableOf(parameters))))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    if (isCdf(parameters))
      new IcebergCdfStreamSource(ctx, tableOf(parameters),
        parameters.get("startingSnapshot"),
        parameters.get("maxSnapshotsPerTrigger").map(_.toInt))
    else
      new IcebergStreamSource(ctx, tableOf(parameters),
        parameters.get("skipChangeCommits").exists(_.equalsIgnoreCase("true")),
        parameters.get("startingSnapshot"),
        parameters.get("maxSnapshotsPerTrigger").map(_.toInt))
}
