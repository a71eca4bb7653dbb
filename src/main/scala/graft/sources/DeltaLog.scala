package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import scala.collection.mutable

/** Minimal reader for the open Delta Lake table format — the format the
  * reference's tables actually use (`USING DELTA`,
  * /root/reference/databricks_DW/02_create_tables.sql:3-184). Implemented
  * from the public Delta transaction-log protocol: a table is a directory
  * whose `_delta_log/` holds ordered commits `<version%020d>.json`, each a
  * set of newline-delimited JSON actions (`add`, `remove`, `metaData`,
  * `protocol`, `commitInfo`); the live file set at version V is the replay
  * of all commits ≤ V (last action per path wins). Periodic parquet
  * checkpoints (`<v>.checkpoint.parquet` + `_last_checkpoint`) compact the
  * replay so the driver never reads an unbounded JSON tail.
  *
  * Scope: READ interop — enough for this engine to batch-read real
  * lakehouse tables (current or `VERSION AS OF`), including partitioned
  * layouts. Writing stays with [[VersionedTable]]; a full implementation
  * would add protocol/feature gating and deletion vectors.
  *
  * Scale notes: replay touches only log metadata (KBs per commit), never
  * data; with a checkpoint the driver reads one parquet + the JSON suffix,
  * which is exactly how the reference's runtime bounds log replay. The
  * data read itself is a plain multi-file parquet scan — pushdown,
  * pruning, and partition discovery (via `basePath`) all apply.
  */
object DeltaLog {

  /** Live state of the table at one version. */
  case class Snapshot(
      version: Long,
      files: Seq[String],          // paths relative to the table root
      schema: Option[StructType],  // from the latest metaData action
      partitionColumns: Seq[String])

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_delta_log")

  private val commitRe = """(\d{20})\.json""".r
  private val checkpointRe = """(\d{20})\.checkpoint\.parquet""".r

  /** Committed versions present as JSON commits (ascending). */
  def listVersions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val dir = logDir(table)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case commitRe(v) => v.toLong
    }.sorted
  }

  private def readCommit(f: FileSystem, table: String, v: Long): Seq[JsonNode] = {
    val p = new Path(logDir(table), f"$v%020d.json")
    val in = f.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      src.getLines().filter(_.nonEmpty).map(mapper.readTree).toList
    } finally in.close()
  }

  /** `_last_checkpoint` pointer, if the table has one. */
  private def lastCheckpoint(f: FileSystem, table: String): Option[Long] = {
    val p = new Path(logDir(table), "_last_checkpoint")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(mapper.readTree(in).get("version").asLong())
      finally in.close()
    }
  }

  /** Replay the log to the live state at `versionAsOf` (default: latest).
    * Uses the newest parquet checkpoint ≤ target when one exists; falls
    * back to full JSON replay (time travel to before the checkpoint
    * requires the JSON commits to still exist — same rule as Delta). */
  def snapshot(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): Snapshot = {
    val f = fs(spark, table)
    val versions = listVersions(spark, table)
    require(versions.nonEmpty || lastCheckpoint(f, table).nonEmpty,
      s"not a Delta table (no _delta_log commits): $table")
    val target = versionAsOf.getOrElse(
      (versions.lastOption.toSeq ++ lastCheckpoint(f, table).toSeq).max)
    versionAsOf.foreach { v =>
      require(versions.contains(v) || lastCheckpoint(f, table).contains(v),
        s"version $v not present in $table/_delta_log (have ${versions.mkString(",")})")
    }

    val live = mutable.LinkedHashMap.empty[String, Unit]
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty

    // checkpoint base state (only when it does not overshoot the target)
    val cpVersion = lastCheckpoint(f, table).filter(_ <= target)
    cpVersion.foreach { cv =>
      val cpFile = new Path(logDir(table), f"$cv%020d.checkpoint.parquet").toString
      val rows = spark.read.parquet(cpFile)
        .selectExpr("add.path AS add_path", "metaData.schemaString AS ms",
          "metaData.partitionColumns AS pc")
        .collect()
      rows.foreach { r =>
        if (!r.isNullAt(0)) live.put(r.getString(0), ())
        if (!r.isNullAt(1)) {
          schema = Some(DataType.fromJson(r.getString(1)).asInstanceOf[StructType])
          partCols = r.getSeq[String](2)
        }
      }
    }

    val replayFrom = cpVersion.map(_ + 1).getOrElse(0L)
    versions.filter(v => v >= replayFrom && v <= target).foreach { v =>
      readCommit(f, table, v).foreach { action =>
        if (action.has("add")) live.put(action.get("add").get("path").asText(), ())
        else if (action.has("remove")) live.remove(action.get("remove").get("path").asText())
        else if (action.has("metaData")) {
          val m = action.get("metaData")
          schema = Some(DataType.fromJson(m.get("schemaString").asText())
            .asInstanceOf[StructType])
          partCols = if (m.has("partitionColumns")) {
            val it = m.get("partitionColumns").elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().asText()
            b.result()
          } else Seq.empty
        }
      }
    }
    Snapshot(target, live.keys.toSeq, schema, partCols)
  }

  /** Batch-read the table (optionally `VERSION AS OF`). Partition columns
    * surface via directory discovery under `basePath` — the layout every
    * Spark/Databricks Delta writer produces. An empty table reads as an
    * empty frame with the log's declared schema. */
  def read(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, table, versionAsOf)
    if (snap.files.isEmpty) {
      val s = snap.schema.getOrElse(new StructType())
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    } else {
      val abs = snap.files.map(p => new Path(table, p).toString)
      spark.read.option("basePath", table).parquet(abs: _*)
    }
  }
}
