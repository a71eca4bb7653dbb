package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet tables: the engine's stand-in for the transaction-log
  * table format the reference relies on (time travel, history, restore —
  * the `DESCRIBE HISTORY` / `VERSION AS OF` / `RESTORE` surface of
  * /root/reference/utils/optimize_tables.py's target tables).
  *
  * Layout: data for write N lands in `path/d=N/`; the commit is one JSON
  * manifest `path/_graft_log/vN.json` listing the data dirs visible at
  * that version. Readers resolve a manifest, never list data dirs, so:
  *   - writers never disturb readers (data dirs are immutable once
  *     committed; no read-modify-swap of live files);
  *   - `restore` is copy-free — a new manifest referencing old dirs;
  *   - concurrent-reader/single-writer is safe via rename-commit of the
  *     manifest (multi-writer coordination is out of scope and
  *     documented as such — the reference delegates that to its table
  *     format's log, we delegate to the orchestrator).
  *
  * Scale notes: a manifest holds directory names, not file lists — the
  * log grows O(writes), reads are one small-file fetch + a normal
  * parquet multi-dir scan with full predicate/column pushdown. Old dirs
  * are reclaimed by [[vacuum]], retaining every dir any kept version
  * references.
  */
object VersionedTable {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir(path: String) = new Path(path, "_graft_log")
  private def manifest(path: String, v: Int) = new Path(logDir(path), f"v$v%08d.json")

  private case class Commit(version: Int, action: String, dirs: Seq[String])

  private def readManifest(spark: SparkSession, path: String, v: Int): Commit = {
    val in = fs(spark, path).open(manifest(path, v))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // manifests are written by writeManifest below — flat JSON, no nesting
    val action = """"action"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).get.group(1)
    val dirs = """"dirs"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    Commit(v, action, dirs)
  }

  private def writeManifest(spark: SparkSession, path: String, c: Commit): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(logDir(path), s".v${c.version}.tmp")
    val out = f.create(tmp, true)
    val dirs = c.dirs.map(d => "\"" + d + "\"").mkString(",")
    try out.write(
      s"""{"version":${c.version},"action":"${c.action}","dirs":[$dirs]}"""
        .getBytes("UTF-8"))
    finally out.close()
    // rename is the atomic commit point
    require(f.rename(tmp, manifest(path, c.version)),
      s"concurrent writer? could not commit version ${c.version} at $path")
  }

  /** Latest committed version, if the table exists. */
  def latestVersion(spark: SparkSession, path: String): Option[Int] = {
    val f = fs(spark, path)
    if (!f.exists(logDir(path))) None
    else f.listStatus(logDir(path)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.json") => n.drop(1).take(8).toInt }
      .sorted.lastOption
  }

  /** Commit `df` as a new version. `overwrite` replaces the visible
    * contents; `append` adds to the previous version's. Returns the new
    * version number. */
  def write(spark: SparkSession, df: DataFrame, path: String,
      mode: String = "overwrite"): Int = {
    require(mode == "overwrite" || mode == "append", s"unsupported mode $mode")
    val v = latestVersion(spark, path).map(_ + 1).getOrElse(0)
    val dataDir = s"d=$v"
    df.write.mode("errorifexists").parquet(new Path(path, dataDir).toString)
    val dirs = mode match {
      case "overwrite" => Seq(dataDir)
      case "append" =>
        (if (v == 0) Seq.empty else readManifest(spark, path, v - 1).dirs) :+ dataDir
    }
    writeManifest(spark, path, Commit(v, mode, dirs))
    v
  }

  /** Read the table at `version` (`VERSION AS OF`), or latest.
    * `mergeSchema` = schema-evolution reads: appends may add columns;
    * merged reads surface the union schema with nulls for pre-evolution
    * rows. Off by default — merging schemas reads every footer, which a
    * hot path should not pay. */
  def read(spark: SparkSession, path: String, version: Option[Int] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val v = version.orElse(latestVersion(spark, path))
      .getOrElse(sys.error(s"no committed version at $path"))
    val dirs = readManifest(spark, path, v).dirs
      .map(d => new Path(path, d).toString)
    spark.read.option("mergeSchema", mergeSchema.toString).parquet(dirs: _*)
  }

  /** `DESCRIBE HISTORY`: (version, action, n_data_dirs), newest first.
    * Versions reclaimed by [[vacuum]] are absent. */
  def history(spark: SparkSession, path: String): Seq[(Int, String, Int)] = {
    val f = fs(spark, path)
    val latest = latestVersion(spark, path)
      .getOrElse(sys.error(s"no committed version at $path"))
    (latest to 0 by -1)
      .filter(v => f.exists(manifest(path, v)))
      .map { v =>
        val c = readManifest(spark, path, v)
        (c.version, c.action, c.dirs.size)
      }
  }

  /** `RESTORE TABLE ... TO VERSION AS OF v`: commits a new version whose
    * visible contents are exactly version `v`'s — copy-free, history
    * preserved. */
  def restore(spark: SparkSession, path: String, toVersion: Int): Int = {
    val old = readManifest(spark, path, toVersion)
    val v = latestVersion(spark, path).get + 1
    writeManifest(spark, path, Commit(v, s"restore($toVersion)", old.dirs))
    v
  }

  /** `OPTIMIZE`: rewrite the CURRENT contents compacted into
    * `targetFiles` files and commit it as a new version — readers of any
    * version are never disturbed (data dirs are immutable), history is
    * preserved, and the pre-compaction version remains time-travelable
    * until [[vacuum]] reclaims it. This is the versioned analogue of
    * [[graft.maintenance.Maintenance.compact]]'s swap-in-place. */
  def optimize(spark: SparkSession, path: String, targetFiles: Int): Int = {
    val v = latestVersion(spark, path).getOrElse(sys.error(s"no committed version at $path"))
    val compacted = read(spark, path, Some(v)).repartition(targetFiles)
    val newV = v + 1
    val dataDir = s"d=$newV"
    compacted.write.mode("errorifexists").parquet(new Path(path, dataDir).toString)
    writeManifest(spark, path, Commit(newV, "optimize", Seq(dataDir)))
    newV
  }

  /** `table_changes(from, to)` — the change-data-feed surface: the row
    * delta between two committed versions as inserts + deletes (an update
    * appears as delete+insert, keyless tables supported). Bag semantics
    * via exceptAll, so duplicate multiplicities are respected. Cost: one
    * hash-partition shuffle of each side keyed on the full row — at
    * large scale feed it partition-pruned reads, or keep CDC markers in
    * the rows themselves (bronze `cdc_*` columns) and filter instead. */
  def changes(spark: SparkSession, path: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    val before = read(spark, path, Some(fromVersion))
    val after = read(spark, path, Some(toVersion))
    import org.apache.spark.sql.functions.lit
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  /** `VACUUM RETAIN n VERSIONS`: drop manifests older than the newest
    * `keepVersions` and delete data dirs no kept version references. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int): Unit = {
    require(keepVersions >= 1, "must keep at least one version")
    val f = fs(spark, path)
    val latest = latestVersion(spark, path)
      .getOrElse(sys.error(s"no committed version at $path"))
    val cut = math.max(0, latest - keepVersions + 1)
    // a prior vacuum with a smaller retention may have already deleted
    // manifests inside this kept range — skip the gaps like history() does
    val keptDirs = (cut to latest).filter(v => f.exists(manifest(path, v)))
      .flatMap(v => readManifest(spark, path, v).dirs).toSet
    (0 until cut).foreach { v =>
      if (f.exists(manifest(path, v))) {
        readManifest(spark, path, v).dirs
          .filterNot(keptDirs)
          .foreach(d => f.delete(new Path(path, d), true))
        f.delete(manifest(path, v), false)
      }
    }
    // a dropped dir may be shared by several dropped manifests — deletes
    // above are idempotent, so double-deletion is a no-op
    ()
  }
}
