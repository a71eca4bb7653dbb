package graft

import java.io.File
import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Write-path Change Data Feed: tables carrying
  * `delta.enableChangeDataFeed=true` (the property the reference sets on
  * every silver table, /root/reference/pipelines/silver_pipeline.py:95)
  * get row-level change files under `_change_data/` committed as `cdc`
  * actions by DELETE/UPDATE/MERGE, and [[DeltaLog.changesBetween]] reads
  * those files instead of reconstructing from the add/remove diff. Every
  * test cross-checks the cdc-served feed against a twin table WITHOUT
  * the property (the reconstruction path) — the two must agree row for
  * row, so the change files are proven exact, not just present. */
class CdfWriteSpec extends SparkSpec {
  import spark.implicits._

  private val cdfProps = Map("delta.enableChangeDataFeed" -> "true")

  private def freshTable(): String =
    Files.createTempDirectory("graft-cdf-").toString + "/t"

  private def commitText(table: String, v: Long): String =
    new String(Files.readAllBytes(
      new File(table, f"_delta_log/$v%020d.json").toPath), "UTF-8")

  private def feed(table: String, from: Long, to: Long): Set[(Long, String, String)] =
    DeltaLog.changesBetween(spark, table, from, to)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private def seed(): DataFrame =
    (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4)

  test("DELETE on a CDF table commits cdc change files; the feed reads them") {
    val cdf = freshTable(); val plain = freshTable()
    DeltaLog.write(spark, seed(), cdf, properties = cdfProps)
    DeltaLog.write(spark, seed(), plain)
    val v1 = DeltaLog.deleteWhere(spark, cdf, col("id") % 10 === 3)
    DeltaLog.deleteWhere(spark, plain, col("id") % 10 === 3)
    assert(v1 == 1L)
    // the commit carries cdc actions pointing under _change_data/
    val txt = commitText(cdf, 1)
    assert(txt.contains("\"cdc\""), txt)
    assert(txt.contains("_change_data/"), txt)
    assert(new File(cdf, "_change_data").isDirectory)
    // CDF is a writer feature: the protocol must declare it
    assert(txt.contains("\"minWriterVersion\":4") ||
      txt.contains("changeDataFeed"), txt)
    // cdc-served feed ≡ reconstruction-served feed, and both are the
    // exact deleted set
    val expected = (0L until 100L).filter(_ % 10 == 3)
      .map(i => (i, s"v$i", "delete")).toSet
    assert(feed(cdf, 0, 1) == expected)
    assert(feed(plain, 0, 1) == expected)
    // reads of the table itself are unaffected
    assert(DeltaLog.read(spark, cdf).count() == 90L)
  }

  test("UPDATE writes update_preimage/postimage pairs; feed folds them exactly") {
    val cdf = freshTable(); val plain = freshTable()
    DeltaLog.write(spark, seed(), cdf, properties = cdfProps)
    DeltaLog.write(spark, seed(), plain)
    DeltaLog.updateWhere(spark, cdf, col("id") % 25 === 0,
      Map("v" -> concat(col("v"), lit("!"))))
    DeltaLog.updateWhere(spark, plain, col("id") % 25 === 0,
      Map("v" -> concat(col("v"), lit("!"))))
    val txt = commitText(cdf, 1)
    assert(txt.contains("\"cdc\""), txt)
    // the change FILES carry the protocol's literal pre/post image types
    val rawTypes = spark.read
      .parquet(new File(cdf, "_change_data").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toIndexedSeq: _*)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSet
    assert(rawTypes == Set("update_preimage", "update_postimage"), rawTypes)
    // only the 4 matched rows appear — carried neighbor rows produce no
    // events even though their files were rewritten; the twin WITHOUT
    // change files reconstructs file-granular (matched pairs plus
    // cancelling carry pairs — exact for folds, strictly noisier)
    val expected = (0L until 100L).filter(_ % 25 == 0).flatMap(i =>
      Seq((i, s"v$i", "delete"), (i, s"v$i!", "insert"))).toSet
    assert(feed(cdf, 0, 1) == expected)
    assert(expected.subsetOf(feed(plain, 0, 1)))
    // the keyed consumer resolves the pairs back to update events
    val pairs = DeltaLog.changesWithUpdates(spark, cdf, 0, 1, Seq("id"))
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pairs == (0L until 100L).filter(_ % 25 == 0).flatMap(i =>
      Seq((i, "update_preimage"), (i, "update_postimage"))).toSet)
  }

  test("MERGE writes only the net row diff as change files") {
    val cdf = freshTable(); val plain = freshTable()
    val base = (0L until 100L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "ts")
      .repartition(4)
    DeltaLog.write(spark, base, cdf, properties = cdfProps)
    DeltaLog.write(spark, base, plain)
    // updates 2 existing keys, inserts 1 new, leaves 1 stale (rejected)
    val src = Seq((5L, "V5", 2L), (17L, "V17", 2L), (200L, "V200", 2L),
      (6L, "stale", 0L)).toDF("id", "v", "ts")
    DeltaLog.mergeUpsert(spark, cdf, src, Seq("id"), "ts")
    DeltaLog.mergeUpsert(spark, plain, src, Seq("id"), "ts")
    val txt = commitText(cdf, 1)
    assert(txt.contains("\"cdc\""), txt)
    // net diff only: the untouched rows of the rewritten files are absent
    val expected = Set(
      (5L, "v5", "delete"), (5L, "V5", "insert"),
      (17L, "v17", "delete"), (17L, "V17", "insert"),
      (200L, "V200", "insert"))
    val got = DeltaLog.changesBetween(spark, cdf, 0, 1)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == expected, got)
    // raw change files: pre/post images, not delete/insert
    val rawTypes = spark.read
      .parquet(new File(cdf, "_change_data").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toIndexedSeq: _*)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSet
    assert(rawTypes == Set("update_preimage", "update_postimage", "insert"))
    // reconstruction twin agrees on the FOLD (it also carries the
    // cancelling carried-row pairs; net effect identical)
    val foldCdf = DeltaLog.read(spark, cdf).collect().map(_.toSeq).toSet
    val foldPlain = DeltaLog.read(spark, plain).collect().map(_.toSeq).toSet
    assert(foldCdf == foldPlain)
  }

  test("partitioned CDF table: partition columns come from the action's partitionValues") {
    val cdf = freshTable()
    val df = (0L until 60L).map(i => (i, s"p${i % 3}", s"v$i")).toDF("id", "part", "v")
    DeltaLog.write(spark, df, cdf, partitionBy = Seq("part"), properties = cdfProps)
    DeltaLog.deleteWhere(spark, cdf, col("id") % 20 === 1)
    val txt = commitText(cdf, 1)
    assert(txt.contains("\"cdc\""), txt)
    assert(txt.contains("\"partitionValues\":{\"part\":"), txt)
    val got = DeltaLog.changesBetween(spark, cdf, 0, 1)
      .select("id", "part", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val expected = (0L until 60L).filter(_ % 20 == 1)
      .map(i => (i, s"p${i % 3}", "delete")).toSet
    assert(got == expected, got)
  }

  test("foreign cdc-only commit: change files are the complete story for that commit") {
    // a foreign CDF writer commits ONLY cdc actions for an update —
    // no add/remove diff is readable (paths may not even exist); the
    // reader must use the change files and ignore nothing else
    val t = freshTable()
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t,
      properties = cdfProps)
    val cdcDir = new File(t, "_change_data"); cdcDir.mkdirs()
    val tmp = Files.createTempDirectory("graft-cdc-foreign-").toString
    Seq((2L, "b", "update_preimage"), (2L, "B", "update_postimage"))
      .toDF("id", "v", "_change_type")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(cdcDir, "cdc-foreign.parquet").toPath)
    val size = new File(cdcDir, "cdc-foreign.parquet").length()
    Files.write(new File(t, f"_delta_log/${1L}%020d.json").toPath,
      (s"""{"cdc":{"path":"_change_data/cdc-foreign.parquet","partitionValues":{},"size":$size,"dataChange":false}}""" +
        "\n" + """{"commitInfo":{"operation":"UPDATE"}}""" + "\n").getBytes("UTF-8"))
    val got = feed(t, 0, 1)
    assert(got == Set((2L, "b", "delete"), (2L, "B", "insert")), got)
  }

  test("vacuum keeps change files referenced by surviving commits") {
    val t = freshTable()
    DeltaLog.write(spark, seed(), t, properties = cdfProps)
    DeltaLog.deleteWhere(spark, t, col("id") < 10)
    assert(DeltaLog.vacuum(spark, t, keepVersions = 1, retainMillis = 0L) >= 0)
    // the cdc files survived an immediate-reclaim vacuum: the commit
    // JSON still references them, so the window is still servable
    val expected = (0L until 10L).map(i => (i, s"v$i", "delete")).toSet
    assert(feed(t, 0, 1) == expected)
  }

  test("duplicate-keyed merge falls back to reconstruction (no cdc action)") {
    val t = freshTable()
    // duplicate target keys: a row diff by key is ill-defined, so the
    // commit must NOT carry change files; the feed reconstructs exactly
    // the duplicates must share the MERGED key so they land in the
    // touched (rewritten) file set — duplicates in untouched files are
    // irrelevant to the diff and rightly don't block change files
    val dup = Seq((2L, "c", 1L), (2L, "d", 1L)).toDF("id", "v", "ts")
      .repartition(1)
    DeltaLog.write(spark, dup, t, properties = cdfProps)
    DeltaLog.mergeUpsert(spark, t,
      Seq((2L, "C", 2L)).toDF("id", "v", "ts"), Seq("id"), "ts")
    assert(!commitText(t, 1).contains("\"cdc\""))
    // reconstruction still serves the window (both duplicate rows were
    // replaced by the source row — two insert events)
    assert(DeltaLog.changesBetween(spark, t, 0, 1)
      .where(col("_change_type") === "insert" && col("id") === 2L && col("v") === "C")
      .count() == 2L)
  }

  test("streaming CDF source serves cdc-backed commits") {
    // the graft-delta readChangeFeed path goes through changesRange →
    // changesBetween, so a cdc-writing table streams its change files
    val t = freshTable()
    DeltaLog.write(spark, seed(), t, properties = cdfProps)
    DeltaLog.deleteWhere(spark, t, col("id") === 42L)
    val changes = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(t)
    val out = graft.streaming.Streams.runToMemory(changes, "cdf_write_stream", "append")
    val got = out.select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set((42L, "v42", "delete", 1L)), got)
  }
}
