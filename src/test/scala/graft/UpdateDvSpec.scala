package graft

import java.io.File
import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion-vector UPDATE (delta-spark's DV DML shape): a table
  * declaring `delta.enableDeletionVectors=true` routes
  * [[DeltaLog.updateWhere]] through mask-and-append — matched rows are
  * masked by growing the touched files' deletion vectors and only the
  * post-image rows are written as new files. The decisive scale
  * property, asserted byte-for-byte below: the touched parquet files
  * are NOT rewritten. */
class UpdateDvSpec extends SparkSpec {
  import spark.implicits._

  private val dvProps = Map("delta.enableDeletionVectors" -> "true")

  private def fresh(): String =
    Files.createTempDirectory("graft-update-dv-").toString + "/t"

  private def seed(): DataFrame =
    (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4)

  private def parquetState(table: String): Map[String, (Long, Long)] =
    new File(table).listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap

  test("UPDATE on a DV table masks and appends — no data-file rewrite") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t, properties = dvProps)
    val before = parquetState(t)
    assert(before.size == 4)
    val v = DeltaLog.updateWhere(spark, t, col("id") % 10 === 3,
      Map("v" -> concat(lit("u"), col("id"))))
    assert(v == 1L)
    // values: exactly the CASE projection
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    val want = (0L until 100L)
      .map(i => (i, if (i % 10 == 3) s"u$i" else s"v$i")).toSet
    assert(got == want)
    // every pre-update parquet file survives BYTE-UNTOUCHED (same
    // length, same mtime) — the whole point of the DV path
    val after = parquetState(t)
    before.foreach { case (name, st) =>
      assert(after.get(name).contains(st), s"$name was rewritten") }
    // the only new parquet carries the 10 post-image rows; the touched
    // entries carry masks totalling the matched cardinality
    val newFiles = (after.keySet -- before.keySet).toSeq
    assert(newFiles.nonEmpty)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.fileEntries.flatMap(_.dv).map(_.cardinality).sum == 10L)
    // updated rows appear exactly once (mask and append agree)
    assert(DeltaLog.read(spark, t).count() == 100L)
  }

  test("an existing mask merges; a fully-masked file is removed") {
    val t = fresh()
    // two files with disjoint id ranges
    DeltaLog.write(spark, (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), t, properties = dvProps)
    DeltaLog.write(spark, (50L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), t, mode = "append")
    // grow a mask on the first file via DELETE, then UPDATE more of it
    DeltaLog.deleteWhere(spark, t, col("id") < 10L)
    DeltaLog.updateWhere(spark, t, col("id") >= 10L && col("id") < 20L,
      Map("v" -> lit("x")))
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    val want = (10L until 100L)
      .map(i => (i, if (i < 20L) "x" else s"v$i")).toSet
    assert(got == want)
    // the first file's mask covers deletes AND updated preimages
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.fileEntries.flatMap(_.dv).map(_.cardinality).max == 20L)
    // now update EVERY remaining live row of that file: it dies — no
    // re-add, no descriptor, just the post-image rows
    DeltaLog.updateWhere(spark, t, col("id") >= 20L && col("id") < 50L,
      Map("v" -> lit("y")))
    val snap2 = DeltaLog.snapshot(spark, t)
    assert(snap2.fileEntries.forall(_.dv.isEmpty),
      snap2.fileEntries.mkString(","))
    val got2 = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    val want2 = (10L until 100L).map { i =>
      (i, if (i < 20L) "x" else if (i < 50L) "y" else s"v$i")
    }.toSet
    assert(got2 == want2)
  }

  test("CDF tables stage exact update pairs through the DV path") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t,
      properties = dvProps + ("delta.enableChangeDataFeed" -> "true"))
    DeltaLog.updateWhere(spark, t, col("id") % 25 === 0,
      Map("v" -> concat(lit("u"), col("id"))))
    // the commit carries cdc actions; the change FILES carry the
    // literal pre/post image types (feed readers never observe the
    // physical mask+append shape)
    val txt = new String(Files.readAllBytes(
      new File(t, f"_delta_log/${1L}%020d.json").toPath), "UTF-8")
    assert(txt.contains("\"cdc\""), txt)
    // changesBetween folds pairs to its two-type contract — EXACTLY
    // the matched rows, no mask/file noise
    val feed = DeltaLog.changesBetween(spark, t, 0, 1)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = (0L until 100L).filter(_ % 25 == 0).flatMap(i =>
      Seq((i, s"v$i", "delete"), (i, s"u$i", "insert"))).toSet
    assert(feed == want)
    // the keyed consumer resolves them back to update events
    val pairs = DeltaLog.changesWithUpdates(spark, t, 0, 1, Seq("id"))
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val wantPairs = (0L until 100L).filter(_ % 25 == 0).flatMap(i =>
      Seq((i, s"v$i", "update_preimage"), (i, s"u$i", "update_postimage"))).toSet
    assert(pairs == wantPairs)
  }

  test("row tracking: survivors keep their ids, post-images get fresh ones") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t,
      properties = dvProps + ("delta.enableRowTracking" -> "true"))
    val before = DeltaLog.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    DeltaLog.updateWhere(spark, t, col("id") % 10 === 7,
      Map("v" -> lit("u")))
    val after = DeltaLog.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(after.size == 100)
    assert(after.values.toSeq.distinct.size == 100, "row ids must stay unique")
    val (moved, kept) = (0L until 100L).partition(_ % 10 == 7)
    kept.foreach(i => assert(after(i) == before(i), s"id of row $i changed"))
    // an updated row is a NEW row: its id comes from above the old mark
    val oldMax = before.values.max
    moved.foreach(i => assert(after(i) > oldMax, s"row $i kept a stale id"))
  }

  test("spark.graft.update.useDeletionVectors=false forces copy-on-write") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t, properties = dvProps)
    spark.conf.set("spark.graft.update.useDeletionVectors", "false")
    try DeltaLog.updateWhere(spark, t, col("id") % 10 === 3,
      Map("v" -> lit("u")))
    finally spark.conf.unset("spark.graft.update.useDeletionVectors")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.fileEntries.forall(_.dv.isEmpty), "CoW must not write masks")
    assert(DeltaLog.read(spark, t).where(col("v") === "u").count() == 10L)
  }
}
