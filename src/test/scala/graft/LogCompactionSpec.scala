package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** Log-compaction files (`<x>.<y>.compacted.json`, the protocol's minor
  * compaction): one file netting a commit range, substituted for the
  * whole range during snapshot replay — bounded JSON-tail replay
  * BETWEEN checkpoints. On a table committing every few seconds this is
  * what keeps replay O(commits / interval) instead of O(commits since
  * checkpoint), without paying for a full checkpoint each time.
  *
  * The substitution is proven by deleting the covered commit JSONs and
  * reading again: only the compacted file can supply the range. */
class LogCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-logcomp-").toString + "/t"

  private def seed(t: String): Unit = {
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t` (k BIGINT, v STRING)")
    // two rows per commit so a one-row DELETE takes the DV path
    // (a fully-deleted file would tombstone instead)
    (0 until 4).foreach(i => DeltaLog.write(spark,
      Seq((i.toLong, s"v$i"), (i + 10L, s"w$i")).toDF("k", "v")
        .coalesce(1), t, mode = "append"))
  }

  test("snapshot replays through a compacted range identically") {
    val t = fresh(); seed(t)
    val before = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(DeltaLog.compactLog(spark, t, 1, 3))
    // same state through the compacted segment…
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet == before)
    // …and the proof it is actually USED: remove the covered commits;
    // only the compacted file can supply versions 1..3 now
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1L to 3L).foreach(v => f.delete(
      new org.apache.hadoop.fs.Path(t, f"_delta_log/$v%020d.json"), false))
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet == before)
    // a gap NOT covered by any compaction still errors loudly: commit 4
    // goes missing while 5 exists, and the compaction only covers 1..3
    DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append")
    f.delete(new org.apache.hadoop.fs.Path(t, f"_delta_log/${4L}%020d.json"), false)
    val e = intercept[IllegalArgumentException](DeltaLog.read(spark, t).count())
    assert(e.getMessage.contains("non-contiguous"))
  }

  test("netting: removed file tombstones, DV re-adds, metadata last-wins") {
    val t = fresh(); seed(t)
    // v4: metadata change; v5: DELETE via deletion vector (remove+add of
    // the same path); v6: append
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` SET TBLPROPERTIES ('graft.note'='x')")
    DeltaLog.deleteWhere(spark, t, col("k") === 2L)
    DeltaLog.write(spark, Seq((7L, "s")).toDF("k", "v"), t, mode = "append")
    val before = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(before.map(_._1) == Set(0L, 1L, 3L, 7L, 10L, 11L, 12L, 13L))
    assert(DeltaLog.compactLog(spark, t, 0, 6))
    // the compacted file nets to: one metaData (with the property), one
    // protocol, and per-path net adds — the DV'd file appears ONCE, as
    // an add carrying the descriptor
    val lines = scala.io.Source.fromFile(
      s"$t/_delta_log/${"%020d".format(0L)}.${"%020d".format(6L)}.compacted.json")
      .getLines().toSeq
    assert(lines.count(_.contains("\"metaData\"")) == 1)
    assert(lines.exists(l => l.contains("\"metaData\"") && l.contains("graft.note")))
    assert(lines.count(_.contains("\"protocol\"")) == 1)
    assert(!lines.exists(_.contains("\"commitInfo\"")))
    val dvAdds = lines.filter(l =>
      l.contains("\"add\"") && l.contains("\"deletionVector\""))
    assert(dvAdds.size == 1)
    // replay through it alone
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to 6L).foreach(v => f.delete(
      new org.apache.hadoop.fs.Path(t, f"_delta_log/$v%020d.json"), false))
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet == before)
  }

  test("delta.logCompaction.interval auto-writes compaction files") {
    val t = fresh()
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t` (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('delta.logCompaction.interval'='4')")
    (0 until 9).foreach(i => DeltaLog.write(spark,
      Seq((i.toLong, s"v$i")).toDF("k", "v"), t, mode = "append"))
    // commits 0..9 (create + 9 appends): ranges land at (committed+1)%4==0
    val comps = DeltaLog.listCompactions(spark, t)
    assert(comps.contains((0L, 3L)) && comps.contains((4L, 7L)))
    assert(DeltaLog.read(spark, t).count() == 9L)
  }

  test("expired-log cleanup drops compacted files below the checkpoint") {
    val t = fresh(); seed(t)
    assert(DeltaLog.compactLog(spark, t, 0, 2))
    DeltaLog.checkpoint(spark, t)
    assert(DeltaLog.listCompactions(spark, t).nonEmpty)
    DeltaLog.cleanupLog(spark, t, retainMillis = Some(0L))
    assert(DeltaLog.listCompactions(spark, t).isEmpty)
    assert(DeltaLog.read(spark, t).count() == 8L)
  }
}
