package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** VACUUM LITE ([[graft.sources.DeltaLog.vacuumLite]]): reclamation
  * driven by the log's own `remove` actions — no recursive table
  * listing — with the full vacuum's safety invariants: live paths
  * survive, external (clone-source) references are untouchable, and
  * unlogged orphans are out of scope by contract. */
class VacuumLiteSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-vlite-").toString + "/t"

  private def df(lo: Long, n: Long) =
    spark.range(lo, lo + n).select(col("id").as("k"))

  private def fsOf(t: String) = new org.apache.hadoop.fs.Path(t)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("reclaims overwritten files from remove actions; live files stay") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 100).coalesce(2), t)
    val old = DeltaLog.snapshot(spark, t).files
    DeltaLog.write(spark, df(100, 100).coalesce(2), t) // overwrite: removes old
    val live = DeltaLog.snapshot(spark, t).files
    // dry run counts without deleting
    val dry = DeltaLog.vacuumLite(spark, t, retainMillis = 0L, dryRun = true)
    assert(dry == old.size)
    assert(old.forall(p => fsOf(t).exists(new org.apache.hadoop.fs.Path(t, p))))
    val n = DeltaLog.vacuumLite(spark, t, retainMillis = 0L)
    assert(n == old.size, s"expected ${old.size} reclaimed, got $n")
    old.foreach(p => assert(!fsOf(t).exists(new org.apache.hadoop.fs.Path(t, p))))
    live.foreach(p => assert(fsOf(t).exists(new org.apache.hadoop.fs.Path(t, p))))
    assert(DeltaLog.read(spark, t).count() == 100L)
    // idempotent: nothing left to reclaim
    assert(DeltaLog.vacuumLite(spark, t, retainMillis = 0L) == 0)
  }

  test("a removed-then-re-added path (RESTORE) survives") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 50).coalesce(1), t)
    DeltaLog.write(spark, df(50, 50).coalesce(1), t) // v1 overwrite
    DeltaLog.restore(spark, t, 0L) // v2: re-adds v0's file, removes v1's
    val n = DeltaLog.vacuumLite(spark, t, retainMillis = 0L)
    // v1's file reclaimed; v0's file was removed at v1 but re-added at
    // v2 — live in the kept snapshot, must survive
    assert(n == 1, s"got $n")
    assert(DeltaLog.read(spark, t).as[Long].collect().sorted.toSeq ==
      (0L until 50L))
  }

  test("the retention age guard holds back young removes") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 10).coalesce(1), t)
    DeltaLog.write(spark, df(10, 10).coalesce(1), t)
    // default retention (7 days): the just-removed file is too young
    assert(DeltaLog.vacuumLite(spark, t) == 0)
  }

  test("unlogged orphans are out of scope (the documented LITE contract)") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 10).coalesce(1), t)
    val orphan = new org.apache.hadoop.fs.Path(t, "orphan-crash-leftover.parquet")
    val o = fsOf(t).create(orphan, false); o.write(Array[Byte](1, 2)); o.close()
    DeltaLog.write(spark, df(10, 10).coalesce(1), t) // overwrite
    val n = DeltaLog.vacuumLite(spark, t, retainMillis = 0L)
    assert(n == 1, "only the logged remove is reclaimable")
    assert(fsOf(t).exists(orphan), "orphans are full-VACUUM territory")
    // the full vacuum gets it
    assert(DeltaLog.vacuum(spark, t, retainMillis = 0L) >= 1)
    assert(!fsOf(t).exists(orphan))
  }

  test("clone-source files are never deleted through a clone's log") {
    val src = fresh(); val clone = fresh()
    DeltaLog.write(spark, df(0, 40).coalesce(1), src)
    DeltaLog.cloneShallow(spark, src, clone)
    // clone-local DML: copy-on-write removes the ABSOLUTE source ref
    DeltaLog.deleteWhere(spark, clone, col("k") < 100L)
    val n = DeltaLog.vacuumLite(spark, clone, retainMillis = 0L)
    assert(n == 0, "absolute source references must be skipped")
    assert(DeltaLog.read(spark, src).count() == 40L, "source untouched")
  }

  test("SQL: VACUUM ... LITE [RETAIN n HOURS] [DRY RUN]") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 10).coalesce(1), t)
    DeltaLog.write(spark, df(10, 10).coalesce(1), t)
    val dry = GraftSql.exec(spark, s"VACUUM delta.`$t` LITE RETAIN 0 HOURS DRY RUN")
    assert(dry.columns.toSeq == Seq("files_reclaimable"))
    assert(dry.head.getLong(0) == 1L)
    val run = GraftSql.exec(spark, s"VACUUM delta.`$t` LITE RETAIN 0 HOURS")
    assert(run.columns.toSeq == Seq("files_removed"))
    assert(run.head.getLong(0) == 1L)
    // bare LITE: default retention holds everything back
    DeltaLog.write(spark, df(20, 10).coalesce(1), t)
    assert(GraftSql.exec(spark, s"VACUUM delta.`$t` LITE").head.getLong(0) == 0L)
  }
}
