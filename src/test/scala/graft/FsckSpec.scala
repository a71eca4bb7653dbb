package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** FSCK REPAIR TABLE ([[graft.sources.DeltaLog.fsckRepair]]): entries
  * whose data file — or DV sidecar — vanished out-of-band drop from the
  * log; intact tables are untouched; the repair is itself a commit. */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-fsck-").toString + "/t"

  test("missing data file: DRY RUN lists it, repair commits its removal") {
    val t = freshTable()
    DeltaLog.write(spark, Seq(1L, 2L).toDF("x").coalesce(1), t)
    DeltaLog.write(spark, Seq(3L, 4L).toDF("x").coalesce(1), t, "append")
    assert(DeltaLog.fsckRepair(spark, t, dryRun = true).isEmpty)

    // delete the v1 data file OUT OF BAND (no log involvement)
    val victim = DeltaLog.snapshot(spark, t).fileEntries
      .map(_.path).sorted.last
    new java.io.File(s"$t/$victim").delete()
    intercept[Exception] { DeltaLog.read(spark, t).collect() }

    val dry = DeltaLog.fsckRepair(spark, t, dryRun = true)
    assert(dry == Seq(victim), dry)
    // DRY RUN committed nothing
    assert(DeltaLog.snapshot(spark, t).fileEntries.size == 2)

    val repaired = GraftSql.exec(spark, s"FSCK REPAIR TABLE delta.`$t`")
      .as[String].collect().toSeq
    assert(repaired == Seq(victim), repaired)
    assert(DeltaLog.read(spark, t).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    // the repair is a real commit: visible in history, nothing left to fix
    val ops = DeltaLog.history(spark, t).select("operation")
      .as[String].collect().toSeq
    assert(ops.contains("FSCK"), ops)
    assert(DeltaLog.fsckRepair(spark, t, dryRun = true).isEmpty)
  }

  test("vanished DV sidecar drops the entry too") {
    val t = freshTable()
    DeltaLog.write(spark, (1L to 10L).toDF("x").coalesce(1), t)
    DeltaLog.write(spark, (11L to 20L).toDF("x").coalesce(1), t, "append")
    DeltaLog.deleteWhere(spark, t, col("x") === 5L) // DV on file 1
    assert(DeltaLog.read(spark, t).count() == 19L)
    val sidecars = Option(new java.io.File(t).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("deletion_vector_") &&
        f.getName.endsWith(".bin"))
    assert(sidecars.size == 1, sidecars.map(_.getName))
    sidecars.head.delete()

    val repaired = DeltaLog.fsckRepair(spark, t)
    assert(repaired.size == 1, repaired)
    // the DV-carrying file dropped; the other file's rows survive
    val left = DeltaLog.read(spark, t).as[Long].collect().sorted.toSeq
    assert(left == (11L to 20L) || left == (1L to 10L), left)
  }
}
