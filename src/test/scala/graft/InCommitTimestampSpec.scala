package graft

import java.io.File
import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** In-commit timestamps (writer feature `inCommitTimestamp`,
  * minWriterVersion 7): with `delta.enableInCommitTimestamps=true`
  * every commit's commitInfo carries a monotonic logical clock, and
  * timestamp time travel resolves against IT — not against file
  * modification times, which backup/restore or object-store migration
  * scramble. */
class InCommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-ict-").toString + "/t"

  private def ictOf(table: String, v: Long): Option[Long] = {
    val txt = Files.readString(
      new File(table, f"_delta_log/$v%020d.json").toPath)
    """"inCommitTimestamp":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
  }

  test("enabled at creation: protocol upgraded, every commit carries a monotonic clock") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, v STRING)
         |TBLPROPERTIES ('delta.enableInCommitTimestamps'='true')""".stripMargin)
    val proto = DeltaLog.snapshot(spark, t).protocolJson.get
    assert(proto.contains("\"minWriterVersion\":7"))
    assert(proto.contains("inCommitTimestamp"))
    DeltaLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t, mode = "append")
    DeltaLog.write(spark, Seq((2L, "b")).toDF("id", "v"), t, mode = "append")
    DeltaLog.deleteWhere(spark, t, col("id") === 1L)
    val clocks = (0L to 3L).map(v => ictOf(t, v).getOrElse(
      fail(s"commit $v carries no inCommitTimestamp")))
    assert(clocks == clocks.sorted && clocks.distinct == clocks,
      s"clocks not strictly monotonic: $clocks")
  }

  test("enabling on a live table stamps provenance and upgrades the protocol") {
    val t = fresh()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t) // v0, feature off
    assert(ictOf(t, 0L).isEmpty)
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` SET TBLPROPERTIES ('delta.enableInCommitTimestamps'='true')")
    // the enablement commit itself carries the first clock
    assert(ictOf(t, 1L).isDefined)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.protocolJson.get.contains("inCommitTimestamp"))
    assert(snap.configuration("delta.inCommitTimestampEnablementVersion") == "1")
    assert(snap.configuration.contains("delta.inCommitTimestampEnablementTimestamp"))
    // later DML carries the clock too
    DeltaLog.updateWhere(spark, t, col("id") === 1L, Map("v" -> lit("z")))
    assert(ictOf(t, 2L).exists(_ > ictOf(t, 1L).get))
  }

  test("timestamp travel resolves against the in-commit clock, not scrambled mtimes") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT)
         |TBLPROPERTIES ('delta.enableInCommitTimestamps'='true')""".stripMargin)
    DeltaLog.write(spark, Seq(1L).toDF("id"), t, mode = "append")   // v1
    DeltaLog.write(spark, Seq(2L).toDF("id"), t, mode = "append")   // v2
    val c1 = ictOf(t, 1L).get
    // scramble the commit files' mtimes into REVERSE order — a restore
    // from backup does exactly this
    (0L to 2L).foreach { v =>
      new File(t, f"_delta_log/$v%020d.json")
        .setLastModified(1700000000000L + (2 - v) * 60000)
    }
    // travel to exactly v1's clock: must land on v1 regardless of mtimes
    assert(DeltaLog.versionAtTimestamp(spark, t, c1) == 1L)
    assert(DeltaLog.readAsOfTimestamp(spark, t, c1)
      .as[Long].collect().toSeq == Seq(1L))
    // history reports the in-commit clock
    val h = DeltaLog.history(spark, t).where(col("version") === 1L)
      .select("timestamp").as[Long].head()
    assert(h == c1)
  }

  test("RESTORE TO TIMESTAMP resolves against the in-commit clock") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT)
         |TBLPROPERTIES ('delta.enableInCommitTimestamps'='true')""".stripMargin)
    DeltaLog.write(spark, Seq(1L).toDF("id"), t, mode = "append")   // v1
    DeltaLog.write(spark, Seq(2L).toDF("id"), t, mode = "append")   // v2
    val c1 = ictOf(t, 1L).get
    val lit = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(c1), java.time.ZoneOffset.UTC)
      .toString.replace("T", " ")
    GraftSql.exec(spark, s"RESTORE TABLE delta.`$t` TO TIMESTAMP AS OF '$lit'")
    assert(DeltaLog.read(spark, t).as[Long].collect().toSeq == Seq(1L))
  }

  test("the clock never regresses, even past a future-stamped foreign commit") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT)
         |TBLPROPERTIES ('delta.enableInCommitTimestamps'='true')""".stripMargin)
    // a foreign writer stamped a commit far in the future
    val future = System.currentTimeMillis() + 9000000L
    Files.write(new File(t, f"_delta_log/${1L}%020d.json").toPath,
      (s"""{"commitInfo":{"timestamp":$future,"inCommitTimestamp":$future,"operation":"WRITE"}}""" +
        "\n").getBytes("UTF-8"))
    DeltaLog.write(spark, Seq(1L).toDF("id"), t, mode = "append")   // v2
    assert(ictOf(t, 2L).contains(future + 1))
  }
}
