package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._

/** Row-level changelog between Iceberg snapshots
  * ([[graft.sources.IcebergTable.changes]]) — Iceberg's
  * `create_changelog_view`, the dual of Delta CDF: inserts from
  * appends, exact deleted rows from position AND equality deletes,
  * update pre/post pairs from merge-on-read UPDATEs, compactions
  * invisible. */
class IcebergChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-icecdc-").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, String, Int)] =
    df.select("k", "v", "_change_type", "_change_ordinal")
      .as[(Long, String, String, Int)].collect().toSet

  test("changelog: inserts, pos/eq deletes, update pairs — hand-computed") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)               // ord 1
    val s1 = IcebergTable.refSnapshotId(spark, t, "main")
    IcebergTable.writeAppend(spark,
      Seq((3L, "c"), (4L, "d")).toDF("k", "v"), t)               // ord 2
    IcebergTable.deleteWhere(spark, t, col("k") === 2L)          // ord 3
    IcebergTable.updateWhere(spark, t, col("k") === 3L,
      Map("v" -> lit("C2")))                                     // ord 4
    IcebergTable.deleteEquals(spark, t, Seq("C2").toDF("v"))     // ord 5

    assert(rows(IcebergTable.changes(spark, t)) == Set(
      (1L, "a", "insert", 1), (2L, "b", "insert", 1),
      (3L, "c", "insert", 2), (4L, "d", "insert", 2),
      (2L, "b", "delete", 3),
      (3L, "c", "update_preimage", 4), (3L, "C2", "update_postimage", 4),
      // the eq-delete sees the POST-update state (strictly-lower-seq
      // scoping): it removes the updated row version, value C2
      (3L, "C2", "delete", 5)))

    // range form: changes SINCE the first snapshot exclude ordinal-1
    // inserts and renumber from the range start
    assert(rows(IcebergTable.changes(spark, t,
      fromSnapshotExclusive = Some(s1))) == Set(
      (3L, "c", "insert", 1), (4L, "d", "insert", 1),
      (2L, "b", "delete", 2),
      (3L, "c", "update_preimage", 3), (3L, "C2", "update_postimage", 3),
      (3L, "C2", "delete", 4)))

    // final state agrees with replaying the changelog over the range
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (4L, "d")))
  }

  test("changelog: compaction is invisible; empty range is empty") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.writeAppend(spark, Seq((2L, "b")).toDF("k", "v"), t)
    val before = IcebergTable.refSnapshotId(spark, t, "main")
    // REPLACE snapshots (compaction, manifest rewrite) carry no logical
    // change and must not surface
    IcebergTable.rewriteDataFiles(spark, t, smallerThan = Long.MaxValue)
    val got = rows(IcebergTable.changes(spark, t))
    assert(got == Set((1L, "a", "insert", 1), (2L, "b", "insert", 2)), got)
    // a range covering only the compaction is empty
    assert(IcebergTable.changes(spark, t,
      fromSnapshotExclusive = Some(before)).count() == 0L)
    // a non-ancestor range bound refuses loudly
    intercept[Exception] {
      IcebergTable.changes(spark, t, fromSnapshotExclusive = Some(424242L))
    }
  }

  test("SQL: TABLE_CHANGES(iceberg.`p`[, from]) reads the changelog") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t)
    val s1 = IcebergTable.refSnapshotId(spark, t, "main")
    IcebergTable.writeAppend(spark, Seq((2L, "b")).toDF("k", "v"), t)
    val full = graft.sources.GraftSql.exec(spark,
      s"SELECT k, _change_type, _change_ordinal FROM TABLE_CHANGES(iceberg.`$t`)")
      .as[(Long, String, Int)].collect().toSet
    assert(full == Set((1L, "insert", 1), (2L, "insert", 2)), full)
    val since = graft.sources.GraftSql.exec(spark,
      s"SELECT k, _change_type FROM TABLE_CHANGES(iceberg.`$t`, $s1)")
      .as[(Long, String)].collect().toSet
    assert(since == Set((2L, "insert")), since)
  }

  test("changelog: plan width stays O(1) over a 50-commit chain") {
    val t = fresh()
    (1 to 50).foreach(i => IcebergTable.writeAppend(spark,
      Seq((i.toLong, s"v$i")).toDF("k", "v"), t))
    val df = IcebergTable.changes(spark, t)
    // the batched diff reads EVERY ordinal's additions in one chunked
    // scan + a broadcast (path -> ordinal) lookup — a 50-commit range
    // must not build a 50-way union of per-snapshot scans
    val scans = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size <= 2,
      s"changelog over 50 appends must stay ONE batched scan, got ${scans.size}")
    assert(rows(df) ==
      (1 to 50).map(i => (i.toLong, s"v$i", "insert", i)).toSet)
  }

  test("changelog: eq-delete commit with an expired parent fails loudly") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val s1 = IcebergTable.refSnapshotId(spark, t, "main")
    IcebergTable.deleteEquals(spark, t, Seq("a").toDF("v"))
    IcebergTable.expireSnapshots(spark, t,
      olderThanMs = System.currentTimeMillis() + 1000000L, retainLast = 1)
    // the eq-deleted rows can only be reconstructed from the PARENT
    // state; silently dropping the commit would misread as "no changes"
    val e = intercept[Exception] {
      IcebergTable.changes(spark, t, fromSnapshotExclusive = Some(s1)).count()
    }
    assert(e.getMessage.contains("equality deletes"), e.getMessage)
  }

  test("changelog: merge surfaces losers/winners as update pairs") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, 100L, "t1"), (2L, 100L, "t2")).toDF("k", "ver", "v"), t)
    val base = IcebergTable.refSnapshotId(spark, t, "main")
    IcebergTable.mergeUpsert(spark, t,
      Seq((1L, 200L, "s1"), (9L, 10L, "s9")).toDF("k", "ver", "v"),
      Seq("k"), "ver")
    val got = IcebergTable.changes(spark, t, fromSnapshotExclusive = Some(base))
      .select("k", "v", "_change_type").as[(Long, String, String)]
      .collect().toSet
    // the replaced row is the preimage; winners (the update AND the
    // insert — file metadata cannot split them, documented) surface as
    // postimages
    assert(got == Set(
      (1L, "t1", "update_preimage"),
      (1L, "s1", "update_postimage"), (9L, "s9", "update_postimage")), got)
  }
}
