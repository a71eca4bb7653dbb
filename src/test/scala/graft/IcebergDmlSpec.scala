package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._

/** Merge-on-read UPDATE and MERGE on the Iceberg protocol — position
  * deletes + post-image appends in ONE snapshot, no data file
  * rewritten. The MERGE recency guard is single-sourced with the Delta
  * merge through [[graft.operators.Scd2.sourceWins]]; a parity test
  * here asserts the Iceberg result equals `Scd2.mergedFrame` of the
  * same inputs. */
class IcebergDmlSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-icedml-").toString + "/t"

  private def fileState(t: String): Map[String, (Long, Long)] = {
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    f.listStatus(new org.apache.hadoop.fs.Path(t, "data"))
      .filter(_.isFile)
      .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime)).toMap
  }

  test("updateWhere: one snapshot, data files untouched, exact post-image") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
        .toDF("k", "v", "n"), t)
    val before = fileState(t)
    val snapsBefore = IcebergTable.metadataTable(spark, t, "snapshots").count()

    IcebergTable.updateWhere(spark, t, col("n") >= 30,
      Map("v" -> upper(col("v")), "n" -> (col("n") + lit(1))))

    assert(IcebergTable.read(spark, t).as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 10), (2L, "b", 20), (3L, "C", 31), (4L, "D", 41)))
    // atomic: exactly ONE new snapshot carries both the deletes and the
    // post-image
    assert(IcebergTable.metadataTable(spark, t, "snapshots").count() ==
      snapsBefore + 1)
    // merge-on-read: every pre-existing data file byte-identical
    val after = fileState(t)
    before.foreach { case (name, st) =>
      assert(after.get(name).contains(st), s"data file touched: $name")
    }
    // and the new files are upd-*/pos-del-* only
    assert((after.keySet -- before.keySet).forall(n =>
      n.startsWith("upd-") || n.startsWith("pos-del-")), after.keySet -- before.keySet)
    // exact COUNT stays metadata-consistent
    assert(IcebergTable.countRows(spark, t) == 4L)
  }

  test("updateWhere: reads through the delete mask; stacked updates chain") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      (1L to 10L).map(i => (i, s"v$i", i * 10)).toDF("k", "v", "n"), t)
    // position-delete k=5: the later UPDATE must NOT resurrect it
    IcebergTable.deleteWhere(spark, t, col("k") === 5)
    IcebergTable.updateWhere(spark, t, col("n") >= 40,
      Map("v" -> lit("hot")))
    // second UPDATE matches rows living in the FIRST update's post-image
    // files — upd-* slots position-delete like any other file's
    IcebergTable.updateWhere(spark, t, col("v") === "hot" && col("k") <= 6,
      Map("v" -> lit("hot2")))
    val got = IcebergTable.read(spark, t).as[(Long, String, Long)]
      .collect().map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(!got.contains(5L), "deleted row resurrected by UPDATE")
    assert(got(4L) == (("hot2", 40L)) && got(6L) == (("hot2", 60L)), got)
    assert(got(7L) == (("hot", 70L)) && got(10L) == (("hot", 100L)), got)
    assert(got(1L) == (("v1", 10L)), got)
    assert(got.size == 9, got)
  }

  test("updateWhere: post-image outlives an older equality delete") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, 3), (2L, 7), (3L, 7)).toDF("k", "grp"), t)
    // eq-delete grp=3 (suppresses k=1), THEN update k=2 INTO grp=3: the
    // post-image sits at a HIGHER sequence than the equality delete, so
    // the spec's strictly-lower scoping must let it live
    IcebergTable.deleteEquals(spark, t, Seq(Tuple1(3)).toDF("grp"))
    IcebergTable.updateWhere(spark, t, col("k") === 2, Map("grp" -> lit(3)))
    assert(IcebergTable.read(spark, t).as[(Long, Int)].collect().toSet ==
      Set((2L, 3), (3L, 7)))
  }

  test("updateWhere on a hidden-partitioned table: pruned reads stay exact") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      (1L to 20L).map(i => (i, i % 4, s"v$i")).toDF("k", "grp", "v"), t,
      partition = Seq(("grp", "identity")))
    IcebergTable.updateWhere(spark, t, col("grp") === 2L,
      Map("v" -> lit("upd")))
    // post-image files carry no partition tuple — partition pruning must
    // KEEP them (a boundless file never skips), so a pruned read of any
    // slice stays exact
    val pruned = IcebergTable.readPruned(spark, t, col("grp") === 2L)
      .as[(Long, Long, String)].collect().toSet
    assert(pruned == (1L to 20L).filter(_ % 4 == 2)
      .map(i => (i, 2L, "upd")).toSet, pruned)
    val other = IcebergTable.readPruned(spark, t, col("grp") === 1L)
      .as[(Long, Long, String)].collect().toSet
    assert(other == (1L to 20L).filter(_ % 4 == 1)
      .map(i => (i, 1L, s"v$i")).toSet, other)
    assert(IcebergTable.read(spark, t).count() == 20L)
  }

  test("updateWhere: no match means no commit") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t)
    val snaps = IcebergTable.metadataTable(spark, t, "snapshots").count()
    IcebergTable.updateWhere(spark, t, col("k") === 99L, Map("v" -> lit("x")))
    assert(IcebergTable.metadataTable(spark, t, "snapshots").count() == snaps)
  }

  test("mergeUpsert: recency guard, inserts, one snapshot, mergedFrame parity") {
    val t = fresh()
    val target = Seq(
      (1L, 100L, "t1"), (2L, 100L, "t2"), (3L, 100L, "t3"))
      .toDF("k", "ver", "v")
    IcebergTable.writeAppend(spark, target, t)
    val before = fileState(t)
    val snapsBefore = IcebergTable.metadataTable(spark, t, "snapshots").count()
    val source = Seq(
      (1L, 200L, "s1"),  // newer  -> replaces
      (2L, 50L, "s2"),   // STALE  -> must lose, target row untouched
      (9L, 10L, "s9"))   // new key -> insert
      .toDF("k", "ver", "v")

    IcebergTable.mergeUpsert(spark, t, source, Seq("k"), "ver")

    val got = IcebergTable.read(spark, t).as[(Long, Long, String)]
      .collect().toSet
    assert(got == Set(
      (1L, 200L, "s1"), (2L, 100L, "t2"), (3L, 100L, "t3"), (9L, 10L, "s9")),
      got)
    // SINGLE-SOURCED semantics: identical to Scd2.mergedFrame on the
    // same inputs (the Delta merge's core frame)
    val expected = graft.operators.Scd2
      .mergedFrame(target, source, Seq("k"), "ver")
      .as[(Long, Long, String)].collect().toSet
    assert(got == expected, s"diverged from mergedFrame: $got vs $expected")
    // one atomic snapshot; pre-existing data files byte-untouched
    assert(IcebergTable.metadataTable(spark, t, "snapshots").count() ==
      snapsBefore + 1)
    val after = fileState(t)
    before.foreach { case (name, st) =>
      assert(after.get(name).contains(st), s"data file touched: $name")
    }
  }

  test("mergeUpsert: duplicate source keys dedupe newest-wins; ties refuse") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, 100L, "t1"), (2L, 50L, "t2")).toDF("k", "ver", "v"), t)
    // two source rows for k=1 both beat the target: only the NEWEST
    // lands (one post-image against the one position-deleted slot) —
    // the keyed-upsert invariant must hold
    IcebergTable.mergeUpsert(spark, t,
      Seq((1L, 200L, "older"), (1L, 300L, "newest"), (3L, 10L, "ins"))
        .toDF("k", "ver", "v"),
      Seq("k"), "ver")
    assert(IcebergTable.read(spark, t).as[(Long, Long, String)].collect().toSet
      == Set((1L, 300L, "newest"), (2L, 50L, "t2"), (3L, 10L, "ins")))
    // a TIE at max recency with DIFFERENT payloads has no well-defined
    // winner — the protocol's nondeterministic-merge error
    val e = intercept[Exception] {
      IcebergTable.mergeUpsert(spark, t,
        Seq((2L, 99L, "x"), (2L, 99L, "y")).toDF("k", "ver", "v"),
        Seq("k"), "ver")
    }
    assert(e.getMessage.contains("nondeterministic"), e.getMessage)
    // EXACT duplicate rows collapse and merge cleanly
    IcebergTable.mergeUpsert(spark, t,
      Seq((2L, 98L, "z"), (2L, 98L, "z")).toDF("k", "ver", "v"),
      Seq("k"), "ver")
    assert(IcebergTable.read(spark, t).where(col("k") === 2L)
      .as[(Long, Long, String)].collect().toSet == Set((2L, 98L, "z")))
  }

  test("equality-delete round-trip: read mask, changelog row, REORG purge") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c"), (4L, 2, "d"))
        .toDF("k", "grp", "v"), t)
    IcebergTable.deleteEquals(spark, t, Seq(1).toDF("grp"))
    // read: the eq-delete masks grp=1 (strictly-lower-seq scope)
    assert(IcebergTable.read(spark, t).as[(Long, Int, String)]
      .collect().toSet == Set((3L, 2, "c"), (4L, 2, "d")))
    // changelog: the delete commit surfaces EXACTLY the masked rows
    assert(IcebergTable.changes(spark, t)
      .where(col("_change_type") === "delete")
      .as[(Long, Int, String, String, Int)].collect().toSet ==
      Set((1L, 1, "a", "delete", 2), (2L, 1, "b", "delete", 2)))
    // REORG materializes the deletes: no delete manifests remain, the
    // visible rows are unchanged, and metadata-only COUNT(*) works again
    graft.sources.GraftSql.exec(spark, s"REORG TABLE iceberg.`$t` APPLY (PURGE)")
    assert(IcebergTable.metadataTable(spark, t, "files")
      .where(col("content") =!= 0).count() == 0L)
    assert(IcebergTable.read(spark, t).as[(Long, Int, String)]
      .collect().toSet == Set((3L, 2, "c"), (4L, 2, "d")))
    assert(IcebergTable.countRows(spark, t) == 2L)
  }

  test("mergeUpsert: all-stale source is a no-op commit-wise") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, 100L, "t1")).toDF("k", "ver", "v"), t)
    val snaps = IcebergTable.metadataTable(spark, t, "snapshots").count()
    IcebergTable.mergeUpsert(spark, t,
      Seq((1L, 5L, "old")).toDF("k", "ver", "v"), Seq("k"), "ver")
    assert(IcebergTable.metadataTable(spark, t, "snapshots").count() == snaps)
    assert(IcebergTable.read(spark, t).as[(Long, Long, String)]
      .collect().toSet == Set((1L, 100L, "t1")))
  }

  test("SQL verbs: UPDATE iceberg and MERGE INTO iceberg ... ON KEYS") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, 100L, "a"), (2L, 100L, "b")).toDF("k", "ver", "v"), t)
    graft.sources.GraftSql.exec(spark,
      s"UPDATE iceberg.`$t` SET v = upper(v) WHERE k = 1")
    assert(IcebergTable.read(spark, t).as[(Long, Long, String)]
      .collect().toSet == Set((1L, 100L, "A"), (2L, 100L, "b")))
    graft.sources.GraftSql.exec(spark,
      s"""MERGE INTO iceberg.`$t`
         |USING (SELECT 2 AS k, 200 AS ver, 'B2' AS v
         |       UNION ALL SELECT 3, 50, 'c')
         |ON KEYS (k) RECENCY ver""".stripMargin)
    assert(IcebergTable.read(spark, t).as[(Long, Long, String)]
      .collect().toSet ==
      Set((1L, 100L, "A"), (2L, 200L, "B2"), (3L, 50L, "c")))
    // a source that is BALANCED but not ENCLOSED by its outer parens —
    // `(SELECT ..) UNION ALL (SELECT ..)` — must pass through unstripped
    // (a naive first/last-paren strip corrupts it into unparseable SQL)
    graft.sources.GraftSql.exec(spark,
      s"""MERGE INTO iceberg.`$t`
         |USING (SELECT 4 AS k, 10 AS ver, 'd' AS v)
         |       UNION ALL (SELECT 5 AS k, 10 AS ver, 'e' AS v)
         |ON KEYS (k) RECENCY ver""".stripMargin)
    assert(IcebergTable.read(spark, t).where(col("k") >= 4L)
      .as[(Long, Long, String)].collect().toSet ==
      Set((4L, 10L, "d"), (5L, 10L, "e")))
  }

  test("mergeUpsert: repeated merges stack (slots in upd-* files delete)") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, 1L, "a")).toDF("k", "ver", "v"), t)
    (2L to 5L).foreach { i =>
      IcebergTable.mergeUpsert(spark, t,
        Seq((1L, i, s"v$i")).toDF("k", "ver", "v"), Seq("k"), "ver")
    }
    assert(IcebergTable.read(spark, t).as[(Long, Long, String)]
      .collect().toSet == Set((1L, 5L, "v5")))
    assert(IcebergTable.countRows(spark, t) == 1L)
  }
}
