package graft

import java.io.File
import java.nio.file.Files

import graft.sources.{DeltaLog, Merge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion-vector MERGE: on a `delta.enableDeletionVectors=true`
  * table the clause merge masks fired rows in place and writes ONLY the
  * post-images + inserts — untouched neighbors of a touched file are
  * never rewritten. The decisive scale property, asserted
  * byte-for-byte: pre-merge parquet survives untouched. */
class DvMergeSpec extends SparkSpec {
  import spark.implicits._

  private val dvProps = Map("delta.enableDeletionVectors" -> "true")

  private def fresh(): String =
    Files.createTempDirectory("graft-merge-dv-").toString + "/t"

  private def seed(): DataFrame =
    (0L until 100L).map(i => (i, s"v$i", i % 10)).toDF("id", "v", "grp")
      .repartition(4)

  private def parquetState(table: String): Map[String, (Long, Long)] =
    new File(table).listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap

  test("clause mix masks and appends — no data-file rewrite") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t, properties = dvProps)
    val before = parquetState(t)
    assert(before.size == 4)
    // update grp 3, delete grp 7, insert new ids
    val src = (0L until 100L).filter(i => i % 10 == 3 || i % 10 == 7)
      .map(i => (i, s"u$i")) ++ Seq((200L, "n200"), (201L, "n201"))
    Merge.into(spark, t, src.toDF("id", "sv"), keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.sv")),
        condition = col("t.grp") === 3L)
      .whenMatchedDelete()
      .whenNotMatchedInsert(Map(
        "id" -> col("s.id"), "v" -> col("s.sv"), "grp" -> (col("s.id") % 10)))
      .execute()
    val got = DeltaLog.read(spark, t).as[(Long, String, Long)].collect().toSet
    val want = ((0L until 100L).filterNot(_ % 10 == 7).map(i =>
      (i, if (i % 10 == 3) s"u$i" else s"v$i", i % 10)) ++
      Seq((200L, "n200", 0L), (201L, "n201", 1L))).toSet
    assert(got == want)
    // every pre-merge parquet survives byte-untouched; masks carry the
    // 20 fired pre-images (10 updated + 10 deleted)
    val after = parquetState(t)
    before.foreach { case (name, st) =>
      assert(after.get(name).contains(st), s"$name was rewritten") }
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.fileEntries.flatMap(_.dv).map(_.cardinality).sum == 20L)
    // the appended file(s) carry ONLY the 12 modified/new rows
    val newFiles = (after.keySet -- before.keySet).toSeq
    assert(newFiles.nonEmpty)
    val newRows = spark.read.parquet(
      newFiles.map(n => s"$t/$n"): _*).count()
    assert(newRows == 12L, s"appends carried $newRows rows, want 12")
  }

  test("a file whose every row fires is removed; BY SOURCE runs full-pass") {
    val t = fresh()
    // two single-partition files with disjoint grp content
    DeltaLog.write(spark, (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), t, properties = dvProps)
    DeltaLog.write(spark, (50L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1), t, mode = "append")
    // source holds ids 0..49 → matched-delete kills file 1 whole;
    // BY SOURCE updates the others' v
    Merge.into(spark, t, (0L until 50L).toDF("id"), keys = Seq("id"))
      .whenMatchedDelete()
      .whenNotMatchedBySourceUpdate(Map("v" -> concat(lit("b"), col("t.id"))))
      .execute()
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == (50L until 100L).map(i => (i, s"b$i")).toSet)
    val snap = DeltaLog.snapshot(spark, t)
    // file 1 gone without re-add; file 2 fully masked too (every row
    // updated) — only the post-image file remains
    assert(snap.fileEntries.forall(_.dv.isEmpty), snap.fileEntries.mkString(","))
  }

  test("CDF merge emits exact update pairs, deletes and inserts") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t,
      properties = dvProps + ("delta.enableChangeDataFeed" -> "true"))
    val src = Seq((3L, "u3"), (7L, "u7"), (500L, "n500")).toDF("id", "sv")
    Merge.into(spark, t, src, keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.sv")), condition = col("t.id") === 3L)
      .whenMatchedDelete()
      .whenNotMatchedInsert(Map(
        "id" -> col("s.id"), "v" -> col("s.sv"), "grp" -> lit(99L)))
      .execute()
    val pairs = DeltaLog.changesWithUpdates(spark, t, 0, 1, Seq("id"))
      .select("id", "v", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(pairs == Set(
      (3L, "v3", "update_preimage"), (3L, "u3", "update_postimage"),
      (7L, "v7", "delete"), (500L, "n500", "insert")))
  }

  test("row tracking: unfired rows keep ids; conf escape forces CoW") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t,
      properties = dvProps + ("delta.enableRowTracking" -> "true"))
    val before = DeltaLog.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    Merge.into(spark, t, Seq((5L, "u5")).toDF("id", "sv"), keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.sv")))
      .execute()
    val after = DeltaLog.readWithRowIds(spark, t)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    (0L until 100L).filter(_ != 5L).foreach(i =>
      assert(after(i) == before(i), s"row $i id moved"))
    assert(after(5L) != before(5L), "post-image must be a fresh row")

    // conf escape: copy-on-write REPLACES the touched file in the
    // snapshot (the old parquet stays on disk for vacuum)
    val t2 = fresh()
    DeltaLog.write(spark, seed(), t2, properties = dvProps)
    val preLive = DeltaLog.snapshot(spark, t2).fileEntries.map(_.path).toSet
    spark.conf.set("spark.graft.merge.useDeletionVectors", "false")
    try {
      Merge.into(spark, t2, Seq((5L, "x5")).toDF("id", "sv"), keys = Seq("id"))
        .whenMatchedUpdate(Map("v" -> col("s.sv")))
        .execute()
    } finally spark.conf.unset("spark.graft.merge.useDeletionVectors")
    val postSnap = DeltaLog.snapshot(spark, t2)
    assert(postSnap.fileEntries.forall(_.dv.isEmpty))
    assert((preLive -- postSnap.fileEntries.map(_.path).toSet).size == 1,
      "CoW should replace exactly the touched file")
  }

  test("column-mapped DV merge: logical clauses, physical masks") {
    val t = fresh()
    graft.sources.GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, v STRING)
         |TBLPROPERTIES ('delta.columnMapping.mode'='name',
         |'delta.enableDeletionVectors'='true')""".stripMargin)
    DeltaLog.write(spark, (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(2), t, mode = "append")
    val before = parquetState(t)
    Merge.into(spark, t, Seq((7L, "u7"), (100L, "n100")).toDF("id", "sv"),
      keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.sv")))
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "v" -> col("s.sv")))
      .execute()
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == ((0L until 40L).map(i =>
      (i, if (i == 7L) "u7" else s"v$i")) :+ ((100L, "n100"))).toSet)
    // mask-and-append on the mapped table too: originals byte-untouched
    val after = parquetState(t)
    before.foreach { case (name, st) =>
      assert(after.get(name).contains(st), s"$name was rewritten") }
    assert(DeltaLog.snapshot(spark, t).fileEntries
      .flatMap(_.dv).map(_.cardinality).sum == 1L)
  }

  test("generated columns recompute on DV-merge post-images") {
    val t = fresh()
    graft.sources.GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, v STRING,
         |vlen BIGINT GENERATED ALWAYS AS (length(v)))
         |TBLPROPERTIES ('delta.enableDeletionVectors'='true')""".stripMargin)
    DeltaLog.write(spark, (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      t, mode = "append")
    Merge.into(spark, t, Seq((3L, "longer3")).toDF("id", "sv"), keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.sv")))
      .execute()
    val got = DeltaLog.read(spark, t).as[(Long, String, Long)].collect().toSet
    assert(got.contains((3L, "longer3", 7L)),
      s"generated column must recompute on the post-image: $got")
    assert(got == (0L until 10L).map(i =>
      if (i == 3L) (3L, "longer3", 7L) else (i, s"v$i", s"v$i".length.toLong)).toSet)
  }

  test("schema evolution rides the append side; old files stay untouched") {
    val t = fresh()
    DeltaLog.write(spark, (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(2), t, properties = dvProps)
    val before = parquetState(t)
    // source carries a NEW column `extra`; withSchemaEvolution lands it
    val src = Seq((3L, "u3", "x3"), (50L, "n50", "x50"))
      .toDF("id", "v", "extra")
    Merge.into(spark, t, src, keys = Seq("id"))
      .withSchemaEvolution()
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val got = DeltaLog.read(spark, t)
      .as[(Long, String, Option[String])].collect().toSet
    val want = ((0L until 20L).filter(_ != 3L)
      .map(i => (i, s"v$i", None: Option[String])) ++
      Seq((3L, "u3", Some("x3")), (50L, "n50", Some("x50")))).toSet
    assert(got == want)
    // evolution did NOT rewrite the existing files — the whole point of
    // composing it with the DV path
    val after = parquetState(t)
    before.foreach { case (name, st) =>
      assert(after.get(name).contains(st), s"$name was rewritten") }
    assert(DeltaLog.snapshot(spark, t).fileEntries
      .flatMap(_.dv).map(_.cardinality).sum == 1L)
  }

  test("nondeterministic source still refuses on the DV path") {
    val t = fresh()
    DeltaLog.write(spark, seed(), t, properties = dvProps)
    val dup = Seq((5L, "a"), (5L, "b")).toDF("id", "sv")
    val e = intercept[RuntimeException] {
      Merge.into(spark, t, dup, keys = Seq("id"))
        .whenMatchedUpdate(Map("v" -> col("s.sv")))
        .execute()
    }
    assert(e.getMessage.contains("nondeterministic"))
    // and the table is unchanged
    assert(DeltaLog.snapshot(spark, t).version == 0L)
  }
}
