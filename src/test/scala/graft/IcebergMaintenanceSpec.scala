package graft

import java.nio.file.Files

import graft.sources.{GraftSql, IcebergTable}
import org.apache.spark.sql.functions._

/** The two r11 maintenance verbs: `rewrite_manifests` (metadata
  * consolidation that must preserve per-entry sequence scoping) and
  * `remove_orphan_files` (reachability sweep that must never touch a
  * referenced file or a file inside the grace window). */
class IcebergMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-icemaint-").toString + "/t"

  test("rewriteManifests consolidates per spec and keeps delete seq scoping") {
    val t = fresh()
    // 4 appends = 4 data manifests
    (1 to 4).foreach { i =>
      IcebergTable.writeAppend(spark,
        Seq((i.toLong, s"v$i")).toDF("k", "v"), t)
    }
    // equality-delete k=2, then RE-INSERT k=2: the re-insert sits at a
    // HIGHER sequence than the delete, so it must survive — before and
    // after consolidation
    IcebergTable.deleteEquals(spark, t, Seq(Tuple1(2L)).toDF("k"))
    IcebergTable.writeAppend(spark, Seq((2L, "reborn")).toDF("k", "v"), t)
    val before = IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet
    assert(before == Set((1L, "v1"), (2L, "reborn"), (3L, "v3"), (4L, "v4")),
      before)

    val (mb, ma) = IcebergTable.rewriteManifests(spark, t)
    assert(mb == 5 && ma == 1, (mb, ma)) // 4 appends + 1 re-insert
    // the view is IDENTICAL: entries carried their own sequence
    // numbers, so the eq-delete still scopes to strictly-lower files
    val after = IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet
    assert(after == before, after)
    // one data manifest + the delete manifest remain in the list
    val kinds = IcebergTable.metadataTable(spark, t, "manifests")
      .select("content").as[Int].collect().toSeq
    assert(kinds.count(_ == 0) == 1 && kinds.count(_ != 0) == 1, kinds)
    // idempotent: already consolidated → no new commit
    assert(IcebergTable.rewriteManifests(spark, t) == (1, 1))

    // SQL surface mirrors the API
    val t2 = fresh()
    (1 to 3).foreach(i => IcebergTable.writeAppend(spark,
      Seq((i.toLong, i.toString)).toDF("k", "v"), t2))
    val row = GraftSql.exec(spark, s"REWRITE MANIFESTS iceberg.`$t2`")
      .as[(Int, Int)].collect()(0)
    assert(row == (3, 1), row)
  }

  test("rewriteManifests keeps hidden-partition pruning across specs") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((10L, 1.0), (20L, 2.0)).toDF("k", "amt"), t,
      partition = Seq("k" -> "bucket[8]"))
    IcebergTable.writeAppend(spark,
      Seq((30L, 3.0), (40L, 4.0)).toDF("k", "amt"), t)
    val (mb, ma) = IcebergTable.rewriteManifests(spark, t)
    assert((mb, ma) == (2, 1), (mb, ma))
    // tuples survived consolidation: pruning still engages and the
    // answer is exact
    val got = IcebergTable.readPruned(spark, t, col("k") === 30L)
      .as[(Long, Double)].collect().toSet
    assert(got == Set((30L, 3.0)), got)
    assert(IcebergTable.read(spark, t).count() == 4L)
  }

  test("removeOrphanFiles sweeps unreferenced files, honors the grace window") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val dataDir = new org.apache.hadoop.fs.Path(t, "data")
    def plant(rel: String, mtime: Long): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(dataDir, rel)
      f.mkdirs(p.getParent)
      val o = f.create(p, true)
      try o.write("junk".getBytes) finally o.close()
      f.setTimes(p, mtime, -1)
      p
    }
    val now = System.currentTimeMillis()
    val oldTop = plant("orphan-old.parquet", now - 100000)
    val oldSub = plant("part=9/orphan-sub.parquet", now - 100000)
    val recent = plant("orphan-recent.parquet", now + 100000)

    val removed = IcebergTable.removeOrphanFiles(spark, t,
      olderThanMs = now - 5000)
    assert(removed == 2L, removed)
    assert(!f.exists(oldTop) && !f.exists(oldSub), "old orphans must go")
    assert(f.exists(recent), "grace window must protect recent files")
    // every referenced file untouched
    assert(IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))

    // SQL verb, sweeping the remaining (recent) orphan once it ages past
    // an explicit cutoff in the future
    val n2 = GraftSql.exec(spark,
      s"VACUUM iceberg.`$t` OLDER THAN '2031-01-01 00:00:00'")
      .as[Long].collect()(0)
    assert(n2 == 1L, n2)
    assert(!f.exists(recent))
    assert(IcebergTable.read(spark, t).count() == 2L)
  }

  test("orphan sweep ABORTS when a referenced manifest is unreadable") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    // plant an aged orphan candidate
    val orphan = new org.apache.hadoop.fs.Path(t, "data/orphan.parquet")
    val o = f.create(orphan, true); try o.write("junk".getBytes) finally o.close()
    f.setTimes(orphan, System.currentTimeMillis() - 100000, -1)
    // corrupt the REFERENCED data manifest in place: a transiently
    // unreadable reachable manifest must fail the sweep, not silently
    // shrink the reachable set (which would delete live data as orphans)
    val mp = IcebergTable.metadataTable(spark, t, "manifests")
      .select("path").as[String].collect()(0)
    val c = f.create(new org.apache.hadoop.fs.Path(mp), true)
    try c.write("definitely not avro".getBytes) finally c.close()
    intercept[Exception] {
      IcebergTable.removeOrphanFiles(spark, t,
        olderThanMs = System.currentTimeMillis() + 100000)
    }
    assert(f.exists(orphan),
      "aborted sweep must not have deleted anything")
  }

  test("rewriteManifests preserves entry provenance and v2 sequence metadata") {
    val t = fresh()
    (1 to 3).foreach { i =>
      IcebergTable.writeAppend(spark, Seq((i.toLong, s"v$i")).toDF("k", "v"), t)
    }
    // flip the table to format v2 (delete files are a v2 construct)
    IcebergTable.deleteEquals(spark, t, Seq(Tuple1(3L)).toDF("k"))
    val addedBy = IcebergTable.metadataTable(spark, t, "entries")
      .filter($"content" === 0)
      .select("file_path", "snapshot_id").as[(String, Long)].collect().toMap
    assert(addedBy.values.toSet.size == 3, addedBy) // 3 distinct appends
    val snapsBefore = IcebergTable.metadataTable(spark, t, "snapshots")
      .select("snapshot_id").as[Long].collect().toSet
    def lsn(): Long = {
      val mdir = new java.io.File(t, "metadata")
      val latest = mdir.listFiles().map(_.getName)
        .filter(_.matches("v\\d+\\.metadata\\.json"))
        .maxBy(_.stripPrefix("v").stripSuffix(".metadata.json").toLong)
      val txt = new String(Files.readAllBytes(
        new java.io.File(mdir, latest).toPath), "UTF-8")
      "\"last-sequence-number\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(-1L)
    }
    val lsnBefore = lsn()
    assert(lsnBefore > 0, "v2 table must carry last-sequence-number")
    assert(IcebergTable.rewriteManifests(spark, t)._2 == 1)
    // spec: carried EXISTING entries keep the snapshot that originally
    // ADDED each file — never the rewriting snapshot's id
    val after = IcebergTable.metadataTable(spark, t, "entries")
      .filter($"content" === 0)
      .select("file_path", "snapshot_id").as[(String, Long)].collect().toMap
    assert(after == addedBy, s"entry snapshot_id must be preserved: $after")
    assert(after.values.toSet.subsetOf(snapsBefore))
    // spec: every v2 commit advances last-sequence-number
    assert(lsn() > lsnBefore, s"last-sequence-number must advance: ${lsn()}")
    // and the view is unchanged
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "v1"), (2L, "v2")))
  }
}
