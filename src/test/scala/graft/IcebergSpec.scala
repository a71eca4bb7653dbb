package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._

/** Iceberg interop ([[graft.sources.IcebergTable]]): v1 append
  * round-trip, snapshot time travel, metadata-only counts, reader
  * guards (delete manifests refuse), and version-hint-less discovery. */
class IcebergSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-iceberg-").toString + "/t"

  test("append round-trip: two snapshots, time travel, metadata count") {
    val t = fresh()
    val a = spark.range(0, 100)
      .select(col("id").as("k"), (col("id") % 3).cast("int").as("v"),
        concat(lit("row-"), col("id")).as("s"))
    val s1 = IcebergTable.writeAppend(spark, a, t)
    assert(IcebergTable.isIcebergTable(spark, t))
    assert(IcebergTable.read(spark, t).count() == 100L)
    val b = spark.range(100, 150)
      .select(col("id").as("k"), (col("id") % 3).cast("int").as("v"),
        concat(lit("row-"), col("id")).as("s"))
    val s2 = IcebergTable.writeAppend(spark, b, t)
    assert(s2 != s1)
    // current = both appends; the first snapshot still readable
    assert(IcebergTable.read(spark, t).count() == 150L)
    assert(IcebergTable.read(spark, t, snapshotId = Some(s1)).count() == 100L)
    assert(IcebergTable.countRows(spark, t) == 150L)
    // values survive exactly
    val back = IcebergTable.read(spark, t)
      .agg(sum("k"), countDistinct("s")).as[(Long, Long)].head()
    assert(back == ((149L * 150 / 2), 150L), back)
    // schema mismatch refuses
    intercept[IllegalArgumentException] {
      IcebergTable.writeAppend(spark, Seq(1).toDF("other"), t)
    }
  }

  test("timestamp travel via snapshot-log; discovery without version-hint") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq(1L, 2L).toDF("k"), t)
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(10)
    IcebergTable.writeAppend(spark, Seq(3L).toDF("k"), t)
    assert(IcebergTable.read(spark, t, asOfMillis = Some(afterFirst))
      .count() == 2L)
    assert(IcebergTable.read(spark, t).count() == 3L)
    // drop the hint: the reader falls back to the highest v*.metadata.json
    val hint = new org.apache.hadoop.fs.Path(t + "/metadata/version-hint.text")
    hint.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hint, false)
    assert(IcebergTable.read(spark, t).count() == 3L)
  }

  test("CONVERT iceberg -> delta in place: manifests drive the file set, not listing") {
    val t = fresh()
    // two appends; the Iceberg data/ dir will NOT contain dead files,
    // so also leave a stray parquet that a naive lister would pick up
    graft.sources.IcebergTable.writeAppend(spark,
      spark.range(0, 60).select(col("id").as("k")), t)
    graft.sources.IcebergTable.writeAppend(spark,
      spark.range(60, 100).select(col("id").as("k")), t)
    spark.range(9000, 9100).select(col("id").as("k"))
      .coalesce(1).write.parquet(t + "/stray")
    graft.sources.DeltaLog.convertIcebergToDelta(spark, t)
    assert(graft.sources.DeltaLog.isDeltaTable(spark, t))
    // the delta view equals the ICEBERG live set — the stray dir is invisible
    assert(graft.sources.DeltaLog.read(spark, t).count() == 100L)
    // manifest record counts became numRecords stats: metadata-only COUNT works
    assert(graft.sources.DeltaLog.countRows(spark, t) == 100L)
    // the converted table is writable as Delta
    graft.sources.DeltaLog.write(spark, Seq(7777L).toDF("k"), t, "append")
    assert(graft.sources.DeltaLog.read(spark, t).count() == 101L)
  }

  test("mirrorDelta: UniForm shape — Iceberg readers see the Delta state") {
    val t = fresh()
    graft.sources.DeltaLog.write(spark,
      spark.range(0, 80).select(col("id").as("k"), (col("id") * 2).as("v"))
        .repartition(2), t)
    graft.sources.IcebergTable.mirrorDelta(spark, t)
    assert(IcebergTable.read(spark, t).count() == 80L)
    assert(IcebergTable.countRows(spark, t) == 80L)
    assert(IcebergTable.read(spark, t).agg(sum("v")).as[Long].head() == 6320L)
    // delta evolves; a re-mirror catches the iceberg view up
    graft.sources.DeltaLog.write(spark,
      Seq((500L, 0L)).toDF("k", "v"), t, "append")
    assert(IcebergTable.read(spark, t).count() == 80L) // stale until re-mirror
    graft.sources.IcebergTable.mirrorDelta(spark, t)
    assert(IcebergTable.read(spark, t).count() == 81L)
    // DV-carrying tables mirror the mask as a v2 position-delete file:
    // the Iceberg view equals the masked Delta state, with every data
    // file byte-untouched
    graft.sources.DeltaLog.deleteWhere(spark, t, col("k") % 8 === 0L)
    val deltaRows = graft.sources.DeltaLog.read(spark, t)
      .as[(Long, Long)].collect().toSet
    graft.sources.IcebergTable.mirrorDelta(spark, t)
    val iceRows = IcebergTable.read(spark, t).as[(Long, Long)].collect().toSet
    assert(iceRows == deltaRows,
      s"Iceberg view diverged from masked Delta state: ${iceRows.size} vs ${deltaRows.size}")
    assert(IcebergTable.countRows(spark, t) == deltaRows.size.toLong)
  }

  test("MoR position deletes: deleteWhere writes slots, no data file touched") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      (0L until 100L).map(i => (i, s"g${i % 4}")).toDF("k", "grp")
        .repartition(3), t)
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(t + "/data")
    def dataState() = f.listStatus(dataDir)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime)).toMap
    val before = dataState()

    IcebergTable.deleteWhere(spark, t, col("k") % 10 === 0L)
    // every original data file byte-untouched — merge-on-read, not rewrite
    assert(dataState() == before)
    val got = IcebergTable.read(spark, t).select("k").as[Long].collect().toSet
    assert(got == (0L until 100L).filterNot(_ % 10 == 0).toSet)
    // composable: a second predicate's deletes stack
    IcebergTable.deleteWhere(spark, t, col("grp") === "g1")
    val got2 = IcebergTable.read(spark, t).select("k").as[Long].collect().toSet
    assert(got2 == (0L until 100L).filterNot(i => i % 10 == 0 || i % 4 == 1).toSet)
    // countRows falls back to the real count under deletes
    assert(IcebergTable.countRows(spark, t) == got2.size.toLong)
  }

  test("MoR equality deletes scope by sequence number: re-insert survives") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1), t)
    // equality-delete k=2: suppressed in the seq-1 data file
    IcebergTable.deleteEquals(spark, t, Seq(2L).toDF("k"))
    assert(IcebergTable.read(spark, t).select("k").as[Long].collect().toSet ==
      Set(1L, 3L))
    // re-insert k=2 at a HIGHER sequence: the old delete must not eat it
    IcebergTable.writeAppend(spark, Seq((2L, "b2")).toDF("k", "v").coalesce(1), t)
    val got = IcebergTable.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "c"), (2L, "b2")),
      s"re-inserted row must survive the older equality delete: $got")
    // and a NEW delete at a yet-higher sequence suppresses the re-insert
    IcebergTable.deleteEquals(spark, t, Seq(2L).toDF("k"))
    assert(IcebergTable.read(spark, t).select("k").as[Long].collect().toSet ==
      Set(1L, 3L))
  }

  test("SQL surface: SELECT over iceberg refs and MoR DELETE statement") {
    val t = fresh()
    val s1 = IcebergTable.writeAppend(spark,
      (0L until 40L).map(i => (i, i % 4)).toDF("k", "b").coalesce(1), t)
    val sum0 = graft.sources.GraftSql.exec(spark,
      s"SELECT sum(k) AS s FROM iceberg.`$t`").as[Long].head()
    assert(sum0 == (0L until 40L).sum)
    graft.sources.GraftSql.exec(spark,
      s"DELETE FROM iceberg.`$t` WHERE b = 1")
    val got = graft.sources.GraftSql.exec(spark,
      s"SELECT k FROM iceberg.`$t` ORDER BY k").as[Long].collect().toSeq
    assert(got == (0L until 40L).filterNot(_ % 4 == 1))
    // snapshot travel through SQL still sees the pre-delete state
    val all = graft.sources.GraftSql.exec(spark,
      s"SELECT count(*) AS c FROM iceberg.`$t` VERSION AS OF $s1")
      .as[Long].head()
    assert(all == 40L)
  }

  test("expireSnapshots drops old snapshots and reclaims their orphans") {
    val t = fresh()
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    IcebergTable.writeAppend(spark, (0L until 10L).toDF("k").coalesce(1), t)
    IcebergTable.writeAppend(spark, (10L until 20L).toDF("k").coalesce(1), t)
    IcebergTable.deleteWhere(spark, t, col("k") < 3L)
    // materialize = REPLACE snapshot: the three older snapshots' data,
    // delete files, manifests and lists become expire-candidates
    IcebergTable.materializeDeletes(spark, t)
    val dataDir = new org.apache.hadoop.fs.Path(t + "/data")
    val filesBefore = f.listStatus(dataDir).length
    val live = IcebergTable.state(spark, t).dataFiles
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet

    val deleted = IcebergTable.expireSnapshots(spark, t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(deleted > 0L, "expiry reclaimed nothing")
    // exactly the live REPLACE files survive under data/
    val after = f.listStatus(dataDir).map(_.getPath.getName).toSet
    assert(after == live, s"data/ after expiry: $after vs live $live")
    assert(after.size < filesBefore)
    // the view is intact, metadata holds one snapshot, appends continue
    assert(IcebergTable.read(spark, t).as[Long].collect().toSet ==
      (3L until 20L).toSet)
    assert(IcebergTable.state(spark, t).hasDeletes == false)
    IcebergTable.writeAppend(spark, Seq(100L).toDF("k").coalesce(1), t)
    assert(IcebergTable.read(spark, t).count() == 18L)
    // the SQL verb drives the same machinery (retain both remaining
    // snapshots -> reclaims nothing)
    val viaSql = graft.sources.GraftSql.exec(spark,
      s"EXPIRE SNAPSHOTS iceberg.`$t` RETAIN LAST 2").as[Long].head()
    assert(viaSql == 0L)
    assert(IcebergTable.read(spark, t).count() == 18L)
  }

  test("time travel to an expired snapshot fails loudly, not partially") {
    val t = fresh()
    val s1 = IcebergTable.writeAppend(spark, (0L until 5L).toDF("k"), t)
    IcebergTable.writeAppend(spark, (5L until 10L).toDF("k"), t)
    IcebergTable.expireSnapshots(spark, t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    val e = intercept[RuntimeException](
      IcebergTable.read(spark, t, snapshotId = Some(s1)))
    assert(e.getMessage.contains("not in"), e.getMessage)
    assert(IcebergTable.read(spark, t).count() == 10L)
  }

  test("MERGE INTO delta USING an iceberg source") {
    val tgt = fresh(); val src = fresh()
    graft.sources.DeltaLog.write(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), tgt)
    IcebergTable.writeAppend(spark,
      Seq((2L, "B"), (3L, "c")).toDF("k", "v").coalesce(1), src)
    graft.sources.GraftSql.exec(spark,
      s"""MERGE INTO delta.`$tgt` AS t USING iceberg.`$src` AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(graft.sources.DeltaLog.read(spark, tgt)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("CONVERT refuses a table carrying MoR deletes; materialize unblocks it") {
    val t = fresh()
    IcebergTable.writeAppend(spark, (0L until 10L).toDF("k"), t)
    IcebergTable.deleteWhere(spark, t, col("k") === 5L)
    val e = intercept[IllegalArgumentException](
      graft.sources.DeltaLog.convertIcebergToDelta(spark, t))
    assert(e.getMessage.contains("merge-on-read"), e.getMessage)
    // materialize rewrites survivors into a REPLACE snapshot (no delete
    // files left), after which the convert proceeds — driven through
    // the SQL verb the refusal names
    graft.sources.GraftSql.exec(spark,
      s"REORG TABLE iceberg.`$t` APPLY (PURGE)")
    assert(!IcebergTable.state(spark, t).hasDeletes)
    graft.sources.DeltaLog.convertIcebergToDelta(spark, t)
    assert(graft.sources.DeltaLog.read(spark, t)
      .as[Long].collect().toSet == (0L until 10L).toSet - 5L)
  }

  test("racing blind appends both land via bounded rebase") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "base")).toDF("id", "v"), t)
    // the racer fires from INSIDE the victim's commit window (after the
    // victim staged data and numbered its metadata, before it creates
    // vN.metadata.json) — exactly the interleaving a real race occupies.
    // The racer's own append re-enters the hook; guarded out.
    var fired = false
    var inRacer = false
    IcebergTable.raceHook = () =>
      if (!fired && !inRacer) {
        fired = true; inRacer = true
        try IcebergTable.writeAppend(spark,
          Seq((2L, "racer")).toDF("id", "v"), t)
        finally inRacer = false
      }
    try IcebergTable.writeAppend(spark,
      Seq((3L, "victim")).toDF("id", "v"), t)
    finally IcebergTable.raceHook = () => ()
    assert(fired)
    // both commits landed: the victim rebased onto the racer's snapshot
    // instead of failing, and no rows were lost or duplicated
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "racer"), (3L, "victim")))
    // three snapshots in history: base, racer, rebased victim
    assert(IcebergTable.metadataTable(spark, t, "snapshots").count() == 3L)

    // cross-process window: the racer's vN.metadata.json is visible
    // but its version-hint flip has NOT landed yet (the hint write is a
    // separate, later step). The rebase must resolve the racer's state
    // from the LISTING, not the stale hint — otherwise the rebased
    // commit silently drops the racer's snapshot.
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    fired = false
    IcebergTable.raceHook = () =>
      if (!fired && !inRacer) {
        fired = true; inRacer = true
        try {
          IcebergTable.writeAppend(spark,
            Seq((10L, "lagger")).toDF("id", "v"), t)
          // rewind the hint to the pre-racer version
          val hint = new org.apache.hadoop.fs.Path(t, "metadata/version-hint.text")
          val o = f.create(hint, true)
          try o.write("3".getBytes) finally o.close()
        } finally inRacer = false
      }
    try IcebergTable.writeAppend(spark,
      Seq((11L, "victim2")).toDF("id", "v"), t)
    finally IcebergTable.raceHook = () => ()
    assert(fired)
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "racer"), (3L, "victim"),
        (10L, "lagger"), (11L, "victim2")))

    // a REPLACE commit (carried entries) must NOT rebase — its carried
    // selection derives from the snapshot it read, so a racer
    // invalidates it and the conflict surfaces loudly
    fired = false
    IcebergTable.raceHook = () =>
      if (!fired && !inRacer) {
        fired = true; inRacer = true
        try IcebergTable.writeAppend(spark,
          Seq((4L, "racer2")).toDF("id", "v"), t)
        finally inRacer = false
      }
    try intercept[java.io.IOException] {
      IcebergTable.writeAppend(spark,
        Seq((5L, "replace")).toDF("id", "v"), t,
        carryPrevious = false,
        carryFiles = Seq(IcebergTable.CarriedFile(
          "data/nope.parquet", 1L, 1L, None)))
    } finally IcebergTable.raceHook = () => ()
    assert(fired)

    // a LOST rebase attempt must not leak its staged avros under
    // metadata/: every snap-*.avro on disk IS some snapshot's
    // manifest-list (the retry sweep unlinks the lost attempt's
    // manifest + list through the same per-nonce glob, so the snap
    // check covers both)
    val mdir = new java.io.File(t, "metadata")
    val lists = IcebergTable.metadataTable(spark, t, "snapshots")
      .select("manifest_list").as[String].collect()
      .map(p => new java.io.File(p).getName).toSet
    val snapsOnDisk = mdir.listFiles().map(_.getName)
      .filter(n => n.startsWith("snap-") && n.endsWith(".avro")).toSet
    assert(snapsOnDisk.subsetOf(lists),
      s"leaked unreferenced manifest-list avros: ${snapsOnDisk -- lists}")
  }

  test("post-commit failure does not rebase onto own commit (no duplication)") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("id", "v"), t)
    // the hint write fails AFTER v2.metadata.json landed: the retry
    // path sees vN exists, but it is THIS attempt's own commit — it
    // must recognize ownership (per-call nonce) and report success
    // instead of rebasing and re-appending the same staged files
    var fired = false
    IcebergTable.postCommitHook = () =>
      if (!fired) { fired = true
        throw new java.io.IOException("simulated hint-write failure") }
    try IcebergTable.writeAppend(spark, Seq((2L, "b")).toDF("id", "v"), t)
    finally IcebergTable.postCommitHook = () => ()
    assert(fired)
    // exactly one new snapshot, no duplicated rows, readable hint
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(IcebergTable.read(spark, t).count() == 2L)
    assert(IcebergTable.metadataTable(spark, t, "snapshots").count() == 2L)
    // and the table still accepts subsequent appends (hint repaired)
    IcebergTable.writeAppend(spark, Seq((3L, "c")).toDF("id", "v"), t)
    assert(IcebergTable.read(spark, t).count() == 3L)
  }
}
