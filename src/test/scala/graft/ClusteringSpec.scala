package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** Metadata domains (`domainMetadata` action, writer feature v7) and
  * liquid clustering on top of them: `CREATE TABLE … CLUSTER BY (a,b)`
  * records the `delta.clustering` domain, a bare `OPTIMIZE` clusters by
  * the declared columns (range for one, Morton for two) so zone maps
  * tighten without the caller naming them, `ALTER TABLE … CLUSTER BY`
  * re-declares (or tombstones with NONE), and the domain survives
  * checkpoint + JSON vacuum like every singleton. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-cluster-").toString + "/t"

  test("domain metadata round-trips: set, overwrite, tombstone, checkpoint survival") {
    val t = fresh()
    DeltaLog.write(spark, Seq(1L).toDF("x"), t)
    DeltaLog.setDomainMetadata(spark, t, "app.retention", """{"days":30}""")
    assert(DeltaLog.snapshot(spark, t).domainMetadata("app.retention") ==
      """{"days":30}""")
    // protocol carries the writer feature now
    assert(DeltaLog.snapshot(spark, t).protocolJson.get.contains("domainMetadata"))
    // last writer per domain wins
    DeltaLog.setDomainMetadata(spark, t, "app.retention", """{"days":7}""")
    assert(DeltaLog.snapshot(spark, t).domainMetadata("app.retention") ==
      """{"days":7}""")
    // survives checkpoint + vacuumed JSON tail
    DeltaLog.checkpoint(spark, t)
    val logDir = new java.io.File(t, "_delta_log")
    logDir.listFiles().filter(_.getName.endsWith(".json"))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    assert(DeltaLog.snapshot(spark, t).domainMetadata("app.retention") ==
      """{"days":7}""")
    // tombstone removes it
    DeltaLog.setDomainMetadata(spark, t, "app.retention", "{}", removed = true)
    assert(!DeltaLog.snapshot(spark, t).domainMetadata.contains("app.retention"))
  }

  test("CLUSTER BY declares the clustering domain and a bare OPTIMIZE honors it") {
    val t = fresh()
    GraftSql.exec(spark,
      s"CREATE TABLE delta.`$t` (k BIGINT, v BIGINT) CLUSTER BY (k)")
    val snap0 = DeltaLog.snapshot(spark, t)
    assert(snap0.clusteringColumns == Seq("k"))
    assert(snap0.protocolJson.get.contains("clustering"))
    // interleaved appends: every file spans the whole k range
    (0 until 4).foreach { i =>
      DeltaLog.write(spark,
        (0L until 100L).map(j => (j * 4 + i, j)).toDF("k", "v"), t, mode = "append")
    }
    // bare OPTIMIZE: no columns named — the declared clustering applies,
    // and the rewrite makes zone maps disjoint enough that a point
    // predicate prunes most files
    DeltaLog.optimize(spark, t, targetFiles = 4)
    val snap = DeltaLog.snapshot(spark, t)
    val pruned = DeltaLog.pruneFiles(spark, snap, col("k") === 5L)
    assert(snap.files.size >= 4)
    assert(pruned.size < snap.files.size,
      s"clustered OPTIMIZE should let k=5 prune below ${snap.files.size} files, " +
        s"got ${pruned.size}")
    assert(DeltaLog.read(spark, t).count() == 400L)
  }

  test("incremental clustering: bare OPTIMIZE is O(new files), FULL resets") {
    val t = fresh()
    GraftSql.exec(spark,
      s"CREATE TABLE delta.`$t` (k BIGINT, v BIGINT) CLUSTER BY (k)")
    (0 until 3).foreach { i =>
      DeltaLog.write(spark,
        (0L until 60L).map(j => (j * 3 + i, j)).toDF("k", "v"), t, mode = "append")
    }
    // first bare OPTIMIZE: whole scope (nothing clustered yet), records
    // its own commit as the incremental basis — atomically
    DeltaLog.optimize(spark, t, targetFiles = 2)
    val afterFirst = DeltaLog.snapshot(spark, t)
    assert(afterFirst.clusteringProgress.contains(afterFirst.version),
      afterFirst.clusteringProgress.toString)
    val cube1 = afterFirst.files.toSet

    (0 until 2).foreach { _ =>
      DeltaLog.write(spark,
        (180L until 240L).map(j => (j, j)).toDF("k", "v").coalesce(1),
        t, mode = "append")
    }
    val newFiles = DeltaLog.snapshot(spark, t).files.toSet -- cube1
    assert(newFiles.size == 2, newFiles.toString)

    // second bare OPTIMIZE: INCREMENTAL — the first zcube is untouched
    // (same paths live), only the 2 new files are re-laid-out
    DeltaLog.optimize(spark, t, targetFiles = 2)
    val afterSecond = DeltaLog.snapshot(spark, t)
    assert(cube1.subsetOf(afterSecond.files.toSet),
      s"first zcube was rewritten: ${cube1 -- afterSecond.files.toSet}")
    assert((afterSecond.files.toSet & newFiles).isEmpty,
      "new files were not reclustered")
    assert(afterSecond.clusteringProgress.contains(afterSecond.version))
    assert(DeltaLog.read(spark, t).count() == 300L)

    // nothing new since the basis: OPTIMIZE is a no-op, not an empty commit
    assert(DeltaLog.optimize(spark, t) == afterSecond.version)

    // FULL: whole-table recluster — the accumulated zcubes fold anew
    DeltaLog.optimize(spark, t, targetFiles = 2, full = true)
    val afterFull = DeltaLog.snapshot(spark, t)
    assert((afterFull.files.toSet & cube1).isEmpty,
      "FULL left the old zcube in place")
    assert(afterFull.clusteringProgress.contains(afterFull.version))
    assert(DeltaLog.read(spark, t).count() == 300L)
    // and the layout is still clustered: a point predicate prunes
    val pruned = DeltaLog.pruneFiles(spark, afterFull, col("k") === 5L)
    assert(pruned.size < afterFull.files.size)
    // the SQL spelling parses and runs
    GraftSql.exec(spark, s"OPTIMIZE delta.`$t` FULL")
    assert(DeltaLog.read(spark, t).count() == 300L)
  }

  test("3-column ZORDER: every dimension's zone maps prune, values survive") {
    val t = fresh()
    // 1000 rows over three independent uniform dimensions, written as 4
    // interleaved appends so every file initially spans all three ranges
    val rows = (0L until 1000L).map(i =>
      (i % 10, (i / 10) % 10, (i / 100) % 10, i)).toDF("a", "b", "c", "id")
    (0 until 4).foreach { i =>
      DeltaLog.write(spark, rows.where($"id" % 4 === i), t,
        mode = if (i == 0) "overwrite" else "append")
    }
    DeltaLog.optimize(spark, t, targetFiles = 8, zorderBy = Seq("a", "b", "c"))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.size >= 4, s"want several files, got ${snap.files.size}")
    // the Morton layout must let EVERY dimension prune below the full set
    Seq("a", "b", "c").foreach { d =>
      val pruned = DeltaLog.pruneFiles(spark, snap, col(d) === 3L)
      assert(pruned.size < snap.files.size,
        s"$d=3 should prune below ${snap.files.size} files, got ${pruned.size}")
    }
    // bit-for-bit data fidelity through the rewrite
    assert(DeltaLog.read(spark, t).select("id").as[Long].collect().sorted.toSeq
      == (0L until 1000L))
  }

  test("ALTER TABLE CLUSTER BY re-declares; NONE tombstones; partitioned tables refuse") {
    val t = fresh()
    GraftSql.exec(spark,
      s"CREATE TABLE delta.`$t` (a BIGINT, b BIGINT) CLUSTER BY (a)")
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` CLUSTER BY (a, b)")
    assert(DeltaLog.snapshot(spark, t).clusteringColumns == Seq("a", "b"))
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` CLUSTER BY NONE")
    assert(DeltaLog.snapshot(spark, t).clusteringColumns.isEmpty)

    val p = fresh()
    GraftSql.exec(spark,
      s"CREATE TABLE delta.`$p` (a BIGINT, c STRING) PARTITIONED BY (c)")
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"ALTER TABLE delta.`$p` CLUSTER BY (a)")
    }
    intercept[IllegalArgumentException] {
      DeltaLog.createTable(spark, fresh(),
        org.apache.spark.sql.types.StructType.fromDDL("a BIGINT, c STRING"),
        partitionBy = Seq("c"), clusterBy = Seq("a"))
    }
  }
}
