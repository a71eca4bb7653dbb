package graft

import java.nio.file.Files

import graft.sources.{BloomIndex, DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** Per-file bloom-filter index (`graft.sources.BloomIndex`): point-lookup
  * data skipping where zone maps are blind — a high-cardinality key
  * INTERLEAVED across files makes every file's [min, max] span every
  * probe, so min/max pruning keeps all files; the bloom index must still
  * skip, and must never skip wrong (pruned read ≡ full read + filter).
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-bloom-").toString + "/t"

  /** 4 files, keys striped mod 4 — every file's key range is the whole
    * domain, but each key lives in exactly ONE file. The worst case for
    * zone maps, the best case for blooms. */
  private def stripedTable(): String = {
    val t = freshTable()
    val df = spark.range(0, 4000)
      .select(col("id").as("k"),
        concat(lit("u"), lpad(col("id").cast("string"), 6, "0")).as("u"),
        (col("id") % 4).as("stripe"))
    DeltaLog.write(spark, df.repartition(4, col("stripe")).drop("stripe"), t)
    t
  }

  private def snapOf(t: String) = DeltaLog.snapshot(spark, t)

  test("zone maps cannot prune the striped key; blooms can — and stay exact") {
    val t = stripedTable()
    val total = snapOf(t).files.size
    assert(total >= 2)
    // pre-index: interleaved key defeats min/max
    assert(DeltaLog.pruneFiles(spark, snapOf(t), col("k") === 17L, Some(t))
      .size == total)

    BloomIndex.create(spark, t, Seq("k", "u"), fpp = 0.01, items = 2000L)

    val keptEq = DeltaLog.pruneFiles(spark, snapOf(t), col("k") === 17L, Some(t))
    assert(keptEq.size < total, s"bloom should skip files: kept ${keptEq.size}/$total")
    // soundness: the pruned read equals the full filter, row for row
    val got = DeltaLog.readPruned(spark, t, col("k") === 17L)
      .select("k", "u").collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getString(1))) == Seq((17L, "u000017")))

    // string column probe
    val keptStr = DeltaLog.pruneFiles(spark, snapOf(t),
      col("u") === "u000021", Some(t))
    assert(keptStr.size < total)
    assert(DeltaLog.readPruned(spark, t, col("u") === "u000021")
      .count() == 1L)

    // IN-list: prunes to the union of the listed keys' files
    val keptIn = DeltaLog.pruneFiles(spark, snapOf(t),
      col("k").isin(1L, 2L), Some(t))
    assert(keptIn.size < total || total <= 2)
    assert(DeltaLog.readPruned(spark, t, col("k").isin(1L, 2L)).count() == 2L)

    // absent key: blooms prove absence everywhere (modulo fpp — with
    // fpp=0.01 on 4 files, expect ~0 survivors; allow 1 false positive)
    val keptMiss = DeltaLog.pruneFiles(spark, snapOf(t),
      col("k") === 999999L, Some(t))
    assert(keptMiss.size <= 1, s"absent key kept ${keptMiss.size} files")
    assert(DeltaLog.readPruned(spark, t, col("k") === 999999L).count() == 0L)
  }

  test("no false skips across every key (soundness sweep)") {
    val t = stripedTable()
    BloomIndex.create(spark, t, Seq("k"), fpp = 0.05, items = 2000L)
    // every 97th key: the pruned read must find exactly its one row
    (0L until 4000L by 97L).foreach { k =>
      val n = DeltaLog.readPruned(spark, t, col("k") === k).count()
      assert(n == 1L, s"key $k: expected 1 row, got $n")
    }
  }

  test("writers maintain the index: appended files are bloom-skippable") {
    val t = stripedTable()
    BloomIndex.create(spark, t, Seq("k"), fpp = 0.01, items = 2000L)
    // append new keys OUTSIDE the original domain, one file
    val extra = spark.range(100000, 100100)
      .select(col("id").as("k"), concat(lit("x"), col("id")).as("u"))
    DeltaLog.write(spark, extra.coalesce(1), t, "append")
    val total = snapOf(t).files.size
    // the appended file got its bloom from commitWrite (no refresh):
    // probing an ORIGINAL key must skip the appended file too
    val kept = DeltaLog.pruneFiles(spark, snapOf(t), col("k") === 17L, Some(t))
    assert(kept.size < total)
    assert(DeltaLog.readPruned(spark, t, col("k") === 100050L).count() == 1L)
    assert(DeltaLog.readPruned(spark, t, col("k") === 17L).count() == 1L)
  }

  test("OPTIMIZE output is auto-indexed; refresh backfills a lost sidecar") {
    val t = stripedTable()
    BloomIndex.create(spark, t, Seq("k"), fpp = 0.01, items = 2000L)
    DeltaLog.optimize(spark, t, targetFiles = 2)
    // compaction routes through commitWrite, which maintains the index:
    // nothing is missing, and the compacted files are probe-able
    assert(BloomIndex.refresh(spark, t) == 0,
      "compaction output should already carry blooms")
    val snap = snapOf(t)
    assert(snap.files.size == 2)
    assert(DeltaLog.pruneFiles(spark, snap, col("k") === 17L, Some(t)).size < 2)
    assert(DeltaLog.readPruned(spark, t, col("k") === 17L).count() == 1L)

    // lose the sidecar entirely: pruning degrades to sound-but-unpruned,
    // refresh rebuilds it from the snapshot
    val p = BloomIndex.indexPath(t)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    assert(DeltaLog.pruneFiles(spark, snapOf(t), col("k") === 17L, Some(t))
      .size == 2)
    assert(DeltaLog.readPruned(spark, t, col("k") === 17L).count() == 1L)
    assert(BloomIndex.refresh(spark, t) == 2, "both live files reindexed")
    assert(DeltaLog.pruneFiles(spark, snapOf(t), col("k") === 17L, Some(t))
      .size < 2)
  }

  test("DELETE and UPDATE point operations use the bloom index") {
    val t = stripedTable()
    BloomIndex.create(spark, t, Seq("k"), fpp = 0.01, items = 2000L)
    // deleteWhere routes through pruneEntries(table): only the one
    // file holding k=33 becomes a candidate — observable as exactly one
    // file gaining a deletion vector
    DeltaLog.deleteWhere(spark, t, col("k") === 33L)
    val dvFiles = snapOf(t).allFiles
      .where(col("deletionVector").isNotNull).count()
    assert(dvFiles == 1L, s"expected 1 DV file, got $dvFiles")
    assert(DeltaLog.read(spark, t).where(col("k") === 33L).count() == 0L)
  }

  test("SQL surface: CREATE/DROP BLOOMFILTER INDEX and REORG PURGE") {
    val t = stripedTable()
    val out = GraftSql.exec(spark,
      s"CREATE BLOOMFILTER INDEX ON TABLE delta.`$t` FOR COLUMNS (k) " +
        "OPTIONS ('fpp'='0.02','numItems'='2000')")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("k"))
    val snap = snapOf(t)
    assert(snap.configuration(BloomIndex.ColsProp) == "k")
    assert(DeltaLog.pruneFiles(spark, snap, col("k") === 17L, Some(t))
      .size < snap.files.size)

    // REORG PURGE: after a DV delete, only the DV-carrying file rewrites
    GraftSql.exec(spark, s"DELETE FROM delta.`$t` WHERE k = 17")
    val before = snapOf(t).files.toSet
    GraftSql.exec(spark, s"REORG TABLE delta.`$t` APPLY (PURGE)")
    val after = snapOf(t)
    assert(after.allFiles.where(col("deletionVector").isNotNull).count() == 0L)
    assert((before & after.files.toSet).size == before.size - 1,
      "REORG PURGE must rewrite only the DV-carrying file")
    assert(DeltaLog.read(spark, t).count() == 3999L)

    GraftSql.exec(spark, s"DROP BLOOMFILTER INDEX ON TABLE delta.`$t`")
    assert(!snapOf(t).configuration.contains(BloomIndex.ColsProp))
    val fs = BloomIndex.indexPath(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(BloomIndex.indexPath(t)))
  }

  test("blooms built under INT survive type widening to BIGINT (width-stable hash)") {
    val t = freshTable()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (k INT, u STRING)
         |TBLPROPERTIES ('delta.enableTypeWidening'='true')""".stripMargin)
    // narrow striped files, indexed under INT
    val df = spark.range(0, 300)
      .select(col("id").cast("int").as("k"),
        concat(lit("u"), col("id")).as("u"), (col("id") % 3).as("s"))
    DeltaLog.write(spark, df.repartition(3, col("s")).drop("s"), t, "append")
    BloomIndex.create(spark, t, Seq("k"), fpp = 0.01, items = 1000L)
    // a wider append widens the declared type in place (old files live)
    DeltaLog.write(spark,
      Seq((3_000_000_000L, "wide")).toDF("k", "u").coalesce(1), t, "append")
    val snap = snapOf(t)
    assert(snap.schema.get("k").dataType ==
      org.apache.spark.sql.types.LongType)
    val total = snap.files.size
    // probing an OLD key under the WIDENED declared type: the bound is
    // now long-typed, but the int-built blooms hashed width-stably — the
    // old key's file must survive (soundness) and others must skip
    val kept = DeltaLog.pruneFiles(spark, snap, col("k") === 17L, Some(t))
    assert(kept.size < total, s"kept ${kept.size}/$total")
    assert(DeltaLog.readPruned(spark, t, col("k") === 17L).count() == 1L)
    assert(DeltaLog.readPruned(spark, t, col("k") === 3_000_000_000L)
      .count() == 1L)
  }

  test("create refuses partition columns and non-point-lookup types") {
    val t = freshTable()
    val df = spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 2).cast("double").as("d"), (col("id") % 2).as("p"))
    DeltaLog.write(spark, df, t, partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      BloomIndex.create(spark, t, Seq("p"))
    }
    intercept[IllegalArgumentException] {
      BloomIndex.create(spark, t, Seq("d"))
    }
    intercept[IllegalArgumentException] {
      BloomIndex.create(spark, t, Seq("nope"))
    }
  }
}
