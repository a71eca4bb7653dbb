package graft

import java.nio.file.Files

import graft.sources.{IcebergPartition, IcebergTable}
import org.apache.spark.sql.functions._

/** The Iceberg analogue of the Delta 10⁴-file DataSkippingSpec: a
  * synthetic table whose manifests reference 10,000 data files that DO
  * NOT EXIST on disk — so any code path that opens (or even stats) a
  * pruned-away file throws. Proves that at scale (a) COUNT(*) is
  * metadata-only, (b) hidden-partition + bound pruning is decided
  * entirely from the distributed entries frame, and (c) a pruned read
  * opens exactly the surviving files. */
class IcebergScaleSpec extends SparkSpec {
  import spark.implicits._

  test("10k ghost files: metadata count, bucket pruning, bound pruning") {
    val t = Files.createTempDirectory("graft-icescale-").toString + "/t"
    val buckets = 64
    // one REAL file so a pruned read has something to return
    val realKey = 12345L
    val realBucket = IcebergPartition.bucketOf(
      IcebergPartition.hashLong(realKey), buckets)
    IcebergTable.writeAppend(spark,
      Seq((realKey, 7.0)).toDF("k", "amt"),
      t, partition = Seq("k" -> s"bucket[$buckets]"))

    // 5 appends × 2000 ghost entries, every one in a bucket ≠ realBucket
    // and with amt bounds [1000, 2000] — prunable by EITHER dimension
    val emptyDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Seq((realKey, 7.0)).toDF("k", "amt").schema)
    val lo = graft.sources.IcebergBounds.encode(1000.0,
      org.apache.spark.sql.types.DoubleType).get
    val hi = graft.sources.IcebergBounds.encode(2000.0,
      org.apache.spark.sql.types.DoubleType).get
    var n = 0
    (1 to 5).foreach { m =>
      val ghosts = (1 to 2000).map { i =>
        n += 1
        val b = (realBucket + 1 + (n % (buckets - 1))) % buckets
        IcebergTable.CarriedFile(
          s"data/ghost-$m-$i.parquet", records = 100L, bytes = 1L << 20,
          tuple = Some(Seq(b)),
          lower = Map(2 -> lo), upper = Map(2 -> hi))
      }
      IcebergTable.writeAppend(spark, emptyDf, t, carryFiles = ghosts)
    }

    // (a) metadata-only count: 1 real row + 10⁴ × 100 ghost rows, and it
    // cannot have opened anything (the ghosts don't exist)
    assert(IcebergTable.countRows(spark, t) == 1L + 10000L * 100L)

    // (b) bucket pruning: a key-equality read opens only realBucket's
    // files — if even one ghost survived, the scan would throw
    val got = IcebergTable.readPruned(spark, t, col("k") === realKey)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((realKey, 7.0)))

    // (c) bound pruning on the UNPARTITIONED column: amt < 500 rules out
    // every ghost ([1000, 2000] bounds) regardless of bucket
    val gotB = IcebergTable.readPruned(spark, t, col("amt") < 500.0)
      .as[(Long, Double)].collect().toSeq
    assert(gotB == Seq((realKey, 7.0)))

    // the files inspection table streams all 10,001 entries
    assert(IcebergTable.metadataTable(spark, t, "files")
      .where(col("content") === 0).count() == 10001L)

    // manifest consolidation at scale: the 6 per-append manifests
    // stream their 10,001 entries into ONE (a row at a time on the
    // driver via toLocalIterator); no ghost is opened or stat'ed
    val (mBefore, mAfter) = IcebergTable.rewriteManifests(spark, t)
    assert((mBefore, mAfter) == (6, 1), (mBefore, mAfter))
    assert(IcebergTable.countRows(spark, t) == 1L + 10000L * 100L)
    assert(IcebergTable.readPruned(spark, t, col("k") === realKey)
      .as[(Long, Double)].collect().toSeq == Seq((realKey, 7.0)))

    // force the DISTRIBUTED manifest parse (threshold 0 disables the
    // small-metadata driver fast path) — same answers, executor-side
    spark.conf.set("spark.graft.iceberg.driverManifestBytes", "0")
    try {
      assert(IcebergTable.countRows(spark, t) == 1L + 10000L * 100L)
      assert(IcebergTable.readPruned(spark, t, col("k") === realKey)
        .as[(Long, Double)].collect().toSeq == Seq((realKey, 7.0)))

      // (d) MAINTENANCE at scale, still under the forced-distributed
      // parse: rewriteDataFiles selects via the entries frame and
      // STREAMS the 10k carried entries into the new manifest — any
      // code path that opened (or even stat'ed) a carried ghost would
      // throw, and a driver-side file array would defeat the point.
      // 64 KB floor: only the (tiny) real file rewrites; every 1 MB
      // ghost carries.
      val (rewritten, carried) =
        IcebergTable.rewriteDataFiles(spark, t, smallerThan = 64L << 10)
      assert((rewritten, carried) == (1, 10000), (rewritten, carried))
      assert(IcebergTable.countRows(spark, t) == 1L + 10000L * 100L)
      assert(IcebergTable.readPruned(spark, t, col("k") === realKey)
        .as[(Long, Double)].collect().toSeq == Seq((realKey, 7.0)))

      // (e) DISTRIBUTED expiry: dropping every pre-rewrite snapshot
      // walks 10k-entry manifests on executors; the only true orphan
      // is the pre-rewrite real data file (ghosts stay reachable from
      // the kept REPLACE snapshot; exists() on them is false, which
      // must not throw). The kept view is untouched.
      val removed = IcebergTable.expireSnapshots(spark, t,
        olderThanMs = System.currentTimeMillis() + 60000L, retainLast = 1)
      assert(removed >= 1L, s"expiry removed nothing ($removed)")
      assert(IcebergTable.countRows(spark, t) == 1L + 10000L * 100L)
      assert(IcebergTable.readPruned(spark, t, col("k") === realKey)
        .as[(Long, Double)].collect().toSeq == Seq((realKey, 7.0)))
    } finally spark.conf.unset("spark.graft.iceberg.driverManifestBytes")
  }
}
