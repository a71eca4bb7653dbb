package graft

import java.io.File
import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** Stats-based data skipping on the Delta log: every commit records
  * per-file zone maps (numRecords/minValues/maxValues/nullCount, the
  * protocol's `stats` shape), and `readPruned` drops files whose zone
  * maps prove no row can match — the read-side payoff of Z-order
  * clustering, and the difference between scanning a 100 TB table and
  * scanning the handful of files a selective query actually needs.
  * Skipping must be SOUND (pruned read ≡ full read + filter, row for
  * row); completeness is best-effort by design. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-skip-").toString + "/t"

  private def rangeDf(lo: Long, n: Long) =
    spark.range(lo, lo + n).select(col("id").as("x"),
      format_string("s%05d", col("id")).as("s"))

  test("write collects protocol stats; zone maps skip files; results stay exact") {
    val t = freshTable()
    DeltaLog.write(spark, rangeDf(0, 100).coalesce(1), t)
    for (i <- 1 to 3)
      DeltaLog.write(spark, rangeDf(i * 100L, 100).coalesce(1), t, "append")
    val snap = DeltaLog.snapshot(spark, t)
    // stats live in the DISTRIBUTED file state, not on the driver
    val stats = snap.allFiles.select("stats").collect().map(_.getString(0))
    assert(snap.files.size == 4 && stats.length == 4 && stats.forall(_ != null))
    val st = stats.head
    assert(st.contains("numRecords") && st.contains("minValues") &&
      st.contains("maxValues") && st.contains("nullCount"), st)

    def kept(p: org.apache.spark.sql.Column) = DeltaLog.pruneFiles(spark, snap, p).size
    assert(kept(col("x") === 250L) == 1)
    assert(kept(col("x") >= 350L) == 1)
    assert(kept(col("x") < 150L) == 2)
    assert(kept(col("x") === 250L && col("s") === "s00250") == 1)
    assert(kept(col("s") === "s00050") == 1) // string zone maps
    assert(kept(col("x") === -5L) == 0)      // provably empty
    assert(kept(abs(col("x")) === 5L) == 4)  // unsupported shape: no pruning
    assert(kept(col("x").isin(50L, 250L)) == 2)   // IN: union of point probes
    assert(kept(col("x").isin(-1L, 999L)) == 0)
    assert(kept(col("s").startsWith("s001")) == 1) // prefix interval
    assert(kept(col("s").startsWith("t")) == 0)

    // soundness: pruned read == unpruned read + filter, row for row
    val pred = col("x") >= 120L && col("x") < 310L
    val a = DeltaLog.readPruned(spark, t, pred).collect().toSet
    val b = DeltaLog.read(spark, t).where(pred).collect().toSet
    assert(a == b && a.size == 190)
  }

  test("null-count pruning: IS NULL / IS NOT NULL / all-null files") {
    val t = freshTable()
    DeltaLog.write(spark,
      Seq((1L, Option("a")), (2L, Option("b"))).toDF("x", "s").coalesce(1), t)
    DeltaLog.write(spark,
      Seq((3L, Option.empty[String]), (4L, None)).toDF("x", "s").coalesce(1),
      t, "append")
    val snap = DeltaLog.snapshot(spark, t)
    assert(DeltaLog.pruneFiles(spark, snap, col("s").isNull).size == 1)
    assert(DeltaLog.pruneFiles(spark, snap, col("s").isNotNull).size == 1)
    // a comparison can also skip the all-null file (no min/max recorded)
    assert(DeltaLog.pruneFiles(spark, snap, col("s") === "a").size == 1)
    assert(DeltaLog.readPruned(spark, t, col("s").isNull)
      .select("x").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("partition values prune without data stats") {
    val t = freshTable()
    val df = Seq((1L, "en"), (2L, "fr"), (3L, "en"), (4L, "de")).toDF("x", "lang")
    DeltaLog.write(spark, df, t, partitionBy = Seq("lang"))
    val snap = DeltaLog.snapshot(spark, t)
    val kept = DeltaLog.pruneFiles(spark, snap, col("lang") === "en")
    assert(kept.nonEmpty && kept.size < snap.files.size, kept.toString)
    assert(kept.forall(_.contains("lang=en")), kept.toString)
    assert(DeltaLog.readPruned(spark, t, col("lang") === "en")
      .select("x").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("null predicates on a partition column prune soundly (never throw)") {
    // regression: NullCheck used to resolve nullCount fields for partition
    // columns, which the stats struct doesn't carry — AnalysisException at
    // analysis time instead of pruning. And the writer used to record the
    // Hive sentinel STRING for a null partition value, which would make
    // the null-partition file look non-null and IS NULL would skip it.
    val t = freshTable()
    val df = Seq((1L, Option("en")), (2L, Option("fr")), (3L, Option.empty[String]))
      .toDF("x", "lang")
    DeltaLog.write(spark, df, t, partitionBy = Seq("lang"))
    val snap = DeltaLog.snapshot(spark, t)
    // IS NULL: files with a present (non-null) directory value are skipped
    val keptNull = DeltaLog.pruneFiles(spark, snap, col("lang").isNull)
    assert(keptNull.size == 1 && !keptNull.exists(_.contains("lang=en")), keptNull.toString)
    // IS NOT NULL: the null-partition file is provably all-null — skipped
    val keptNotNull = DeltaLog.pruneFiles(spark, snap, col("lang").isNotNull)
    assert(keptNotNull.size == 2 && !keptNotNull.exists(_.contains("HIVE_DEFAULT")),
      keptNotNull.toString)
    // soundness both ways: pruned read ≡ read + filter
    assert(DeltaLog.readPruned(spark, t, col("lang").isNull)
      .select("x").as[Long].collect().toSeq == Seq(3L))
    assert(DeltaLog.readPruned(spark, t, col("lang").isNotNull)
      .select("x").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // equality on the partition column still prunes to one directory
    assert(DeltaLog.pruneFiles(spark, snap, col("lang") === "en").size == 1)
  }

  test("stats survive checkpoint + JSON vacuum") {
    val t = freshTable()
    DeltaLog.write(spark, rangeDf(0, 100).coalesce(1), t)
    DeltaLog.write(spark, rangeDf(100, 100).coalesce(1), t, "append")
    DeltaLog.checkpoint(spark, t)
    new File(t, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).foreach(_.delete())
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.allFiles.where("stats IS NOT NULL").count() == 2)
    assert(DeltaLog.pruneFiles(spark, snap, col("x") === 150L).size == 1)
    assert(DeltaLog.readPruned(spark, t, col("x") === 150L).count() == 1)
  }

  test("10k-file log: snapshot and pruning run distributed, driver collects survivors only") {
    // A synthetic foreign log with 10,000 add actions — the file count
    // where a driver-side file map stops being free. Snapshot file state
    // must stay scan-backed (a FileScan, never a driver-built
    // LocalRelation) and pruning must collect ONLY the surviving paths.
    val t = freshTable()
    val n = 10000
    val schema = new org.apache.spark.sql.types.StructType().add("x", "long")
    val esc = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    def stats(lo: Long, hi: Long) =
      ("{\"numRecords\":10,\"minValues\":{\"x\":" + lo + "},\"maxValues\":{\"x\":" +
        hi + "},\"nullCount\":{\"x\":0}}").replace("\"", "\\\"")
    val actions =
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"manyfiles","format":{"provider":"parquet","options":{}},"schemaString":"$esc","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""") ++
      (0 until n).map { i =>
        val lo = i * 10L
        f"""{"add":{"path":"part-$i%05d.parquet","partitionValues":{},"size":1000,"modificationTime":1700000000000,"dataChange":true,"stats":"${stats(lo, lo + 9)}%s"}}"""
      }
    val logDir = new File(t, "_delta_log"); logDir.mkdirs()
    Files.write(new File(logDir, f"${0L}%020d.json").toPath,
      (actions.mkString("\n") + "\n").getBytes("UTF-8"))

    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.allFiles.count() == n)
    val plan0 = snap.allFiles.queryExecution.executedPlan.toString
    assert(plan0.contains("FileScan json"), plan0)
    // point probe: exactly one of 10,000 files survives, and ONLY that
    // row crosses to the driver (pruneFiles collects the filtered frame)
    assert(DeltaLog.pruneFiles(spark, snap, col("x") === 54321L) ==
      Seq("part-05432.parquet"))
    assert(DeltaLog.pruneFiles(spark, snap,
      col("x").isin(5L, 54321L, 99995L)).size == 3)
    assert(DeltaLog.pruneFiles(spark, snap, col("x") >= n * 10L - 25).size == 3)
    assert(DeltaLog.pruneFiles(spark, snap, col("x") === -1L).isEmpty)

    // checkpoint written FROM the distributed state; after a JSON vacuum
    // the state is a parquet scan and pruning still resolves exactly
    DeltaLog.checkpoint(spark, t)
    logDir.listFiles().filter(_.getName.endsWith(".json")).foreach(_.delete())
    val snap2 = DeltaLog.snapshot(spark, t)
    assert(snap2.allFiles.count() == n)
    val plan2 = snap2.allFiles.queryExecution.executedPlan.toString
    assert(plan2.contains("FileScan parquet"), plan2)
    assert(DeltaLog.pruneFiles(spark, snap2, col("x") === 54321L) ==
      Seq("part-05432.parquet"))
  }

  test("OPTIMIZE ZORDER tightens zone maps so either dimension prunes") {
    val t = freshTable()
    // scatter (a, b) so every pre-optimize file spans both full ranges
    val n = 4096L
    val df = spark.range(n).select(
      (col("id") * 2654435761L % n).as("a"),
      (col("id") * 40503L % n).as("b"))
    DeltaLog.write(spark, df.repartition(4), t)
    val before = DeltaLog.snapshot(spark, t)
    val predA = col("a") < 100L
    val predB = col("b") < 100L
    assert(DeltaLog.pruneFiles(spark, before, predA).size == 4, "scattered: nothing prunes")
    DeltaLog.optimize(spark, t, targetFiles = 8, zorderBy = Seq("a", "b"))
    val after = DeltaLog.snapshot(spark, t)
    assert(after.files.size == 8, after.files.toString)
    assert(DeltaLog.pruneFiles(spark, after, predA).size < 8)
    assert(DeltaLog.pruneFiles(spark, after, predB).size < 8)
    // identical rows; pruned read exact; compaction invisible to CDC
    assert(DeltaLog.readPruned(spark, t, predA).collect().toSet ==
      DeltaLog.read(spark, t).where(predA).collect().toSet)
    assert(DeltaLog.changesBetween(spark, t, before.version, after.version).count() == 0)
  }

  test("footer stats equal the scan-path stats byte-for-byte, and engage") {
    import java.sql.{Date, Timestamp}
    val t1 = Files.createTempDirectory("graft-fstats-").toString + "/a"
    val t2 = Files.createTempDirectory("graft-fstats-").toString + "/b"
    import spark.implicits._
    // every footer-eligible stat class, nulls, unicode, an all-null
    // column (timestamps are INT96 under Spark's default output
    // encoding — no ordered footer stats — and are exercised in the
    // fallback case below)
    val df = Seq(
      (1, 5L, 1.5f, 2.5, "a\u00e9\u20ac", Date.valueOf("1969-07-20"),
        true, Option.empty[String]),
      (-7, -5L, -1.5f, -2.5, "zz", Date.valueOf("2031-01-02"),
        false, Option.empty[String]),
      (3, 0L, 0.0f, 0.0, "m", null, true, Option.empty[String])
    ).toDF("i", "l", "f", "d", "s", "dt", "b", "allnull")
    def statsOf(path: String): Seq[String] = {
      val snap = DeltaLog.snapshot(spark, path)
      snap.allFiles.select("stats").collect().map(_.getString(0)).toSeq.sorted
    }
    val before = DeltaLog.footerStatsCounters
    DeltaLog.write(spark, df.repartition(2, col("i")), t1)
    val after = DeltaLog.footerStatsCounters
    assert(after._1 > before._1,
      s"footer stats did not engage: $before -> $after")
    spark.conf.set("spark.graft.stats.fromFooters", "false")
    try DeltaLog.write(spark, df.repartition(2, col("i")), t2)
    finally spark.conf.unset("spark.graft.stats.fromFooters")
    assert(statsOf(t1) == statsOf(t2),
      s"footer vs scan stats differ:\n${statsOf(t1)}\nvs\n${statsOf(t2)}")
    // pruning still exact on the footer-statted table
    assert(DeltaLog.readPruned(spark, t1, col("l") > 0L)
      .select("l").as[Long].collect().toSeq == Seq(5L))

    // fallback case — the footer path must REFUSE (never emit wrong
    // or partial bounds) and the scan path still owns the stats:
    // a NaN-bearing double (parquet drops the chunk min/max)
    val t3 = Files.createTempDirectory("graft-fstats-").toString + "/c"
    val preNaN = DeltaLog.footerStatsCounters
    DeltaLog.write(spark, Seq(Double.NaN, 1.0, 2.0).toDF("x"), t3)
    assert(DeltaLog.footerStatsCounters._2 > preNaN._2, "NaN must fall back")
    assert(DeltaLog.read(spark, t3).where(col("x") > 1.5).count() == 2L) // NaN > 1.5

    // timestamps: the engine stages its own files as INT64 micros
    // (withMicrosStaging), so the footer path ENGAGES and its stats are
    // byte-identical to the scan path's Instant-ISO rendering
    val t4 = Files.createTempDirectory("graft-fstats-").toString + "/d"
    val t5 = Files.createTempDirectory("graft-fstats-").toString + "/e"
    val tsDf = Seq(
      (1L, Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00.123456Z"))),
      (2L, Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.999999Z"))),
      (3L, null.asInstanceOf[Timestamp])
    ).toDF("k", "ts")
    val preTs = DeltaLog.footerStatsCounters
    DeltaLog.write(spark, tsDf.repartition(2, col("k")), t4)
    assert(DeltaLog.footerStatsCounters._1 > preTs._1,
      "micros-staged timestamps must take the footer path")
    spark.conf.set("spark.graft.stats.fromFooters", "false")
    try DeltaLog.write(spark, tsDf.repartition(2, col("k")), t5)
    finally spark.conf.unset("spark.graft.stats.fromFooters")
    assert(statsOf(t4) == statsOf(t5),
      s"footer vs scan ts stats differ:\n${statsOf(t4)}\nvs\n${statsOf(t5)}")
    // the staged encoding round-trips the identical timestamp values
    assert(DeltaLog.read(spark, t4).orderBy("k").collect().toSeq ==
      tsDf.orderBy("k").collect().toSeq)
  }
}
