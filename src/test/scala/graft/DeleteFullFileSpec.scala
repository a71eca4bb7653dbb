package graft

import java.io.File
import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** Metadata-only DELETE: files whose every row provably satisfies the
  * predicate (partition values, or zone maps + nullCount=0) are removed
  * WHOLE — never opened. The decisive assertion: the matched files'
  * bytes are CORRUPTED on disk before the DELETE, so any code path that
  * read them would throw. The retention-sweep shape at 100 TB. */
class DeleteFullFileSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-del-full-").toString + "/t"

  /** Overwrite every .parquet under `dir` with garbage bytes. */
  private def corrupt(dir: File): Int = {
    val fs = Option(dir.listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    fs.foreach(f => Files.write(f.toPath, Array[Byte](0, 1, 2, 3)))
    fs.length
  }

  test("partition sweep deletes whole partitions with zero data reads") {
    val t = fresh()
    val df = (0L until 300L).map(i => (i, s"d${i % 3}")).toDF("k", "day")
    DeltaLog.write(spark, df.repartition(2), t, partitionBy = Seq("day"))
    // corrupt the expired partitions' parquet: a read would throw
    assert(corrupt(new File(t, "day=d0")) > 0)
    assert(corrupt(new File(t, "day=d1")) > 0)
    val v = DeltaLog.deleteWhere(spark, t, col("day") < "d2")
    assert(v == 1L)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == (0L until 300L).filter(_ % 3 == 2).map(i => (i, "d2")).toSet)
    // no deletion vectors, no protocol upgrade on a pure sweep
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.fileEntries.forall(_.dv.isEmpty))
    assert(!snap.protocolJson.exists(_.contains("deletionVectors")),
      snap.protocolJson.toString)
  }

  test("zone-map sweep drops covered files; the straddler gets a mask") {
    val t = fresh()
    DeltaLog.write(spark, (0L until 50L).toDF("k").coalesce(1), t)
    DeltaLog.write(spark, (50L until 150L).toDF("k").coalesce(1), t,
      mode = "append")
    DeltaLog.write(spark, (1000L until 1100L).toDF("k").coalesce(1), t,
      mode = "append")
    // the fully-covered file [0,50) must be dropped without a read —
    // corrupt exactly it (the straddler [50,150) must stay readable)
    val covered = DeltaLog.snapshot(spark, t).fileEntries
      .map(_.path).sorted.head
    Files.write(new File(t, covered).toPath, Array[Byte](9, 9))
    DeltaLog.deleteWhere(spark, t, col("k") < 100L)
    val got = DeltaLog.read(spark, t).as[Long].collect().toSet
    assert(got == ((100L until 150L) ++ (1000L until 1100L)).toSet)
    val snap = DeltaLog.snapshot(spark, t)
    // straddler survives under a 50-row mask; covered file is gone
    assert(!snap.fileEntries.map(_.path).contains(covered))
    assert(snap.fileEntries.flatMap(_.dv).map(_.cardinality).sum == 50L)
  }

  test("a null in the swept column disqualifies the whole-file proof") {
    val t = fresh()
    val rows = (0L until 20L).map(i => (i, if (i == 7L) null else s"v$i"))
    DeltaLog.write(spark, rows.toDF("k", "v").coalesce(1), t)
    // v < "w" is TRUE for every non-null v… but NULL for row 7, which
    // must SURVIVE the delete — the file cannot be removed whole
    DeltaLog.deleteWhere(spark, t, col("v") < "w")
    val got = DeltaLog.read(spark, t).as[(Long, Option[String])].collect().toSet
    assert(got == Set((7L, None)))
  }

  test("IS NULL sweep and string-prefix sweep prove from stats") {
    val t = fresh()
    val all = (0L until 10L).map(i => (i, null: String)) ++
      (10L until 20L).map(i => (i, s"pre$i")) ++
      (20L until 30L).map(i => (i, s"other$i"))
    // three single-partition files with homogeneous v shapes
    all.grouped(10).foreach { g =>
      DeltaLog.write(spark, g.toDF("k", "v").coalesce(1), t, mode = "append")
    }
    val paths = DeltaLog.snapshot(spark, t).fileEntries.map(_.path)
    assert(paths.size == 3)
    DeltaLog.deleteWhere(spark, t, col("v").isNull)
    DeltaLog.deleteWhere(spark, t, col("v").startsWith("pre"))
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == (20L until 30L).map(i => (i, s"other$i")).toSet)
    // both sweeps were whole-file: no masks anywhere
    assert(DeltaLog.snapshot(spark, t).fileEntries.forall(_.dv.isEmpty))
  }

  test("CDF sweep still emits the deleted rows as change files") {
    val t = fresh()
    DeltaLog.write(spark, (0L until 30L).map(i => (i, s"d${i % 3}"))
      .toDF("k", "day").repartition(1), t, partitionBy = Seq("day"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLog.deleteWhere(spark, t, col("day") === "d1")
    val feed = DeltaLog.changesBetween(spark, t, 0, 1)
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(feed == (0L until 30L).filter(_ % 3 == 1)
      .map(i => (i, "delete")).toSet)
  }

  test("10k-file sweep streams removes: driver holds only boundary entries") {
    // The wide-DML scale shape: a retention sweep matching HALF of a
    // 10,000-file table must stream its remove actions from the file
    // frame into the commit — the driver never collects the matched
    // set. Same synthetic-log fixture as DataSkippingSpec (no physical
    // parquet: any data read, like any entry collect, would throw).
    val t = fresh()
    val n = 10000
    val schema = new org.apache.spark.sql.types.StructType().add("x", "long")
    val esc = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    def stats(lo: Long, hi: Long) =
      ("{\"numRecords\":10,\"minValues\":{\"x\":" + lo + "},\"maxValues\":{\"x\":" +
        hi + "},\"nullCount\":{\"x\":0}}").replace("\"", "\\\"")
    val actions =
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"sweep10k","format":{"provider":"parquet","options":{}},"schemaString":"$esc","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""") ++
      (0 until n).map { i =>
        val lo = i * 10L
        f"""{"add":{"path":"part-$i%05d.parquet","partitionValues":{},"size":1000,"modificationTime":1700000000000,"dataChange":true,"stats":"${stats(lo, lo + 9)}%s"}}"""
      }
    val logDir = new File(t, "_delta_log"); logDir.mkdirs()
    Files.write(new File(logDir, f"${0L}%020d.json").toPath,
      (actions.mkString("\n") + "\n").getBytes("UTF-8"))

    DeltaLog.resetDmlCollectMeter()
    // file i covers [10i, 10i+9]: x < 50_000 wholly matches files
    // 0..4999 and straddles none — a pure metadata sweep
    val v = DeltaLog.deleteWhere(spark, t, col("x") < 50000L)
    assert(v == 1L)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.allFiles.count() == (n / 2).toLong)
    assert(snap.allFiles.agg(min("path")).head.getString(0) == "part-05000.parquet")
    // the collect-meter: zero boundary files were collected (the 5000
    // matched entries streamed via toLocalIterator, never as one Seq)
    assert(DeltaLog.maxDriverEntriesPerDmlCollect == 0L,
      s"driver collected ${DeltaLog.maxDriverEntriesPerDmlCollect} entries for a pure sweep")
    // the crc sidecar stayed incremental AND correct
    val report = graft.sources.Checksum.validate(spark, t).get
    assert(report.values.forall(identity), report.toString)

    // a straddling predicate collects ONLY the boundary file (the DV
    // path needs real parquet, so stop at the meter check via a
    // second pure sweep that leaves a remainder boundary-free)
    DeltaLog.resetDmlCollectMeter()
    DeltaLog.deleteWhere(spark, t, col("x") >= 80000L)
    assert(DeltaLog.maxDriverEntriesPerDmlCollect == 0L)
    assert(DeltaLog.snapshot(spark, t).allFiles.count() == 3000L)
  }
}
