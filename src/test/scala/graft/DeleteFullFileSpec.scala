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
}
