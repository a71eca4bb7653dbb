package graft

import graft.maintenance.Maintenance
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Maintenance fallbacks: compaction, range clustering, file detail. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDataset(): String = {
    val dir = Files.createTempDirectory("graft-maint-").toString + "/t"
    // 16 small files of 1k rows
    spark.range(16000).select(col("id"), (col("id") % 97).as("k"))
      .repartition(16).write.parquet(dir)
    dir
  }

  test("compact rewrites many small files into the target count") {
    val dir = freshDataset()
    assert(Maintenance.detail(spark, dir).select("num_files").as[Long].head() == 16L)
    Maintenance.compact(spark, dir, 2)
    val d = Maintenance.detail(spark, dir).as[(String, Long, Long, Long, Long)].head()
    assert(d._2 == 2L)
    assert(spark.read.parquet(dir).count() == 16000L)
  }

  test("cluster produces non-overlapping sorted ranges per file") {
    val dir = freshDataset()
    Maintenance.cluster(spark, dir, 4, Seq("k"))
    assert(spark.read.parquet(dir).count() == 16000L)
    // per-file min/max of k must not overlap across files (range clustering)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("mn"), max("k").as("mx"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"overlap: $a vs $b")
      case _ =>
    }
  }

  test("zorder_key interleaves bits exactly, preserving grid locality") {
    import graft.functions.ZOrderKey.interleave
    assert(interleave(0L, 0L) == 0L)
    assert(interleave(1L, 0L) == 2L)   // a's bit 0 → position 1
    assert(interleave(0L, 1L) == 1L)   // b's bit 0 → position 0
    assert(interleave(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // locality: adjacent cells differ in few low-order key bits, far
    // cells differ high — the key of (x, y) lies between its quadrant's
    // corners
    val q = interleave(40000L, 20000L)
    assert(q > interleave(32768L, 0L) && q < interleave(65535L, 32767L))
  }

  test("clusterZ gives per-file min/max locality on BOTH columns") {
    val dir = Files.createTempDirectory("graft-zorder-").toString + "/t"
    // two independent uniform dimensions — lexicographic clustering on
    // (a, b) would leave b's per-file span at ~full range
    spark.range(65536).select(
        (col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
      .repartition(8).write.parquet(dir)
    Maintenance.clusterZ(spark, dir, 16, "a", "b")
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(avg("sa"), avg("sb")).as[(Double, Double)].head()
    // 16 z-ordered files over a 256×256 grid ⇒ each file covers about a
    // quarter of each dimension; assert well under the full 255 span
    assert(spans._1 < 160, s"column a span too wide: $spans")
    assert(spans._2 < 160, s"column b span too wide: $spans")
    assert(spark.read.parquet(dir).count() == 65536L)
  }

  test("analyze computes CBO statistics for a catalog table") {
    dropManagedTable("maint_analyze_t")
    spark.range(100).write.mode("overwrite").saveAsTable("maint_analyze_t")
    Maintenance.analyze(spark, "maint_analyze_t")
    val stats = spark.sql("DESCRIBE TABLE EXTENDED maint_analyze_t")
      .where(col("col_name") === "Statistics").count()
    assert(stats == 1)
  }
}
