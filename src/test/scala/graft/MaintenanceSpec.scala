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

  test("analyze computes CBO statistics for a catalog table") {
    dropManagedTable("maint_analyze_t")
    spark.range(100).write.mode("overwrite").saveAsTable("maint_analyze_t")
    Maintenance.analyze(spark, "maint_analyze_t")
    val stats = spark.sql("DESCRIBE TABLE EXTENDED maint_analyze_t")
      .where(col("col_name") === "Statistics").count()
    assert(stats == 1)
  }
}
