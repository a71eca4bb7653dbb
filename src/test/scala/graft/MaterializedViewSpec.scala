package graft

import java.io.File
import java.nio.file.Files

import graft.maintenance.{IncrementalAgg, MaterializedView}
import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** The packaged lakehouse IVM loop: gold maintained from the source
  * table's change feed with the consumer offset stored as gold's own
  * SetTransaction state. Invariant after every refresh: maintained gold
  * ≡ full recompute over the source, bit for bit. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")
  private val sums = Seq("v")

  private def assertCurrent(source: String, gold: String): Unit = {
    val got = DeltaLog.read(spark, gold)
    val want = IncrementalAgg.materialize(DeltaLog.read(spark, source), keys, sums)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      s"gold=${got.collect().toSeq} full=${want.collect().toSeq}")
  }

  test("refresh: appends, MERGE updates, compaction, replays, and log truncation") {
    val dir = Files.createTempDirectory("graft-mv-").toString
    val source = s"$dir/source"
    val gold = s"$dir/gold"

    // initial load → first refresh is a full materialize
    DeltaLog.mergeUpsert(spark, source,
      Seq((1L, "x", 1.0, 10L), (2L, "x", 2.0, 10L), (3L, "y", 4.0, 10L))
        .toDF("id", "g", "v", "ts"), Seq("id"), "ts")
    val v0 = MaterializedView.refresh(spark, source, gold, keys, sums)
    assertCurrent(source, gold)

    // replayed refresh with no new source commits: exact no-op
    val goldVersions = DeltaLog.listVersions(spark, gold).size
    assert(MaterializedView.refresh(spark, source, gold, keys, sums) == v0)
    assert(DeltaLog.listVersions(spark, gold).size == goldVersions)

    // MERGE that moves a row across groups + stale update + insert
    DeltaLog.mergeUpsert(spark, source,
      Seq((2L, "y", 2.5, 20L), (3L, "y", 9.9, 5L), (4L, "z", 1.25, 20L))
        .toDF("id", "g", "v", "ts"), Seq("id"), "ts")
    // drain group x entirely
    DeltaLog.mergeUpsert(spark, source,
      Seq((1L, "y", 0.5, 30L)).toDF("id", "g", "v", "ts"), Seq("id"), "ts")
    MaterializedView.refresh(spark, source, gold, keys, sums)
    assertCurrent(source, gold)
    assert(DeltaLog.read(spark, gold).where(col("g") === "x").count() == 0)

    // compaction between refreshes: dataChange=false, empty delta, but
    // the consumer offset still advances past the OPTIMIZE commit
    val ov = DeltaLog.optimize(spark, source)
    assert(MaterializedView.refresh(spark, source, gold, keys, sums) == ov)
    assertCurrent(source, gold)

    // vacuum the source's JSON past the consumer: refresh falls back to
    // one full rebuild, then resumes incrementally
    DeltaLog.checkpoint(spark, source)
    new File(source, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).foreach(_.delete())
    DeltaLog.mergeUpsert(spark, source,
      Seq((5L, "w", 7.0, 40L)).toDF("id", "g", "v", "ts"), Seq("id"), "ts")
    MaterializedView.refresh(spark, source, gold, keys, sums)
    assertCurrent(source, gold)
    // and the next incremental step works from the rebuilt state
    DeltaLog.mergeUpsert(spark, source,
      Seq((5L, "w", 8.0, 50L)).toDF("id", "g", "v", "ts"), Seq("id"), "ts")
    MaterializedView.refresh(spark, source, gold, keys, sums)
    assertCurrent(source, gold)

    val state = DeltaLog.read(spark, gold)
      .select(col("g"), col("n"), col("sum_v").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(state == Seq(("w", 1L, 8.0), ("y", 3L, 7.0), ("z", 1L, 1.25)), state.toString)
  }

  test("high-cardinality gold: refresh rewrites only files containing changed groups") {
    // 10,000 groups: the regime where an O(gold) overwrite per refresh
    // defeats the O(delta) fold. The refresh commit must remove only the
    // gold files whose groups the delta net-changed — a copy-on-write
    // MERGE upstream rewrites whole source files, and the cancelling
    // delete+insert pairs for untouched rows must NOT drag their groups
    // into the gold write.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false") // keep gold multi-file at test scale
    try {
      val dir = Files.createTempDirectory("graft-mv-hc-").toString
      val source = s"$dir/source"
      val gold = s"$dir/gold"
      val n = 10000L
      DeltaLog.mergeUpsert(spark, source,
        spark.range(n).select(col("id"), col("id").as("g"),
          (col("id") % 7).cast("double").as("v"), lit(10L).as("ts")),
        Seq("id"), "ts")
      MaterializedView.refresh(spark, source, gold, Seq("g"), sums)
      val before = DeltaLog.snapshot(spark, gold)
      assert(before.files.size > 4, s"need multi-file gold, got ${before.files.size}")

      // MERGE: two group-value updates + one brand-new group. The source
      // rewrite drags ~n/8 rows through the change feed; only these 3
      // groups net-change.
      DeltaLog.mergeUpsert(spark, source,
        Seq((5L, 5L, 100.0, 20L), (7L, 7L, 200.0, 20L), (n, n, 1.0, 20L))
          .toDF("id", "g", "v", "ts"), Seq("id"), "ts")
      MaterializedView.refresh(spark, source, gold, Seq("g"), sums)

      val got = DeltaLog.read(spark, gold)
      val want = IncrementalAgg.materialize(
        DeltaLog.read(spark, source), Seq("g"), sums)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
      assert(got.count() == n + 1)

      // the refresh commit touched only files holding the 3 changed groups
      val lastV = DeltaLog.listVersions(spark, gold).max
      val lines = Files.readAllLines(
        new File(gold, f"_delta_log/$lastV%020d.json").toPath)
      import scala.jdk.CollectionConverters._
      val removes = lines.asScala.count(_.contains("\"remove\""))
      assert(removes >= 1 && removes <= 3 && removes < before.files.size,
        s"removes=$removes of ${before.files.size} gold files")
    } finally spark.conf.set(coalesceKey, prevCoalesce)
  }
}
