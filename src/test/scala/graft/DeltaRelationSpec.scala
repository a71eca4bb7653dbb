package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, DeltaRelation}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The LIVE relation ([[graft.sources.GraftDeltaFileIndex]]): file list
  * resolved at every planning — the stream-static join freshness
  * delta-spark provides — with loud DV and schema-drift guards. */
class DeltaRelationSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-live-").toString + "/t"

  test("one DataFrame sees appends from other writers without a rebuild") {
    val t = fresh()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), t)
    val live = DeltaRelation.readLive(spark, t)
    assert(live.count() == 1L)
    DeltaLog.write(spark, Seq((2L, "b")).toDF("k", "v"), t, mode = "append")
    // SAME DataFrame object — the index re-lists at the next planning
    assert(live.count() == 2L)
    // the reader-API spelling is the same relation
    val viaFormat = spark.read.format("graft-delta").load(t)
    assert(viaFormat.count() == 2L)
    DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v"), t, mode = "append")
    assert(viaFormat.count() == 3L)
    // parquet filter pushdown still applies through the live scan
    val plan = live.where(col("k") === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,2"), plan)
  }

  test("stream-static join: the dimension side tracks appends between batches") {
    val t = fresh()
    DeltaLog.write(spark, Seq((1L, "one")).toDF("k", "name"), t)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val joined = input.toDF().toDF("k")
      .join(DeltaRelation.readLive(spark, t), Seq("k"), "left")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String])]
    val q = joined.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => got.synchronized {
          got += ((r.getLong(0), Option(r.getString(1)))) })
        ()
      }
      .start()
    input.addData(1L, 2L)
    q.processAllAvailable()
    // k=2 has no dim row yet
    assert(got.toSet == Set((1L, Some("one")), (2L, None)), got.toString)
    // the dim gains k=2 BETWEEN batches — the next batch sees it
    DeltaLog.write(spark, Seq((2L, "two")).toDF("k", "name"), t, mode = "append")
    got.clear()
    input.addData(2L)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == Set((2L, Some("two"))), got.toString)
  }

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.head
    }
    scans.head.metrics("numFiles").value
  }

  test("partitioned live table: values, pruning, and freshness") {
    val t = fresh()
    DeltaLog.write(spark,
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "p").repartition(1),
      t, partitionBy = Seq("p"))
    val live = DeltaRelation.readLive(spark, t)
    // declared column order preserved (Spark appends partition cols last
    // internally; readLive restores the declaration)
    assert(live.columns.toSeq == Seq("k", "p"))
    assert(live.count() == 3L)
    // partition pruning happens IN the index: one partition dir scanned
    val aOnly = live.where(col("p") === "a")
    assert(aOnly.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "a")))
    assert(scanFiles(live.where(col("p") === "b")) <
      scanFiles(live), "partition filter did not prune")
    // a new partition lands between plannings of the SAME frame
    DeltaLog.write(spark, Seq((4L, "c")).toDF("k", "p"), t,
      mode = "append", partitionBy = Seq("p"))
    assert(live.count() == 4L)
    assert(live.where(col("p") === "c").count() == 1L)
  }

  test("zone-map skipping flows through the live index's data filters") {
    val t = fresh()
    // two files with disjoint k ranges — stats-based skipping territory
    DeltaLog.write(spark, (1L to 100L).toDF("k").coalesce(1), t)
    DeltaLog.write(spark, (1000L to 1100L).toDF("k").coalesce(1), t,
      mode = "append")
    val live = DeltaRelation.readLive(spark, t)
    assert(scanFiles(live) == 2L)
    val one = live.where(col("k") === 1050L)
    assert(one.as[Long].collect().toSeq == Seq(1050L))
    assert(scanFiles(live.where(col("k") === 1050L)) == 1L,
      "zone maps did not skip the out-of-range file")
  }

  test("versionAsOf / timestampAsOf pin the relation to a frozen snapshot") {
    val t = fresh()
    DeltaLog.write(spark, (1L to 5L).toDF("x"), t)
    DeltaLog.write(spark, (6L to 9L).toDF("x"), t, mode = "append")
    val v0 = spark.read.format("graft-delta").option("versionAsOf", "0").load(t)
    assert(v0.as[Long].collect().sorted.toSeq == (1L to 5L))
    // the pinned frame does NOT track later appends (that's the point)
    DeltaLog.write(spark, Seq(100L).toDF("x"), t, mode = "append")
    assert(v0.count() == 5L)
    assert(spark.read.format("graft-delta").load(t).count() == 10L)
    // a generous timestamp resolves to the latest version
    val byTs = spark.read.format("graft-delta")
      .option("timestampAsOf", "2200-01-01").load(t)
    assert(byTs.count() == 10L)
    intercept[RuntimeException](spark.read.format("graft-delta")
      .option("versionAsOf", "0").option("timestampAsOf", "2200-01-01").load(t)
      .count())
  }

  test("batch CDF through reader options: per-commit row-level changes") {
    val t = fresh()
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    DeltaLog.deleteWhere(spark, t, col("k") === 1L)                // v1
    DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v"), t, "append") // v2
    val feed = spark.read.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(t)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(feed == Set((1L, "a", "delete", 1L), (3L, "c", "insert", 2L)))
    // endingVersion bounds the window
    val only1 = spark.read.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1").load(t)
    assert(only1.count() == 1L)
  }

  test("deletion vectors and schema drift fail the live scan loudly") {
    val t = fresh()
    DeltaLog.write(spark, (1L to 10L).toDF("x"), t)
    val live = DeltaRelation.readLive(spark, t)
    assert(live.count() == 10L)
    DeltaLog.deleteWhere(spark, t, col("x") === 5L) // DV, no rewrite
    val e = intercept[Exception] { live.count() }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("deletion vector")), e.toString)

    val t2 = fresh()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("k", "v"), t2)
    val live2 = DeltaRelation.readLive(spark, t2)
    assert(live2.count() == 1L)
    DeltaLog.write(spark,
      Seq((2L, "b", 9L)).toDF("k", "v", "extra"), t2, mode = "append")
    val e2 = intercept[Exception] { live2.count() }
    assert(msgs(e2).exists(_.contains("schema changed")), e2.toString)
  }
}
