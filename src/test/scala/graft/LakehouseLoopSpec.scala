package graft

import java.nio.file.Files

import graft.maintenance.IncrementalAgg
import graft.sources.DeltaLog
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end lakehouse loop on the open Delta protocol: a stream
  * appends into bronze exactly-once (txn-guarded foreachBatch), gold is
  * a materialized aggregate maintained INCREMENTALLY from the log's
  * per-version add feed — never rescanning bronze — and after every
  * batch the maintained gold equals a full recompute bit-for-bit.
  * This is the shape the reference schedules as nightly full rebuilds,
  * run continuously in O(delta) instead.
  */
class LakehouseLoopSpec extends SparkSpec {
  import spark.implicits._

  test("stream -> Delta bronze -> incremental gold equals full recompute per batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Double)]
    val bronze = Files.createTempDirectory("graft-loop-").toString + "/bronze"
    val ckpt = Files.createTempDirectory("graft-loop-ckpt-").toString

    val keys = Seq("k")
    val sums = Seq("v")
    var gold: org.apache.spark.sql.DataFrame = null
    var consumedVersion = -1L

    def step(data: (String, Double)*): Unit = {
      ms.addData(data: _*)
      Streams.foreachBatchDeltaAppend(ms.toDF().toDF("k", "v"), bronze, ckpt, "loop")
      // consume ONLY the versions this batch committed (append-only feed)
      val latest = DeltaLog.snapshot(spark, bronze).version
      val delta = DeltaLog.addedSince(spark, bronze, consumedVersion, latest)
        .withColumn("_change_type", lit("insert"))
      gold =
        if (gold == null) IncrementalAgg.materialize(
          delta.drop("_change_type"), keys, sums)
        else IncrementalAgg.applyDelta(gold, delta, keys, sums)
      gold = gold.localCheckpoint(true)
      consumedVersion = latest
      // invariant: maintained gold == full recompute over bronze
      val full = IncrementalAgg.materialize(DeltaLog.read(spark, bronze), keys, sums)
      assert(gold.exceptAll(full).count() == 0 && full.exceptAll(gold).count() == 0,
        s"divergence after version $latest")
    }

    step("a" -> 1.0, "b" -> 2.0)
    step("a" -> 3.5)
    step("c" -> 0.25, "b" -> 1.75, "a" -> 1.0)

    // end state sanity: 3 keys, exact decimal sums
    val state = gold.select(col("k"), col("n"), col("sum_v").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(state == Seq(("a", 3L, 5.5), ("b", 2L, 3.75), ("c", 1L, 0.25)))

    // the loop never rescanned bronze for gold: the last delta read only
    // the final batch's files (addedSince is per-version), and bronze
    // itself holds every appended row exactly once
    assert(DeltaLog.read(spark, bronze).count() == 6)
  }

  test("MERGE-updating stream -> silver -> incremental gold survives updates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (id, group, value, ts): updates arrive keyed by id, gold aggregates
    // by group — the reference's nightly trip_fact MERGE + gold metrics
    // shape (gold_pipeline.py:789-796), run continuously in O(delta)
    val ms = MemoryStream[(Long, String, Double, Long)]
    val silver = Files.createTempDirectory("graft-loop-m-").toString + "/silver"
    val ckpt = Files.createTempDirectory("graft-loop-m-ckpt-").toString
    val keys = Seq("g")
    val sums = Seq("v")
    var gold: org.apache.spark.sql.DataFrame = null
    var consumed = -1L

    def step(data: (Long, String, Double, Long)*): Unit = {
      ms.addData(data: _*)
      Streams.foreachBatchDeltaMerge(ms.toDF().toDF("id", "g", "v", "ts"),
        silver, ckpt, Seq("id"), "ts")
      val latest = DeltaLog.snapshot(spark, silver).version
      // row-level CDC from the MERGE commits: deletes for rewritten
      // files' old rows, inserts for the new — never a silver rescan
      val delta = DeltaLog.changesBetween(spark, silver, consumed, latest)
      gold =
        if (gold == null)
          IncrementalAgg.materialize(delta.where(col("_change_type") === "insert"), keys, sums)
        else IncrementalAgg.applyDelta(gold, delta, keys, sums)
      gold = gold.localCheckpoint(true)
      consumed = latest
      val full = IncrementalAgg.materialize(DeltaLog.read(spark, silver), keys, sums)
      assert(gold.exceptAll(full).count() == 0 && full.exceptAll(gold).count() == 0,
        s"divergence after version $latest: gold=${gold.collect().toSeq} " +
          s"full=${full.collect().toSeq}")
    }

    step((1L, "x", 1.0, 10L), (2L, "x", 2.0, 10L), (3L, "y", 4.0, 10L))
    // an update that MOVES id 2 across groups, a STALE update for id 3
    // (guard rejects it; the rewritten-unchanged row must net to zero in
    // gold), and a fresh insert
    step((2L, "y", 2.5, 20L), (3L, "y", 9.9, 5L), (4L, "z", 1.25, 20L))
    // drain group x entirely: it must drop out of gold
    step((1L, "y", 0.5, 30L))
    // compaction between consumptions is invisible to the feed
    val ov = DeltaLog.optimize(spark, silver)
    gold = IncrementalAgg.applyDelta(gold,
      DeltaLog.changesBetween(spark, silver, consumed, ov), keys, sums)
      .localCheckpoint(true)
    consumed = ov
    step((5L, "x", 7.0, 40L))

    val state = gold.select(col("g"), col("n"), col("sum_v").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(state == Seq(("x", 1L, 7.0), ("y", 3L, 7.0), ("z", 1L, 1.25)), state.toString)
  }

  test("streamed MERGEs + MaterializedView.refresh: the packaged IVM loop") {
    // same loop as above, but gold lives as a Delta table and the fold +
    // consumer offset are MaterializedView's one atomic commit — the
    // whole continuous-lakehouse story through public engine APIs only
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Double, Long)]
    val dir = Files.createTempDirectory("graft-loop-mv-").toString
    val silver = s"$dir/silver"
    val gold = s"$dir/gold"
    val ckpt = s"$dir/ckpt"

    def step(data: (Long, String, Double, Long)*): Unit = {
      ms.addData(data: _*)
      graft.streaming.Streams.foreachBatchDeltaMerge(
        ms.toDF().toDF("id", "g", "v", "ts"), silver, ckpt, Seq("id"), "ts")
      graft.maintenance.MaterializedView.refresh(
        spark, silver, gold, Seq("g"), Seq("v"))
      val got = DeltaLog.read(spark, gold)
      val want = IncrementalAgg.materialize(DeltaLog.read(spark, silver),
        Seq("g"), Seq("v"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    }

    step((1L, "x", 1.0, 10L), (2L, "y", 2.0, 10L))
    step((1L, "y", 3.0, 20L), (3L, "z", 0.5, 20L)) // group-moving update
    step((2L, "y", 9.0, 5L)) // stale: rewritten unchanged, gold unmoved
    val state = DeltaLog.read(spark, gold)
      .select(col("g"), col("n"), col("sum_v").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(state == Seq(("y", 2L, 5.0), ("z", 1L, 0.5)), state.toString)
  }

  test("auto-checkpoint bounds JSON replay across a 50-commit append stream") {
    // A long-lived append table must not accumulate unbounded JSON
    // replay: commitWrite checkpoints every 10th commit (Delta's own
    // default) without any caller opting in.
    val t = Files.createTempDirectory("graft-loop-ac-").toString + "/t"
    for (i <- 0 until 50)
      DeltaLog.write(spark, Seq(i.toLong).toDF("x"), t,
        if (i == 0) "overwrite" else "append")
    val logDir = new java.io.File(t, "_delta_log")
    val cps = logDir.listFiles().map(_.getName)
      .filter(_.endsWith(".checkpoint.parquet")).sorted
    assert(cps.nonEmpty && cps.last.startsWith(f"${40L}%020d"), cps.mkString(","))
    // history + time travel stay correct across auto-checkpoints
    assert(DeltaLog.history(spark, t).count() == 50)
    assert(DeltaLog.read(spark, t, Some(45)).count() == 46)
    // replay cost is BOUNDED: everything at or before the newest
    // checkpoint is droppable, the reader needs checkpoint + <=interval
    // JSON tail only
    logDir.listFiles().filter { fl =>
      fl.getName.endsWith(".json") &&
        fl.getName.takeWhile(_ != '.').toLong <= 40
    }.foreach(_.delete())
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.version == 49)
    assert(DeltaLog.read(spark, t).as[Long].collect().sorted.toSeq ==
      (0L until 50L))
  }
}
