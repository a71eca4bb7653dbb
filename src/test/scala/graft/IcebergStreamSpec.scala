package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming source over Iceberg tables
  * ([[graft.streaming.IcebergStreamSource]]) — offsets are snapshot
  * ids, micro-batches are the row-level changelog, checkpoints give the
  * ST2 no-reprocess contract on the second format. */
class IcebergStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-icestream-").toString + "/t"

  private def drain(table: String, sink: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft-iceberg")
    options.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(table).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("tail: initial snapshot, then per-commit increments, no reprocess (ST2)") {
    val t = fresh()
    val sink = Files.createTempDirectory("graft-icestream-sink-").toString
    val ckpt = Files.createTempDirectory("graft-icestream-ckpt-").toString
    IcebergTable.writeAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    drain(t, sink, ckpt)
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // two more commits: only the NEW rows arrive, each commit a batch
    IcebergTable.writeAppend(spark, Seq((3L, "c")).toDF("k", "v"), t)
    IcebergTable.writeAppend(spark, Seq((4L, "d")).toDF("k", "v"), t)
    drain(t, sink, ckpt)
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // same checkpoint, nothing new: nothing reprocessed
    drain(t, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 4L)
  }

  test("change commits refuse by default; skipChangeCommits skips them WHOLE") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val sink1 = Files.createTempDirectory("graft-icestream-s1-").toString
    val ckpt1 = Files.createTempDirectory("graft-icestream-c1-").toString
    drain(t, sink1, ckpt1) // initial snapshot consumed
    IcebergTable.deleteWhere(spark, t, col("k") === 1L)
    IcebergTable.writeAppend(spark, Seq((3L, "c")).toDF("k", "v"), t)
    // an append-only stream cannot represent the retraction
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, sink1, ckpt1)
    }
    assert(e.getCause.getMessage.contains("skipChangeCommits"),
      e.getCause.getMessage)
    // with the option: the delete commit is skipped whole — already
    // streamed rows stay in the sink (no retraction), the later append
    // still arrives (the refused batch never committed, so the same
    // checkpoint resumes cleanly)
    drain(t, sink1, ckpt1, Map("skipChangeCommits" -> "true"))
    assert(spark.read.parquet(sink1).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("startingSnapshot=latest tails only FUTURE commits; id anchors exactly") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "old")).toDF("k", "v"), t)
    val sink = Files.createTempDirectory("graft-icestream-tl-").toString
    val ckpt = Files.createTempDirectory("graft-icestream-tc-").toString
    drain(t, sink, ckpt, Map("startingSnapshot" -> "latest"))
    // the anchor batch is empty: no initial snapshot
    assert(!new java.io.File(sink).listFiles().exists(_.getName.endsWith(".parquet"))
      || spark.read.parquet(sink).count() == 0L)
    IcebergTable.writeAppend(spark, Seq((2L, "new")).toDF("k", "v"), t)
    drain(t, sink, ckpt, Map("startingSnapshot" -> "latest"))
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ==
      Set((2L, "new")))
  }

  test("merge-on-read mask applies to the initial snapshot batch") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    IcebergTable.deleteWhere(spark, t, col("k") === 2L)
    val sink = Files.createTempDirectory("graft-icestream-dv-").toString
    val ckpt = Files.createTempDirectory("graft-icestream-dc-").toString
    drain(t, sink, ckpt)
    // the masked row never enters the stream
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c")))
  }

  test("readChangeFeed: typed change rows stamped with their snapshot id") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    val sink = Files.createTempDirectory("graft-icecdfs-").toString
    val ckpt = Files.createTempDirectory("graft-icecdfc-").toString
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("readChangeFeed", "true")
        .load(t).writeStream
        .outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // unanchored CDF streams only FUTURE commits (the Delta CDF default)
    drainCdf()
    val files0 = Option(new java.io.File(sink).listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    assert(!files0 || spark.read.parquet(sink).count() == 0L)
    IcebergTable.deleteWhere(spark, t, col("k") === 1L)
    IcebergTable.writeAppend(spark, Seq((3L, "c")).toDF("k", "v"), t)
    val head = IcebergTable.refSnapshotId(spark, t, "main")
    val Seq(delId, addId) =
      IcebergTable.chainOps(spark, t, None, head).map(_._1).takeRight(2)
    drainCdf()
    val got = spark.read.parquet(sink)
      .select("k", "v", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "a", "delete", delId),
      (3L, "c", "insert", addId)), got)
  }

  test("maxSnapshotsPerTrigger chunks a catch-up into per-commit batches") {
    val t = fresh()
    (1 to 4).foreach(i => IcebergTable.writeAppend(spark,
      Seq((i.toLong, s"v$i")).toDF("k", "v"), t))
    val anchor0 = {
      // anchor BEFORE all four commits: walk the chain down
      val ops = IcebergTable.chainOps(spark, t, None,
        IcebergTable.refSnapshotId(spark, t, "main"))
      ops.head._1
    }
    var batches = 0
    val q = spark.readStream.format("graft-iceberg")
      .option("startingSnapshot", anchor0.toString)
      .option("maxSnapshotsPerTrigger", "1")
      .load(t)
      .writeStream.outputMode("append").format("memory")
      .queryName("ice_chunked_tail")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-icestream-mc-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches = q.recentProgress.count(_.numInputRows > 0)
    assert(spark.table("ice_chunked_tail").as[(Long, String)].collect().toSet ==
      (2 to 4).map(i => (i.toLong, s"v$i")).toSet)
    // one commit per non-empty batch (3 commits after the anchor)
    assert(batches == 3, s"expected 3 per-commit batches, got $batches")
  }
}
