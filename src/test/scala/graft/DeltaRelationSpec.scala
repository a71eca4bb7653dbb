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
