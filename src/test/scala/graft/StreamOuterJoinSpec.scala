package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream LEFT OUTER interval join: the attribution shape where
  * clicks WITHOUT a purchase in the window must also emit (with nulls)
  * — but only once the watermark proves no purchase can still arrive.
  * The contract verified here (the part a batch oracle cannot state):
  *
  *   1. every batch inner-join pair emits (matches are eager);
  *   2. null-extended rows appear ONLY for clicks with no batch match;
  *   3. a click whose window the final watermark has passed appears
  *      EXACTLY once — matched or null-extended, never lost, never
  *      duplicated;
  *   4. state is bounded: both sides carry watermarks, so buffered rows
  *      are evictable the moment the opposite watermark passes their
  *      window (the property that survives an unbounded stream).
  */
class StreamOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("left-outer interval join: eager matches, watermark-finalized nulls") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    // user 1: click at t0 matched by purchase at t+5m
    // user 2: click at t0, purchase OUTSIDE the 10m window (t+30m)
    // user 3: click at t0, no purchase at all
    // user 4: click near the end — window still open at final watermark
    clicks.addData((1L, 101L, ts(0)), (2L, 102L, ts(0)),
      (3L, 103L, ts(0)), (4L, 104L, ts(55)))
    purchases.addData((1L, 201L, ts(5)), (2L, 202L, ts(30)),
      (9L, 209L, ts(60)))

    val c = clicks.toDF.toDF("user_id", "click_id", "click_ts")
      .withWatermark("click_ts", "0 seconds")
    val p = purchases.toDF.toDF("p_user", "purchase_id", "purchase_ts")
      .withWatermark("purchase_ts", "0 seconds")
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"))

    val ckpt = Files.createTempDirectory("graft-soj-").toString
    val q = joined.writeStream.format("memory")
      .queryName("soj_sink").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val rows = spark.table("soj_sink")
      .as[(Long, Long, Option[Long])].collect().toSeq
    // 1. the one true match emits
    assert(rows.contains((1L, 101L, Some(201L))), rows.toString)
    // 2+3. users 2 and 3: window [t0, t0+10m] closed long before the
    // final watermark (t60) — exactly one null-extended row each
    assert(rows.count(r => r._1 == 2L) == 1 && rows.contains((2L, 102L, None)))
    assert(rows.count(r => r._1 == 3L) == 1 && rows.contains((3L, 103L, None)))
    // no user appears twice, matched rows never null-extended too
    assert(rows.groupBy(_._2).forall(_._2.size == 1), rows.toString)
    // 4. user 4 (window [t55, t65] NOT provably closed at watermark t60)
    // must not have produced a premature null row
    assert(!rows.contains((4L, 104L, None)), rows.toString)
  }

  test("stream left-outer equals batch left join once every window is closed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val cRows = (0 until 20).map(i => (i.toLong % 7, 100L + i, ts(i)))
    val pRows = (0 until 12).map(i => (i.toLong % 7, 200L + i, ts(i + 2)))
    clicks.addData(cRows: _*)
    // a far-future sentinel on BOTH sides pushes the final watermark
    // past every click's window, so all outer results finalize
    clicks.addData((999L, 999L, ts(1000)))
    purchases.addData(pRows: _*)
    purchases.addData((998L, 998L, ts(1000)))

    val c = clicks.toDF.toDF("user_id", "click_id", "click_ts")
      .withWatermark("click_ts", "0 seconds")
    val p = purchases.toDF.toDF("p_user", "purchase_id", "purchase_ts")
      .withWatermark("purchase_ts", "0 seconds")
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 3 MINUTES"),
      "left_outer")
      .select(col("click_id"), col("purchase_id"))

    val ckpt = Files.createTempDirectory("graft-soj2-").toString
    val q = joined.writeStream.format("memory")
      .queryName("soj2_sink").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("soj2_sink").as[(Long, Option[Long])]
      .collect().toSet
    val batch = {
      val cb = cRows.toDF("user_id", "click_id", "click_ts")
      val pb = pRows.toDF("p_user", "purchase_id", "purchase_ts")
      cb.join(pb, col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 3 MINUTES"),
        "left_outer")
        .select(col("click_id"), col("purchase_id"))
        .as[(Long, Option[Long])].collect().toSet
    }
    // sentinels excluded: the batch frame never saw them
    val gotNoSentinel = got.filterNot(r => r._1 == 999L)
    assert(gotNoSentinel == batch,
      s"stream \\ batch: ${gotNoSentinel -- batch}; batch \\ stream: ${batch -- gotNoSentinel}")
  }
}
