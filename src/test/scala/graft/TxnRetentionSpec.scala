package graft

import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** `delta.setTransactionRetentionDuration`: SetTransaction entries whose
  * `lastUpdated` aged past the window drop at CHECKPOINT time (the
  * protocol's guard against unbounded txn tables under churning stream
  * ids); stamps are preserved through checkpoints, and entries without
  * a stamp never expire. */
class TxnRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-txnret-").toString + "/t"

  private def rawCommit(t: String, v: Long, lines: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(t + f"/_delta_log/$v%020d.json")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  test("expired txns drop at checkpoint; unstamped and fresh ones survive") {
    val t = fresh()
    val old = System.currentTimeMillis() - 100L * 24 * 3600 * 1000
    DeltaLog.write(spark, Seq(1L).toDF("k"), t,
      properties = Map("delta.setTransactionRetentionDuration" -> "interval 30 days"))
    DeltaLog.write(spark, Seq(2L).toDF("k"), t, "append",
      txn = Some(("fresh-app", 5L)))
    // a 100-day-old stream id and an unstamped foreign one
    rawCommit(t, 2L, Seq(
      s"""{"commitInfo":{"timestamp":$old,"operation":"WRITE"}}""",
      s"""{"txn":{"appId":"stale-app","version":3,"lastUpdated":$old}}""",
      s"""{"txn":{"appId":"nostamp-app","version":9}}"""))
    val pre = DeltaLog.snapshot(spark, t)
    assert(pre.txns.keySet == Set("fresh-app", "stale-app", "nostamp-app"), pre.txns)
    assert(pre.txnTimes.get("stale-app").contains(old))
    assert(!pre.txnTimes.contains("nostamp-app"))

    DeltaLog.checkpoint(spark, t)
    // replay now starts at the checkpoint: the stale id is gone, the
    // fresh one kept with its ORIGINAL stamp, the unstamped one immortal
    val post = DeltaLog.snapshot(spark, t)
    assert(post.txns.keySet == Set("fresh-app", "nostamp-app"), post.txns)
    assert(post.txns.get("fresh-app").contains(5L))
    assert(post.txnTimes.get("fresh-app") == pre.txnTimes.get("fresh-app"),
      s"${post.txnTimes} vs ${pre.txnTimes}")
  }

  test("without the property every txn survives the checkpoint") {
    val t = fresh()
    val old = System.currentTimeMillis() - 100L * 24 * 3600 * 1000
    DeltaLog.write(spark, Seq(1L).toDF("k"), t)
    rawCommit(t, 1L, Seq(
      s"""{"commitInfo":{"timestamp":$old,"operation":"WRITE"}}""",
      s"""{"txn":{"appId":"stale-app","version":3,"lastUpdated":$old}}"""))
    DeltaLog.checkpoint(spark, t)
    assert(DeltaLog.snapshot(spark, t).txns.keySet == Set("stale-app"))
  }
}
