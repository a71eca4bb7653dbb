package graft

import java.nio.file.Files

import graft.streaming.StatefulTopK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Spark 4 `transformWithState` top-k ([[graft.streaming.TopKProcessor]]):
  * per-key state is exactly the k-best list, carried across micro-batches
  * in the RocksDB store, re-emitted refreshed on every batch that touches
  * the key. */
class StatefulTopKSpec extends SparkSpec {
  import spark.implicits._

  test("state evolves across micro-batches; per-batch emissions stay <= k per key") {
    StatefulTopK.withRocksDb(spark) {
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, Long, Double)]
      val out = StatefulTopK.topKStream(in.toDS(), k = 2)
      val ckpt = Files.createTempDirectory("graft-tws-").toString
      // ONE continuous query; processAllAvailable() forms the batch
      // boundaries (the memory sink refuses checkpoint recovery, so a
      // start-per-batch structure is not possible)
      val q = out.writeStream.queryName("tws_topk")
        .outputMode("update").format("memory")
        .option("checkpointLocation", ckpt).start()
      def rows(): Seq[(Long, Long, Double, Int)] =
        spark.table("tws_topk").as[(Long, Long, Double, Int)].collect().toSeq
      try {
        // batch 1: two keys
        in.addData((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 1.0), (2L, 20L, 4.0))
        q.processAllAvailable()
        val b1 = rows()
        assert(b1.toSet == Set(
          (1L, 11L, 9.0, 1), (1L, 10L, 5.0, 2), (2L, 20L, 4.0, 1)), b1)

        // batch 2: key 1 gets a new #1; key 3 appears; key 2 untouched
        // (Update mode: untouched keys emit nothing)
        in.addData((1L, 13L, 99.0), (3L, 30L, 7.0))
        q.processAllAvailable()
        val b2 = rows().diff(b1)
        assert(b2.toSet == Set(
          (1L, 13L, 99.0, 1), (1L, 11L, 9.0, 2), (3L, 30L, 7.0, 1)), b2)
        // the k=2 bound held: the old (1,10,5.0) never reappears —
        // state is the top-k list, not the value history
        assert(!b2.exists(r => r._1 == 1L && r._2 == 10L), b2)
        assert(!b2.exists(_._1 == 2L), b2)
      } finally q.stop()
    }
  }

  test("ties break deterministically by event_id") {
    StatefulTopK.withRocksDb(spark) {
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, Long, Double)]
      val out = StatefulTopK.topKStream(in.toDS(), k = 3)
      val ckpt = Files.createTempDirectory("graft-tws2-").toString
      in.addData((7L, 103L, 5.0), (7L, 101L, 5.0), (7L, 102L, 5.0), (7L, 104L, 5.0))
      out.writeStream.queryName("tws_ties").outputMode("update")
        .format("memory").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      val got = spark.table("tws_ties").as[(Long, Long, Double, Int)]
        .collect().toSeq.sortBy(_._4)
      assert(got == Seq(
        (7L, 101L, 5.0, 1), (7L, 102L, 5.0, 2), (7L, 103L, 5.0, 3)), got)
    }
  }
}
