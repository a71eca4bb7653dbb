package graft.streaming

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Per-key streaming top-k on Spark 4's `transformWithState` API — the
  * successor to `flatMapGroupsWithState` (arbitrary typed state
  * primitives, RocksDB-backed, TTL-capable). The reference's streaming
  * layer has no custom-state operator at all
  * (`pipelines/silver_pipeline.py` is stateless transforms + dedup);
  * this is the engine-native shape for "keep the k best per key,
  * forever, in bounded state".
  *
  * State per key is EXACTLY the current top-k list ((event_id, value)
  * pairs, k·16 bytes) — not the value history: each micro-batch merges
  * its rows into the k-list and re-emits the refreshed ranking (Update
  * mode). 10⁹ keys × k=3 is ~50 GB of RocksDB state spread across
  * executors, which is the design point; an unbounded per-key history
  * would be the 100 TB failure mode. */
class TopKProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double, Int)] {

  @transient private var best: ListState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    best = getHandle.getListState(
      "best",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
      timers: TimerValues): Iterator[(Long, Long, Double, Int)] = {
    // deterministic order: value desc, event_id asc breaks ties
    val ord = Ordering.by[(Long, Double), (Double, Long)](x => (-x._2, x._1))
    val merged = (best.get().toSeq ++ rows.map(r => (r._2, r._3)))
      .sorted(ord).take(k)
    best.put(merged.toArray)
    merged.iterator.zipWithIndex.map { case ((id, v), i) => (key, id, v, i + 1) }
  }
}

object StatefulTopK {

  /** The top-k stream: events keyed by user, state = the k best
    * (event_id, value) pairs per user. */
  def topKStream(events: Dataset[(Long, Long, Double)], k: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TopKProcessor(k), TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "event_id", "value", "rnk")
  }

  /** transformWithState requires the RocksDB state store; scope the
    * provider override to one streaming run. */
  def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Oracle-gated: one AvailableNow batch over the events table, so the
    * Update-mode emissions ARE the final per-user top-3 — exactly batch
    * `row_number() OVER (PARTITION BY user_id ORDER BY value DESC,
    * event_id) <= 3`. */
  val qStreamTopK: QueryDef = QueryDef.sql(
    "q_stream_topk",
    """SELECT user_id, event_id, value, rnk FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
      |  FROM events)
      |WHERE rnk <= 3""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Streams.eventsStream(spark, dir)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
    withRocksDb(spark) {
      Streams.runToMemory(topKStream(ev, 3), "q_stream_topk_sink", "update")
    }
  }

  val all: Seq[QueryDef] = Seq(qStreamTopK)
}
