package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions & deduplication — SURVEY.md §2.5 (W1–W4).
  *
  * Scale notes: every window here is PARTITIONED (by user/order key) — the
  * reference's unpartitioned `row_number()` surrogate key
  * (gold_pipeline.py:323-325) funnels all rows through one partition and is
  * deliberately NOT reproduced; the same need is served by
  * `xxhash64`/dense-key assignment (see Scd2 module). Ordering keys always
  * include a unique tiebreaker so results are deterministic.
  */
object Windows {

  /** W1 + W4: ranking family — row_number / rank / dense_rank over a
    * partitioned, totally-ordered window. */
  val qRanking: QueryDef = QueryDef.sql(
    "q_window_ranking",
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS rn,
      |  rank()       OVER w AS rnk,
      |  dense_rank() OVER w AS drnk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"))
  }

  /** W4: lag/lead analytics — inter-event gap per user (sessionization
    * primitive). Gap computed on exact microsecond longs, not doubles. */
  val qLagLead: QueryDef = QueryDef.sql(
    "q_window_lag_lead",
    """SELECT user_id, event_id,
      |  CAST(ts AS TIMESTAMP) AS ts,
      |  CAST(lag(ts)  OVER w AS TIMESTAMP) AS prev_ts,
      |  CAST(lead(ts) OVER w AS TIMESTAMP) AS next_ts,
      |  (epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))) // 1000000 AS gap_seconds
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), col("ts"),
      lag(col("ts"), 1).over(w).as("prev_ts"),
      lead(col("ts"), 1).over(w).as("next_ts"),
      floor((unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        / lit(1000000L)).as("gap_seconds"))
  }

  /** W4: running aggregate — cumulative revenue per customer over order
    * history (rowsBetween unboundedPreceding..current). Decimal running sum
    * so every prefix is exact in both engines. */
  val qRunningSum: QueryDef = QueryDef.sql(
    "q_window_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
      |FROM orders""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      round(sum(col("o_totalprice").cast(DecimalType(38, 10))).over(w), 2)
        .cast("double").as("running_spend"))
  }

  /** W2/W3: deterministic deduplication — keep the first row per key under
    * an explicit total order (the scalable, reproducible form of
    * `dropDuplicates`; reference silver_pipeline.py:215,271,321 keeps an
    * arbitrary row). One shuffle on the dedup key. */
  val qDedupFirstPerKey: QueryDef = QueryDef.sql(
    "q_window_dedup_first",
    """SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM (
      |  SELECT user_id, event_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
  }

  /** SCD2-as-window: reconstruct type-2 validity intervals from an event
    * log — each (user, event) version is effective until the next event;
    * the last one is current (lead() + row_number(), the scalable
    * formulation of the reference's SCD2 semantics,
    * gold_pipeline.py:112-227). */
  val qScd2Intervals: QueryDef = QueryDef.sql(
    "q_window_scd2_intervals",
    """SELECT user_id, event_id,
      |  CAST(ts AS TIMESTAMP) AS effective_start,
      |  CAST(lead(ts) OVER w AS TIMESTAMP) AS effective_end,
      |  CAST(row_number() OVER w AS INT) AS version_number,
      |  (lead(ts) OVER w IS NULL) AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir).select(
      col("user_id"), col("event_id"),
      col("ts").as("effective_start"),
      lead(col("ts"), 1).over(w).as("effective_end"),
      row_number().over(w).as("version_number"),
      lead(col("ts"), 1).over(w).isNull.as("is_current"))
  }

  /** Distribution analytics — ntile quartiles, percent_rank, cume_dist
    * per market segment. Partitioned windows with a unique tiebreaker
    * (price, custkey), so ranks are deterministic and the partition sort
    * distributes across segments. percent_rank/cume_dist are one IEEE
    * division from exact integer ranks — bit-stable in both engines. */
  val qDistribution: QueryDef = QueryDef.sql(
    "q_window_distribution",
    """SELECT c_custkey, c_mktsegment,
      |  CAST(ntile(4) OVER w AS INT) AS balance_quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin) {
    (spark, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(spark, dir).select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("balance_quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  /** Per-key top-k through the engine's custom physical operator
    * ([[graft.plans.TopKPerKey]]): bounded heaps + a partial pass before
    * the exchange, so the shuffle moves ≤ k rows per key per input
    * partition — the decomposable replacement for the row_number window
    * idiom (which sorts and shuffles every row). The oracle states the
    * same semantics as the window form. */
  val qTopKPerKey: QueryDef = QueryDef.sql(
    "q_topk_per_key",
    """SELECT o_orderkey, o_orderpriority, o_totalprice
      |FROM orders
      |QUALIFY row_number() OVER (
      |  PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice DESC, o_orderkey) <= 5""".stripMargin) { (spark, dir) =>
    graft.plans.TopK.perKey(
      Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
      Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 5)
  }

  /** Frame-based value functions — first/last/nth event value inside an
    * explicit ROWS frame. last_value over the default frame is the
    * classic silent bug (frame ends at CURRENT ROW, so "last" = current);
    * the unbounded frame here is the correct form, stated identically in
    * both engines. */
  val qFrameValues: QueryDef = QueryDef.sql(
    "q_window_frame_values",
    """SELECT user_id, event_id,
      |  first_value(value) OVER w AS first_in_user,
      |  last_value(value) OVER w AS last_in_user,
      |  nth_value(value, 2) OVER w AS second_in_user
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) {
    (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(spark, dir).select(
        col("user_id"), col("event_id"),
        first(col("value")).over(w).as("first_in_user"),
        last(col("value")).over(w).as("last_in_user"),
        nth_value(col("value"), 2).over(w).as("second_in_user"))
  }

  /** RANGE frame over event time — the trailing-hour running metric
    * (count + exact decimal sum of the past hour's values per user).
    * RANGE, not ROWS: the frame is defined by time distance, so ties and
    * bursts are handled by semantics rather than row position.
    * Partitioned per user; each partition sorts once and the frame is a
    * sliding pointer pair over it. */
  val qTimeRange: QueryDef = QueryDef.sql(
    "q_window_time_range",
    """SELECT user_id, event_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
      |  CAST(round(sum(CAST(value AS DECIMAL(38,10))) OVER w, 2) AS DOUBLE) AS sum_last_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin) {
    (spark, dir) =>
      Tables.events(spark, dir).createOrReplaceTempView("ev_time_range")
      spark.sql(
        """SELECT user_id, event_id,
          |  count(*) OVER w AS n_last_hour,
          |  CAST(round(sum(CAST(value AS DECIMAL(38,10))) OVER w, 2) AS DOUBLE) AS sum_last_hour
          |FROM ev_time_range
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(
    qRanking, qLagLead, qRunningSum, qDedupFirstPerKey, qScd2Intervals,
    qDistribution, qTopKPerKey, qFrameValues, qTimeRange)
}
