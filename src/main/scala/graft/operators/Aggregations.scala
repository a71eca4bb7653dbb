package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Aggregation operators — SURVEY.md §2.4 (A1–A9), re-expressed over the
  * driver testdata.
  *
  * Scale notes: every query here is a hash aggregate with map-side partial
  * aggregation; group counts are bounded (flags, segments, event types,
  * users), so the shuffle carries partial states, not rows. `countDistinct`
  * (A1) expands to a two-phase aggregate; acceptable because the distinct
  * key (order ids per customer) is co-partitioned with the group key.
  */
object Aggregations {

  /** Exact, order-independent sum: per-row double math is IEEE-deterministic,
    * the decimal cast fixes a per-row value, and decimal addition is
    * associative — so Spark and DuckDB agree bit-for-bit regardless of
    * partitioning. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 10)))
  private def money(c: Column): Column = round(c, 2).cast("double")

  /** Quotients are emitted UNROUNDED: both engines cast the identical exact
    * decimal sum to the identical double and perform the same IEEE division,
    * so the raw quotient is bit-deterministic — whereas `round(double, n)`
    * is implemented differently (BigDecimal HALF_UP on shortest-repr vs
    * binary scaling) and diverges on half-way ties. */
  private def ratio(c: Column): Column = c.cast("double")

  /** A1+A2: TPC-H-Q1-shaped pricing summary: multi-aggregate hash group-by
    * with sums, averages, conditional count, count(*). */
  val q1PricingSummary: QueryDef = QueryDef.sql(
    "q_agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order,
      |  count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS count_returned
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(dsum(col("l_quantity"))).as("sum_qty"),
        money(dsum(col("l_extendedprice"))).as("sum_base_price"),
        money(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        money(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        ratio(dsum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        ratio(dsum(col("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"),
        count(when(col("l_returnflag") === "R", 1)).as("count_returned"))
  }

  /** A1: customer lifetime metrics — mirrors dim_eater's groupBy-agg
    * (reference gold_pipeline.py:358-369): count, sum, avg, countDistinct.
    * `countDistinct(o_orderkey)` is exact, matching the reference's choice
    * of exact distinct (SURVEY §2.4). */
  val qCustomerLifetime: QueryDef = QueryDef.sql(
    "q_agg_customer_lifetime",
    """SELECT o_custkey,
      |  count(*) AS total_orders,
      |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS lifetime_spend,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) / count(*) AS avg_order_value,
      |  CAST(min(o_orderdate) AS TIMESTAMP) AS first_order_at,
      |  CAST(max(o_orderdate) AS TIMESTAMP) AS last_order_at
      |FROM orders
      |GROUP BY o_custkey""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("total_orders"),
        countDistinct(col("o_orderkey")).as("distinct_orders"),
        money(dsum(col("o_totalprice"))).as("lifetime_spend"),
        ratio(dsum(col("o_totalprice")).cast("double") / count(lit(1))).as("avg_order_value"),
        min(col("o_orderdate")).as("first_order_at"),
        max(col("o_orderdate")).as("last_order_at"))
  }

  /** A2+A3: conditional counts and ratio-of-aggregates (reference courier
    * on-time-rate, gold_pipeline.py:490-506). */
  val qConditionalRates: QueryDef = QueryDef.sql(
    "q_agg_conditional_rates",
    """SELECT event_type,
      |  count(*) AS n_events,
      |  count(CASE WHEN value > 50 THEN 1 END) AS n_high_value,
      |  CAST(count(CASE WHEN value > 50 THEN 1 END) * 100.0 / count(*) AS DOUBLE) AS high_value_rate,
      |  CAST(round(sum(CAST(CASE WHEN value > 50 THEN value ELSE 0 END AS DECIMAL(38,10))), 2) AS DOUBLE) AS high_value_total
      |FROM events
      |GROUP BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("value") > 50, 1)).as("n_high_value"),
        ratio(count(when(col("value") > 50, 1)) * lit(100.0) / count(lit(1))).as("high_value_rate"),
        money(dsum(when(col("value") > 50, col("value")).otherwise(lit(0.0)))).as("high_value_total"))
  }

  /** A6: the event-log pivot — the reference's core trip_fact operator
    * (gold_pipeline.py:674-704): one row per entity via
    * `max(CASE WHEN event_type = X THEN ts END)` conditional aggregation.
    * Single shuffle on the group key; no join, no explode — this shape
    * scales linearly and is the canonical way to fold an event log at
    * 100 TB. */
  val qEventPivot: QueryDef = QueryDef.sql(
    "q_agg_event_pivot",
    """SELECT user_id,
      |  CAST(max(CASE WHEN event_type = 'signup' THEN ts END) AS TIMESTAMP) AS signup_at,
      |  CAST(max(CASE WHEN event_type = 'view' THEN ts END) AS TIMESTAMP) AS last_view_at,
      |  CAST(max(CASE WHEN event_type = 'click' THEN ts END) AS TIMESTAMP) AS last_click_at,
      |  CAST(max(CASE WHEN event_type = 'purchase' THEN ts END) AS TIMESTAMP) AS last_purchase_at,
      |  CAST(max(CASE WHEN event_type = 'error' THEN ts END) AS TIMESTAMP) AS last_error_at,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
      |  CAST(round(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS DECIMAL(38,10))), 2) AS DOUBLE) AS purchase_value,
      |  CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0 THEN 'buyer' ELSE 'browser' END AS user_status
      |FROM events
      |GROUP BY user_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    def lastAt(t: String, as: String): Column =
      max(when(col("event_type") === t, col("ts"))).as(as)
    ev.groupBy(col("user_id"))
      .agg(
        lastAt("signup", "signup_at"),
        lastAt("view", "last_view_at"),
        lastAt("click", "last_click_at"),
        lastAt("purchase", "last_purchase_at"),
        lastAt("error", "last_error_at"),
        count(when(col("event_type") === "view", 1)).as("n_views"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        money(dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))).as("purchase_value"),
        when(count(when(col("event_type") === "purchase", 1)) > 0, lit("buyer"))
          .otherwise(lit("browser")).as("user_status"))
  }

  /** A7: group-wise max — SCD2 max-version lookup shape
    * (gold_pipeline.py:198-202). */
  val qGroupwiseMax: QueryDef = QueryDef.sql(
    "q_agg_groupwise_max",
    """SELECT l_orderkey, CAST(max(l_linenumber) AS INT) AS max_line,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_linenumber")).as("max_line"), count(lit(1)).as("n_lines"))
  }

  /** A9: union'd per-table count report (init_cloud_sql.sql:237-243). */
  val qCountReport: QueryDef = QueryDef.sql(
    "q_agg_count_report",
    """SELECT 'customer' AS table_name, count(*) AS n FROM customer
      |UNION ALL SELECT 'orders', count(*) FROM orders
      |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
      |UNION ALL SELECT 'supplier', count(*) FROM supplier
      |UNION ALL SELECT 'part', count(*) FROM part""".stripMargin) { (spark, dir) =>
    Seq("customer", "orders", "lineitem", "supplier", "part")
      .map(t => Tables.load(spark, dir, t)
        .agg(count(lit(1)).as("n"))
        .select(lit(t).as("table_name"), col("n")))
      .reduce(_ union _)
  }

  /** Rollup: one pass producing every prefix grouping level
    * (flag×status, flag, grand total) — subtotal reports without N
    * separate aggregations. Physically a single Expand + hash aggregate:
    * the shuffle carries one partial state per (row, level), still
    * bounded by group cardinality × levels. */
  val qRollup: QueryDef = QueryDef.sql(
    "q_agg_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(money(dsum(col("l_extendedprice"))).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Exact interpolated percentiles (median / p95) per group — both
    * engines use the same linear-interpolation definition over the same
    * IEEE doubles, so the results are bit-comparable. At scale `
    * percentile` holds the group's values; for 100 TB pipelines the
    * approximate sketch (`percentile_approx`) is the drop-in — exact
    * here because the oracle must match bit-for-bit. */
  val qPercentiles: QueryDef = QueryDef.sql(
    "q_agg_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS median_price,
      |  quantile_cont(l_extendedprice, 0.95) AS p95_price,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    // One percentile aggregate with an array of targets — a single
    // buffer of the group's values serves both quantiles; two separate
    // aggregates would each buffer (and sort) the full group.
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("median_price"),
        element_at(col("ps"), 2).as("p95_price"),
        col("n"))
  }

  /** The 100 TB path for distinct counts: an HLL++ sketch next to the
    * exact count. Exact countDistinct shuffles every distinct key; the
    * sketch shuffles one fixed-size buffer per group and merges — the
    * only option when the distinct set itself doesn't fit. The sketch
    * estimate itself is algorithm-specific (not SQL-reproducible in the
    * oracle engine), so the verifiable output is the exact count plus a
    * boolean asserting the estimate landed within 5× the configured rsd
    * — the oracle expects TRUE, making the sketch's accuracy itself
    * hash-checked; SketchSpec additionally bounds the raw error. */
  val qApproxDistinct: QueryDef = QueryDef.sql(
    "q_agg_approx_distinct",
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  TRUE AS sketch_within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    // Pre-dedup (flag, orderkey) pairs with a map-side partial aggregate,
    // then count + sketch the already-distinct keys: HLL insertion is
    // idempotent, so the estimate is identical, but the planner's
    // Expand-based distinct rewrite is avoided and the wide HLL buffer
    // only sees one row per distinct key.
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_orderkey")).agg(Map.empty[String, String])
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("exact_orders"),
        (abs(approx_count_distinct(col("l_orderkey"), 0.02) - count(lit(1)))
          <= count(lit(1)) * lit(0.10)).as("sketch_within_bound"))
  }

  /** Cube: all 2^k grouping combinations — the ad-hoc-slice companion to
    * [[qRollup]]'s hierarchy. Deliberately NOT `Dataset.cube`: the native
    * operator Expands every input row ×2^k before aggregating, so the
    * hash aggregate processes 2^k× the data. Instead aggregate ONCE at
    * the finest grain and derive every coarser level by re-aggregating
    * that (tiny) result — decimal partial sums and counts re-aggregate
    * exactly, so the answer is identical and the base table is scanned
    * and aggregated once. ([[qRollup]] keeps the native operator form on
    * purpose — both shapes belong in the surface.) */
  val qCube: QueryDef = QueryDef.sql(
    "q_agg_cube",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    val fine = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
      .localCheckpoint(true) // one scan feeds all four levels
    val nullFlag = lit(null).cast("string")
    val both = fine
    val byFlag = fine.groupBy(col("l_returnflag"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      .select(col("l_returnflag"), nullFlag.as("l_linestatus"), col("s"), col("n"))
    val byStatus = fine.groupBy(col("l_linestatus"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      .select(nullFlag.as("l_returnflag"), col("l_linestatus"), col("s"), col("n"))
    val grand = fine.agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
      .select(nullFlag.as("l_returnflag"), nullFlag.as("l_linestatus"), col("s"), col("n"))
    both.select(col("l_returnflag"), col("l_linestatus"), col("s"), col("n"))
      .unionByName(byFlag).unionByName(byStatus).unionByName(grand)
      .select(col("l_returnflag"), col("l_linestatus"),
        money(col("s")).as("revenue"), col("n"))
  }

  /** Native relational pivot (`groupBy().pivot()`) — same semantics as
    * [[qEventPivot]]'s hand-written `count(when(...))` fold but through
    * Spark's pivot operator with an EXPLICIT value list: without one,
    * pivot runs a driver-side distinct-values job and the output schema
    * depends on the data — both unacceptable at 100 TB. Missing cells
    * are count=null in pivot; coalesce to 0 for the relational answer. */
  val qPivotNative: QueryDef = QueryDef.sql(
    "q_agg_pivot_counts",
    """SELECT user_id,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
      |FROM events GROUP BY user_id""".stripMargin) { (spark, dir) =>
    val types = Seq("view", "click", "purchase", "error")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  /** Quantile sketch — the 100 TB path for percentiles: a fixed-size
    * mergeable summary instead of [[qPercentiles]]'s full value buffer.
    * Like [[qApproxDistinct]], the estimate is algorithm-specific, so the
    * verified output is the exact quantile plus a boolean pinning the
    * sketch within 5% of it (at accuracy 10000 the rank error is 0.01%,
    * so the value-space slack is enormous; the oracle expects TRUE). */
  val qQuantileSketch: QueryDef = QueryDef.sql(
    "q_agg_quantile_sketch",
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS exact_median,
      |  TRUE AS sketch_within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx_median"))
      .select(col("l_returnflag"), col("exact_median"),
        (abs(col("approx_median") - col("exact_median"))
          <= abs(col("exact_median")) * lit(0.05)).as("sketch_within_bound"))
  }

  /** Custom typed Aggregator: exact order-independent population variance
    * (see [[graft.functions.ExactVariance]] for why double `var_pop`
    * can't pass a bit-exact gate). Values quantized to a 1e-6 grid; both
    * moments summed exactly in unbounded integers; the one double
    * conversion happens in a fixed operation order mirrored by the
    * oracle, then rescales from grid units² to value units². */
  val qExactVariance: QueryDef = QueryDef.sql(
    "q_func_exact_variance",
    """SELECT event_type, count(*) AS n,
      |  (CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) / count(*)
      |    - (CAST(sum(v) AS DOUBLE) / count(*)) * (CAST(sum(v) AS DOUBLE) / count(*)))
      |    / 1e12 AS value_var
      |FROM (SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v FROM events)
      |GROUP BY event_type""".stripMargin) { (spark, dir) =>
    val varPopQ = udaf(graft.functions.ExactVariance.VarPopQ)
    Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * lit(1000000L), 0).cast("long").as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (varPopQ(col("v")) / lit(1e12)).as("value_var"))
  }

  /** Funnel analysis over the event log: per-user first-touch times via
    * conditional min (ONE pass, one shuffle on user_id — the same fold
    * shape as [[qEventPivot]]), then ordered-stage counts: a user
    * advances a stage only if the later event first happens AFTER the
    * earlier one. No joins, no window — the event log folds once however
    * large it is. */
  val qFunnel: QueryDef = QueryDef.sql(
    "q_agg_funnel",
    """SELECT
      |  count(first_view) AS n_viewed,
      |  count(CASE WHEN first_click > first_view THEN 1 END) AS n_clicked_after_view,
      |  count(CASE WHEN first_purchase > first_click AND first_click > first_view
      |             THEN 1 END) AS n_full_funnel
      |FROM (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      |  FROM events GROUP BY user_id)""".stripMargin) { (spark, dir) =>
    def firstAt(t: String): Column = min(when(col("event_type") === t, col("ts")))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(firstAt("view").as("first_view"), firstAt("click").as("first_click"),
        firstAt("purchase").as("first_purchase"))
      .agg(
        count(col("first_view")).as("n_viewed"),
        count(when(col("first_click") > col("first_view"), 1)).as("n_clicked_after_view"),
        count(when(col("first_purchase") > col("first_click")
          && col("first_click") > col("first_view"), 1)).as("n_full_funnel"))
  }

  /** grouping_id over a rollup — the bitmask that tells a subtotal row's
    * NULL apart from a NULL in the data, without which rollup output is
    * unconsumable on nullable group keys. Same Expand physical shape as
    * [[qRollup]]; the id is computed per expansion level, not per row. */
  val qGroupingId: QueryDef = QueryDef.sql(
    "q_agg_grouping_id",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("n"))
  }

  /** Arbitrary GROUPING SETS — levels rollup/cube can't express: the
    * (flag, status) grain plus a status-only subtotal plus the grand
    * total, but NO flag-only level. One Expand + hash aggregate exactly
    * like rollup — the shuffle carries one partial per (row, declared
    * set), so cost scales with the sets you ask for, not 2^keys. */
  val qGroupingSets: QueryDef = QueryDef.sql(
    "q_agg_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin) {
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          money(dsum(col("l_extendedprice"))).as("revenue"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("revenue"), col("n"))
  }

  /** Unpivot (melt) — the inverse of [[qPivotNative]]: wide per-type
    * count columns back to long (user, event_type, n) form. Narrow
    * row-local expansion (each input row emits k rows, no shuffle);
    * the explicit column list keeps the output schema data-independent,
    * same rule as the pivot side. */
  val qUnpivot: QueryDef = QueryDef.sql(
    "q_agg_unpivot",
    """SELECT user_id, metric, n FROM (
      |  SELECT user_id,
      |    count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase
      |  FROM events GROUP BY user_id)
      |UNPIVOT (n FOR metric IN (n_view, n_click, n_purchase))""".stripMargin) {
    (spark, dir) =>
      val wide = Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .agg(count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
      wide.unpivot(Array(col("user_id")),
        Array(col("n_view"), col("n_click"), col("n_purchase")),
        "metric", "n")
  }

  /** Deterministic Pearson correlation — `corr()` merges running double
    * moments in partition order, so its low bits change with the
    * partitioning and can never pass a bit-exact gate. Here every moment
    * (Σx, Σy, Σxy, Σx², Σy²) is an exact decimal sum over fixed-point
    * inputs, and corr is assembled from them in one fixed double
    * operation order — same technique as [[qExactVariance]], expressed
    * in pure SQL. Quantity in 1e-2 grid, price in 1e-2 grid. */
  val qExactCorr: QueryDef = QueryDef.sql(
    "q_func_exact_corr",
    """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  (sxy / n - (sx / n) * (sy / n))
      |    / (sqrt(sxx / n - (sx / n) * (sx / n)) * sqrt(syy / n - (sy / n) * (sy / n)))
      |    AS qty_price_corr
      |FROM (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      |  FROM (SELECT l_returnflag,
      |      CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |      CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |    FROM lineitem)
      |  GROUP BY l_returnflag)""".stripMargin) { (spark, dir) =>
    val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
    val quant = Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      round(col("l_quantity") * 100, 0).cast("long").as("x"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("y"))
    val m = quant.groupBy(col("l_returnflag")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x").cast(d380)).cast("double").as("sx"),
      sum(col("y").cast(d380)).cast("double").as("sy"),
      sum((col("x").cast(d380) * col("y")).cast(d380)).cast("double").as("sxy"),
      sum((col("x").cast(d380) * col("x")).cast(d380)).cast("double").as("sxx"),
      sum((col("y").cast(d380) * col("y")).cast(d380)).cast("double").as("syy"))
    m.select(col("l_returnflag"), col("n").cast("long").as("n"),
      ((col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n")))
        / (sqrt(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))
          * sqrt(col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n")))))
        .as("qty_price_corr"))
  }

  /** argmax (`max_by`) — the row-attribute-at-the-max shape (favorite
    * merchant, best order) WITHOUT a window or self-join: one hash
    * aggregate carrying (arg, max-key) state. Ties are resolved by a
    * fixed-width sortable string key (price then orderkey), because both
    * engines' argmax picks an arbitrary tied row otherwise — the same
    * determinism rule as every window tiebreaker here. */
  val qArgMax: QueryDef = QueryDef.sql(
    "q_agg_argmax",
    """SELECT o_custkey,
      |  arg_max(o_orderkey,
      |    lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 18, '0')
      |      || '#' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS best_order,
      |  max(o_totalprice) AS best_price
      |FROM orders GROUP BY o_custkey""".stripMargin) { (spark, dir) =>
    val sortKey = concat(
      lpad(round(col("o_totalprice") * 100, 0).cast("long").cast("string"), 18, "0"),
      lit("#"), lpad(col("o_orderkey").cast("string"), 12, "0"))
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max_by(col("o_orderkey"), sortKey).as("best_order"),
        max(col("o_totalprice")).as("best_price"))
  }

  val all: Seq[QueryDef] = Seq(
    q1PricingSummary, qCustomerLifetime, qConditionalRates,
    qEventPivot, qGroupwiseMax, qCountReport, qRollup, qCube, qPercentiles,
    qApproxDistinct, qQuantileSketch, qPivotNative, qExactVariance, qFunnel,
    qGroupingId, qGroupingSets, qUnpivot, qExactCorr, qArgMax)
}
