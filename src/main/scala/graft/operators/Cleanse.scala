package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Silver-layer cleanse / normalize operators — SURVEY.md §2.2 (P4, P7–P9)
  * and §2.8 string functions.
  *
  * Mirrors the reference's silver entity cleanse
  * (/root/reference/pipelines/silver_pipeline.py:191-215): trim/lower/upper
  * normalization, regexp_replace scrubbing, and the email like/rlike
  * validation flags (/root/reference/pipelines/silver_pipeline.py:179-181),
  * re-expressed over the driver's `customer`/`orders` tables.
  *
  * Scale notes: pure narrow projections/filters — no shuffle at any width;
  * every function here is codegen'd by Catalyst into the scan stage, and
  * the filter queries push their predicates into the parquet reader.
  */
object Cleanse {

  /** F-str + P9: the cleanse projection — trim/lower/upper,
    * regexp_replace scrubbing, concat_ws natural key, lpad key padding,
    * and a rlike email-shape validation flag on a synthesized email. */
  val qCleanseCustomer: QueryDef = QueryDef.sql(
    "q_cleanse_customer",
    """SELECT c_custkey,
      |  trim(c_name) AS name,
      |  lower(trim(c_name)) AS name_lower,
      |  upper(trim(c_mktsegment)) AS segment,
      |  regexp_replace(c_name, '[^0-9]', '', 'g') AS name_digits,
      |  lower(replace(c_name, '#', '.')) || '@example.com' AS email,
      |  regexp_matches(lower(replace(c_name, '#', '.')) || '@example.com',
      |    '^[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}$') AS email_valid,
      |  concat_ws('||', c_name, c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS nk,
      |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS custkey_padded
      |FROM customer""".stripMargin) { (spark, dir) =>
    val email = concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com"))
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      trim(col("c_name")).as("name"),
      lower(trim(col("c_name"))).as("name_lower"),
      upper(trim(col("c_mktsegment"))).as("segment"),
      regexp_replace(col("c_name"), "[^0-9]", "").as("name_digits"),
      email.as("email"),
      email.rlike("^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}$").as("email_valid"),
      concat_ws("||", col("c_name"), col("c_mktsegment"),
        col("c_nationkey").cast("string")).as("nk"),
      lpad(col("c_custkey").cast("string"), 12, "0").as("custkey_padded"))
  }

  /** P4 + P7 + P8 + P9: predicate family — isin / negated isin / between /
    * like / startswith, plus a `drop` of a scanned column. Filters reach
    * the parquet scan as pushed predicates. */
  val qFilterPredicates: QueryDef = QueryDef.sql(
    "q_filter_predicates",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('O', 'F')
      |  AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
      |  AND o_totalprice BETWEEN 1000 AND 150000
      |  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      |  AND o_orderpriority LIKE '_-%'""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .filter(!col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED"))
      .filter(col("o_totalprice").between(1000, 150000))
      .filter(col("o_orderpriority").startsWith("1-") ||
        col("o_orderpriority").startsWith("2-"))
      .filter(col("o_orderpriority").like("_-%"))
      .drop("o_orderdate")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice").cast("double").as("o_totalprice"))
  }

  /** P6 + F-cond: null predicates and nullif/coalesce/when/otherwise
    * defaulting — null-safe derivation over lineitem return flags. */
  val qNullHandling: QueryDef = QueryDef.sql(
    "q_cleanse_null_handling",
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_returnflag = 'R' THEN 'returned'
      |       WHEN l_returnflag = 'A' THEN 'accepted'
      |       ELSE 'none' END AS return_status,
      |  coalesce(nullif(l_linestatus, 'O'), 'CLOSED') AS line_state,
      |  l_shipdate IS NOT NULL AS has_shipdate,
      |  CAST(CASE WHEN l_discount > 0 THEN l_discount END AS DOUBLE) AS discount_or_null
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_returnflag") === "R", "returned")
        .when(col("l_returnflag") === "A", "accepted")
        .otherwise("none").as("return_status"),
      coalesce(nullif(col("l_linestatus"), lit("O")), lit("CLOSED")).as("line_state"),
      col("l_shipdate").isNotNull.as("has_shipdate"),
      when(col("l_discount") > 0, col("l_discount")).cast("double")
        .as("discount_or_null"))
  }

  /** O1 + O2: global order + limit — top-N spenders with a total
    * tiebreak so the cut is deterministic. Spark runs this as
    * TakeOrderedAndProject (per-partition top-N + merge), not a full
    * global sort — the only safe shape for LIMIT at 100 TB. */
  val qOrderTopN: QueryDef = QueryDef.sql(
    "q_order_topn",
    """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Set operations (beyond the reference's union-only surface):
    * INTERSECT and EXCEPT, each a hash-partition shuffle on the full
    * row — same scale shape as distinct. Labeled and unioned so one
    * result verifies both. */
  val qSetOps: QueryDef = QueryDef.sql(
    "q_set_ops",
    """WITH high AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000),
      |     buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
      |SELECT 'rich_buyer' AS side, custkey FROM (SELECT custkey FROM high INTERSECT SELECT custkey FROM buyers)
      |UNION ALL
      |SELECT 'rich_no_orders' AS side, custkey FROM (SELECT custkey FROM high EXCEPT SELECT custkey FROM buyers)""".stripMargin) {
    (spark, dir) =>
      val high = Tables.customer(spark, dir)
        .where(col("c_acctbal") > 7000)
        .select(col("c_custkey").as("custkey"))
      val buyers = Tables.orders(spark, dir)
        .select(col("o_custkey").as("custkey")).distinct()
      high.intersect(buyers).select(lit("rich_buyer").as("side"), col("custkey"))
        .unionByName(
          high.except(buyers).select(lit("rich_no_orders").as("side"), col("custkey")))
  }

  /** O1 proper: full distributed total sort (range-partitioned exchange
    * with sampled split points) carrying a GLOBAL rank computed the
    * scalable way: within-partition row_number (partitioned by the
    * range-sort's own partition id — every window partition is one task)
    * plus broadcast per-partition offsets. A `row_number() OVER (ORDER
    * BY …)` would funnel every row through one partition — the exact
    * single-partition anti-pattern this engine refuses elsewhere (the
    * oracle states it that way only because the oracle does not
    * distribute). Total order (unique tiebreak) means range partitioning
    * cannot split equal keys, so offset+local rank IS the global rank. */
  val qGlobalSort: QueryDef = QueryDef.sql(
    "q_order_global_sort",
    """SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
      |  CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS global_rank
      |FROM customer""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    // ONE sort: localCheckpoint (eager) freezes the range-partitioned
    // result, so the counts job and the rank job both read the same
    // materialized partitions. Without it they'd be two independent jobs
    // whose RangePartitioners can sample different split points — the
    // collected offsets would silently mismatch the second job's __pid
    // values at scale (fully-sampled tiny partitions hide it locally).
    val sorted = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal").cast("double").as("acctbal"))
      .orderBy(col("acctbal").desc, col("c_custkey"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0 -> 0L) { case ((_, acc), (pid, n)) => pid -> (acc + n) }
      .init.map { case (_, off) => off } // offset of partition i = rows before it
    val offsetCol = counts.map(_._1).zip(offsets)
      .foldLeft(lit(0L)) { case (c, (pid, off)) => when(col("__pid") === pid, lit(off)).otherwise(c) }
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("acctbal").desc, col("c_custkey"))
    sorted
      .withColumn("global_rank", (offsetCol + row_number().over(wLocal)).cast("long"))
      .drop("__pid")
  }

  /** The remaining F-str surface in one narrow projection: pad, reverse,
    * translate, replace, position, repeat, left/right slicing, and
    * delimiter-field extraction — every one a codegen'd builtin, chosen
    * for identical semantics in the oracle engine. */
  val qStringFunctions: QueryDef = QueryDef.sql(
    "q_string_functions",
    """SELECT c_custkey,
      |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
      |  reverse(c_name) AS reversed,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
      |  replace(c_name, 'Customer', 'C') AS replaced,
      |  strpos(c_name, '#') AS hash_pos,
      |  repeat(left(c_mktsegment, 2), 2) AS doubled_prefix,
      |  right(c_name, 3) AS key_suffix,
      |  split_part(c_name, '#', 2) AS after_hash
      |FROM customer""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      lpad(col("c_custkey").cast("string"), 12, "0").as("padded_key"),
      reverse(col("c_name")).as("reversed"),
      translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
      regexp_replace(col("c_name"), "Customer", "C").as("replaced"),
      instr(col("c_name"), "#").cast("long").as("hash_pos"),
      repeat(substring(col("c_mktsegment"), 1, 2), 2).as("doubled_prefix"),
      substring(col("c_name"), -3, 3).as("key_suffix"),
      // null-safe field access: under ANSI mode element_at throws when the
      // delimiter is absent; get() returns null, coalesced to '' to match
      // the oracle's split_part semantics on the no-delimiter case
      coalesce(get(split(col("c_name"), "#"), lit(1)), lit("")).as("after_hash"))
  }

  val all: Seq[QueryDef] = Seq(qCleanseCustomer, qFilterPredicates, qNullHandling,
    qOrderTopN, qSetOps, qGlobalSort, qStringFunctions)
}
