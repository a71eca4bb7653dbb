package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Join operators — SURVEY.md §2.3 (J1–J7 families).
  *
  * Scale notes: only BOUNDED-cardinality dims (region 5, nation 25,
  * generated date/time dims) carry an explicit `broadcast()` hint — their
  * size is a constant of the schema, so the hint is safe at any SF and
  * saves AQE a stats round-trip. Sides that scale with data volume
  * (customer ~sf·150k, part ~sf·200k, supplier ~sf·10k — 20 B part rows
  * at 100 TB) are deliberately NOT hinted: a forced broadcast there
  * overrides AQE's size check and OOMs the executors at scale, while
  * without the hint AQE still broadcasts them when runtime stats say they
  * fit (as they do at test SF) and falls back to a shuffle join when they
  * don't. The anti/semi joins keep the filter before the join so the
  * build side stays minimal.
  */
object Joins {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 10)))
  private def money(c: Column): Column = round(c, 2).cast("double")

  /** J1/J3: fact × dims chain — revenue by region/nation (dim-enrichment
    * join shape of gold_pipeline.py:375,438,508). nation/region are
    * hinted broadcast (bounded); customer scales with SF, so its join
    * side is left to AQE — broadcast at test scale, shuffle at 100 TB. */
  val qRevenueByNation: QueryDef = QueryDef.sql(
    "q_join_revenue_by_nation",
    """SELECT r_name AS region_name, n_name AS nation_name,
      |  count(*) AS n_lineitems,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey  = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        money(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
  }

  /** J1: left join preserving unmatched left rows (SCD2 change-detection
    * shape, gold_pipeline.py:165-169): every customer, with order metrics
    * or zero-defaults via coalesce (P-coalesce semantics). */
  val qLeftEnrich: QueryDef = QueryDef.sql(
    "q_join_left_enrich",
    """SELECT c_custkey, c_mktsegment,
      |  COALESCE(m.n_orders, 0) AS n_orders,
      |  CAST(COALESCE(m.spend, 0.0) AS DOUBLE) AS spend
      |FROM customer c
      |LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey
      |) m ON c.c_custkey = m.o_custkey""".stripMargin) { (spark, dir) =>
    val metrics = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), money(dsum(col("o_totalprice"))).as("spend"))
    Tables.customer(spark, dir)
      .join(metrics, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
  }

  /** J5: multi-column equi join on non-key attributes (address-match shape,
    * gold_pipeline.py:650-671): self-join of part on (brand, type). */
  val qMultiAttrJoin: QueryDef = QueryDef.sql(
    "q_join_multi_attr",
    """SELECT a.p_brand, a.p_type, count(*) AS n_pairs
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
      | AND a.p_partkey < b.p_partkey
      |GROUP BY a.p_brand, a.p_type""".stripMargin) { (spark, dir) =>
    val p = Tables.part(spark, dir)
    val a = p.select(col("p_partkey").as("a_key"), col("p_brand"), col("p_type"))
    val b = p.select(col("p_partkey").as("b_key"),
      col("p_brand").as("b_brand"), col("p_type").as("b_type"))
    a.join(b,
        col("p_brand") === col("b_brand") && col("p_type") === col("b_type") &&
          col("a_key") < col("b_key"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** J6: left anti join — referential-integrity orphan check
    * (data_quality_validation.py:193-197): customers with no orders. */
  val qAntiJoin: QueryDef = QueryDef.sql(
    "q_join_anti_orphans",
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** Left semi join — EXISTS: segments of customers that ordered in 1995+. */
  val qSemiJoin: QueryDef = QueryDef.sql(
    "q_join_semi_active",
    """SELECT c_mktsegment, count(*) AS n_active_customers FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00')
      |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
    Tables.customer(spark, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_active_customers"))
  }

  /** Full outer join (completes the join-family surface beyond the
    * reference's left-only usage): supplier vs customer presence per
    * nation. */
  val qFullOuter: QueryDef = QueryDef.sql(
    "q_join_full_outer",
    """SELECT COALESCE(s.nk, c.nk) AS nationkey,
      |  COALESCE(s.n_suppliers, 0) AS n_suppliers,
      |  COALESCE(c.n_customers, 0) AS n_customers
      |FROM (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
      |FULL OUTER JOIN (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1) c
      |ON s.nk = c.nk""".stripMargin) { (spark, dir) =>
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("n_suppliers"))
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("c_nk"))
      .agg(count(lit(1)).as("n_customers"))
    s.join(c, col("s_nk") === col("c_nk"), "full_outer")
      .select(
        coalesce(col("s_nk"), col("c_nk")).as("nationkey"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"))
  }

  /** Full star-schema rollup — the gold trip_fact enrichment shape
    * (gold_pipeline.py:637-671) at TPC-H scale: the fact-fact equi join
    * (lineitem ⋈ orders) shuffles on orderkey; part and supplier scale
    * with SF (20 B part rows at 100 TB) so their join sides are left to
    * AQE — broadcast while runtime stats say they fit, shuffle join past
    * that; only the bounded dims (nation 25, region 5) carry an explicit
    * broadcast hint. PlanSpec locks this shape with auto-broadcast
    * disabled: 2 broadcast joins, 3 shuffle joins. */
  val qStarSchema: QueryDef = QueryDef.sql(
    "q_join_star_schema",
    """SELECT r_name AS region_name, p_brand AS brand,
      |  CAST(year(o_orderdate) AS INT) AS order_year,
      |  count(*) AS n_lineitems,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN part     ON l_partkey  = p_partkey
      |JOIN supplier ON l_suppkey  = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY 1, 2, 3""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("p_brand").as("brand"),
        year(col("o_orderdate")).as("order_year"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        money(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
  }

  /** Range join: facts against interval dims `[lo, hi)` — the price-band
    * classification shape. Runs through [[ScaleJoins.rangeJoin]], which
    * rewrites the theta predicate as an equi join on covering buckets +
    * exact post-filter, so the plan is a hash join at any band-table size
    * (a raw range predicate plans as BroadcastNestedLoopJoin and degrades
    * to a cartesian product past the broadcast threshold — asserted away
    * in ScaleJoinsSpec). */
  val qRangeBand: QueryDef = {
    val bands = Seq(
      ("budget", 0.0, 5000.0), ("value", 5000.0, 20000.0),
      ("mid", 20000.0, 45000.0), ("premium", 45000.0, 75000.0),
      ("luxury", 75000.0, 150000.0))
    val bandsSql = bands.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")
    QueryDef.sql(
      "q_join_range_band",
      s"""SELECT band_name, count(*) AS n_items,
         |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN (VALUES $bandsSql) AS b(band_name, lo, hi)
         |  ON l_extendedprice >= lo AND l_extendedprice < hi
         |GROUP BY band_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val bandsDf = bands.toDF("band_name", "lo", "hi")
      ScaleJoins.rangeJoin(
          Tables.lineitem(spark, dir).select(col("l_extendedprice")),
          "l_extendedprice", bandsDf, "lo", "hi", bucketWidth = 5000.0)
        .groupBy(col("band_name"))
        .agg(count(lit(1)).as("n_items"),
          money(dsum(col("l_extendedprice"))).as("revenue"))
    }
  }

  /** Fuzzy entity matching: candidate pairs inside a BLOCK, scored with
    * Levenshtein edit distance, kept under a threshold — the reference's
    * address/entity matching family (gold_pipeline.py:650-671) with the
    * comparator made explicit. The block key is everything but the last
    * 2 characters of the name, so candidates only vary in a short
    * suffix: block sizes are bounded by the suffix alphabet, never by
    * table size (a weak key like name-length degenerates into
    * full-table blocks — measured 26 s vs 0.4 s at sf0.1). Blocking
    * always trades recall for cost; the traded-away pairs are exactly
    * those differing outside the suffix, stated here and in the oracle. */
  val qFuzzyMatch: QueryDef = QueryDef.sql(
    "q_match_fuzzy",
    """SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
      |  levenshtein(a.c_name, b.c_name) AS edit_dist
      |FROM customer a JOIN customer b
      |  ON a.c_nationkey = b.c_nationkey
      | AND substr(a.c_name, 1, length(a.c_name) - 2) = substr(b.c_name, 1, length(b.c_name) - 2)
      | AND a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 2""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        expr("substring(c_name, 1, length(c_name) - 2)").as("blk"))
    val a = c.select(col("c_custkey").as("cust_a"), col("c_name").as("name_a"),
      col("c_nationkey").as("nk_a"), col("blk").as("blk_a"))
    val b = c.select(col("c_custkey").as("cust_b"), col("c_name").as("name_b"),
      col("c_nationkey").as("nk_b"), col("blk").as("blk_b"))
    a.join(b, col("nk_a") === col("nk_b") && col("blk_a") === col("blk_b")
        && col("cust_a") < col("cust_b"))
      .select(col("cust_a"), col("cust_b"),
        levenshtein(col("name_a"), col("name_b")).as("edit_dist"))
      .where(col("edit_dist") <= 2)
  }

  val all: Seq[QueryDef] = Seq(
    qRevenueByNation, qLeftEnrich, qMultiAttrJoin,
    qAntiJoin, qSemiJoin, qFullOuter, qStarSchema, qRangeBand, qFuzzyMatch)
}
