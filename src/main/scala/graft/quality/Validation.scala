package graft.quality

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-batch validation report — the reference's programmatic
  * PASS/FAIL job (/root/reference/expectations/data_quality_validation.py:
  * 11-313): null-key counts, domain checks, referential integrity via
  * left-anti join, and exact golden row counts, emitted as one
  * (check_name, observed, expected, passed) frame.
  *
  * Scale notes: every check is an independent small aggregate; the RI
  * checks are left-anti joins that broadcast the smaller side's keys.
  * The union of scalar aggregates is the same report shape the reference
  * builds row by row on the driver — here it stays one distributed plan.
  */
object Validation {

  private final case class Check(name: String, observed: () => DataFrame,
      expected: Long)

  /** observed == expected (golden counts) or observed == 0 (violations). */
  val qValidateReport: QueryDef = QueryDef.sql(
    "q_validate_report",
    """SELECT 'null_custkey' AS check_name,
      |  (SELECT count(*) FROM customer WHERE c_custkey IS NULL) AS observed,
      |  0 AS expected,
      |  (SELECT count(*) FROM customer WHERE c_custkey IS NULL) = 0 AS passed
      |UNION ALL
      |SELECT 'null_orderkey',
      |  (SELECT count(*) FROM orders WHERE o_orderkey IS NULL), 0,
      |  (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) = 0
      |UNION ALL
      |SELECT 'orderstatus_domain',
      |  (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P')), 0,
      |  (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P')) = 0
      |UNION ALL
      |SELECT 'discount_range',
      |  (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1), 0,
      |  (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1) = 0
      |UNION ALL
      |SELECT 'ri_lineitem_orders',
      |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)), 0,
      |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
      |UNION ALL
      |SELECT 'ri_orders_customer',
      |  (SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)), 0,
      |  (SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0
      |UNION ALL
      |SELECT 'golden_region_count',
      |  (SELECT count(*) FROM region), 5,
      |  (SELECT count(*) FROM region) = 5
      |UNION ALL
      |SELECT 'golden_nation_count',
      |  (SELECT count(*) FROM nation), 25,
      |  (SELECT count(*) FROM nation) = 25""".stripMargin) { (spark, dir) =>
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val checks: Seq[Check] = Seq(
      Check("null_custkey", () => customer.where(col("c_custkey").isNull), 0L),
      Check("null_orderkey", () => orders.where(col("o_orderkey").isNull), 0L),
      Check("orderstatus_domain",
        () => orders.where(!col("o_orderstatus").isin("O", "F", "P")), 0L),
      Check("discount_range",
        () => lineitem.where(col("l_discount") < 0 || col("l_discount") > 1), 0L),
      Check("ri_lineitem_orders",
        () => lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti"),
        0L),
      Check("ri_orders_customer",
        () => orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti"),
        0L),
      Check("golden_region_count", () => Tables.region(spark, dir), 5L),
      Check("golden_nation_count", () => Tables.nation(spark, dir), 25L))
    checks.map { c =>
      c.observed().agg(count(lit(1)).as("observed"))
        .select(lit(c.name).as("check_name"), col("observed"),
          lit(c.expected).as("expected"), (col("observed") === c.expected).as("passed"))
    }.reduce(_ unionByName _)
  }

  val all: Seq[QueryDef] = Seq(qValidateReport)
}
