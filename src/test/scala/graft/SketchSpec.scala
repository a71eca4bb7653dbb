package graft

import org.apache.spark.sql.functions._

/** The HLL++ sketch must stay within its configured relative error of the
  * exact distinct count (2% rsd configured; 5% asserted for slack). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct tracks the exact count within tolerance") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).cast("double").as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).cast("double").as("approx"))
      .select(col("exact"), col("approx"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"estimate $approx too far from exact $exact")
    }
  }

  test("q_agg_approx_distinct reports the sketch inside its bound") {
    val flags = SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .select(col("sketch_within_bound")).as[Boolean].collect()
    assert(flags.nonEmpty && flags.forall(identity))
  }
}
