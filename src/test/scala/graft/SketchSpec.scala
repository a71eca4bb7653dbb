package graft

import org.apache.spark.sql.functions._

/** The HLL++ sketch must stay within its configured relative error of the
  * exact distinct count (2% rsd configured; 5% asserted for slack). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct tracks the exact count within tolerance") {
    val rows = SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .select(col("exact_orders").cast("double"), col("approx_orders").cast("double"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"estimate $approx too far from exact $exact")
    }
  }
}
