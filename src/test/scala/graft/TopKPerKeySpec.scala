package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom top-k operator must equal the window formulation row for
  * row, and its physical plan must show the two-phase shape: a partial
  * heap pass BEFORE the exchange, final after. */
class TopKPerKeySpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  test("equals the row_number window formulation") {
    val k = 7
    val custom = TopK.perKey(Tables.orders(spark, sfDir),
      Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
    val window = windowTopK(k)
    assert(custom.columns.toSeq == window.columns.toSeq)
    assert(custom.exceptAll(window).count() == 0)
    assert(window.exceptAll(custom).count() == 0)
    assert(custom.count() == 5L * k)
  }

  test("plans as partial heap -> exchange -> final heap, no sort") {
    val custom = TopK.perKey(Tables.orders(spark, sfDir),
      Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    custom.collect()
    val plan = custom.queryExecution.executedPlan.toString
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    val iExchange = plan.indexOf("Exchange")
    assert(iPartial >= 0 && iFinal >= 0 && iExchange >= 0, plan)
    // plan prints top-down: final, then exchange, then partial
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected final above exchange above partial:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Sort "), plan)
  }

  test("the partial stage caps what the exchange moves") {
    val k = 2
    val df = Tables.orders(spark, sfDir)
    val inputParts = df.rdd.getNumPartitions
    val custom = TopK.perKey(df, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
    custom.collect()
    // AQE wraps the exchange in a query stage; unwrap and read the
    // shuffle write metric
    val finalPlan = custom.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val stages = allNodes(finalPlan).collect {
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }
    assert(stages.nonEmpty, finalPlan.toString)
    val moved = stages.head.shuffle.metrics("shuffleRecordsWritten").value
    // ≤ k rows per key (5 priorities) per input partition; far below the
    // 15k input rows a window would shuffle in full
    assert(moved <= 5L * k * inputParts, s"shuffled $moved rows")
    assert(moved < df.count())
  }
}
