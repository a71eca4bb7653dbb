package graft

import graft.functions.ExactVariance
import org.apache.spark.sql.functions._

/** The custom variance Aggregator must be bit-identical under any
  * partitioning (the property double var_pop lacks) and numerically
  * agree with var_pop. */
class ExactVarianceSpec extends SparkSpec {
  import spark.implicits._

  private def varsOf(partitions: Int): Map[String, Double] = {
    val varPopQ = udaf(ExactVariance.VarPopQ)
    Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 1000000L, 0).cast("long").as("v"))
      .repartition(partitions, col("v")) // different merge trees per layout
      .groupBy(col("event_type"))
      .agg((varPopQ(col("v")) / lit(1e12)).as("value_var"))
      .as[(String, Double)].collect().toMap
  }

  test("exact variance is bit-identical across partitionings") {
    val a = varsOf(3)
    val b = varsOf(29)
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    a.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) == java.lang.Double.doubleToLongBits(b(k)),
        s"variance for $k differs across partitionings: $v vs ${b(k)}")
    }
  }

  test("agrees with var_pop up to float error") {
    val exact = varsOf(8)
    val ref = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(var_pop(col("value")).as("v"))
      .as[(String, Double)].collect().toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(v - ref(k)) / ref(k) < 1e-6, s"$k: $v vs var_pop ${ref(k)}")
    }
  }

  test("SQL registration works") {
    ExactVariance.register(spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("ev_var_test")
    val n = spark.sql(
      s"""SELECT event_type, ${ExactVariance.functionName}(CAST(round(value * 1e6) AS BIGINT))
         |FROM ev_var_test GROUP BY event_type""".stripMargin).count()
    assert(n == 5)
  }
}
