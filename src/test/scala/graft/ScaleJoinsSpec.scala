package graft

import graft.operators.ScaleJoins
import org.apache.spark.sql.functions._

/** Salting preserves join semantics; co-bucketed tables join without a
  * shuffle on either side. */
class ScaleJoinsSpec extends SparkSpec {

  test("saltedJoin equals the plain join, row for row") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
    val salted = ScaleJoins.saltedJoin(orders, customer, "o_custkey", 7)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin replicates the build side once per salt") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
    // every order row matches exactly one (customer, salt) replica, so
    // counts are unchanged — the duplication cancels against the salt
    // equality predicate
    val n = ScaleJoins.saltedJoin(orders, customer, "o_custkey", 5).count()
    assert(n == orders.join(customer, Seq("o_custkey")).count())
  }

  test("co-bucketed join runs with no ShuffleExchange on either side") {
    dropManagedTable("b_orders")
    dropManagedTable("b_lineitem")
    ScaleJoins.writeBucketed(
      Tables.orders(spark, sfDir), "b_orders", "o_orderkey", 4)
    ScaleJoins.writeBucketed(
      Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    val joined = ScaleJoins.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    // and it computes the right thing
    val expected = Tables.orders(spark, sfDir).join(
      Tables.lineitem(spark, sfDir),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() == expected)
    dropManagedTable("b_orders")
    dropManagedTable("b_lineitem")
  }

  test("q_join_skew_salted plans the salt expansion and spreads the hot keys") {
    // force the shuffle-join regime (at 100 TB the build side of the
    // oracle query is broadcastable, but the operator exists for builds
    // that are not) and verify the salt machinery is actually in the plan
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // partition-spread is the thing under test: stop AQE from coalescing
    // the (tiny at test scale) shuffle back into one partition
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val df = SparkEntry.queries("q_join_skew_salted")(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("explode") && plan.contains("__salt"),
        s"expected salt replication in the plan:\n$plan")
      // the join key carries the salt: no single-task hot key remains
      assert(plan.contains("l_returnflag") && plan.contains("__salt"))
      // 3-key join output would concentrate in 3 partitions unsalted;
      // salted it must occupy well more than the 3 key partitions
      val sizes = df.groupBy(spark_partition_id()).count().collect()
      assert(sizes.length > 3, s"only ${sizes.length} populated partitions")
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("rangeJoin equals the naive theta join and plans as a hash join") {
    import spark.implicits._
    val bands = Seq(("low", 0.0, 3000.0), ("midlow", 3000.0, 3500.0),
      ("wide", 1000.0, 90000.0), ("high", 90000.0, 200000.0))
      .toDF("band_name", "lo", "hi") // overlapping on purpose
    val fact = Tables.lineitem(spark, sfDir).select(col("l_extendedprice"))
    val banded = ScaleJoins.rangeJoin(fact, "l_extendedprice", bands, "lo", "hi", 2000.0)
    val naive = fact.join(bands,
      col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .select(banded.columns.map(col): _*)
    assert(banded.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(banded).count() == 0)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi hash join:\n$plan")
  }
}
