package graft

import graft.functions.{ExactVariance, GeohashEncode, ZOrderKey}
import org.apache.spark.sql.functions._

/** The engine must be drivable from PURE SQL — the reference's users
  * live in SQL notebooks: tables as views, native functions registered,
  * and the results identical to the DataFrame API path. */
class SqlSurfaceSpec extends SparkSpec {

  test("a star-schema aggregate written in SQL equals the DataFrame query") {
    Tables.registerAll(spark, sfDir)
    val sqlRes = spark.sql(
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  count(*) AS n_lineitems,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin)
    val dfRes = SparkEntry.queries("q_join_revenue_by_nation")(spark, sfDir)
    assert(sqlRes.exceptAll(dfRes).count() == 0 && dfRes.exceptAll(sqlRes).count() == 0)
  }

  test("native custom functions are callable from SQL") {
    Tables.registerAll(spark, sfDir)
    GeohashEncode.register(spark)
    ZOrderKey.register(spark)
    ExactVariance.register(spark)
    val row = spark.sql(
      """SELECT geohash_encode(48.8566, 2.3522, 8) AS gh,
        |  zorder_key(3, 5) AS zk""".stripMargin).head()
    assert(row.getString(0).nonEmpty && row.getString(0).length == 8)
    // interleave(3=0b11, 5=0b101): a bits at odd positions, b at even
    assert(row.getLong(1) == ZOrderKey.interleave(3L, 5L))
    val v = spark.sql(
      """SELECT exact_var_pop_q(CAST(round(value * 1e6) AS BIGINT)) / 1e12 AS v
        |FROM events""".stripMargin).head().getDouble(0)
    assert(v > 0)
  }

  test("a silver-cleanse + window pipeline runs end-to-end in SQL") {
    Tables.registerAll(spark, sfDir)
    val out = spark.sql(
      """WITH cleansed AS (
        |  SELECT c_custkey, trim(lower(c_name)) AS name,
        |    regexp_replace(c_mktsegment, '[^A-Za-z]', '') AS segment,
        |    c_acctbal
        |  FROM customer WHERE c_acctbal IS NOT NULL
        |)
        |SELECT c_custkey, name, segment,
        |  rank() OVER (ORDER BY c_acctbal DESC) AS bal_rank
        |FROM cleansed
        |ORDER BY bal_rank LIMIT 10""".stripMargin).collect()
    assert(out.length == 10 && out.head.getInt(3) == 1)
  }

  test("SQL over Delta-protocol tables, including time travel") {
    import graft.sources.DeltaLog
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-sqldelta-").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("id", "tag", "ts"), t)
    DeltaLog.mergeUpsert(spark, t,
      Seq((2L, "b2", 1L), (3L, "c", 1L)).toDF("id", "tag", "ts"), Seq("id"), "ts")
    DeltaLog.read(spark, t).createOrReplaceTempView("dl_now")
    DeltaLog.read(spark, t, Some(0L)).createOrReplaceTempView("dl_v0")
    assert(spark.sql("SELECT count(*) FROM dl_now").head().getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM dl_v0").head().getLong(0) == 2L)
    assert(spark.sql(
      "SELECT tag FROM dl_now WHERE id = 2").head().getString(0) == "b2")
  }
}
