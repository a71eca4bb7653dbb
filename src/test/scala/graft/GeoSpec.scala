package graft

import graft.functions.Geo
import org.apache.spark.sql.functions._

/** Geohash against public test vectors, column-expression vs UDF
  * agreement, and the timezone boxes. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  // (lat, lon, precision, expected) — classic public geohash examples.
  private val vectors = Seq(
    (57.64911, 10.40744, 8, "u4pruydq"),
    (42.605, -5.603, 5, "ezs42"),
    (0.0, 0.0, 8, "s0000000"),
    (90.0, 180.0, 8, "zzzzzzzz"),
    (-90.0, -180.0, 8, "00000000"))

  test("geohash column expression matches public test vectors") {
    vectors.foreach { case (lat, lon, p, expected) =>
      val got = Seq((lat, lon)).toDF("lat", "lon")
        .select(Geo.geohash("lat", "lon", p)).as[String].head()
      assert(got == expected, s"($lat,$lon)@$p")
    }
  }

  test("geohash UDF agrees with the column expression") {
    val df = Tables.customer(spark, sfDir).select(
      (col("c_custkey") * 37 % 17000 / 100.0 - 85.0).as("lat"),
      (col("c_custkey") * 91 % 35000 / 100.0 - 175.0).as("lon"))
    val mismatch = df.select(
      Geo.geohash("lat", "lon", 8).as("a"),
      Geo.geohashUdf(col("lat"), col("lon"), lit(8)).as("b"))
      .where(col("a") =!= col("b"))
    assert(mismatch.count() == 0)
  }

  test("geohash UDF is null-safe and SQL-registrable") {
    spark.udf.register("calculate_geohash", Geo.geohashUdf)
    val r = spark.sql("SELECT calculate_geohash(CAST(NULL AS DOUBLE), 1.0, 8) AS g")
      .as[Option[String]].head()
    assert(r.isEmpty)
    val ok = spark.sql("SELECT calculate_geohash(42.605, -5.603, 5) AS g").as[String].head()
    assert(ok == "ezs42")
  }

  test("timezone boxes match the reference's lookup") {
    val cases = Seq(
      (48.8566, 2.3522, "Europe/Paris"),   // Paris
      (51.5072, -0.1276, "Europe/London"), // London (outside the Paris box)
      (40.7128, -74.006, "UTC"))           // New York
    cases.foreach { case (lat, lon, tz) =>
      val got = Seq((lat, lon)).toDF("lat", "lon")
        .select(Geo.timezone(col("lat"), col("lon"))).as[String].head()
      assert(got == tz, s"($lat,$lon)")
    }
  }

  test("native GeohashEncode expression matches column arithmetic and UDF") {
    graft.functions.GeohashEncode.register(spark)
    // known vectors through the SQL-registered native expression
    vectors.foreach { case (lat, lon, p, expected) =>
      val got = spark.sql(s"SELECT geohash_encode(CAST($lat AS DOUBLE), CAST($lon AS DOUBLE), $p)")
        .as[String].head()
      assert(got == expected, s"($lat,$lon)@$p")
    }
    // three implementations agree over real data (native runs codegen'd)
    val df = Tables.customer(spark, sfDir).select(
      (col("c_custkey") * 37 % 17000 / 100.0 - 85.0).as("lat"),
      (col("c_custkey") * 91 % 35000 / 100.0 - 175.0).as("lon"))
    val mismatch = df.select(
      call_function("geohash_encode", col("lat"), col("lon"), lit(8)).as("native"),
      Geo.geohash("lat", "lon", 8).as("arith"),
      Geo.geohashUdf(col("lat"), col("lon"), lit(8)).as("viaUdf"))
      .where(col("native") =!= col("arith") || col("native") =!= col("viaUdf"))
    assert(mismatch.count() == 0)
    // null-safe like every Catalyst expression
    assert(spark.sql("SELECT geohash_encode(CAST(NULL AS DOUBLE), 1.0, 8)")
      .as[Option[String]].head().isEmpty)
  }

  test("optimizer rule rewrites the registered UDF into the native expression") {
    spark.udf.register("calculate_geohash", Geo.geohashUdf)
    spark.experimental.extraOptimizations = Seq(graft.functions.RewriteGeohashUdf)
    try {
      val df = Tables.customer(spark, sfDir).select(
        expr("calculate_geohash(CAST(c_custkey % 170 - 85 AS DOUBLE), " +
          "CAST(c_custkey % 350 - 175 AS DOUBLE), 8)").as("g"),
        Geo.geohash("CAST(c_custkey % 170 - 85 AS DOUBLE)",
          "CAST(c_custkey % 350 - 175 AS DOUBLE)", 8).as("arith"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("geohash_encode"), s"native expression expected:\n$opt")
      assert(!opt.contains("calculate_geohash"), s"UDF must be rewritten away:\n$opt")
      assert(df.where(col("g") =!= col("arith")).count() == 0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("h3ish token embeds mode and resolution and is hierarchical") {
    val t = Seq((48.8566, 2.3522)).toDF("lat", "lon")
      .select(Geo.h3ish("lat", "lon", 8).cast("long")).as[Long].head()
    assert((t >> 59) == 1L)          // mode bit
    assert(((t >> 52) & 0xf) == 8L)  // resolution
  }
}
