package graft

import org.apache.spark.sql.functions._

/** Profiling semantics on a fixture with known nulls/cardinality, and
  * determinism of the exact-moment z-scores under repartitioning. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("column profile reports exact nulls, cardinality, and range") {
    val dir = java.nio.file.Files.createTempDirectory("prof_fixture").toString
    Seq[(java.lang.Long, Option[Double], Option[String], String, java.sql.Timestamp)](
      (1L, Some(10.0), Some("A"), "O", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Some(20.0), Some("B"), "O", java.sql.Timestamp.valueOf("2024-06-15 00:00:00")),
      (3L, None,       Some("A"), "F", java.sql.Timestamp.valueOf("2024-12-31 00:00:00")),
      (4L, Some(20.0), None,      "F", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    ).toDF("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_linenumber", lit(1))
      .withColumn("l_extendedprice", coalesce(col("l_quantity"), lit(0.0)))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = quality.Profiling.qProfile.build(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val qty = rows("l_quantity")
    assert(qty.getLong(1) == 4 && qty.getLong(2) == 1 && qty.getLong(3) == 2,
      "4 rows, 1 null, ndv 2 for l_quantity")
    assert(qty.getDouble(4) == 10.0 && qty.getDouble(5) == 20.0)
    val flag = rows("l_returnflag")
    assert(flag.getLong(2) == 1 && flag.getLong(3) == 2)
    assert(flag.getString(6) == "A" && flag.getString(7) == "B")
    val ship = rows("l_shipdate")
    assert(ship.getString(6) == "2024-01-01" && ship.getString(7) == "2024-12-31")
  }

  test("z-scores are bit-identical across partitionings (exact moments)") {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture,
    // so compare the full sorted multiset of bit patterns
    def zBits(dir: String): Seq[(Long, Int, Long)] =
      quality.Profiling.qOutliers.build(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("z"))
        .as[(Long, Int, Double)].collect().toSeq
        .map { case (o, l, z) => (o, l, java.lang.Double.doubleToLongBits(z)) }
        .sorted
    val base = zBits(sfDir)
    // same query over a deliberately different partitioning: float
    // avg/stddev would drift in the low bits; exact integer moments
    // cannot
    val dir = java.nio.file.Files.createTempDirectory("zrepart").toString
    Tables.lineitem(spark, sfDir).repartition(7, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val again = zBits(dir)
    assert(base.nonEmpty && base == again, "z bit patterns drifted under repartitioning")
  }
}
