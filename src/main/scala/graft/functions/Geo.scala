package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial functions — the reference's geohash / H3 / timezone UDFs
  * (/root/reference/pipelines/gold_pipeline.py:65-103) rebuilt
  * Spark-first.
  *
  * Geohash is NOT a UDF here: the classic bisection loop is equivalent to
  * taking the first k bits of the binary expansion of the normalized
  * lat/lon fractions, so the whole encoding is plain column arithmetic
  * (floor, shift, mask, substring) that stays inside whole-stage codegen
  * and never leaves the scan stage — the UDF black-box the reference
  * pays for on every row disappears. A [[geohashUdf]] wrapper is still
  * provided for SQL registration parity (U4).
  *
  * H3: no pure-JVM H3 exists in this offline environment, so [[h3ish]]
  * is a DOCUMENTED APPROXIMATION: an H3-shaped 64-bit token
  * (mode=1 | resolution | 40 interleaved lat/lon bits) that preserves
  * the H3 properties downstream code relies on (fixed-width integer key,
  * resolution-prefixed, hierarchical truncation) without the icosahedral
  * projection.
  */
object Geo {

  val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Integer cell coordinates: first 20 bits of the normalized fraction.
    * The min() guard only fires on the exact north/east edge. */
  private def latBits(lat: String) = s"least(CAST(floor(($lat + 90.0) / 180.0 * 1048576.0) AS BIGINT), 1048575)"
  private def lonBits(lon: String) = s"least(CAST(floor(($lon + 180.0) / 360.0 * 1048576.0) AS BIGINT), 1048575)"

  /** Per-character geohash expression: bit p of the interleaved stream is
    * lon bit p/2 (even) or lat bit (p-1)/2 (odd); 5 bits per base-32
    * char. `shift(x, n)` renders the engine-specific right-shift. */
  private def charExpr(j: Int, latI: String, lonI: String, shift: (String, Int) => String): String = {
    val bits = (0 until 5).map { t =>
      val p = j * 5 + t
      val src = if (p % 2 == 0) shift(lonI, 19 - p / 2) else shift(latI, 19 - (p - 1) / 2)
      s"(($src) & 1) * ${1 << (4 - t)}"
    }
    s"substring('$Base32', CAST(${bits.mkString(" + ")} AS INT) + 1, 1)"
  }

  private def geohashExpr(lat: String, lon: String, precision: Int,
      shift: (String, Int) => String): String = {
    val latI = latBits(lat)
    val lonI = lonBits(lon)
    (0 until precision).map(j => charExpr(j, latI, lonI, shift)).mkString("concat(", ", ", ")")
  }

  /** Spark geohash column (codegen'd arithmetic, no UDF). */
  def geohash(lat: String, lon: String, precision: Int = 8): Column =
    expr(geohashExpr(lat, lon, precision, (x, n) => s"shiftright($x, $n)"))

  /** DuckDB SQL for the identical geohash. */
  def geohashSql(lat: String, lon: String, precision: Int = 8): String =
    geohashExpr(lat, lon, precision, (x, n) => s"($x >> $n)")

  /** UDF variant for `spark.udf.register` parity with the reference's
    * `calculate_geohash` (gold_pipeline.py:65-73, registered :101-103).
    * Same integer formula as [[geohash]], null-safe like the original. */
  val geohashUdf = udf { (lat: java.lang.Double, lon: java.lang.Double, precision: Int) =>
    if (lat == null || lon == null) null
    else {
      val latI = math.min(((lat + 90.0) / 180.0 * 1048576.0).toLong, 1048575L)
      val lonI = math.min(((lon + 180.0) / 360.0 * 1048576.0).toLong, 1048575L)
      val sb = new StringBuilder
      var j = 0
      while (j < precision) {
        var c = 0
        var t = 0
        while (t < 5) {
          val p = j * 5 + t
          val bit = if (p % 2 == 0) (lonI >> (19 - p / 2)) & 1L else (latI >> (19 - (p - 1) / 2)) & 1L
          c = (c << 1) | bit.toInt
          t += 1
        }
        sb.append(Base32(c))
        j += 1
      }
      sb.toString
    }
  }

  /** H3-shaped cell token (documented approximation, see object docs):
    * bit 59 = mode 1, bits 52-55 = resolution, bits 12-51 = interleaved
    * lat/lon cell bits. */
  private def h3ishExpr(lat: String, lon: String, res: Int,
      shift: (String, Int) => String): String = {
    val latI = latBits(lat)
    val lonI = lonBits(lon)
    val interleaved = (0 until 40).map { p =>
      val src = if (p % 2 == 0) shift(lonI, 19 - p / 2) else shift(latI, 19 - (p - 1) / 2)
      s"(($src) & 1) * ${java.lang.Long.toString(1L << (39 - p))}"
    }.mkString(" + ")
    s"(${java.lang.Long.toString(1L << 59)} + ${java.lang.Long.toString(res.toLong << 52)} + ($interleaved) * 4096)"
  }

  def h3ish(lat: String, lon: String, res: Int = 8): Column =
    expr(h3ishExpr(lat, lon, res, (x, n) => s"shiftright($x, $n)"))

  def h3ishSql(lat: String, lon: String, res: Int = 8): String =
    h3ishExpr(lat, lon, res, (x, n) => s"($x >> $n)")

  /** TRUE icosahedral aperture-7 cell index ([[IcoHex]]): gnomonic face
    * projection + hex lattice rounding — the same geometry class as H3,
    * with documented non-canonical numbering (IcoHex docs explain why
    * bit-compat H3 is unreachable offline). Native codegen expression, no
    * UDF. Not used in the oracle query ([[qGeoEnrich]] keeps the
    * SQL-expressible [[h3ish]] token there) because the 20-face argmax +
    * trig pipeline has no faithful DuckDB rendering; correctness comes
    * from IcoHexSpec's geometric property suite instead. */
  def icohexCell(lat: Column, lon: Column, res: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(IcoHexCell(
      org.apache.spark.sql.GraftSqlShim.expression(lat.cast("double")),
      org.apache.spark.sql.GraftSqlShim.expression(lon.cast("double")),
      org.apache.spark.sql.catalyst.expressions.Literal(res)))

  /** Timezone from coordinate boxes — the reference's
    * get_timezone_from_coords (gold_pipeline.py:86-98) as a plain
    * when/otherwise chain (it never needed a UDF). */
  def timezone(lat: Column, lon: Column): Column =
    when(lat.between(41.0, 51.5) && lon.between(-5.5, 10.0), "Europe/Paris")
      .when(lat.between(49.0, 61.0) && lon.between(-8.0, 2.0), "Europe/London")
      .otherwise("UTC")

  private val timezoneSql =
    """CASE WHEN lat BETWEEN 41.0 AND 51.5 AND lon BETWEEN -5.5 AND 10.0 THEN 'Europe/Paris'
      |       WHEN lat BETWEEN 49.0 AND 61.0 AND lon BETWEEN -8.0 AND 2.0 THEN 'Europe/London'
      |       ELSE 'UTC' END""".stripMargin

  // ---------------------------------------------------------------- queries

  /** Geospatial enrichment over synthesized customer coordinates:
    * geohash at two precisions (hierarchical prefix property), the
    * H3-shaped token, and the timezone box lookup. Coordinates derive
    * deterministically from the key so the oracle reproduces them. */
  val qGeoEnrich: QueryDef = QueryDef.sql(
    "q_geo_enrich",
    s"""WITH pts AS (
       |  SELECT c_custkey,
       |    (c_custkey * 37 % 17000) / 100.0 - 85.0 AS lat,
       |    (c_custkey * 91 % 35000) / 100.0 - 175.0 AS lon
       |  FROM customer
       |)
       |SELECT c_custkey, lat, lon,
       |  ${geohashSql("lat", "lon", 8)} AS geohash8,
       |  ${geohashSql("lat", "lon", 4)} AS geohash4,
       |  ${h3ishSql("lat", "lon", 8)} AS h3_cell,
       |  $timezoneSql AS tz
       |FROM pts""".stripMargin) { (spark, dir) =>
    val pts = Tables.customer(spark, dir).select(
      col("c_custkey"),
      (col("c_custkey") * 37 % 17000 / 100.0 - 85.0).as("lat"),
      (col("c_custkey") * 91 % 35000 / 100.0 - 175.0).as("lon"))
    pts.select(
      col("c_custkey"), col("lat"), col("lon"),
      geohash("lat", "lon", 8).as("geohash8"),
      geohash("lat", "lon", 4).as("geohash4"),
      h3ish("lat", "lon", 8).as("h3_cell"),
      timezone(col("lat"), col("lon")).as("tz"))
  }

  val all: Seq[QueryDef] = Seq(qGeoEnrich)
}
