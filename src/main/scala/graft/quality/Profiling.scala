package graft.quality

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-profiling operators: the "describe my table" surface a lakehouse
  * exposes next to ANALYZE — per-column completeness/cardinality/range
  * profiles and equi-width histograms, as queries with exact oracles
  * (the reference's platform renders these as table "data profiles";
  * cf. /root/reference/databricks_DW/02_create_tables.sql table DDL +
  * ANALYZE usage in maintenance).
  *
  * Scale design: the profile runs one narrow pass PER COLUMN — a
  * column-pruned scan into groupBy(value) with map-side combine, so the
  * shuffle carries (distinct value, count) pairs, then a 1-row final
  * aggregate derives rows/nulls/ndv/min/max from the deduped groups. On
  * a columnar store the five single-column scans cost about one wide
  * scan, and no stage ever sees more than ndv rows after the combine.
  * The tempting alternative — every aggregate in ONE agg node — plans
  * multiple count(DISTINCT) specs as an Expand (row count × #specs of
  * the full width) and measured 4-5x slower at sf0.1. The histogram is
  * a two-pass shape: a 1-row min/max aggregate broadcast back over the
  * scan, then a groupBy on the bucket id — both shuffles carry counters,
  * never values.
  */
object Profiling {

  /** Column profile of `lineitem`: one row per profiled column with row
    * count, null count, exact distinct count, and type-appropriate
    * min/max (numerics in `min_num`/`max_num`, strings and formatted
    * dates in `min_str`/`max_str`). One scan, one aggregate node. */
  val qProfile: QueryDef = {
    def numSql(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    def strSql(c: String) =
      s"""SELECT '$c', count(*), count(*) - count($c), count(DISTINCT $c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min($c), max($c)
         |FROM lineitem""".stripMargin
    def dateSql(c: String) =
      s"""SELECT '$c', count(*), count(*) - count($c), count(DISTINCT $c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  strftime(min($c), '%Y-%m-%d'), strftime(max($c), '%Y-%m-%d')
         |FROM lineitem""".stripMargin
    QueryDef.sql(
      "q_profile_table",
      Seq(numSql("l_quantity"), numSql("l_extendedprice"),
        strSql("l_returnflag"), strSql("l_linestatus"),
        dateSql("l_shipdate")).mkString("\nUNION ALL\n")) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      // one narrow pass per column: deduped (value, cnt) groups, then a
      // 1-row rollup over the groups. minExpr/maxExpr adapt min/max to
      // the column's output slot (numeric vs string vs formatted date).
      def profile(c: String, minExpr: Column => Column, maxExpr: Column => Column,
          numeric: Boolean) = {
        val groups = li.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        val mn = minExpr(min(col("v")))
        val mx = maxExpr(max(col("v")))
        groups.agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
          count(col("v")).as("n_distinct"),
          (if (numeric) mn else lit(null).cast("double")).as("min_num"),
          (if (numeric) mx else lit(null).cast("double")).as("max_num"),
          (if (numeric) lit(null).cast("string") else mn).as("min_str"),
          (if (numeric) lit(null).cast("string") else mx).as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
      }
      val dbl = (e: Column) => e.cast("double")
      val str = (e: Column) => e
      val day = (e: Column) => date_format(e, "yyyy-MM-dd")
      profile("l_quantity", dbl, dbl, numeric = true)
        .unionAll(profile("l_extendedprice", dbl, dbl, numeric = true))
        .unionAll(profile("l_returnflag", str, str, numeric = false))
        .unionAll(profile("l_linestatus", str, str, numeric = false))
        .unionAll(profile("l_shipdate", day, day, numeric = false))
    }
  }

  /** Equi-width histogram of `l_extendedprice` in 10 buckets over the
    * observed [min, max] (max lands in the last bucket). Bucket edges
    * are emitted from the identical arithmetic expression on both
    * engines, so the doubles agree bit-for-bit. */
  val qHistogram: QueryDef = {
    val nb = 10
    QueryDef.sql(
      "q_profile_histogram",
      s"""WITH b AS (
         |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
         |)
         |SELECT
         |  least(CAST(floor((l_extendedprice - lo) * $nb / (hi - lo)) AS BIGINT), ${nb - 1}) AS bucket,
         |  count(*) AS n,
         |  lo + least(CAST(floor((l_extendedprice - lo) * $nb / (hi - lo)) AS BIGINT), ${nb - 1}) * (hi - lo) / $nb AS bucket_lo
         |FROM lineitem CROSS JOIN b
         |GROUP BY 1, 3""".stripMargin) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      val b = li.agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      val bucket: Column = least(
        floor((col("l_extendedprice") - col("lo")) * nb / (col("hi") - col("lo"))).cast("long"),
        lit((nb - 1).toLong))
      li.crossJoin(broadcast(b))
        .select(bucket.as("bucket"), col("lo"), col("hi"))
        .select(col("bucket"),
          (col("lo") + col("bucket") * (col("hi") - col("lo")) / nb).as("bucket_lo"))
        .groupBy(col("bucket"), col("bucket_lo"))
        .agg(count(lit(1)).as("n"))
        .select(col("bucket"), col("n"), col("bucket_lo"))
    }
  }

  /** Per-group z-score outlier flags for `l_extendedprice` by return
    * flag. The group moments come from EXACT integer sums (values
    * quantized to cents, squares summed as DECIMAL(38,0) — the
    * [[graft.functions.ExactVariance]] recipe as plain column
    * arithmetic), because float `avg`/`stddev` are partition-order-
    * dependent and would make the flag nondeterministic run-over-run.
    * Only the final finish arithmetic is double, in a fixed operation
    * order both engines evaluate identically: mean = s1/n,
    * var = s2/n − mean², z = (v − mean)/sqrt(var).
    *
    * Scale: one groupBy carrying three counters per group, broadcast of
    * the (tiny) stats table back over the scan — the fact rows are
    * never shuffled. The 1.5σ threshold suits the fixture's uniform
    * prices (max |z| ≈ 1.74); normal-ish production data uses 3σ. */
  val qOutliers: QueryDef = QueryDef.sql(
    "q_profile_outliers",
    """WITH q AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      |  FROM lineitem
      |), s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(v * v AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM q GROUP BY 1
      |)
      |SELECT l_orderkey, l_linenumber, q.l_returnflag, l_extendedprice,
      |  (v - s1/n) / sqrt(s2/n - (s1/n)*(s1/n)) AS z,
      |  abs((v - s1/n) / sqrt(s2/n - (s1/n)*(s1/n))) > 1.5 AS is_outlier
      |FROM q JOIN s USING (l_returnflag)""".stripMargin) { (spark, dir) =>
    val q = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
    val s = q.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,0)")).cast("double").as("s1"),
      sum((col("v") * col("v")).cast("decimal(38,0)")).cast("double").as("s2"))
    val mean = col("s1") / col("n")
    val z = (col("v") - mean) / sqrt(col("s2") / col("n") - mean * mean)
    q.join(broadcast(s), "l_returnflag")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"), z.as("z"), (abs(z) > 1.5).as("is_outlier"))
  }

  /** Distribution-drift report between two populations — the data-
    * quality monitor every production pipeline runs between a baseline
    * snapshot and today's load (PSI-family). Per fixed equi-width bin:
    * both populations' counts and shares, plus the total-variation
    * distance `TVD = ½ Σ |p_i − q_i|` stamped on every row.
    *
    * Determinism recipe: the TVD numerator is computed in EXACT integer
    * arithmetic — `|n_base·NC − n_cur·NB|` as DECIMAL(38,0), summed
    * (order-independent, unlike a float Σ) — and only the final
    * division is double, in a fixed operation order both engines
    * evaluate identically. ln-based PSI is deliberately avoided: libm
    * `ln` is not guaranteed cross-engine bit-identical; TVD bounds it
    * (Pinsker) with +,−,×,÷ only.
    *
    * Scale: one scan into a 12-group aggregate; the two crossJoins
    * broadcast 1-row frames. Nothing beyond counters ever shuffles. */
  val qDrift: QueryDef = {
    val nb = 12
    val w = 50000
    QueryDef.sql(
      "q_profile_drift",
      s"""WITH q AS (
         |  SELECT least(CAST(floor(o_totalprice / $w) AS BIGINT), ${nb - 1}) AS bin,
         |    o_custkey % 3 = 0 AS is_base
         |  FROM orders
         |), g AS (
         |  SELECT bin,
         |    count(*) FILTER (WHERE is_base) AS n_base,
         |    count(*) FILTER (WHERE NOT is_base) AS n_cur
         |  FROM q GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(n_base) AS BIGINT) AS nb, CAST(sum(n_cur) AS BIGINT) AS nc FROM g
         |), d AS (
         |  SELECT g.*, nb, nc,
         |    abs(CAST(n_base AS DECIMAL(38,0)) * CAST(nc AS DECIMAL(38,0))
         |      - CAST(n_cur AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))) AS num
         |  FROM g CROSS JOIN tot
         |), s AS (
         |  SELECT CAST(sum(num) AS DECIMAL(38,0)) AS totnum FROM d
         |)
         |SELECT bin, n_base, n_cur,
         |  CAST(n_base AS DOUBLE) / CAST(nb AS DOUBLE) AS share_base,
         |  CAST(n_cur AS DOUBLE) / CAST(nc AS DOUBLE) AS share_cur,
         |  CAST(totnum AS DOUBLE) / (2.0 * CAST(nb AS DOUBLE) * CAST(nc AS DOUBLE)) AS tvd
         |FROM d CROSS JOIN s""".stripMargin) { (spark, dir) =>
      val q = Tables.orders(spark, dir).select(
        least(floor(col("o_totalprice") / w).cast("long"), lit((nb - 1).toLong)).as("bin"),
        (col("o_custkey") % 3 === 0).as("is_base"))
      val g = q.groupBy(col("bin")).agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_cur"))
      val tot = g.agg(sum(col("n_base")).as("nb"), sum(col("n_cur")).as("nc"))
      val d = g.crossJoin(broadcast(tot))
        .withColumn("num", abs(
          col("n_base").cast("decimal(38,0)") * col("nc").cast("decimal(38,0)") -
            col("n_cur").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)")))
      val s = d.agg(sum(col("num")).cast("decimal(38,0)").as("totnum"))
      d.crossJoin(broadcast(s)).select(
        col("bin"), col("n_base"), col("n_cur"),
        (col("n_base").cast("double") / col("nb").cast("double")).as("share_base"),
        (col("n_cur").cast("double") / col("nc").cast("double")).as("share_cur"),
        (col("totnum").cast("double") /
          (lit(2.0) * col("nb").cast("double") * col("nc").cast("double"))).as("tvd"))
    }
  }

  val all: Seq[QueryDef] = Seq(qProfile, qHistogram, qOutliers, qDrift)
}
