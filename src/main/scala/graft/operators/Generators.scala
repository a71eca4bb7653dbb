package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Generated dimensions — SURVEY.md §2.6 O5 (`sequence` + `explode`).
  *
  * Mirrors the reference's static date/time dimensions
  * (/root/reference/pipelines/gold_pipeline.py:555-627) with the golden row
  * counts the reference's validation hard-codes: dim_date = 3,653 days
  * (2020-01-01..2029-12-31), dim_time = 1,440 minutes
  * (/root/reference/expectations/data_quality_validation.py:234,258).
  *
  * Scale notes: generators produce rows from nothing — the `sequence` is
  * built on the driver as one array then exploded; for the bounded sizes
  * here (≤ thousands of rows) a single task is correct and cheap. These
  * dims are the canonical broadcast side of every calendar join.
  */
object Generators {

  /** O5 + F-dt: full date dimension via sequence(interval 1 day) + explode.
    * DuckDB's dayofweek is 0-based (Sunday=0) while Spark's is 1-based
    * (Sunday=1), hence the +1 in the oracle. strftime %A/%B match Spark's
    * EEEE/MMMM in the default locale. */
  val qDimDate: QueryDef = QueryDef.sql(
    "q_gen_dim_date",
    """SELECT
      |  full_date,
      |  CAST(strftime(full_date, '%Y%m%d') AS INT) AS date_key,
      |  CAST(dayofweek(full_date) + 1 AS INT) AS day_of_week,
      |  strftime(full_date, '%A') AS day_name,
      |  dayofweek(full_date) IN (0, 6) AS is_weekend,
      |  CAST(weekofyear(full_date) AS INT) AS week_of_year,
      |  CAST(month(full_date) AS INT) AS month_number,
      |  strftime(full_date, '%B') AS month_name,
      |  CAST(quarter(full_date) AS INT) AS quarter,
      |  CAST(year(full_date) AS INT) AS year,
      |  CAST(year(full_date) AS INT) AS fiscal_year,
      |  CAST(quarter(full_date) AS INT) AS fiscal_quarter
      |FROM (SELECT unnest(generate_series(DATE '2020-01-01', DATE '2029-12-31', INTERVAL 1 DAY))::DATE AS full_date)""".stripMargin) { (spark, _) =>
    spark.sql(
      "SELECT explode(sequence(to_date('2020-01-01'), to_date('2029-12-31'), interval 1 day)) AS full_date")
      .select(
        col("full_date"),
        date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_key"),
        dayofweek(col("full_date")).as("day_of_week"),
        date_format(col("full_date"), "EEEE").as("day_name"),
        dayofweek(col("full_date")).isin(1, 7).as("is_weekend"),
        weekofyear(col("full_date")).as("week_of_year"),
        month(col("full_date")).as("month_number"),
        date_format(col("full_date"), "MMMM").as("month_name"),
        quarter(col("full_date")).as("quarter"),
        year(col("full_date")).as("year"),
        year(col("full_date")).as("fiscal_year"),
        quarter(col("full_date")).as("fiscal_quarter"))
  }

  /** O5 + F-str/F-math: minute-grain time dimension — sequence(0,1439) +
    * explode, integer div/mod time keys, lpad/concat HH:mm build, when
    * chains for period buckets (gold_pipeline.py:594-620). */
  val qDimTime: QueryDef = QueryDef.sql(
    "q_gen_dim_time",
    """SELECT
      |  CAST(m // 60 * 100 + m % 60 AS INT) AS time_key,
      |  lpad(CAST(m // 60 AS VARCHAR), 2, '0') || ':' || lpad(CAST(m % 60 AS VARCHAR), 2, '0') AS time_value,
      |  CAST(m // 60 AS INT) AS hour_24,
      |  CAST(CASE WHEN m // 60 = 0 THEN 12
      |            WHEN m // 60 > 12 THEN m // 60 - 12
      |            ELSE m // 60 END AS INT) AS hour_12,
      |  CASE WHEN m // 60 < 12 THEN 'AM' ELSE 'PM' END AS am_pm,
      |  CAST(m % 60 AS INT) AS minute,
      |  CASE WHEN m // 60 BETWEEN 0 AND 5 THEN 'Night'
      |       WHEN m // 60 BETWEEN 6 AND 11 THEN 'Morning'
      |       WHEN m // 60 BETWEEN 12 AND 17 THEN 'Afternoon'
      |       WHEN m // 60 BETWEEN 18 AND 21 THEN 'Evening'
      |       ELSE 'Late Night' END AS time_period,
      |  (m // 60 BETWEEN 11 AND 14) OR (m // 60 BETWEEN 18 AND 21) AS is_peak_hour
      |FROM (SELECT unnest(generate_series(0, 1439)) AS m)""".stripMargin) { (spark, _) =>
    val hour = (col("m") / 60).cast("int")
    val minute = (col("m") % 60).cast("int")
    spark.sql("SELECT explode(sequence(0, 1439)) AS m")
      .select(
        (hour * 100 + minute).cast("int").as("time_key"),
        concat(lpad(hour.cast("string"), 2, "0"), lit(":"),
          lpad(minute.cast("string"), 2, "0")).as("time_value"),
        hour.as("hour_24"),
        when(hour === 0, 12).when(hour > 12, hour - 12).otherwise(hour)
          .cast("int").as("hour_12"),
        when(hour < 12, "AM").otherwise("PM").as("am_pm"),
        minute.as("minute"),
        when(hour.between(0, 5), "Night")
          .when(hour.between(6, 11), "Morning")
          .when(hour.between(12, 17), "Afternoon")
          .when(hour.between(18, 21), "Evening")
          .otherwise("Late Night").as("time_period"),
        (hour.between(11, 14) || hour.between(18, 21)).as("is_peak_hour"))
  }

  /** The remaining F-dt surface in one projection: week/month/quarter
    * truncation, month-end, day arithmetic, and month addition with its
    * end-of-month clamping (Jan 31 + 1 month = Feb 28 in both engines). */
  val qDateFunctions: QueryDef = QueryDef.sql(
    "q_date_functions",
    """SELECT o_orderkey,
      |  CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS week_start,
      |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_start,
      |  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS quarter_start,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      |  CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_92,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3_months
      |FROM orders""".stripMargin) { (spark, dir) =>
    val d = col("o_orderdate").cast("date")
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      date_trunc("week", d).as("week_start"),
      date_trunc("month", d).as("month_start"),
      date_trunc("quarter", d).as("quarter_start"),
      last_day(d).cast("timestamp").as("month_end"),
      datediff(d, lit("1992-01-01").cast("date")).as("days_since_92"),
      add_months(d, 3).cast("timestamp").as("plus_3_months"))
  }

  val all: Seq[QueryDef] = Seq(qDimDate, qDimTime, qDateFunctions)
}
