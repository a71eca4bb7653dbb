package graft.pipelines

import graft.functions.Geo
import graft.operators.Scd2
import graft.quality.Expectations
import graft.quality.Expectations.{Drop, Expectation, Track}
import graft.sources.Debezium
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The uBear medallion pipeline, Spark-first: Bronze (CDC envelope parse)
  * → Silver (cleanse/normalize/dedup + payload extraction + expectations)
  * → Gold (star schema: generated dims, SCD2 dims, geospatial location
  * dim, event-pivot fact).
  *
  * Faithful to the reference's dataflow
  * (/root/reference/pipelines/{bronze,silver,gold}_pipeline.py) with the
  * SURVEY §7.4 scale fixes applied deliberately:
  *   - surrogate keys are xxhash64 of the natural key, not an
  *     unpartitioned row_number (gold_pipeline.py:323-325 is a
  *     single-partition bottleneck at scale);
  *   - geocoding rand() is seeded (reproducible);
  *   - every dim join against the fact is broadcast (dims are small by
  *     construction).
  */
object Medallion {

  // ------------------------------------------------------------- bronze

  /** Two-level Debezium parse + epoch-ms→timestamp for the table's
    * temporal columns (bronze_pipeline.py:148-195). */
  def bronze(raw: DataFrame, table: String): DataFrame = {
    val schema = table match {
      case "eater" => Schemas.eaterAfter
      case "merchant" => Schemas.merchantAfter
      case "courier" => Schemas.courierAfter
      case "trip_events" => Schemas.tripEventAfter
    }
    val parsed = Debezium.parseEnvelope(raw, col("raw_json"), schema)
    val tsCols = Seq("created_at", "updated_at", "event_time").filter(parsed.columns.contains)
    tsCols.foldLeft(parsed)((d, c) => d.withColumn(c, timestamp_millis(col(c))))
  }

  // ------------------------------------------------------------- silver

  /** Entity cleanse (silver_pipeline.py:191-215): trim/lower/upper
    * normalization, phone/postal scrubbing, email validation flag,
    * PK dedup; expectations applied as Drop filters. */
  def silverEater(bronzeEater: DataFrame): DataFrame = {
    val rules = Seq(
      Expectation("valid_eater_id", "eater_id IS NOT NULL", Drop),
      Expectation("valid_email_shape", "email_valid", Track))
    val cleansed = bronzeEater.select(
      col("eater_id"), col("eater_uuid"),
      trim(col("first_name")).as("first_name"),
      trim(col("last_name")).as("last_name"),
      lower(trim(col("email"))).as("email"),
      regexp_replace(col("phone_number"), "[^0-9+]", "").as("phone_number"),
      trim(col("address_line_1")).as("address_line_1"),
      trim(col("city")).as("city"),
      regexp_replace(upper(col("postal_code")), "[^0-9A-Z]", "").as("postal_code"),
      upper(trim(col("country"))).as("country"),
      lower(col("default_payment_method")).as("default_payment_method"),
      col("is_active"), col("created_at"), col("updated_at"),
      lower(trim(col("email"))).rlike("^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}$")
        .as("email_valid"))
    Expectations.clean(cleansed, rules).dropDuplicates("eater_id")
  }

  def silverMerchant(bronzeMerchant: DataFrame): DataFrame =
    bronzeMerchant.select(
      col("merchant_id"), col("merchant_uuid"),
      regexp_replace(trim(col("name")), "\\s+", " ").as("name"),
      lower(trim(col("email"))).as("email"),
      regexp_replace(col("phone_number"), "[^0-9+]", "").as("phone_number"),
      lower(col("business_type")).as("business_type"),
      lower(col("cuisine_type")).as("cuisine_type"),
      trim(col("address_line_1")).as("address_line_1"),
      trim(col("city")).as("city"),
      regexp_replace(upper(col("postal_code")), "[^0-9A-Z]", "").as("postal_code"),
      upper(trim(col("country"))).as("country"),
      col("operating_hours"), col("is_active"), col("created_at"), col("updated_at"))
      .where(col("merchant_id").isNotNull)
      .dropDuplicates("merchant_id")

  def silverCourier(bronzeCourier: DataFrame): DataFrame =
    bronzeCourier.select(
      col("courier_id"), col("courier_uuid"),
      trim(col("first_name")).as("first_name"),
      trim(col("last_name")).as("last_name"),
      lower(trim(col("email"))).as("email"),
      regexp_replace(col("phone_number"), "[^0-9+]", "").as("phone_number"),
      lower(col("vehicle_type")).as("vehicle_type"),
      regexp_replace(upper(col("license_plate")), "[^A-Z0-9-]", "").as("license_plate"),
      col("is_active"), col("onboarding_date").cast("date").as("onboarding_date"),
      col("created_at"), col("updated_at"))
      .where(col("courier_id").isNotNull)
      .dropDuplicates("courier_id")

  /** Trip silver: payload JSON extraction against the fixed schema
    * (silver_pipeline.py:51-160) + event_id dedup (at-least-once feed). */
  def silverTrips(bronzeTrips: DataFrame): DataFrame = {
    val p = from_json(col("payload"), Schemas.tripPayload)
    bronzeTrips
      .where(col("trip_id").isNotNull) // expect_or_drop (silver_pipeline.py:98)
      .select(
        col("event_id"), col("trip_id"), col("order_id"), col("eater_id"),
        col("merchant_id"), col("courier_id"), col("event_type"), col("event_time"),
        col("trip_status").as("raw_trip_status"), p.as("p"), col("created_at"))
      .select(col("event_id"), col("trip_id"), col("order_id"), col("eater_id"),
        col("merchant_id"), col("courier_id"), col("event_type"), col("event_time"),
        col("raw_trip_status"), col("created_at"), col("p.*"))
      .dropDuplicates("event_id")
  }

  // --------------------------------------------------------------- gold

  /** dim_location (gold_pipeline.py:236-343): eater ∪ merchant addresses,
    * multi-column dedup, seeded fake geocoding, geohash/H3/timezone
    * enrichment, city→region mapping, hash surrogate key. */
  def dimLocation(eater: DataFrame, merchant: DataFrame): DataFrame = {
    val addresses = eater
      .select(col("address_line_1"), col("city"), col("postal_code"), col("country"),
        lit("eater").as("location_type"))
      .unionByName(merchant.select(col("address_line_1"), col("city"), col("postal_code"),
        col("country"), lit("merchant").as("location_type")))
      .dropDuplicates("address_line_1", "city", "postal_code")
    val geocoded = addresses
      .withColumn("lat", lit(41.0) + rand(42) * 10.0)
      .withColumn("lon", lit(-5.0) + rand(43) * 14.0)
    geocoded
      .withColumn("location_key", xxhash64(col("address_line_1"), col("city"), col("postal_code")))
      .withColumn("geohash", Geo.geohash("lat", "lon", 8))
      // true icosahedral aperture-7 cell (H3-class geometry, IcoHex docs),
      // standing in for the reference's h3 UDF (gold_pipeline.py:75-84)
      .withColumn("h3_cell", Geo.icohexCell(col("lat"), col("lon"), 8))
      .withColumn("timezone", Geo.timezone(col("lat"), col("lon")))
      .withColumn("region_zone",
        when(col("city") === "Paris", "ile-de-france")
          .when(col("city").isin("Lyon", "Marseille"), "province")
          .otherwise("other"))
  }

  /** Eater dim with lifetime metrics + tiering + SCD2 columns
    * (gold_pipeline.py:353-412). `min(merchant_id)` replaces the
    * reference's nondeterministic `first()` favorite-merchant. */
  def dimEater(eater: DataFrame, trips: DataFrame): DataFrame = {
    val placed = trips.where(col("event_type") === "order_placed")
    val metrics = placed.groupBy("eater_id").agg(
      count(lit(1)).as("lifetime_orders"),
      sum(col("total_amount").cast("decimal(12,2)")).as("lifetime_spend"),
      min("merchant_id").as("favorite_merchant_id"),
      countDistinct("merchant_id").as("distinct_merchants"))
    // metrics cardinality = eater count (scales with the user base): no
    // broadcast hint — AQE broadcasts while it fits, shuffles at 100 TB
    val enriched = eater.join(metrics, Seq("eater_id"), "left")
      .withColumn("lifetime_orders", coalesce(col("lifetime_orders"), lit(0L)))
      .withColumn("lifetime_spend",
        coalesce(col("lifetime_spend"), lit(0).cast("decimal(12,2)")))
      .withColumn("loyalty_tier",
        when(col("lifetime_spend") >= 500, "platinum")
          .when(col("lifetime_spend") >= 200, "gold")
          .when(col("lifetime_spend") >= 50, "silver")
          .otherwise("bronze"))
    Scd2.fromChangeLog(enriched, Seq("eater_id"),
      Seq("email", "city", "loyalty_tier", "is_active"), "updated_at", Seq("eater_id"))
  }

  /** Merchant dim with order metrics + rating-based tiering
    * (gold_pipeline.py:421-478: avg rating, order count, on-time-ish
    * conditional rates) and SCD2 columns. */
  def dimMerchant(merchant: DataFrame, trips: DataFrame): DataFrame = {
    val delivered = trips.where(col("event_type") === "delivered")
    val metrics = delivered.groupBy("merchant_id").agg(
      count(lit(1)).as("completed_orders"),
      avg(col("merchant_rating").cast("double")).as("avg_rating"),
      count(when(col("merchant_rating") >= 4, 1)).as("highly_rated_orders"))
    // per-merchant aggregate scales with merchant count: side left to AQE
    val enriched = merchant.join(metrics, Seq("merchant_id"), "left")
      .withColumn("completed_orders", coalesce(col("completed_orders"), lit(0L)))
      .withColumn("merchant_tier",
        when(col("avg_rating") >= 4.5, "top")
          .when(col("avg_rating") >= 3.5, "standard")
          .when(col("avg_rating").isNotNull, "watch")
          .otherwise("new"))
    Scd2.fromChangeLog(enriched, Seq("merchant_id"),
      Seq("name", "cuisine_type", "merchant_tier", "is_active"),
      "updated_at", Seq("merchant_id"))
  }

  /** Courier dim with delivery metrics + conditional rates
    * (gold_pipeline.py:487-546: deliveries, avg rating, completion rate
    * as ratio-of-aggregates). */
  def dimCourier(courier: DataFrame, trips: DataFrame): DataFrame = {
    val assigned = trips.where(col("courier_id").isNotNull)
    val metrics = assigned.groupBy("courier_id").agg(
      countDistinct("trip_id").as("assigned_trips"),
      count(when(col("event_type") === "delivered", 1)).as("deliveries"),
      avg(col("courier_rating").cast("double")).as("avg_rating"))
    // per-courier aggregate scales with courier count: side left to AQE
    val enriched = courier.join(metrics, Seq("courier_id"), "left")
      .withColumn("assigned_trips", coalesce(col("assigned_trips"), lit(0L)))
      .withColumn("deliveries", coalesce(col("deliveries"), lit(0L)))
      .withColumn("completion_rate",
        when(col("assigned_trips") > 0,
          round(col("deliveries").cast("double") / col("assigned_trips") * 100, 2))
          .otherwise(lit(0.0)))
    Scd2.fromChangeLog(enriched, Seq("courier_id"),
      Seq("vehicle_type", "license_plate", "is_active"),
      "updated_at", Seq("courier_id"))
  }

  /** trip_fact (gold_pipeline.py:637-798): the event-log pivot —
    * max(when) per event type + last-write-wins payload fields — then
    * status derivation, durations, null defaults, dim-key attachment. */
  def tripFact(trips: DataFrame, dimLoc: DataFrame, merchant: DataFrame): DataFrame = {
    val eventAts = Schemas.eventTypes.map(t =>
      max(when(col("event_type") === t, col("event_time"))).as(s"${t}_at"))
    val payloadLww = Seq(
      "subtotal_amount", "delivery_fee", "service_fee", "tax_amount", "tip_amount",
      "total_amount", "courier_payout", "distance_miles", "estimated_prep_time_minutes",
      "actual_prep_time_minutes", "promo_code", "discount_amount", "refund_amount",
      "weather_condition", "eater_rating", "courier_rating", "merchant_rating")
      .map(c => max(col(c)).as(c))
    val aggs = Seq(max(col("courier_id")).as("courier_id")) ++ eventAts ++ payloadLww
    val pivoted = trips
      .groupBy("trip_id", "order_id", "eater_id", "merchant_id")
      .agg(aggs.head, aggs.tail: _*)
    val withStatus = pivoted
      .withColumn("trip_status",
        when(col("cancelled_at").isNotNull, "cancelled")
          .when(col("delivered_at").isNotNull, "completed")
          .otherwise("in_progress"))
      .withColumn("delivery_minutes",
        (col("delivered_at").cast("long") - col("order_placed_at").cast("long")) / 60)
      .withColumn("courier_payout",
        coalesce(col("courier_payout"), round(col("total_amount") * 0.15, 2)))
      .withColumn("tip_amount", coalesce(col("tip_amount"), lit(0.0)))
      .withColumn("discount_amount", coalesce(col("discount_amount"), lit(0.0)))
      .withColumn("date_partition", to_date(col("order_placed_at")))
    // attach pickup location key via the merchant address (J4+J5 family)
    val mAddr = merchant.select(col("merchant_id"),
      col("address_line_1").as("m_addr"), col("city").as("m_city"))
    val locKeys = dimLoc.select(col("location_key"),
      col("address_line_1").as("l_addr"), col("city").as("l_city"))
    // mAddr/locKeys scale with merchant/address counts — no hint; AQE
    // broadcasts them while small and falls back to shuffle joins at scale
    withStatus
      .join(mAddr, Seq("merchant_id"), "left")
      .join(locKeys,
        col("m_addr") === col("l_addr") && col("m_city") === col("l_city"), "left")
      .drop("m_addr", "m_city", "l_addr", "l_city")
      .withColumnRenamed("location_key", "pickup_location_key")
  }

  // ---------------------------------------------------------- pipeline

  /** The full DLT-style dependency graph (ST7), ready to run. */
  def graph(spark: SparkSession): TableGraph = graph(spark, Fixtures.topics(spark))

  /** Same graph over caller-supplied topic feeds (e.g.
    * [[Fixtures.topicsScaled]] for the gold-batch benchmark, or real
    * Kafka-sourced frames in production). */
  def graph(spark: SparkSession, topics: Map[String, DataFrame]): TableGraph = {
    val g = new TableGraph
    for (t <- Seq("eater", "merchant", "courier", "trip_events"))
      g.register(TableDef(s"bronze_$t", Nil)(_ => bronze(topics(t), t)))
    g.register(TableDef("silver_eater", Seq("bronze_eater"))(
      r => silverEater(r("bronze_eater"))))
    g.register(TableDef("silver_merchant", Seq("bronze_merchant"))(
      r => silverMerchant(r("bronze_merchant"))))
    g.register(TableDef("silver_courier", Seq("bronze_courier"))(
      r => silverCourier(r("bronze_courier"))))
    g.register(TableDef("silver_trips", Seq("bronze_trip_events"))(
      r => silverTrips(r("bronze_trip_events"))))
    g.register(TableDef("dim_location", Seq("silver_eater", "silver_merchant"))(
      r => dimLocation(r("silver_eater"), r("silver_merchant"))))
    g.register(TableDef("dim_eater", Seq("silver_eater", "silver_trips"))(
      r => dimEater(r("silver_eater"), r("silver_trips"))))
    g.register(TableDef("dim_merchant", Seq("silver_merchant", "silver_trips"))(
      r => dimMerchant(r("silver_merchant"), r("silver_trips"))))
    g.register(TableDef("dim_courier", Seq("silver_courier", "silver_trips"))(
      r => dimCourier(r("silver_courier"), r("silver_trips"))))
    g.register(TableDef("trip_fact", Seq("silver_trips", "dim_location", "silver_merchant"))(
      r => tripFact(r("silver_trips"), r("dim_location"), r("silver_merchant"))))
    g
  }

  /** Post-build gold validation — the reference's gold job ends with
    * count + referential-integrity checks before publishing
    * (gold_pipeline.py validation step): non-empty gold tables, and no
    * fact row referencing a missing dim. The anti-join RI probes project
    * the dim down to its distinct key column before joining; the join
    * side is left to AQE (entity dims scale with the user base, so a
    * forced broadcast would OOM at 100 TB — the key-only projection
    * keeps the build side minimal whichever strategy AQE picks). */
  def validate(t: Map[String, DataFrame]): DataFrame = {
    val spark = t("trip_fact").sparkSession
    import spark.implicits._
    def orphans(fact: DataFrame, dim: DataFrame, key: String): Long =
      fact.where(col(key).isNotNull)
        .join(dim.select(col(key)).distinct(), Seq(key), "left_anti")
        .count()
    val fact = t("trip_fact")
    val checks: Seq[(String, Long, Boolean)] = Seq(
      ("fact_nonempty", fact.count(), true),
      ("dim_eater_nonempty", t("dim_eater").count(), true),
      ("dim_merchant_nonempty", t("dim_merchant").count(), true),
      ("dim_courier_nonempty", t("dim_courier").count(), true),
      ("dim_location_nonempty", t("dim_location").count(), true))
      .map { case (n, c, _) => (n, c, c > 0) } ++ Seq(
      ("ri_fact_eater", orphans(fact, t("dim_eater"), "eater_id"), false),
      ("ri_fact_merchant", orphans(fact, t("dim_merchant"), "merchant_id"), false),
      ("ri_fact_courier", orphans(fact, t("dim_courier"), "courier_id"), false))
      .map { case (n, c, _) => (n, c, c == 0L) }
    checks.toDF("check_name", "observed", "passed")
  }
}
