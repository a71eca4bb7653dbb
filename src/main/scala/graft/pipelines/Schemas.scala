package graft.pipelines

import org.apache.spark.sql.types._

/** Fixed schemas of the uBear medallion pipeline — the reference declares
  * every schema explicitly, never infers
  * (/root/reference/pipelines/bronze_pipeline.py:16-103,
  * /root/reference/pipelines/silver_pipeline.py:51-80; FIXTURES.md §1-3).
  * Timestamps inside CDC after-images are epoch millis (LONG), converted
  * at the bronze edge.
  */
object Schemas {

  val eaterAfter: StructType = StructType(Seq(
    StructField("eater_id", IntegerType),
    StructField("eater_uuid", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("phone_number", StringType),
    StructField("address_line_1", StringType),
    StructField("city", StringType),
    StructField("postal_code", StringType),
    StructField("country", StringType),
    StructField("default_payment_method", StringType),
    StructField("is_active", BooleanType),
    StructField("created_at", LongType),
    StructField("updated_at", LongType)))

  val merchantAfter: StructType = StructType(Seq(
    StructField("merchant_id", IntegerType),
    StructField("merchant_uuid", StringType),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("phone_number", StringType),
    StructField("business_type", StringType),
    StructField("cuisine_type", StringType),
    StructField("address_line_1", StringType),
    StructField("city", StringType),
    StructField("postal_code", StringType),
    StructField("country", StringType),
    StructField("operating_hours", StringType),
    StructField("is_active", BooleanType),
    StructField("created_at", LongType),
    StructField("updated_at", LongType)))

  val courierAfter: StructType = StructType(Seq(
    StructField("courier_id", IntegerType),
    StructField("courier_uuid", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("phone_number", StringType),
    StructField("vehicle_type", StringType),
    StructField("license_plate", StringType),
    StructField("is_active", BooleanType),
    StructField("onboarding_date", StringType),
    StructField("created_at", LongType),
    StructField("updated_at", LongType)))

  val tripEventAfter: StructType = StructType(Seq(
    StructField("event_id", IntegerType),
    StructField("trip_id", StringType),
    StructField("order_id", StringType),
    StructField("eater_id", IntegerType),
    StructField("merchant_id", IntegerType),
    StructField("courier_id", IntegerType),
    StructField("event_type", StringType),
    StructField("event_time", LongType),
    StructField("trip_status", StringType),
    StructField("payload", StringType),
    StructField("created_at", LongType)))

  /** Trip payload JSONB fields (silver_pipeline.py:51-80). Each lifecycle
    * stage carries only its fields; the gold pivot takes last-write-wins. */
  val tripPayload: StructType = StructType(Seq(
    StructField("subtotal_amount", DoubleType),
    StructField("delivery_fee", DoubleType),
    StructField("service_fee", DoubleType),
    StructField("tax_amount", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("courier_payout", DoubleType),
    StructField("distance_miles", DoubleType),
    StructField("estimated_prep_time_minutes", IntegerType),
    StructField("actual_prep_time_minutes", IntegerType),
    StructField("promo_code", StringType),
    StructField("discount_amount", DoubleType),
    StructField("refund_amount", DoubleType),
    StructField("weather_condition", StringType),
    StructField("is_group_order", BooleanType),
    StructField("eater_rating", IntegerType),
    StructField("courier_rating", IntegerType),
    StructField("merchant_rating", IntegerType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("price", DoubleType),
      StructField("quantity", IntegerType)))))))

  val eventTypes: Seq[String] = Seq(
    "order_placed", "order_accepted", "courier_dispatched", "pickup_arrived",
    "pickup_completed", "dropoff_arrived", "delivered", "cancelled")
}
