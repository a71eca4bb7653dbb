package graft.pipelines

import graft.sources.Debezium
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Golden fixture — the reference's deterministic seed dataset
  * (/root/reference/gcp_infrastructure/init_cloud_sql.sql:140-223;
  * FIXTURES.md §1): 5 eaters, 5 merchants, 4 couriers, 18 trip events
  * over 3 trips (two delivered — 44.00 and 55.00 — one cancelled with a
  * refund), emitted as Debezium-enveloped JSON strings so the bronze
  * layer exercises the full two-level CDC parse. Entity strings carry
  * deliberate whitespace/case/punctuation noise for the silver cleanse.
  */
object Fixtures {

  private val T0 = 1709294400000L // 2024-03-01T12:00:00Z

  private def envelope(df: DataFrame, table: String): DataFrame = {
    val inner = to_json(struct(df.columns.map(col): _*))
    val ts = if (df.columns.contains("updated_at")) col("updated_at") else col("created_at")
    df.select(Debezium.wrapEnvelope(inner, lit("c"), ts + 1000L, table).as("raw_json"))
  }

  def eaterRaw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (1, "e-uuid-1", "  Alice ", "Martin", "ALICE@Example.COM", "+33 6 12-34-56-78",
        "12 Rue de Rivoli", "Paris", "75001", "FR", "card", true, T0 - 86400000L, T0),
      (2, "e-uuid-2", "Bob", " Dupont ", "bob@example.com", "+33611223344",
        "8 Quai Saint-Antoine", "Lyon", "69002", "FR", "paypal", true, T0 - 86400000L, T0),
      (3, "e-uuid-3", "Claire", "Bernard", "claire AT example.com", "+33 6 99 88 77 66",
        "3 Rue Paradis", "Marseille", "13001", "FR", "card", true, T0 - 86400000L, T0),
      (4, "e-uuid-4", "David", "Petit", "david@example.com", "06 55 44 33 22",
        "21 Rue de la République", "Lyon", "69001", "FR", "card", true, T0 - 86400000L, T0),
      (5, "e-uuid-5", "Emma", "Roux", "emma@example.com", "+33600000001",
        "5 Avenue Montaigne", "Paris", "75008", "FR", "applepay", false, T0 - 86400000L, T0))
    rows.toDF("eater_id", "eater_uuid", "first_name", "last_name", "email",
      "phone_number", "address_line_1", "city", "postal_code", "country",
      "default_payment_method", "is_active", "created_at", "updated_at")
  }

  def merchantRaw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (1, "m-uuid-1", "Chez  Margaux", "contact@margaux.fr", "+33142000001", "restaurant",
        "french", "45 Rue du Bac", "Paris", "75007", "FR", """{"mon":"9-22"}""", true,
        T0 - 172800000L, T0),
      (2, "m-uuid-2", "Sakura House", "hello@sakura.fr", "+33142000002", "restaurant",
        "japanese", "2 Rue des Capucins", "Lyon", "69001", "FR", """{"mon":"11-23"}""", true,
        T0 - 172800000L, T0),
      (3, "m-uuid-3", "Trattoria Nino", "nino@example.fr", "+33142000003", "restaurant",
        "italian", "18 Cours Julien", "Marseille", "13006", "FR", """{"mon":"12-22"}""", true,
        T0 - 172800000L, T0),
      (4, "m-uuid-4", "Bistro Lumière", "bistro@lumiere.fr", "+33142000004", "restaurant",
        "french", "9 Place Bellecour", "Lyon", "69002", "FR", """{"mon":"9-21"}""", true,
        T0 - 172800000L, T0),
      (5, "m-uuid-5", "Olive & Thyme", "olive@thyme.fr", "+33142000005", "restaurant",
        "mediterranean", "30 Rue Saint-Honoré", "Paris", "75001", "FR", """{"mon":"10-22"}""",
        true, T0 - 172800000L, T0))
    rows.toDF("merchant_id", "merchant_uuid", "name", "email", "phone_number",
      "business_type", "cuisine_type", "address_line_1", "city", "postal_code",
      "country", "operating_hours", "is_active", "created_at", "updated_at")
  }

  def courierRaw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (1, "c-uuid-1", "Luc", "Moreau", "luc@example.com", "+33620000001", "bicycle",
        "n/a", true, "2023-06-01", T0 - 259200000L, T0),
      (2, "c-uuid-2", "Nina", "Fabre", "nina@example.com", "+33620000002", "scooter",
        "ab-123-cd", true, "2023-08-15", T0 - 259200000L, T0),
      (3, "c-uuid-3", "Omar", "Leroy", "omar@example.com", "+33620000003", "motorcycle",
        "EF 456 GH", true, "2023-01-20", T0 - 259200000L, T0),
      (4, "c-uuid-4", "Paul", "Garnier", "paul@example.com", "+33620000004", "car",
        "ij-789-kl", false, "2022-11-05", T0 - 259200000L, T0))
    rows.toDF("courier_id", "courier_uuid", "first_name", "last_name", "email",
      "phone_number", "vehicle_type", "license_plate", "is_active",
      "onboarding_date", "created_at", "updated_at")
  }

  /** 18 golden events over 3 trips. Payloads are partial per lifecycle
    * stage, as in the reference seed data (init_cloud_sql.sql:169-223). */
  def tripEventsRaw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val m = 60000L
    def ev(id: Int, trip: String, order: String, eater: Int, merchant: Int,
        courier: java.lang.Integer, typ: String, offsetMin: Long, status: String,
        payload: String) =
      (id, trip, order, eater, merchant, courier, typ, T0 + offsetMin * m, status,
        payload, T0 + offsetMin * m)
    val rows = Seq(
      // trip-001: full lifecycle, total 44.00, tip 5.00, ratings 5/5/4, 12:00→12:35
      ev(1, "trip-001", "order-001", 1, 1, null, "order_placed", 0, "created",
        """{"subtotal_amount":35.00,"delivery_fee":4.00,"service_fee":2.00,"tax_amount":3.00,"total_amount":44.00,"items":[{"name":"boeuf bourguignon","price":24.0,"quantity":1},{"name":"tarte tatin","price":11.0,"quantity":1}]}"""),
      ev(2, "trip-001", "order-001", 1, 1, null, "order_accepted", 3, "accepted",
        """{"estimated_prep_time_minutes":15}"""),
      ev(3, "trip-001", "order-001", 1, 1, 1, "courier_dispatched", 8, "courier_assigned",
        """{"distance_miles":1.8}"""),
      ev(4, "trip-001", "order-001", 1, 1, 1, "pickup_arrived", 18, "at_pickup", "{}"),
      ev(5, "trip-001", "order-001", 1, 1, 1, "pickup_completed", 22, "picked_up",
        """{"actual_prep_time_minutes":19}"""),
      ev(6, "trip-001", "order-001", 1, 1, 1, "dropoff_arrived", 33, "at_dropoff", "{}"),
      ev(7, "trip-001", "order-001", 1, 1, 1, "delivered", 35, "delivered",
        """{"tip_amount":5.00,"total_amount":44.00,"courier_payout":6.60,"eater_rating":5,"courier_rating":5,"merchant_rating":4,"weather_condition":"sunny","is_group_order":false}"""),
      // trip-002: full lifecycle, total 55.00, ratings 5/5/5, cloudy, 13:00→13:40
      ev(8, "trip-002", "order-002", 2, 2, null, "order_placed", 60, "created",
        """{"subtotal_amount":46.00,"delivery_fee":5.00,"service_fee":2.00,"tax_amount":2.00,"total_amount":55.00,"items":[{"name":"sushi set","price":46.0,"quantity":1}]}"""),
      ev(9, "trip-002", "order-002", 2, 2, null, "order_accepted", 62, "accepted",
        """{"estimated_prep_time_minutes":12}"""),
      ev(10, "trip-002", "order-002", 2, 2, 2, "courier_dispatched", 66, "courier_assigned",
        """{"distance_miles":2.6}"""),
      ev(11, "trip-002", "order-002", 2, 2, 2, "pickup_arrived", 74, "at_pickup", "{}"),
      ev(12, "trip-002", "order-002", 2, 2, 2, "pickup_completed", 78, "picked_up",
        """{"actual_prep_time_minutes":14}"""),
      ev(13, "trip-002", "order-002", 2, 2, 2, "dropoff_arrived", 97, "at_dropoff", "{}"),
      ev(14, "trip-002", "order-002", 2, 2, 2, "delivered", 100, "delivered",
        """{"tip_amount":0.0,"total_amount":55.00,"courier_payout":8.25,"eater_rating":5,"courier_rating":5,"merchant_rating":5,"weather_condition":"cloudy","is_group_order":true}"""),
      // trip-003: placed → accepted → cancelled (refund 77.00, PROMO10)
      ev(15, "trip-003", "order-003", 4, 4, null, "order_placed", 120, "created",
        """{"subtotal_amount":80.00,"delivery_fee":5.00,"service_fee":2.00,"tax_amount":0.00,"total_amount":77.00,"promo_code":"PROMO10","discount_amount":10.00}"""),
      ev(16, "trip-003", "order-003", 4, 4, null, "order_accepted", 123, "accepted",
        """{"estimated_prep_time_minutes":20}"""),
      ev(17, "trip-003", "order-003", 4, 4, null, "cancelled", 130, "cancelled",
        """{"refund_amount":77.00,"promo_code":"PROMO10"}"""),
      // exact redelivery of event 7 (at-least-once) — silver dedups by event_id
      ev(7, "trip-001", "order-001", 1, 1, 1, "delivered", 35, "delivered",
        """{"tip_amount":5.00,"total_amount":44.00,"courier_payout":6.60,"eater_rating":5,"courier_rating":5,"merchant_rating":4,"weather_condition":"sunny","is_group_order":false}"""))
    rows.map { case (a, b, c, d, e, f, g, h, i, j, k) =>
      (a, b, c, d, e, Option(f).map(_.intValue), g, h, i, j, k)
    }.toDF("event_id", "trip_id", "order_id", "eater_id", "merchant_id", "courier_id",
      "event_type", "event_time", "trip_status", "payload", "created_at")
  }

  /** The four Kafka-topic-shaped envelope feeds (raw_json per row). */
  def topics(spark: SparkSession): Map[String, DataFrame] = Map(
    "eater" -> envelope(eaterRaw(spark), "eater"),
    "merchant" -> envelope(merchantRaw(spark), "merchant"),
    "courier" -> envelope(courierRaw(spark), "courier"),
    "trip_events" -> envelope(tripEventsRaw(spark), "trip_events"))

  /** Id stride between fixture replicas — far above any golden id, low
    * enough that int ids stay ints up to ~200k copies. */
  private val Stride = 10000L

  /** The golden fixture replicated `copies`× with disjoint id spaces:
    * every `*_id` integer column shifts by `copy · Stride` and every
    * string key (uuids, trip/order ids) gets a `-<copy>` suffix, so
    * referential integrity holds WITHIN each replica and nothing joins
    * ACROSS replicas — the same dataflow as one golden copy at N× the
    * volume. This is the volume knob for the gold-batch benchmark: the
    * per-row work (two-level CDC parse, cleanse, dedup, dims, fact) is
    * identical to production's, only the row count scales. */
  def topicsScaled(spark: SparkSession, copies: Int): Map[String, DataFrame] = {
    require(copies >= 1 && copies <= 200000, s"copies=$copies")
    def scale(df: DataFrame): DataFrame = {
      val c = df.crossJoin(spark.range(copies).select(col("id").as("__c")))
      val stringKeys = Set("eater_uuid", "merchant_uuid", "courier_uuid",
        "trip_id", "order_id")
      val out = df.columns.map {
        case n if n.endsWith("_id") && df.schema(n).dataType.typeName == "integer" =>
          (col(n) + col("__c") * Stride).cast("int").as(n)
        case n if stringKeys.contains(n) =>
          concat(col(n), lit("-"), col("__c")).as(n)
        case n => col(n)
      }
      c.select(out.toSeq: _*)
    }
    Map(
      "eater" -> envelope(scale(eaterRaw(spark)), "eater"),
      "merchant" -> envelope(scale(merchantRaw(spark)), "merchant"),
      "courier" -> envelope(scale(courierRaw(spark)), "courier"),
      "trip_events" -> envelope(scale(tripEventsRaw(spark)), "trip_events"))
  }
}
