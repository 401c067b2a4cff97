package graft.schema

import org.apache.spark.sql.types._

/** Event data model of the reference pipeline.
  *
  * Wire format: one JSON object per message (reference:
  * web-application.py:79-89 producer shape; Streamingdag.py:166-172
  * decode+parse). Sink: a single wide nullable 19-column table
  * (Streamingdag.py:113-135, README.md:212-232).
  *
  * Required keys — a message is dropped unless all are present
  * (Streamingdag.py:175-181): id, timestamp, message, user_id, event_type.
  * Optional passthrough keys (Streamingdag.py:198-203): source, ip_address,
  * user_agent, page, referrer, product_id, currency, device_id, location.
  */
object EventSchema {

  val requiredFields: Seq[String] =
    Seq("id", "timestamp", "message", "user_id", "event_type")

  val optionalFields: Seq[String] = Seq(
    "source", "ip_address", "user_agent", "page", "referrer",
    "product_id", "currency", "device_id", "location")

  /** Schema applied to the raw JSON wire format with `from_json`.
    * All fields nullable at parse time: required-ness is enforced by an
    * explicit filter (the reference validates by key presence, not by
    * schema rejection), and unknown JSON keys are dropped by construction
    * — the Spark twin of BigQuery's ignoreUnknownValues
    * (Streamingdag.py:318-321).
    * `timestamp` stays STRING here: the reference keeps the raw string and
    * derives event_hour with an error→0 fallback (Streamingdag.py:207-212);
    * a hard TimestampType cast at parse would null out rows the reference
    * keeps.
    */
  val wireSchema: StructType = StructType(
    Seq(
      StructField("id", StringType),
      StructField("timestamp", StringType),
      StructField("message", StringType),
      StructField("user_id", StringType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)
    ) ++ optionalFields.map(StructField(_, StringType)))

  /** Sink table schema — Spark mirror of the 19-column BigQuery table
    * (Streamingdag.py:113-135, duplicated at :239-263).
    */
  val sinkSchema: StructType = StructType(
    Seq(
      StructField("id", StringType, nullable = false),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("message", StringType),
      StructField("user_id", StringType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("processed_at", TimestampType, nullable = false)
    ) ++ optionalFields.map(StructField(_, StringType)) ++ Seq(
      StructField("message_length", IntegerType),
      StructField("event_hour", IntegerType),
      StructField("data_quality_score", IntegerType)))

  /** Sink column order (id..location, then derived columns). */
  val sinkColumns: Seq[String] = sinkSchema.fieldNames.toSeq
}

/** Typed view of a fully-enriched event (sink row). Used where a
  * case-class Encoder helps (typed Dataset tests, streaming state).
  */
final case class Event(
    id: String,
    timestamp: java.sql.Timestamp,
    message: Option[String],
    user_id: Option[String],
    event_type: Option[String],
    value: Option[Double],
    processed_at: java.sql.Timestamp,
    source: Option[String],
    ip_address: Option[String],
    user_agent: Option[String],
    page: Option[String],
    referrer: Option[String],
    product_id: Option[String],
    currency: Option[String],
    device_id: Option[String],
    location: Option[String],
    message_length: Option[Int],
    event_hour: Option[Int],
    data_quality_score: Option[Int])
