package graft.ops

import java.sql.Timestamp
import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneId}
import java.time.format.DateTimeFormatter
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Dataset
import graft.schema.{Event, EventSchema}

/** SURVEY §2.12: the typed DoFn-fidelity twin — a
  * `Dataset[String] → Dataset[Event]` flatMap mirroring the reference's
  * `ParsePubSubMessage.process` (Streamingdag.py:159-236) step for step,
  * one imperative function per record, exactly like the Beam DoFn.
  *
  * Purpose: a CROSS-CHECK of the declarative Column pipeline
  * ([[EventPipeline.fromRawJson]]), not a production path — the Column
  * form codegens and pushes down; this form pays serde per row. The
  * property spec asserts the two produce identical rows over a
  * generator-driven wire corpus, catching semantic drift between the
  * Column algebra and the reference's imperative semantics.
  *
  * Corner-case contract (same as the Column form, divergences from the
  * reference documented in SURVEY §7.5):
  *  - non-object / malformed JSON → drop (F1);
  *  - required key missing or JSON-null → drop (P3/F2; the reference's
  *    key-presence check would keep JSON null — we treat null as absent);
  *  - `value` must be a JSON number (or absent/null → default 0.0);
  *    a non-numeric `value` poisons the row exactly like from_json's
  *    PERMISSIVE corrupt-record path (the reference's `float(...)`
  *    raise-and-drop, Streamingdag.py:233-236);
  *  - unparseable timestamp → event_hour 0, and the row drops at the
  *    typed-sink gate (timestamp must become a real TIMESTAMP);
  *  - quality gate: score ≥ 50.
  */
object TypedPipeline {

  // Jackson is on the classpath as a Spark dependency; one mapper per JVM
  @transient private lazy val mapper = new ObjectMapper

  def parseEvents(
      raw: Dataset[String],
      deterministic: Boolean = false): Dataset[Event] = {
    val spark = raw.sparkSession
    import spark.implicits._
    // session timezone is plan-time state; capture it outside the closure
    val tz = spark.conf.get("spark.sql.session.timeZone")
    raw.flatMap(line => parseOne(line, tz, deterministic))
  }

  /** The DoFn body: one wire message in, zero or one enriched events out. */
  private[graft] def parseOne(
      line: String,
      tz: String,
      deterministic: Boolean): Option[Event] = {
    val root =
      try mapper.readTree(line)
      catch { case _: Exception => null }
    if (root == null || !root.isObject) return None // F1: corrupt JSON

    // P6: schema-bounded projection — unknown keys never read
    def field(name: String): Option[JsonNode] =
      Option(root.get(name)).filterNot(_.isNull)
    // from_json(StringType) parity: scalars stringify via their text,
    // nested values via their JSON rendering
    def strField(name: String): Option[String] =
      field(name).map(n => if (n.isTextual) n.asText else n.toString)

    // P3/F2: required-presence gate (null counts as missing)
    if (!EventSchema.requiredFields.forall(f => field(f).isDefined)) return None

    // P5: value coercion — JSON number or absent; anything else poisons
    // the row (PERMISSIVE corrupt-record parity)
    val valueOpt: Option[Double] = field("value") match {
      case None => None
      case Some(n) if n.isNumber => Some(n.asDouble)
      case Some(_) => return None
    }
    val value = valueOpt.getOrElse(0.0)

    val id = strField("id").get
    val tsString = strField("timestamp").get
    val message = strField("message").get
    val userId = strField("user_id").get
    val eventType = strField("event_type").get

    val zone = ZoneId.of(tz)
    val parsedTs: Option[Instant] = parseTimestamp(tsString, zone)

    // P8: event_hour in the session timezone, error → 0
    val eventHour = parsedTs
      .map(i => LocalDateTime.ofInstant(i, zone).getHour)
      .getOrElse(0)

    // P9: four +25 conditions over the COERCED value
    val score =
      (if (userId.nonEmpty && userId != "unknown") 25 else 0) +
        (if (message.nonEmpty) 25 else 0) +
        (if (value > 0) 25 else 0) +
        (if (tsString.nonEmpty) 25 else 0)
    if (score < 50) return None // F3

    // typed-sink gate: the sink column is a real TIMESTAMP
    val ts = parsedTs match {
      case Some(i) => Timestamp.from(i)
      case None => return None
    }
    val processedAt = // P4
      if (deterministic) ts else Timestamp.from(Instant.now())

    def opt(name: String): Option[String] = strField(name)
    Some(Event(
      id = id,
      timestamp = ts,
      message = Some(message),
      user_id = Some(userId),
      event_type = Some(eventType),
      value = Some(value),
      processed_at = processedAt,
      source = opt("source"),
      ip_address = opt("ip_address"),
      user_agent = opt("user_agent"),
      page = opt("page"),
      referrer = opt("referrer"),
      product_id = opt("product_id"),
      currency = opt("currency"),
      device_id = opt("device_id"),
      location = opt("location"),
      // code points, not UTF-16 units — the Column path's length() counts
      // code points, and this twin exists to match it exactly
      message_length = Some(message.codePointCount(0, message.length)),
      event_hour = Some(eventHour),
      data_quality_score = Some(score)))
  }

  private val spaceLocal = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS]")

  /** try_to_timestamp parity for the wire formats the producer emits:
    * ISO-8601 with offset/Z, ISO local with 'T', "yyyy-MM-dd HH:mm:ss",
    * bare dates. Everything else → None (the reference's Z→+00:00 fixup +
    * fromisoformat, Streamingdag.py:207-212, with errors → fallback).
    */
  private[graft] def parseTimestamp(s: String, zone: ZoneId): Option[Instant] = {
    def attempt(f: => Instant): Option[Instant] =
      try Some(f) catch { case _: Exception => None }
    attempt(OffsetDateTime.parse(s).toInstant)
      .orElse(attempt(LocalDateTime.parse(s).atZone(zone).toInstant))
      .orElse(attempt(LocalDateTime.parse(s, spaceLocal).atZone(zone).toInstant))
      .orElse(attempt(LocalDate.parse(s).atStartOfDay(zone).toInstant))
  }
}
