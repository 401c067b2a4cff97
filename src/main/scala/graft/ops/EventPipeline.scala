package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.EventSchema

/** The reference's core per-record pipeline — the `ParsePubSubMessage`
  * DoFn (Streamingdag.py:159-236) — decomposed into pure Column algebra
  * so Catalyst can push, prune, fold and codegen every step. No UDFs.
  *
  * Steps (SURVEY.md §2.3–2.4):
  *   P1 bytes→string decode        — source-level (text source is string)
  *   P2 JSON parse                 — from_json, PERMISSIVE (null on corrupt)
  *   F1 corrupt-record filter      — parsed struct IS NOT NULL
  *   P3/F2 required-field gate     — id/timestamp/message/user_id/event_type
  *   P4 processing-time stamp      — current_timestamp()
  *   P5 type coercion + defaulting — value → double, default 0.0
  *   P6 optional-field projection  — schema-declared nullables
  *   P7 message_length             — length(message)
  *   P8 event_hour                 — hour(to_timestamp(...)), error→0
  *   P9 data_quality_score         — four +25 conditions
  *   F3 quality threshold          — score >= 50
  *
  * The whole chain is one narrow (shuffle-free) map stage: at 100 TB it
  * scales linearly with input splits — no driver-side work, no state.
  */
object EventPipeline {

  /** Wire schema + PERMISSIVE corrupt-record column: from_json yields a
    * struct of nulls for malformed input (not a null struct), so corrupt
    * rows are only distinguishable via columnNameOfCorruptRecord.
    */
  private val corruptCol = "_corrupt_record"
  private val parseSchema =
    EventSchema.wireSchema.add(corruptCol, org.apache.spark.sql.types.StringType)
  private val parseOpts = Map("columnNameOfCorruptRecord" -> corruptCol)

  /** P2+F1: parse a column of raw JSON strings against the declared wire
    * schema; corrupt JSON is dropped — the Spark twin of
    * Streamingdag.py:233-234. Unknown keys are dropped by construction
    * (ignoreUnknownValues, Streamingdag.py:319).
    *
    * The parse sits behind an [[graft.functions.OptimizerBarrier]] so the
    * downstream validate/quality filters can't be substituted through the
    * projection — without it the pushed Filter carried ~12 copies of
    * `from_json` (round-1 review). One parse per row, on every execution
    * path, is the plan we want.
    */
  def parse(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw
      .select(graft.functions.BarrierFunctions.barrier(
        from_json(col(jsonCol), parseSchema, parseOpts)).as("e"))
      .filter(col(s"e.$corruptCol").isNull)
      .select("e.*")
      .drop(corruptCol)

  /** P3/F2: required-field presence gate (Streamingdag.py:175-181).
    * The reference checks dict-key *presence*; a JSON null id would pass
    * Beam's check and then be stringified to "None". We treat null as
    * missing (the saner semantics — divergence documented in SURVEY §7.5).
    */
  val requiredFieldsPresent: Column =
    EventSchema.requiredFields.map(col(_).isNotNull).reduce(_ && _)

  def validate(df: DataFrame): DataFrame = df.filter(requiredFieldsPresent)

  /** P8: event_hour with the reference's error→0 fallback
    * (Streamingdag.py:207-212). try_to_timestamp parses ISO-8601 with 'Z'
    * natively (the reference's Z→+00:00 fixup, Streamingdag.py:209);
    * unparseable input → null → 0 (try_* keeps this semantics under
    * Spark 4's default ANSI mode).
    */
  def eventHour(tsString: Column): Column =
    coalesce(hour(try_to_timestamp(tsString)), lit(0)).cast("int")

  /** P9: data-quality score (Streamingdag.py:214-225). Four independent
    * +25 conditions; Python truthiness requires explicit empty-string
    * checks, not just null checks.
    */
  def qualityScore(
      userId: Column,
      message: Column,
      value: Column,
      timestamp: Column): Column = {
    val c1 = when(userId.isNotNull && userId =!= "" && userId =!= "unknown", 25)
      .otherwise(0)
    val c2 = when(message.isNotNull && message =!= "", 25).otherwise(0)
    val c3 = when(value > 0, 25).otherwise(0)
    val c4 = when(timestamp.isNotNull && timestamp.cast("string") =!= "", 25)
      .otherwise(0)
    (c1 + c2 + c3 + c4).cast("int")
  }

  /** P4–P9 over a parsed (wire-schema) DataFrame → sink-schema rows.
    * `deterministic = true` replaces processed_at's current_timestamp()
    * with the parsed event timestamp so oracle comparisons stay stable
    * (SURVEY §7.5: processed_at nondeterminism).
    */
  def enrich(df: DataFrame, deterministic: Boolean = false): DataFrame = {
    val ts = try_to_timestamp(col("timestamp"))
    val processedAt = if (deterministic) ts else current_timestamp()
    df.withColumn("value", coalesce(col("value").cast("double"), lit(0.0)))
      .withColumn("processed_at", processedAt)
      .withColumn("message_length", length(col("message")).cast("int"))
      .withColumn("event_hour", eventHour(col("timestamp")))
      .withColumn(
        "data_quality_score",
        qualityScore(col("user_id"), col("message"), col("value"),
          col("timestamp")))
  }

  /** F3: quality-threshold gate (Streamingdag.py:227-231). */
  def qualityFilter(df: DataFrame, threshold: Int = 50): DataFrame =
    df.filter(col("data_quality_score") >= threshold)

  /** Full chain: raw JSON strings → validated, enriched, quality-filtered
    * sink rows (the Spark twin of the whole Beam pipeline body,
    * Streamingdag.py:285-308). Works identically on batch and streaming
    * DataFrames — the same logical plan is incrementalized by Structured
    * Streaming.
    */
  def fromRawJson(
      raw: DataFrame,
      jsonCol: String = "value",
      deterministic: Boolean = false): DataFrame = {
    val enriched = enrich(validate(parse(raw, jsonCol)), deterministic)
    // Rows whose timestamp string can't parse keep event_hour=0 in the
    // enriched (string-typed) form; the typed sink requires a real
    // TIMESTAMP, so they drop here — the same rows BigQuery's streaming
    // insert would reject in the reference (sloppy-semantics note,
    // SURVEY §7.5).
    val typed = enriched
      .withColumn("timestamp", try_to_timestamp(col("timestamp")))
      .filter(col("timestamp").isNotNull)
    qualityFilter(typed).select(
      EventSchema.sinkColumns.map(col): _*)
  }

  /** K4: dead-letter split — everything `fromRawJson` drops, tagged with
    * the reason, for a quarantine sink (Streamingdag.py:179-181, :230-231,
    * :233-236 log-and-drop paths, made durable).
    */
  def deadLetter(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = raw.withColumn("e",
      graft.functions.BarrierFunctions.barrier(
        from_json(col(jsonCol), parseSchema, parseOpts)))
    val missingReq = EventSchema.requiredFields
      .map(f => col(s"e.$f").isNull).reduce(_ || _)
    val score = qualityScore(col("e.user_id"), col("e.message"),
      coalesce(col("e.value").cast("double"), lit(0.0)), col("e.timestamp"))
    parsed
      .withColumn(
        "reject_reason",
        when(col("e").isNull || col(s"e.$corruptCol").isNotNull, "corrupt_json")
          .when(missingReq, "missing_required_field")
          .when(score < 50, "low_quality")
          // the typed-sink gate in fromRawJson (timestamp must parse to a
          // real TIMESTAMP) — without this arm such rows vanish from both
          // the main and quarantine sinks
          .when(try_to_timestamp(col("e.timestamp")).isNull, "unparseable_timestamp"))
      .filter(col("reject_reason").isNotNull)
      .select(col(jsonCol).as("raw"), col("reject_reason"))
  }
}
