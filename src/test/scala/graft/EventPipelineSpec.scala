package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.EventPipeline

/** Reference-semantics tests for the parse→validate→enrich→filter chain.
  * Edge cases are the reference's own error paths (SURVEY §5.2-1):
  * corrupt JSON dropped (Streamingdag.py:233-234), missing required field
  * dropped (:175-181), unparseable timestamp → event_hour=0 (:207-212),
  * score boundaries and the ≥50 gate (:214-229), unknown keys ignored
  * (:319).
  */
class EventPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // The control-plane smoke events (Streamingdag.py:384-404 observable
  // shape): one minimal, one with optional purchase fields.
  private val dagMsg1 =
    """{"id":"test-dag-001","timestamp":"2024-01-15T10:00:00Z","message":"DAG test message 1","user_id":"dag_tester","event_type":"test","value":1.0,"source":"airflow_dag"}"""
  private val dagMsg2 =
    """{"id":"test-dag-002","timestamp":"2024-01-15T10:05:00Z","message":"DAG test message 2","user_id":"dag_tester","event_type":"purchase","value":99.99,"source":"airflow_dag","product_id":"test_product"}"""

  private def run(msgs: String*) =
    EventPipeline.fromRawJson(msgs.toDF("value"), deterministic = true)

  test("DAG smoke messages flow through with score 100") {
    val out = run(dagMsg1, dagMsg2).orderBy("id").collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getAs[String]("id") == "test-dag-001")
    assert(r1.getAs[Int]("data_quality_score") == 100)
    assert(r1.getAs[Int]("event_hour") == 10)
    assert(r1.getAs[Int]("message_length") == "DAG test message 1".length)
    assert(r1.getAs[String]("source") == "airflow_dag")
    assert(out(1).getAs[String]("product_id") == "test_product")
    assert(out(1).getAs[Double]("value") == 99.99)
  }

  test("corrupt JSON is dropped") {
    assert(run("{not json", dagMsg1).count() == 1)
  }

  test("missing required field is dropped") {
    val noUser =
      """{"id":"x","timestamp":"2024-01-15T10:00:00Z","message":"m","event_type":"t","value":5.0}"""
    assert(run(noUser).count() == 0)
  }

  test("unknown JSON keys are ignored (BigQuery ignoreUnknownValues twin)") {
    val extra =
      """{"id":"x","timestamp":"2024-01-15T10:00:00Z","message":"m","user_id":"u","event_type":"t","value":5.0,"mystery_key":"zap"}"""
    val out = run(extra)
    assert(out.count() == 1)
    assert(!out.columns.contains("mystery_key"))
  }

  test("quality score boundaries and the >=50 gate") {
    def msg(user: String, message: String, value: Double) =
      s"""{"id":"x","timestamp":"2024-01-15T10:00:00Z","message":"$message","user_id":"$user","event_type":"t","value":$value}"""
    // all four conditions hold → 100
    assert(run(msg("u", "m", 1.0)).select("data_quality_score").as[Int].head() == 100)
    // value=0 fails its check (+25 lost) → 75
    assert(run(msg("u", "m", 0.0)).select("data_quality_score").as[Int].head() == 75)
    // value=0 and user "unknown" → 50, still passes the gate
    assert(run(msg("unknown", "m", 0.0)).select("data_quality_score").as[Int].head() == 50)
    // empty message too → 25 → dropped by the gate
    assert(run(msg("unknown", "", 0.0)).count() == 0)
  }

  test("unparseable timestamp → event_hour=0 in the enrichment (pre-typed form)") {
    val bad = Seq(("x", "not-a-timestamp", "m", "u", "t", 1.0))
      .toDF("id", "timestamp", "message", "user_id", "event_type", "value")
    val enriched = EventPipeline.enrich(bad, deterministic = true)
    assert(enriched.select("event_hour").as[Int].head() == 0)
    // ...and the typed sink path drops it (needs a real TIMESTAMP)
    val asJson =
      """{"id":"x","timestamp":"not-a-timestamp","message":"m","user_id":"u","event_type":"t","value":1.0}"""
    assert(run(asJson).count() == 0)
  }

  test("dead-letter split tags each drop reason") {
    val lowQ =
      """{"id":"x","timestamp":"2024-01-15T10:00:00Z","message":"","user_id":"unknown","event_type":"t","value":0.0}"""
    val noField = """{"id":"x","timestamp":"2024-01-15T10:00:00Z"}"""
    val badTs =
      """{"id":"x","timestamp":"not-a-date","message":"m","user_id":"u","event_type":"t","value":1.0}"""
    val dl = EventPipeline.deadLetter(
      Seq("{corrupt", noField, lowQ, badTs, dagMsg1).toDF("value"))
    val reasons = dl.select("reject_reason").as[String].collect().sorted
    assert(reasons.toSeq == Seq("corrupt_json", "low_quality",
      "missing_required_field", "unparseable_timestamp"))
    // main-path + dead-letter outputs partition the input: nothing vanishes
    val kept = EventPipeline.fromRawJson(
      Seq("{corrupt", noField, lowQ, badTs, dagMsg1).toDF("value"),
      deterministic = true).count()
    assert(kept + dl.count() == 5)
  }

  test("sink schema column order matches the declared 19-column table") {
    val out = run(dagMsg1)
    assert(out.columns.toSeq == graft.schema.EventSchema.sinkColumns)
  }
}
