package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event synthesis — the Spark twin of the reference's producer plane
  * (SURVEY §2.1-S4 sample-data load, §2.10-W6 rate-limited generation,
  * §2.11-X12..X14 id/random/round synthesis; web-application.py:79-89,
  * :432-471, :473-492).
  *
  * Two determinism tiers:
  *  - [[syntheticEvents]]: pure modular arithmetic per row id —
  *    reproducible everywhere AND expressible in ANSI SQL, so the
  *    generator itself is oracle-verifiable;
  *  - [[randomEvents]]: the reference's actual flavor (uuid/rand) —
  *    nondeterministic by design, benchmark/demo only.
  *
  * Both are driver-free (`spark.range` / rate source scale out by
  * partition).
  */
object Generator {

  val EventTypes: Seq[String] =
    Seq("login", "logout", "purchase", "page_view", "search")

  private def typeArray = array(EventTypes.map(lit): _*)

  /** Deterministic generator: one event per `id`, 1 s apart from
    * 2024-01-01T00:00:00Z, LCG-style value/user synthesis.
    */
  def syntheticEvents(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("event_id"),
      expr("timestamp_micros(1704067200000000 + id * 1000000)").as("ts"),
      (col("id") * 2654435761L % 100 + 1).as("user_id"),
      element_at(typeArray, (col("id") % 5 + 1).cast("int")).as("event_type"),
      // exact two-decimal value via single IEEE division — bit-identical
      // in any engine, no rounding-mode dependence
      ((col("id") * 48271L % 49000L + 1L) / lit(100.0)).as("value"))

  /** Reference-flavor generator (uuid(), rand()) — matches the producer's
    * event shape (web-application.py:79-89). Nondeterministic: not for
    * oracle queries.
    */
  def randomEvents(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n).select(
      expr("uuid()").as("id"),
      expr("timestamp_micros(1704067200000000 + id * 1000000)").as("timestamp"),
      concat(lit("msg "), col("id")).as("message"),
      concat(lit("user_"), (floor(rand(seed) * 100) + 1).cast("long")).as("user_id"),
      element_at(typeArray, (floor(rand(seed + 1) * 5) + 1).cast("int")).as("event_type"),
      round(rand(seed + 2) * 500, 2).as("value"))

  /** W6: rate-limited unbounded generation (`rowsPerSecond` ≈ the
    * producer's events-per-minute slider) producing wire-format JSON —
    * feed straight into [[graft.stream.Pipeline.process]].
    */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    raw.select(to_json(struct(
      concat(lit("gen-"), col("value")).as("id"),
      date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("timestamp"),
      concat(lit("generated event "), col("value")).as("message"),
      concat(lit("user_"), pmod(col("value"), lit(100))).as("user_id"),
      element_at(typeArray, pmod(col("value"), lit(5)).cast("int") + 1).as("event_type"),
      round(pmod(col("value") * 48271L, lit(49000L)) / lit(100.0), 2).as("value")
    )).as("value"))
  }

  /** K2: publish serialization — wire-format JSON line per event row
    * (web-application.py:61-77's json.dumps, minus the network).
    */
  def toWire(events: DataFrame, cols: Seq[String]): DataFrame =
    events.select(to_json(struct(cols.map(col): _*)).as("value"))

  /** K3: CSV export (web-application.py:362-371). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
