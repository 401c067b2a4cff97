package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Schema-drift guard for the events table (round-8 postmortem).
  *
  * The testdata `events.parquet` files changed their `ts` physical type
  * between rounds (TIMESTAMP(NANOS) → timestamp[us]) and the hard-wired
  * nanos reader silently killed 34 driver queries for two rounds. This
  * suite reads the REAL testdata file through every reader path the
  * current environment can produce and asserts they agree — so the next
  * drift fails a named test instead of vanishing queries.
  */
class EventsSchemaDriftSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val ntzConf = "spark.sql.parquet.inferTimestampNTZ.enabled"

  private def minMaxUs(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = df.agg(count(lit(1)), unix_micros(min(col("ts"))),
      unix_micros(max(col("ts")))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("events reader normalizes ts to TimestampType under the session default") {
    val ev = Analytics.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${ev.schema("ts").dataType}")
    val (n, lo, hi) = minMaxUs(ev)
    assert(n > 0)
    // the testdata generator's documented range: January 2024 (UTC)
    assert(lo >= 1704067200000000L && hi < 1709251200000000L,
      s"ts range [$lo, $hi] µs is outside Jan-Feb 2024 — wrong epoch semantics")
  }

  test("NTZ fallback path agrees with the direct-timestamp path row-for-row") {
    // entry points set inferTimestampNTZ=false (direct TimestampType read);
    // a host that leaves the Spark 4 default (true) must get identical
    // values through the TimestampNTZ → cast branch of Analytics.events
    val direct = minMaxUs(Analytics.events(spark, sf))
    val prev = spark.conf.getOption(ntzConf)
    spark.conf.set(ntzConf, "true")
    try {
      val ev = Analytics.events(spark, sf)
      assert(ev.schema("ts").dataType == TimestampType,
        "NTZ branch must still normalize to TimestampType")
      assert(minMaxUs(ev) == direct,
        "NTZ-read events disagree with the direct-timestamp read")
    } finally prev match {
      case Some(v) => spark.conf.set(ntzConf, v)
      case None => spark.conf.unset(ntzConf)
    }
  }

  test("eventsSince pushes its range predicate and matches a post-filter") {
    val since = "2024-01-30T00:00:00Z"
    val sinceUs = java.time.Instant.parse(since).getEpochSecond * 1000000L
    val bounded = Analytics.eventsSince(spark, sf, since)
    val expected = Analytics.events(spark, sf)
      .filter(unix_micros(col("ts")) >= sinceUs)
    assert(bounded.count() == expected.count())
    assert(minMaxUs(bounded) == minMaxUs(expected))
    // and the predicate reached the scan (not just a post-scan Filter)
    val p = bounded.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"), p)
  }
}
