package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ops.Analytics.throttle]]: at-most-one event
  * per (user, type, tumbling bucket) on the live stream — the
  * notification/alert rate limit enforced AT ingest rather than over the
  * sink table. Built on `dropDuplicatesWithinWatermark`, so the
  * per-key dedup state expires once the watermark passes a key's last
  * sighting — bounded state without putting the bucket in the event-time
  * column.
  *
  * Contract difference vs the batch twin (worth stating, not hiding):
  * batch `throttle` keeps the EARLIEST event per bucket ((ts, event_id)
  * argmin over complete data); the stream keeps the FIRST-ARRIVED one.
  * Under in-order delivery they agree row-for-row (the parity test
  * pins exactly that); under disorder the stream's pick is
  * arrival-dependent while the batch replay over the sink remains the
  * canonical answer — the same lambda posture as [[ChangeCapture]].
  */
object Throttle {

  def throttled(
      events: DataFrame,
      bucketSeconds: Long = 600,
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      // integer div, not a double quotient — see Analytics.userBursts
      .withColumn("bucket",
        expr(s"unix_micros(ts) div ${bucketSeconds * 1000000L}"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "bucket")
      .drop("bucket")
}
