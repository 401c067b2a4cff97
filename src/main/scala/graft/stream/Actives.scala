package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ops.Analytics.activeUsers]]'s DAU row: one
  * watermarked daily window holding an HLL++ distinct-user sketch per
  * day, emitted on window close. The sketch is the at-scale choice by
  * design — streaming DAU over millions of users cannot hold exact user
  * sets in state, and the HLL partial is a few KB per open window
  * regardless of cardinality (the same exact-vs-approx trade
  * [[graft.ops.Analytics.healthCheckApprox]] documents for batch, with
  * the batch operator as the oracle-checked exact anchor).
  */
object Actives {

  def dailyActives(
      events: DataFrame,
      watermark: String = Pipeline.DefaultWatermark,
      rsd: Double = 0.05): DataFrame =
    events
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), "1 day").as("w"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_active_approx"))
      .select(
        unix_micros(col("w.start")).as("day_us"),
        col("n_active_approx"))
}
