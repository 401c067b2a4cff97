package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-algebra operators: coalescing overlapping validity/activity
  * intervals into maximal disjoint blocks — the "merge overlapping
  * intervals" problem that backs coverage reporting (how long was a user
  * actually active), SLA accounting (union of incident windows, not their
  * sum), and retention windows (distinct covered time, double-counting
  * removed). The reference's dashboards only aggregate point events
  * (`web-application.py`); this is the interval-valued counterpart a
  * 100 TB deployment needs the moment events carry durations.
  */
object Intervals {

  /** Coalesce per-user activity intervals into maximal merged blocks and
    * report per-user coverage. Each event opens an interval
    * `[ts, ts + dur)` whose duration is a deterministic per-event value
    * (5 + event_id % 120 minutes — a synthetic stand-in for a recorded
    * duration column); overlapping or touching intervals merge.
    *
    * The rewrite is the classic prefix-max sweep: order a user's
    * intervals by (start, end, event_id); an interval STARTS a new block
    * iff its start exceeds the running max end of every earlier interval;
    * the block id is the running count of such starts; blocks then
    * collapse with min(start)/max(end). One shuffle onto user_id (the
    * same clustering the sessionization family pays), two window passes
    * over it, and a two-level aggregate — no self-join, no explode.
    *
    * Shape at 100 TB: windows partition by user_id — millions of small
    * partitions, never one global window (PlanShapeSpec pins the
    * partitioned form for the session family). The prefix max is
    * rows-between-preceding, so Spark evaluates it streaming within the
    * sorted partition — O(1) state per row, spill-free regardless of how
    * many intervals one user has. All arithmetic is integer micros →
    * digit-exact oracle.
    */
  def intervalCoalesce(events: DataFrame): DataFrame = {
    val iv = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("s_us"),
        expr("unix_micros(ts) + (5 + event_id % 120) * 60000000L").as("e_us"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("s_us"), col("e_us"), col("event_id"))
    val prevMax = ord.rowsBetween(Window.unboundedPreceding, -1)
    val blocks = iv
      .withColumn("pmax", max(col("e_us")).over(prevMax))
      .withColumn("starts",
        when(col("pmax").isNull || col("s_us") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("block", sum(col("starts")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("block"))
      .agg(min(col("s_us")).as("bs"), max(col("e_us")).as("be"),
        count(lit(1)).as("n_iv"))
    blocks.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("n_iv")).as("n_intervals"),
        expr("sum(be - bs) div 60000000").as("covered_minutes"),
        expr("max(be - bs) div 60000000").as("longest_minutes"))
      .orderBy(col("user_id"))
  }

  /** DuckDB oracle for [[intervalCoalesce]] — the identical prefix-max
    * sweep in ANSI window SQL (integer micros end to end).
    */
  def intervalCoalesceOracleSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id,
      |    epoch_us(ts) AS s_us,
      |    epoch_us(ts) + (5 + event_id % 120) * 60000000 AS e_us
      |  FROM events WHERE user_id IS NOT NULL),
      |swept AS (
      |  SELECT user_id, event_id, s_us, e_us,
      |    max(e_us) OVER (PARTITION BY user_id
      |      ORDER BY s_us, e_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv),
      |flagged AS (
      |  SELECT user_id, event_id, s_us, e_us,
      |    CASE WHEN pmax IS NULL OR s_us > pmax THEN 1 ELSE 0 END AS starts
      |  FROM swept),
      |blocks AS (
      |  SELECT user_id, s_us, e_us,
      |    sum(starts) OVER (PARTITION BY user_id
      |      ORDER BY s_us, e_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block
      |  FROM flagged),
      |merged AS (
      |  SELECT user_id, block, min(s_us) AS bs, max(e_us) AS be,
      |    count(*) AS n_iv
      |  FROM blocks GROUP BY user_id, block)
      |SELECT user_id,
      |  count(*)::BIGINT AS n_blocks,
      |  sum(n_iv)::BIGINT AS n_intervals,
      |  (sum(be - bs) // 60000000)::BIGINT AS covered_minutes,
      |  (max(be - bs) // 60000000)::BIGINT AS longest_minutes
      |FROM merged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** PURE range join through the OPTIMIZER RULE
    * ([[graft.plans.RangeJoinRule]]): traffic attribution against the
    * ten busiest hours' "surge windows" — each window spans
    * [hour − 15 min, hour + 45 min), deliberately UNALIGNED with any
    * truncation bucket so the join is a genuine interval containment
    * (an event near a busy-hour boundary can fall in two adjacent
    * windows), not a disguised group-by. The join condition is
    * range-only — exactly the shape Catalyst would otherwise plan as a
    * BroadcastNestedLoopJoin — and the injected rule rewrites it to a
    * 1-hour-bin equi-join with the containment as residual
    * (RangeJoinSpec pins both semantics and plan shape).
    *
    * The confs stay set on the session (optimization happens at
    * execution, after this builder returns), so they are SCOPED: the
    * pointColumn conf restricts the rule to joins whose point side is
    * THIS query's point column — a binSize tuned for an hour of
    * microseconds must never leak onto another query's range join
    * (before the scope existed it rewrote an unrelated stats-interval
    * join into a 2.5-billion-element bin sequence). The point column is
    * named `__surge_t_us`, unique to this query, so even another
    * pure-range join over a plain `t_us` epoch column can never inherit
    * the bin size from the still-set session confs. The rewrite itself
    * is semantics-preserving; registration is idempotent.
    *
    * Shape at 100 TB: the window side is dimension-sized (top-10), the
    * event side shuffles ONCE on its hour bin; each window explodes to
    * ≤ 2 bins. All arithmetic integer micros → digit-exact oracle.
    */
  def surgeWindowTraffic(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    graft.plans.RangeJoinRule.register(spark)
    spark.conf.set(graft.plans.RangeJoinRule.BinSizeKey, "3600000000")
    spark.conf.set(graft.plans.RangeJoinRule.PointColumnKey, "__surge_t_us")
    val busiest = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("hour"))
      .limit(10)
    val windows = busiest.select(
      (expr("unix_micros(hour)") - lit(900000000L)).as("lo"),
      (expr("unix_micros(hour)") + lit(2700000000L) - 1L).as("hi"))
    val points = events.select(
      expr("unix_micros(ts)").as("__surge_t_us"), col("user_id"))
    points
      .join(windows,
        col("__surge_t_us") >= col("lo") && col("__surge_t_us") <= col("hi"))
      .groupBy(col("lo").as("window_start_us"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_start_us"))
  }

  /** DuckDB oracle for [[surgeWindowTraffic]] — the plain quadratic
    * range join (DuckDB IEJoins it happily at oracle scale; the rewrite
    * under test is semantics-preserving, so the naive form IS the
    * specification).
    */
  def surgeWindowTrafficOracleSql: String =
    """WITH h AS (
      |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n
      |  FROM events GROUP BY 1 ORDER BY n DESC, hour LIMIT 10),
      |w AS (
      |  SELECT epoch_us(hour) - 900000000 AS lo,
      |    epoch_us(hour) + 2700000000 - 1 AS hi
      |  FROM h),
      |p AS (SELECT epoch_us(ts) AS t_us, user_id FROM events)
      |SELECT w.lo AS window_start_us,
      |  count(*)::BIGINT AS n_events,
      |  count(DISTINCT p.user_id)::BIGINT AS n_users
      |FROM p JOIN w ON p.t_us >= w.lo AND p.t_us <= w.hi
      |GROUP BY w.lo ORDER BY window_start_us""".stripMargin
}
