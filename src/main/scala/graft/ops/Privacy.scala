package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy / re-identification auditing for training-data releases — the
  * governance readout a pipeline runs BEFORE events or documents leave the
  * boundary. Not in the reference's surface (its pipeline publishes raw
  * events); this is part of the large-scale-training-data plane the brief
  * mandates alongside dedup/curation.
  */
object Privacy {

  /** k-anonymity / l-diversity risk audit over the canonical
    * quasi-identifier tuple (event_type, UTC day, hour-of-day): a row is
    * re-identifiable when its QI cell holds fewer than k rows, and a cell
    * is low-diversity when fewer than l distinct users share it (here
    * l = k — one sweep reports both). Output: one row per threshold with
    * cell/row counts and the integer-e4 share of rows at risk — the
    * number a release gate compares against policy.
    *
    * Shape at 100 TB: the raw table collapses once onto the QI-cell
    * dimension (count + exact distinct users — two-level partial
    * aggregation); everything after runs on that kilobyte-scale cell
    * table crossed with a literal threshold grid. No window, no second
    * pass over the data.
    */
  def kAnonymity(df: DataFrame, ks: Seq[Int] = Seq(2, 5, 10, 20)): DataFrame = {
    val cells = df.groupBy(
        col("event_type"),
        to_date(col("ts")).as("day"),
        hour(col("ts")).as("hr"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))
    val grid = df.sparkSession.createDataFrame(
      ks.sorted.map(k => Tuple1(k.toLong))).toDF("k")
    cells.crossJoin(broadcast(grid))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("n_rows")).as("n_rows_total"),
        sum(when(col("n_rows") < col("k"), 1L).otherwise(0L)).as("risky_cells"),
        sum(when(col("n_rows") < col("k"), col("n_rows")).otherwise(0L))
          .as("risky_rows"),
        sum(when(col("n_users") < col("k"), 1L).otherwise(0L)).as("lowdiv_cells"),
        sum(when(col("n_users") < col("k"), col("n_rows")).otherwise(0L))
          .as("lowdiv_rows"))
      .withColumn("risky_share_e4", expr("risky_rows * 10000 div n_rows_total"))
      .withColumn("lowdiv_share_e4", expr("lowdiv_rows * 10000 div n_rows_total"))
      .orderBy(col("k"))
  }

  /** Right-to-be-forgotten propagation audit: given a tombstone set of
    * user ids (here derived by predicate — in production a deletion-
    * request table), report per event type how many rows the purge
    * removes, how many survive, and how many distinct users disappear.
    * The dry-run a deletion job publishes BEFORE rewriting 100 TB of
    * partitions — and the reconciliation check after (dropped + left
    * must equal total, pinned by the spec).
    *
    * Shape: ONE scan — the tombstone set is a broadcast left join and
    * both the semi (dropped) and anti (survivor) populations fall out
    * of the same null flag; no second pass, no anti-join re-shuffle.
    */
  def forgetAudit(df: DataFrame, modulus: Long = 97L): DataFrame = {
    val tomb = df.filter(col("user_id") % modulus === 0L)
      .select(col("user_id")).distinct()
      .withColumn("gone", lit(true))
    df.join(broadcast(tomb), Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("gone"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("gone").isNull, 1L).otherwise(0L)).as("n_left"),
        countDistinct(when(col("gone"), col("user_id"))).as("n_users_dropped"))
      .withColumn("dropped_share_e4", expr("n_dropped * 10000 div n_total"))
      .orderBy(col("event_type"))
  }

  /** Differential-privacy contribution bounding audit. Every DP release
    * over user data first CLIPS each user to at most c rows per
    * statistic cell — that cap IS the L1 sensitivity the noise scale
    * divides by — and the utility question is how much real data the
    * clip discards. Per candidate cap: cells, raw vs kept rows, how many
    * (user, cell) contributions were clipped, the observed max
    * contribution, and the integer-e4 share of rows lost. The readout a
    * pipeline checks before committing a (cap, ε) pair to a 100 TB
    * aggregation. (Wilson et al., VLDB'20 — "Differentially private SQL
    * with bounded user contribution".)
    *
    * Shape: one collapse of the raw table onto the (event_type, UTC day,
    * user) contribution dimension; the cap sweep is a broadcast grid
    * crossed with that kilobyte-scale frame. No second scan, no window.
    */
  def contributionBound(
      df: DataFrame,
      caps: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    val contribs = df
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val grid = df.sparkSession.createDataFrame(
      caps.sorted.map(c => Tuple1(c.toLong))).toDF("cap")
    contribs.crossJoin(broadcast(grid))
      .groupBy(col("cap"))
      .agg(
        count(lit(1)).as("n_user_cells"),
        sum(col("c")).as("raw_rows"),
        sum(least(col("c"), col("cap"))).as("kept_rows"),
        sum(when(col("c") > col("cap"), 1L).otherwise(0L))
          .as("clipped_user_cells"),
        max(col("c")).as("max_contrib"))
      .withColumn("dropped_share_e4",
        expr("(raw_rows - kept_rows) * 10000 div raw_rows"))
      .orderBy(col("cap"))
  }

  /** L-DIVERSITY AUDIT — the disclosure check k-anonymity misses: a
    * cell can hold ≥ k rows yet expose everyone in it if they all share
    * the same SENSITIVE value (Machanavajjhala et al., ICDE'06). Over
    * the same (event_type, day, hour) quasi-identifier cells as
    * [[kAnonymity]], the sensitive attribute is the spend band
    * (value cents div 500); a cell is weak at level ℓ when it carries
    * fewer than ℓ distinct bands. Reports, per ℓ: weak cells, rows
    * exposed in them, their share, and the corpus-wide minimum
    * diversity.
    *
    * Shape at 100 TB: one corpus collapse to QI cells (distinct-band
    * count rides the same aggregate), then the ℓ-grid is a broadcast
    * cross over the CELL frame — the [[kAnonymity]] discipline.
    */
  def lDiversity(df: DataFrame, ls: Seq[Int] = Seq(2, 3, 5)): DataFrame = {
    val cells = df.groupBy(
        col("event_type"),
        to_date(col("ts")).as("day"),
        hour(col("ts")).as("hr"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(
          expr("cast(round(value * 100) as bigint) div 500")).as("n_bands"))
    val grid = df.sparkSession.createDataFrame(
      ls.sorted.map(l => Tuple1(l.toLong))).toDF("l")
    cells.crossJoin(broadcast(grid))
      .groupBy(col("l"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("n_rows")).as("n_rows_total"),
        sum(when(col("n_bands") < col("l"), 1L).otherwise(0L))
          .as("weak_cells"),
        sum(when(col("n_bands") < col("l"), col("n_rows")).otherwise(0L))
          .as("weak_rows"),
        min(col("n_bands")).as("min_diversity"))
      .withColumn("weak_share_e4", expr("weak_rows * 10000 div n_rows_total"))
      .orderBy(col("l"))
  }

  /** T-CLOSENESS AUDIT — the disclosure check l-diversity misses: a cell
    * can carry many distinct sensitive values yet still leak if its
    * DISTRIBUTION over them differs sharply from the corpus-wide one
    * (Li, Li & Venkatasubramanian, ICDE'07). Over the same
    * (event_type, day, hour) QI cells and the same ordered sensitive
    * attribute (spend band = cents div 500) as [[lDiversity]], the
    * distance is the ordered-attribute Earth-Mover's Distance
    *   EMD(P, Q) = (1/(m−1)) · Σ_j |CumP_j − CumQ_j|
    * computed EXACTLY: the cumulative difference is carried as the
    * integer n_j·G − g_j·N_c (cell count × global total minus global
    * count × cell total), so the per-cell distance is one integer-e6
    * division and the pairing is digit-exact — no floating densities.
    * Reports, per threshold t: cells beyond t, rows exposed in them,
    * their e4 share, and the worst cell distance.
    *
    * Shape at 100 TB: one corpus collapse to (cell, band) counts; the
    * band domain (a broadcast m-row frame) fills the missing zeros, the
    * cumulative runs per-cell over ≤ m rows, and the t-grid crosses the
    * CELL frame — the [[kAnonymity]] discipline. Numerators ride
    * decimal(38,0): n_c·G caps at (corpus rows)², inside decimal range
    * up to ~1e19 rows.
    */
  def tCloseness(
      df: DataFrame, ts: Seq[Int] = Seq(100000, 200000, 300000)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = df.select(
      col("event_type"), to_date(col("ts")).as("day"),
      hour(col("ts")).as("hr"),
      expr("cast(round(value * 100) as bigint) div 500").as("band"))
    val glob = src.groupBy(col("band")).agg(count(lit(1)).as("g"))
    val tot = glob.agg(
      sum(col("g")).as("gtot"), count(lit(1)).as("m"))
    val cells = src.groupBy(col("event_type"), col("day"), col("hr"))
      .agg(count(lit(1)).as("n_c"))
    val cb = src.groupBy(col("event_type"), col("day"), col("hr"), col("band"))
      .agg(count(lit(1)).as("n"))
    val filled = cells.crossJoin(broadcast(glob))
      .join(cb, Seq("event_type", "day", "hr", "band"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
    val perCell = filled
      .withColumn("cum",
        sum(col("n").cast("decimal(38,0)") * col("gtot") -
          col("g").cast("decimal(38,0)") * col("n_c"))
          .over(Window.partitionBy(col("event_type"), col("day"), col("hr"))
            .orderBy(col("band"))))
      .groupBy(col("event_type"), col("day"), col("hr"), col("n_c"),
        col("m"), col("gtot"))
      .agg(sum(abs(col("cum"))).as("num"))
      // m = 1 ⇒ every cum term is identically 0; greatest() only dodges
      // the 0-divisor, it never changes a value
      .select(col("n_c"), expr(
        "cast(num * 1000000 div (greatest(m - 1, 1) * cast(n_c as decimal(38,0)) * gtot) as bigint)")
        .as("emd_e6"))
    val grid = df.sparkSession.createDataFrame(
      ts.sorted.map(t => Tuple1(t.toLong))).toDF("t_e6")
    perCell.crossJoin(broadcast(grid))
      .groupBy(col("t_e6"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("n_c")).as("n_rows_total"),
        sum(when(col("emd_e6") > col("t_e6"), 1L).otherwise(0L))
          .as("far_cells"),
        sum(when(col("emd_e6") > col("t_e6"), col("n_c")).otherwise(0L))
          .as("far_rows"),
        max(col("emd_e6")).as("max_emd_e6"))
      .withColumn("far_share_e4", expr("far_rows * 10000 div n_rows_total"))
      .orderBy(col("t_e6"))
  }

  /** DuckDB twin of [[tCloseness]] — identical integer EMD construction;
    * HUGEINT carries the cumulative numerator.
    */
  def tClosenessOracleSql(ts: Seq[Int] = Seq(100000, 200000, 300000)): String = {
    val grid = ts.sorted.map(t => s"($t)").mkString(", ")
    s"""WITH src AS MATERIALIZED (
       |  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hr,
       |    (value::DECIMAL(12,2) * 100)::BIGINT // 500 AS band
       |  FROM events),
       |gband AS (SELECT band, count(*)::BIGINT AS g FROM src GROUP BY 1),
       |tot AS (SELECT sum(g)::BIGINT AS gtot, count(*)::BIGINT AS m FROM gband),
       |cells AS (SELECT event_type, day, hr, count(*)::BIGINT AS n_c
       |          FROM src GROUP BY 1, 2, 3),
       |cb AS (SELECT event_type, day, hr, band, count(*)::BIGINT AS n
       |       FROM src GROUP BY 1, 2, 3, 4),
       |filled AS (
       |  SELECT c.event_type, c.day, c.hr, c.n_c, gl.band, gl.g,
       |    coalesce(cb.n, 0)::BIGINT AS n, t.gtot, t.m
       |  FROM cells c CROSS JOIN gband gl CROSS JOIN tot t
       |  LEFT JOIN cb ON cb.event_type = c.event_type AND cb.day = c.day
       |    AND cb.hr = c.hr AND cb.band = gl.band),
       |cum AS (
       |  SELECT event_type, day, hr, n_c, m, gtot,
       |    sum(n::HUGEINT * gtot - g::HUGEINT * n_c) OVER (
       |      PARTITION BY event_type, day, hr ORDER BY band) AS cum
       |  FROM filled),
       |per_cell AS (
       |  SELECT n_c, (sum(abs(cum)) * 1000000
       |    // (greatest(m - 1, 1)::HUGEINT * n_c * gtot))::BIGINT AS emd_e6
       |  FROM cum GROUP BY event_type, day, hr, n_c, m, gtot),
       |grid AS (SELECT * FROM (VALUES $grid) t(t_e6))
       |SELECT t_e6::BIGINT AS t_e6, count(*)::BIGINT AS n_cells,
       |  sum(n_c)::BIGINT AS n_rows_total,
       |  sum(CASE WHEN emd_e6 > t_e6 THEN 1 ELSE 0 END)::BIGINT AS far_cells,
       |  sum(CASE WHEN emd_e6 > t_e6 THEN n_c ELSE 0 END)::BIGINT AS far_rows,
       |  max(emd_e6)::BIGINT AS max_emd_e6,
       |  (sum(CASE WHEN emd_e6 > t_e6 THEN n_c ELSE 0 END) * 10000
       |    // sum(n_c))::BIGINT AS far_share_e4
       |FROM per_cell CROSS JOIN grid GROUP BY t_e6 ORDER BY t_e6""".stripMargin
  }

  /** DuckDB twin of [[lDiversity]]. */
  def lDiversityOracleSql(ls: Seq[Int] = Seq(2, 3, 5)): String = {
    val grid = ls.sorted.map(l => s"($l)").mkString(", ")
    s"""WITH cells AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hr,
       |    count(*)::BIGINT AS n_rows,
       |    count(DISTINCT (value::DECIMAL(12,2) * 100)::BIGINT // 500)::BIGINT
       |      AS n_bands
       |  FROM events GROUP BY 1, 2, 3),
       |grid AS (SELECT * FROM (VALUES $grid) t(l))
       |SELECT l::BIGINT AS l, count(*)::BIGINT AS n_cells,
       |  sum(n_rows)::BIGINT AS n_rows_total,
       |  sum(CASE WHEN n_bands < l THEN 1 ELSE 0 END)::BIGINT AS weak_cells,
       |  sum(CASE WHEN n_bands < l THEN n_rows ELSE 0 END)::BIGINT
       |    AS weak_rows,
       |  min(n_bands)::BIGINT AS min_diversity,
       |  (sum(CASE WHEN n_bands < l THEN n_rows ELSE 0 END) * 10000
       |    // sum(n_rows))::BIGINT AS weak_share_e4
       |FROM cells CROSS JOIN grid GROUP BY l ORDER BY l""".stripMargin
  }
}
