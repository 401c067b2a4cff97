package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketching — the KMV (k-minimum-values /
  * bottom-k) estimator next to its exact ground truth. The reference's
  * health check counts distinct users exactly (Streamingdag.py:440-448);
  * at 100 TB a dashboard refreshing that number wants a kilobyte sketch
  * whose bottom-k sets merge associatively across partitions, executors,
  * and days. This operator publishes the sketch AND its observed error so
  * the cutover from exact to approximate is a measured decision, not
  * folklore. (Bar-Yossef et al., RANDOM'02 — "Counting distinct elements
  * in a data stream".)
  */
object Sketch {

  /** Hash space modulus. The hash must be portable — computed identically
    * by any engine that reads the sketch — so it is plain modular integer
    * arithmetic, not an engine-private hash: h(u) = (u·a + c) mod M with
    * M = 1e9+7. BIGINT-exact everywhere for user ids below ~8.3e9.
    */
  val KmvModulus: Long = 1000000007L
  val KmvMulA: Long = 1103515245L
  val KmvAddC: Long = 12345L

  /** Per event type: the bottom-k hash sketch of the distinct-user set,
    * the (k-1)·M/h_k estimate it implies, and the e4 relative error vs
    * the exact distinct count.
    *
    * Shape at 100 TB: the k smallest hashes per group is a rank-k
    * selection, and a naive per-group window sorts EVERY distinct hash
    * through one partition per group (billions of rows per event type).
    * Instead the same two-pass trick as the equi-depth histogram: the
    * distinct (type, hash) collapse — partial-agg friendly — lands on a
    * coarse bucket dimension (≤ nBuckets rows per type), a prefix sum
    * over that kilobyte table locates the bucket holding the k-th rank,
    * and only hashes at-or-below that bucket (expected ~k + one bucket
    * width of survivors) pay the row_number. The exact countDistinct
    * rides the same collapsed frame, so truth costs no extra scan.
    */
  /** Portable hash column over `user_id`. */
  private def userHash = ((col("user_id") * KmvMulA + KmvAddC) % KmvModulus)

  /** Bottom-k per group over a distinct `(group, h)` frame → one row per
    * group with (n_kept, kth_hash). The two-pass rank-selection core
    * shared by [[kmvDistinct]] and [[kmvUnion]] — see [[kmvDistinct]]'s
    * scale note.
    */
  private def bottomKMembers(
      hashes: DataFrame, group: String, k: Int, nBuckets: Int): DataFrame = {
    val bucketWidth = KmvModulus / nBuckets + 1
    val bucketed = hashes.withColumn("bkt", expr(s"h div $bucketWidth"))
    val cum = bucketed
      .groupBy(col(group), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col(group)).orderBy(col("bkt"))))
    // first bucket whose cumulative distinct-hash count reaches k; a group
    // with fewer than k distinct hashes gets no row (keep-all via left join)
    val bstar = cum.filter(col("cum") >= k)
      .groupBy(col(group)).agg(min(col("bkt")).as("bstar"))
    bucketed
      .join(broadcast(bstar), Seq(group), "left")
      .filter(col("bstar").isNull || col("bkt") <= col("bstar"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(group)).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col(group), col("h"))
  }

  private def bottomK(
      hashes: DataFrame, group: String, k: Int, nBuckets: Int): DataFrame =
    bottomKMembers(hashes, group, k, nBuckets)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))

  /** Estimate + error columns from a (n_kept, kth_hash, true_distinct)
    * frame — the (k−1)·M/h_k estimator with the small-set exact branch.
    */
  private def withEstimate(df: DataFrame, k: Int): DataFrame = df
    .withColumn("est_distinct",
      when(col("n_kept") < k, col("n_kept"))
        .otherwise(expr(s"(${k - 1}L * $KmvModulus) div kth_hash")))
    .withColumn("err_e4",
      expr("abs(est_distinct - true_distinct) * 10000 div true_distinct"))

  def kmvDistinct(
      events: DataFrame,
      k: Int = 64,
      nBuckets: Int = 1024): DataFrame = {
    require(k > 1, "k must exceed 1")
    val hashes = events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), userHash.as("h"))
      .distinct()
      .persist()
    val sketch = bottomK(hashes, "event_type", k, nBuckets)
    // u → (u·a + c) mod M is a bijection on [0, M) for prime M ∤ a, so
    // counting distinct hashes IS the exact distinct-user count for ids
    // below M (at ≥1e9 ids you'd widen M before the sketch, not after)
    val truth = hashes.groupBy(col("event_type"))
      .agg(count(lit(1)).as("true_distinct"))
    withEstimate(sketch.join(truth, Seq("event_type")), k)
      .select(col("event_type"), col("n_kept"), col("kth_hash"),
        col("est_distinct"), col("true_distinct"), col("err_e4"))
      .orderBy(col("event_type"))
  }

  /** KMV mergeability, demonstrated: sketch two overlapping cohorts
    * (even/odd day-of-month — users active in both appear in both)
    * independently, then estimate the UNION's cardinality from the two
    * k-sized sketches ALONE. bottom-k(bottom-k(A) ∪ bottom-k(B)) =
    * bottom-k(A ∪ B) identically — the associative-merge property that
    * lets a 1000-executor job (or 30 daily jobs) sketch shards
    * independently and combine kilobytes instead of re-scanning 100 TB;
    * the spec pins the merged sketch equal to a direct whole-corpus
    * sketch. Output: one row per cohort plus the merged row, each with
    * the estimate and its exact truth.
    *
    * Shape: one distinct collapse onto (cohort, hash); per-cohort
    * bottom-k via the same two-pass selection; the merge ranks ≤ 2k
    * surviving hashes. The union truth is a distinct-count of the same
    * collapsed frame — no extra scan of the raw table.
    */
  def kmvUnion(
      events: DataFrame,
      k: Int = 64,
      nBuckets: Int = 1024): DataFrame = {
    require(k > 1, "k must exceed 1")
    val hashes = events
      .filter(col("user_id").isNotNull)
      .select(
        when(dayofmonth(col("ts")) % 2 === 0, "a").otherwise("b").as("part"),
        userHash.as("h"))
      .distinct()
      .persist()
    val parts = bottomK(hashes, "part", k, nBuckets)
      .join(hashes.groupBy(col("part"))
        .agg(count(lit(1)).as("true_distinct")), Seq("part"))
    // the merged sketch sees ONLY the two sketches' member hashes (≤ 2k
    // rows), exactly what a combiner would receive
    val members = bottomKMembers(hashes, "part", k, nBuckets).select(col("h"))
    val merged = members.distinct()
      .withColumn("part", lit("merged"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("part")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .join(hashes.select(col("h")).distinct()
        .agg(count(lit(1)).as("true_distinct"))
        .withColumn("part", lit("merged")), Seq("part"))
    withEstimate(parts.unionByName(merged), k)
      .select(col("part"), col("n_kept"), col("kth_hash"),
        col("est_distinct"), col("true_distinct"), col("err_e4"))
      .orderBy(col("part"))
  }

  /** DuckDB oracle for [[kmvDistinct]] — the straightforward one-window
    * formulation (the oracle need not be scale-shaped).
    */
  def kmvDistinctOracleSql(k: Int = 64): String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    (user_id * $KmvMulA + $KmvAddC) % $KmvModulus AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT event_type, h,
       |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |      FROM h),
       |sk AS (SELECT event_type, count(*)::BIGINT AS n_kept,
       |         max(h)::BIGINT AS kth_hash
       |       FROM r WHERE rn <= $k GROUP BY 1),
       |t AS (SELECT event_type, count(*)::BIGINT AS true_distinct
       |      FROM h GROUP BY 1),
       |e AS (SELECT event_type, n_kept, kth_hash, true_distinct,
       |        CASE WHEN n_kept < $k THEN n_kept
       |             ELSE (${k - 1}::BIGINT * $KmvModulus) // kth_hash
       |        END::BIGINT AS est_distinct
       |      FROM sk JOIN t USING (event_type))
       |SELECT event_type, n_kept, kth_hash, est_distinct, true_distinct,
       |  (abs(est_distinct - true_distinct) * 10000 // true_distinct)::BIGINT
       |    AS err_e4
       |FROM e ORDER BY event_type""".stripMargin

  /** DuckDB oracle for [[kmvUnion]]. */
  def kmvUnionOracleSql(k: Int = 64): String =
    s"""WITH h AS (
       |  SELECT DISTINCT
       |    CASE WHEN day(ts) % 2 = 0 THEN 'a' ELSE 'b' END AS part,
       |    (user_id * $KmvMulA + $KmvAddC) % $KmvModulus AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT part, h,
       |        row_number() OVER (PARTITION BY part ORDER BY h) AS rn
       |      FROM h),
       |psk AS (SELECT part, count(*)::BIGINT AS n_kept,
       |          max(h)::BIGINT AS kth_hash
       |        FROM r WHERE rn <= $k GROUP BY 1),
       |ptr AS (SELECT part, count(*)::BIGINT AS true_distinct FROM h GROUP BY 1),
       |mh AS (SELECT DISTINCT h FROM r WHERE rn <= $k),
       |mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM mh),
       |msk AS (SELECT 'merged' AS part, count(*)::BIGINT AS n_kept,
       |          max(h)::BIGINT AS kth_hash
       |        FROM mr WHERE rn <= $k HAVING count(*) > 0),
       |mtr AS (SELECT 'merged' AS part, count(DISTINCT h)::BIGINT AS true_distinct
       |        FROM h),
       |allr AS (SELECT part, n_kept, kth_hash, true_distinct
       |         FROM psk JOIN ptr USING (part)
       |         UNION ALL
       |         SELECT part, n_kept, kth_hash, true_distinct
       |         FROM msk JOIN mtr USING (part)),
       |e AS (SELECT part, n_kept, kth_hash, true_distinct,
       |        CASE WHEN n_kept < $k THEN n_kept
       |             ELSE (${k - 1}::BIGINT * $KmvModulus) // kth_hash
       |        END::BIGINT AS est_distinct
       |      FROM allr)
       |SELECT part, n_kept, kth_hash, est_distinct, true_distinct,
       |  (abs(est_distinct - true_distinct) * 10000 // true_distinct)::BIGINT
       |    AS err_e4
       |FROM e ORDER BY part""".stripMargin

  /** Mergeable QUANTILE sketch next to KMV's distinct-count — order-value
    * quantiles from a [[graft.functions.KllAggregator]] kilobyte sketch,
    * each estimate graded against the exact rank it lands on. Output per
    * φ: the exact quantile (integer cents, rank-selected the
    * [[Relational.medianCI]] way) and `within_bound` — whether the
    * sketch estimate's TRUE rank sits within `boundE6` (default 5%, the
    * q_health_check_approx envelope convention) of φ·n.
    *
    * Oracle story (the round-9 verdict's "envelope-pin it like the HLL
    * row, batch side exact"): the raw estimate is merge-order-sensitive
    * (partial sketches combine in shuffle-arrival order), but the KLL
    * rank guarantee holds under EVERY merge order, so the emitted columns
    * (φ, n, exact quantile, bound verdict) are deterministic and the
    * DuckDB twin recomputes the exact side and literal TRUE — a full
    * value oracle, not rows-only.
    *
    * Shape at 100 TB: ONE ObjectHashAggregate pass with a bounded buffer
    * (corpus never shuffles — the [[graft.functions.CovarianceAggregator]]
    * argument); everything downstream (cumulative-weight thresholds, the
    * exact histogram, rank lookups) runs on value-dimension frames.
    */
  def quantileSketch(
      orders: DataFrame,
      k: Int = 512,
      phisE4: Seq[Long] = Seq(1000L, 5000L, 9000L, 9900L),
      boundE6: Long = 50000L): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val cents = orders.select(
      (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val items = cents.as[Long]
      .select(new graft.functions.KllAggregator(k).toColumn.name("items"))
      .select(explode(col("items")).as("it"))
      .select(col("it._1").as("v"), col("it._2").as("w"))
    // sketch-sized frame (≤ k·log₂(n/k) rows): the unpartitioned window
    // is deliberate — this is the model, not the corpus
    val cumw = items.withColumn("cumw",
      sum(col("w")).over(Window.orderBy(col("v"), col("w"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n1 = cents.agg(count(lit(1)).as("n"))
    val phis = spark.createDataFrame(phisE4.map(Tuple1(_))).toDF("phi_e4")
    // estimate per φ: smallest sketch value whose cumulative weight
    // reaches ceil(φ·n) — total weight is exactly n (KllAggregator doc)
    val est = cumw.crossJoin(broadcast(n1)).crossJoin(broadcast(phis))
      .withColumn("target", expr("(phi_e4 * n + 9999) div 10000"))
      .groupBy(col("phi_e4"), col("n"))
      .agg(min(when(col("cumw") >= col("target"), col("v"))).as("est_cents"))
    val hist = cents.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    hist.crossJoin(broadcast(est))
      .withColumn("target", expr("(phi_e4 * n + 9999) div 10000"))
      .groupBy(col("phi_e4"), col("n"), col("est_cents"))
      .agg(
        min(when(col("cum") >= col("target"), col("cents"))).as("exact_cents"),
        coalesce(max(when(col("cents") <= col("est_cents"), col("cum"))),
          lit(0L)).as("est_rank"))
      .withColumn("rank_err_e6",
        abs(expr("est_rank * 1000000 div n") - col("phi_e4") * 100L))
      .select(col("phi_e4"), col("n").as("n_orders"), col("exact_cents"),
        (col("rank_err_e6") <= boundE6).as("within_bound"))
      .orderBy(col("phi_e4"))
  }

  /** DuckDB oracle for [[quantileSketch]]: the exact side recomputed, the
    * envelope verdict a literal TRUE (see the scaladoc's oracle story).
    */
  def quantileSketchOracleSql(phisE4: Seq[Long] = Seq(1000L, 5000L, 9000L, 9900L)): String = {
    val values = phisE4.map(p => s"($p)").mkString(", ")
    s"""WITH h AS (
       |  SELECT (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT AS cents,
       |    count(*)::BIGINT AS cnt
       |  FROM orders GROUP BY 1),
       |c AS (SELECT cents, sum(cnt) OVER (ORDER BY cents
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM h),
       |s AS (SELECT coalesce(sum(cnt), 0)::BIGINT AS n FROM h),
       |p AS (SELECT phi_e4::BIGINT AS phi_e4
       |      FROM (VALUES $values) t(phi_e4)),
       |q AS (SELECT p.phi_e4, s.n,
       |        min(CASE WHEN c.cum >= (p.phi_e4 * s.n + 9999) // 10000
       |                 THEN c.cents END) AS exact_cents
       |      FROM p CROSS JOIN s CROSS JOIN c GROUP BY 1, 2)
       |SELECT phi_e4, n AS n_orders, exact_cents, TRUE AS within_bound
       |FROM q ORDER BY phi_e4""".stripMargin
  }
}
