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

  /** KMV INTERSECTION estimate from the two cohort sketches alone — the
    * third set-algebra leg next to [[kmvDistinct]] (cardinality) and
    * [[kmvUnion]] (merge): |A∩B| ≈ ρ · est(|A∪B|) where ρ is the
    * fraction of the union sketch's members present in BOTH cohort
    * sketches (Beyer et al., SIGMOD'07 — "On synopses for distinct-value
    * estimation under multiset operations"). The audience-overlap
    * question ("how many users hit both surfaces?") answered from two
    * kilobyte sketches instead of a 100 TB semi-join.
    *
    * Everything is modular-integer arithmetic on the SAME portable hash
    * as the other KMV ops, and the estimator is a pure integer function
    * of the two member sets — so unlike most sketch queries this one
    * pairs with a FULL value oracle: DuckDB recomputes the identical
    * sketch, estimate, and truth digit-for-digit. Truth columns ride
    * along ([[kmvDistinct]] convention) so the error is measured, not
    * asserted.
    *
    * Shape: one distinct collapse onto (cohort, hash); per-cohort
    * bottom-k; all estimator work happens on ≤ 2k surviving hashes.
    */
  def kmvIntersect(
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
    val members = bottomKMembers(hashes, "part", k, nBuckets)
      .select(col("part"), col("h"))
    val mA = members.filter(col("part") === "a").select(col("h"))
    val mB = members.filter(col("part") === "b").select(col("h"))
    // union sketch: bottom-k of the ≤2k member hashes (tiny frame — the
    // unpartitioned rank is over sketch members, never data)
    val unionK = mA.unionByName(mB).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
      .filter(col("rn") <= k)
      .join(mA.withColumn("in_a", lit(1L)), Seq("h"), "left")
      .join(mB.withColumn("in_b", lit(1L)), Seq("h"), "left")
    val sk = unionK.agg(
      count(lit(1)).as("n_kept"),
      max(col("h")).as("kth_hash"),
      sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L).otherwise(0L))
        .as("n_both"))
    val truth = hashes.agg(
      sum(when(col("part") === "a", 1L).otherwise(0L)).as("true_a"),
      sum(when(col("part") === "b", 1L).otherwise(0L)).as("true_b"))
    val trueInter = hashes.groupBy(col("h"))
      .agg(count(lit(1)).as("np"))
      .agg(coalesce(sum(when(col("np") === 2L, 1L).otherwise(0L)), lit(0L))
        .as("true_intersect"))
    sk.crossJoin(truth).crossJoin(trueInter)
      .withColumn("est_union", expr(
        s"CASE WHEN n_kept < $k THEN n_kept " +
          s"ELSE ${k - 1}L * ${KmvModulus}L div kth_hash END"))
      .withColumn("est_intersect", expr(
        "CASE WHEN n_kept > 0 THEN n_both * est_union div n_kept ELSE 0 END"))
      .withColumn("err_e4", expr(
        """CASE WHEN true_intersect > 0
          |  THEN abs(est_intersect - true_intersect) * 10000
          |    div true_intersect END""".stripMargin))
      .select(col("true_a"), col("true_b"), col("n_both"),
        col("est_intersect"), col("true_intersect"), col("err_e4"))
  }

  /** DuckDB oracle for [[kmvIntersect]] — the identical integer
    * estimator over the identical portable hash.
    */
  def kmvIntersectOracleSql(k: Int = 64): String =
    s"""WITH h AS (
       |  SELECT DISTINCT
       |    CASE WHEN day(ts) % 2 = 0 THEN 'a' ELSE 'b' END AS part,
       |    (user_id * $KmvMulA + $KmvAddC) % $KmvModulus AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT part, h,
       |        row_number() OVER (PARTITION BY part ORDER BY h) AS rn
       |      FROM h),
       |m AS (SELECT part, h FROM r WHERE rn <= $k),
       |u AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |      FROM (SELECT DISTINCT h FROM m)),
       |uk AS (SELECT h FROM u WHERE rn <= $k),
       |sk AS (SELECT count(*)::BIGINT AS n_kept,
       |         max(h)::BIGINT AS kth_hash,
       |         coalesce(sum(CASE WHEN h IN (SELECT h FROM m WHERE part = 'a')
       |                   AND h IN (SELECT h FROM m WHERE part = 'b')
       |                  THEN 1 ELSE 0 END), 0)::BIGINT AS n_both
       |       FROM uk),
       |t AS (SELECT
       |        coalesce(sum(CASE WHEN part = 'a' THEN 1 ELSE 0 END), 0)::BIGINT
       |          AS true_a,
       |        coalesce(sum(CASE WHEN part = 'b' THEN 1 ELSE 0 END), 0)::BIGINT
       |          AS true_b
       |      FROM h),
       |ti AS (SELECT count(*)::BIGINT AS true_intersect
       |       FROM (SELECT h FROM h GROUP BY h HAVING count(*) = 2)),
       |e AS (SELECT n_kept, n_both,
       |        CASE WHEN n_kept < $k THEN n_kept
       |             ELSE ${k - 1}::BIGINT * $KmvModulus // kth_hash
       |        END::BIGINT AS est_union
       |      FROM sk),
       |f AS (SELECT t.true_a, t.true_b, e.n_both,
       |        (CASE WHEN e.n_kept > 0
       |              THEN e.n_both * e.est_union // e.n_kept
       |              ELSE 0 END)::BIGINT AS est_intersect,
       |        ti.true_intersect
       |      FROM e CROSS JOIN t CROSS JOIN ti)
       |SELECT true_a, true_b, n_both, est_intersect, true_intersect,
       |  (CASE WHEN true_intersect > 0
       |        THEN abs(est_intersect - true_intersect) * 10000
       |          // true_intersect END)::BIGINT AS err_e4
       |FROM f""".stripMargin

  /** Count-min frequency sketch next to KMV (distinct) and
    * [[quantileSketch]] (quantiles) — the frequency leg of the sketch
    * plane (Cormode & Muthukrishnan, J.Alg'05). `depth` independent
    * modular hash rows × `width` counters; a key's estimate is the MIN
    * of its counters, which can only OVER-count (collisions add, never
    * subtract) — the one-sided guarantee the spec pins. Readout: the
    * top-`topK` true-frequency users with their estimates, truth, and
    * inflation, so the est≥truth invariant and the collision cost are
    * both measured.
    *
    * The hashes are plain modular arithmetic (the [[userHash]] porting
    * argument), so the whole sketch — counters, estimates, inflation —
    * is a deterministic integer function of the data: full value oracle,
    * DuckDB recomputes it digit-for-digit.
    *
    * Shape at 100 TB: ONE partial-aggregated pass collapses the corpus
    * to the depth×width counter table (model-sized, like the Markov
    * transition matrix); the top-k truth side is a second aggregate with
    * map-side combine; estimates join the counter model by (row, bucket)
    * broadcast. Nothing corpus-sized shuffles beyond the two collapses.
    */
  def countMin(
      events: DataFrame,
      depth: Int = 4,
      width: Int = 256,
      topK: Int = 10): DataFrame = {
    require(depth >= 1 && width >= 2 && topK >= 1)
    val spark = events.sparkSession
    val grid = broadcast(
      spark.createDataFrame((0 until depth).map(Tuple1(_))).toDF("r"))
    def bucket(u: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
      (u * (lit(KmvMulA) + r * lit(40503L)) + lit(KmvAddC)) % KmvModulus % width
    val keyed = events.filter(col("user_id").isNotNull)
      .select(col("user_id").cast("long").as("u"))
    val counters = keyed.crossJoin(grid)
      .groupBy(col("r"), bucket(col("u"), col("r")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val top = keyed.groupBy(col("u"))
      .agg(count(lit(1)).as("true_cnt"))
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("true_cnt"), col("u"))))
      .filter(col("rn") <= topK)
      .select(col("u"), col("true_cnt"))
    top.crossJoin(grid)
      .withColumn("bucket", bucket(col("u"), col("r")))
      .join(counters, Seq("r", "bucket"))
      .groupBy(col("u"), col("true_cnt"))
      .agg(min(col("cnt")).as("cm_est"))
      .withColumn("overcount_e4",
        expr("(cm_est - true_cnt) * 10000 div true_cnt"))
      .select(col("u").as("user_id"), col("true_cnt"), col("cm_est"),
        col("overcount_e4"))
      .orderBy(desc("true_cnt"), col("user_id"))
  }

  /** DuckDB oracle for [[countMin]] — identical modular arithmetic. */
  def countMinOracleSql(
      depth: Int = 4, width: Int = 256, topK: Int = 10): String = {
    val rows = (0 until depth).map(r => s"($r)").mkString(", ")
    s"""WITH ev AS (
       |  SELECT user_id::BIGINT AS u FROM events WHERE user_id IS NOT NULL),
       |g AS (SELECT r::BIGINT AS r FROM (VALUES $rows) t(r)),
       |cm AS (SELECT g.r,
       |         ((ev.u * ($KmvMulA + g.r * 40503) + $KmvAddC)
       |           % $KmvModulus) % $width AS bucket,
       |         count(*)::BIGINT AS cnt
       |       FROM ev CROSS JOIN g GROUP BY 1, 2),
       |t AS (SELECT u, count(*)::BIGINT AS true_cnt FROM ev GROUP BY 1),
       |top AS (SELECT u, true_cnt,
       |          row_number() OVER (ORDER BY true_cnt DESC, u) AS rn
       |        FROM t),
       |est AS (SELECT top.u, top.true_cnt, min(cm.cnt)::BIGINT AS cm_est
       |        FROM top JOIN g ON true
       |        JOIN cm ON cm.r = g.r
       |          AND cm.bucket = ((top.u * ($KmvMulA + g.r * 40503)
       |            + $KmvAddC) % $KmvModulus) % $width
       |        WHERE top.rn <= $topK GROUP BY 1, 2)
       |SELECT u AS user_id, true_cnt, cm_est,
       |  ((cm_est - true_cnt) * 10000 // true_cnt)::BIGINT AS overcount_e4
       |FROM est ORDER BY true_cnt DESC, user_id""".stripMargin
  }

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

  /** Row-step for the AMS ±1 hash family — distinct from [[countMin]]'s
    * bucket family so the two sketches never share a hash row.
    */
  val AmsStep: Long = 68111L

  /** AMS "tug-of-war" SECOND-MOMENT sketch (Alon, Matias & Szegedy,
    * STOC'96) — the moments leg of the sketch plane next to KMV
    * (distinct, F0), [[countMin]] (point frequency) and
    * [[quantileSketch]] (order statistics). F2 = Σ f_u² is the SELF-JOIN
    * SIZE of the events table on user_id: the number the optimizer wants
    * before it picks a join strategy, and the skew diagnostic (F2/F1²
    * per-key concentration) — estimated from `groups · perGroup` signed
    * counters instead of a key-frequency table the size of the user
    * dimension.
    *
    * Estimator: each counter r holds S_r = Σ_u σ_r(u)·f_u for a ±1 hash
    * σ_r; E[S_r²] = F2. Counters average within a group (variance ↓),
    * the median across `groups` group-means (odd count) gives the
    * standard median-of-means tail bound. The σ family is the portable
    * modular-linear family of the KMV plane (pairwise, not the paper's
    * 4-wise — so the error envelope is MEASURED against the exact truth
    * riding along, not certified; the spec pins the estimator algebra
    * itself bit-exactly).
    *
    * Exactness & ceiling: everything is BIGINT; |S_r| ≤ F1, so S_r² is
    * Long-exact to F1 ≈ 3·10⁹ rows per sketch scope — beyond that widen
    * the squares to DECIMAL(38,0) the same way KmvModulus widens at
    * ≥1e9 ids (documented, not silent: the group sum would overflow
    * loudly in DuckDB's BIGINT first).
    *
    * Shape at 100 TB: ONE partial-aggregated collapse to the
    * user-frequency frame, a broadcast s-row grid amplification that
    * immediately re-collapses to s counters (map-side combine eats the
    * amplification), and all median/mean algebra runs on the s-row
    * model. Nothing corpus-sized moves after the first exchange.
    */
  def amsF2(
      events: DataFrame,
      groups: Int = 5,
      perGroup: Int = 8): DataFrame = {
    require(groups >= 1 && groups % 2 == 1, "groups must be odd")
    require(perGroup >= 1)
    val s = groups * perGroup
    val spark = events.sparkSession
    val grid = broadcast(
      spark.createDataFrame((0 until s).map(i => Tuple1(i.toLong)))
        .toDF("r"))
    val freq = events.filter(col("user_id").isNotNull)
      .select(col("user_id").cast("long").as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("f"))
    val counters = freq.crossJoin(grid)
      .withColumn("sgn", when(
        ((col("u") * (lit(KmvMulA) + (col("r") + 1L) * lit(AmsStep))
          + lit(KmvAddC)) % KmvModulus) % 2 === 0, 1L).otherwise(-1L))
      .groupBy(col("r"))
      .agg(sum(col("sgn") * col("f")).as("sk"))
    val means = counters
      .groupBy(expr(s"r div $perGroup").as("grp"))
      .agg(expr(s"sum(sk * sk) div $perGroup").as("grp_mean"))
    val med = means
      .withColumn("rn", row_number().over(
        Window.orderBy(col("grp_mean"), col("grp"))))
      .filter(col("rn") === (groups + 1) / 2)
      .select(col("grp_mean").as("est_f2"))
    val truth = freq.agg(sum(col("f") * col("f")).as("true_f2"),
      sum(col("f")).as("n_rows"))
    med.crossJoin(truth)
      .withColumn("n_counters", lit(s.toLong))
      .withColumn("err_e4", expr(
        "CASE WHEN true_f2 > 0 THEN abs(est_f2 - true_f2) * 10000 div true_f2 END"))
      .select(col("n_counters"), col("n_rows"), col("est_f2"),
        col("true_f2"), col("err_e4"))
  }

  /** DuckDB oracle for [[amsF2]] — identical counters, group means,
    * median, and truth, digit-for-digit.
    */
  def amsF2OracleSql(groups: Int = 5, perGroup: Int = 8): String = {
    val s = groups * perGroup
    s"""WITH ev AS (
       |  SELECT user_id::BIGINT AS u FROM events WHERE user_id IS NOT NULL),
       |f AS (SELECT u, count(*)::BIGINT AS f FROM ev GROUP BY 1),
       |g AS (SELECT r::BIGINT AS r FROM generate_series(0, ${s - 1}) t(r)),
       |sk AS (SELECT g.r,
       |         sum(CASE WHEN ((f.u * ($KmvMulA + (g.r + 1) * $AmsStep)
       |                  + $KmvAddC) % $KmvModulus) % 2 = 0
       |                  THEN f.f ELSE -f.f END)::BIGINT AS sk
       |       FROM f CROSS JOIN g GROUP BY 1),
       |m AS (SELECT r // $perGroup AS grp,
       |        (sum(sk * sk) // $perGroup)::BIGINT AS grp_mean
       |      FROM sk GROUP BY 1),
       |med AS (SELECT grp_mean AS est_f2
       |        FROM (SELECT grp_mean,
       |                row_number() OVER (ORDER BY grp_mean, grp) AS rn
       |              FROM m)
       |        WHERE rn = ${(groups + 1) / 2}),
       |t AS (SELECT sum(f * f)::BIGINT AS true_f2,
       |        sum(f)::BIGINT AS n_rows FROM f)
       |SELECT ${s}::BIGINT AS n_counters, n_rows, est_f2, true_f2,
       |  (CASE WHEN true_f2 > 0
       |        THEN abs(est_f2 - true_f2) * 10000 // true_f2
       |   END)::BIGINT AS err_e4
       |FROM med CROSS JOIN t""".stripMargin
  }

  /** KMV set DIFFERENCE |A∖B| — the fourth and final set-algebra leg
    * next to [[kmvDistinct]] (|A|), [[kmvUnion]] (|A∪B|) and
    * [[kmvIntersect]] (|A∩B|): |A∖B| ≈ ρ_only · est(|A∪B|) where ρ_only
    * is the fraction of the union sketch's members present in A's
    * sketch but NOT B's (the same Beyer et al. SIGMOD'07 ratio
    * estimator as the intersection). "How many users did surface A
    * reach that B missed?" from two kilobyte sketches instead of an
    * anti-join over the corpus.
    *
    * Same portable modular-integer arithmetic and same full value
    * oracle as [[kmvIntersect]] (the estimator is a pure integer
    * function of the member sets); truth rides along so the error is
    * measured. Shape: the identical one-distinct-collapse + per-cohort
    * bottom-k; all estimator work on ≤ 2k member hashes.
    */
  def kmvDiff(
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
    val members = bottomKMembers(hashes, "part", k, nBuckets)
      .select(col("part"), col("h"))
    val mA = members.filter(col("part") === "a").select(col("h"))
    val mB = members.filter(col("part") === "b").select(col("h"))
    val unionK = mA.unionByName(mB).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
      .filter(col("rn") <= k)
      .join(mA.withColumn("in_a", lit(1L)), Seq("h"), "left")
      .join(mB.withColumn("in_b", lit(1L)), Seq("h"), "left")
    val sk = unionK.agg(
      count(lit(1)).as("n_kept"),
      max(col("h")).as("kth_hash"),
      sum(when(col("in_a") === 1L && col("in_b").isNull, 1L).otherwise(0L))
        .as("n_only_a"))
    val trueDiff = hashes
      .groupBy(col("h"))
      .agg(max(when(col("part") === "a", 1L).otherwise(0L)).as("has_a"),
        max(when(col("part") === "b", 1L).otherwise(0L)).as("has_b"))
      .agg(coalesce(sum(when(col("has_a") === 1L && col("has_b") === 0L,
        1L).otherwise(0L)), lit(0L)).as("true_diff"))
    sk.crossJoin(trueDiff)
      .withColumn("est_union", expr(
        s"CASE WHEN n_kept < $k THEN n_kept " +
          s"ELSE ${k - 1}L * ${KmvModulus}L div kth_hash END"))
      .withColumn("est_diff", expr(
        "CASE WHEN n_kept > 0 THEN n_only_a * est_union div n_kept ELSE 0 END"))
      .withColumn("err_e4", expr(
        """CASE WHEN true_diff > 0
          |  THEN abs(est_diff - true_diff) * 10000 div true_diff END"""
          .stripMargin))
      .select(col("n_kept"), col("n_only_a"), col("est_diff"),
        col("true_diff"), col("err_e4"))
  }

  /** DuckDB oracle for [[kmvDiff]] — the identical integer estimator
    * over the identical portable hash.
    */
  def kmvDiffOracleSql(k: Int = 64): String =
    s"""WITH h AS (
       |  SELECT DISTINCT
       |    CASE WHEN day(ts) % 2 = 0 THEN 'a' ELSE 'b' END AS part,
       |    (user_id * $KmvMulA + $KmvAddC) % $KmvModulus AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT part, h,
       |        row_number() OVER (PARTITION BY part ORDER BY h) AS rn
       |      FROM h),
       |m AS (SELECT part, h FROM r WHERE rn <= $k),
       |u AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |      FROM (SELECT DISTINCT h FROM m)),
       |uk AS (SELECT h FROM u WHERE rn <= $k),
       |sk AS (SELECT count(*)::BIGINT AS n_kept,
       |         max(h)::BIGINT AS kth_hash,
       |         coalesce(sum(CASE WHEN h IN (SELECT h FROM m WHERE part = 'a')
       |                   AND h NOT IN (SELECT h FROM m WHERE part = 'b')
       |                  THEN 1 ELSE 0 END), 0)::BIGINT AS n_only_a
       |       FROM uk),
       |td AS (SELECT coalesce(sum(CASE WHEN has_a = 1 AND has_b = 0
       |                THEN 1 ELSE 0 END), 0)::BIGINT AS true_diff
       |       FROM (SELECT h,
       |               max(CASE WHEN part = 'a' THEN 1 ELSE 0 END) AS has_a,
       |               max(CASE WHEN part = 'b' THEN 1 ELSE 0 END) AS has_b
       |             FROM h GROUP BY h)),
       |e AS (SELECT n_kept, n_only_a,
       |        CASE WHEN n_kept < $k THEN n_kept
       |             ELSE ${k - 1}::BIGINT * $KmvModulus // kth_hash
       |        END::BIGINT AS est_union
       |      FROM sk)
       |SELECT e.n_kept, e.n_only_a,
       |  (CASE WHEN e.n_kept > 0
       |        THEN e.n_only_a * e.est_union // e.n_kept
       |        ELSE 0 END)::BIGINT AS est_diff,
       |  td.true_diff,
       |  (CASE WHEN td.true_diff > 0
       |        THEN abs((CASE WHEN e.n_kept > 0
       |                 THEN e.n_only_a * e.est_union // e.n_kept
       |                 ELSE 0 END) - td.true_diff) * 10000 // td.true_diff
       |   END)::BIGINT AS err_e4
       |FROM e CROSS JOIN td""".stripMargin
}
