package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Relational

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val orders = Seq(
    (1L, 10L, "O", 100.0, ts("1996-01-01 00:00:00"), "1-URGENT"),
    (2L, 10L, "O", 300.0, ts("1996-02-01 00:00:00"), "1-URGENT"),
    (3L, 10L, "F", 200.0, ts("1996-03-01 00:00:00"), "2-HIGH"),
    (4L, 10L, "F", 400.0, ts("1996-04-01 00:00:00"), "2-HIGH"),
    (5L, 20L, "O", 50.0, ts("1996-05-01 00:00:00"), "3-MEDIUM")
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  test("top-k per customer via window rank") {
    val out = Relational.topOrdersPerCustomer(orders, k = 2).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"), r.getAs[Long]("rnk")))
    assert(out.toSeq == Seq((10L, 4L, 1L), (10L, 2L, 2L), (20L, 5L, 1L)))
  }

  test("typed top-k Aggregator matches the window-function formulation") {
    val viaWindow = Relational.topOrdersPerCustomer(orders, k = 2).collect().toSeq
    val viaAgg = Relational.topOrdersPerCustomerAgg(orders, k = 2).collect().toSeq
    assert(viaWindow == viaAgg)
    // and on real data
    val o = Relational.table(spark, "/root/testdata/sf0.001", "orders")
    val w = Relational.topOrdersPerCustomer(o).collect().toSeq
    val a = Relational.topOrdersPerCustomerAgg(o).collect().toSeq
    assert(w == a)
  }

  test("rollup emits subtotal and grand-total rows") {
    val out = Relational.orderStatusRollup(orders).collect()
    // 3 (status,priority) combos + 2 status subtotals + 1 grand total
    assert(out.length == 6)
    val grand = out.head // nulls sort first
    assert(grand.isNullAt(0) && grand.isNullAt(1))
    assert(grand.getAs[Long]("n") == 5)
    assert(grand.getAs[Double]("total") == 1050.0)
  }

  test("anti join keeps only customers with no orders") {
    val customer = Seq((10L, "A"), (20L, "B"), (30L, "C"))
      .toDF("c_custkey", "c_name")
    val out = Relational.customersWithoutOrders(customer, orders)
      .as[(Long, String)].collect()
    assert(out.toSeq == Seq((30L, "C")))
  }

  test("skyline: grid-pruned 3-D dominance equals brute force; ties and duplicates survive") {
    // 14 customers spanning correlated, anti-correlated, duplicate and
    // single-order shapes — enough to populate several grid cells and
    // put points on cell boundaries
    val spec = Seq(
      1L -> Seq(500.0),                    // whale in one order
      2L -> Seq(500.0),                    // exact duplicate of 1 — both stay
      3L -> Seq(400.0, 100.0),             // same spend, more orders
      4L -> Seq(300.0, 300.0),             // higher spend, 2 orders
      5L -> Seq(200.0),                    // dominated by 1 (fewer on nothing)
      6L -> Seq(100.0, 100.0, 100.0),      // low spend, many orders
      7L -> Seq(600.0, 10.0),              // top spend, 2 orders
      8L -> Seq(50.0),                     // min everything
      9L -> Seq(499.0),                    // just under the duplicate pair
      10L -> Seq(10.0, 10.0, 10.0, 10.0),  // dominated everywhere
      11L -> Seq(610.0, 1.0, 1.0),         // max spend, 3 orders
      12L -> Seq(305.0, 305.0),            // slightly beats 4
      13L -> Seq(2.0, 601.0),              // bigger max order than 7, same n
      14L -> Seq(55.0))                    // dominated by 9
    val df = spec.flatMap { case (cust, prices) =>
      prices.zipWithIndex.map { case (p, i) =>
        (cust * 100 + i, cust, "O", p, ts("1996-01-01 00:00:00"), "1-URGENT") }
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val pts = spec.map { case (cust, prices) =>
      (cust, prices.map(p => math.round(p * 100)).sum, prices.length.toLong,
        prices.map(p => math.round(p * 100)).max) }
    def dom(d: (Long, Long, Long, Long), c: (Long, Long, Long, Long)) =
      d._2 >= c._2 && d._3 <= c._3 && d._4 >= c._4 &&
        (d._2 > c._2 || d._3 < c._3 || d._4 > c._4)
    val brute = pts.filter(c => !pts.exists(d => dom(d, c))).sortBy(_._1)
    val out = Relational.skyline(df, grid = 4).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("spend_cents"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("max_order_cents"))).toSeq
    assert(out == brute)
    // sanity on the hand shapes: the duplicate pair and the max-spender
    // are in; the dominated rows are out
    val keys = out.map(_._1).toSet
    assert(Set(1L, 2L, 7L, 11L, 13L).subsetOf(keys))
    assert(!keys(5L) && !keys(9L) && !keys(10L) && !keys(14L))
  }

  test("pricing summary computes exact decimal-routed sums") {
    val li = Seq(
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.1, 0.02, "A", "F", ts("1996-01-01 00:00:00")),
      (1L, 2L, 1L, 2, 20.0, 200.0, 0.0, 0.02, "A", "F", ts("1996-01-02 00:00:00"))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Relational.pricingSummary(li).head()
    assert(r.getAs[Double]("sum_qty") == 30.0)
    assert(r.getAs[Double]("sum_base_price") == 300.0)
    assert(r.getAs[Double]("sum_disc_price") == 90.0 + 200.0)
    assert(r.getAs[Long]("count_order") == 2)
  }

  test("basketPairs: duplicate lines dedup, support threshold, hand-computed lift") {
    // o1 {p1,p2,p3} (p1 twice — distinct must collapse it), o2/o3 {p1,p2},
    // o4 {p3}: pair (p1,p2) support 3; (p1,p3)/(p2,p3) support 1 → cut
    val li = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Relational.basketPairs(li, minSupport = 2, k = 10).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("support"), r.getAs[Long]("cnt_a"),
        r.getAs[Long]("cnt_b"), r.getAs[Long]("lift_e4")))
    // lift = support·n_orders / (cnt_a·cnt_b) = 3·4/(3·3) → 13333 at e4
    assert(out.toSeq == Seq((1L, 2L, 3L, 3L, 3L, 13333L)))
  }

  test("rfmSegments: boundary binning lands each hand-placed customer in its quartile") {
    // recency [0,5,10,20] → rb [3.75, 7.5, 12.5]; frequency [1..4] →
    // fb [1.75, 2.5, 3.25]; monetary cents [1e4,4e4,9e4,16e4] →
    // mb [32500, 65000, 107500] — every metric exact-dyadic, see impl doc
    val o = Seq(
      (1L, 1L, 100.0, ts("2024-01-10 00:00:00")),
      (2L, 2L, 150.0, ts("2024-01-15 00:00:00")),
      (3L, 2L, 250.0, ts("2024-01-20 00:00:00")),
      (4L, 3L, 300.0, ts("2024-01-21 00:00:00")),
      (5L, 3L, 300.0, ts("2024-01-23 00:00:00")),
      (6L, 3L, 300.0, ts("2024-01-25 00:00:00")),
      (7L, 4L, 400.0, ts("2024-01-27 00:00:00")),
      (8L, 4L, 400.0, ts("2024-01-28 00:00:00")),
      (9L, 4L, 400.0, ts("2024-01-29 00:00:00")),
      (10L, 4L, 400.0, ts("2024-01-30 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = Relational.rfmSegments(o).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("n_customers"),
        r.getAs[Long]("total_cents")))
    assert(out.toSeq == Seq(
      ("111", 1L, 160000L), ("222", 1L, 90000L),
      ("333", 1L, 40000L), ("444", 1L, 10000L)))
  }

  test("revenueGrowth: up and down weeks both exact under truncating division") {
    // Mondays: 100.00 → 200.00 (+100% = 10000 e4) → 50.00 (−7500 e4,
    // truncation toward zero must match the oracle's // semantics)
    val o = Seq(
      (1L, 1L, 100.0, ts("2024-01-01 12:00:00")),
      (2L, 1L, 200.0, ts("2024-01-09 12:00:00")),
      (3L, 2L, 50.0, ts("2024-01-17 12:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = Relational.revenueGrowth(o).collect()
      .map(r => (r.getAs[Long]("revenue_cents"),
        Option(r.getAs[java.lang.Long]("growth_e4")).map(_.toLong)))
    assert(out.toSeq == Seq(
      (10000L, None), (20000L, Some(10000L)), (5000L, Some(-7500L))))
  }

  test("revenueConcentration: eight hand-placed parts land one per octile band") {
    // parts 1..8 with revenue i dollars: octile boundaries interpolate
    // between consecutive revenues, so each part gets its own band —
    // band 1 (top) holds 80000 e4, band 8 holds 10000 e4
    val li = (1 to 8).map(i => (i.toLong, i.toLong, i.toDouble, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
    val out = Relational.revenueConcentration(li).collect()
      .map(r => (r.getAs[Long]("band"), r.getAs[Long]("n_parts"),
        r.getAs[Long]("revenue_e4"), r.getAs[Long]("cum_share_e4")))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      (1 to 8).map(b => (b.toLong, 1L, (9 - b) * 10000L)))
    // cumulative shares of 80/150/210/260/300/330/350/360 over 360
    assert(out.map(_._4).toSeq ==
      Seq(2222L, 4166L, 5833L, 7222L, 8333L, 9166L, 9722L, 10000L))
  }

  test("benfordDigits: string-head digits, exact shares and signed deviations") {
    // totals 1.5, 19, 25, 111 → digits 1,1,2,1: d1 share 750000 (dev
    // +448970 vs 301030), d2 share 250000 (dev +73909 vs 176091)
    val o = Seq((1L, 1.5), (2L, 19.0), (3L, 25.0), (4L, 111.0))
      .toDF("o_orderkey", "o_totalprice")
    val out = Relational.benfordDigits(o).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n"),
        r.getAs[Long]("share_e6"), r.getAs[Long]("benford_e6"),
        r.getAs[Long]("dev_e6")))
    assert(out.toSeq == Seq(
      (1L, 3L, 750000L, 301030L, 448970L),
      (2L, 1L, 250000L, 176091L, 73909L)))
  }

  test("smallQuantityRevenue: integer threshold picks exactly the below-20%-of-avg line") {
    // part 1 (Brand#11): quantities 1, 10, 10 → avg 7, cutoff 1.4 → only
    // the qty-1 line (price 70) counts → avg_yearly = 70/7 = 10.0;
    // part 2 wears another brand and must be excluded entirely
    val li = Seq(
      (1L, 1L, 1.0, 70.0), (2L, 1L, 10.0, 500.0), (3L, 1L, 10.0, 500.0),
      (4L, 2L, 1.0, 999.0)
    ).toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#11"), (2L, "Brand#22")).toDF("p_partkey", "p_brand")
    val r = Relational.smallQuantityRevenue(li, part).head()
    assert(r.getAs[Long]("n_small_lines") == 1L)
    assert(r.getAs[Double]("avg_yearly") == 10.0)
  }

  test("ANSI is on: division by zero throws, the try_ family degrades to null") {
    // Spark 4 defaults to ANSI semantics — the engine must FAIL loudly
    // on bad arithmetic unless the pipeline opts into try_* degradation
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    intercept[Exception] { spark.sql("SELECT 1/0").collect() }
    val r = spark.sql(
      "SELECT try_divide(1, 0) AS d, try_cast('oops' AS INT) AS c").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("recursive CTE reachability: BFS hop counts on a hand path graph") {
    // path 1—2—3 (each edge ×2 orders for the support cut), isolated 9—10:
    // from seed 1: hops 0, 1, 2; parts 9/10 unreachable and absent
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (4L, 2L), (4L, 3L),
      (5L, 9L), (5L, 10L), (6L, 9L), (6L, 10L)
    ).toDF("l_orderkey", "l_partkey")
    li.createOrReplaceTempView("li_rec")
    val out = spark.sql(
      """WITH RECURSIVE
        |items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM li_rec),
        |p AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
        |        ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT u, v FROM p UNION ALL SELECT v AS u, u AS v FROM p),
        |seed AS (SELECT min(u) AS s FROM e),
        |reach(pk, depth) AS (
        |  SELECT s, 0 FROM seed
        |  UNION ALL
        |  SELECT e.v, r.depth + 1 FROM reach r JOIN e ON e.u = r.pk
        |  WHERE r.depth < 3)
        |SELECT pk, CAST(min(depth) AS BIGINT) AS hops FROM reach GROUP BY pk
        |ORDER BY pk""".stripMargin)
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("joinCardinalityEstimate: FK buckets estimate exactly; dangling keys inflate the estimate") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L).map((_, 0L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(1L, 1L, 2L, 9L).map((_, 0.0)).toDF("o_custkey", "o_totalprice")
    val out = Relational.joinCardinalityEstimate(orders, customer, bucketWidth = 2L)
      .collect()
      .map(r => (r.getAs[Long]("bucket"),
        (r.getAs[Long]("n_orders"), r.getAs[Long]("ndv_orders"),
          r.getAs[Long]("n_cust"), r.getAs[Long]("ndv_cust"),
          r.getAs[Long]("est"), r.getAs[Long]("n_actual"),
          r.getAs[Long]("err_e4")))).toMap
    assert(out(0L) == (2L, 1L, 1L, 1L, 2L, 2L, 0L))
    assert(out(1L) == (1L, 1L, 2L, 2L, 1L, 1L, 0L))
    // orders bucket with no customers: estimate 0, actual 0
    assert(out(4L) == (1L, 1L, 0L, 0L, 0L, 0L, 0L))
    // a dangling FK inside a shared bucket: estimated 2, actual 1
    val dangling = Relational.joinCardinalityEstimate(
      Seq(1L, 3L).map((_, 0.0)).toDF("o_custkey", "o_totalprice"),
      Seq(1L, 2L).map((_, 0L)).toDF("c_custkey", "c_nationkey"),
      bucketWidth = 4L).collect()
    assert(dangling.length == 1)
    val r = dangling.head
    assert(r.getAs[Long]("est") == 2L && r.getAs[Long]("n_actual") == 1L &&
      r.getAs[Long]("err_e4") == 10000L)
  }

  test("equiDepthHistogram: two-pass rank selection equals the global-sort answer") {
    import spark.implicits._
    // values 1.00 .. 100.00 shuffled; quartile boundaries at ranks 25/50/75
    val orders = scala.util.Random.shuffle((1 to 100).toList)
      .map(i => (i.toLong, i.toDouble)).toDF("o_orderkey", "o_totalprice")
    val out = Relational.equiDepthHistogram(orders, nBuckets = 4,
        coarseWidth = 1000L).collect()
      .map(r => (r.getAs[Long]("j"), r.getAs[Long]("target_rank"),
        r.getAs[Long]("boundary_cents"))).toSeq
    assert(out == Seq((1L, 25L, 2500L), (2L, 50L, 5000L), (3L, 75L, 7500L)))
    // all-equal values: every boundary is that value, whatever the rank
    val flat = Seq.fill(40)((1L, 7.0)).zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
    val fb = Relational.equiDepthHistogram(flat, nBuckets = 4, coarseWidth = 100L)
      .collect().map(_.getAs[Long]("boundary_cents")).toSeq
    assert(fb == Seq(700L, 700L, 700L))
  }

  test("jackknifeMean: closed form on two buckets; SE in cents") {
    import spark.implicits._
    val orders = Seq((0L, 10.0), (1L, 30.0)).toDF("o_orderkey", "o_totalprice")
    val r = Relational.jackknifeMean(orders, nBuckets = 2).head()
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("mean_cents") == 2000.0)
    // loo means 3000 and 1000 → SE = sqrt((k−1)/k · Σ(x−x̄)²) = 1000
    assert(r.getAs[Double]("jackknife_se_cents") == 1000.0)
  }

  test("incrementalJoinView: four delta terms partition the join and merge to the flat totals") {
    import spark.implicits._
    def day(d: Int) = new Timestamp(d * 86400000L)
    val orders = Seq(
      (1L, day(1), 10.0),  // old order, old customer
      (1L, day(20), 20.0), // delta order, old customer
      (3L, day(1), 30.0),  // old order, delta customer
      (3L, day(20), 40.0)  // delta order, delta customer
    ).toDF("o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, 100L), (3L, 100L), (9L, 200L))
      .toDF("c_custkey", "c_nationkey")
    val out = Relational.incrementalJoinView(orders, customer,
      splitDateIso = "1970-01-10 00:00:00", custSplit = 2L).collect()
    assert(out.length == 1) // customer 9 has no orders → inner join drops it
    val r = out.head
    assert(r.getAs[Long]("c_nationkey") == 100L)
    assert(r.getAs[Long]("n_orders") == 4L)
    assert(r.getAs[Long]("revenue_cents") == 10000L)
    assert(r.getAs[Long]("n_old") == 1L)
    assert(r.getAs[Long]("n_delta_orders") == 1L)
    assert(r.getAs[Long]("n_delta_cust") == 1L)
    assert(r.getAs[Long]("n_delta_both") == 1L)
  }

  test("medianCI: rank arithmetic and order-statistic selection on five known values") {
    import spark.implicits._
    val orders = (1 to 5).map(i => (i.toLong, i * 1.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = Relational.medianCI(orders).collect().head
    // n=5: median ranks 3,3 → 2·300; lo = max(1, ⌊(5−1.96√5)/2⌋) = 1,
    // hi = min(5, ⌈1+(5+1.96√5)/2⌉) = 5 → full-range CI at tiny n
    assert(r.getAs[Long]("n_orders") == 5L)
    assert(r.getAs[Long]("median_x2_cents") == 600L)
    assert(r.getAs[Long]("rank_lo") == 1L && r.getAs[Long]("rank_hi") == 5L)
    assert(r.getAs[Long]("ci_lo_cents") == 100L)
    assert(r.getAs[Long]("ci_hi_cents") == 500L)
  }

  test("poissonBootstrapSE: constant values give zero SE; spread values a positive one") {
    import spark.implicits._
    def orders(prices: Seq[Double]) = prices.zipWithIndex
      .map { case (p, i) => (i.toLong + 1L, p) }
      .toDF("o_orderkey", "o_totalprice")
    val flat = Relational.poissonBootstrapSE(orders(Seq.fill(50)(100.0)))
      .collect().head
    // every replica resamples a constant, so every replica mean is 10000
    // cents exactly and the across-replica variance is exactly zero
    assert(flat.getAs[Long]("n_orders") == 50L)
    assert(flat.getAs[Long]("mean_cents") == 10000L)
    assert(flat.getAs[Long]("boot_se_cents") == 0L)
    assert(flat.getAs[Long]("rep_mean_min_cents") == 10000L)
    assert(flat.getAs[Long]("rep_mean_max_cents") == 10000L)
    assert(flat.getAs[Long]("n_replicas") == 32L)
    val spread = Relational.poissonBootstrapSE(
      orders((1 to 50).map(_ * 100.0))).collect().head
    assert(spread.getAs[Long]("boot_se_cents") > 0L)
    assert(spread.getAs[Long]("rep_mean_min_cents") <
      spread.getAs[Long]("rep_mean_max_cents"))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with null-safe compares") {
    import spark.implicits._
    // key 1 only in old (removed), key 5 only in new (added),
    // key 3 NULL→30 and key 4 40→NULL (both CHANGED — the null-safe
    // compare treats value↔NULL as a difference), key 2 identical
    val oldSnap = Seq(
      (1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(40L)))
      .toDF("k", "v")
    val newSnap = Seq(
      (2L, Some(20L)), (3L, Some(30L)), (4L, None), (5L, Some(50L)))
      .toDF("k", "v")
    val out = Relational.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v"))
      .collect()
      .map(r => (r.getAs[String]("change_type"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))
    assert(out.toSeq == Seq(
      ("added", 1L, 5L, 5L), ("changed", 2L, 3L, 4L),
      ("removed", 1L, 1L, 1L), ("unchanged", 1L, 2L, 2L)))
  }

  test("relatedItems ranks co-purchased parts by exact Jaccard with tie-breaks") {
    import spark.implicits._
    // orders: {1,2} ×3, {1,3} ×2, {2,3} ×2 → counts: 1→5, 2→5, 3→4
    // jaccard(1,2) = 3e6 div (5+5-3) = 428571
    // jaccard(1,3) = 2e6 div (5+4-2) = 285714 = jaccard(2,3)
    val li = (
      (0 until 3).flatMap(i => Seq((10L + i, 1L), (10L + i, 2L))) ++
      (0 until 2).flatMap(i => Seq((20L + i, 1L), (20L + i, 3L))) ++
      (0 until 2).flatMap(i => Seq((30L + i, 2L), (30L + i, 3L)))
    ).toDF("l_orderkey", "l_partkey")
    val out = Relational.relatedItems(li).collect()
      .map(r => (r.getAs[Long]("part_id"), r.getAs[Long]("rec_part_id"),
        r.getAs[Long]("jaccard_e6"), r.getAs[Long]("rnk")))
    assert(out.toSeq == Seq(
      (1L, 2L, 428571L, 1L), (1L, 3L, 285714L, 2L),
      (2L, 1L, 428571L, 1L), (2L, 3L, 285714L, 2L),
      (3L, 1L, 285714L, 1L), (3L, 2L, 285714L, 2L)))
  }

  test("revenueBridge effects close to the revenue delta exactly") {
    import spark.implicits._
    // brand B: 1995 → 10 units at $2.00 (rev 20.00), 1996 → 20 units at
    // $3.00 (rev 60.00). p0_e4 = 200000 div 1000 = 200; p1_e4 = 300.
    // volume = (2000-1000)·200 = 200000; price = (300-200)·1000 =
    // 100000; mix = 400000 - 200000 - 100000 = 100000 (=Δv·Δp exactly)
    def lines(year: Int, n: Int, price: Double) =
      (0 until n).map(i => (year * 100L + i, 1L, 1.0, price,
        0.0, java.sql.Timestamp.valueOf(s"$year-06-01 00:00:00")))
    val li = (lines(1995, 10, 2.0) ++ lines(1996, 20, 3.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
    val part = Seq((1L, "B")).toDF("p_partkey", "p_brand")
    val out = Relational.revenueBridge(li, part).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("rev0_e4") == 200000L)
    assert(r.getAs[Long]("rev1_e4") == 600000L)
    assert(r.getAs[Long]("volume_effect_e4") == 200000L)
    assert(r.getAs[Long]("price_effect_e4") == 100000L)
    assert(r.getAs[Long]("mix_residual_e4") == 100000L)
    assert(r.getAs[Long]("delta_e4") ==
      r.getAs[Long]("volume_effect_e4") + r.getAs[Long]("price_effect_e4") +
        r.getAs[Long]("mix_residual_e4"))
  }

  test("forecastBacktest: seasonal-naive is exact on a perfectly weekly series; naive degrades off-cycle") {
    import spark.implicits._
    // 21 days, revenue = 1.00 + (i mod 7)·0.10 — exact weekly cycle:
    // snaive MAE = 0 at every horizon; naive MAE = 0 only at h = 7
    val orders = (0 until 21).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()),
        1.0 + (i % 7) * 0.10)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Relational.forecastBacktest(orders).collect()
      .map(r => (r.getAs[String]("model"), r.getAs[Long]("h")) ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("mae_cents"),
          r.getAs[Long]("bias_cents"))).toMap
    assert(out.size == 14)
    (1L to 7L).foreach { h =>
      assert(out(("snaive", h))._2 == 0L, s"snaive mae at h=$h")
    }
    assert(out(("naive", 7L))._2 == 0L)
    assert(out(("naive", 1L))._2 > 0L)
    // h=1 eval set: origins 6..19 (targets must have a t-7 lookup)
    assert(out(("naive", 1L))._1 == 14L)
  }

  test("assocRules: directed confidence orders the rules lift cannot distinguish") {
    import spark.implicits._
    // baskets {1,2}, {1,2}, {1}: support(1,2)=2, cnt(1)=3, cnt(2)=2
    // → 2⇒1 confidence 100%, 1⇒2 confidence 66.66%, lift both 1.0
    val li = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Relational.assocRules(li).collect()
      .map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"),
        r.getAs[Long]("support"), r.getAs[Long]("cnt_ante"),
        r.getAs[Long]("conf_e4"), r.getAs[Long]("lift_e4"))).toSeq
    assert(out == Seq(
      (2L, 1L, 2L, 2L, 10000L, 10000L),
      (1L, 2L, 2L, 3L, 6666L, 10000L)))
  }

  test("frequentTriples: A-priori prune drops the candidate whose (q,r) pair is infrequent") {
    import spark.implicits._
    // baskets: {1,2,3} ×2, {1,2,4}, {1,3,4}
    // pair supports: (1,2)=3, (1,3)=3, (2,3)=2, (1,4)=2, (2,4)=1, (3,4)=1
    // only (1,2,3) survives at minSupport 2 — candidates (1,2,4)/(1,3,4)
    // are pruned because their (2,4)/(3,4) sub-pairs are infrequent
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 3L),
      (30L, 1L), (30L, 2L), (30L, 4L),
      (40L, 1L), (40L, 3L), (40L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val pairs = graft.ops.Relational.partPairCounts(li, 2)
    val out = graft.ops.Relational.frequentTriples(li, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 2L)))
  }

  test("giniCoefficient: equality scores 0; a 100/300 split scores exactly 0.25") {
    import spark.implicits._
    val equal = Seq((1L, 2.0), (2L, 2.0)).toDF("o_custkey", "o_totalprice")
    val g0 = graft.ops.Relational.giniCoefficient(equal).collect().head
    assert(g0.getAs[Long]("gini_e6") == 0L)
    val skewed = Seq((1L, 1.0), (2L, 3.0)).toDF("o_custkey", "o_totalprice")
    val g1 = graft.ops.Relational.giniCoefficient(skewed).collect().head
    assert(g1.getAs[Long]("n_customers") == 2L)
    assert(g1.getAs[Long]("total_cents") == 400L)
    assert(g1.getAs[Long]("gini_e6") == 250000L)
  }

  test("kruskalWallis: perfectly separated groups hand-compute; one-group and empty inputs stay null") {
    import spark.implicits._
    // nations 1,2 with spends (1,3) and (5,7) dollars: no ties, ranks
    // 1..4 (x2: 2,4,6,8). R2_1 = 6, R2_2 = 14; terms 18, 98; n=4, k=2.
    // H = 3*116/(4*5) - 3*5 = 17.4 - 15 = 2.4; no ties -> C = 1 -> 24000
    val orders = Seq((1L, 1.0), (2L, 3.0), (3L, 5.0), (4L, 7.0))
      .toDF("o_custkey", "o_totalprice")
    val customer = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("c_custkey", "c_nationkey")
    val r = graft.ops.Relational.kruskalWallis(orders, customer)
      .collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("tie_poly") == 0L)
    assert(r.getAs[Long]("h_e4") == 24000L)
    // all spends identical -> total ties cancel the correction -> NULL
    val flat = Seq((1L, 2.0), (2L, 2.0), (3L, 2.0), (4L, 2.0))
      .toDF("o_custkey", "o_totalprice")
    val f = graft.ops.Relational.kruskalWallis(flat, customer)
      .collect().head
    assert(f.isNullAt(f.fieldIndex("h_e4")))
  }

  test("anovaF: identical groups score F=0; a separated group hand-computes") {
    import spark.implicits._
    // two nations, per-customer spends (in whole dollars): nation 1 ->
    // (1, 3), nation 2 -> (5, 7). S1=4, S2=12, S=16, n=4, k=2.
    // terms: 4^2/2=8, 12^2/2=72; c=16^2/4=64; SSB=80-64=16;
    // sxx=1+9+25+49=84; SSW=84-80=4; F=(16/1)/(4/2)=8 -> 80000;
    // eta2 = 16e6 div 20 = 800000
    val orders = Seq((1L, 1.0), (2L, 3.0), (3L, 5.0), (4L, 7.0))
      .toDF("o_custkey", "o_totalprice")
    val customer = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("c_custkey", "c_nationkey")
    val r = graft.ops.Relational.anovaF(orders, customer).collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("ssb") == 16L && r.getAs[Long]("ssw") == 4L)
    assert(r.getAs[Long]("f_e4") == 80000L)
    assert(r.getAs[Long]("eta2_e6") == 800000L)

    // same distribution in both nations -> SSB = 0, F = 0
    val cust2 = Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L))
      .toDF("c_custkey", "c_nationkey")
    val orders2 = Seq((1L, 2.0), (2L, 2.0), (3L, 6.0), (4L, 6.0))
      .toDF("o_custkey", "o_totalprice")
    val r2 = graft.ops.Relational.anovaF(orders2, cust2).collect().head
    assert(r2.getAs[Long]("ssb") == 0L)
    assert(r2.getAs[Long]("f_e4") == 0L)
  }

  test("goldenRecords: most-recent-wins survivorship, additive sums, min first-seen") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(ms: Long) = new Timestamp(ms)
    // users 1 and 98 share device key d1 (1 % 97 = 98 % 97) -> one entity.
    // user 98 is the most recent (later ts), so its last event type wins;
    // sums add across members; first_seen is the earliest member day.
    val events = Seq(
      (10L, 1L, "view", 2.0, t(86400000L)),
      (11L, 98L, "purchase", 3.5, t(2 * 86400000L)),
      (12L, 98L, "click", 1.0, t(3 * 86400000L))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.Identity.goldenRecords(events).collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"),
        r.getAs[java.sql.Date]("first_seen").toString,
        r.getAs[String]("last_type")))
    assert(out.toSeq == Seq((1L, 2L, 3L, 650L, "1970-01-02", "click")))
  }

  test("fkOrphans: planted dangling keys and nulls are counted per edge, clean edges read zero") {
    import spark.implicits._
    // order 99 does not exist (2 lineitem rows dangle); one null partkey
    val li = Seq((1L, Some(10L)), (1L, Some(10L)), (99L, Some(20L)),
      (99L, None)).toDF("l_orderkey", "l_partkey")
    val orders = Seq((1L, 5L)).toDF("o_orderkey", "o_custkey")
    val customer = Seq((5L, 7L)).toDF("c_custkey", "c_nationkey")
    val part = Seq((10L, "p")).toDF("p_partkey", "p_name")
    val nation = Seq((7L, "x")).toDF("n_nationkey", "n_name")
    val out = graft.ops.Relational
      .fkOrphans(li, orders, customer, part, nation)
      .collect().map(r => r.getAs[String]("fk_edge") ->
        ((r.getAs[Long]("n_child_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_orphan_rows"), r.getAs[Long]("n_orphan_keys"))))
      .toMap
    assert(out("lineitem.l_orderkey->orders") == ((4L, 0L, 2L, 1L)))
    assert(out("lineitem.l_partkey->part") == ((4L, 1L, 1L, 1L)))
    assert(out("orders.o_custkey->customer") == ((1L, 0L, 0L, 0L)))
    assert(out("customer.c_nationkey->nation") == ((1L, 0L, 0L, 0L)))
  }

  test("theilDecomposition: hand-computed micro-nat terms; decomposition identity holds") {
    import spark.implicits._
    // nation 1: spends 100, 300 cents; nation 2: one customer at 400
    // T terms (e6, per value): 100*ln(3/8)e6 + 300*ln(9/8)e6 + 400*ln(3/2)e6
    //   = 100*(-980829) + 300*117783 + 400*405465 = 99438000 -> div 800 = 124297
    // between: 400*ln(0.75)e6 + 400*ln(1.5)e6 = 47113200 -> div 800 = 58891
    val orders = Seq((1L, 1.0), (2L, 3.0), (3L, 4.0))
      .toDF("o_custkey", "o_totalprice")
    val customer = Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("c_custkey", "c_nationkey")
    val r = graft.ops.Relational.theilDecomposition(orders, customer)
      .collect().head
    assert(r.getAs[Long]("n_customers") == 3L)
    assert(r.getAs[Long]("total_cents") == 800L)
    assert(r.getAs[Long]("theil_e6") == 124297L)
    assert(r.getAs[Long]("between_e6") == 58891L)
    assert(r.getAs[Long]("within_e6") == 124297L - 58891L)

    // perfect equality -> every term ln(1) = 0 -> all three indices 0
    val equal = Seq((1L, 2.0), (2L, 2.0)).toDF("o_custkey", "o_totalprice")
    val cust2 = Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey")
    val e = graft.ops.Relational.theilDecomposition(equal, cust2)
      .collect().head
    assert(e.getAs[Long]("theil_e6") == 0L)
    assert(e.getAs[Long]("between_e6") == 0L)
    assert(e.getAs[Long]("within_e6") == 0L)
  }

  test("decayedPopularity: one fresh unit outranks four stale ones") {
    import spark.implicits._
    val fresh = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val stale = java.sql.Timestamp.valueOf("2024-04-06 00:00:00") // 8 weeks
    val li = (Seq((10L, 1L, fresh)) ++
      (1 to 4).map(i => (20L + i, 2L, stale)))
      .toDF("l_orderkey", "l_partkey", "l_shipdate")
    val out = graft.ops.Relational.decayedPopularity(li).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("raw_cnt"),
        r.getAs[Long]("decayed_w"))).toSeq
    // w(0) = 4^16; w(8) = 3^8·4^8 — the fresh unit wins despite 4x the
    // raw demand on the stale part
    assert(out == Seq(
      (1L, 1L, 4294967296L),
      (2L, 4L, 4L * 429981696L)))
  }

  test("recCoverage: coverage counts distinct recommended items against the catalog") {
    import spark.implicits._
    // pair (1,2) survives support ≥ 2 → recs 1→2 and 2→1; part 3 never
    // recommended → coverage 2/3
    val li = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L),
      (30L, 3L)).toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Relational.recCoverage(li).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_catalog") == 3L)
    assert(r.getAs[Long]("n_lists") == 2L)
    assert(r.getAs[Long]("n_covered") == 2L)
    assert(r.getAs[Long]("n_recs") == 2L)
    assert(r.getAs[Long]("coverage_e4") == 6666L)
    assert(r.getAs[Long]("max_rec_freq") == 1L)
  }

  test("hhiConcentration: monopoly scores 10000 bp, an equal duopoly 5000") {
    import spark.implicits._
    val li = Seq((1L, 10L, 5.0), (2L, 20L, 3.0), (3L, 30L, 3.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice")
    val supp = Seq((10L, 1L), (20L, 2L), (30L, 2L))
      .toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "AAA"), (2L, "BBB")).toDF("n_nationkey", "n_name")
    val out = graft.ops.Relational.hhiConcentration(li, supp, nat).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("n_suppliers"),
        r.getAs[Long]("hhi_bp"))).toSeq
    assert(out == Seq(("AAA", 1L, 10000L), ("BBB", 2L, 5000L)))
  }

  test("priceElasticity: a halved price doubling demand scores exactly −1") {
    import spark.implicits._
    // unit 200c→qty 2 and unit 100c→qty 4: the e6-quantized ln diffs are
    // ±round(ln2·1e6) so the two-point slope is −1 with no residue
    val li = Seq((1L, 1L, 2.0, 4.0), (2L, 1L, 4.0, 4.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#A")).toDF("p_partkey", "p_brand")
    val out = graft.ops.Relational.priceElasticity(li, part).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_obs") == 2L)
    assert(out.head.getAs[Long]("elasticity_e4") == -10000L)
  }

  test("segmentMigration: upgrades, churn, and the midpoint split on hand orders") {
    import spark.implicits._
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // range 01-02..01-20 → mid = 01-11; c1 active first half only
    // (band 1), c2 moves band 0 → band 1
    val orders = Seq(
      (1L, 1L, d("2024-01-02"), 600.0),
      (2L, 2L, d("2024-01-02"), 100.0),
      (3L, 2L, d("2024-01-20"), 600.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.ops.Relational.segmentMigration(orders).collect()
      .map(r => (r.getAs[Long]("band_from"), r.getAs[Long]("band_to"),
        r.getAs[Long]("n_customers"))).toSeq
    assert(out == Seq((0L, 1L, 1L), (1L, -1L, 1L)))
  }

  test("ewmaTrend: constant series passes through; a step blends by the exact rational weights") {
    import spark.implicits._
    def orders(rev: Int => Double) = (0 until 41).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()),
        rev(i))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    // constant $1.00: weights normalize away — ewma = 100c on every day,
    // full and partial windows alike
    val flat = Relational.ewmaTrend(orders(_ => 1.0), lastDays = 41).collect()
    assert(flat.length == 41)
    assert(flat.forall(_.getAs[Long]("ewma_cents") == 100L))
    // step to $5.00 on the last day: ewma = (100·ΣW + 400·W0) div ΣW
    val w0 = BigInt(4).pow(31)
    val sw = BigInt(4).pow(32) - BigInt(3).pow(32)
    val expected = ((BigInt(100) * sw + BigInt(400) * w0) / sw).toLong
    val step = Relational.ewmaTrend(
      orders(i => if (i == 40) 5.0 else 1.0), lastDays = 1).collect()
    assert(step.length == 1)
    assert(step.head.getAs[Long]("ewma_cents") == expected)
  }
}
