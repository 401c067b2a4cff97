package graft

import org.apache.spark.sql.functions._
import graft.ops.{Identity, Modeling, Similarity}

/** Closed-form modeling plane: grouped OLS, one-pass correlation matrix,
  * MI feature ranking, isotonic calibration, entity resolution, hubness.
  * Each spec pins the math on a hand-checkable input — the oracle pins
  * engine parity, these pin the SEMANTICS.
  */
class ModelingSpec extends SparkTestBase {
  import spark.implicits._

  test("olsByGroup recovers an exact linear relation per group") {
    // group A: y = 2x (cents: 200x), group B: y = 3x + 100
    val li = Seq(
      (1L, 1.0, 2.0), (1L, 2.0, 4.0), (1L, 3.0, 6.0),
      (2L, 1.0, 4.0), (2L, 2.0, 7.0), (2L, 3.0, 10.0))
      .toDF("l_suppkey", "l_quantity", "l_extendedprice")
    val supp = Seq((1L, 10L), (2L, 20L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((10L, "ALPHA"), (20L, "BETA")).toDF("n_nationkey", "n_name")
    val out = Modeling.olsByGroup(li, supp, nat).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // slope in cents-per-unit at e6; exact fits → R² = 1
    assert(out(0) == ("ALPHA", 200000000L, 0L, 1000000L))
    assert(out(1) == ("BETA", 300000000L, 100000000L, 1000000L))
  }

  test("corrMatrix emits the six ordered upper-triangle pairs") {
    val li = Seq(
      (1.0, 10.0, 0.01, 0.02), (2.0, 20.0, 0.02, 0.01),
      (3.0, 30.0, 0.03, 0.03), (4.0, 40.0, 0.04, 0.02))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Modeling.corrMatrix(li).collect()
    assert(out.length == 6)
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("discount_e2", "price_cents"), ("discount_e2", "quantity"),
      ("discount_e2", "tax_e2"), ("price_cents", "quantity"),
      ("price_cents", "tax_e2"), ("quantity", "tax_e2")))
    // quantity and price are perfectly correlated; discount tracks both
    val m = out.map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(m(("price_cents", "quantity")) == 1000000L)
    assert(m(("discount_e2", "quantity")) == 1000000L)
    assert(math.abs(m(("quantity", "tax_e2"))) < 1000000L)
  }

  test("mutualInfo is ~0 for an independent feature and positive for a dependent one") {
    // 40 users, 4 events each; half the users are all-error (label 1).
    // value encodes the label (dependent); n_events is constant
    // (independent — single bin, MI exactly 0).
    val rows = for {
      u <- 0L until 40L
      i <- 0 until 4
    } yield {
      val errored = u % 2 == 0
      (u * 10 + i, u, if (errored) "error" else "click",
        if (errored) 900.0 else 100.0,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Modeling.mutualInfo(events).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out("event_volume") == 0L) // one bin → no information
    assert(out("type_breadth") == 0L) // both cohorts have 1 type → 0
    // value perfectly separates labels → MI = ln 2: two cells each
    // contributing round(1e6·0.5·ln 2) = 346574 micro-nats
    assert(out("value_decile") == 693148L)
  }

  test("isotonicCalibration output is monotone and averages pools of violators") {
    // bins 0..2 with purchase rates 0.0, 1.0, 0.5 → PAVA pools bins 1,2
    // to (1+1)/(2+2)... rates: bin0 0/2, bin1 2/2, bin2 1/2 → pooled
    // bins 1-2: 3/4 = 0.75
    val rows =
      Seq((0.0, "view"), (1.0, "view"),
        (10.5, "purchase"), (10.7, "purchase"),
        (20.5, "purchase"), (20.7, "view"))
    val events = rows.zipWithIndex.map { case ((v, t), i) =>
      (i.toLong, 1L, t, v, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = Modeling.isotonicCalibration(events).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 0L), (1L, 750000L), (2L, 750000L)))
    val fits = out.map(_._2)
    assert(fits.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("resolveEntities stitches chains and leaves singletons alone") {
    // records 1..6: key x links {1,2}, key y links {2,3} → entity {1,2,3};
    // key z links {4,5}; record 6 has a private key → singleton
    val rk = Seq((1L, "x"), (2L, "x"), (2L, "y"), (3L, "y"),
      (4L, "z"), (5L, "z"), (6L, "w")).toDF("record_id", "key")
    val out = Identity.resolveEntities(rk).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 2L), (4L, 2L, 1L), (6L, 1L, 1L)))
  }

  test("resolveEntities converges on a long chain well inside the round bound") {
    // a 64-hop chain: keys k0..k62 link i to i+1 — diameter 63, pointer
    // jumping must close it in ≤ 20 rounds (plain min-label would not)
    val rk = (0L until 63L).flatMap(i =>
      Seq((i, s"k$i"), (i + 1, s"k$i"))).toDF("record_id", "key")
    val out = Identity.resolveEntities(rk, maxRounds = 20).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L && out.head.getLong(1) == 64L)
  }

  test("lofOutliers ranks the density outlier first") {
    // a tight direction bundle (vectors near (1, ~0)) plus one vector
    // pointing orthogonally: cosine-distance density flags it
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array(1.0f, 0.001f * i), 0)) :+ (99L, Array(0.0f, 1.0f), 0)
    val e = vecs.toDF("vec_id", "embedding", "label")
    val out = Similarity.lofOutliers(e, k = 3, topN = 3).collect()
    assert(out.head.getLong(0) == 99L)
    assert(out.head.getLong(1) > 1000000L) // LOF > 1: sparser than neighbors
    // bundle members score ≈ 1
    assert(out.tail.forall(r => r.getLong(1) < 2000000L))
  }

  test("sprtTest stops an extreme arm at the Wald boundary") {
    // even-arm users all convert (all-error), odd-arm users never do:
    // |LLR| grows ln(1.5) ≈ 0.405465 per user → first crossing of
    // ln 19 ≈ 2.944439 at user 8 in both arms, opposite decisions
    val rows = for {
      u <- 0L until 20L
      i <- 0 until 4
    } yield (u * 10 + i, u, if (u % 2 == 0) "error" else "click", 1.0,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.Analytics.sprtTest(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getString(5)))
    assert(out.toSeq == Seq(
      (0L, 10L, 10L, 8L, "reject_h0"),
      (1L, 10L, 0L, 8L, "accept_h0")))
  }

  test("weightedQuantiles follows the weight, not the row count") {
    // unit prices 100/200/900 cents with quantity weights 1/8/1: every
    // weighted quartile lands on the heavy 200; an unweighted median of
    // the three VALUES would also say 200, but p25/p75 would not
    val li = Seq(
      ("A", "O", 1.0, 1.0), ("A", "O", 8.0, 16.0), ("A", "O", 1.0, 9.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val out = graft.ops.Analytics.weightedQuantiles(li).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((10L, 200L, 200L, 200L)))
  }

  test("emdDrift charges empty bins between the distributions") {
    // purchases at bin 0, views at bin 3: the CDF gap is 1e9 across bins
    // 0..2 (including EMPTY bins 1,2) → running EMD ends at 3e9
    val rows = Seq((1L, "purchase", 1.0), (2L, "purchase", 2.0),
      (3L, "view", 30.0), (4L, "view", 31.0))
    val events = rows.map { case (id, t, v) =>
      (id, 1L, t, v, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.Analytics.emdDrift(events).collect()
    assert(out.length == 50)
    val byBin = out.map(r => (r.getLong(0), r.getLong(6))).toMap
    assert(byBin(2L) == 3000000000L) // three full-gap bins accumulated
    assert(byBin(49L) == 3000000000L) // flat after both CDFs saturate
  }

  test("boostedStumps doubles misclassified mass into round 2") {
    // 20 users, separable by value except two label-flipped users →
    // round 1's best stump errs on exactly those two; their weight
    // doubles, so round 2 scores against total mass 22
    val rows = for {
      u <- 0L until 20L
      i <- 0 until 4
    } yield {
      val noisy = u == 3L || u == 12L
      val erroring = (u < 10) ^ noisy
      (u * 10 + i, u, if (erroring) "error" else "click",
        if (u < 10) 900.0 else 100.0,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.Analytics.boostedStumps(events).collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6)))
    assert(out.length == 2)
    assert(out(0) == ((1L, 2L, 20L))) // best stump errs on the 2 flips
    assert(out(1)._1 == 2L && out(1)._3 == 22L) // flipped mass doubled
  }

  test("setCoverSelect picks greedily by marginal gain, not raw size") {
    // doc 1 covers trigrams {abc..e}, doc 2 overlaps doc 1 heavily, doc
    // 3 is small but disjoint: greedy takes 1 (gain 3), then 3 (gain 1
    // beats 2's marginal 1... doc 2 adds 'c d e'? construct precisely:
    // d1: "a b c d e" → trigrams {abc, bcd, cde} (gain 3)
    // d2: "b c d e f" → {bcd, cde, def}: marginal 1 after d1
    // d3: "x y z w"   → {xyz, yzw}: marginal 2 → picked SECOND
    val docs = Seq((1L, "a b c d e"), (2L, "b c d e f"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = graft.ops.Corpus.setCoverSelect(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 3L), (2L, 3L, 2L, 5L), (3L, 2L, 1L, 6L)))
  }

  test("rendezvous rebalance moves keys ONLY to the new node") {
    val part = (1L to 500L).map(Tuple1(_)).toDF("p_partkey")
    val out = graft.ops.Layout.rendezvousRebalance(part, n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 9)
    // the rendezvous invariant: no key moves between two OLD nodes
    assert(out.forall(_._4 == 0L))
    // everything the new node holds is inflow; old nodes only kept keys
    val newNode = out.find(_._1 == 8L).get
    assert(newNode._2 == 0L && newNode._3 > 0L)
    assert(out.filter(_._1 != 8L).forall(_._3 == 0L))
    // mass conservation
    assert(out.map(r => r._2 + r._3).sum == 500L)
    // expected movement ≈ 1/9 of keys; allow a generous band
    assert(newNode._3 > 20L && newNode._3 < 120L)
  }

  test("didEstimate recovers a constructed treatment effect") {
    // control: 100 cents both periods (trend 0); treatment: 100 pre,
    // 150 post → DiD = +50 cents = 50_000_000 at e6
    val rows = for {
      u <- 0L until 8L
      (hour, period) <- Seq((0, 0), (10, 1))
    } yield {
      val treat = u % 2 == 1
      val v = if (treat && period == 1) 1.5 else 1.0
      (u * 100 + hour, u, "view", v,
        java.sql.Timestamp.valueOf(f"2026-01-01 $hour%02d:00:00"))
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = graft.ops.Analytics.didEstimate(events).collect().head
    assert(r.getLong(0) == 16L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((100000000L, 150000000L, 100000000L, 100000000L)))
    assert(r.getLong(5) == 50000000L)
  }

  test("ratioMetricDelta: uniform users have zero delta-method variance") {
    // every arm-0 user contributes exactly (200 cents, 2 events) → the
    // ratio is exact and its user-level variance is zero; arm 1 users
    // vary → positive SE
    val rows =
      (0L until 6L).flatMap { u =>
        val n = if (u % 2 == 0) 2 else (1 + (u % 3)).toInt
        (0 until n).map(i => (u * 10 + i, u, "view", 1.0,
          java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      }
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val byArm = graft.ops.Analytics.ratioMetricDelta(events).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(byArm(0L)._1 == 100000000L) // 100 cents/event exactly, at e6
    assert(byArm(0L)._2 == 0L) // no user-level variation → SE 0
    assert(byArm(1L)._2 >= 0L)
  }

  test("dispersionIndex flags a bursty type and clears a uniform one") {
    // 'steady': 5 events in each of 4 hours (var 0 → D = 0);
    // 'bursty': counts 1,1,1,17 across 4 hours (mean 5, var 64 → D=12.8)
    val steady = for (h <- 0 until 4; i <- 0 until 5)
      yield (h * 100L + i, 1L, "steady", 1.0,
        java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00"))
    val bursty = for (h <- 0 until 4; i <- 0 until (if (h == 3) 17 else 1))
      yield (10000L + h * 100 + i, 1L, "bursty", 1.0,
        java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00"))
    val events = (steady ++ bursty)
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val byType = graft.ops.Analytics.dispersionIndex(events).collect()
      .map(r => (r.getString(0), (r.getLong(3), r.getBoolean(4)))).toMap
    assert(byType("steady") == ((0L, false)))
    assert(byType("bursty") == ((12800000L, true)))
  }

  test("aaCalibration: null splits rarely reject at the 5% level") {
    val events = graft.ops.Analytics.events(spark, "/root/testdata/sf0.001")
    val out = graft.ops.Analytics.aaCalibration(events, k = 16).collect()
    assert(out.length == 16)
    // arms are near-balanced halves of the user set
    assert(out.forall(r => math.abs(r.getLong(1) - r.getLong(2)) <=
      (r.getLong(1) + r.getLong(2)) / 2))
    // A/A calibration: expected ~0.8 rejections in 16; >5 means the
    // test machinery itself is broken
    assert(out.count(_.getBoolean(4)) <= 5)
  }

  test("bucketedJoin matches the plain join result") {
    val li = graft.ops.Relational.table(spark, "/root/testdata/sf0.001", "lineitem")
    val ord = graft.ops.Relational.table(spark, "/root/testdata/sf0.001", "orders")
    val bucketed = graft.ops.Layout.bucketedJoin(spark, li, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(expr("unix_micros(date_trunc('month', o_orderdate))").as("m"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")).as("rev"))
      .orderBy(col("m")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("mahalanobisOutliers flags the off-correlation user, not the big one") {
    // users 0..9 sit near the volume∝spend line (including the LARGEST
    // user); user 99 has tiny volume but huge spend — one-dimensional
    // z-scores would rank the largest user first, Mahalanobis must not
    val rows = (0L until 10L).flatMap { u =>
      (0 to u.toInt).map(i =>
        (u * 100 + i, u, "view", 1.0 + (u % 3) * 0.01,
          java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    } ++ Seq((9900L, 99L, "view", 50.0,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (9901L, 99L, "view", 50.0,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.Analytics.mahalanobisOutliers(events).collect()
    assert(out.head.getLong(0) == 99L)
  }

  test("heapsLaw: vocabulary growth is monotone with a positive fitted slope") {
    val docs = graft.ops.TextAnalysis.documents(spark, "/root/testdata/sf0.001")
    val out = graft.ops.TextAnalysis.heapsLaw(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.length == 8)
    assert(out.sliding(2).forall(p => p(0)._2 <= p(1)._2 && p(0)._3 <= p(1)._3))
    assert(out.last._2 > out.head._2) // checkpoints really grow
    val beta = out.head._4
    assert(out.forall(_._4 == beta)) // one fitted slope
    assert(beta > 0L && beta < 1000000L) // sublinear growth: 0 < β < 1
  }

  test("simpsonsCheck flags a constructed sign reversal") {
    // within each segment the slope is NEGATIVE (x up → y down), but
    // segment B sits at both higher x AND higher y, so pooling flips
    // the sign — the textbook paradox
    val li = Seq(
      ("A", 0.01, 20.0), ("A", 0.02, 18.0), ("A", 0.03, 16.0),
      ("B", 0.20, 50.0), ("B", 0.21, 48.0), ("B", 0.22, 46.0))
      .toDF("l_returnflag", "l_discount", "l_quantity")
    val out = graft.ops.Modeling.simpsonsCheck(li).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.length == 2)
    assert(out.forall(_._2 < 0L)) // every stratum trends down
    assert(out.head._3 > 0L) // the pooled slope trends up
    assert(out.forall(_._4)) // and every stratum is flagged
  }

  test("powerLawAlpha: a geometric degree tail yields alpha in the scale-free band") {
    val li = graft.ops.Relational.table(spark, "/root/testdata/sf0.001", "lineitem")
    val out = graft.ops.Graph.powerLawAlpha(li).collect()
    assert(out.length == 1)
    val alpha = out.head.getLong(2)
    // co-purchase degree tails land in the broad empirical band; the
    // exactness is pinned by the oracle — this pins plausibility
    assert(alpha > 1000000L && alpha < 10000000L)
  }

  test("hourlyValueBands picks exact lower quantiles per hour") {
    // hour 1 holds cents 100..1000 (one each): lower-quantile picks are
    // the 10th/50th/90th percentiles under 10*cw >= k*tw
    val rows = (1 to 10).map(i => (i.toLong, 1L, "view", i.toDouble,
      java.sql.Timestamp.valueOf("2026-01-01 01:00:00")))
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = graft.ops.Analytics.hourlyValueBands(events).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((1L, 10L, 100L, 500L, 900L)))
  }

  test("woeIv: single good and single bad band give symmetric ±ln2 WOE") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    // u1: good (no errors), 1000c → bin 0; u2: bad (1/1 errors),
    // 11000c → bin 5. G=B=1 → pg=2/11 vs pb=1/11 on their bins.
    val events = Seq(
      (1L, 1L, "view", 10.0, t0),
      (2L, 2L, "error", 110.0, t0)
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.Modeling.woeIv(events).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_good"),
        r.getAs[Long]("n_bad"), r.getAs[Long]("woe_e6"),
        r.getAs[Long]("iv_term_e6"), r.getAs[Long]("iv_e6"))).toSeq
    assert(out.length == 10)
    assert(out.head == (0L, 1L, 0L, 693147L, 63013L, 126026L))
    assert(out(5) == (5L, 0L, 1L, -693147L, 63013L, 126026L))
    assert(out.filter(r => r._1 != 0L && r._1 != 5L)
      .forall(r => r._4 == 0L && r._5 == 0L))
  }

  test("retentionHalflife recovers a constructed halving cadence") {
    // 8 users on day 0; exactly half remain active each later day:
    // 4 on day 1, 2 on day 2, 1 on day 3 → slope = -ln2/day,
    // half-life = 1.000 days
    val rows = (0L until 8L).flatMap { u =>
      (0 to 3).collect { case d if u < (8 >> d) =>
        (u * 10 + d, u, "view", 1.0,
          java.sql.Timestamp.valueOf(f"2026-01-${d + 1}%02d 00:00:00"))
      }
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = graft.ops.Analytics.retentionHalflife(events).collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L), (2L, 2L), (3L, 1L)))
    assert(out.head.getLong(4) == 1000L) // half-life 1.000 days at e3
  }

  test("rankBiasedOverlap is 1 for identical rankings' prefix terms") {
    // single-token-per-word docs where length order == distinct-token
    // order → overlap(d) = d at every depth → RBO terms sum toward 1
    val docs = (1 to 25).map(i =>
      (i.toLong, (1 to (26 - i)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.rankBiasedOverlap(docs, k = 20).collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getLong(1) == r.getLong(0))) // full overlap
    // prefix RBO approaches 1 - p^k from below; at d=20, p=0.9:
    // 1 - 0.9^20 ≈ 0.8784 → within [0.87e9, 0.89e9]
    val last = out.last.getLong(3)
    assert(last > 870000000L && last < 890000000L)
  }

  test("hubnessHistogram counts anti-hubs and conserves mass") {
    val e = Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.hubnessHistogram(e, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nVecs = e.count()
    // every vector lands in exactly one occ bucket...
    assert(out.map(_._2).sum == nVecs)
    // ...and total occurrences = k per query vector
    assert(out.map { case (occ, n) => occ * n }.sum == 10 * nVecs)
  }

  test("autoSampleMod picks the smallest power-of-two under the budget") {
    val e = Similarity.embeddings(spark, "/root/testdata/sf0.001") // 500
    assert(Similarity.autoSampleMod(e, 1024L) == 1) // under budget: exact
    assert(Similarity.autoSampleMod(e, 500L) == 1)  // exactly at budget
    assert(Similarity.autoSampleMod(e, 499L) == 2)  // one over: halve
    assert(Similarity.autoSampleMod(e, 100L) == 8)  // 500/4=125>100, /8=62
  }

  test("sampled hubness conserves mass within the id-mod sample") {
    val e = Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val nSample = e.filter(expr("vec_id % 4 = 0")).count()
    val out = Similarity.hubnessHistogram(e, k = 10, sampleMod = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the histogram universe is exactly the sample, and each sampled
    // query still contributes k occurrences — the diagnostic's
    // invariants survive sampling
    assert(out.map(_._2).sum == nSample)
    assert(out.map { case (occ, n) => occ * n }.sum == 10 * nSample)
    // auto path: a budget under the corpus size engages the same mod
    val auto = Similarity.hubnessHistogram(e, k = 10, sampleMod = 0,
      maxExactRows = 125L).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(auto.toSeq == out.toSeq)
  }

  test("marginPairs ranks the exclusive alignment above the hub's pair") {
    // pool A (even labels): a100 aligned exactly with b201; a102/a104
    // form a tight bundle whose best B match is the hub b203 (which is
    // near EVERYTHING in the bundle direction). Raw cosine ranks the
    // hub pairs at 1.0-ish too; the margin criterion divides by each
    // side's neighborhood mean, so the exclusive a100↔b201 alignment
    // (neighbors mostly orthogonal → small denominator) must win.
    val vecs = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f), 0),
      (102L, Array(0.0f, 1.0f, 0.0f), 2),
      (104L, Array(0.0f, 0.995f, 0.1f), 4),
      (201L, Array(0.999f, 0.04f, 0.0f), 1),
      (203L, Array(0.0f, 0.97f, 0.05f), 3),
      (205L, Array(0.05f, 0.96f, 0.08f), 5))
    val e = vecs.toDF("vec_id", "embedding", "label")
    val out = Similarity.marginPairs(e, k = 2, topN = 3).collect()
    assert(out.head.getLong(0) == 100L && out.head.getLong(1) == 201L,
      out.mkString("; "))
    // margin > 1: the pair's cosine beats its neighborhoods' mean
    assert(out.head.getLong(3) > 1000000L, out.mkString("; "))
  }

  test("sampled LOF still flags a retained density outlier first") {
    // the orthogonal outlier carries vec_id 100 ≡ 0 (mod 4), so the
    // id-mod sample keeps it; bundle ids 0..11 sample down to {0,4,8}
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array(1.0f, 0.001f * i), 0)) :+ (100L, Array(0.0f, 1.0f), 0)
    val e = vecs.toDF("vec_id", "embedding", "label")
    val out = Similarity.lofOutliers(e, k = 2, topN = 2, sampleMod = 4)
      .collect()
    assert(out.head.getLong(0) == 100L)
    assert(out.head.getLong(1) > 1000000L) // still sparser than neighbors
  }
}
