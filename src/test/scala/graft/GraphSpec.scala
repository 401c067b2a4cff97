package graft

import java.sql.Timestamp
import graft.ops.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(user: Long, tpe: String) =
    (1L, new Timestamp(0L), user, tpe, 0.0, "{}")

  test("pageRank: hand-computed fixed-point iteration on a 3-node graph") {
    // events: user 1 ×2 type a, user 2 ×1 type a
    // nodes u:1, u:2, t:a (N=3, init = 1e9 div 3 = 333333333)
    // out_w: u:1→2, u:2→1, t:a→3; base = (15·333333333) div 100 = 49999999
    // contribs: t:a ← 333333333·2 div 2 + 333333333·1 div 1 = 666666666
    //           u:1 ← 333333333·2 div 3 = 222222222
    //           u:2 ← 333333333·1 div 3 = 111111111
    // rank₁:   t:a = 49999999 + (85·666666666) div 100 = 616666665
    //           u:1 = 49999999 + (85·222222222) div 100 = 238888887
    //           u:2 = 49999999 + (85·111111111) div 100 = 144444443
    val events = Seq(ev(1L, "a"), ev(1L, "a"), ev(2L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r1 = Graph.pageRank(events, iters = 1).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank")).toMap
    assert(r1 == Map(
      "t:a" -> 616666665L, "u:1" -> 238888887L, "u:2" -> 144444443L))
  }

  test("pageRank: mass is conserved up to floor loss and runs are identical") {
    val events = Seq(
      ev(1L, "a"), ev(1L, "b"), ev(2L, "a"), ev(3L, "b"),
      ev(3L, "b"), ev(3L, "c"), ev(4L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Graph.pageRank(events, iters = 10).collect()
    val total = out.map(_.getAs[Long]("rank")).sum
    // every floor division only LOSES rank units; 10 iterations over a
    // 7-node graph cannot lose more than a few hundred of the 1e9 scale
    assert(total <= Graph.RankScale && total > Graft.RankScaleLow)
    val again = Graph.pageRank(events, iters = 10).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("triangleCount: hand-built triangle-plus-pendant graph census") {
    import spark.implicits._
    // each edge backed by TWO orders (minSupport=2): triangle 1-2-3 plus
    // pendant edge 1-4 → degrees 1:3, 2:2, 3:2, 4:1; wedges 3+1+1+0=5;
    // one triangle; clustering 3·1·10⁴ div 5 = 6000
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 2L), (5L, 3L), (6L, 2L), (6L, 3L),
      (7L, 1L), (7L, 4L), (8L, 1L), (8L, 4L),
      // a once-only pair must be cut by the support threshold
      (9L, 2L), (9L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val r = graft.ops.Graph.triangleCount(li, minSupport = 2).head()
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("clustering_e4") == 6000L)
  }

  test("localClustering: the triangle's corners score 1, the hub bridging it to a pendant scores below") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant edge 1-4 (each edge backed by 2 orders)
    // degrees: 1->3, 2->2, 3->2, 4->1; triangles per node: 1,1,1,0
    // lcc: node 1 = 2*1e6/(3*2) = 333333; nodes 2,3 = 2*1e6/2 = 1000000
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 2L), (5L, 3L), (6L, 2L), (6L, 3L),
      (7L, 1L), (7L, 4L), (8L, 1L), (8L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Graph.localClustering(li, minDegree = 2)
      .collect().map(r => (r.getAs[Long]("part_id"),
        r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
        r.getAs[Long]("lcc_e6")))
    assert(out.toSeq == Seq(
      (2L, 2L, 1L, 1000000L), (3L, 2L, 1L, 1000000L),
      (1L, 3L, 1L, 333333L)))
  }

  test("connectedComponents: two components and a long path converge to min-id labels") {
    import spark.implicits._
    // component A: path 1-2-3-4 (pointer jumping must cross 3 hops);
    // component B: pair 10-11; every edge backed by two orders
    val li = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .zipWithIndex.flatMap { case ((u, v), i) =>
        Seq((100L + 2 * i, u), (100L + 2 * i, v),
          (200L + 2 * i, u), (200L + 2 * i, v))
      }).toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Graph.connectedComponents(li, minSupport = 2)
      .collect().map(r => (r.getAs[Long]("component_id"),
        r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))
    assert(out.toSeq == Seq((1L, 4L, 3L), (10L, 2L, 1L)))
  }

  test("connectedComponents: a single clique is one component; empty graph is empty") {
    import spark.implicits._
    val li = (for (o <- 1L to 2L; p <- 1L to 3L) yield (o, p))
      .toDF("l_orderkey", "l_partkey")
    val one = graft.ops.Graph.connectedComponents(li, minSupport = 2).collect()
    assert(one.length == 1 &&
      one.head.getAs[Long]("component_id") == 1L &&
      one.head.getAs[Long]("n_nodes") == 3L &&
      one.head.getAs[Long]("n_edges") == 3L)
    val noLi = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    assert(graft.ops.Graph.connectedComponents(noLi).count() == 0)
  }

  test("shortestPaths: a cheap 2-hop chain beats the direct heavy edge; hops ride the tie-break") {
    // undirected rarity graph (w = 1e6 div support):
    //   1–2 s=10 (w 100k), 2–3 s=10 (w 100k), 1–3 s=2 (w 500k),
    //   3–4 s=2 (w 500k), 1–5 s=2 (w 500k), 1–6 s=2 (w 500k)
    // deg(1)=4 → source; dist(3) must take the 200k 2-hop chain, not
    // the 500k direct edge; dist(4) rides it to 700k in 3 hops
    def orders(base: Long, n: Int, pa: Long, pb: Long) =
      (0 until n).flatMap(i => Seq((base + i, pa), (base + i, pb)))
    val li = (
      orders(100, 10, 1L, 2L) ++ orders(200, 10, 2L, 3L) ++
      orders(300, 2, 1L, 3L) ++ orders(400, 2, 3L, 4L) ++
      orders(500, 2, 1L, 5L) ++ orders(600, 2, 1L, 6L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Graph.shortestPaths(li).collect()
      .map(r => r.getAs[Long]("part_id") ->
        (r.getAs[Long]("dist"), r.getAs[Long]("hops"))).toMap
    assert(out == Map(
      1L -> (0L, 0L), 2L -> (100000L, 1L), 3L -> (200000L, 2L),
      5L -> (500000L, 1L), 6L -> (500000L, 1L), 4L -> (700000L, 3L)))
  }

  test("assortativity: a star graph is perfectly disassortative (−1)") {
    import spark.implicits._
    // center part 1 with leaves 2,3,4 (each edge in two orders for the
    // support cut): every edge joins degree 3 to degree 1 → r = −1
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 1L), (5L, 4L), (6L, 1L), (6L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val r = graft.ops.Graph.assortativity(li, minSupport = 2).head()
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("assortativity_e4") == -10000L)
  }

  test("degreeDistribution: binary-width bins split the star's hub from its leaves") {
    import spark.implicits._
    val li = Seq( // same star: center 1 (degree 3), leaves 2,3,4 (degree 1)
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 1L), (5L, 4L), (6L, 1L), (6L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Graph.degreeDistribution(li, minSupport = 2).collect()
      .map(r => (r.getAs[Long]("bin_width"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("min_degree"), r.getAs[Long]("max_degree"),
        r.getAs[Long]("share_e4")))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 1L, 7500L), // degree 1 → binary "1", width 1
      (2L, 1L, 3L, 3L, 2500L))) // degree 3 → binary "11", width 2
  }

  test("kCore keeps the triangle and peels the pendant") {
    import spark.implicits._
    // orders 1,2 each hold parts 1,2,3 (triangle, support 2); orders
    // 3,4 hold parts {1,4} (pendant edge 1–4, support 2)
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 4L), (4L, 1L), (4L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Graph.kCore(li, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore peeling cascades down a path to the empty core") {
    import spark.implicits._
    // path 1–2–3–4 (each adjacent pair co-ordered twice): the 2-core is
    // empty, but only after peeling unravels the path from both ends —
    // endpoint removal keeps creating new degree-1 nodes
    val li = (for {
      (a, b) <- Seq((1L, 2L), (2L, 3L), (3L, 4L)); rep <- 0 to 1
    } yield Seq((a * 100 + b * 10 + rep, a), (a * 100 + b * 10 + rep, b)))
      .flatten.toDF("l_orderkey", "l_partkey")
    assert(graft.ops.Graph.kCore(li, k = 2).count() == 0)
  }

  test("kTruss keeps the interlocked clique, sheds the pendant triangle") {
    import spark.implicits._
    // K4 on 1-4 (every edge in 2 triangles) plus a triangle (1,5,6)
    // hanging off node 1 (its edges sit in exactly 1 triangle)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (1L, 6L), (5L, 6L)).toDF("u", "v")
    val t4 = graft.ops.Graph.kTrussFromPairs(pairs, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t4.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
    // at k = 3 every triangle edge survives, supports intact
    val t3 = graft.ops.Graph.kTrussFromPairs(pairs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(t3 == Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L),
      (1L, 5L, 1L), (1L, 6L, 1L), (5L, 6L, 1L)))
  }

  test("kTruss deletion cascades: two chained triangles unravel completely") {
    import spark.implicits._
    // triangles (1,2,3) and (2,3,4) share edge (2,3): at k=4 the four
    // support-1 edges die first, which orphans (2,3) — a second peel
    // round must remove it too (single-pass support filtering would not)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    assert(graft.ops.Graph.kTrussFromPairs(pairs, k = 4).count() == 0)
  }

  test("textRank: one hand-computed iteration over a hub-and-spokes adjacency graph") {
    import spark.implicits._
    // "hub aaa hub bbb hub ccc": adjacency pairs (aaa,hub) w2, (bbb,hub)
    // w2, (ccc,hub) w1. N=4, init = 250000000; out_w: aaa 2, bbb 2,
    // ccc 1, hub 5; base = (15·250000000) div 100 = 37500000
    // contribs: hub ← 250M + 250M + 250M = 750M; aaa,bbb ← 250M·2 div 5
    // = 100M; ccc ← 50M
    val docs = Seq((1L, "hub aaa hub bbb hub ccc")).toDF("doc_id", "text")
    val r1 = Graph.textRank(docs, iters = 1, k = 10).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("rank")).toMap
    assert(r1 == Map(
      "hub" -> 675000000L, "aaa" -> 122500000L, "bbb" -> 122500000L,
      "ccc" -> 80000000L))
  }

  test("textRank: short tokens are dropped and k caps the toplist") {
    import spark.implicits._
    val docs = Seq(
      (1L, "go to the market and buy the fresh bread"),
      (2L, "go to the market and buy the fresh milk")).toDF("doc_id", "text")
    val out = Graph.textRank(docs, iters = 3, k = 3).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[String]("word").length >= 3))
    // deterministic across runs (integer arithmetic, total ordering)
    val again = Graph.textRank(docs, iters = 3, k = 3).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("labelPropagation: two triangles over a weak bridge settle into two communities") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, intra-clique support 4, bridge
    // 3–4 support 2: sync argmax (weight desc, label asc) converges by
    // round 3 to labels 1 and 4; the bridge never flips a clique
    def orders(base: Long, n: Int, pa: Long, pb: Long) =
      (0 until n).flatMap(i => Seq((base + i, pa), (base + i, pb)))
    val li = (
      orders(100, 4, 1L, 2L) ++ orders(200, 4, 1L, 3L) ++
      orders(300, 4, 2L, 3L) ++ orders(400, 4, 4L, 5L) ++
      orders(500, 4, 4L, 6L) ++ orders(600, 4, 5L, 6L) ++
      orders(700, 2, 3L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Graph.labelPropagation(li, rounds = 8).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("n_members"),
        r.getAs[Long]("min_member")))
    assert(out.toSeq == Seq((1L, 3L, 1L), (4L, 3L, 4L)))
  }

  test("modularity: the two-clique bridge graph scores the exact closed form") {
    import spark.implicits._
    // same fixture as the LPA test: 2m = 52, in_c = 24 per clique,
    // deg_c = 26 per clique → Q = 2·(52·24 − 26²)/52² = 1144/2704
    def orders(base: Long, n: Int, pa: Long, pb: Long) =
      (0 until n).flatMap(i => Seq((base + i, pa), (base + i, pb)))
    val li = (
      orders(100, 4, 1L, 2L) ++ orders(200, 4, 1L, 3L) ++
      orders(300, 4, 2L, 3L) ++ orders(400, 4, 4L, 5L) ++
      orders(500, 4, 4L, 6L) ++ orders(600, 4, 5L, 6L) ++
      orders(700, 2, 3L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Graph.modularity(li, rounds = 8).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Long]("m2") == 52L)
    assert(r.getAs[Long]("q_e6") == 1144L * 1000000L / 2704L)
  }
}

private object Graft {
  // generous lower bound: fixed-point floors shed < 0.1% of the mass
  val RankScaleLow: Long = (Graph.RankScale * 0.999).toLong
}
