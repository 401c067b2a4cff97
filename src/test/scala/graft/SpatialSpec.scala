package graft

import org.apache.spark.sql.functions._

class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsFor(uids: Seq[Long]) =
    uids.zipWithIndex.map { case (u, i) =>
      (i.toLong, u, "a", new java.sql.Timestamp(i * 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")

  test("spatialNeighbors: grid-bucketed join equals the brute-force circle, pairs exactly once") {
    val uids = (1L to 200L)
    val eps = 100000L // wide radius so the synthetic points yield pairs
    val out = graft.ops.Spatial.spatialNeighbors(eventsFor(uids), eps)
      .collect()
      .map(r => (r.getAs[Long]("uid_a"), r.getAs[Long]("uid_b"),
        r.getAs[Long]("dist2"))).toSeq
    // brute force over the same derived coordinates
    val m = 1000000007L
    def pt(u: Long) =
      ((u * 1103515245L + 12345L) % m % 1000001L,
        (u * 69069L + 1L) % m % 1000001L)
    val expected = (for {
      a <- uids; b <- uids if a < b
      (xa, ya) = pt(a); (xb, yb) = pt(b)
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= eps * eps
    } yield (a, b, d2)).sortBy(p => (p._1, p._2))
    assert(expected.nonEmpty, "test radius must produce pairs")
    assert(out == expected)
    // exactly-once: no pair may surface from two neighbor cells
    assert(out.map(p => (p._1, p._2)).distinct.length == out.length)
  }

  test("spatialNeighbors: plan is a cell equi-join, never a nested-loop distance join") {
    val p = graft.ops.Spatial.spatialNeighbors(eventsFor(1L to 50L))
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(cx") || p.contains("BroadcastHashJoin"),
      s"candidate join must be cell-keyed:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no all-pairs join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("spatialNeighbors: empty input yields an empty frame") {
    val none = Seq.empty[(Long, Long, String, java.sql.Timestamp)]
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(graft.ops.Spatial.spatialNeighbors(none).count() == 0)
  }

  test("dbscan: roles and labels equal a brute-force union-find reference") {
    val uids = (1L to 200L)
    val eps = 60000L
    val minPts = 4
    val m = 1000000007L
    def pt(u: Long) =
      ((u * 1103515245L + 12345L) % m % 1000001L,
        (u * 69069L + 1L) % m % 1000001L)
    val nbrs = uids.map { a =>
      a -> uids.filter { b =>
        val (xa, ya) = pt(a); val (xb, yb) = pt(b)
        b != a &&
          (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= eps * eps
      }.toSet
    }.toMap
    val core = uids.filter(u => nbrs(u).size + 1 >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
    def find(u: Long): Long =
      if (parent(u) == u) u else { val r = find(parent(u)); parent(u) = r; r }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> core.filter(d => find(d) == find(c)).min).toMap
    val expected = uids.map { u =>
      if (core(u)) (u, "core", label(u))
      else {
        val coreNb = nbrs(u).filter(core)
        if (coreNb.nonEmpty) (u, "border", coreNb.map(label).min)
        else (u, "noise", -1L)
      }
    }
    val out = graft.ops.Spatial.dbscan(eventsFor(uids), eps, minPts).collect()
      .map(r => (r.getAs[Long]("uid"), r.getAs[String]("role"),
        r.getAs[Long]("cluster_id"))).toSeq
    assert(expected.count(_._2 == "core") > 0 &&
      expected.count(_._2 == "border") > 0 &&
      expected.count(_._2 == "noise") > 0,
      "test geometry must exercise all three roles")
    assert(out == expected)
  }
}
