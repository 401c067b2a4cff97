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
}
