package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over corpus-derived graphs. Near-dup
  * clustering ([[Dedup.nearDupClusters]]) already covers connected
  * components; this adds weighted PageRank — the standard importance
  * measure a curation pipeline uses to weight interlinked sources (and
  * the canonical bounded-iteration distributed workload).
  */
object Graph {

  /** Fixed-point scale for ranks: 1e9 keeps every intermediate product
    * (rank × edge weight ≤ 1e9 × |E|) far from Long overflow under
    * ANSI arithmetic while leaving ~16k rank units per node even at a
    * 60k-node sf0.1 graph.
    */
  val RankScale = 1000000000L

  /** Weighted PageRank (damping 0.85, fixed `iters` power iterations)
    * over the user↔event_type bipartite interaction graph: nodes are
    * `u:<user_id>` and `t:<event_type>`, one undirected edge per
    * distinct (user, type) pair weighted by its event count, walk
    * transition proportional to edge weight.
    *
    * All arithmetic is FIXED-POINT Long (ranks scaled by [[RankScale]],
    * floor division at every step): integer addition is exactly
    * commutative, so partial-aggregation order — the thing that makes
    * float PageRank diverge between engines after 10 iterations —
    * cannot touch the result, and the oracle pairing is exact. The
    * recurrence both engines evaluate:
    *   rank₀(v)   = SCALE div N
    *   rankₜ(v)   = (15·(SCALE div N)) div 100
    *              + (85·Σ_{(s,v)∈E} (rankₜ₋₁(s)·w(s,v) div outw(s))) div 100
    *
    * Shape at 100 TB: the corpus-scale work is the ONE distinct-pair
    * aggregate; the graph itself is interaction-sized. The edge table
    * (with out-degree folded in) is persisted partitioned on src — the
    * per-iteration rank join reuses that exchange, so each iteration
    * shuffles only the node-sized rank frame plus the edge-sized
    * contribution aggregate (partial map-side combine on dst). Rank
    * frames are eagerly localCheckpoint'ed per iteration: lineage stays
    * bounded and nothing re-executes the corpus scan. No driver-side
    * data at all — the node count rides a 1-row broadcast.
    */
  def pageRank(events: DataFrame, iters: Int = 10): DataFrame = {
    require(iters > 0, "iters must be positive")
    val pairs = events
      .select(concat(lit("u:"), col("user_id").cast("string")).as("u"),
        concat(lit("t:"), col("event_type")).as("t"))
      .groupBy(col("u"), col("t")).agg(count(lit(1)).as("w"))
    val edges = pairs.select(col("u").as("src"), col("t").as("dst"), col("w"))
      .unionAll(pairs.select(col("t").as("src"), col("u").as("dst"), col("w")))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val e = edges.join(outw, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val cnt = nodes.agg(count(lit(1)).as("n"))
    var rank = nodes.crossJoin(broadcast(cnt))
      .select(col("node"), expr(s"$RankScale div n").as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contribs = e.join(rank, e("src") === rank("node"))
        .select(col("dst"), expr("rank * w div out_w").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("in_rank"))
      rank = nodes.crossJoin(broadcast(cnt))
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (expr(s"(15 * ($RankScale div n)) div 100")
            + expr("(85 * coalesce(in_rank, 0L)) div 100")).as("rank"))
        .localCheckpoint(true)
    }
    e.unpersist()
    rank.orderBy(col("node"))
  }

  /** Chained-CTE ANSI twin of [[pageRank]] for the DuckDB oracle — one
    * MATERIALIZED CTE per iteration replaying the identical fixed-point
    * recurrence (`//` is DuckDB's integer floor division, the twin of
    * Spark's `div` on nonnegative Longs).
    */
  def pageRankOracleSql(iters: Int = 10): String = {
    val S = RankScale
    val head =
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT 'u:' || user_id::VARCHAR AS u, 't:' || event_type AS t,
         |    count(*)::BIGINT AS w
         |  FROM events GROUP BY 1, 2),
         |edges AS MATERIALIZED (
         |  SELECT u AS src, t AS dst, w FROM pairs
         |  UNION ALL SELECT t, u, w FROM pairs),
         |e AS MATERIALIZED (
         |  SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS out_w
         |  FROM edges),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
         |cnt AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
         |r0 AS MATERIALIZED (
         |  SELECT node, ($S // n)::BIGINT AS rank
         |  FROM nodes CROSS JOIN cnt)""".stripMargin
    val iterCtes = (1 to iters).map { t =>
      s"""c$t AS MATERIALIZED (
         |  SELECT e.dst, sum((r.rank * e.w) // e.out_w)::BIGINT AS in_rank
         |  FROM e JOIN r${t - 1} r ON e.src = r.node GROUP BY 1),
         |r$t AS MATERIALIZED (
         |  SELECT n.node,
         |    ((15 * ($S // c.n)) // 100
         |     + (85 * coalesce(ci.in_rank, 0)) // 100)::BIGINT AS rank
         |  FROM nodes n CROSS JOIN cnt c
         |  LEFT JOIN c$t ci ON n.node = ci.dst)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$iterCtes
       |SELECT node, rank FROM r$iters ORDER BY node""".stripMargin
  }
}
