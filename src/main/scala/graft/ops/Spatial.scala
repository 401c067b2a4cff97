package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial join capability — the ε-neighbor self-join every geo workload
  * needs (store catchments, co-location, GPS dedup), expressed with the
  * same discipline as the interval join: a non-equi distance predicate
  * rewritten as a grid-cell EQUI-join plus a residual check, so the pair
  * space scales with local density, never n². The testdata carries no
  * coordinates, so points derive deterministically from user ids (two
  * independent affine hashes onto a [0, 10⁶]² integer grid) — the
  * OPERATOR is the deliverable, the synthetic geometry just drives it.
  *
  * Exactness: coordinates are integers, ε is an integer, and the
  * predicate is dx² + dy² ≤ ε² in exact BIGINT arithmetic — no floating
  * distance anywhere, so the oracle matches bit-for-bit.
  */
object Spatial {

  private val M = 1000000007L
  private val Range = 1000001L // coords in [0, 1e6]

  /** All unordered user pairs within ε (e6 grid units) of each other.
    *
    * Shape at 100 TB: points collapse to one row per user; each point
    * lands in ONE ε-width grid cell; the candidate join explodes the
    * LEFT side to its 3×3 cell neighborhood (9 rows of 24 bytes — the
    * points table never duplicates its payload) and equi-joins on the
    * cell key, so compared pairs are O(Σ cell·neighborhood density).
    * The `a.uid < b.uid` dedup rides the join condition, the exact
    * circle test is a residual filter, and AQE's skew split covers a
    * hot cell (a city) the same way it covers a hot join key.
    */
  def spatialNeighbors(events: DataFrame, epsE6: Long = 100000L): DataFrame = {
    require(epsE6 > 0, "eps must be positive")
    val pts = events
      .filter(col("user_id").isNotNull)
      .select(col("user_id").as("uid")).distinct()
      .withColumn("x", expr(s"(uid * 1103515245L + 12345L) % ${M}L % ${Range}L"))
      .withColumn("y", expr(s"(uid * 69069L + 1L) % ${M}L % ${Range}L"))
    val cells = pts
      .withColumn("cx", expr(s"x div $epsE6"))
      .withColumn("cy", expr(s"y div $epsE6"))
    val probe = cells
      .withColumn("dcx", explode(expr("array(-1L, 0L, 1L)")))
      .withColumn("dcy", explode(expr("array(-1L, 0L, 1L)")))
      .select(col("uid").as("uid_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("dcx")).as("cx"), (col("cy") + col("dcy")).as("cy"))
    probe.join(cells.select(col("uid").as("uid_b"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy")),
        Seq("cx", "cy"))
      .filter(col("uid_a") < col("uid_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= epsE6 * epsE6)
      .select(col("uid_a"), col("uid_b"), col("dist2"))
      .orderBy(col("uid_a"), col("uid_b"))
  }

  /** DuckDB oracle for [[spatialNeighbors]] — the straightforward
    * all-pairs formulation (the oracle need not be scale-shaped).
    */
  def spatialNeighborsOracleSql(epsE6: Long = 100000L): String =
    s"""WITH p AS (
       |  SELECT DISTINCT user_id AS uid,
       |    (user_id * 1103515245 + 12345) % $M % $Range AS x,
       |    (user_id * 69069 + 1) % $M % $Range AS y
       |  FROM events WHERE user_id IS NOT NULL)
       |SELECT a.uid AS uid_a, b.uid AS uid_b,
       |  ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))::BIGINT
       |    AS dist2
       |FROM p a JOIN p b ON a.uid < b.uid
       |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |  <= ${epsE6 * epsE6}
       |ORDER BY uid_a, uid_b""".stripMargin
}
