package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-key entity resolution: collapse user records that share any
  * identity key (device, contact hash, …) into canonical entities — the
  * identity-stitching pass every event warehouse runs before user-level
  * metrics, and the one the reference's per-`user_id` dashboards
  * implicitly assume has already happened. The keys here are
  * deterministic synthetic stand-ins derived from `user_id` (the events
  * table carries no second identifier); the OPERATOR is generic over any
  * (record, key) pairs.
  */
object Identity {

  /** Entities = connected components of the record–key bipartite graph.
    *
    * Scale shape, in order:
    *  1. KEY → STAR EDGES, never cliques: a key shared by m records
    *     yields m−1 edges to the key's MIN record (one groupBy + one
    *     self-join on the key), not m² pairwise edges — the difference
    *     between linear and quadratic in the hottest key. Components of
    *     the star graph equal components of the clique graph.
    *  2. MIN-LABEL PROPAGATION WITH POINTER JUMPING to a fixed point:
    *     every record starts SEEDED at the min star head across its
    *     keys (the state one relax round would reach, free with the
    *     head groupBy); each round takes the min label over the
    *     record's (symmetrized) neighborhood and itself, THEN
    *     compresses paths by following the label two hops
    *     (label := label(label(label))). The compression is what makes
    *     this deployable: plain neighbor-min needs component-DIAMETER
    *     rounds (identity graphs routinely chain hundreds of hops — the
    *     synthetic keys below already build 40-hop chains), while
    *     double jumping compounds propagated distance ~4× per round →
    *     ~log₄(diameter) rounds, each one edge-frame shuffle plus two
    *     label-frame self-joins (the self-joins are cheap next to the
    *     edge relax and the per-round convergence-count job). The loop checks an exact changed-count
    *     per round (a count on a record-sized frame) and stops at zero,
    *     with localCheckpoint bounding lineage (the [[Graph.pageRank]] /
    *     Bellman-Ford discipline); maxRounds is a documented safety
    *     bound, and overrunning it raises rather than silently emitting
    *     a half-merged identity table.
    *  3. The report collapses to one row per entity: canonical id (the
    *     min member), member count, distinct-key count.
    */
  def resolveEntities(recordKeys: DataFrame, maxRounds: Int = 20): DataFrame = {
    val keyed = recordKeys.select(col("record_id"), col("key")).persist()
    val labels = resolveEntityLabels(keyed, maxRounds)
    val members = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("n_records"))
    val keys = keyed.join(labels, "record_id")
      .groupBy(col("label"))
      .agg(countDistinct(col("key")).as("n_keys"))
    members.join(keys, "label")
      .select(col("label").as("entity_id"), col("n_records"), col("n_keys"))
      .orderBy(col("entity_id"))
  }

  /** The (record_id, label) frame [[resolveEntities]] summarizes —
    * exposed so survivorship ([[goldenRecords]]) can consume the same
    * converged labels. Input may be pre-persisted; the loop derives its
    * edge frame from it either way.
    */
  def resolveEntityLabels(
      recordKeys: DataFrame, maxRounds: Int = 20): DataFrame = {
    val keyed = recordKeys.select(col("record_id"), col("key"))
    val starHeads = keyed.groupBy(col("key"))
      .agg(min(col("record_id")).as("head_id"))
    val starEdges = keyed
      .join(starHeads, "key")
      .filter(col("record_id") =!= col("head_id"))
      .select(col("record_id").as("a"), col("head_id").as("b"))
      .distinct()
    // persisted PRE-PARTITIONED on the per-round join key b (guide
    // §2.4): the symmetrized union has no partitioning, so every relax
    // round re-exchanged the edge frame; hash(b) in the cache leaves
    // only the record-sized label frame shuffling per round
    val edges = starEdges
      .union(starEdges.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b"))
      .persist()
    // SEED from the star contraction (round-10 verdict item 4): instead
    // of the identity labeling, every record starts at the min star
    // head across its keys — the state one full relax round would
    // reach, for the price of the groupBy that built the heads anyway.
    // Seed labels are record ids within the record's own component and
    // ≤ its id, so the fixed point (component min) is unchanged.
    // (A pre-loop pointer jump on the seed was measured and REJECTED:
    // two extra label-frame self-joins cost more than the round they
    // occasionally save — the in-loop double jump already compresses
    // from the seeded state at ~4x per round.)
    var labels = keyed
      .join(starHeads, "key")
      .groupBy(col("record_id"))
      .agg(min(col("head_id")).as("min_head"))
      .select(col("record_id"),
        least(col("record_id"), col("min_head")).as("label"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val neighborMin = edges
        .join(labels, edges("b") === labels("record_id"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      val relaxed = labels
        .join(neighborMin, labels("record_id") === neighborMin("a"), "left")
        .select(col("record_id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
      // pointer jumping, TWICE per round: label := label(label(label)).
      // Every label value is itself a record id (mins of record ids),
      // so each self-join is total and the lookup never drops a row. A
      // single jump grows propagated distance d → 2d+1 per round; the
      // second jump (one more record-frame self-join, cheap next to the
      // edge-frame relax) compounds it to ~4d+3, so a diameter-D chain
      // closes in ~log₄ D relax rounds instead of ~log₂ D — and each
      // relax round carries a shuffle over the EDGE frame plus a
      // convergence-count job, which is where the wall-clock lives.
      // The OLD label rides along into the checkpoint so the
      // convergence check below is a partition-local count on
      // materialized data, not a second shuffle join.
      val jumped = relaxed
        .join(relaxed.select(col("record_id").as("lid"),
          col("label").as("llabel")), col("label") === col("lid"))
        .select(col("record_id"), col("old_label"),
          col("llabel").as("label"))
      val next = jumped
        .join(jumped.select(col("record_id").as("lid2"),
          col("label").as("llabel2")), col("label") === col("lid2"))
        .select(col("record_id"), col("llabel2").as("label"),
          (col("llabel2") =!= col("old_label")).as("changed"))
        .localCheckpoint()
      changed = next.filter(col("changed")).count()
      labels = next.select(col("record_id"), col("label"))
      round += 1
    }
    require(changed == 0,
      s"entity resolution did not converge within $maxRounds rounds")
    labels
  }

  /** The synthetic (record, key) pairs for the events table: each user
    * carries a "device" key (user_id mod 97) and a "contact" key
    * (7·user_id + 3 mod 101) — moduli chosen coprime so collisions
    * cross-link users into small multi-record entities.
    */
  def eventUserKeys(events: DataFrame): DataFrame = {
    val users = events.filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct()
    users.select(col("user_id").as("record_id"),
      concat(lit("d"), col("user_id") % 97).as("key"))
      .union(users.select(col("user_id").as("record_id"),
        concat(lit("e"), (col("user_id") * 7 + 3) % 101).as("key")))
  }

  /** End-to-end query: resolve event users into entities. */
  def entityResolution(events: DataFrame): DataFrame =
    resolveEntities(eventUserKeys(events))

  /** GOLDEN-RECORD SURVIVORSHIP — the step after [[entityResolution]]
    * every MDM pipeline runs: merge each entity's member records into
    * ONE canonical row under explicit survivorship rules. Rules here
    * are the standard trio: additive facts SUM (event count, value
    * cents), temporal facts take extremes (first seen = min day), and
    * contested single-value attributes go MOST-RECENT-WINS — the
    * member with the latest activity donates its last event type, ties
    * broken by event id, which is unique, so the winner is total-order
    * deterministic. Recency rides a zero-padded (ts, event_id) string
    * pack so one max() both picks the winner and carries its attribute
    * — the same packed-argmax trick as [[Graph.triangleCount]]'s rank
    * pack, in string space because the carried value is a string.
    *
    * Shape at 100 TB: one fact collapse to per-record attribute rows,
    * the label attach (entity labels are record-dimension), and one
    * entity-dimension aggregate. The resolution loop is
    * [[resolveEntityLabels]] unchanged.
    */
  def goldenRecords(events: DataFrame, maxRounds: Int = 20): DataFrame = {
    val keyed = eventUserKeys(events)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = resolveEntityLabels(keyed, maxRounds)
    val perUser = events.filter(col("user_id").isNotNull)
      .select(col("user_id").as("record_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("tsu"),
        to_date(col("ts")).as("d"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .groupBy(col("record_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("value_cents"),
        min(col("d")).as("first_seen"),
        max(concat(lpad(col("tsu").cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 20, "0"), lit(":"),
          col("event_type"))).as("recency_key"))
    perUser.join(labels, "record_id")
      .groupBy(col("label").as("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_events")).as("n_events"),
        sum(col("value_cents")).as("value_cents"),
        min(col("first_seen")).as("first_seen"),
        substring(max(col("recency_key")), 42, 1000).as("last_type"))
      .orderBy(col("entity_id"))
  }

  /** DuckDB oracle for [[goldenRecords]] — the [[entityResolutionOracleSql]]
    * closure plus the identical packed-recency survivorship.
    */
  def goldenRecordsOracleSql: String =
    """WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
      |rk AS (
      |  SELECT user_id AS record_id, 'd' || (user_id % 97) AS key FROM u
      |  UNION ALL
      |  SELECT user_id AS record_id, 'e' || ((user_id * 7 + 3) % 101) AS key FROM u),
      |heads AS (SELECT key, min(record_id) AS head_id FROM rk GROUP BY key),
      |star AS (
      |  SELECT DISTINCT rk.record_id AS a, heads.head_id AS b
      |  FROM rk JOIN heads USING (key) WHERE rk.record_id <> heads.head_id),
      |edges AS (SELECT a, b FROM star UNION SELECT b, a FROM star),
      |reach AS (
      |  SELECT record_id AS src, record_id AS dst FROM (SELECT DISTINCT record_id FROM rk)
      |  UNION
      |  SELECT r.src, e.b AS dst FROM reach r JOIN edges e ON r.dst = e.a),
      |lab AS (SELECT src AS record_id, min(dst) AS label FROM reach GROUP BY src),
      |per_user AS (
      |  SELECT user_id AS record_id, count(*)::BIGINT AS n_events,
      |    sum((value::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS value_cents,
      |    min(ts::DATE) AS first_seen,
      |    max(lpad(epoch_us(ts)::VARCHAR, 20, '0')
      |        || lpad(event_id::VARCHAR, 20, '0') || ':' || event_type)
      |      AS recency_key
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
      |SELECT lab.label AS entity_id, count(*)::BIGINT AS n_members,
      |  sum(n_events)::BIGINT AS n_events,
      |  sum(value_cents)::BIGINT AS value_cents,
      |  min(first_seen) AS first_seen,
      |  substr(max(recency_key), 42) AS last_type
      |FROM per_user JOIN lab USING (record_id)
      |GROUP BY lab.label ORDER BY entity_id""".stripMargin

  /** DuckDB oracle for [[entityResolution]] — identical synthetic keys
    * and star edges, components via a recursive-CTE transitive closure
    * (min reachable record = the same canonical label the min-label
    * fixed point converges to). Closure size is Σ component² — fine at
    * oracle scale, which is exactly why the Spark side iterates instead.
    */
  def entityResolutionOracleSql: String =
    """WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
      |rk AS (
      |  SELECT user_id AS record_id, 'd' || (user_id % 97) AS key FROM u
      |  UNION ALL
      |  SELECT user_id AS record_id, 'e' || ((user_id * 7 + 3) % 101) AS key FROM u),
      |heads AS (SELECT key, min(record_id) AS head_id FROM rk GROUP BY key),
      |star AS (
      |  SELECT DISTINCT rk.record_id AS a, heads.head_id AS b
      |  FROM rk JOIN heads USING (key) WHERE rk.record_id <> heads.head_id),
      |edges AS (SELECT a, b FROM star UNION SELECT b, a FROM star),
      |reach AS (
      |  SELECT record_id AS src, record_id AS dst FROM (SELECT DISTINCT record_id FROM rk)
      |  UNION
      |  SELECT r.src, e.b AS dst FROM reach r JOIN edges e ON r.dst = e.a),
      |lab AS (SELECT src AS record_id, min(dst) AS label FROM reach GROUP BY src),
      |mem AS (SELECT label, count(*) AS n_records FROM lab GROUP BY label),
      |ks AS (
      |  SELECT lab.label, count(DISTINCT rk.key) AS n_keys
      |  FROM rk JOIN lab USING (record_id) GROUP BY lab.label)
      |SELECT mem.label AS entity_id, n_records::BIGINT AS n_records,
      |  n_keys::BIGINT AS n_keys
      |FROM mem JOIN ks USING (label) ORDER BY entity_id""".stripMargin
}
