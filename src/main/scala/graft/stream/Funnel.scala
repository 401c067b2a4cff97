package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Analytics.stepFunnel]]: a per-user state
  * machine that advances through an ordered step list with the same
  * strict min-after semantics (step i counts only strictly after the
  * user's earliest valid completion of step i−1) and emits a row the
  * moment a user first reaches each step.
  *
  * Out-of-order correctness, from one monotonicity argument: as events
  * arrive (in any order), each step's earliest valid completion time can
  * only DECREASE, so a user's funnel depth can only INCREASE — emitting
  * on depth increase is safe with no retractions. To recompute reach
  * times when an earlier event for a PREVIOUS step arrives late, the
  * state keeps a small sorted candidate list per step, pruned by the
  * same monotonicity: a candidate above the step's current reach time
  * can never become its minimum (the current reach stays eligible
  * forever and is smaller), so only `ts ≤ reach(i)` survive — for step
  * 1 that is exactly one value, and for later steps the list shrinks as
  * the funnel tightens. A hard cap (`maxCandidatesPerStep`, drop-largest)
  * bounds adversarial streams; within the cap the semantics are exact.
  *
  * State at scale: candidate lists are per ACTIVE user and step-count
  * sized, live in the state store (RocksDB at scale), and an event-time
  * timeout reclaims users idle past `idleTimeoutMinutes` — state tracks
  * concurrent funnel progress, not history.
  */
object Funnel {

  final case class FunnelEvent(
      user_id: String, event_type: String, event_ts: Timestamp)

  /** Per-step sorted candidate ts (ms), the highest step already
    * emitted, and the max event ts seen (for the idle timeout).
    */
  final case class FunnelState(
      cands: Seq[Seq[Long]], emittedDepth: Int, lastSeenMs: Long)

  final case class StepReached(
      user_id: String, step_idx: Long, step: String, reach_ts: Timestamp)

  def stepCompletions(
      events: DataFrame,
      steps: Seq[String] = Seq("signup", "view", "purchase"),
      watermark: String = Pipeline.DefaultWatermark,
      maxCandidatesPerStep: Int = 64,
      idleTimeoutMinutes: Long = 7L * 24 * 60): Dataset[StepReached] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxCandidatesPerStep > 0, "candidate cap must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val idleMs = idleTimeoutMinutes * 60000L

    val typed = events
      .withWatermark("timestamp", watermark)
      // non-step types never reach the state store
      .filter(col("event_type").isInCollection(steps))
      .select(col("user_id"), col("event_type"),
        col("timestamp").as("event_ts"))
      .as[FunnelEvent]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepReached](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove(); Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              FunnelState(Seq.fill(steps.size)(Seq.empty), 0, Long.MinValue))
            val cands = prev.cands.map(_.toVector).toArray
            var lastSeen = prev.lastSeenMs
            rows.foreach { e =>
              val i = stepIdx(e.event_type)
              val t = e.event_ts.getTime
              lastSeen = math.max(lastSeen, t)
              if (!cands(i).contains(t)) {
                val inserted = (cands(i) :+ t).sorted
                // cap: drop the LARGEST — smallest candidates are the
                // ones that can still lower a reach time
                cands(i) =
                  if (inserted.size > maxCandidatesPerStep)
                    inserted.take(maxCandidatesPerStep)
                  else inserted
              }
            }
            // recompute reach times front to back (min-after chain)
            val reach = Array.fill(steps.size)(Long.MinValue)
            var prevReach = Long.MinValue
            var depth = 0
            var i = 0
            var blocked = false
            while (i < steps.size && !blocked) {
              cands(i).find(t => prevReach == Long.MinValue || t > prevReach) match {
                case Some(t) => reach(i) = t; prevReach = t; depth = i + 1
                case None => blocked = true
              }
              i += 1
            }
            // monotone prune: above-reach candidates can never win
            (0 until steps.size).foreach { j =>
              if (reach(j) != Long.MinValue)
                cands(j) = cands(j).filter(_ <= reach(j))
            }
            val out = (prev.emittedDepth until depth).map { j =>
              StepReached(userId, j + 1L, steps(j), new Timestamp(reach(j)))
            }
            state.update(FunnelState(cands.toSeq, math.max(prev.emittedDepth, depth), lastSeen))
            state.setTimeoutTimestamp(
              math.max(lastSeen, state.getCurrentWatermarkMs()) + idleMs)
            out.iterator
          }
      }
  }
}
