package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming weekly retention cohorts — the continuous form of the d31
  * query: each user is cohorted by the epoch week of their first event and
  * every later active week emits one (cohort_week, week_offset) increment.
  * Counting increments per (cohort_week, week_offset) downstream reproduces
  * the batch retention triangle exactly (each (user, week) emits at most
  * once, so the count IS n_users).
  *
  * The hard part is that a cohort is a GLOBAL min over the user's events —
  * a late-arriving earlier event can lower it. The watermark bounds that:
  * a user's cohort is PROVISIONAL until the watermark passes the start of
  * the provisional cohort week (after which any event in an earlier week
  * would be beyond the lateness horizon), and all buffered weeks flush as
  * increments at that moment, driven by an event-time timeout so
  * finalization fires even when the user never speaks again. After
  * finalization new active weeks emit immediately — their offset against
  * the now-fixed cohort is known on arrival.
  *
  * Weeks are INTEGER epoch divisions (floorDiv of epoch-ms), matching the
  * batch query's epoch-µs division exactly: floor(floor(us/1000)/weekMs) =
  * floor(us/(weekMs·1000)) — nested floor division composes, so ms-level
  * state and the µs batch oracle cannot disagree on a bucket boundary.
  *
  * State per user: one finalized cohort plus the distinct weeks already
  * emitted — O(active weeks per user), the same cardinality the batch
  * query's per-user DISTINCT holds, never event-sized. Retention is a
  * lifetime metric, so finalized state is deliberately never evicted; a
  * production deployment wanting eviction can bound the triangle depth and
  * drop users whose last activity is older than the deepest tracked offset.
  */
object StreamingRetention {

  final case class RetentionEvent(userId: Long, ts: Timestamp)

  /** cohort is provisional while finalized=false (pending buffers unflushed
    * weeks); after finalization `emitted` guards exactly-once per week.
    * Public: the state encoder's generated code must reach the constructor. */
  final case class CohortState(
      finalized: Boolean, cohort: Long, pending: Seq[Long], emitted: Seq[Long])

  /** One row per (user, active week), emitted exactly once. */
  final case class RetentionIncrement(userId: Long, cohortWeek: Long, weekOffset: Long)

  /** Retention increments over a stream of typed events. Input must already
    * carry a watermark on `ts`; an event in a week EARLIER than a finalized
    * cohort (possible only past the lateness horizon) is dropped, matching
    * the watermark contract everywhere else in the engine. */
  def increments(
      events: Dataset[RetentionEvent],
      weekMs: Long = 604800000L): Dataset[RetentionIncrement] = {
    require(weekMs > 0, "week length must be positive")
    val spark = events.sparkSession
    import spark.implicits._

    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[CohortState, RetentionIncrement](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val old = state.getOption
            .getOrElse(CohortState(finalized = false, Long.MaxValue, Nil, Nil))
          val newWeeks =
            rows.map(e => Math.floorDiv(e.ts.getTime, weekMs)).toSeq.distinct
          if (!old.finalized) {
            val pending = (old.pending ++ newWeeks).distinct
            if (pending.isEmpty) { // first invocation was a bare timeout
              state.remove()
              Iterator.empty
            } else {
              val cohort = pending.min
              val cohortStartMs = cohort * weekMs
              if (wm >= cohortStartMs) {
                // nothing below the cohort week can still arrive: freeze the
                // cohort and flush every buffered week as an increment
                state.update(CohortState(finalized = true, cohort, Nil, pending))
                pending.sorted.iterator
                  .map(w => RetentionIncrement(userId, cohort, w - cohort))
              } else {
                state.update(CohortState(finalized = false, cohort, pending, Nil))
                // fire when the watermark passes the provisional cohort-week
                // start (must be strictly above the current watermark)
                state.setTimeoutTimestamp(math.max(cohortStartMs, wm + 1))
                Iterator.empty
              }
            }
          } else {
            val fresh = newWeeks
              .filter(w => w >= old.cohort && !old.emitted.contains(w))
            if (fresh.nonEmpty)
              state.update(old.copy(emitted = old.emitted ++ fresh))
            fresh.sorted.iterator
              .map(w => RetentionIncrement(userId, old.cohort, w - old.cohort))
          }
      }
  }
}
