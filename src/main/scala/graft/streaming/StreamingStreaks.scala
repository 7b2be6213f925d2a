package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming consecutive-day activity streaks — the continuous form of the
  * d37 gaps-and-islands query: per user, the running longest streak, streak
  * count, and active-day count over the user's distinct active days.
  *
  * The hard part is that a day can MERGE two existing runs (arrive in the
  * gap), so naive per-run state is wrong and full day-set state is
  * unbounded. State here is a compacted interval list plus three frozen
  * accumulators: once the watermark guarantees no day below `wmDay` can
  * arrive, every interval ending before `wmDay − 1` can never merge with a
  * future day (a future day d ≥ wmDay attaches only to an interval ending
  * ≥ d−1) — those intervals collapse into (n_runs, longest, n_days)
  * scalars. Live state is therefore O(runs near the lateness frontier),
  * typically one interval, NEVER the user's activity history — the same
  * bounded-state economics as the rest of the streaming pack.
  *
  * Contract: days entirely below the watermark are dropped (the engine's
  * uniform late-data rule); the parity spec delivers out-of-order but
  * within-watermark batches and matches the batch d37 pipeline exactly
  * after every micro-batch.
  */
object StreamingStreaks {

  final case class DayEvent(userId: Long, ts: Timestamp)

  /** Compacted per-user state. `live` holds disjoint, sorted, non-adjacent
    * [start, end] day intervals still within merge reach of future data.
    * Public: the state encoder's generated code must reach the constructor. */
  final case class StreakState(
      frozenRuns: Long, frozenLongest: Long, frozenDays: Long,
      live: Seq[(Long, Long)], version: Long)

  /** `updateSeq` increments per state refresh — Update-mode consumers
    * (and the parity spec) keep the row with the user's max updateSeq;
    * a streak count can DECREASE when a gap-filling day merges two runs,
    * so no summary field is monotonic on its own. */
  final case class StreakSummary(
      userId: Long, longestStreak: Long, nStreaks: Long, nActiveDays: Long,
      updateSeq: Long)

  private val DayMs = 86400000L

  /** Merge day points into an interval list (both already sorted ranges →
    * standard sweep; adjacency within 1 day joins runs). */
  private[streaming] def mergeDays(
      live: Seq[(Long, Long)], days: Seq[Long]): Seq[(Long, Long)] = {
    val pts = days.map(d => (d, d))
    val all = (live ++ pts).sortBy(_._1)
    all.foldLeft(List.empty[(Long, Long)]) {
      case (acc, (s, e)) => acc match {
        case (ps, pe) :: tail if s <= pe + 1 => (ps, math.max(pe, e)) :: tail
        case _ => (s, e) :: acc
      }
    }.reverse
  }

  /** Running per-user streak summaries (Update mode: one refreshed row per
    * user per micro-batch that touched it). Input must already carry a
    * watermark on `ts`. */
  def summaries(events: Dataset[DayEvent]): Dataset[StreakSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[StreakState, StreakSummary](
        GroupStateTimeout.NoTimeout()) { (userId, rows, state) =>
        val wmDay = Math.floorDiv(state.getCurrentWatermarkMs(), DayMs)
        val old = state.getOption.getOrElse(StreakState(0L, 0L, 0L, Nil, 0L))
        val newDays = rows.map(e => Math.floorDiv(e.ts.getTime, DayMs))
          .filter(_ >= wmDay).toSeq.distinct
          .filterNot(d => old.live.exists(iv => d >= iv._1 && d <= iv._2))
        val merged = mergeDays(old.live, newDays)
        // freeze every interval out of merge reach of any future day
        val (frozen, live) = merged.partition(_._2 < wmDay - 1)
        val st = StreakState(
          old.frozenRuns + frozen.size,
          frozen.foldLeft(old.frozenLongest)((m, iv) =>
            math.max(m, iv._2 - iv._1 + 1)),
          old.frozenDays + frozen.map(iv => iv._2 - iv._1 + 1).sum,
          live, old.version + 1)
        state.update(st)
        StreakSummary(
          userId,
          live.foldLeft(st.frozenLongest)((m, iv) => math.max(m, iv._2 - iv._1 + 1)),
          st.frozenRuns + live.size,
          st.frozenDays + live.map(iv => iv._2 - iv._1 + 1).sum,
          st.version)
      }
  }
}
