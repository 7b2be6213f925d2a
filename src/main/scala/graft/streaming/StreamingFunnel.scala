package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel resolution — the continuous form of the d30
  * query: per user, first view, first click within `deadlineMs` AFTER that
  * view, first purchase within `deadlineMs` after that click. One outcome
  * row per user, emitted exactly once when the user's funnel state times
  * out past the watermark (idle, or the funnel horizon passed).
  *
  * Exactness under out-of-order delivery: the first-view time can only
  * DECREASE as late views arrive, which can change which clicks qualify —
  * so the state buffers candidate stage times instead of fixing stages
  * eagerly, and resolves the funnel ONCE at timeout. The buffers stay
  * bounded by construction:
  *   - views collapse to their running minimum v (min is associative);
  *   - a click can qualify only if it lies in (v', v'+deadline] for the
  *     FINAL v' ≤ v; any click above v+deadline can never qualify (future
  *     views only lower the window) and is dropped, and a click at or
  *     below the current v qualifies only via a future view, which must
  *     carry ts above the watermark — so clicks at or below the watermark
  *     that do not qualify today are dropped too;
  *   - purchases prune identically against the v+2·deadline horizon.
  * State per user is therefore O(events inside a 2-deadline window plus
  * the watermark lateness horizon), independent of stream length.
  */
object StreamingFunnel {

  final case class FunnelEvent(userId: Long, eventId: Long, eventType: String, ts: Timestamp)

  /** Candidate buffers; v = Long.MaxValue while no view seen. Public: the
    * state encoder's generated code must reach the constructor. */
  final case class FunnelBuffer(
      v: Long, clicks: Seq[Long], purchases: Seq[Long], lastMs: Long)

  /** Resolved funnel for one user; -1 = stage not reached. */
  final case class FunnelOutcome(userId: Long, vMs: Long, cMs: Long, pMs: Long)

  /** Pure resolution of a buffer — also the spec's reference point. */
  private[streaming] def resolve(
      userId: Long, b: FunnelBuffer, deadlineMs: Long): FunnelOutcome =
    if (b.v == Long.MaxValue) FunnelOutcome(userId, -1L, -1L, -1L)
    else {
      val c = b.clicks.filter(t => t > b.v && t <= b.v + deadlineMs)
        .sorted.headOption
      c match {
        case None => FunnelOutcome(userId, b.v, -1L, -1L)
        case Some(ct) =>
          val p = b.purchases.filter(t => t > ct && t <= ct + deadlineMs)
            .sorted.headOption
          FunnelOutcome(userId, b.v, ct, p.getOrElse(-1L))
      }
    }

  /** Funnel outcomes over a stream of typed events. Input must already
    * carry a watermark on `ts`; `idleMs` is the inactivity horizon after
    * which a user's funnel is considered final (pick ≥ 2·deadline for
    * exact batch parity on in-horizon data). */
  def outcomes(
      events: Dataset[FunnelEvent],
      deadlineMs: Long,
      idleMs: Long,
      viewType: String = "view",
      clickType: String = "click",
      purchaseType: String = "purchase"): Dataset[FunnelOutcome] = {
    require(deadlineMs > 0, "deadline must be positive")
    require(idleMs > 0, "idle horizon must be positive")
    val spark = events.sparkSession
    import spark.implicits._

    // saturating add — v is Long.MaxValue while unset
    def satAdd(a: Long, b: Long): Long =
      if (a == Long.MaxValue || a > Long.MaxValue - b) Long.MaxValue else a + b

    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelBuffer, FunnelOutcome](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelBuffer]) =>
          if (state.hasTimedOut) {
            val b = state.get
            state.remove()
            Iterator.single(resolve(userId, b, deadlineMs))
          } else {
            val wm = state.getCurrentWatermarkMs()
            val evs = rows.toSeq
            val old = state.getOption
              .getOrElse(FunnelBuffer(Long.MaxValue, Nil, Nil, Long.MinValue))
            val v = (old.v +: evs.collect {
              case e if e.eventType == viewType => e.ts.getTime
            }).min
            // keep a candidate time iff it can still qualify for the final
            // (possibly lower) first-view time — see the scaladoc proof
            def keep(t: Long, upper: Long): Boolean =
              t <= upper && (t > v || t > wm)
            val cUpper = satAdd(v, deadlineMs)
            val pUpper = satAdd(cUpper, deadlineMs)
            val clicks = (old.clicks ++ evs.collect {
              case e if e.eventType == clickType => e.ts.getTime
            }).distinct.filter(keep(_, cUpper))
            val purchases = (old.purchases ++ evs.collect {
              case e if e.eventType == purchaseType => e.ts.getTime
            }).distinct.filter(keep(_, pUpper))
            val lastMs = (old.lastMs +: evs.map(_.ts.getTime)).max
            state.update(FunnelBuffer(v, clicks, purchases, lastMs))
            // final when the user went idle past the horizon; clamp above
            // the watermark (a timeout <= watermark is illegal)
            state.setTimeoutTimestamp(math.max(lastMs + idleMs, wm + 1))
            Iterator.empty
          }
      }
  }
}
