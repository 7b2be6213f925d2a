package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous distinct-actives counting — the streaming form of d32's
  * daily-active rollup: dedupe (user, day-window) pairs inside the
  * watermark horizon, then count per window. This is the canonical
  * CHAINED-stateful-operator shape (streaming dropDuplicates feeding a
  * windowed aggregation — supported since Spark 3.4's multi-stateful
  * pipelines); each day's final count emits exactly once when the
  * watermark passes the window end.
  *
  * State: the dedup operator holds one row per (user, day) inside the
  * horizon and the aggregation one row per open window — both evicted by
  * the watermark, so state is bounded by actives-per-horizon, never by
  * stream length. Input must already carry a watermark on `tsCol`. */
object StreamingActives {

  def dailyActives(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events
      .select(col(userCol).as("user_id"), window(col(tsCol), "1 day").as("__w"))
      .dropDuplicates("user_id", "__w")
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("active_users"))
      .select(col("__w.start").as("day_start"), col("active_users"))
}
