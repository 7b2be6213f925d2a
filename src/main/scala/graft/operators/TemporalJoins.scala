package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval join operators Spark has no built-in for — both built
  * as shuffle-friendly compositions (SURVEY §2 "custom operators" preference
  * (a): compose existing ops), never as nested-loop scans.
  *
  * - asofJoin: each left row picks the latest right row at-or-before its
  *   timestamp, per key. The classic scalable construction is the tagged
  *   union: both sides shuffle ONCE on the key, sort by (ts, tag, tie)
  *   inside each key, and a last(ignoreNulls) running window carries the
  *   most recent right payload forward into the left rows. No range
  *   condition ever reaches a join operator, so Catalyst never falls back
  *   to BroadcastNestedLoop/cartesian — cost is one exchange per side at
  *   any scale.
  *
  * - pointInIntervalJoin: match points to (possibly overlapping) intervals.
  *   A raw `BETWEEN` join is non-equi → nested loop. Bucketizing recovers
  *   an equi-join: intervals explode to the fixed-width buckets they cover,
  *   points key to their bucket, the equi-join shuffles on the bucket key,
  *   and the exact BETWEEN runs as a residual filter. Interval fan-out =
  *   ceil(span/bucketWidth) rows — pick bucketWidth near the median span.
  */
object TemporalJoins {

  /** As-of join with pandas-merge_asof-style direction and tolerance.
    *
    * direction "backward" (default): for each left row, appends `valueCols`
    * from the right row with the greatest (rightTs, rightTie) such that
    * rightTs <= leftTs within the same key. "forward": the SMALLEST
    * (rightTs, rightTie) with rightTs >= leftTs — implemented by negating
    * the time/tie axis, so both directions share the single-exchange
    * union+window plan. "nearest": the right row minimizing |leftTs −
    * rightTs| within the tolerance; an equal gap resolves backward. Still
    * one exchange — two in-partition sorts carry both directions.
    * Inclusive at equal timestamps in every direction.
    *
    * toleranceMicros bounds the match gap: a right row farther than the
    * tolerance (|leftTs - rightTs|) yields null value columns, same as no
    * match. The matched right timestamp rides the same running window as
    * the values, so the bound costs no extra pass.
    *
    * `rightTie` makes the pick deterministic when right timestamps collide;
    * appended columns are null when no right row qualifies. Output = left
    * columns + valueCols. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String,
      valueCols: Seq[String],
      direction: String = "backward",
      toleranceMicros: Long = Long.MaxValue): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(valueCols.contains),
      s"asofJoin value columns ${valueCols.mkString(",")} collide with left columns")
    val reserved = Seq("__ts", "__tag", "__tie", "__mts", "__carry",
      "__cb", "__cf", "__chosen")
    require(!(leftCols ++ valueCols).exists(reserved.contains),
      s"asofJoin reserves column names ${reserved.mkString(",")}")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(toleranceMicros > 0, "toleranceMicros must be positive")
    // forward = backward on the mirrored axis (ties mirror too: forward
    // picks the SMALLEST tie among equal timestamps)
    val sign = if (direction == "forward") -1L else 1L

    // The whole right payload rides in ONE struct so a single
    // last(ignoreNulls) window picks it atomically: per-column carries would
    // silently backfill a NULL field of the matched row from an OLDER right
    // row, mixing values across matches.
    val carryType = org.apache.spark.sql.types.StructType(
      valueCols.map(c =>
        org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField(
          "__mts", org.apache.spark.sql.types.LongType))

    // tag 0 sorts before tag 1 at equal timestamps → a right row AT the left
    // row's timestamp is visible (inclusive as-of); among equal-ts right rows
    // the tie column orders them so last() picks the greatest.
    val taggedLeft = left
      .withColumn("__ts", unix_micros(col(leftTsCol)) * sign)
      .withColumn("__tag", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .select(
        (leftCols.map(col) :+ col("__ts") :+ col("__tag") :+ col("__tie")) :+
          lit(null).cast(carryType).as("__carry"): _*)
    // the key keeps its real value on BOTH sides (same column name required);
    // every other left column nulls out on right rows and vice versa.
    // Null-key right rows are DROPPED: under SQL join semantics a null key
    // matches nothing, but the window partition would group them with
    // null-key LEFT rows and hand those rows a bogus match — the filter
    // restores join semantics (null-key left rows pass through with null
    // value columns).
    val taggedRight = right
      .where(col(keyCol).isNotNull)
      .withColumn("__ts", unix_micros(col(rightTsCol)) * sign)
      .withColumn("__tag", lit(0))
      .withColumn("__tie", col(rightTieCol).cast("long") * sign)
      .select(
        (leftCols.map(c =>
          if (c == keyCol) col(keyCol)
          else lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("__ts") :+ col("__tag") :+ col("__tie")) :+
          struct(valueCols.map(col) :+ col("__ts").as("__mts"): _*)
            .as("__carry"): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = taggedLeft.unionByName(taggedRight)

    if (direction == "nearest") {
      // Nearest = backward ∧ forward carries over the SAME exchange: one
      // shuffle on the key, two in-partition sorts (the forward window
      // re-orders tag DESC so an equal-timestamp right row falls inside the
      // current-row→following frame — inclusive both ways). Tie on the gap
      // resolves BACKWARD (and within a side by the side's own tie rule:
      // greatest tie backward, smallest forward) — document-level contract
      // mirrored by the d34 oracle's correlated ORDER BY.
      val wF = Window.partitionBy(col(keyCol))
        .orderBy(col("__ts"), col("__tag").desc, col("__tie"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val carried = unioned
        .withColumn("__cb", last(col("__carry"), ignoreNulls = true).over(w))
        .withColumn("__cf", first(col("__carry"), ignoreNulls = true).over(wF))
      val bGap = col("__ts") - col("__cb").getField("__mts")
      val fGap = col("__cf").getField("__mts") - col("__ts")
      val bOk = col("__cb").isNotNull && bGap <= toleranceMicros
      val fOk = col("__cf").isNotNull && fGap <= toleranceMicros
      val chosen = when(bOk && (!fOk || bGap <= fGap), col("__cb"))
        .when(fOk, col("__cf"))
      val unpacked = valueCols.foldLeft(carried.withColumn("__chosen", chosen)) {
        (df, c) => df.withColumn(c, col("__chosen").getField(c))
      }
      unpacked.where(col("__tag") === 1)
        .drop("__ts", "__tag", "__tie", "__carry", "__cb", "__cf", "__chosen")
    } else {
      val carried = unioned.withColumn(
        "__carry", last(col("__carry"), ignoreNulls = true).over(w))
      // in mirrored space the gap is ALWAYS __ts - __mts >= 0 for a match
      val withinTol = col("__carry").isNotNull &&
        (col("__ts") - col("__carry").getField("__mts")) <= toleranceMicros
      val unpacked = valueCols.foldLeft(carried) { (df, c) =>
        df.withColumn(c, when(withinTol, col("__carry").getField(c)))
      }
      unpacked.where(col("__tag") === 1).drop("__ts", "__tag", "__tie", "__carry")
    }
  }

  /** Point-in-interval join: rows of `points` matched to every row of
    * `intervals` with lo <= value <= hi (inclusive bounds, overlapping
    * intervals all match). Output = point columns + interval columns.
    *
    * bucketWidth trades interval fan-out (rows per interval in the exploded
    * build side) against residual-filter selectivity; both sides hash-join
    * on the bucket key. Negative values are handled (floor division). */
  def pointInIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucketed = intervals
      .withColumn("__b",
        explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          floor(col(hiCol) / bucketWidth).cast("long"))))
    val build = if (broadcastIntervals) broadcast(bucketed) else bucketed
    points
      .withColumn("__b", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(build, Seq("__b"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__b")
  }
}
