package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the k-group comparison tests — live one-way ANOVA
  * (x196) and Kruskal–Wallis (x195) over a continuously-arriving scored
  * stream. Two bounded states, both plain commutative aggregations:
  * ANOVA keeps per-group exact decimal (n, Σy, Σy²); Kruskal–Wallis
  * keeps the (value × group) cell counts (domain-bounded by the same
  * bucketing contract as the batch query). The finishes are the
  * stateless views shared verbatim with the batch operators
  * (Evaluation.finishAnova / finishKruskalWallis), so batch and stream
  * agree by construction under any arrival order — sums only grow, no
  * watermark needed. */
object StreamingGroupTests {

  /** Running per-group (n, Σy, Σy²) over a stream. Run with
    * OutputMode.Complete; finish with Evaluation.finishAnova. */
  def anovaStats(
      stream: DataFrame,
      value: Column,
      group: Column): DataFrame =
    Evaluation.groupValueStats(stream, value, group)

  /** Running (value, group) cell counts over a stream. Run with
    * OutputMode.Complete; finish with Evaluation.finishKruskalWallis. */
  def rankCells(
      stream: DataFrame,
      value: Column,
      group: Column): DataFrame =
    Evaluation.valueGroupCells(stream, value, group)
}
