package graft.operators

import graft.SparkSpec

class LabelCohesionSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight clusters along different axes, labeled accordingly, plus a
    * small same-label perturbation — same-label pairs are near-parallel
    * (cos ≈ 1), cross-label pairs orthogonal (cos ≈ 0). */
  private def fixture = {
    val rows =
      (1L to 10L).map(i => (i, Array(1f, 0.01f * i, 0f, 0f), 0)) ++
      (11L to 20L).map(i => (i, Array(0f, 0f, 1f, 0.01f * i), 1))
    rows.toDF("vec_id", "embedding", "label")
  }

  test("cohesive labels: within-label cosine far above cross-label") {
    val out = Similarity.labelCohesion(fixture, "vec_id", "embedding", "label",
      sampleK = 20)
      .collect().map(r => r.getBoolean(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val (nSame, cosSame) = out(true)
    val (nDiff, cosDiff) = out(false)
    assert(nSame + nDiff == 20L * 19 / 2)
    assert(nSame == 2L * (10 * 9 / 2))
    assert(cosSame > 0.99, s"within-label $cosSame")
    assert(cosDiff < 0.01, s"cross-label $cosDiff")
  }

  test("the sample cap bounds the pair count at any corpus size") {
    val big = (1L to 500L).map(i => (i, Array(1f, i.toFloat, 0f, 0f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val total = Similarity.labelCohesion(big, "vec_id", "embedding", "label",
      sampleK = 32)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).first().getLong(0)
    assert(total == 32L * 31 / 2, s"pair count $total must be k·(k−1)/2")
  }

  test("the same seed re-selects the same sample (deterministic report)") {
    def run() = Similarity.labelCohesion(fixture, "vec_id", "embedding", "label",
      sampleK = 7)
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run() == run())
  }
}
