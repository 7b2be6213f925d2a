package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic skewed corpus: 120 distinct tokens (more than the narrow
    * sketch width, forcing real collisions), Zipf-ish counts, plus one
    * planted heavy hitter. */
  private def corpus = {
    val rng = new scala.util.Random(0x5eedL)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var id = 0L
    for (t <- 1 to 120) {
      val reps = math.max(1, 60 / t) // zipf-ish tail
      for (_ <- 1 to reps) {
        rows += ((id, s"tok$t filler${rng.nextInt(1000)} tok$t"))
        id += 1
      }
    }
    for (_ <- 1 to 200) { rows += ((id, "heavy heavy heavy")); id += 1 }
    rows.toSeq.toDF("doc_id", "text")
  }

  private def exactCounts = corpus
    .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    .groupBy("token").agg(count(lit(1)).as("exact"))

  test("estimates never undercount, and overshoot stays within the CMS bound") {
    val docs = corpus
    val exact = exactCounts
    val n = exact.agg(sum("exact")).first().getLong(0)
    val width = 16 // far below the 120+ token vocabulary: collisions certain
    val est = Sketches.cmsEstimates(
      Sketches.countMinTokenSketch(docs, "text", width, 4),
      exact.select("token"), width, 4)
    val joined = est.join(exact, "token")
      .select(col("token"), col("est"), col("exact")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS undercounted ${r.getString(0)}: est=${r.getLong(1)} exact=${r.getLong(2)}")
    }
    // Classic bound: overshoot ≤ εN w.h.p. with ε = e/width; allow the full
    // constant (deterministic fixture — this is a regression pin, not a
    // probabilistic claim).
    val bound = math.ceil(math.E / width * n).toLong
    joined.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) <= bound,
        s"${r.getString(0)} overshoot ${r.getLong(1) - r.getLong(2)} > εN=$bound")
    }
  }

  test("the planted heavy hitter tops the ranking at production width") {
    val docs = corpus
    val top = Sketches.cmsHeavyHitters(docs, "text",
      exactCounts.select("token"), width = 256, depth = 4, topK = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.head._1 == "heavy", top.mkString(", "))
    assert(top.head._2 >= 600, s"heavy count ≥ 600 expected, got ${top.head._2}")
  }

  test("sketch state is bounded by depth × width regardless of corpus size") {
    val sketch = Sketches.countMinTokenSketch(corpus, "text", 64, 4)
    assert(sketch.count() <= 64L * 4)
  }

  test("rebuilding the sketch reproduces identical estimates (hash stability)") {
    val docs = corpus
    val cands = exactCounts.select("token")
    def run() = Sketches.cmsEstimates(
      Sketches.countMinTokenSketch(docs, "text", 64, 4), cands, 64, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run() == run())
  }

  test("linearity: sketches of disjoint halves sum to the full-corpus sketch") {
    // the property that justifies distributed partial aggregation AND the
    // streaming incremental build: CMS cells are plain sums
    val docs = corpus.cache()
    val half1 = docs.where($"doc_id" % 2 === 0)
    val half2 = docs.where($"doc_id" % 2 =!= 0)
    def m(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinTokenSketch(df, "text", 64, 4)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (m(half1).toSeq ++ m(half2).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == m(docs))
    docs.unpersist()
  }

  test("width must be a power of two and depth within the seed family") {
    intercept[IllegalArgumentException] {
      Sketches.countMinTokenSketch(corpus, "text", 48, 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.countMinTokenSketch(corpus, "text", 64, 9)
    }
  }
}
