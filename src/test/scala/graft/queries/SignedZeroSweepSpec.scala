package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Blanket signed-zero audit over EVERY declared query: no Spark output
  * may ever carry an IEEE −0.0 cell. Rationale (the x109 round-10 defect
  * class): the driver's correctness gate hashes CANONICAL BYTES, where
  * −0.0 ≠ +0.0, while every value-level comparison (pandas ==, SQL =)
  * treats them as equal — so a signed zero is invisible to local replicas
  * yet fails the gate. The parity contract is one-sided by construction:
  * Spark-side rounds go through BigDecimal HALF_UP (no signed zero) and
  * every oracle-side `round()` that can go negative-tiny is normalized
  * with `+ 0.0` (IEEE: −0.0 + 0.0 = +0.0); the DuckDB side of the same
  * audit runs in scripts/check_oracle.py (NEGZERO lines, bit-faithful
  * since round 11). This spec pins the Spark half: any operator that
  * starts emitting a raw fp product/sum whose sign of zero survives to
  * the output fails here, at spec time, over all queries at sf0.001. */
class SignedZeroSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def negZeros(v: Any): Int = v match {
    case d: Double =>
      if (java.lang.Double.doubleToRawLongBits(d) == java.lang.Long.MIN_VALUE) 1 else 0
    case f: Float =>
      if (java.lang.Float.floatToRawIntBits(f) == Int.MinValue) 1 else 0
    case r: Row => r.toSeq.map(negZeros).sum
    case s: scala.collection.Seq[_] => s.map(negZeros).sum
    case m: scala.collection.Map[_, _] => m.valuesIterator.map(negZeros).sum
    case _ => 0
  }

  test("no declared query emits an IEEE -0.0 cell") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val rows =
        try fn(spark, dir).collect()
        catch { case e: Throwable => fail(s"$name failed to run: ${e.getMessage}") }
      val hits = rows.iterator.map(negZeros(_)).sum
      if (hits > 0) offenders += s"$name: $hits -0.0 cell(s)"
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty,
      s"${offenders.size} signed-zero offender(s):\n${offenders.mkString("\n")}")
  }
}
