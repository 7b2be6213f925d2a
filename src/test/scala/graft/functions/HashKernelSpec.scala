package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class HashKernelSpec extends AnyFunSuite {

  private def arr(xs: Long*) = new GenericArrayData(xs.toArray)

  test("ngramHashes: sorted, distinct, deterministic") {
    val h = GraftHashUtil.ngramHashes(UTF8String.fromString("abcabc"), 3)
    val xs = h.toLongArray().toSeq
    assert(xs == xs.sorted && xs.distinct == xs)
    // "abcabc" 3-grams: abc, bca, cab, abc → 3 distinct
    assert(xs.length == 3)
    val again = GraftHashUtil.ngramHashes(UTF8String.fromString("abcabc"), 3)
    assert(again.toLongArray().toSeq == xs)
  }

  test("shingleHashes: word shingles, whitespace/casing robust") {
    val a = GraftHashUtil.shingleHashes(UTF8String.fromString("The quick  brown fox"), 2)
    val b = GraftHashUtil.shingleHashes(UTF8String.fromString("the quick brown fox"), 2)
    assert(a.toLongArray().toSeq == b.toLongArray().toSeq)
    assert(a.numElements() == 3) // (the,quick) (quick,brown) (brown,fox)
    assert(GraftHashUtil.shingleHashes(UTF8String.fromString("one"), 2).numElements() == 0)
  }

  test("sortedIntersectCount: linear merge") {
    assert(GraftHashUtil.sortedIntersectCount(arr(1, 3, 5, 7), arr(2, 3, 5, 9)) == 2L)
    assert(GraftHashUtil.sortedIntersectCount(arr(), arr(1)) == 0L)
    assert(GraftHashUtil.sortedIntersectCount(arr(1, 2), arr(1, 2)) == 2L)
  }

  test("simhash64: identical sets match, disjoint sets differ") {
    val a = GraftHashUtil.simhash64(arr(11L, 22L, 33L, 44L))
    val b = GraftHashUtil.simhash64(arr(11L, 22L, 33L, 44L))
    val c = GraftHashUtil.simhash64(arr(911L, 922L, 933L, 944L))
    assert(a == b && a != c)
  }

  test("minhash band collision rate tracks Jaccard theory (family unbiased)") {
    // two random disjoint-ish sets with known overlap s: P(any band match)
    // = 1-(1-s^r)^b. The broken affine family admitted ~50x this rate —
    // regression-guard the selectivity, not just correctness.
    val rng = new scala.util.Random(7)
    val bands = 32; val rows = 8
    val trials = 300
    var collisions = 0
    (1 to trials).foreach { _ =>
      val base = Array.fill(100)(rng.nextLong())
      val other = base.take(30) ++ Array.fill(70)(rng.nextLong()) // jaccard ≈ 30/170 ≈ 0.18
      val ba = GraftHashUtil.minhashBands(new GenericArrayData(base), bands, rows).toLongArray()
      val bb = GraftHashUtil.minhashBands(new GenericArrayData(other), bands, rows).toLongArray()
      if (ba.zip(bb).exists { case (x, y) => x == y }) collisions += 1
    }
    // theory at s=0.18: 1-(1-0.18^8)^32 ≈ 3.6e-5 → expect ~0 collisions of 300
    assert(collisions <= 2, s"family biased: $collisions/$trials collided")
  }

  test("minhash bands: high-similarity pairs collide") {
    val rng = new scala.util.Random(11)
    val base = Array.fill(200)(rng.nextLong())
    val near = base.dropRight(10) ++ Array.fill(10)(rng.nextLong()) // jaccard ≈ 0.90
    val ba = GraftHashUtil.minhashBands(new GenericArrayData(base), 32, 8).toLongArray()
    val bb = GraftHashUtil.minhashBands(new GenericArrayData(near), 32, 8).toLongArray()
    assert(ba.zip(bb).exists { case (x, y) => x == y })
  }

  test("hyperplaneSketch: deterministic, similar vectors share most bits") {
    def vec(xs: Float*) = new GenericArrayData(xs.toArray)
    val a = GraftHashUtil.hyperplaneSketch(vec(1f, 0f, 0f, 0f), 16, 4, 42L)
    val a2 = GraftHashUtil.hyperplaneSketch(vec(1f, 0f, 0f, 0f), 16, 4, 42L)
    val near = GraftHashUtil.hyperplaneSketch(vec(0.95f, 0.05f, 0f, 0f), 16, 4, 42L)
    val anti = GraftHashUtil.hyperplaneSketch(vec(-1f, 0f, 0f, 0f), 16, 4, 42L)
    assert(a == a2)
    assert(java.lang.Long.bitCount((a ^ near) & 0xFFFFL) <
      java.lang.Long.bitCount((a ^ anti) & 0xFFFFL))
    assert(java.lang.Long.bitCount((a ^ anti) & 0xFFFFL) == 16) // antipode flips every bit
  }

  test("adaptive sorted-intersect agrees with the naive merge on lopsided sizes") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rng = new scala.util.Random(0xada9)
    def sortedDistinct(n: Int, bound: Long): Array[Long] =
      Array.fill(n)(math.abs(rng.nextLong()) % bound).distinct.sorted
    def naive(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var j = 0; var c = 0L
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1 else j += 1
      }
      c
    }
    for (_ <- 1 to 50) {
      // small side vs >=32x larger side forces the binary-search branch;
      // a narrow value range forces real overlaps
      val small = sortedDistinct(1 + rng.nextInt(30), 5000L)
      val big = sortedDistinct(2000 + rng.nextInt(3000), 5000L)
      val got = GraftHashUtil.sortedIntersectCount(
        new GenericArrayData(small), new GenericArrayData(big))
      assert(got == naive(small, big), s"${small.length} vs ${big.length}")
      // symmetric call hits the swap path
      val got2 = GraftHashUtil.sortedIntersectCount(
        new GenericArrayData(big), new GenericArrayData(small))
      assert(got2 == got)
    }
    // edges: empty sides
    val e = new GenericArrayData(Array.emptyLongArray)
    val x = new GenericArrayData(Array(1L, 2L, 3L))
    assert(GraftHashUtil.sortedIntersectCount(e, x) == 0L)
    assert(GraftHashUtil.sortedIntersectCount(x, e) == 0L)
  }
}
