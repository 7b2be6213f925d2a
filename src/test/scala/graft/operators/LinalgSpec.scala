package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftGramAgg

class LinalgSpec extends SparkSpec {

  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // deterministic synthetic embeddings: dominant variance along axis 0,
  // secondary along axis 1, noise elsewhere (fixed LCG, no RNG state)
  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  private lazy val synth = {
    val noise = lcg(42L)
    (0 until 200).map { i =>
      val t = (i - 100).toDouble / 10.0
      val u = (if (i % 2 == 0) 1.0 else -1.0) * 0.8
      (i.toLong, vec(t, u, noise.next() * 0.05, noise.next() * 0.05))
    }
  }

  test("graft_dot_fd matches a driver-side ordered fold") {
    val out = Seq((vec(1.5, -2.0, 0.25), Seq(2.0, 3.0, 4.0)))
      .toDF("a", "b")
      .select(call_function("graft_dot_fd", col("a"), col("b")))
      .head().getDouble(0)
    assert(out == 1.5f.toDouble * 2.0 + (-2.0f).toDouble * 3.0 + 0.25f.toDouble * 4.0)
  }

  test("graft_gram_agg sums EXACTLY equal the quantized direct computation") {
    val dim = 3
    val rows = Seq(
      (vec(1.0, 2.0, 3.0), 1.0),
      (vec(-0.5, 0.25, 4.0), 0.0),
      (vec(2.0, -1.0, 0.5), 1.0),
      (vec(0.0, 0.0, 1.0), 0.0),
      (vec(3.5, 2.5, -2.0), 1.0))
    val g = rows.toDF("v", "y").repartition(4)
      .agg(call_function("graft_gram_agg", col("v"), col("y"), lit(dim)))
      .head().getSeq[Double](0).toArray
    assert(g(0) == 5.0)
    val xs = rows.map(_._1.map(_.toDouble))
    val ys = rows.map(_._2)
    def qsum(terms: Seq[Double]): Double =
      terms.map(GraftGramAgg.quantize).sum.toDouble / GraftGramAgg.Scale
    (0 until dim).foreach { i =>
      assert(g(1 + i) == qsum(xs.map(_(i))), s"s_$i")
      (i until dim).foreach { j =>
        assert(g(GraftGramAgg.triIndex(dim, i, j)) == qsum(xs.map(x => x(i) * x(j))),
          s"s_${i}_$j")
      }
      assert(g(1 + dim + dim * (dim + 1) / 2 + i) ==
        qsum(xs.zip(ys).map { case (x, y) => x(i) * y }), s"sy_$i")
    }
    assert(g(g.length - 2) == qsum(ys))
    assert(g(g.length - 1) == qsum(ys.map(y => y * y)))
    // grid loss stays invisible at the 6-dp consumption contract
    (0 until dim).foreach { i =>
      assert(math.abs(g(1 + i) - xs.map(_(i)).sum) < 5 * 4.8e-7, s"grid_$i")
    }
  }

  test("graft_gram_agg buffer is BIT-identical under shuffled partition layouts") {
    // adversarial values: float32 lattice points whose products land within
    // ulps of 2^-20 grid midpoints AND whose 6-dp moments sit near rounding
    // boundaries — the exact regime where the old quantize-after-sum buffer
    // flipped between runs (x109's round-9 hash flake)
    val dim = 4
    val noise = lcg(20260815L)
    val rows = (0 until 997).map { i =>
      val base = noise.next()
      (vec(
        base * 1.0000005,
        (i % 7 - 3).toDouble / 7.0 + noise.next() * 1e-7,
        math.sin(i.toDouble) * 0.5 + 0.00000049999,
        noise.next()),
        (i % 3).toDouble + noise.next() * 1e-6)
    }
    val df = rows.toDF("v", "y")
    def buf(parts: Int): Seq[Long] = {
      val shaped = if (parts == 0) df else df.repartition(parts)
      shaped.agg(call_function("graft_gram_agg", col("v"), col("y"), lit(dim)))
        .head().getSeq[Double](0).map(java.lang.Double.doubleToRawLongBits)
    }
    val reference = buf(0)
    Seq(1, 8, 97).foreach { p =>
      assert(buf(p) == reference, s"buffer under repartition($p) must be bit-identical")
    }
  }

  test("graft_gram_agg rejects a wrong-length vector") {
    val e = intercept[Exception] {
      Seq((vec(1.0, 2.0), 0.0)).toDF("v", "y")
        .agg(call_function("graft_gram_agg", col("v"), col("y"), lit(3)))
        .head()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("vector length"))
  }

  test("pcaProject finds the dominant axis and orders explained variance") {
    val out = Linalg.pcaProject(synth.toDF("id", "v"), "v", dim = 4,
      carry = Seq("id"), iters = 12).collect()
    val evr1 = out.head.getDouble(3)
    val evr2 = out.head.getDouble(4)
    assert(evr1 > 0.9, s"axis 0 dominates the spectrum, evr1=$evr1")
    assert(evr1 > evr2 && evr2 > 0.0)
    // pc1 scores must order like the axis-0 coordinate (up to global sign)
    val byId = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sign = math.signum(byId(199L) - byId(0L))
    assert(sign != 0.0)
    assert((0 until 199).forall(i => sign * (byId(i + 1L) - byId(i.toLong)) > -0.2),
      "pc1 scores track the dominant coordinate monotonically (noise tolerance)")
  }

  test("pcaProject determinism: repartitioned input gives identical scores") {
    val df = synth.toDF("id", "v")
    val a = Linalg.pcaProject(df, "v", 4, Seq("id")).orderBy("id").collect().toSeq
    val b = Linalg.pcaProject(df.repartition(7), "v", 4, Seq("id"))
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("ridgeProbe separates a linearly separable target") {
    val out = Linalg.ridgeProbe(synth.toDF("id", "v"), "v",
      col("id") % 2 === 0, dim = 4, carry = Seq("id"), iters = 128).collect()
    // target = the axis-1 sign bit: perfectly linearly decodable
    val acc = out.count(r => r.getInt(3) == (if (r.getLong(0) % 2 == 0) 1 else 0))
      .toDouble / out.length
    assert(acc >= 0.95, s"probe accuracy $acc")
    out.foreach { r =>
      assert(r.getInt(3) == (if (r.getDouble(2) >= 0.5) 1 else 0),
        "pred must equal thresholded score")
      assert(r.getDouble(1) == (if (r.getLong(0) % 2 == 0) 1.0 else 0.0))
    }
  }

  test("logoInfluence: a label-poisoned group is the most harmful and " +
    "its removal beats the base fit") {
    // 3 clean groups where y = (t > 0) at |t| ≤ 1.25, plus one poison
    // group of HIGH-LEVERAGE flipped-label points at t = ±8: the poison
    // dominates Σt², drags the fitted slope negative, and the base model
    // misclassifies the whole complement; the ablated fit is clean. This
    // is exactly the mislabeled-source shape LOGO influence exists to
    // surface.
    val noise = lcg(7L)
    val rows = (0 until 240).map { i =>
      val grp = s"g${i % 4}"
      val (t, y) =
        if (grp == "g3") {
          val tv = if (i % 8 < 4) 8.0 else -8.0
          (tv, tv < 0) // flipped
        } else {
          val tv = (((i / 4) % 6) - 2.5) / 2.0 // ±0.25, ±0.75, ±1.25
          (tv, tv > 0)
        }
      (i.toLong, vec(t, noise.next() * 0.01, noise.next() * 0.01,
        noise.next() * 0.01), grp, y)
    }
    val df = rows.toDF("id", "v", "grp", "y")
    val out = Linalg.logoInfluence(df, "v", col("y"), col("grp"), dim = 4,
      iters = 128).collect()
    assert(out.length == 4)
    val byGrp = out.map(r => r.getString(0) -> r).toMap
    val poison = byGrp("g3")
    // removing the poison group improves the probe on the complement —
    // influence_ppm = excl_logo − excl_base strictly positive
    assert(poison.getLong(5) > 0L,
      s"poison influence ${poison.getLong(5)} should be positive")
    // and it is the unique maximum (most beneficial removal)
    assert(out.filter(_.getString(0) != "g3")
      .forall(_.getLong(5) < poison.getLong(5)))
    // the clean corpus transfers badly to the poison group: under its
    // flipped labels, the ablated fit scores it worse than a clean group
    assert(poison.getLong(7) < byGrp("g0").getLong(7))
    // parameter-space influence: poison shift is the largest
    assert(out.filter(_.getString(0) != "g3")
      .forall(_.getDouble(8) < poison.getDouble(8)))
    // base_acc is a single corpus-wide number repeated on every row
    assert(out.map(_.getLong(2)).distinct.length == 1)
  }

  test("logoInfluence: identical results under shuffled partition layouts") {
    val rows = synth.map { case (id, v) =>
      (id, v, s"g${id % 3}", id % 2 == 0)
    }
    val df = rows.toDF("id", "v", "grp", "y")
    val a = Linalg.logoInfluence(df, "v", col("y"), col("grp"), dim = 4)
      .collect().toSeq
    val b = Linalg.logoInfluence(df.repartition(13), "v", col("y"),
      col("grp"), dim = 4).collect().toSeq
    assert(a == b)
  }

  test("zcaWhiten: equalizes per-axis variance and reports near-zero residual") {
    val df = synth.toDF("vec_id", "embedding")
    val out = Linalg.zcaWhiten(df, "embedding", dim = 4,
      carry = Seq("vec_id"), eps = 0.01, iters = 20).collect()
    assert(out.length == synth.size)
    // whiteness residual: the fixed 20 rounds must actually whiten this
    // well-conditioned 4-dim spectrum
    val wres = out.head.getDouble(3)
    assert(out.forall(_.getDouble(3) == wres))
    assert(wres < 0.05, s"wres=$wres")
    // the raw axes have variances ~33 and ~0.64; whitened coordinates
    // must both land near unit variance
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(out.map(_.getDouble(1)).toSeq)
    val v2 = variance(out.map(_.getDouble(2)).toSeq)
    assert(math.abs(v1 - 1.0) < 0.1, s"var(z1)=$v1")
    assert(math.abs(v2 - 1.0) < 0.1, s"var(z2)=$v2")
  }

  test("zcaWhiten: identical results under shuffled partition layouts") {
    val df = synth.toDF("vec_id", "embedding")
    val a = Linalg.zcaWhiten(df, "embedding", 4, Seq("vec_id"))
      .orderBy("vec_id").collect().toSeq
    val b = Linalg.zcaWhiten(df.repartition(17), "embedding", 4, Seq("vec_id"))
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("linearCka: identical views score exactly 1, scaled views too") {
    // dyadic values on the 2^-20 grid with n = 4 → every moment is exact
    // at 6 dp, so CKA computes to exactly 1.0 for b = a and b = 2a
    val rows = Seq(
      (1L, vec(0.25, 0.5)), (2L, vec(-0.5, 0.25)),
      (3L, vec(0.75, -0.25)), (4L, vec(-0.25, -0.5)))
    val df = rows.toDF("id", "a")
    val same = Linalg.linearCka(df, col("a"), col("a"), 2, 2).collect().head
    assert(same.getLong(0) == 4L)
    assert(same.getDouble(1) == same.getDouble(2)) // fro_xx == fro_yy
    assert(same.getDouble(4) == 1.0d)
    val scaled = Linalg.linearCka(df, col("a"),
      expr("transform(a, v -> CAST(v * 2.0 AS FLOAT))"), 2, 2).collect().head
    assert(scaled.getDouble(4) == 1.0d)
  }

  test("linearCka: a constant second view yields NULL (zero covariance)") {
    val df = Seq((1L, vec(0.25, 0.5)), (2L, vec(-0.5, 0.25)),
      (3L, vec(0.75, -0.25))).toDF("id", "a")
    val r = Linalg.linearCka(df, col("a"),
      expr("transform(a, v -> CAST(1.0 AS FLOAT))"), 2, 2).collect().head
    assert(r.getDouble(2) == 0.0d) // fro_yy
    assert(r.isNullAt(4))
  }

  test("linearCka: partition-layout invariant") {
    val df = synth.toDF("id", "a")
    val a = Linalg.linearCka(df, col("a"),
      expr("transform(a, v -> CAST(greatest(least(floor(CAST(v AS DOUBLE) " +
        "* 32.0D + 0.5D), 127.0D), -127.0D) / 32.0D AS FLOAT))"), 4, 4)
      .collect().head
    val b = Linalg.linearCka(df.repartition(13), col("a"),
      expr("transform(a, v -> CAST(greatest(least(floor(CAST(v AS DOUBLE) " +
        "* 32.0D + 0.5D), 127.0D), -127.0D) / 32.0D AS FLOAT))"), 4, 4)
      .collect().head
    assert(a == b)
    // a 1/32 grid barely dents this geometry: high but not perfect CKA
    assert(a.getDouble(4) > 0.9 && a.getDouble(4) <= 1.0)
  }

  test("quadMmd: identical slice distributions give exactly zero") {
    // every vector appears once per slice → the two second-moment
    // matrices are identical cell-for-cell → MMD² = 0.0 exactly
    val vs = Seq(vec(0.25, 0.5, -0.75, 0.5), vec(-0.5, 0.25, 0.5, -0.25),
      vec(0.75, -0.5, 0.25, 0.0))
    val rows = vs.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, v), (2L * i + 1, v))
    }
    val df = rows.toDF("vec_id", "embedding")
    val r = Linalg.quadMmd(df, "embedding", col("vec_id") % 2 === 0, 4)
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("quadMmd: a shifted slice separates; one-slice input fails loudly") {
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0 else 2.0 // odd slice shifted
      (i.toLong, vec(base + (i % 5) * 0.125, base - (i % 3) * 0.25, 0.5, 0.0))
    }
    val df = rows.toDF("vec_id", "embedding")
    val r = Linalg.quadMmd(df, "embedding", col("vec_id") % 2 === 0, 4)
      .collect().head
    assert(r.getDouble(2) > 1.0)
    val one = rows.filter(_._1 % 2 == 0L).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Linalg.quadMmd(one, "embedding", col("vec_id") % 2 === 0, 4)
        .collect()
    }
  }

  test("effectiveRank: isotropic vs collapsed spectra") {
    // isotropic: two equal-variance orthogonal axes → pr ≈ 2, evr ≈ 0.5
    val iso = (0 until 64).map { i =>
      (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0,
        if (i % 4 < 2) 1.0 else -1.0))
    }.toDF("vec_id", "embedding")
    val ri = Linalg.effectiveRank(iso, "embedding", 2).collect().head
    assert(math.abs(ri.getDouble(3) - 2.0) < 0.01)
    assert(math.abs(ri.getDouble(4) - 0.5) < 0.01)
    // collapsed: second axis is a copy of the first → rank 1
    val col1 = (0 until 64).map { i =>
      val x = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, vec(x, x))
    }.toDF("vec_id", "embedding")
    val rc = Linalg.effectiveRank(col1, "embedding", 2).collect().head
    assert(math.abs(rc.getDouble(3) - 1.0) < 0.01)
    assert(math.abs(rc.getDouble(4) - 1.0) < 0.01)
  }

  test("effectiveRank: an all-constant corpus reports NULL pr/evr, no crash") {
    val df = (0 until 8).map(i => (i.toLong, vec(1.5, 1.5))).toDF("vec_id", "embedding")
    val r = Linalg.effectiveRank(df, "embedding", 2).collect().head
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("guards: empty input and bad iteration counts fail loudly") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "v")
    assertThrows[IllegalArgumentException] {
      Linalg.pcaProject(empty, "v", 4, Seq("id"))
    }
    val one = Seq((1L, vec(1.0, 0.0, 0.0, 0.0))).toDF("id", "v")
    assertThrows[IllegalArgumentException] {
      Linalg.pcaProject(one, "v", 4, Seq("id"), iters = 0)
    }
    assertThrows[IllegalArgumentException] {
      Linalg.ridgeProbe(one, "v", lit(true), 4, Seq("id"), lambda = -1.0)
    }
  }
}
