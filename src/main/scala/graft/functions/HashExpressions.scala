package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Input guard for the vector kernels: they read `ArrayData.getFloat`, so an
  * `array<double>` child silently misreads the underlying bytes (garbage
  * values, not an error). Fail analysis instead — callers cast explicitly.
  * (checkInputDataTypes, not ImplicitCastInputTypes: AbstractDataType is
  * private[sql] in Spark 4.1.) */
private[functions] object VecTypeCheck {
  def floatArray(fn: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<float>, got ${other.catalogString}")
  }
  def doubleArray(fn: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<double>, got ${other.catalogString}")
  }
  def both(a: TypeCheckResult, b: => TypeCheckResult): TypeCheckResult =
    if (a.isSuccess) b else a
}

/** Tight-loop kernels for the sketching expressions.
  *
  * The pure-Column formulations (aggregate/zip_with/transform chains) are
  * correct but interpreted — Spark's higher-order functions don't enter
  * whole-stage codegen, and the simhash form allocated two 64-slot arrays
  * per token. These static methods are what the codegen emits instead:
  * one call, zero allocation beyond the output. */
object GraftHashUtil {

  /** Memoized per-permutation seeds; fixed so signatures are stable across
    * sessions and rounds. */
  private val permCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def perms(n: Int): Array[Long] = {
    permCache.computeIfAbsent(n, _ => {
      val rng = new scala.util.Random(0x5eed)
      Array.fill(n)(rng.nextLong())
    })
  }

  /** MurmurHash3 64-bit finalizer — full avalanche. JVM arithmetic wraps, so
    * unlike the Column-expression world there is no ANSI overflow trap. */
  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** SimHash: sign-aggregate of token hashes into a 64-bit fingerprint. */
  def simhash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash banding: numHashes = bands·rowsPerBand independent permutations
    * of the element hashes (fmix64(h ^ seed_j) — full avalanche per family
    * member; an earlier affine-on-masked-bits family correlated across
    * permutations and admitted 50× the theoretical candidate count), minima
    * mixed per band into one bucket key. Returns `bands` longs. */
  def minhashBands(hashes: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val numHashes = bands * rowsPerBand
    val seeds = perms(numHashes)
    val n = hashes.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = fmix64(h ^ seeds(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L ^ b
      var r = 0
      while (r < rowsPerBand) {
        acc = acc * 31L + sig(b * rowsPerBand + r)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted DISTINCT 64-bit hashes of the character n-grams of a string —
    * the gram strings themselves never materialize (they cost 37s/5k docs as
    * interpreted substr+array_distinct). FNV-1a over chars + fmix64. */
  def ngramHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    val count = math.max(len - n + 1, 1)
    val raw = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        h ^= str.charAt(j)
        h *= 0x100000001b3L
        j += 1
      }
      raw(i) = fmix64(h)
      i += 1
    }
    java.util.Arrays.sort(raw)
    // in-place dedupe of the sorted array
    var w = 1
    var r = 1
    while (r < count) {
      if (raw(r) != raw(r - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }

  /** |A ∩ B| for two sorted long arrays. Balanced sizes take the linear
    * merge; when one side is ≫ larger (a document's gram set vs a broadcast
    * benchmark set), each small-side element binary-searches the big side —
    * O(min·log max) beats O(min+max) per row once max/min > ~32. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    if (na > nb) return sortedIntersectCount(b, a)
    if (na == 0) return 0L
    if (nb / na >= 32) {
      // binary-search path, constrained to the remaining suffix of b so a
      // sorted a still costs at most O(na·log nb)
      var c = 0L; var i = 0; var lo = 0
      while (i < na && lo < nb) {
        val x = a.getLong(i)
        var l = lo; var h = nb - 1
        while (l <= h) {
          val m = (l + h) >>> 1
          val v = b.getLong(m)
          if (v < x) l = m + 1
          else h = m - 1
        }
        if (l < nb && b.getLong(l) == x) { c += 1; lo = l + 1 }
        else lo = l
        i += 1
      }
      c
    } else {
      var i = 0; var j = 0; var c = 0L
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }
  }

  /** Sorted distinct 64-bit hashes of the k-word shingles of a string
    * (lowercased, whitespace-tokenized) — the word-level analog of
    * ngramHashes; shingle strings never materialize. */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString.toLowerCase
    // token boundaries without allocating token strings
    val len = str.length
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && Character.isWhitespace(str.charAt(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !Character.isWhitespace(str.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nTok - k + 1)
    var t = 0
    while (t <= nTok - k) {
      var h = 0xcbf29ce484222325L
      var w = 0
      while (w < k) {
        var j = starts.get(t + w)
        val e = ends.get(t + w)
        while (j < e) { h ^= str.charAt(j); h *= 0x100000001b3L; j += 1 }
        h ^= 0x1F; h *= 0x100000001b3L // token separator
        w += 1
      }
      out(t) = fmix64(h)
      t += 1
    }
    java.util.Arrays.sort(out)
    var w2 = 1
    var r2 = 1
    while (r2 < out.length) {
      if (out(r2) != out(r2 - 1)) { out(w2) = out(r2); w2 += 1 }
      r2 += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w2))
  }

  /** Memoized gaussian hyperplanes for the sketch kernel. */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  private def planesFor(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((nBits, dim, seed), _ => {
      val rng = new scala.util.Random(seed)
      Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
    })

  /** Sign-bit hyperplane sketch of a float vector, packed into a long. */
  def hyperplaneSketch(vec: ArrayData, nBits: Int, dim: Int, seed: Long): Long = {
    val ps = planesFor(nBits, dim, seed)
    val n = math.min(vec.numElements(), dim)
    var sk = 0L
    var b = 0
    while (b < nBits) {
      val p = ps(b)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += vec.getFloat(i) * p(i); i += 1 }
      if (dot >= 0) sk |= (1L << b)
      b += 1
    }
    sk
  }

  /** nTables independent sign-bit sketches in ONE pass over the vector —
    * the OR-amplification family for multi-table LSH (table t's planes are
    * seeded seed+t, so each table is an independent draw). One kernel call
    * per row instead of nTables expression evaluations. */
  def hyperplaneSketches(
      vec: ArrayData, nBits: Int, dim: Int, seed: Long, nTables: Int): ArrayData = {
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      out(t) = hyperplaneSketch(vec, nBits, dim, seed + t)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Per-language stopword sets for the native language-ID kernel (public
    * linguistic knowledge; mirrors TextAnalysis.stopwords). */
  private val langSets: Array[(String, java.util.HashSet[String])] = {
    def hs(ws: String*) = { val s = new java.util.HashSet[String](); ws.foreach(s.add); s }
    Array(
      "de" -> hs("der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit",
        "sich", "auf", "für", "nicht", "ein", "eine", "als", "auch", "es", "an"),
      "en" -> hs("the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
        "for", "on", "are", "with", "as", "his", "they", "at", "be", "this"),
      "es" -> hs("el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
        "es", "no", "por", "con", "para", "se", "del", "al", "lo", "como"),
      "fr" -> hs("le", "la", "les", "de", "des", "du", "et", "est", "un", "une",
        "dans", "que", "qui", "pour", "sur", "pas", "au", "avec", "ce", "il"),
      "it" -> hs("il", "la", "di", "e", "che", "in", "un", "una", "per", "non",
        "sono", "con", "si", "del", "le", "al", "come", "dei", "nel", "della"),
      "pt" -> hs("o", "a", "os", "as", "de", "e", "que", "em", "um", "uma",
        "não", "por", "com", "para", "se", "do", "da", "no", "na", "dos"))
  }

  private val und = UTF8String.fromString("und")
  private val langNames = langSets.map { case (n, _) => UTF8String.fromString(n) }

  /** Language ID: argmax stopword-hit ratio across the profiles, "und" below
    * the minimum-signal threshold. One tokenization pass, no allocation per
    * language. Ties break toward the alphabetically-first language (array
    * order), matching the column-expression formulation. */
  def langId(text: UTF8String, minScorePct: Int): UTF8String = {
    val s = text.toString.toLowerCase
    val counts = new Array[Int](langSets.length)
    var nTok = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        nTok += 1
        var l = 0
        while (l < langSets.length) {
          if (langSets(l)._2.contains(tok)) counts(l) += 1
          l += 1
        }
      }
    }
    if (nTok == 0) return und
    var best = -1
    var bestCount = -1
    var l = 0
    while (l < langSets.length) {
      if (counts(l) > bestCount) { bestCount = counts(l); best = l }
      l += 1
    }
    if (bestCount * 100 >= minScorePct * nTok && bestCount > 0) langNames(best) else und
  }

  /** xxhash64 (seed 42, Spark's xxhash64 builtin) of each whitespace token of
    * the lowercased trimmed text, in token order — bit-identical to
    * `transform(filter(split(lower(trim(text)), "\\s+"), _ =!= ""), xxhash64)`
    * but one static call instead of an interpreted HOF chain. */
  def tokenHashes(s: UTF8String): ArrayData = {
    val str = s.trim().toLowerCase.toString
    val len = str.length
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i < len) {
      while (i < len && isJavaRegexWs(str.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isJavaRegexWs(str.charAt(i))) i += 1
        val tok = UTF8String.fromString(str.substring(start, i))
        out.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          tok.getBaseObject, tok.getBaseOffset, tok.numBytes(), 42L))
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** FNV-1a-over-chars + fmix64 of each whitespace token of lower(trim(s)),
    * in token order (multiset — simhash votes per occurrence). Same tokenizer
    * as [[tokenHashes]] but an ORACLE-REPLAYABLE hash family: FNV's
    * xor-multiply loop and the fmix64 finalizer replay exactly in DuckDB
    * (UBIGINT xor/shift + 32-bit-split HUGEINT multiply mod 2^64), unlike
    * xxhash64's length-dependent lanes — so simhash fingerprints built from
    * these hashes can be verified end-to-end by the SQL oracle. Avalanche
    * quality is equivalent for sketching (fmix64 is full-avalanche). */
  def tokenHashesFnv(s: UTF8String): ArrayData = {
    val str = s.trim().toLowerCase.toString
    val len = str.length
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i < len) {
      while (i < len && isJavaRegexWs(str.charAt(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && !isJavaRegexWs(str.charAt(i))) {
          h ^= str.charAt(i); h *= 0x100000001b3L
          i += 1
        }
        out.add(fmix64(h))
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Java regex `\s` (ASCII whitespace incl. vertical tab) — the split
    * semantics of the Column formulation being replaced. */
  @inline private def isJavaRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** FNV-1a+fmix64 hashes of the unigrams AND adjacent bigrams of
    * lower(trim(s)) — the DSIR feature stream — in ONE scan with zero gram
    * strings materialized. A bigram "a b" hashes as the FNV chain over its
    * exact characters (single-space joined), continued from the previous
    * token's unfinalized state, so it equals tokenHashesFnv-style
    * fnv("a b") and replays in DuckDB HUGEINT like the rest of the FNV
    * family. Output: n unigram hashes followed by n-1 bigram hashes. */
  def gramHashesFnv(s: UTF8String): ArrayData = {
    val str = s.trim().toLowerCase.toString
    val len = str.length
    val uni = new java.util.ArrayList[java.lang.Long]()
    val bi = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    var prevState = 0L
    var hasPrev = false
    while (i < len) {
      while (i < len && isJavaRegexWs(str.charAt(i))) i += 1
      if (i < len) {
        val start = i
        var h = 0xcbf29ce484222325L
        while (i < len && !isJavaRegexWs(str.charAt(i))) {
          h ^= str.charAt(i); h *= 0x100000001b3L
          i += 1
        }
        val end = i
        uni.add(fmix64(h))
        if (hasPrev) {
          var hb = prevState
          hb ^= ' '; hb *= 0x100000001b3L
          var j = start
          while (j < end) { hb ^= str.charAt(j); hb *= 0x100000001b3L; j += 1 }
          bi.add(fmix64(hb))
        }
        prevState = h
        hasPrev = true
      }
    }
    val arr = new Array[Long](uni.size() + bi.size())
    var k = 0
    var j = 0
    while (j < uni.size()) { arr(k) = uni.get(j); k += 1; j += 1 }
    j = 0
    while (j < bi.size()) { arr(k) = bi.get(j); k += 1; j += 1 }
    new GenericArrayData(arr)
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local fingerprinting scheme): hash every char k-gram of the
    * whitespace-normalized lowercase string (FNV-1a+fmix64, positional,
    * NOT deduped), slide a window of `w` consecutive gram hashes, select
    * the minimum hash of each window, and return the SORTED DISTINCT
    * selected values. Guarantee: any shared substring of length ≥ w+k-1
    * yields at least one shared fingerprint, while only ~2/(w+1) of grams
    * are kept. Emitting distinct VALUES makes the tie-break question moot
    * (equal minima select the same value), so the set replays exactly in
    * SQL. */
  def winnowHashes(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.trim().toLowerCase.toString.replaceAll("\\s+", " ")
    val len = str.length
    val nGrams = len - k + 1
    if (nGrams < 1) return new GenericArrayData(Array.emptyLongArray)
    val g = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = i + k
      while (j < end) { h ^= str.charAt(j); h *= 0x100000001b3L; j += 1 }
      g(i) = fmix64(h)
      i += 1
    }
    val nWin = math.max(nGrams - w + 1, 1)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p < nWin) {
      var m = g(p)
      var q = p + 1
      val end = math.min(p + w, nGrams)
      while (q < end) { if (g(q) < m) m = g(q); q += 1 }
      sel.add(m)
      p += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  /** Dot product of two float vectors in double, left-to-right accumulation —
    * the same summation order as the interpreted zip_with/aggregate chain and
    * DuckDB's list_dot_product, so results stay bit-comparable to the oracle.
    * One fused loop; no per-pair allocation. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** L2 norm of a float vector (double accumulation). */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  /** Cosine similarity — dot/(‖a‖·‖b‖), all in one native pass. Callers on a
    * many-pairs-per-row path should prefer hoisting `norm` into per-row
    * columns and dividing a `dot` instead (saves 2/3 of the flops). */
  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance between a float vector and a double vector (used for
    * centroid probing in the IVF quantizer). */
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Dot product between a float vector and a double vector — the
    * projection kernel for driver-trained linear models (PCA components,
    * ridge-probe weights), whose coefficients are doubles while the corpus
    * column stays float. Same i-ascending fold as `dot`, so the result
    * stays bit-comparable to DuckDB's list_dot_product over the
    * double-widened embedding and the SQL-recomputed coefficient list. */
  def dotFd(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Index of the L2-nearest centroid — the IVF assignment loop, one fused
    * pass over k centroids per row (no per-centroid join/explosion). */
  def nearestCentroid(vec: ArrayData, cents: Array[Array[Double]]): Int = {
    val n = vec.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var d = 0.0
      var i = 0
      while (i < m) {
        val diff = vec.getFloat(i).toDouble - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Sorted distinct copy of a long array (for word-shingle hash sets). */
  def sortDistinct(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val arr = a.toLongArray()
    java.util.Arrays.sort(arr)
    var w = 1
    var r = 1
    while (r < n) {
      if (arr(r) != arr(r - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }
}

/** `graft_simhash64(array<bigint>) → bigint` */
case class GraftSimhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.simhash64($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftSimhash64 =
    copy(child = newChild)
}

/** `graft_minhash_bands(array<bigint>, bands, rowsPerBand) → array<bigint>` —
  * band/row counts must be literals (resolved at plan time). */
case class GraftMinhashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.minhashBands(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.minhashBands($c, $bands, $rowsPerBand)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftMinhashBands =
    copy(child = newChild)
}

/** `graft_ngram_hashes(string, n) → array<bigint>` — sorted distinct char
  * n-gram hashes; n must be a literal. */
case class GraftNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.ngramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.ngramHashes($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftNgramHashes =
    copy(child = newChild)
}

/** `graft_intersect_count(array<bigint>, array<bigint>) → bigint` over
  * SORTED arrays (linear merge). */
case class GraftSortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_intersect_count"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    GraftHashUtil.sortedIntersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$util.sortedIntersectCount($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftSortedIntersectCount =
    copy(left = l, right = r)
}

/** `graft_shingle_hashes(string, k) → array<bigint>` — sorted distinct
  * k-word shingle hashes; k must be a literal. */
case class GraftShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.shingleHashes($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftShingleHashes =
    copy(child = newChild)
}

/** `graft_hyperplane_sketch(array<float>, nBits, dim, seed) → bigint` —
  * deterministic gaussian-hyperplane sign sketch. */
case class GraftHyperplaneSketch(child: Expression, nBits: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hyperplane_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.hyperplaneSketch(input.asInstanceOf[ArrayData], nBits, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.hyperplaneSketch($c, $nBits, $dim, ${seed}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftHyperplaneSketch =
    copy(child = newChild)
}

/** `graft_hyperplane_sketches(array<float>, nBits, dim, seed, nTables)
  * → array<bigint>` — one sketch per LSH table, all in one pass. */
case class GraftHyperplaneSketches(
    child: Expression, nBits: Int, dim: Int, seed: Long, nTables: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hyperplane_sketches"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.hyperplaneSketches(input.asInstanceOf[ArrayData], nBits, dim, seed, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.hyperplaneSketches($c, $nBits, $dim, ${seed}L, $nTables)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftHyperplaneSketches =
    copy(child = newChild)
}

/** `graft_lang_id(string, minScorePct) → string` — native stopword-profile
  * language ID. */
case class GraftLangId(child: Expression, minScorePct: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lang_id"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.langId(input.asInstanceOf[UTF8String], minScorePct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.langId($c, $minScorePct)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftLangId =
    copy(child = newChild)
}

/** `graft_token_hashes(string) → array<bigint>` — xxhash64 (seed 42) of each
  * whitespace token of lower(trim(s)), in order. */
case class GraftTokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.tokenHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.tokenHashes($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftTokenHashes =
    copy(child = newChild)
}

/** `graft_token_hashes_fnv(string) → array<bigint>` — oracle-replayable
  * FNV-1a+fmix64 token hashes (see GraftHashUtil.tokenHashesFnv). */
case class GraftTokenHashesFnv(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_hashes_fnv"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.tokenHashesFnv(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.tokenHashesFnv($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftTokenHashesFnv =
    copy(child = newChild)
}

/** `graft_dot(array<float>, array<float>) → double` — fused dot product. */
case class GraftDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.floatArray(prettyName, left.dataType),
      VecTypeCheck.floatArray(prettyName, right.dataType))

  override protected def nullSafeEval(l: Any, r: Any): Any =
    GraftHashUtil.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$util.dot($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftDot =
    copy(left = l, right = r)
}

/** `graft_norm(array<float>) → double` — L2 norm. */
case class GraftNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.norm($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftNorm =
    copy(child = newChild)
}

/** `graft_cosine(array<float>, array<float>) → double` — one-pass native
  * cosine similarity. */
case class GraftCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.floatArray(prettyName, left.dataType),
      VecTypeCheck.floatArray(prettyName, right.dataType))

  override protected def nullSafeEval(l: Any, r: Any): Any =
    GraftHashUtil.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$util.cosine($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftCosine =
    copy(left = l, right = r)
}

/** `graft_l2sq(array<float>, array<double>) → double` — squared L2 distance
  * (centroid probing). */
case class GraftL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.floatArray(prettyName, left.dataType),
      VecTypeCheck.doubleArray(prettyName, right.dataType))

  override protected def nullSafeEval(l: Any, r: Any): Any =
    GraftHashUtil.l2sq(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$util.l2sq($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftL2Sq =
    copy(left = l, right = r)
}

/** `graft_dot_fd(array<float>, array<double>) → double` — dot product of a
  * float corpus vector with a double coefficient vector (linear-model
  * scoring: PCA projection, ridge-probe logits). */
case class GraftDotFd(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_fd"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.both(VecTypeCheck.floatArray(prettyName, left.dataType),
      VecTypeCheck.doubleArray(prettyName, right.dataType))

  override protected def nullSafeEval(l: Any, r: Any): Any =
    GraftHashUtil.dotFd(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$util.dotFd($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftDotFd =
    copy(left = l, right = r)
}

/** `graft_nearest_centroid(array<float>, array<array<double>> literal) → int`
  * — IVF cell assignment. The centroid matrix is a FOLDABLE literal (the
  * quantizer is trained before the plan is built), extracted once at
  * function-resolution time and carried on the node, so the generated code
  * references one shared double[][] instead of re-evaluating a nested-array
  * literal per row. */
case class GraftNearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatArray(prettyName, child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.nearestCentroid(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.nearestCentroid($c, $cents)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftNearestCentroid =
    copy(child = newChild)
}

/** `graft_sort_distinct(array<bigint>) → array<bigint>` */
case class GraftSortDistinct(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sort_distinct"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.sortDistinct(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.sortDistinct($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftSortDistinct =
    copy(child = newChild)
}

/** `graft_mix64(h, a, b) → bigint` — wrapping h·a + b mod 2⁶⁴ (Java long
  * semantics: deliberately exempt from ANSI overflow checks — the wrap IS
  * the hash). The Knuth multiplicative row-hash step of the count-min
  * sketch; replays in DuckDB as 32-bit-split HUGEINT arithmetic (see the
  * x46 oracle in OperatorQueries). */
case class GraftMix64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override protected def nullSafeEval(h: Any, a: Any, b: Any): Any =
    h.asInstanceOf[Long] * a.asInstanceOf[Long] + b.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, a, b) => s"($h * $a + $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GraftMix64 =
    copy(first = f, second = s, third = t)
}

/** `graft_gram_hashes_fnv(string) → array<bigint>` — oracle-replayable
  * FNV-1a+fmix64 hashes of unigrams + adjacent bigrams in one scan
  * (see GraftHashUtil.gramHashesFnv; the DSIR feature kernel). */
case class GraftGramHashesFnv(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_hashes_fnv"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.gramHashesFnv(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.gramHashesFnv($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftGramHashesFnv =
    copy(child = newChild)
}

/** `graft_winnow_hashes(string, k, w) → array<bigint>` — sorted distinct
  * winnowing fingerprints (see GraftHashUtil.winnowHashes). */
case class GraftWinnowHashes(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftHashUtil.winnowHashes(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftHashUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.winnowHashes($c, $k, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftWinnowHashes =
    copy(child = newChild)
}
