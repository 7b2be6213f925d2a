package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `graft_gram_agg(vec array<float>, y double, dim) → array<double>` —
  * one-pass second-moment (Gram) matrix + target cross-moments as a
  * bounded-state TypedImperativeAggregate: the linear-algebra member of
  * the bounded-state kernel family (KMV for distincts, MG for heavy
  * hitters, CMS for point frequencies, HIST for quantiles — this one for
  * covariance/PCA/ridge, where every linear model trainable from
  * sufficient statistics needs exactly these sums).
  *
  * State is EXACTLY 3 + 2·dim + dim·(dim+1)/2 longs per
  * (group × partition) — for dim = 64 that is 2,211 longs (~17 KB),
  * constant in corpus size. Merge is pointwise integer sum, so partials
  * map-side combine and the exchange moves one fixed-size array per
  * partition: the 100 TB plan for X'X is a single scan, no explode, no
  * shuffle of rows.
  *
  * Output layout (flat array<double>, d = dim):
  *   [0]                         n            (row count)
  *   [1 .. d]                    Σ xᵢ         (feature sums)
  *   [d+1 .. d+d(d+1)/2]         Σ xᵢ·xⱼ      (upper triangle, row-major:
  *                                             (i,j) i ≤ j at
  *                                             d + 1 + i·d − i(i−1)/2 + (j−i))
  *   [.. + d]                    Σ xᵢ·y       (target cross-moments)
  *   [size−2]                    Σ y
  *   [size−1]                    Σ y²
  *
  * Determinism contract — the PageRank pattern, applied to moments: every
  * per-row contribution is quantized to the fixed 2⁻²⁰ grid BEFORE
  * summation (q(v) = ⌊v·2²⁰ + 0.5⌋, a pure correctly-rounded binary64
  * function of the input row alone), and the state accumulates the
  * resulting longs with overflow-checked integer adds. Integer addition
  * is associative and commutative, so the buffer is BIT-IDENTICAL under
  * any partitioning, merge order, or AQE re-plan — no "quantize after the
  * sum and hope no moment lands on a rounding boundary". `eval` converts
  * once: slot 0 as the raw count, every other slot as q/2²⁰ (exact while
  * |Σq| < 2⁵³ ≈ 8.8e12 unit-magnitude rows; past that the single
  * long→double conversion rounds, identically on every run). The oracle
  * replays the identical grid in SQL (`floor(x·1048576 + 0.5)::BIGINT`
  * summed exactly), so cross-engine equality is by construction, not by
  * boundary luck. Grid loss is ≤ 2⁻²¹ per normalized moment — invisible
  * at the 6-dp consumption contract (Linalg rounds every sum/n to 6
  * decimals, the x56 centroid contract). Rows with a null vector or null
  * y are ignored; vectors whose length ≠ dim raise (a silent skip would
  * desynchronize the oracle).
  */
case class GraftGramAgg(
    vec: Expression,
    y: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 512,
    "graft_gram_agg needs dim in [1, 512] (state is O(dim^2) longs)")

  private val size = 3 + 2 * dim + dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(vec, y)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => y.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_agg expects a double target column, got ${other.sql}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_agg expects array<float> features, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    val yv = y.eval(input)
    if (v != null && yv != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == dim,
        s"graft_gram_agg: vector length ${a.numElements()} != dim $dim")
      val yd = yv.asInstanceOf[Double]
      buffer(0) += 1L
      var i = 0
      var p = 1 + dim // upper-triangle cursor
      while (i < dim) {
        val xi = a.getFloat(i).toDouble
        buffer(1 + i) = Math.addExact(buffer(1 + i), GraftGramAgg.quantize(xi))
        val syIdx = 1 + dim + dim * (dim + 1) / 2 + i
        buffer(syIdx) = Math.addExact(buffer(syIdx), GraftGramAgg.quantize(xi * yd))
        var j = i
        while (j < dim) {
          buffer(p) = Math.addExact(buffer(p),
            GraftGramAgg.quantize(xi * a.getFloat(j).toDouble))
          p += 1
          j += 1
        }
        i += 1
      }
      buffer(size - 2) = Math.addExact(buffer(size - 2), GraftGramAgg.quantize(yd))
      buffer(size - 1) = Math.addExact(buffer(size - 1), GraftGramAgg.quantize(yd * yd))
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { buffer(i) = Math.addExact(buffer(i), other(i)); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = new Array[Double](size)
    out(0) = buffer(0).toDouble
    var i = 1
    while (i < size) { out(i) = buffer(i).toDouble / GraftGramAgg.Scale; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * size)
    var i = 0
    while (i < size) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftGramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftGramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftGramAgg =
    copy(vec = newChildren.head, y = newChildren(1))
}

object GraftGramAgg {
  /** The fixed-point grid: 2²⁰ units per 1.0. SQL twin:
    * `floor(x * 1048576.0 + 0.5)::BIGINT`. */
  val Scale: Double = 1048576.0

  /** Per-row quantization q(v) = ⌊v·2²⁰ + 0.5⌋ — a pure function of the
    * row value (correctly-rounded IEEE mul/add/floor, identical in any
    * binary64 engine), so summed contributions are partitioning-free. */
  def quantize(v: Double): Long = math.floor(v * Scale + 0.5).toLong

  /** Upper-triangle flat index of (i, j), i ≤ j, within the layout above. */
  def triIndex(dim: Int, i: Int, j: Int): Int =
    1 + dim + i * dim - i * (i - 1) / 2 + (j - i)
}
