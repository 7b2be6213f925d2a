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
  * State is EXACTLY 3 + 2·dim + dim·(dim+1)/2 doubles per
  * (group × partition) — for dim = 64 that is 2,211 doubles (~17 KB),
  * constant in corpus size. Merge is pointwise sum, so partials map-side
  * combine and the exchange moves one fixed-size array per partition: the
  * 100 TB plan for X'X is a single scan, no explode, no shuffle of rows.
  *
  * Output layout (flat array, d = dim):
  *   [0]                         n            (row count as double)
  *   [1 .. d]                    Σ xᵢ         (feature sums)
  *   [d+1 .. d+d(d+1)/2]         Σ xᵢ·xⱼ      (upper triangle, row-major:
  *                                             (i,j) i ≤ j at
  *                                             d + 1 + i·d − i(i−1)/2 + (j−i))
  *   [.. + d]                    Σ xᵢ·y       (target cross-moments)
  *   [size−2]                    Σ y
  *   [size−1]                    Σ y²
  *
  * Determinism contract: the raw sums are fp-order-dependent (Spark's
  * partitioning differs from any oracle's scan order), so consumers must
  * quantize before use — Linalg rounds every normalized moment (sum/n) to
  * 6 decimals, the same contract x56's centroids use. Downstream driver
  * iterations (power iteration, gradient descent) then run on identical
  * binary64 inputs in both engines. Rows with a null vector or null y are
  * ignored; vectors whose length ≠ dim raise (a silent skip would
  * desynchronize the oracle).
  */
case class GraftGramAgg(
    vec: Expression,
    y: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1 && dim <= 512,
    "graft_gram_agg needs dim in [1, 512] (state is O(dim^2) doubles)")

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

  override def createAggregationBuffer(): Array[Double] = new Array[Double](size)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    val yv = y.eval(input)
    if (v != null && yv != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == dim,
        s"graft_gram_agg: vector length ${a.numElements()} != dim $dim")
      val yd = yv.asInstanceOf[Double]
      buffer(0) += 1.0
      var i = 0
      var p = 1 + dim // upper-triangle cursor
      while (i < dim) {
        val xi = a.getFloat(i).toDouble
        buffer(1 + i) += xi
        buffer(1 + dim + dim * (dim + 1) / 2 + i) += xi * yd
        var j = i
        while (j < dim) {
          buffer(p) += xi * a.getFloat(j).toDouble
          p += 1
          j += 1
        }
        i += 1
      }
      buffer(size - 2) += yd
      buffer(size - 1) += yd * yd
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * size)
    var i = 0
    while (i < size) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
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
  /** Upper-triangle flat index of (i, j), i ≤ j, within the layout above. */
  def triIndex(dim: Int, i: Int, j: Int): Int =
    1 + dim + i * dim - i * (i - 1) / 2 + (j - i)
}
