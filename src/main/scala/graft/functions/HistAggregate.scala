package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** `graft_hist(value double, lo, hi, nBins) → array<long>[nBins + 2]` —
  * fixed-grid histogram as a bounded-state TypedImperativeAggregate: the
  * quantile-sketch member of the bounded-state kernel family (KMV for
  * distincts, MG for heavy hitters, CMS for point frequencies — this one
  * for medians/quantiles, the sketch d38's MAD report needs to stream).
  *
  * State is EXACTLY nBins + 2 longs per (group × partition) — cell 0
  * counts values < lo (underflow), cells 1..nBins the half-open grid
  * [lo + (i−1)·w, lo + i·w) with w = (hi−lo)/nBins, cell nBins+1 values
  * ≥ hi (overflow). Merge is pointwise sum, so partials map-side-combine
  * and the exchange moves a constant per (group × partition); the same
  * buffer IS the Structured Streaming aggregation state (StreamingMad).
  *
  * Determinism contract: the cell index is 1 + floor((x − lo)/w) in
  * binary64 — one subtraction, one division, one floor, each a correctly
  * rounded IEEE op — so the histogram (and every quantile walked from it)
  * replays bit-exactly in DuckDB integer/double arithmetic. Unlike
  * approx_percentile's GK sketch, the result is independent of row order
  * AND partitioning, which is what makes the batch/streaming parity and
  * the SQL oracle possible. Accuracy: any quantile is exact up to grid
  * resolution w (the classic equi-width histogram bound); pick lo/hi from
  * domain knowledge, not the data, to keep the plan one-pass.
  *
  * Null values are ignored (SQL aggregate convention); NaN goes to
  * overflow (NaN comparisons are false, so `< lo` and `< hi` both fail).
  */
case class GraftHistAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(nBins >= 1 && nBins <= 65536,
    "graft_hist needs nBins in [1, 65536] (the state is nBins + 2 longs)")
  require(lo < hi, s"graft_hist needs lo < hi, got [$lo, $hi)")

  private val width = (hi - lo) / nBins

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hist expects a numeric value column, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hist"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBins + 2)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case other => other.toString.toDouble
      }
      val idx =
        if (x < lo) 0
        else if (x < hi) {
          // fp guard: x just below hi can still floor to nBins after the
          // divide — clamp into the last real cell
          val i = 1 + math.floor((x - lo) / width).toInt
          if (i > nBins) nBins else i
        } else nBins + 1 // ≥ hi and NaN
      buffer(idx) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftHistAgg =
    copy(child = newChildren.head)
}
