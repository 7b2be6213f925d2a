package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Shared k-minimum-values buffer mechanics: a sorted set of at most `k`
  * distinct draws, map-side combinable, merged by union-then-retake-bottom-k.
  * Both KMV aggregates (scalar estimate and sketch array) share these so the
  * estimate and the sketch are guaranteed to see the identical state. */
private[functions] object KmvBuffer {

  /** Insert one draw, keeping only the k smallest distinct values — the
    * whole trick: a draw larger than the current k-th smallest is dropped
    * on arrival, so the state can never exceed k entries. */
  def add(
      buffer: java.util.TreeSet[java.lang.Double],
      v: Double,
      k: Int): Unit = {
    if (buffer.size < k) buffer.add(v)
    else if (v < buffer.last()) { if (buffer.add(v)) buffer.pollLast() }
  }

  def merge(
      buffer: java.util.TreeSet[java.lang.Double],
      other: java.util.TreeSet[java.lang.Double],
      k: Int): java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    var done = false
    while (it.hasNext && !done) {
      val v = it.next()
      // `other` iterates ascending; once one of its draws is rejected,
      // every later one would be too
      if (buffer.size == k && v >= buffer.last()) done = true
      else add(buffer, v, k)
    }
    buffer
  }

  def serialize(buffer: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Double]()
    var i = 0
    while (i < n) { out.add(bb.getDouble); i += 1 }
    out
  }
}

/** `graft_kmv_agg(u double, k int) → double` — the KMV (k-minimum-values)
  * distinct-count estimate over a stream of uniform hash draws, as a
  * TRUE bounded sketch: the aggregation state is a sorted set of at most
  * `k` distinct draws (Bar-Yossef et al. 2002), never the full distinct
  * set. Partial states are k-bounded, merge is "union then re-take the
  * bottom k", so the shuffle moves ≤ k doubles per (group × partition)
  * regardless of how many distinct keys the group holds — the property
  * that makes the sketch the right plan at 100 TB, where the previous
  * row_number-over-a-window formulation sorted every distinct hash.
  *
  * Estimate contract (bit-compatible with the x82 DuckDB replay): fewer
  * than k distinct draws seen → the state IS the exact distinct count;
  * otherwise (k−1)/u_k with u_k the k-th smallest draw. Draw generation
  * stays the caller's job (Sketches.kmvDistinct derives them from md5),
  * so the same aggregate serves any deterministic draw family. Null
  * draws are ignored (SQL aggregate convention).
  */
case class GraftKmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]] {

  require(k >= 2, "graft_kmv_agg needs k >= 2")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[DoubleType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_agg expects a double draw column, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_agg"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Double],
      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) KmvBuffer.add(buffer, v.asInstanceOf[Double], k)
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Double],
      other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] =
    KmvBuffer.merge(buffer, other, k)

  override def eval(buffer: java.util.TreeSet[java.lang.Double]): Any =
    if (buffer.size < k) buffer.size.toDouble
    else (k - 1).toDouble / buffer.last()

  override def serialize(buffer: java.util.TreeSet[java.lang.Double]): Array[Byte] =
    KmvBuffer.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftKmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftKmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftKmvAgg =
    copy(child = newChildren.head)
}

/** `graft_kmv_sketch_agg(u double, k int) → array<double>` — the KMV state
  * itself (the at-most-k smallest distinct draws, ascending) instead of the
  * collapsed estimate. This is the MERGEABLE form a sketch store needs:
  * per-partition sketches written today union with tomorrow's, and — the
  * x87 use — two groups' sketches combine into union / intersection /
  * Jaccard ESTIMATES without ever revisiting the raw keys (Beyer et al.
  * 2007, "On synopses for distinct-value estimation under multiset
  * operations"). Same bounded-state economics as graft_kmv_agg: ≤ k
  * doubles per (group × partition) through every exchange. */
case class GraftKmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]] {

  require(k >= 2, "graft_kmv_sketch_agg needs k >= 2")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[DoubleType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_sketch_agg expects a double draw column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch_agg"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Double],
      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) KmvBuffer.add(buffer, v.asInstanceOf[Double], k)
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Double],
      other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] =
    KmvBuffer.merge(buffer, other, k)

  override def eval(buffer: java.util.TreeSet[java.lang.Double]): Any = {
    val out = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().doubleValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Double]): Array[Byte] =
    KmvBuffer.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftKmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftKmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftKmvSketchAgg =
    copy(child = newChildren.head)
}
