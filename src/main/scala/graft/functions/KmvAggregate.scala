package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

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

  /** Insert one draw, keeping only the k smallest distinct values —
    * the whole trick: a draw larger than the current k-th smallest is
    * dropped on arrival, so the state can never exceed k entries. */
  private def add(
      buffer: java.util.TreeSet[java.lang.Double],
      v: Double): java.util.TreeSet[java.lang.Double] = {
    if (buffer.size < k) buffer.add(v)
    else if (v < buffer.last()) { if (buffer.add(v)) buffer.pollLast() }
    buffer
  }

  override def update(
      buffer: java.util.TreeSet[java.lang.Double],
      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v == null) buffer else add(buffer, v.asInstanceOf[Double])
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Double],
      other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    var done = false
    while (it.hasNext && !done) {
      val v = it.next()
      // `other` iterates ascending; once one of its draws is rejected,
      // every later one would be too
      if (buffer.size == k && v >= buffer.last()) done = true
      else add(buffer, v)
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Double]): Any =
    if (buffer.size < k) buffer.size.toDouble
    else (k - 1).toDouble / buffer.last()

  override def serialize(buffer: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Double]()
    var i = 0
    while (i < n) { out.add(bb.getDouble); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftKmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftKmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftKmvAgg =
    copy(child = newChildren.head)
}
