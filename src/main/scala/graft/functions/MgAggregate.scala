package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_mg_topk(term string, capacity int) → array<struct<term,count>>` —
  * Misra–Gries frequent-items summary (Misra & Gries 1982; merge rule from
  * Agarwal et al. 2013, "Mergeable summaries") as a bounded-state
  * TypedImperativeAggregate. The aggregation state is AT MOST `capacity`
  * (term, counter) pairs no matter how many distinct terms the group
  * holds; partial states merge by pointwise count sum followed by the
  * subtract-(capacity+1)-th-largest step, so every exchange moves ≤
  * capacity entries per (group × partition). That bounded state is the
  * whole point at 100 TB: the exact per-term aggregation this replaces
  * shuffles the full vocabulary, this shuffles a constant.
  *
  * Guarantee (classic MG): every surviving term's estimate satisfies
  * true − n/(capacity+1) ≤ est ≤ true, and any term with true count
  * > n/(capacity+1) is guaranteed present. When the group's distinct-term
  * count never exceeds `capacity` (so no decrement ever fires — in any
  * partial OR any merge, which is implied by global distinct ≤ capacity),
  * the summary is EXACT and independent of partitioning — the property
  * the x93 oracle keys on.
  *
  * Output: all surviving entries, sorted (count DESC, term ASC) — a
  * deterministic order so downstream explode/top-k slices replay in SQL.
  * Null terms are ignored (SQL aggregate convention).
  */
case class GraftMgTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(capacity >= 1, "graft_mg_topk needs capacity >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg_topk expects a string term column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_topk"

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buffer: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.toString
      val cur = buffer.get(term)
      if (cur != null) buffer.put(term, java.lang.Long.valueOf(cur.longValue() + 1L))
      else if (buffer.size < capacity) buffer.put(term, java.lang.Long.valueOf(1L))
      else {
        // MG decrement step: every counter down one, zeros evicted; the
        // arriving term is absorbed by the decrement (classic rule).
        // O(capacity), amortized O(1) per arrival (each decrement round
        // pays for ≥ capacity+1 prior arrivals).
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey,
        if (cur == null) e.getValue
        else java.lang.Long.valueOf(cur.longValue() + e.getValue.longValue()))
    }
    if (buffer.size > capacity) {
      // Agarwal et al. merge: subtract the (capacity+1)-th largest count
      // from every entry, drop the non-positive — restores ≤ capacity
      // entries while preserving the MG undercount guarantee.
      val counts = new Array[Long](buffer.size)
      var i = 0
      val cit = buffer.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buffer.size - capacity - 1) // (capacity+1)-th largest
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(String, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    java.util.Arrays.sort(entries, (a: (String, Long), b: (String, Long)) => {
      val c = java.lang.Long.compare(b._2, a._2)
      // Tie-break in UTF-8 binary order (SQL ORDER BY semantics), NOT
      // String.compareTo's UTF-16 code-unit order — supplementary-plane
      // characters sort differently between the two, and the DuckDB oracle
      // replays this ordering.
      if (c != 0) c
      else UTF8String.fromString(a._1).binaryCompare(UTF8String.fromString(b._1))
    })
    val rows = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) {
      rows(i) = InternalRow(UTF8String.fromString(entries(i)._1), entries(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val sit = buffer.entrySet().iterator()
    val items = new java.util.ArrayList[(Array[Byte], Long)](buffer.size)
    while (sit.hasNext) {
      val e = sit.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items.add((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.size())
    var i = 0
    while (i < items.size()) {
      val (b, c) = items.get(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      out.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftMgTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftMgTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftMgTopK =
    copy(child = newChildren.head)
}
