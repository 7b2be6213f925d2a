package graft.detect

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, NumericType, StructType}

import graft.model.ColumnProfile

/** One-pass whole-table profiler (SURVEY §2-D note / §7: the optional custom
  * aggregate): a single `Aggregator` computes min/max/mean/std/missing,
  * distinct estimate AND top-k values for EVERY column in ONE scan with one
  * tiny final merge — where the default Profiler costs one wide agg pass
  * plus a melt shuffle.
  *
  * Buffer design, per column:
  *   - numeric moments (count/sum/sumsq/min/max) — exact;
  *   - missing count — exact;
  *   - top values: bounded frequency map with Misra-Gries-style eviction
  *     (capacity trackCapacity ≫ topK) — exact for heavy hitters whose
  *     frequency exceeds n/capacity, which is what a profile's "top values"
  *     means; the same guarantee family the reference's profile relies on;
  *   - distinct: EXACT while the frequency map has never evicted (it then
  *     holds every value seen — cardinality ≤ trackCapacity); past that,
  *     linear-counting over a fixed 4096-bit hash bitmap (cheap, ±few-% at
  *     profile scale; swap for HLL via approx_count_distinct when exact
  *     counts matter at high cardinality).
  *
  * At 100 TB this is the profiler to use: one scan, partial buffers merge
  * associatively on the map side, nothing proportional to row count crosses
  * the shuffle. */
object OnePassProfiler {

  private val BitmapBits = 4096

  final case class ColBuf(
      var count: Long = 0L,
      var missing: Long = 0L,
      var sum: Double = 0.0,
      var sumSq: Double = 0.0,
      var min: Double = Double.PositiveInfinity,
      var max: Double = Double.NegativeInfinity,
      var numeric: Boolean = false,
      var evicted: Boolean = false,
      tops: mutable.Map[String, Long] = mutable.Map.empty,
      bitmap: Array[Long] = new Array[Long](BitmapBits / 64))

  final case class Buf(cols: mutable.ArrayBuffer[ColBuf])

  final class ProfileAgg(schema: StructType, topK: Int, trackCapacity: Int)
      extends Aggregator[Row, Buf, Map[String, ColumnProfile]] {

    private val numericIdx: Array[Boolean] = schema.fields.map(f =>
      f.dataType.isInstanceOf[NumericType] || f.dataType == BooleanType)

    override def zero: Buf =
      Buf(mutable.ArrayBuffer.fill(schema.length)(ColBuf()))

    private def addTop(cb: ColBuf, v: String): Unit = {
      cb.tops.get(v) match {
        case Some(n) => cb.tops(v) = n + 1
        case None if cb.tops.size < trackCapacity => cb.tops(v) = 1L
        case None =>
          // Misra-Gries decrement: shrink all, drop zeros — heavy hitters survive
          cb.evicted = true
          val dead = mutable.ArrayBuffer.empty[String]
          cb.tops.keysIterator.foreach { k =>
            val n = cb.tops(k) - 1
            if (n <= 0) dead += k else cb.tops(k) = n
          }
          dead.foreach(cb.tops.remove)
      }
    }

    private def mark(cb: ColBuf, v: String): Unit = {
      val h = scala.util.hashing.MurmurHash3.stringHash(v) & (BitmapBits - 1)
      cb.bitmap(h >> 6) |= (1L << (h & 63))
    }

    override def reduce(b: Buf, row: Row): Buf = {
      var i = 0
      while (i < schema.length) {
        val cb = b.cols(i)
        if (row.isNullAt(i)) cb.missing += 1
        else {
          cb.count += 1
          val s = String.valueOf(row.get(i))
          addTop(cb, s)
          mark(cb, s)
          if (numericIdx(i)) {
            cb.numeric = true
            val d = row.get(i) match {
              case b1: Boolean => if (b1) 1.0 else 0.0
              case n: Number => n.doubleValue()
              case _ => Double.NaN
            }
            cb.sum += d; cb.sumSq += d * d
            if (d < cb.min) cb.min = d
            if (d > cb.max) cb.max = d
          }
        }
        i += 1
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < a.cols.length) {
        val x = a.cols(i); val y = b.cols(i)
        x.count += y.count; x.missing += y.missing
        x.sum += y.sum; x.sumSq += y.sumSq
        x.numeric ||= y.numeric
        x.evicted ||= y.evicted
        if (y.min < x.min) x.min = y.min
        if (y.max > x.max) x.max = y.max
        y.tops.foreach { case (k, n) => x.tops(k) = x.tops.getOrElse(k, 0L) + n }
        if (x.tops.size > trackCapacity) {
          // keep the heaviest trackCapacity entries after a merge
          x.evicted = true
          val keep = x.tops.toSeq.sortBy { case (k, n) => (-n, k) }.take(trackCapacity)
          x.tops.clear(); keep.foreach { case (k, n) => x.tops(k) = n }
        }
        var w = 0
        while (w < x.bitmap.length) { x.bitmap(w) |= y.bitmap(w); w += 1 }
        i += 1
      }
      a
    }

    override def finish(b: Buf): Map[String, ColumnProfile] =
      schema.fields.zipWithIndex.map { case (f, i) =>
        val cb = b.cols(i)
        val mean = if (cb.numeric && cb.count > 0) Some(cb.sum / cb.count) else None
        val std =
          if (cb.numeric && cb.count > 1) {
            val m = cb.sum / cb.count
            Some(math.sqrt(math.max(cb.sumSq / cb.count - m * m, 0.0) * cb.count / (cb.count - 1)))
          } else None
        // Distinct count: EXACT while the tracking map never evicted — it
        // then holds every value seen, so its size IS the cardinality (this
        // is what makes the profile oracle-checkable on bounded-cardinality
        // columns). Past eviction, fall back to the linear-counting estimate
        // from the bitmap fill factor. A saturated bitmap (zeros == 0)
        // cannot estimate — report the half-bit-floor lower bound m·ln(2m),
        // NOT the row count (which can overstate true cardinality by orders
        // of magnitude); profiles document the estimator range, so a value
        // pinned at the ceiling reads as "≥ saturation", never as an exact
        // count.
        val zeros = BitmapBits - cb.bitmap.map(java.lang.Long.bitCount).sum
        val saturationFloor =
          math.round(BitmapBits * math.log(2.0 * BitmapBits))
        val distinct =
          if (!cb.evicted) cb.tops.size.toLong
          else if (zeros == 0) math.min(saturationFloor, cb.count)
          else math.min(math.round(BitmapBits * math.log(BitmapBits.toDouble / zeros)), cb.count)
        f.name -> ColumnProfile(
          min = if (cb.numeric && cb.count > 0) Some(cb.min) else None,
          max = if (cb.numeric && cb.count > 0) Some(cb.max) else None,
          mean = mean,
          std = std,
          tops = cb.tops.toSeq.sortBy { case (k, n) => (-n, k) }.take(topK),
          nbDistinct = distinct,
          nbMissingValues = cb.missing)
      }.toMap

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Map[String, ColumnProfile]] =
      Encoders.kryo[Map[String, ColumnProfile]]
  }

  /** Profile every column of `df` in one scan. */
  def profile(df: DataFrame, topK: Int = 10, trackCapacity: Int = 256): Map[String, ColumnProfile] = {
    if (df.schema.isEmpty) return Map.empty
    val agg = new ProfileAgg(df.schema, topK, trackCapacity)
    df.select(agg.toColumn.name("profile")).head()
  }
}
