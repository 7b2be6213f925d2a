package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Sketches

object StreamingMadSpec {
  final case class ValRow(grp: String, value: Double)
}

/** d38's streaming twin: the grid-histogram MAD report in Complete mode
  * must equal batch gridMadReport over the processed prefix after EVERY
  * micro-batch, for out-of-order arrival — exact parity, not an
  * envelope, because the histogram state is a pointwise sum. */
class StreamingMadSpec extends SparkSpec {
  import StreamingMadSpec.ValRow

  test("streaming MAD report equals the batch report after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two groups, values scattered over the grid incl. an outlier tail,
    // delivered OUT OF ORDER across three micro-batches
    val all = (1 to 900).map { i =>
      val v = if (i % 97 == 0) 480.0 + (i % 7) else (i * 37 % 200) + 0.25
      ValRow(s"g${i % 2}", v)
    }
    val batches = all.grouped(300).toSeq.reverse // out-of-order delivery

    val input = MemoryStream[ValRow]
    val query = StreamingMad
      .runningMadReport(input.toDF(), "value", "grp",
        lo = 0.0, hi = 512.0, nBins = 256)
      .writeStream.format("memory").queryName("mad_running")
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[ValRow]
    batches.foreach { b =>
      input.addData(b: _*)
      query.processAllAvailable()
      prefix = prefix ++ b
      val streamed = spark.table("mad_running")
        .collect().map(_.toString).sorted.toSeq
      val batch = Sketches.gridMadReport(prefix.toDF(), "value", "grp",
        lo = 0.0, hi = 512.0, nBins = 256)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, s"prefix ${prefix.size}")
    }
    query.stop()
  }

  test("grid report approximates the exact MAD report within grid resolution") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => ValRow("g", (i * 131 % 400) + 0.5))
    val got = Sketches.gridMadReport(rows.toDF(), "value", "grp",
      lo = 0.0, hi = 512.0, nBins = 256).collect().head
    // exact: median of {0.5, 1.5, ..., 399.5}-ish uniform ≈ 200; grid
    // cells are 2 wide with midpoints at odd integers → med/mad land
    // within one cell width of the exact values
    val values = rows.map(_.value).sorted
    val exactMed = values((values.size + 1) / 2 - 1)
    val devs = values.map(v => math.abs(v - exactMed)).sorted
    val exactMad = devs((devs.size + 1) / 2 - 1)
    assert(math.abs(got.getDouble(2) - exactMed) <= 2.0,
      s"med_est ${got.getDouble(2)} vs exact $exactMed")
    assert(math.abs(got.getDouble(3) - exactMad) <= 2.0,
      s"mad_est ${got.getDouble(3)} vs exact $exactMad")
    assert(got.getLong(1) == 2000L)
  }

  test("histogram state is partition-independent (1 vs 13 partitions bit-identical)") {
    import spark.implicits._
    val rows = (1 to 500).map(i => ValRow(s"g${i % 3}", (i * 7 % 300).toDouble))
    val a = Sketches.gridMadReport(rows.toDF().repartition(1), "value", "grp",
      0.0, 512.0, 256).collect().map(_.toString).sorted.toSeq
    val b = Sketches.gridMadReport(rows.toDF().repartition(13), "value", "grp",
      0.0, 512.0, 256).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("empty input and out-of-grid values keep the contract") {
    import spark.implicits._
    val empty = Seq.empty[ValRow].toDF()
    assert(Sketches.gridMadReport(empty, "value", "grp", 0.0, 512.0, 256).isEmpty)
    // values below lo / above hi land in the clamp cells (reps lo and hi)
    val wild = Seq(ValRow("g", -50.0), ValRow("g", 1e9), ValRow("g", 10.0)).toDF()
    val r = Sketches.gridMadReport(wild, "value", "grp", 0.0, 512.0, 256)
      .collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 11.0) // median = cell midpoint of [10,12)
  }
}
