package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

case class ActiveEv(userId: Long, ts: Timestamp)

class StreamingActivesSpec extends SparkSpec {

  private type Ev = ActiveEv
  private val Ev = ActiveEv

  private def ts(day: Int, hour: Int) =
    Timestamp.valueOf(f"2024-07-$day%02d $hour%02d:00:00")

  test("chained dedup → windowed count equals the batch distinct rollup per closed day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingActives.dailyActives(
      input.toDS().withWatermark("ts", "2 hours").toDF(), "userId", "ts")
    val query = out.writeStream.format("memory").queryName("actives")
      .outputMode(OutputMode.Append()).start()

    // day 1: users 1,2,3 (user 1 twice); day 2: users 1,4
    val all = Seq(
      Ev(1L, ts(1, 8)), Ev(2L, ts(1, 9)), Ev(1L, ts(1, 18)), Ev(3L, ts(1, 22)),
      Ev(1L, ts(2, 7)), Ev(4L, ts(2, 12)))
    input.addData(all.take(4): _*)
    query.processAllAvailable()
    input.addData(all.drop(4): _*)
    query.processAllAvailable()
    // push the watermark past both days so both windows close
    input.addData(Ev(99L, ts(5, 23)))
    query.processAllAvailable()
    input.addData(Ev(99L, ts(6, 23)))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("actives")
      .select(col("day_start").cast("string"), col("active_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = all.toDF("userId", "ts")
      .select(col("userId"), window(col("ts"), "1 day")("start").cast("string").as("d"))
      .distinct().groupBy("d").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // both closed days match the batch rollup exactly
    expected.foreach { case (d, n) =>
      assert(got.get(d).contains(n), s"day $d: got ${got.get(d)}, want $n")
    }
  }
}
