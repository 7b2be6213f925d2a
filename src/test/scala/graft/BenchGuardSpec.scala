package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

class BenchGuardSpec extends SparkSpec {

  private def writeEvents(dir: String, ntz: Boolean): Unit = {
    val ts = timestamp_micros(lit(1700000000000000L))
    spark.range(4).select(
      col("id").as("event_id"),
      (if (ntz) ts.cast(TimestampNTZType) else ts).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("a retyped fixture trips the drift guard; identical shape passes") {
    val dir = Files.createTempDirectory("guard").toFile.getAbsolutePath
    writeEvents(dir, ntz = false)
    val before = BenchGuard.fingerprint(spark, dir)
    assert(before("events") == "event_id:bigint,ts:timestamp")

    // same shape → no drift
    assert(BenchGuard.drift(before, BenchGuard.fingerprint(spark, dir)).isEmpty)

    // the exact round-5 failure mode: µs → µs-NTZ retype of events.ts
    writeEvents(dir, ntz = true)
    val after = BenchGuard.fingerprint(spark, dir)
    assert(after("events") == "event_id:bigint,ts:timestamp_ntz")
    val drift = BenchGuard.drift(before, after)
    assert(drift == Seq(("events", before("events"), after("events"))))

    // tables present on only one side never trip the guard
    assert(BenchGuard.drift(before + ("extra" -> "a:int"), after)
      .map(_._1) == Seq("events"))
  }

  test("fingerprints round-trip through the artifact JSON") {
    val fp = Map(
      "events" -> "event_id:bigint,ts:timestamp_ntz",
      "documents" -> "doc_id:bigint,text:string")
    val artifact = Files.createTempDirectory("guard").resolve("BENCH_local.json")
    Files.write(artifact,
      (s"""{"metric":"total","value":1.0,"queries":{"q1":0.5},""" +
        s""""schemas":${BenchGuard.schemasJson(fp)},"sf":"x"}""").getBytes("UTF-8"))
    assert(BenchGuard.recordedSchemas(artifact.toString).contains(fp))
    // absent / unparseable artifacts disable the guard instead of crashing
    assert(BenchGuard.recordedSchemas("/nonexistent/BENCH.json").isEmpty)
    val junk = Files.createTempDirectory("guard").resolve("junk.json")
    Files.write(junk, "not json".getBytes("UTF-8"))
    assert(BenchGuard.recordedSchemas(junk.toString).isEmpty)
  }
}
