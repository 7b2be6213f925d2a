package graft.queries

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSpec

/** Tables.events must be total over every parquet timestamp encoding the
  * driver's testdata generator has shipped:
  *   round ≤4: TIMESTAMP(NANOS, UTC-adjusted)
  *   round 5+: TIMESTAMP(MICROS, isAdjustedToUTC=false)  (Spark: TIMESTAMP_NTZ)
  *   and the plain TIMESTAMP(MICROS, UTC-adjusted) a Spark writer produces.
  * Each arm must yield µs TimestampType with the same epoch-µs value DuckDB's
  * epoch_us() reads from the same file (session zone is pinned to UTC).
  */
class EventsEncodingSpec extends SparkSpec {
  // 2024-01-02T03:04:05.123456Z
  private val micros = java.time.Instant.parse("2024-01-02T03:04:05.123456Z")
    .getEpochSecond * 1000000L + 123456L

  private def freshDir(): String = {
    val d = Files.createTempDirectory("events-enc").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def loadedMicros(dir: String): Long = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).head().getLong(0)
  }

  test("µs UTC-adjusted (TimestampType writer) loads unchanged") {
    val dir = freshDir()
    spark.range(1).select(
      col("id").as("event_id"),
      timestamp_micros(lit(micros)).as("ts"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == micros)
  }

  test("µs NTZ (isAdjustedToUTC=false) is reinterpreted as a UTC instant") {
    val dir = freshDir()
    spark.range(1).select(
      col("id").as("event_id"),
      timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) == micros)
  }

  test("TIMESTAMP(NANOS) is truncated to µs") {
    val dir = freshDir()
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/events.parquet"))
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet/part-0.parquet"))
      .withType(schema)
      .build()
    try {
      val g = new SimpleGroupFactory(schema).newGroup()
      g.append("event_id", 1L)
      g.append("ts", micros * 1000L + 789L) // sub-µs nanos must truncate away
      writer.write(g)
    } finally writer.close()
    assert(loadedMicros(dir) == micros)
  }
}
