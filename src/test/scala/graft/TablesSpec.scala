package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Tables.events]] against fixture regenerations: the driver has
  * shipped events.ts as INT64 TIMESTAMP(NANOS) (rounds 1-6) and as
  * TIMESTAMP(MICROS) (round 7+), and a future regeneration could use
  * millis or UTC-adjusted encodings. The loader must normalize every
  * physical encoding to the same `ts: TIMESTAMP` (µs precision, UTC
  * session) column with identical values — round 7 went red because the
  * old loader hard-assumed one encoding.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01T10:00:00.123456Z — micros-precision instant used everywhere
  private val microsOfT0 = 1704103200123456L

  /** Write `df` (with some ts encoding) as <tmp>/events.parquet and load
    * it back through the production loader. */
  private def roundTrip(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("tables-spec-").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  private def loadedMicros(df: DataFrame): Seq[(Long, Long)] = {
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must always yield TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().toSeq.sorted
  }

  private val expected = Seq(
    (1L, microsOfT0),
    (2L, microsOfT0 + 1500000L), // +1.5 s
    (3L, microsOfT0 + 7L))       // +7 µs — sub-ms component must survive

  test("ns-long fixture (rounds 1-6): floor-truncated to µs TIMESTAMP") {
    // plain INT64 column (the nanosAsLong read shape); give each value a
    // sub-µs component that must floor away (999 ns would round UP under
    // naive rounding — div must floor)
    val df = expected.map { case (id, us) => (id, us * 1000L + 999L) }
      .toDF("event_id", "ts")
    assert(loadedMicros(roundTrip(df)) == expected)
  }

  test("TIMESTAMP_NTZ µs fixture (round 7+): cast through, values exact") {
    val df = expected.map { case (id, us) =>
      (id, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    }.toDF("event_id", "ts")
    assert(df.schema("ts").dataType == TimestampNTZType) // writes NTZ µs
    assert(loadedMicros(roundTrip(df)) == expected)
  }

  test("UTC-adjusted TIMESTAMP µs fixture: passed through unchanged") {
    val df = expected.map { case (id, us) =>
      (id, java.time.Instant.ofEpochSecond(us / 1000000L,
        (us % 1000000L) * 1000L))
    }.toDF("event_id", "ts")
      .withColumn("ts", $"ts".cast(TimestampType))
    assert(loadedMicros(roundTrip(df)) == expected)
  }

  test("TIMESTAMP_MILLIS fixture: widened to µs TIMESTAMP, values exact") {
    val expectedMs = expected.map { case (id, us) => (id, us / 1000L * 1000L) }
    val df = expectedMs.map { case (id, us) =>
      (id, java.time.Instant.ofEpochMilli(us / 1000L))
    }.toDF("event_id", "ts").withColumn("ts", $"ts".cast(TimestampType))
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try assert(loadedMicros(roundTrip(df)) == expectedMs)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("driver fixture loads as non-empty TIMESTAMP events") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(!ev.isEmpty)
  }
}
