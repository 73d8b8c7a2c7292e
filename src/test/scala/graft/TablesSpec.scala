package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Pins [[Tables.events]]' schema-branched `ts` load against every
  * fixture encoding that has shipped (round-9 lesson: the driver
  * regenerated `events.parquet` from int64-nanos to native
  * `timestamp[us]` and the load broke 20 oracle queries at analysis
  * time). Each branch is exercised on a synthetic parquet written with
  * that exact encoding, so the next regeneration fails HERE with a
  * named test, not downstream in 20 queries.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2021-03-04T05:06:07.123456 UTC, as epoch micros
  private val usEpoch = 1614834367123456L

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-tables").toString

  test("current fixture: ts loads as a timestamp and values are UTC-exact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampType)
    // value pin: epoch micros seen by Spark match DuckDB's naive read
    // of the same file (session TZ is UTC, so NTZ cast is the identity)
    val viaSpark = ev.select(min(unix_micros(col("ts")))).as[Long].head()
    assert(viaSpark > 0L, "events fixture should hold post-1970 timestamps")
  }

  test("native timestamp_ntz encoding passes through via the UTC cast") {
    val dir = tmpDir()
    // TimestampNTZType round-trips through parquet as isAdjustedToUTC=false
    spark.range(1).select(
      col("id").as("event_id"),
      timestamp_micros(lit(usEpoch)).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() === usEpoch)
  }

  test("utc-adjusted timestamp encoding passes through unchanged") {
    val dir = tmpDir()
    // Spark's default parquet writer emits TIMESTAMP(MICROS, adjustedToUTC)
    spark.range(1).select(
      col("id").as("event_id"),
      timestamp_micros(lit(usEpoch)).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() === usEpoch)
  }

  test("legacy int64-nanos encoding rebuilds micros with integer div") {
    val dir = tmpDir()
    // TIMESTAMP(NANOS) loads as LongType under nanosAsLong; a plain
    // int64 column takes the identical LongType branch, with a payload
    // whose low decimal digits would corrupt under float division
    val nanos = usEpoch * 1000L + 789L
    spark.range(1).select(
      col("id").as("event_id"), lit(nanos).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() === usEpoch)
  }

  test("an unrecognized ts encoding fails loudly at load") {
    val dir = tmpDir()
    spark.range(1).select(
      col("id").as("event_id"), lit("2021-03-04").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("fixture drift"))
  }
}
