package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Encoding matrix for [[Tables.events]]: the loader claims to normalize
  * every `ts` encoding the driver fixtures have shipped — epoch-nanos as
  * plain INT64 (the ScaleUp round-trip of legacy TIMESTAMP(NANOS) data),
  * naive TIMESTAMP_MICROS (current fixtures, resolves TIMESTAMP_NTZ), and
  * UTC-adjusted micros (what Spark itself writes for TimestampType).
  * Each variant is written to a temp dir and must come back as the SAME
  * session-TZ TimestampType instants. TablesSpec pins the real fixtures'
  * dtypes; this spec pins the normalization itself, so the two fail
  * independently when the next drift lands.
  */
class TablesEncodingSpec extends SparkSpec {

  private val instants = Seq(
    "2024-01-01 00:00:00.000001",
    "2024-06-15 12:34:56.789012",
    "2025-12-31 23:59:59.999999")

  // Parse as UTC instants explicitly: the SESSION TZ is UTC, but
  // Timestamp.valueOf would use the JVM default TZ — on a non-UTC
  // machine that shifts every expectation by the zone offset.
  private def expected: Seq[Timestamp] =
    instants.map(s => Timestamp.from(
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)))

  private def readBack(dir: String): Seq[Timestamp] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    df.select(col("ts")).orderBy(col("ts"))
      .collect().map(_.getTimestamp(0)).toSeq
  }

  private def base = {
    val s = spark
    import s.implicits._
    instants.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, i.toLong, "click", 1.0, null: String)
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
  }

  test("epoch-nanos stored as plain INT64 normalizes to the same instants") {
    val dir = tmpDir("enc-nanos")
    base.selectExpr("event_id",
      "unix_micros(CAST(ts_s AS TIMESTAMP)) * 1000L AS ts",
      "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir) === expected)
  }

  test("naive TIMESTAMP_MICROS (TIMESTAMP_NTZ) normalizes to the same instants") {
    val dir = tmpDir("enc-ntz")
    base.selectExpr("event_id",
      "CAST(CAST(ts_s AS TIMESTAMP) AS TIMESTAMP_NTZ) AS ts",
      "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir) === expected)
  }

  test("UTC-adjusted TIMESTAMP_MICROS (TimestampType) passes through unchanged") {
    val dir = tmpDir("enc-tz")
    base.selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
      "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readBack(dir) === expected)
  }

  test("the nanosAsLong flag is restored after the read either way") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val dir = tmpDir("enc-flag")
    base.selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
      "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir).count()
    assert(spark.conf.getOption(key) === before)
  }
}
