package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * All engine queries are parameterized by a scale-factor directory so the
  * same logical plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, unchanged, against a 100 TB lake: the reads below are
  * plain parquet scans, so Catalyst's column pruning / predicate pushdown /
  * partition pruning apply as-is on a partitioned production layout.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across driver testdata
    * generations — TIMESTAMP(NANOS) originally, TIMESTAMP_MICROS (naive)
    * today — so branch on the RESOLVED dtype instead of hard-assuming one:
    *   - LongType: the nanosAsLong escape hatch fired on a NANOS file;
    *     rebuild a µs-precision timestamp (same truncation DuckDB applies).
    *   - TimestampNTZType: naive µs file; cast to session-TZ TimestampType
    *     (sessions run UTC, so the value is preserved and downstream
    *     queries keep the TimestampType semantics the oracle SQL expects).
    *   - TimestampType: already the shape we want.
    * The legacy flag is restored after the read — schema resolution is
    * eager, so the plan keeps its view of `ts` while OTHER parquet reads
    * in the session are unaffected. */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val raw = load(s, d, "events")
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other =>
          sys.error(s"events.ts resolved to unsupported type $other; " +
            "expected nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
      }
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
