package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects by default; read nanos as long and rebuild a µs-precision
    * timestamp (same truncation DuckDB applies when comparing at µs).
    * The legacy flag is restored after building the frame — schema
    * resolution happens eagerly at read time, so the plan keeps its long
    * view of `ts` while OTHER nanos-parquet reads in the session are not
    * silently switched to LongType. */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
