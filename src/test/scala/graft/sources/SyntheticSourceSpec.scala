package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The DSv2 contract of the synthetic source: distributed partition
  * planning, filter pushdown narrowing generation (not post-filtering),
  * column pruning reaching the reader, and bit-determinism. */
class SyntheticSourceSpec extends SparkSpec {

  private def read(rows: Long, parts: Int): DataFrame =
    spark.read.format("graft-synth")
      .option("numRows", rows).option("numPartitions", parts).load()

  test("generates the declared row count across the declared partitions") {
    val df = read(10000, 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 10000)
    // deterministic: same options -> identical bytes
    val a = df.orderBy("id").collect()
    val b = read(10000, 4).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("id range predicates are pushed into partition planning") {
    val df = read(100000, 8).where(col("id") >= 60000L && col("id") < 60100L)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // the scan itself narrowed: its description carries the clamped range
    assert(scan.contains("[60000, 60100)"), s"scan not narrowed:\n$scan")
    assert(df.count() == 100)
    // partition tasks cover only the narrowed interval
    val perPart = df.select(spark_partition_id().as("p"))
      .groupBy("p").count().collect().map(_.getLong(1)).sum
    assert(perPart == 100)
  }

  test("equality pushdown clamps to a single row") {
    val df = read(100000, 8).where(col("id") === 12345L)
    assert(df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString.contains("[12345, 12346)"))
    val row = df.collect()
    assert(row.length == 1 && row.head.getAs[Long]("id") == 12345L)
  }

  test("column pruning reaches the reader") {
    val df = read(1000, 2).select("event_type")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scan.contains("columns event_type"), s"not pruned: $scan")
    assert(df.distinct().count() == 5)
  }

  test("an unsupported predicate still evaluates correctly post-scan") {
    val df = read(1000, 2).where(col("user_id") % 2 === 0)
    val expect = (0L until 1000L).count(i => SyntheticSource.userId(i) % 2 == 0)
    assert(df.count() == expect)
  }

  test("contradictory pushdown yields an empty, not negative, range") {
    val df = read(1000, 4).where(col("id") >= 900L && col("id") < 100L)
    assert(df.count() == 0)
  }

  test("micro-batch read drains the declared rows across paced batches " +
      "and matches the batch read exactly") {
    val stream = spark.readStream.format("graft-synth")
      .option("numRows", 1000).option("numPartitions", 2)
      .option("batchRows", 300).load()
    val q = stream.writeStream.format("memory").queryName("synth_mb")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("synth_mb")
      assert(got.count() == 1000)
      // batch and stream produce the identical row set
      val batch = read(1000, 2).collect().map(_.toSeq).toSet
      assert(got.collect().map(_.toSeq).toSet == batch)
      // pacing: 1000 rows / 300 per trigger -> at least 4 micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally q.stop()
  }
}
