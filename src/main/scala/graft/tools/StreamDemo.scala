package graft.tools

import org.apache.spark.sql.SparkSession

import graft.gen.EventsGen
import graft.streaming.StreamIngest

/** Drives the file-streaming ingestion path end-to-end on a temp dir:
  * raw NDJSON → readStream → curated parquet sink (checkpointed), then a
  * restart with no new data (must be a no-op) and a late-file delta.
  *
  * usage: runMain graft.tools.StreamDemo
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft-stream-demo")
      .toString
    val raw = s"$base/raw"
    EventsGen.writeNdjson(EventsGen.generateDay("2025-01-01", 200), raw,
      "2025-01-01")

    def drain(): Long = {
      StreamIngest.startCuratedSink(
        StreamIngest.curate(StreamIngest.readRaw(spark, raw)),
        s"$base/curated", s"$base/ckpt").awaitTermination()
      spark.read.parquet(s"$base/curated").count()
    }

    println(s"STREAMDEMO initial=${drain()}")   // 202 expected
    println(s"STREAMDEMO restartNoData=${drain()}") // still 202
    EventsGen.writeNdjson(EventsGen.generateLate("2025-01-01", 50), raw,
      "2025-01-01", fileName = "late.json")
    println(s"STREAMDEMO afterLateFile=${drain()}") // 252
    spark.stop()
  }
}
