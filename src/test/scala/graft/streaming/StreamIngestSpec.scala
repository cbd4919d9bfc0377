package graft.streaming

import java.io.File

import graft.SparkSpec
import graft.gen.EventsGen

/** End-to-end file streaming: NDJSON lands in the raw zone → streaming
  * curated parquet with exactly-once semantics across restarts. */
class StreamIngestSpec extends SparkSpec {

  test("readStream over raw NDJSON → curated parquet, exactly-once on restart") {
    val base = tmpDir("graft-stream")
    val raw = s"$base/raw"
    val out = s"$base/curated"
    val ckpt = s"$base/ckpt"
    EventsGen.writeNdjson(EventsGen.generateDay("2025-01-01", 200), raw,
      "2025-01-01")

    val q1 = StreamIngest.startCuratedSink(
      StreamIngest.curate(StreamIngest.readRaw(spark, raw)), out, ckpt)
    q1.awaitTermination() // AvailableNow drains and stops
    assert(spark.read.parquet(out).count() == 202) // 200 + 2 dupes

    // restart with NO new data: checkpoint must prevent reprocessing
    val q2 = StreamIngest.startCuratedSink(
      StreamIngest.curate(StreamIngest.readRaw(spark, raw)), out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 202, "double-processed!")

    // late file lands → only the delta is appended
    EventsGen.writeNdjson(EventsGen.generateLate("2025-01-01", 50), raw,
      "2025-01-01", fileName = "late.json")
    val q3 = StreamIngest.startCuratedSink(
      StreamIngest.curate(StreamIngest.readRaw(spark, raw)), out, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() == 252)
    // curated schema carried through the stream
    val schema = spark.read.parquet(out).schema
    assert(schema("event_ts").dataType.typeName == "timestamp")
    assert(schema.fieldNames.contains("processing_ts"))
  }

  test("streaming hourly counts write append-mode parquet under watermark") {
    val base = tmpDir("graft-stream-agg")
    val raw = s"$base/raw"
    // three day-files × maxFilesPerTrigger=1 → three micro-batches: the
    // watermark set by day-3's batch (used in day-5's batch) seals all
    // of day 1's hourly windows
    for (d <- Seq("2025-01-01", "2025-01-03", "2025-01-05"))
      EventsGen.writeNdjson(EventsGen.generateDay(d, 300), raw, d)
    val q = StreamIngest.startHourlyCounts(
      StreamIngest.curate(StreamIngest.readRawOneFilePerBatch(spark, raw)),
      s"$base/agg", s"$base/ckpt", watermark = "1 hour")
    q.awaitTermination()
    val agg = spark.read.parquet(s"$base/agg")
    val day1 = agg
      .where(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("window_start")) === "2025-01-01")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(day1 == 303, s"day-1 windows must be fully sealed, got $day1")
    assert(new File(s"$base/ckpt").exists())
  }
}
