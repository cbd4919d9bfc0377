package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.schema.EventSchema

/** File-based streaming ingestion: `readStream` over the raw NDJSON zone
  * → curated transform + watermarked hourly counts → parquet sinks with
  * checkpointing. The streaming twin of Pipeline.runPartition: same
  * schema enforcement, same derivations, exactly-once via the file-sink
  * commit log, state bounded by the watermark.
  *
  * At scale the source would be Kafka/queue-backed; the file source has
  * identical semantics (new files under the path become micro-batches),
  * so the transforms are swappable — they are plain DataFrame→DataFrame.
  */
object StreamIngest {

  /** Schema-enforced streaming read of the raw zone (S1, streaming). */
  def readRaw(spark: SparkSession, rawBase: String): DataFrame =
    spark.readStream
      .schema(EventSchema.raw)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", "16") // bounded micro-batches
      .json(rawBase)

  /** One file per micro-batch — used where watermark progression across
    * batches matters (tests / controlled replays). */
  def readRawOneFilePerBatch(spark: SparkSession, rawBase: String): DataFrame =
    spark.readStream
      .schema(EventSchema.raw)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", "1")
      .json(rawBase)

  /** Curated transform — identical derivations to the batch path
    * (RawEvents.curate), reused verbatim. */
  def curate(raw: DataFrame): DataFrame =
    graft.io.RawEvents.curate(raw)

  /** Start the curated-append stream: exactly-once parquet sink. */
  def startCuratedSink(curated: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    curated.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Start the hourly-counts aggregation stream (watermarked, append).
    * Append mode emits a window only once the watermark passes its end —
    * and the watermark advances between micro-batches (batch N emits
    * using the watermark computed from batch N-1's data), so a window
    * seals two batches after later data arrives. */
  def startHourlyCounts(curated: DataFrame, outDir: String,
      checkpointDir: String, watermark: String = "1 day"): StreamingQuery =
    curated
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .start()
}
