package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dq.{DqCheck, DqCounters, DqReport}
import graft.schema.EventSchema

/** The D1–D6 DQ gate on a watermarked stream (SURVEY §7.4): the same
  * six counters the batch gate computes ([[graft.dq.DqCounters]]),
  * per event-time window, sealed by the watermark and emitted as one
  * report per window exactly once.
  *
  * Counter shape: the batch formula
  * `dup_extra = total − countDistinct(event_id) − [any null id]`
  * is algebraically Σ over event_id groups (count − 1) with NULL ids
  * forming one group — which IS expressible as two chained watermarked
  * aggregations: per-(window, event_id) partial counts, then per-window
  * sums. Distinct aggregates don't stream; group-then-sum does, with
  * bounded state (live windows × ids per window) and map-side partials.
  * StreamingDqSpec proves counter equality against
  * [[DqCounters.compute]] on the same rows per window.
  */
object StreamingDq {

  /** Six DQ counters per event-time window over a curated stream
    * (`event_ts`, `event_id`, `event_type`, `user_id`). Append mode:
    * a window's row emits exactly once, when the watermark passes its
    * end. */
  def windowedCounters(curated: DataFrame, windowDur: String = "1 hour",
      watermark: String = "1 day",
      allowed: Seq[String] = EventSchema.allowedEventTypes): DataFrame = {
    val perId = curated
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowDur), col("event_id"))
      .agg(
        count(lit(1)).as("cnt"),
        count(when(col("event_type").isNull, 1)).as("null_type_c"),
        count(when(col("user_id").isNull, 1)).as("null_user_c"),
        // negated isin under 3VL: NULL event_type is NOT invalid — it
        // is counted by null_event_type (the batch counter's contract)
        count(when(!col("event_type").isin(allowed: _*), 1))
          .as("invalid_c"))
    perId
      .groupBy(window(window_time(col("window")), windowDur).as("w"))
      .agg(
        sum(col("cnt")).as("total_rows"),
        coalesce(sum(when(col("event_id").isNull, col("cnt"))
          .otherwise(0L)), lit(0L)).as("null_event_id"),
        sum(col("null_type_c")).as("null_event_type"),
        sum(col("null_user_c")).as("null_user_id"),
        sum(col("invalid_c")).as("invalid_event_type"),
        sum(col("cnt") - lit(1L)).as("dup_extra_rows"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("total_rows"), col("null_event_id"), col("null_event_type"),
        col("null_user_id"), col("invalid_event_type"),
        col("dup_extra_rows"))
  }

  private val FileFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)

  /** One sealed-window batch → one report file per window. Deterministic
    * name (window start) + temp-and-rename write: a micro-batch replayed
    * after a crash rewrites byte-identical content instead of
    * duplicating — the idempotent-artifact discipline CuratedWriter uses
    * for `data_quality.json`, which is what makes the append-mode
    * "each window in exactly one committed batch" guarantee an
    * exactly-once EFFECT. */
  private[streaming] def emitReports(batch: DataFrame, reportDir: String)
      : Unit = {
    val rows = batch.collect()
    if (rows.isEmpty) return
    val fs = new Path(reportDir)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(reportDir))
    rows.foreach { r =>
      val start = r.getAs[java.sql.Timestamp]("window_start")
      val c = DqCounters(
        totalRows = r.getAs[Long]("total_rows"),
        nullEventId = r.getAs[Long]("null_event_id"),
        nullEventType = r.getAs[Long]("null_event_type"),
        nullUserId = r.getAs[Long]("null_user_id"),
        invalidEventType = r.getAs[Long]("invalid_event_type"),
        dupExtraRows = r.getAs[Long]("dup_extra_rows"))
      val failures = DqCheck.all.flatMap(_.evaluate(c))
      val report = DqReport(
        ingestionDate = start.toString,
        rawPath = "<stream>",
        curatedPartitionPath = reportDir,
        counters = c,
        failures = failures)
      val name = s"dq_${FileFmt.format(start.toInstant)}.json"
      val tmp = new Path(reportDir, s"_$name.tmp")
      val dst = new Path(reportDir, name)
      val out = fs.create(tmp, true)
      try out.write(report.toJson.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(dst, false)
      fs.rename(tmp, dst)
    }
  }

  /** Start the streaming gate: counters → D1–D6 → one
    * `dq_<windowStart>.json` per sealed window under `reportDir`. */
  def startGate(curated: DataFrame, reportDir: String,
      checkpointDir: String, windowDur: String = "1 hour",
      watermark: String = "1 day",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    windowedCounters(curated, windowDur, watermark).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, _: Long) => emitReports(b, reportDir))
      .start()
}
