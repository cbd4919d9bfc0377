package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.RawEvents

/** Volume anomaly detection — the reference roadmap's monitoring item
  * (ref: docs/design.md:166-168) made real: a day whose row count
  * deviates from its trailing 7-day baseline by more than a threshold
  * fraction is flagged. An anomaly is a WARNING (alerting signal), not a
  * gate failure — volume swings can be legitimate (launches, outages
  * upstream of us), so the pipeline records and surfaces them without
  * blocking the batch, unlike the hard [[DqCheck]] rules.
  */
object Anomaly {

  /** Flag |n − baseline| > threshold·baseline. 0.5 = "half or 1.5× the
    * trailing week" — wide enough to ignore weekday seasonality. */
  val DefaultThreshold = 0.5

  /** Per-day volumes with trailing-7-day baseline and anomaly flag:
    * (event_date, n, baseline, is_anomaly). The window is global but its
    * cardinality is one row per DATE — bounded by the calendar, not the
    * data, so the single-task window holds at any corpus size (same
    * argument as ref_rolling_baseline). Days with no baseline yet (first
    * day of history) are never anomalous. */
  def dailyVolume(events: DataFrame,
      threshold: Double = DefaultThreshold): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("event_date")).rowsBetween(-7, -1)
    daily
      .withColumn("baseline", avg(col("n")).over(w))
      .withColumn("is_anomaly",
        col("baseline").isNotNull &&
          (col("n") > col("baseline") * (1 + threshold) ||
            col("n") < col("baseline") * (1 - threshold)))
  }

  /** Pipeline-shaped variant: compare ONE batch's row count (already in
    * hand from the DQ counter pass — no extra scan of the batch) against
    * the trailing week of CURATED partitions. Each history point is a
    * parquet `count(*)` over one date partition — footer metadata only,
    * no data pages — so the whole check is O(7 partition listings)
    * regardless of data size. Missing history days (gaps, start of
    * history) simply don't contribute; no baseline at all ⇒ no warning. */
  def volumeWarning(spark: SparkSession, curatedBase: String,
      ingestionDate: String, batchRows: Long,
      threshold: Double = DefaultThreshold): Option[String] = {
    val date = java.time.LocalDate.parse(ingestionDate)
    val history = (1 to 7).flatMap { back =>
      val d = date.minusDays(back.toLong).toString
      val path = RawEvents.partitionPath(curatedBase, d)
      if (graft.io.CuratedWriter.upstreamExists(spark, path))
        Some(spark.read.parquet(path).count())
      else None
    }
    if (history.isEmpty) None
    else {
      val baseline = history.sum.toDouble / history.size
      val deviates = batchRows > baseline * (1 + threshold) ||
        batchRows < baseline * (1 - threshold)
      if (deviates)
        Some(f"row-count anomaly: $batchRows rows vs trailing-" +
          f"${history.size}%d-day baseline $baseline%.1f " +
          f"(threshold ±${(threshold * 100).toInt}%%)")
      else None
    }
  }
}
