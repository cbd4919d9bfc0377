package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §7.4 stretch, build-brief
  * requirement): the reference handles late data by batch re-runs of a
  * partition (docs/design.md:86-88); this module is the streaming-native
  * counterpart — watermarked windowed aggregation and stateful
  * sessionization — while batch stays the system of record, as the
  * reference chose.
  *
  * All transforms are source-agnostic DataFrame→DataFrame so the same
  * code runs over `readStream` (kafka/files at scale) and over
  * MemoryStream in tests. State is bounded by the watermark: late rows
  * beyond it are dropped and their window state evicted — that bound is
  * what keeps a 100 TB/day stream's state finite.
  */
object Streaming {

  /** Tumbling-window event counts + value sums per event_type, 1-day
    * watermark (the streaming analogue of the reference's per-partition
    * counts, curated_events.sql:17-20). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming DQ counters: the batch gate's conditional aggregates
    * (SURVEY §2.9) per event-time window — run-scoped gate becomes
    * window-scoped monitoring. */
  def windowedDqCounters(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(
        count(lit(1)).as("total_rows"),
        count(when(col("user_id").isNull, 1)).as("null_user_id"),
        count(when(col("event_type").isNull, 1)).as("null_event_type"))
      .select(col("window.start").as("window_start"), col("total_rows"),
        col("null_user_id"), col("null_event_type"))

  /** Streaming exactly-once-per-id dedup — the reference's duplicate
    * problem (~1% dup event_ids, generate_events.py:16) solved in-flight
    * instead of by a batch groupBy afterward. `dropDuplicatesWithinWatermark`
    * keeps one row per id and EVICTS the id from state once the watermark
    * passes it — bounded state (ids seen within the lateness horizon),
    * which a plain streaming dropDuplicates does not give (its key state
    * grows forever). Duplicates arriving later than the watermark horizon
    * are out of contract — same contract the reference's batch re-run
    * window has. */
  def dedupWithinWatermark(events: DataFrame, idCol: String = "event_id",
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream inner join with a bounded time condition: pair each
    * click with the same user's purchase within the following hour.
    * BOTH sides are watermarked and the join condition bounds event-time
    * distance — that pair of constraints is what lets Spark evict buffered
    * rows (state stays O(users active within the horizon), not O(stream
    * history)). Without the time-range predicate a stream-stream join
    * must buffer forever.
    *
    * @param pairWindow attribution window: a purchase pairs with a click
    *                   at most this much earlier. Independent knob from
    *                   `watermark` (lateness tolerance) — but the click
    *                   side must buffer for `pairWindow + watermark`, so
    *                   a watermark SHORTER than the pair window does NOT
    *                   drop in-window matches (Spark derives the buffer
    *                   bound from the join condition, not the watermark
    *                   alone); it only tightens late-arrival tolerance. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "1 hour",
      pairWindow: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p,
      col("c_user") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL '$pairWindow'"))
      .select(col("c_user").as("user_id"), col("click_ts"),
        col("purchase_ts"), col("value"))
  }

  /** Rate-source adapter: maps Spark's built-in `rate` stream
    * (timestamp, value) into the events shape every transform above
    * expects. Exists to PROVE source-agnosticism: the transforms are
    * plain DataFrame→DataFrame, so the same code runs over files,
    * MemoryStream, Kafka, or this synthetic generator — swapping the
    * source is one `readStream` line, no transform changes
    * (StreamingSpec runs [[windowedCounts]] and
    * [[dedupWithinWatermark]] over it unmodified). */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int = 500): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(
        col("timestamp").as("ts"),
        concat(lit("ev-"), col("value")).as("event_id"),
        element_at(
          array(lit("click"), lit("view"), lit("purchase")),
          (pmod(col("value"), lit(3)) + 1).cast("int")).as("event_type"),
        pmod(col("value"), lit(50)).as("user_id"),
        pmod(col("value"), lit(1000)).cast("double").as("value"))

  /** The foreachBatch exactly-once sink pattern: each micro-batch lands
    * in its own `_batch_id=` partition via DYNAMIC partition overwrite,
    * so a replayed batch (failure between sink write and checkpoint
    * commit — the at-least-once window every foreachBatch sink has)
    * OVERWRITES its own prior output instead of appending duplicates.
    * Idempotence comes from the (batchId → partition) mapping alone; no
    * target-side dedup read is needed, which is what keeps it O(batch)
    * at any target size. This is the standard recipe for sinks without
    * native transactions; [[upsertBatch]] is the unit-testable core.
    */
  def upsertBatch(batch: DataFrame, batchId: Long, targetDir: String): Unit =
    batch.withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(targetDir)

  /** Start `df` into an idempotent parquet sink (see [[upsertBatch]]). */
  def startIdempotentSink(df: DataFrame, targetDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => upsertBatch(b, id, targetDir))
      .start()

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  /** One open session interval; a user's state is ALL open intervals —
    * an interval only leaves state once the watermark proves nothing can
    * merge into it anymore. */
  final case class KmvState(hashes: List[Long])
  final case class TypeDistinct(event_type: String, n_kept: Int,
      approx_users: Long)

  /** Streaming k-minimum-values distinct estimate per event_type — the
    * batch KMV sketch (`ref_approx_distinct_kmv`) maintained
    * incrementally via mapGroupsWithState. The state per key is the k
    * smallest DISTINCT 60-bit hashes seen so far: merging a micro-batch
    * is a sorted-merge + truncate, so state is O(k) longs per key
    * FOREVER — the sketch never grows with stream history, which is the
    * whole point (an exact streaming count-distinct would hold every id
    * in state). No timeout: the event-type vocabulary is bounded, and a
    * KMV sketch has no window to expire — it estimates all-time
    * cardinality. Estimates are IDENTICAL to the batch query on the
    * same rows (same hash, same formula — deterministic, order-free),
    * which the spec asserts literally.
    *
    * The hash column is computed BEFORE groupByKey with the same
    * codegen'd built-ins as batch ([[graft.functions.TextOps.md5Low60]]);
    * only the k-min merge runs in the stateful JVM function. */
  def approxDistinctUsers(events: DataFrame, k: Int = 128)
      : Dataset[TypeDistinct] = {
    import events.sparkSession.implicits._
    events
      .where(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.functions.TextOps.md5Low60(col("user_id").cast("string"))
          .as("hv"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KmvState, TypeDistinct](
        GroupStateTimeout.NoTimeout) {
        (eventType, rows, state: GroupState[KmvState]) =>
          val prior = state.getOption.map(_.hashes).getOrElse(Nil)
          val merged = (prior ++ rows.map(_._2))
            .distinct.sorted.take(k)
          state.update(KmvState(merged))
          val est =
            if (merged.size < k) merged.size.toLong
            else math.floor(
              (k - 1).toDouble * 1152921504606846976.0 // 2^60, exact
                / merged.last.toDouble).toLong
          TypeDistinct(eventType, merged.size, est)
      }
  }

  final case class TDigestState(sketch: Array[Byte])
  final case class TypeQuantiles(event_type: String, n_total: Long,
      p50: Double, p99: Double)

  /** Streaming quantiles per event_type — the batch t-digest rollup
    * (`q_tdigest_mergeable_quantiles`) maintained incrementally via
    * mapGroupsWithState. State per key is ONE serialized digest
    * (O(compression) centroids forever, regardless of stream history) —
    * each micro-batch's values are absorbed through the same merge pass
    * the batch aggregate uses, so the streaming state IS a batch sketch
    * at every point in time: served estimates carry the identical
    * rank-error envelope (order of arrival shifts centroid layout within
    * it, which is the documented t-digest contract, not a streaming
    * artifact). No timeout for the same reason as the KMV sketch above:
    * all-time quantiles have no window to expire.
    *
    * Values reach the stateful function raw, but the digest buffers and
    * compresses every [[graft.functions.TDigest.BufferCap]] points, so
    * per-batch cost is O(rows + δ log δ) per key — the same amortized
    * shape as the batch update path. */
  def streamingQuantiles(events: DataFrame, compression: Int = 200)
      : Dataset[TypeQuantiles] = {
    import events.sparkSession.implicits._
    events
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[TDigestState, TypeQuantiles](
        GroupStateTimeout.NoTimeout) {
        (eventType, rows, state: GroupState[TDigestState]) =>
          val digest = state.getOption
            .map(s => graft.functions.TDigest.fromBytes(s.sketch))
            .getOrElse(new graft.functions.TDigest.State(compression))
          rows.foreach(r => digest.add(r._2, 1L))
          state.update(TDigestState(digest.serialized))
          TypeQuantiles(eventType, digest.totalWeight,
            digest.quantile(0.5).getOrElse(Double.NaN),
            digest.quantile(0.99).getOrElse(Double.NaN))
      }
  }

  final case class SessionState(sessions: List[(Long, Long, Int)])
  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  /** Session gap (ms) after which a user's activity closes. */
  val SessionGapMs: Long = 30L * 60 * 1000

  /** Custom-state sessionization via flatMapGroupsWithState: state is the
    * user's open session intervals; new (possibly out-of-order, within
    * watermark) events are merged interval-wise, and a session is emitted
    * only when the event-time watermark passes its end + gap — so a late
    * in-watermark event can still extend or predate any open session
    * without corrupting boundaries. State is partitioned by user key and
    * bounded by the watermark, so it scales with active users, not
    * history. */
  def sessionize(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._

    def merge(intervals: List[(Long, Long, Int)]): List[(Long, Long, Int)] =
      intervals.sortBy(_._1).foldLeft(List.empty[(Long, Long, Int)]) {
        case ((cs, ce, cn) :: rest, (s, e, n)) if s - ce <= SessionGapMs =>
          (cs, math.max(ce, e), cn + n) :: rest
        case (acc, iv) => iv :: acc
      }.reverse

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          val prior = state.getOption.map(_.sessions).getOrElse(Nil)
          val incoming = rows.map(r => (r.ts.getTime, r.ts.getTime, 1)).toList
          val open = merge(prior ++ incoming)
          // emit every session the watermark has sealed (end+gap passed)
          val wm = state.getCurrentWatermarkMs()
          val (closed, stillOpen) = open.partition(_._2 + SessionGapMs <= wm)
          if (stillOpen.nonEmpty) {
            state.update(SessionState(stillOpen))
            state.setTimeoutTimestamp(stillOpen.map(_._2).min + SessionGapMs)
          } else state.remove()
          closed.iterator.map { case (s, e, n) =>
            UserSession(userId, new Timestamp(s), new Timestamp(e), n)
          }
      }
  }
}
