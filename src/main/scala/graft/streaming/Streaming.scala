package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
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

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  /** Session gap (ms) after which a user's activity closes. */
  val SessionGapMs: Long = 30L * 60 * 1000

  /** Custom-state sessionization via flatMapGroupsWithState: one state
    * object per active user, closed by gap timeout against the event-time
    * watermark. The KeyValueGroupedDataset path — state is partitioned by
    * user key, so it scales horizontally with the key space. */
  def sessionize(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n))
          } else {
            val ts = rows.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[UserSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= SessionGapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= UserSession(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + SessionGapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
