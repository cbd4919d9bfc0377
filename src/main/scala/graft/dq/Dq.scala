package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.schema.EventSchema

/** The six DQ counters, computed in ONE aggregation pass.
  *
  * The reference runs six separate Spark actions — four filtered counts,
  * a groupBy-count, and an agg-collect (ref:
  * raw_to_curated_events_v3_dq.py:70-82), i.e. six scans of the batch.
  * Here all counters are conditional aggregates in a single `agg`, one
  * scan, map-side combinable — the optimization SURVEY §2.9 mandates,
  * with counter values provably identical (DqSpec covers each trap).
  */
final case class DqCounters(
    totalRows: Long,
    nullEventId: Long,
    nullEventType: Long,
    nullUserId: Long,
    invalidEventType: Long,
    dupExtraRows: Long) {

  /** Driver-side rate derivation, division-by-zero guarded
    * (ref: raw_to_curated_events_v3_dq.py:85-87). */
  def nullUserRate: Double =
    if (totalRows > 0) nullUserId.toDouble / totalRows else 0.0
  def dupRate: Double =
    if (totalRows > 0) dupExtraRows.toDouble / totalRows else 0.0
}

object DqCounters {

  /** Single-pass counter computation.
    *
    * Semantics preserved exactly:
    *  - invalid_event_type uses negated `isin`: NULL event_type yields
    *    NULL (not true) under SQL three-valued logic, so nulls are NOT
    *    counted as invalid — they are counted by null_event_type
    *    (ref: raw_to_curated_events_v3_dq.py:78; SURVEY §2.4 F3);
    *  - dup_extra_rows = Σ over event_id groups of (count-1), nulls
    *    forming ONE group like groupBy does (ref: ..._v3_dq.py:81-83):
    *    computed scan-free of a groupBy as
    *    total - countDistinct(event_id) - [1 if any null event_id];
    *  - empty input ⇒ all counters 0 (the reference coalesces the NULL
    *    sum at :83).
    */
  def compute(df: DataFrame,
      allowed: Seq[String] = EventSchema.allowedEventTypes): DqCounters = {
    val row = df.agg(
      count(lit(1)).as("total_rows"),
      count(when(col("event_id").isNull, 1)).as("null_event_id"),
      count(when(col("event_type").isNull, 1)).as("null_event_type"),
      count(when(col("user_id").isNull, 1)).as("null_user_id"),
      count(when(!col("event_type").isin(allowed: _*), 1))
        .as("invalid_event_type"),
      (count(lit(1)) - count_distinct(col("event_id")) -
        coalesce(max(when(col("event_id").isNull, 1).otherwise(0)), lit(0)))
        .as("dup_extra_rows")
    ).head()
    DqCounters(
      totalRows = row.getLong(0),
      nullEventId = row.getLong(1),
      nullEventType = row.getLong(2),
      nullUserId = row.getLong(3),
      invalidEventType = row.getLong(4),
      dupExtraRows = row.getLong(5))
  }
}

/** One DQ rule: evaluates the counters to an optional failure message.
  * Sealed ADT so the rule set is closed and exhaustively testable
  * (SURVEY §2.9 mapping). */
sealed trait DqCheck {
  def evaluate(c: DqCounters): Option[String]
}

object DqCheck {
  val MaxNullUserIdRate = 0.03 // ref: raw_to_curated_events_v3_dq.py:25
  val MaxDupEventIdRate = 0.02 // ref: raw_to_curated_events_v3_dq.py:26

  /** D1 (ref: ..._v3_dq.py:111-112) */
  case object NonEmpty extends DqCheck {
    def evaluate(c: DqCounters): Option[String] =
      if (c.totalRows == 0) Some("No rows found (total_rows == 0)") else None
  }
  /** D2 (ref: ..._v3_dq.py:113-114) */
  case object EventIdNotNull extends DqCheck {
    def evaluate(c: DqCounters): Option[String] =
      if (c.nullEventId > 0) Some(s"event_id has nulls: ${c.nullEventId}")
      else None
  }
  /** D3 (ref: ..._v3_dq.py:115-116) */
  case object EventTypeNotNull extends DqCheck {
    def evaluate(c: DqCounters): Option[String] =
      if (c.nullEventType > 0)
        Some(s"event_type has nulls: ${c.nullEventType}")
      else None
  }
  /** D4 (ref: ..._v3_dq.py:117-118) */
  case object EventTypeInDomain extends DqCheck {
    def evaluate(c: DqCounters): Option[String] =
      if (c.invalidEventType > 0)
        Some(s"event_type has invalid values: ${c.invalidEventType}")
      else None
  }
  /** Locale-stable %.4f (the f-interpolator honors the JVM default
    * locale; a comma-decimal locale would change the message format). */
  private def f4(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

  /** D5 (ref: ..._v3_dq.py:119-120) */
  case object NullUserRate extends DqCheck {
    def evaluate(c: DqCounters): Option[String] =
      if (c.nullUserRate > MaxNullUserIdRate)
        Some(s"user_id null rate too high: ${f4(c.nullUserRate)} > $MaxNullUserIdRate")
      else None
  }
  /** D6 (ref: ..._v3_dq.py:121-122; definition docs/design.md:107) */
  case object DupEventIdRate extends DqCheck {
    def evaluate(c: DqCounters): Option[String] =
      if (c.dupRate > MaxDupEventIdRate)
        Some(s"duplicate event_id rate too high: ${f4(c.dupRate)} > $MaxDupEventIdRate")
      else None
  }

  /** The reference's gate, in its order (messages joined in this order on
    * failure, ref: ..._v3_dq.py:109-122). */
  val all: Seq[DqCheck] = Seq(NonEmpty, EventIdNotNull, EventTypeNotNull,
    EventTypeInDomain, NullUserRate, DupEventIdRate)
}

/** The per-run DQ report — exact field set of the reference's JSON
  * artifact (ref: raw_to_curated_events_v3_dq.py:89-106,124-126;
  * FIXTURES.md §A.3). `failures` present only on FAIL; `warnings`
  * (non-gating alerts, e.g. [[Anomaly]] volume deviations) present only
  * when non-empty, so the emitted JSON is byte-identical to the
  * reference's artifact whenever neither fires. */
final case class DqReport(
    ingestionDate: String,
    rawPath: String,
    curatedPartitionPath: String,
    counters: DqCounters,
    failures: Seq[String],
    warnings: Seq[String] = Nil) {

  def status: String = if (failures.isEmpty) "PASS" else "FAIL"

  /** Explicit field list, fixed order — not reflection (SURVEY §7.4). */
  def toJson: String = {
    def s(v: String) = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val base = Seq(
      "ingestion_date" -> s(ingestionDate),
      "raw_path" -> s(rawPath),
      "curated_partition_path" -> s(curatedPartitionPath),
      "total_rows" -> counters.totalRows.toString,
      "null_event_id" -> counters.nullEventId.toString,
      "null_event_type" -> counters.nullEventType.toString,
      "null_user_id" -> counters.nullUserId.toString,
      "null_user_rate" -> counters.nullUserRate.toString,
      "invalid_event_type" -> counters.invalidEventType.toString,
      "duplicate_event_id_extra_rows" -> counters.dupExtraRows.toString,
      "duplicate_event_id_rate" -> counters.dupRate.toString,
      "thresholds" -> ("{\"max_null_user_id_rate\": " + DqCheck.MaxNullUserIdRate +
        ", \"max_duplicate_event_id_rate\": " + DqCheck.MaxDupEventIdRate + "}"),
      "status" -> s(status))
    val withFailures = if (failures.isEmpty) base
      else base :+ ("failures" -> failures.map(s).mkString("[", ", ", "]"))
    val fields = if (warnings.isEmpty) withFailures
      else withFailures :+
        ("warnings" -> warnings.map(s).mkString("[", ", ", "]"))
    fields.map { case (k, v) => s"  \"$k\": $v" }
      .mkString("{\n", ",\n", "\n}")
  }
}

object Dq {
  /** Evaluate the full gate over a batch: one aggregation pass, then the
    * rule list. Non-gating `warnings` (e.g. [[Anomaly.volumeWarning]])
    * ride along into the report. */
  def run(df: DataFrame, ingestionDate: String, rawPath: String,
      curatedPath: String, warnings: Seq[String] = Nil): DqReport = {
    val counters = DqCounters.compute(df)
    val failures = DqCheck.all.flatMap(_.evaluate(counters))
    DqReport(ingestionDate, rawPath, curatedPath, counters, failures,
      warnings)
  }

  /** Row-level quarantine split — the production evolution of the
    * all-or-nothing gate: instead of failing the whole batch when a rule
    * trips, each offending ROW is diverted with a `quarantine_reason`
    * and the clean remainder flows on. Reasons mirror the gate's
    * counters, first match wins (a row with a null event_id is
    * `null_event_id` even if it is also a duplicate):
    *
    *   null_event_id / null_event_type / null_user_id — the three
    *     nullability rules;
    *   invalid_event_type — domain violation under the same negated-isin
    *     3VL as the counter (a NULL type is null_event_type, never
    *     invalid);
    *   dup_event_id — every row past the FIRST per non-null event_id,
    *     ranked ONLY among rows that pass the null/domain rules (a copy
    *     quarantined for a null user_id must not "use up" the keep slot
    *     and doom a clean later copy); among the clean copies, first =
    *     min by (event_ts, user_id, event_type) — a total order over the
    *     payload, so identical full-row copies quarantine all but one
    *     and the survivor is deterministic.
    *
    * One window over event_id (the dedup shuffle the keep-first dedup
    * already pays) + a narrow reason projection; both outputs share the
    * scan. The clean-rank is a running sum of a clean-indicator under an
    * order that sorts clean copies first — for a clean row that running
    * sum IS its rank among clean copies, so no second pass / self-join
    * is needed to rank a filtered subset. Returns
    * (valid, quarantined-with-reason). */
  def splitQuarantine(df: DataFrame,
      allowed: Seq[String] = graft.schema.EventSchema.allowedEventTypes)
      : (DataFrame, DataFrame) = {
    val clean = col("event_id").isNotNull && col("event_type").isNotNull &&
      col("user_id").isNotNull && col("event_type").isin(allowed: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(clean.cast("int").desc,
        col("event_ts"), col("user_id"), col("event_type"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tagged = df
      .withColumn("_rn",
        when(col("event_id").isNull, lit(1L))
          .otherwise(sum(clean.cast("long")).over(w)))
      .withColumn("quarantine_reason",
        when(col("event_id").isNull, "null_event_id")
          .when(col("event_type").isNull, "null_event_type")
          .when(col("user_id").isNull, "null_user_id")
          .when(!col("event_type").isin(allowed: _*), "invalid_event_type")
          .when(col("_rn") > 1, "dup_event_id"))
    (tagged.where(col("quarantine_reason").isNull)
        .drop("_rn", "quarantine_reason"),
      tagged.where(col("quarantine_reason").isNotNull).drop("_rn"))
  }
}
