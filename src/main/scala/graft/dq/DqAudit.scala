package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Snapshots

/** Run-history AUDIT TABLE: every pipeline run's [[DqReport]] lands as
  * one row in a snapshot-versioned table (reference `docs/design.md:
  * 147-148` values the per-date audit trail; the reference writes a
  * JSON file per run — queryable history is the roadmap gap this
  * closes). Append-only BY DESIGN: a backfill retry of a date is a new
  * ROW (run_ts distinguishes attempts), never an overwrite — the audit
  * question is "what did every attempt see", and immutable history is
  * the audit property. Partitioned by ingestion_date, so the
  * dashboard's per-date reads prune to one partition; the table itself
  * rides the full snapshot contract (atomic visibility, time travel
  * back through the audit's own history, vacuum by retention).
  *
  * Scale shape: one 1-row append per pipeline run — O(runs) metadata,
  * zero data-path cost. The counters columns are flat longs/doubles so
  * threshold scans ("which dates ever tripped the dup gate") stay
  * pushdown-friendly; failures/warnings ride as arrays.
  */
object DqAudit {

  /** Append one run's report. `runTs` is the run's wall-clock id
    * (ISO-8601; caller-supplied so replays and tests are
    * deterministic). Returns the audit table's new version.
    *
    * Concurrency: a bounded-parallel backfill has several dates
    * appending to ONE audit table, so a lost version-slot race
    * ([[Snapshots.ConcurrentCommitException]]) is expected here, not
    * exceptional — and retrying AFTER the winner publishes is exactly
    * the exception's documented contract: audit rows are independent
    * appends, so the retry simply rebases onto the winner's manifest. */
  def record(spark: SparkSession, table: String, report: DqReport,
      runTs: String): Int = {
    // wall-clock retry budget, not a count: each rival append holds the
    // slot for a full Spark write job (seconds), so N-way backfills
    // serialize N jobs behind the winner — a fixed retry COUNT with
    // millisecond sleeps starves the last writer (measured at 8-way).
    // 120 s covers any realistic audit-append convoy; past it the slot
    // is presumed orphaned by a crashed writer (fail-stop, operator
    // breaks the reservation).
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var backoff = 25L
    while (true) {
      try return recordOnce(spark, table, report, runTs)
      catch {
        case e: Snapshots.ConcurrentCommitException =>
          if (System.nanoTime() > deadline) throw e
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, 400L)
      }
    }
    -1 // unreachable
  }

  private def recordOnce(spark: SparkSession, table: String,
      report: DqReport, runTs: String): Int = {
    import spark.implicits._
    val row = Seq((
      report.ingestionDate, runTs, report.status,
      report.rawPath, report.curatedPartitionPath,
      report.counters.totalRows, report.counters.nullEventId,
      report.counters.nullEventType, report.counters.nullUserId,
      report.counters.invalidEventType, report.counters.dupExtraRows,
      report.counters.nullUserRate, report.counters.dupRate,
      report.failures, report.warnings))
      .toDF("ingestion_date", "run_ts", "status", "raw_path",
        "curated_partition_path", "total_rows", "null_event_id",
        "null_event_type", "null_user_id", "invalid_event_type",
        "dup_extra_rows", "null_user_rate", "dup_rate", "failures",
        "warnings")
    Snapshots.commitAppend(row, table, "ingestion_date")
  }

  /** The full run history, newest attempt last within each date. */
  def history(spark: SparkSession, table: String): DataFrame =
    Snapshots.read(spark, table)
      .orderBy(col("ingestion_date"), col("run_ts"))

  /** One row per date: the LATEST attempt's report — the "is this date
    * good" dashboard relation. A retry that passed supersedes the
    * failed attempt here while both remain in [[history]]. */
  def latestPerDate(spark: SparkSession, table: String): DataFrame = {
    val df = Snapshots.read(spark, table)
    val rest = df.columns.filterNot(_ == "ingestion_date")
    df.groupBy(col("ingestion_date"))
      .agg(max_by(struct(rest.map(col).toIndexedSeq: _*), col("run_ts"))
        .as("r"))
      .select(col("ingestion_date") +: rest.map(c => col(s"r.$c")): _*)
  }
}
