package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dq.Dq

/** Row-level DQ quarantine ON THE STREAM: every micro-batch splits
  * through the same [[graft.dq.Dq.splitQuarantine]] the batch pipeline
  * runs (null rules, domain rule, keep-first dedup — reason priorities
  * identical by construction: it IS the same function), and each half
  * lands in its own snapshot table as one tagged atomic append
  * ([[SnapshotStream.applyBatch]]):
  *
  *   - valid rows    → the curated table, partitioned by event_type
  *     (all non-null by the very rule that validated them);
  *   - quarantined   → the quarantine table, partitioned by
  *     quarantine_reason — the triage dashboard's access path (reads
  *     of one reason prune to its partition).
  *
  * Exactly-once per TABLE, not per batch-as-a-whole: each table checks
  * the batch tag independently, so a crash between the two appends
  * replays into "curated no-ops (tag found), quarantine lands" — rows
  * can never double-append to either table, and both tables converge
  * after the replay (StreamingQuarantineSpec kills exactly that
  * window).
  *
  * Scope: the dedup rule is BATCH-LOCAL here, exactly as the
  * micro-batch boundary defines it — a copy arriving in a later batch
  * is a new row to this operator. Cross-batch exact dedup against the
  * standing corpus is [[StreamingDedup]]'s job (anti-join against the
  * committed key store); composing the two (quarantine → dedup) is the
  * production layout.
  */
object StreamingQuarantine {

  /** Unit-testable core of [[sink]]. */
  def applyBatch(batch: DataFrame, batchId: Long, curatedTable: String,
      quarantineTable: String): Unit = {
    val (valid, quarantined) = Dq.splitQuarantine(batch)
    SnapshotStream.applyBatch(valid, batchId, curatedTable, "event_type")
    SnapshotStream.applyBatch(quarantined, batchId, quarantineTable,
      "quarantine_reason")
  }

  def sink(stream: DataFrame, curatedTable: String,
      quarantineTable: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        applyBatch(b, id, curatedTable, quarantineTable))
      .start()
}
