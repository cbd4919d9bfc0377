package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.Snapshots

/** Structured-Streaming sink into a snapshot-versioned table
  * ([[graft.io.Snapshots]]): every micro-batch becomes one atomic
  * append commit, so BATCH readers of the table get the full snapshot
  * contract underneath a live stream — a reader pinned at version N is
  * untouched by micro-batches landing behind it, and no reader ever
  * sees a batch half-written.
  *
  * Exactly-once, precisely: the batch id is recorded INSIDE the
  * manifest dir before the atomic pointer publish
  * ([[Snapshots.commitAppend]]'s `tag`), so "applied" and "visible"
  * flip together. A replayed batch (the at-least-once window between
  * sink write and checkpoint commit that every foreachBatch sink has)
  * finds its tag and no-ops — rows can never double-append
  * (SnapshotStreamSpec replays a batch and counts versions).
  *
  * Single-writer ownership: a streaming query owns its target table
  * (the checkpoint dir is the ownership token — standard sink
  * contract). A [[Snapshots.ConcurrentCommitException]] here can
  * therefore only mean our own crashed predecessor attempt left its
  * reservation behind; the sink reclaims it and retries once, which
  * would be UNSAFE with independent concurrent writers but is exactly
  * right for the sink that is the table's sole writer.
  */
object SnapshotStream {

  /** Unit-testable core of [[sink]]. */
  def applyBatch(batch: DataFrame, batchId: Long, table: String,
      partCol: String, statsCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val tag = s"b$batchId"
    if (Snapshots.batchApplied(spark, table, tag)) return
    try {
      Snapshots.commitAppend(batch, table, partCol, statsCols, Some(tag))
      ()
    } catch {
      case _: Snapshots.ConcurrentCommitException =>
        Snapshots.breakReservation(spark, table,
          Snapshots.currentVersion(spark, table) + 1)
        Snapshots.commitAppend(batch, table, partCol, statsCols, Some(tag))
        ()
    }
  }

  def sink(stream: DataFrame, table: String, checkpoint: String,
      partCol: String, statsCols: Seq[String] = Nil): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        applyBatch(b, id, table, partCol, statsCols))
      .start()
}
