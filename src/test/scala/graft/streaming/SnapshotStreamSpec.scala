package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Snapshots

class SnapshotStreamSpec extends SparkSpec {

  private def totals(table: String): Map[String, Long] =
    Snapshots.read(spark, table).groupBy(col("day"))
      .agg(sum(col("cents")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("each micro-batch is one atomic append commit; replay is a no-op") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snapstream")
    val b0 = Seq(("e1", "d1", 10L), ("e2", "d2", 20L))
      .toDF("id", "day", "cents")
    val b1 = Seq(("e3", "d1", 5L)).toDF("id", "day", "cents")

    SnapshotStream.applyBatch(b0, 0L, t, "day")
    assert(Snapshots.currentVersion(spark, t) == 1)
    SnapshotStream.applyBatch(b1, 1L, t, "day")
    assert(Snapshots.currentVersion(spark, t) == 2)
    assert(totals(t) == Map("d1" -> 15L, "d2" -> 20L))

    // at-least-once replay of batch 1: tag found → no-op, no new
    // version, no double-append
    SnapshotStream.applyBatch(b1, 1L, t, "day")
    assert(Snapshots.currentVersion(spark, t) == 2, "replay must no-op")
    assert(totals(t) == Map("d1" -> 15L, "d2" -> 20L))

    // a batch reader pinned before batch 2 stays on its version
    val pinned = Snapshots.readAsOf(spark, t, 1)
    SnapshotStream.applyBatch(
      Seq(("e4", "d1", 100L)).toDF("id", "day", "cents"), 2L, t, "day")
    assert(pinned.agg(sum(col("cents"))).head().getLong(0) == 30L,
      "pinned reader must not see the new batch")
    assert(totals(t) == Map("d1" -> 115L, "d2" -> 20L))
  }

  test("a crashed attempt's reservation is reclaimed by the retry") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snapstream_crash")
    SnapshotStream.applyBatch(
      Seq(("e1", "d1", 1L)).toDF("id", "day", "cents"), 0L, t, "day")
    // predecessor attempt reserved v2, wrote nothing visible, died
    Snapshots.reserve(spark, t, 2)
    val b1 = Seq(("e2", "d1", 2L)).toDF("id", "day", "cents")
    SnapshotStream.applyBatch(b1, 1L, t, "day") // must reclaim + commit
    assert(Snapshots.currentVersion(spark, t) == 2)
    assert(totals(t) == Map("d1" -> 3L))
  }

  test("end-to-end over MemoryStream with the real checkpointed sink") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val t = tmpDir("snapstream_e2e")
    val input = MemoryStream[(String, String, Long)]
    val q = SnapshotStream.sink(input.toDF().toDF("id", "day", "cents"),
      t, tmpDir("snapstream_ckpt"), "day")
    try {
      input.addData(("e1", "d1", 10L), ("e2", "d2", 20L))
      q.processAllAvailable()
      input.addData(("e3", "d2", 30L))
      q.processAllAvailable()
      assert(totals(t) == Map("d1" -> 10L, "d2" -> 50L))
      assert(Snapshots.currentVersion(spark, t) >= 2)
    } finally q.stop()
  }
}
