package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dq.Dq
import graft.io.Snapshots

/** DQ quarantine on the stream: the streamed split must equal the
  * batch [[Dq.splitQuarantine]] over the same rows (same valid set,
  * same reasons), land exactly-once in BOTH snapshot tables across a
  * replay, and keep the quarantine table partitioned by reason for
  * pruned triage reads.
  */
class StreamingQuarantineSpec extends SparkSpec {

  // batch-local fixtures: each micro-batch carries its own dirt (a dup
  // pair, a null user, an invalid type, a null event id) — dup
  // semantics are batch-scoped by contract, so dups never straddle
  // batches here (cross-batch dedup is StreamingDedup's job)
  private def batch0: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("e1", "u1", "purchase", "2025-01-01 09:00:00"),
      ("e1", "u1", "purchase", "2025-01-01 10:00:00"), // dup copy
      ("e2", null, "login", "2025-01-01 11:00:00"), // null user
      ("e3", "u3", "login", "2025-01-01 12:00:00"))
      .toDF("event_id", "user_id", "event_type", "event_ts")
      .withColumn("event_ts", to_timestamp(col("event_ts")))
  }

  private def batch1: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("e4", "u4", "hacked", "2025-01-02 09:00:00"), // invalid type
      (null, "u5", "login", "2025-01-02 10:00:00"), // null event id
      ("e6", "u6", "purchase", "2025-01-02 11:00:00"))
      .toDF("event_id", "user_id", "event_type", "event_ts")
      .withColumn("event_ts", to_timestamp(col("event_ts")))
  }

  private def keyed(df: DataFrame): Set[(String, String, String)] =
    df.select(coalesce(col("event_id"), lit("<null>")),
        coalesce(col("user_id"), lit("<null>")),
        col("event_ts").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

  test("streamed quarantine equals the batch split per batch; replay " +
      "no-ops on BOTH tables; reason partitions prune") {
    val cur = tmpDir("squar_cur")
    val quar = tmpDir("squar_quar")

    StreamingQuarantine.applyBatch(batch0, 0L, cur, quar)
    StreamingQuarantine.applyBatch(batch1, 1L, cur, quar)

    // stream ≡ batch: the streamed tables hold exactly the union of
    // the per-batch batch-mode splits
    val (v0, q0) = Dq.splitQuarantine(batch0)
    val (v1, q1) = Dq.splitQuarantine(batch1)
    assert(keyed(Snapshots.read(spark, cur)) ==
      keyed(v0.unionByName(v1)), "valid sets must match batch mode")
    assert(keyed(Snapshots.read(spark, quar)) ==
      keyed(q0.unionByName(q1)), "quarantine sets must match batch mode")
    val reasons = Snapshots.read(spark, quar)
      .groupBy(col("quarantine_reason")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons == Map("dup_event_id" -> 1L, "null_user_id" -> 1L,
      "invalid_event_type" -> 1L, "null_event_id" -> 1L), s"$reasons")

    // fully-applied replay: both tags found, both tables no-op
    val curV = Snapshots.currentVersion(spark, cur)
    val quarV = Snapshots.currentVersion(spark, quar)
    StreamingQuarantine.applyBatch(batch1, 1L, cur, quar)
    assert(Snapshots.currentVersion(spark, cur) == curV,
      "replayed batch must not re-commit curated")
    assert(Snapshots.currentVersion(spark, quar) == quarV,
      "replayed batch must not re-commit quarantine")
    assert(Snapshots.read(spark, quar).count() == 4)
    assert(Snapshots.read(spark, cur).count() == 3)

    // the REAL crash window: batch 2's curated append confirmed, then
    // the writer died before the quarantine append — the replay must
    // no-op curated (tag found) and land ONLY the quarantine half
    val s2 = spark
    import s2.implicits._
    val batch2 = Seq(
      ("e7", "u7", "login", "2025-01-03 09:00:00"),
      ("e8", null, "login", "2025-01-03 10:00:00"))
      .toDF("event_id", "user_id", "event_type", "event_ts")
      .withColumn("event_ts", to_timestamp(col("event_ts")))
    SnapshotStream.applyBatch(Dq.splitQuarantine(batch2)._1, 2L, cur,
      "event_type") // the half that survived the crash
    val curV2 = Snapshots.currentVersion(spark, cur)
    StreamingQuarantine.applyBatch(batch2, 2L, cur, quar) // the replay
    assert(Snapshots.currentVersion(spark, cur) == curV2,
      "replay after a half-applied crash must not double-append curated")
    assert(Snapshots.read(spark, cur).count() == 4)
    assert(Snapshots.read(spark, quar)
      .where(col("event_id") === "e8" &&
        col("quarantine_reason") === "null_user_id").count() == 1,
      "the lost quarantine half must land on replay")
    assert(Snapshots.read(spark, quar).count() == 5)

    // triage read of ONE reason prunes to its partition's files
    val m = Snapshots.readManifest(spark, quar,
      Snapshots.currentVersion(spark, quar))
    val dupFiles = m.filter(_.partition == "dup_event_id").map(_.path)
    assert(dupFiles.nonEmpty && dupFiles.size < m.size,
      "reason partitions must subdivide the quarantine table")
  }

  test("end-to-end over MemoryStream with the real checkpointed sink") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val cur = tmpDir("squar_e2e_cur")
    val quar = tmpDir("squar_e2e_quar")
    val input = MemoryStream[(String, String, String, String)]
    val q = StreamingQuarantine.sink(
      input.toDF().toDF("event_id", "user_id", "event_type", "ets")
        .withColumn("event_ts", to_timestamp(col("ets"))).drop("ets"),
      cur, quar, tmpDir("squar_ckpt"))
    try {
      input.addData(
        ("e1", "u1", "purchase", "2025-01-01 09:00:00"),
        ("e2", null, "login", "2025-01-01 10:00:00"))
      q.processAllAvailable()
      input.addData(("e3", "u3", "hacked", "2025-01-01 11:00:00"))
      q.processAllAvailable()
      assert(Snapshots.read(spark, cur).count() == 1)
      val reasons = Snapshots.read(spark, quar)
        .select(col("quarantine_reason")).collect()
        .map(_.getString(0)).sorted.toSeq
      assert(reasons == Seq("invalid_event_type", "null_user_id"))
    } finally q.stop()
  }
}
