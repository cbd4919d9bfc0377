package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.dq.{DqCheck, DqCounters, DqReport}

/** SURVEY §7.4 closure: the streaming D1–D6 gate must produce, per
  * sealed event-time window, EXACTLY the counters the batch
  * [[DqCounters.compute]] yields on that window's rows — and emit each
  * window's report exactly once, surviving a restart from the same
  * checkpoint without duplicating or rewriting.
  */
class StreamingDqSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // hour 10: every counter class fires — dup ids, a NULL-id pair (one
  // group!), null type, invalid type, null user. hour 11: clean.
  private val h10 = Seq(
    (ts("2024-01-01 10:05:00"), "e1", "login", "u1"),
    (ts("2024-01-01 10:10:00"), "e1", "login", "u2"),
    (ts("2024-01-01 10:15:00"), null: String, "view_item", "u3"),
    (ts("2024-01-01 10:20:00"), null: String, "view_item", "u4"),
    (ts("2024-01-01 10:25:00"), "e2", null: String, "u5"),
    (ts("2024-01-01 10:30:00"), "e3", "error", "u6"),
    (ts("2024-01-01 10:35:00"), "e4", "login", null: String))
  private val h11 = Seq(
    (ts("2024-01-01 11:05:00"), "e10", "login", "u1"),
    (ts("2024-01-01 11:10:00"), "e11", "view_item", "u2"))

  private def listReports(dir: String): Map[String, String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.endsWith(".json"))
      .map(f => f.getName ->
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .toMap
  }

  test("streaming windowed counters equal batch DqCounters per sealed " +
      "window; reports emit exactly once across a restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val reportDir = tmpDir("stream-dq-reports")
    val checkpoint = tmpDir("stream-dq-ckpt")

    val input = MemoryStream[(Timestamp, String, String, String)]
    def gate() = StreamingDq.startGate(
      input.toDF().toDF("event_ts", "event_id", "event_type", "user_id"),
      reportDir, checkpoint, windowDur = "1 hour",
      watermark = "30 minutes", trigger = Trigger.ProcessingTime(0L))

    val q = gate()
    try {
      input.addData(h10 ++ h11: _*)
      q.processAllAvailable()
      // sentinel rounds: the watermark computed from batch N seals
      // windows in batch N+1 (and the chained aggregation adds one
      // more hop), so push late sentinels until both hours emit
      var round = 0
      while (listReports(reportDir).size < 2 && round < 5) {
        input.addData((ts("2024-01-01 13:00:00"), s"sent$round", "login",
          "ux"))
        q.processAllAvailable()
        round += 1
      }
    } finally q.stop()

    val reports = listReports(reportDir)
    assert(reports.keySet == Set("dq_20240101_100000.json",
      "dq_20240101_110000.json"), s"got ${reports.keySet}")

    // batch parity: recompute each window's counters with the BATCH
    // gate over the same rows and demand byte-identical reports
    def expectJson(rows: Seq[(Timestamp, String, String, String)],
        start: String): String = {
      val df = rows.toDF("event_ts", "event_id", "event_type", "user_id")
      val c = DqCounters.compute(df)
      DqReport(start, "<stream>", reportDir, c,
        DqCheck.all.flatMap(_.evaluate(c))).toJson
    }
    assert(reports("dq_20240101_100000.json") ==
      expectJson(h10, "2024-01-01 10:00:00.0"))
    assert(reports("dq_20240101_110000.json") ==
      expectJson(h11, "2024-01-01 11:00:00.0"))
    // the dirty hour FAILED the gate, the clean hour PASSED
    assert(reports("dq_20240101_100000.json").contains("\"status\": \"FAIL\""))
    assert(reports("dq_20240101_110000.json").contains("\"status\": \"PASS\""))

    // restart from the same checkpoint: nothing replays, nothing
    // duplicates — the report set is unchanged byte for byte
    val q2 = gate()
    try q2.processAllAvailable() finally q2.stop()
    assert(listReports(reportDir) == reports)
  }

  test("windowedCounters dup accounting matches the batch formula when " +
      "every id is distinct (dup_extra = 0)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String, String, String)]
    val q = StreamingDq.windowedCounters(
        input.toDF().toDF("event_ts", "event_id", "event_type", "user_id"),
        "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("sdq_counters")
      .outputMode("append").start()
    try {
      input.addData(h11: _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:00:00"), "z1", "login", "ux"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:30:00"), "z2", "login", "ux"))
      q.processAllAvailable()
      val rows = s.table("sdq_counters")
        .where(col("window_start") === ts("2024-01-01 11:00:00"))
        .collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("total_rows") == 2L)
      assert(rows.head.getAs[Long]("dup_extra_rows") == 0L)
    } finally q.stop()
  }
}
