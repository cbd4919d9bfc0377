package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts: tumbling windows aggregate by event_type; " +
      "watermark drops too-late rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedCounts(events, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:15:00"), "click", 2.0),
        (ts("2024-01-01 10:20:00"), "view", 3.0))
      q.processAllAvailable()
      // advance event time beyond 10:00–11:00 + 30 min watermark → closes it
      input.addData((ts("2024-01-01 11:45:00"), "click", 4.0))
      q.processAllAvailable()
      // this row is older than the watermark → must be dropped
      input.addData((ts("2024-01-01 10:01:00"), "click", 99.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:30:00"), "click", 5.0))
      q.processAllAvailable()
      val rows = s.table("wc")
        .select("window_start", "event_type", "n", "sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)),
        s"got $rows") // the 99.0 late row did NOT count
      assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("approxDistinctUsers: streaming KMV equals the batch sketch, " +
      "state stays at k hashes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val k = 16
    val input = MemoryStream[(String, java.lang.Long)]
    val events = input.toDF().toDF("event_type", "user_id")
    val q = Streaming.approxDistinctUsers(events, k)
      .writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    try {
      // two micro-batches, overlapping ids + a null (must be ignored);
      // 30 distinct users > k → estimate path, not exact path
      input.addData((1L to 20L).map(i => ("click", java.lang.Long.valueOf(i)))
        :+ (("click", null: java.lang.Long)): _*)
      q.processAllAvailable()
      input.addData((11L to 30L).map(i =>
        ("click", java.lang.Long.valueOf(i))): _*)
      q.processAllAvailable()
      val last = s.table("kmv").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .lastOption.getOrElse(fail("no output"))
      // batch-side expectation: same hash (low 60 bits of little-endian
      // MD5 = SimHashImpl.tokenHash masked), same k-min formula
      val hashes = (1L to 30L)
        .map(i => graft.functions.SimHashImpl.tokenHash(
          org.apache.spark.unsafe.types.UTF8String.fromString(i.toString))
          & 0xFFFFFFFFFFFFFFFL)
        .distinct.sorted.take(k)
      val expected =
        math.floor((k - 1).toDouble * 1152921504606846976.0
          / hashes.last.toDouble).toLong
      assert(last == (("click", k, expected)),
        s"stream sketch must equal batch sketch, got $last")
    } finally q.stop()
  }

  test("streamingQuantiles: digest state serves in-envelope estimates " +
      "across micro-batches, count exact") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rnd = new scala.util.Random(19)
    val data = Array.fill(6000)(math.exp(rnd.nextGaussian()))
    val input = MemoryStream[(String, java.lang.Double)]
    val events = input.toDF().toDF("event_type", "value")
    val q = Streaming.streamingQuantiles(events)
      .writeStream.format("memory").queryName("tdq")
      .outputMode("update").start()
    try {
      // three micro-batches plus a null (ignored); state must absorb
      // each batch into ONE digest, never re-see prior raw rows
      data.grouped(2000).foreach { chunk =>
        input.addData(chunk.map(v =>
          ("click", java.lang.Double.valueOf(v))).toSeq
          :+ (("click", null: java.lang.Double)): _*)
        q.processAllAvailable()
      }
      val last = s.table("tdq").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).lastOption.getOrElse(fail("no output"))
      assert(last._1 == "click" && last._2 == 6000L,
        s"count must be exact: $last")
      for ((est, qq) <- Seq(last._3 -> 0.5, last._4 -> 0.99)) {
        val below = data.count(_ < est).toDouble
        val atOrBelow = data.count(_ <= est).toDouble
        val target = qq * data.length
        val d = if (target < below) below - target
                else if (target > atOrBelow) target - atOrBelow else 0.0
        assert(d / data.length <= 0.015,
          s"streaming rank error ${d / data.length} at q=$qq")
      }
    } finally q.stop()
  }

  test("windowedDqCounters: per-window null counters match batch semantics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val events = input.toDF().toDF("ts", "user_id", "event_type")
    val q = Streaming.windowedDqCounters(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("dqw")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 09:10:00"), "u1", "click"),
        (ts("2024-01-01 09:20:00"), null, "view"),
        (ts("2024-01-01 09:30:00"), "u2", null))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:30:00"), "u3", "click"))
      q.processAllAvailable()
      val rows = s.table("dqw").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(rows.contains(("2024-01-01 09:00:00.0", 3L, 1L, 1L)),
        s"got $rows")
    } finally q.stop()
  }

  test("sessionize: gap-based sessions close via event-time timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Streaming.SessionEvent]
    val q = Streaming.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then silence
      input.addData(
        Streaming.SessionEvent(1L, ts("2024-01-01 08:00:00")),
        Streaming.SessionEvent(1L, ts("2024-01-01 08:10:00")),
        Streaming.SessionEvent(2L, ts("2024-01-01 08:05:00")))
      q.processAllAvailable()
      // advance watermark far past user 1's gap → session times out
      input.addData(Streaming.SessionEvent(3L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData(Streaming.SessionEvent(3L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val sessions = s.table("sess").as[Streaming.UserSession].collect()
        .map(u => u.user_id -> u).toMap
      assert(sessions.contains(1L), s"got ${sessions.keySet}")
      assert(sessions(1L).n_events == 2)
      assert(sessions(1L).session_start == ts("2024-01-01 08:00:00"))
      assert(sessions(1L).session_end == ts("2024-01-01 08:10:00"))
      assert(sessions.contains(2L) && sessions(2L).n_events == 1)
    } finally q.stop()
  }

  test("sessionize: out-of-order in-watermark event forms its OWN session, " +
      "not a merge into a later one") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Streaming.SessionEvent]
    val q = Streaming.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      // batch 1: event at 10:00
      input.addData(Streaming.SessionEvent(1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: LATE but in-watermark event at 09:10 — 50 min before the
      // 10:00 session, beyond the 30-min gap → must be its own session
      input.addData(Streaming.SessionEvent(1L, ts("2024-01-01 09:10:00")))
      q.processAllAvailable()
      // advance watermark far enough to seal both sessions
      input.addData(Streaming.SessionEvent(9L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      input.addData(Streaming.SessionEvent(9L, ts("2024-01-01 18:00:00")))
      q.processAllAvailable()
      val sessions = s.table("sess_ooo").as[Streaming.UserSession].collect()
        .filter(_.user_id == 1L)
        .map(u => (u.session_start.toString, u.session_end.toString,
          u.n_events)).toSet
      assert(sessions == Set(
        ("2024-01-01 09:10:00.0", "2024-01-01 09:10:00.0", 1),
        ("2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0", 1)),
        s"got $sessions")
    } finally q.stop()
  }

  test("sessionize: adjacent out-of-order event EXTENDS the session start") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Streaming.SessionEvent]
    val q = Streaming.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_ext")
      .outputMode("append").start()
    try {
      input.addData(Streaming.SessionEvent(1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // 09:50 is within the 30-min gap of [10:00, 10:00] → one session
      // starting at 09:50
      input.addData(Streaming.SessionEvent(1L, ts("2024-01-01 09:50:00")))
      q.processAllAvailable()
      input.addData(Streaming.SessionEvent(9L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      input.addData(Streaming.SessionEvent(9L, ts("2024-01-01 18:00:00")))
      q.processAllAvailable()
      val sessions = s.table("sess_ext").as[Streaming.UserSession].collect()
        .filter(_.user_id == 1L)
        .map(u => (u.session_start.toString, u.session_end.toString,
          u.n_events)).toSet
      assert(sessions == Set(
        ("2024-01-01 09:50:00.0", "2024-01-01 10:00:00.0", 2)),
        s"got $sessions")
    } finally q.stop()
  }

  test("dedupWithinWatermark: one row per id survives; state is evicted " +
      "after the watermark passes (a re-sent id then flows through again)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = Streaming.dedupWithinWatermark(events, "event_id", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:00:30"), 1.0), // in-batch duplicate
        (2L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:02:00"), 1.0)) // cross-batch dup
      q.processAllAvailable()
      assert(s.table("dedup_stream").count() == 2) // ids {1, 2} once each
      // advance the watermark far past id 1's last occurrence → evicted;
      // a much-later resend of the id is a NEW event by contract
      input.addData((3L, ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 12:01:00"), 9.0))
      q.processAllAvailable()
      val ones = s.table("dedup_stream")
        .where(col("event_id") === 1L).count()
      assert(ones == 2, "expected the post-eviction resend to pass through")
    } finally q.stop()
  }

  test("clickToPurchase: stream-stream join pairs within the hour window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val q = Streaming.clickToPurchase(
        clicks.toDF().toDF("user_id", "ts"),
        purchases.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("c2p")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:00")))
      purchases.addData(
        (1L, ts("2024-01-01 10:30:00"), 9.99),   // within the hour → match
        (2L, ts("2024-01-01 12:30:00"), 5.0))    // 2.5 h later → no match
      q.processAllAvailable()
      // advance both watermarks so results are final (distinct users so
      // the advancer rows cannot join each other)
      clicks.addData((98L, ts("2024-01-01 15:00:00")))
      purchases.addData((99L, ts("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      val rows = s.table("c2p")
        .select("user_id", "value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 9.99)), s"got $rows")
    } finally q.stop()
  }

  test("clickToPurchase honors a non-default pairWindow") {
    val s = spark
    import s.implicits._
    // Batch mode (withWatermark is a no-op there) isolates the window
    // arithmetic: a 2-hour attribution window must pair the purchase
    // that the default 1-hour window rejects.
    val clicks = Seq((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 11:30:00"), 9.99), // 1.5 h after the click
      (2L, ts("2024-01-01 12:30:00"), 5.0))  // 2.5 h — outside even 2 h
      .toDF("user_id", "ts", "value")
    val narrow = Streaming.clickToPurchase(clicks, purchases)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(narrow == Set.empty[Long], s"1h default must reject both")
    val wide = Streaming.clickToPurchase(clicks, purchases,
      watermark = "1 hour", pairWindow = "2 hours")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(wide == Set(1L), s"2h window must pair user 1 only, got $wide")
  }

  test("same transforms run over the rate source (source-agnostic)") {
    val s = spark
    // Identical transform code as the MemoryStream/file tests — only the
    // source line differs. Complete mode so windows surface without
    // waiting for the watermark to pass wall-clock window ends.
    val counts = Streaming.windowedCounts(
      Streaming.rateEvents(s), "10 seconds", "5 seconds")
    val q = counts.writeStream.format("memory").queryName("rate_wc")
      .outputMode("complete").start()
    val q2 = Streaming.dedupWithinWatermark(
        Streaming.rateEvents(s), "event_id", "5 seconds")
      .writeStream.format("memory").queryName("rate_dedup")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def n1 = s.table("rate_wc").count()
      def n2 = s.table("rate_dedup").count()
      while ((n1 == 0 || n2 == 0) && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(n1 > 0, "windowedCounts must aggregate rate-source rows")
      assert(n2 > 0, "dedupWithinWatermark must pass rate-source rows")
      // the adapter delivered the full events shape through the transform
      assert(s.table("rate_wc").columns.toSeq ==
        Seq("window_start", "event_type", "n", "sum_value"))
      val types = s.table("rate_wc").select("event_type").distinct()
        .collect().map(_.getString(0)).toSet
      assert(types.subsetOf(Set("click", "view", "purchase")))
    } finally { q.stop(); q2.stop() }
  }

  test("same transform runs in batch mode (source-agnostic)") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:15:00"), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = Streaming.windowedCounts(batch).collect()
    assert(out.length == 1 && out(0).getLong(2) == 2L)
  }

  test("foreachBatch upsert sink: a replayed batch overwrites itself " +
      "instead of duplicating") {
    val s = spark
    import s.implicits._
    val target = tmpDir("graft-upsert")
    Streaming.upsertBatch(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), 0, target)
    Streaming.upsertBatch(Seq(("c", 3L)).toDF("k", "v"), 1, target)
    assert(s.read.parquet(target).count() == 3)
    // the at-least-once window: batch 1 re-delivered (same id, same data)
    Streaming.upsertBatch(Seq(("c", 3L)).toDF("k", "v"), 1, target)
    val rows = s.read.parquet(target).select("k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("a", 1L), ("b", 2L), ("c", 3L)))
    // other batches are untouched by the replay
    assert(s.read.parquet(target).where(col("_batch_id") === 0).count() == 2)
  }

  test("foreachBatch upsert sink runs end-to-end over a stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val target = tmpDir("graft-upsert-e2e")
    val input = MemoryStream[(String, Long)]
    val q = Streaming.startIdempotentSink(
      input.toDF().toDF("k", "v"), target, tmpDir("graft-upsert-ckpt"))
    try {
      input.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      input.addData(("c", 3L))
      q.processAllAvailable()
      val got = s.read.parquet(target).select("k", "v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("a", 1L), ("b", 2L), ("c", 3L)))
    } finally q.stop()
  }
}
