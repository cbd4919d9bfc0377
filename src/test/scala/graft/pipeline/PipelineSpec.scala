package graft.pipeline

import java.io.File

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.gen.EventsGen
import graft.io.{Catalog, RawEvents}

/** End-to-end pipeline tests against local temp dirs (SURVEY §5.2.3):
  * idempotency, partition isolation, fail-safe ordering, late data. */
class PipelineSpec extends SparkSpec {

  private def freshConf(): PipelineConfig = {
    val base = tmpDir("graft-pipe")
    PipelineConfig(s"$base/raw", s"$base/curated", s"$base/metrics")
  }

  // n=1000 like the reference (generate_events.py:14): at smaller n the
  // 2% null-user injection has enough variance to trip the 3% DQ gate.
  private def gen(conf: PipelineConfig, date: String, n: Int = 1000): Unit =
    EventsGen.writeNdjson(EventsGen.generateDay(date, nEvents = n),
      conf.rawBase, date)

  private def curated(conf: PipelineConfig, date: String): DataFrame =
    spark.read.parquet(
      RawEvents.partitionPath(conf.curatedBase, date))

  private def rowSet(df: DataFrame): Set[String] =
    df.selectExpr("event_id", "user_id", "event_type",
      "cast(event_ts as string)", "cast(amount as string)")
      .collect().map(_.mkString("|")).toSet

  test("end-to-end: gen → ingest → DQ pass → curated partition written") {
    val conf = freshConf()
    gen(conf, "2025-01-01")
    val report = Pipeline.runPartition(spark, conf, "2025-01-01")
    assert(report.status == "PASS")
    assert(report.counters.totalRows == 1010) // 1000 + 10 injected dupes
    val out = curated(conf, "2025-01-01")
    assert(out.count() == 1010)
    // curated schema: event_ts became timestamp, processing_ts added
    assert(out.schema("event_ts").dataType.typeName == "timestamp")
    assert(out.columns.contains("processing_ts"))
    // report artifact is a single exact-name JSON file
    val f = new File(RawEvents.partitionPath(conf.metricsBase, "2025-01-01"),
      "data_quality.json")
    assert(f.isFile)
    val json = scala.io.Source.fromFile(f).mkString
    assert(json.contains("\"status\": \"PASS\""))
  }

  test("idempotency: re-running the same date yields the identical row set") {
    val conf = freshConf()
    gen(conf, "2025-01-01")
    Pipeline.runPartition(spark, conf, "2025-01-01")
    val first = rowSet(curated(conf, "2025-01-01"))
    Pipeline.runPartition(spark, conf, "2025-01-01")
    val second = rowSet(curated(conf, "2025-01-01"))
    assert(first == second)
  }

  test("partition isolation: rewriting date X leaves date Y untouched") {
    val conf = freshConf()
    gen(conf, "2025-01-01")
    gen(conf, "2025-01-02")
    Pipeline.backfill(spark, conf, "2025-01-01", "2025-01-02")
    val yFilesBefore =
      new File(RawEvents.partitionPath(conf.curatedBase, "2025-01-02"))
        .listFiles().map(f => f.getName -> f.lastModified()).toSet
    Pipeline.runPartition(spark, conf, "2025-01-01") // rewrite X only
    val yFilesAfter =
      new File(RawEvents.partitionPath(conf.curatedBase, "2025-01-02"))
        .listFiles().map(f => f.getName -> f.lastModified()).toSet
    assert(yFilesBefore == yFilesAfter)
  }

  test("late data: re-run after late file lands reflects the union") {
    val conf = freshConf()
    gen(conf, "2025-01-02")
    Pipeline.runPartition(spark, conf, "2025-01-02")
    assert(curated(conf, "2025-01-02").count() == 1010)
    // late batch lands in the SAME raw partition (add_late_events.py:12-17)
    EventsGen.writeNdjson(EventsGen.generateLate("2025-01-02", nEvents = 50),
      conf.rawBase, "2025-01-02", fileName = "late_events.json")
    Pipeline.runPartition(spark, conf, "2025-01-02")
    assert(curated(conf, "2025-01-02").count() == 1060)
  }

  test("fail-safe ordering: DQ failure writes report but leaves curated intact") {
    val conf = freshConf()
    gen(conf, "2025-01-01")
    Pipeline.runPartition(spark, conf, "2025-01-01")
    val before = rowSet(curated(conf, "2025-01-01"))
    // poison the partition: a file whose rows all have null event_id
    val bad = EventsGen.generateDay("2025-01-01", nEvents = 5)
      .map(_.copy(event_id = null))
    EventsGen.writeNdjson(bad, conf.rawBase, "2025-01-01",
      fileName = "bad_events.json")
    val ex = intercept[DqFailedException] {
      Pipeline.runPartition(spark, conf, "2025-01-01")
    }
    // 5 generated + 1 injected duplicate = 6 poison rows
    assert(ex.report.counters.nullEventId == 6)
    assert(ex.getMessage.contains("event_id has nulls: 6"))
    // curated untouched (ref fail-safe ordering docs/design.md:109-114)
    assert(rowSet(curated(conf, "2025-01-01")) == before)
    // FAIL report persisted before the raise (ref :131-150)
    val json = scala.io.Source.fromFile(new File(
      RawEvents.partitionPath(conf.metricsBase, "2025-01-01"),
      "data_quality.json")).mkString
    assert(json.contains("\"status\": \"FAIL\""))
    assert(json.contains("failures"))
  }

  test("quarantine mode: bad rows divert with reasons, clean rows land, " +
      "report PASSes with warnings") {
    val conf = freshConf()
    val qBase = s"${new File(conf.rawBase).getParent}/quarantine"
    gen(conf, "2025-01-01")
    // poison file: nulls + a domain violation (few enough to stay
    // under the 10% quarantine-rate gate)
    val bad = EventsGen.generateDay("2025-01-01", nEvents = 4)
    val poisoned = Seq(
      bad(0).copy(event_id = null),
      bad(1).copy(user_id = None),
      bad(2).copy(event_type = null),
      bad(3).copy(event_type = "hack"))
    EventsGen.writeNdjson(poisoned, conf.rawBase, "2025-01-01",
      fileName = "poison.json")
    val report = Pipeline.runPartitionQuarantine(spark, conf,
      "2025-01-01", qBase)
    assert(report.status == "PASS")
    assert(report.warnings.exists(_.contains("null_event_id")))
    assert(report.warnings.exists(_.contains("invalid_event_type")))
    val q = spark.read.parquet(
      RawEvents.partitionPath(qBase, "2025-01-01"))
    val reasons = q.groupBy("quarantine_reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // generateDay injects ~1% duplicate ids (10 for n=1000) + the
    // poison file's one dup of its own rows
    assert(reasons("null_event_id") >= 1L)
    assert(reasons("null_user_id") >= 1L)
    assert(reasons("null_event_type") >= 1L)
    assert(reasons("invalid_event_type") >= 1L)
    assert(reasons("dup_event_id") >= 10L)
    val out = curated(conf, "2025-01-01")
    // clean output: no nulls, no dups, domain intact
    assert(out.where("event_id IS NULL OR user_id IS NULL " +
      "OR event_type IS NULL").count() == 0)
    assert(out.count() ==
      out.select("event_id").distinct().count())
    // diversion is lossless: curated + quarantined = input
    assert(out.count() + q.count() == report.counters.totalRows)
  }

  test("quarantine mode: a feed-level failure (rate > max) still gates") {
    val conf = freshConf()
    val qBase = s"${new File(conf.rawBase).getParent}/quarantine"
    // 100% poison: every row has a null user
    val bad = EventsGen.generateDay("2025-01-01", nEvents = 20)
      .map(_.copy(user_id = None))
    EventsGen.writeNdjson(bad, conf.rawBase, "2025-01-01")
    val ex = intercept[DqFailedException] {
      Pipeline.runPartitionQuarantine(spark, conf, "2025-01-01", qBase)
    }
    assert(ex.getMessage.contains("quarantine rate"))
    // fail-safe: neither curated nor quarantine written
    assert(!new File(
      RawEvents.partitionPath(conf.curatedBase, "2025-01-01")).exists())
    assert(!new File(
      RawEvents.partitionPath(qBase, "2025-01-01")).exists())
  }

  test("readmission: a relaxed rule drains exactly the now-legal rows; " +
      "curated collisions stay quarantined as dups") {
    val conf = freshConf()
    val qBase = s"${new File(conf.rawBase).getParent}/quarantine"
    gen(conf, "2025-01-01")
    // fresh, feed-unique ids so the drain is attributable row-by-row
    val bad = EventsGen.generateDay("2025-01-01", nEvents = 3)
    val poisoned = Seq(
      bad(0).copy(event_id = "rx-hack", event_type = "hack"),
      bad(1).copy(event_id = "rx-promo", event_type = "promo"),
      bad(2).copy(event_id = "rx-nouser", user_id = None))
    EventsGen.writeNdjson(poisoned, conf.rawBase, "2025-01-01",
      fileName = "poison.json")
    Pipeline.runPartitionQuarantine(spark, conf, "2025-01-01", qBase)
    def quarReasons(): Map[String, Long] = spark.read
      .parquet(RawEvents.partitionPath(qBase, "2025-01-01"))
      .groupBy("quarantine_reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = quarReasons()
    assert(before("invalid_event_type") == 2L) // hack + promo
    val curatedBefore = curated(conf, "2025-01-01").count()
    val total = curatedBefore +
      before.values.sum // diversion is lossless, pin it across replays

    // 'hack' becomes legal; only invalid_event_type rows re-examined
    val rep = Pipeline.readmitQuarantine(spark, conf, "2025-01-01", qBase,
      reasons = Seq("invalid_event_type"),
      allowed = graft.schema.EventSchema.allowedEventTypes :+ "hack")
    assert(rep.status == "PASS")
    assert(rep.warnings.exists(_.startsWith("readmitted 1 rows")))
    val out = curated(conf, "2025-01-01")
    assert(out.where("event_id = 'rx-hack'").count() == 1L,
      "the now-legal row must land in curated")
    assert(out.count() == curatedBefore + 1)
    val after = quarReasons()
    assert(after("invalid_event_type") == 1L, "promo stays quarantined")
    assert(after.getOrElse("null_user_id", 0L) ==
      before.getOrElse("null_user_id", 0L),
      "out-of-scope reasons must not be touched")
    assert(after.getOrElse("dup_event_id", 0L) ==
      before.getOrElse("dup_event_id", 0L))
    assert(out.count() + after.values.sum == total, "lossless replay")

    // dup copies re-examined: each id already lives in curated, so the
    // collision anti-join keeps every one quarantined — nothing drains
    val rep2 = Pipeline.readmitQuarantine(spark, conf, "2025-01-01", qBase,
      reasons = Seq("dup_event_id"))
    assert(rep2.warnings.exists(_.startsWith("readmitted 0 rows")))
    assert(curated(conf, "2025-01-01").count() == curatedBefore + 1)
    assert(quarReasons().getOrElse("dup_event_id", 0L) ==
      before.getOrElse("dup_event_id", 0L))

    // idempotency: replaying the same relaxation drains nothing new
    val rep3 = Pipeline.readmitQuarantine(spark, conf, "2025-01-01", qBase,
      reasons = Seq("invalid_event_type"),
      allowed = graft.schema.EventSchema.allowedEventTypes :+ "hack")
    assert(rep3.warnings.exists(_.startsWith("readmitted 0 rows")))
    assert(quarReasons() == after)
  }

  test("missing upstream partition fails distinctly (sensor C4)") {
    val conf = freshConf()
    intercept[MissingUpstreamException] {
      Pipeline.runPartition(spark, conf, "2025-03-01")
    }
  }

  test("invalid date argument fails fast (C1)") {
    val conf = freshConf()
    intercept[IllegalArgumentException] {
      Pipeline.runPartition(spark, conf, "2025/01/01")
    }
    intercept[IllegalArgumentException] {
      Pipeline.runPartition(spark, conf, "2025-13-45")
    }
  }

  test("backfill: sequential, stops on first failing date") {
    val conf = freshConf()
    gen(conf, "2025-01-01")
    // 2025-01-02 poisoned → backfill must process 01, fail on 02, not touch 03
    val bad = EventsGen.generateDay("2025-01-02", nEvents = 5)
      .map(_.copy(event_type = "hack"))
    EventsGen.writeNdjson(bad, conf.rawBase, "2025-01-02")
    gen(conf, "2025-01-03")
    intercept[DqFailedException] {
      Pipeline.backfill(spark, conf, "2025-01-01", "2025-01-03")
    }
    assert(curated(conf, "2025-01-01").count() == 1010)
    assert(!new File(
      RawEvents.partitionPath(conf.curatedBase, "2025-01-03")).exists())
  }

  test("backfill with auditTable: every attempt lands in the audit " +
      "table, INCLUDING the gate failure (report-precedes-raise)") {
    val conf0 = freshConf()
    val conf = conf0.copy(
      auditTable = Some(tmpDir("graft-pipe-audit") + "/audit"))
    gen(conf, "2025-01-01")
    val bad = EventsGen.generateDay("2025-01-02", nEvents = 5)
      .map(_.copy(event_type = "hack"))
    EventsGen.writeNdjson(bad, conf.rawBase, "2025-01-02")
    intercept[DqFailedException] {
      Pipeline.backfill(spark, conf, "2025-01-01", "2025-01-02")
    }
    val hist = graft.dq.DqAudit.history(spark, conf.auditTable.get)
      .select("ingestion_date", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(hist == Seq(("2025-01-01", "PASS"), ("2025-01-02", "FAIL")),
      s"audit must hold both attempts: $hist")
    // the failed date retries clean → audit keeps BOTH attempts, and
    // the latest-per-date view flips to PASS
    gen(conf, "2025-01-02")
    Pipeline.runPartition(spark, conf, "2025-01-02")
    assert(graft.dq.DqAudit.history(spark, conf.auditTable.get)
      .count() == 3)
    val latest = graft.dq.DqAudit.latestPerDate(spark, conf.auditTable.get)
      .select("ingestion_date", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(latest == Map("2025-01-01" -> "PASS", "2025-01-02" -> "PASS"))
  }

  test("parallel backfill with auditTable: concurrent appends to ONE " +
      "audit table all land (reservation race retried, none lost)") {
    val conf0 = freshConf()
    val conf = conf0.copy(
      auditTable = Some(tmpDir("graft-pipe-audit-par") + "/audit"))
    val dates = (1 to 6).map(i => f"2025-02-0$i")
    dates.foreach(gen(conf, _))
    val reports = Pipeline.backfill(spark, conf, dates.head, dates.last,
      maxParallel = 3)
    assert(reports.length == 6)
    val hist = graft.dq.DqAudit.history(spark, conf.auditTable.get)
      .select("ingestion_date").collect().map(_.getString(0)).toSeq
    assert(hist == dates, s"every concurrent run must audit: $hist")
  }

  test("catalog: registered table prunes partitions and answers the audit query") {
    val conf = freshConf()
    gen(conf, "2025-01-01")
    gen(conf, "2025-01-02")
    Pipeline.backfill(spark, conf, "2025-01-01", "2025-01-02")
    Catalog.registerCuratedEvents(spark, conf.curatedBase, "curated_events_t")
    // the reference README's canonical smoke query (curated_events.sql:17-20)
    val counts = spark.sql(
      """SELECT ingestion_date, COUNT(*) AS n FROM curated_events_t
        |GROUP BY ingestion_date ORDER BY ingestion_date""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(counts.toSeq ==
      Seq("2025-01-01" -> 1010L, "2025-01-02" -> 1010L))
    // partition pruning visible in the physical plan
    val plan = spark.sql(
      "SELECT * FROM curated_events_t WHERE ingestion_date = '2025-01-01'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2025-01-01"))
    spark.sql("DROP TABLE curated_events_t")
  }

  test("parallel backfill: reports in date order, every partition " +
      "written, same rows as the sequential driver") {
    val conf = freshConf()
    val dates = Seq("2025-01-01", "2025-01-02", "2025-01-03", "2025-01-04")
    dates.foreach(d => gen(conf, d))
    val reports = Pipeline.backfill(spark, conf,
      "2025-01-01", "2025-01-04", maxParallel = 3)
    assert(reports.map(_.ingestionDate) == dates,
      "reports must come back in date order, not completion order")
    dates.foreach(d => assert(curated(conf, d).count() == 1010))
    // per-date isolation + determinism: identical row sets to a
    // sequential run over the same (seeded) raw inputs
    val seqConf = freshConf()
    dates.foreach(d => gen(seqConf, d))
    Pipeline.backfill(spark, seqConf, "2025-01-01", "2025-01-04")
    dates.foreach(d =>
      assert(rowSet(curated(conf, d)) == rowSet(curated(seqConf, d))))
  }

  test("parallel backfill: a failure stops later windows and rethrows " +
      "the earliest failing date's exception") {
    val conf = freshConf()
    // d3's raw partition is MISSING; windows at k=2 are
    // (d1,d2) (d3,d4) (d5) — d5 must never start
    Seq("2025-01-01", "2025-01-02", "2025-01-04").foreach(d => gen(conf, d))
    val e = intercept[MissingUpstreamException] {
      Pipeline.backfill(spark, conf, "2025-01-01", "2025-01-05",
        maxParallel = 2)
    }
    assert(e.getMessage.contains("2025-01-03"))
    assert(curated(conf, "2025-01-01").count() == 1010)
    assert(curated(conf, "2025-01-02").count() == 1010)
    assert(!new File(
      RawEvents.partitionPath(conf.curatedBase, "2025-01-05")).exists(),
      "a window past the failure must never start")
  }

  test("backfillWithRetry: transient missing-upstream date succeeds on " +
      "retry and the audit table shows BOTH attempts") {
    val conf0 = freshConf()
    val conf = conf0.copy(
      auditTable = Some(tmpDir("graft-pipe-audit-retry") + "/audit"))
    gen(conf, "2025-01-01")
    // 2025-01-02's raw partition is absent at wave start; the feed
    // "lands late" — modeled deterministically by generating it from
    // inside the transient classifier (first retry sees it present)
    var transientSeen = 0
    val classify: Throwable => Boolean = { e =>
      val t = Pipeline.defaultTransient(e)
      if (t) {
        transientSeen += 1
        if (transientSeen == 1) gen(conf, "2025-01-02")
      }
      t
    }
    val reports = Pipeline.backfillWithRetry(spark, conf,
      "2025-01-01", "2025-01-02", retryBudgetMs = 30000L,
      isTransient = classify)
    assert(reports.map(_.ingestionDate) == Seq("2025-01-01", "2025-01-02"))
    assert(reports.forall(_.status == "PASS"))
    assert(curated(conf, "2025-01-02").count() == 1010)
    // audit trail: 01 PASS, 02 transient-FAIL attempt, 02 PASS retry
    val hist = graft.dq.DqAudit.history(spark, conf.auditTable.get)
      .select("ingestion_date", "status", "failures").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getSeq[String](r.fieldIndex("failures")).mkString(";")))
    assert(hist.length == 3, s"expected 3 audit rows: ${hist.toSeq}")
    assert(hist.count { case (d, s, _) => d == "2025-01-02" && s == "FAIL" }
      == 1)
    val failRow = hist.find(_._2 == "FAIL").get
    assert(failRow._3.contains("attempt 1") &&
      failRow._3.contains("MissingUpstreamException"),
      s"the failed attempt must carry its cause: $failRow")
    val latest = graft.dq.DqAudit.latestPerDate(spark, conf.auditTable.get)
      .select("ingestion_date", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(latest == Map("2025-01-01" -> "PASS", "2025-01-02" -> "PASS"))
  }

  test("backfillWithRetry: a permanent (DQ gate) failure stops the wave " +
      "without retrying; budget exhaustion propagates the transient") {
    val conf = freshConf()
    gen(conf, "2025-01-01")
    val bad = EventsGen.generateDay("2025-01-02", nEvents = 5)
      .map(_.copy(event_type = "hack"))
    EventsGen.writeNdjson(bad, conf.rawBase, "2025-01-02")
    gen(conf, "2025-01-03")
    var classifierCalls = 0
    intercept[DqFailedException] {
      Pipeline.backfillWithRetry(spark, conf, "2025-01-01", "2025-01-03",
        retryBudgetMs = 30000L,
        isTransient = { e => classifierCalls += 1
          Pipeline.defaultTransient(e) })
    }
    assert(classifierCalls == 1, "the gate failure must not be retried")
    assert(curated(conf, "2025-01-01").count() == 1010)
    assert(!new File(
      RawEvents.partitionPath(conf.curatedBase, "2025-01-03")).exists(),
      "a date past the permanent failure must never start")
    // budget 0: the first transient immediately propagates
    val conf2 = freshConf()
    intercept[MissingUpstreamException] {
      Pipeline.backfillWithRetry(spark, conf2, "2025-01-01", "2025-01-01",
        retryBudgetMs = 0L)
    }
  }

  test("audit append is best-effort: a wedged audit table (orphaned " +
      "reservation) does not abort a passing run's curated write") {
    val conf0 = freshConf()
    val audit = tmpDir("graft-pipe-audit-wedge") + "/audit"
    val conf = conf0.copy(auditTable = Some(audit))
    gen(conf, "2025-01-01")
    Pipeline.runPartition(spark, conf, "2025-01-01")
    // wedge the audit table: orphan the NEXT version slot so every
    // append hits the 120 s convoy deadline… which would dwarf the
    // test; instead corrupt the pointer file so recordOnce throws
    // immediately (NumberFormatException — a NonFatal infra failure)
    val cur = new File(audit, "_CURRENT")
    java.nio.file.Files.writeString(cur.toPath, "not-a-version")
    gen(conf, "2025-01-02")
    val report = Pipeline.runPartition(spark, conf, "2025-01-02")
    assert(report.status == "PASS")
    assert(curated(conf, "2025-01-02").count() == 1010,
      "curated write must land despite the broken audit table")
  }

  test("recursive raw read recovers partition dates from file paths (S1/P4)") {
    val conf = freshConf()
    gen(conf, "2025-01-01", n = 50)
    gen(conf, "2025-01-02", n = 50)
    val all = RawEvents.readAll(spark, conf.rawBase)
    val byDate = all.groupBy("ingestion_date").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 50 generated + max(1, 50*0.01)=1 injected duplicate per day
    assert(byDate == Map("2025-01-01" -> 51L, "2025-01-02" -> 51L))
  }

  test("append-only raw arrivals: DQ over the merged view, compaction " +
      "leaves counters and curated rows byte-stable (design.md:155-157)") {
    val conf = freshConf()
    val date = "2025-01-01"
    // three separate producer flushes land in ONE partition dir
    EventsGen.writeNdjson(EventsGen.generateDay(date, nEvents = 600),
      conf.rawBase, date, fileName = "arrival_0001.json")
    EventsGen.writeNdjson(EventsGen.generateDay(date, nEvents = 300,
      seed = 43L), conf.rawBase, date, fileName = "arrival_0002.json")
    EventsGen.writeNdjson(EventsGen.generateLate(date, nEvents = 100),
      conf.rawBase, date, fileName = "arrival_0003.json")
    val rawDir = new File(RawEvents.partitionPath(conf.rawBase, date))
    def jsonFiles() =
      rawDir.listFiles().count(_.getName.endsWith(".json"))
    assert(jsonFiles() == 3)

    // the DQ gate sees the MERGED multi-arrival view
    val pre = Pipeline.runPartition(spark, conf, date)
    assert(pre.status == "PASS")
    assert(pre.counters.totalRows == 606 + 303 + 100)
    val preRows = rowSet(curated(conf, date))

    // compact: 3 arrival files → 1; a tiny target exercises ⌈bytes/target⌉
    val n = graft.io.Compaction.compactRawPartition(spark,
      rawDir.toString, graft.schema.EventSchema.raw)
    assert(n == 1 && jsonFiles() == 1)

    // re-run over the compacted view: identical report + curated rows
    val post = Pipeline.runPartition(spark, conf, date)
    assert(post.counters == pre.counters)
    assert(post.status == "PASS")
    assert(rowSet(curated(conf, date)) == preRows)

    // multi-file target: ⌈bytes/target⌉ splits the partition again and
    // the merged view STILL reads back the same counters
    val bytes = rawDir.listFiles()
      .filter(_.getName.endsWith(".json")).map(_.length).sum
    val n2 = graft.io.Compaction.compactRawPartition(spark,
      rawDir.toString, graft.schema.EventSchema.raw,
      targetBytes = math.max(1L, bytes / 3))
    assert(n2 >= 2, s"expected a multi-file rewrite, got $n2")
    assert(graft.dq.DqCounters.compute(RawEvents.curate(
      RawEvents.readPartition(spark, conf.rawBase, date))) == pre.counters)
  }
}
