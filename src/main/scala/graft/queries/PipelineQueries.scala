package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dq.DqAudit
import graft.io.RawEvents
import graft.pipeline.{DqFailedException, Pipeline, PipelineConfig}

/** Pipeline-flow queries: the quarantine zone and the run-history audit
  * table exercised END-TO-END through [[graft.pipeline.Pipeline]] —
  * poisoned raw NDJSON lands, the run diverts/audits/gates, and the
  * query reads the RESULTING stores back. The oracle never sees the
  * zones: it restates the quarantine predicate ([[graft.dq.Dq
  * .splitQuarantine]]) and the counter pass ([[graft.dq.DqCounters]])
  * flat in SQL over the same deterministically-poisoned rows derived
  * from the events parquet (the ref_dq_counters pattern), so a hash
  * match proves the wire format, the split semantics, the audit row's
  * counters, and the fail-safe ordering all at once.
  *
  * Poison layout (all keyed off the ORIGINAL bigint event_id, so both
  * engines derive identical batches):
  *   - event_id % 101 = 11 → event_id NULL
  *   - event_id %  97 =  5 → user_id NULL
  *   - event_id %  89 =  7 → event_type NULL
  *   - event_type 'error' survives the domain mapping → invalid
  *   - event_id % 103 = 13 → the row lands TWICE (dup_event_id)
  * The domain mapping sends the corpus's types onto the pipeline's
  * allowed set (click→login, view→view_item, signup→add_to_cart,
  * purchase stays) — 'error' is the naturally-invalid remainder.
  */
object PipelineQueries {

  private val Date = "2025-06-01"

  private def scratch(sfDir: String, leaf: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_pipeline_q/$tag/$leaf"
  }

  private def wipe(s: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def mapType(c: Column): Column =
    when(c === "click", "login")
      .when(c === "view", "view_item")
      .when(c === "signup", "add_to_cart")
      .otherwise(c) // purchase stays allowed; error stays invalid

  /** The poisoned raw batch as the wire shape (all-string ids — the
    * NDJSON contract of [[graft.io.RawEvents]]). */
  private def poisoned(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val base = ev.select(
      when(pmod(col("event_id"), lit(101)) === 11, lit(null))
        .otherwise(col("event_id").cast("string")).as("event_id"),
      when(pmod(col("event_id"), lit(97)) === 5, lit(null))
        .otherwise(col("user_id").cast("string")).as("user_id"),
      when(pmod(col("event_id"), lit(89)) === 7, lit(null))
        .otherwise(mapType(col("event_type"))).as("event_type"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
      col("value").cast("double").as("amount"),
      col("event_id").as("orig_id"))
    base.unionByName(
        base.where(pmod(col("orig_id"), lit(103)) === 13))
      .drop("orig_id")
  }

  /** Shared oracle CTEs: the poisoned batch and its split/tag replay. */
  private val OracleRaw: String =
    """raw AS (
      |  SELECT CASE WHEN event_id % 101 = 11 THEN NULL
      |           ELSE CAST(event_id AS VARCHAR) END AS event_id,
      |         CASE WHEN event_id % 97 = 5 THEN NULL
      |           ELSE CAST(user_id AS VARCHAR) END AS user_id,
      |         CASE WHEN event_id % 89 = 7 THEN NULL
      |           WHEN event_type = 'click' THEN 'login'
      |           WHEN event_type = 'view' THEN 'view_item'
      |           WHEN event_type = 'signup' THEN 'add_to_cart'
      |           ELSE event_type END AS event_type,
      |         ts, event_id % 103 = 13 AS dup
      |  FROM events),
      |rall AS (SELECT event_id, user_id, event_type, ts FROM raw
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, ts FROM raw WHERE dup),
      |t AS (SELECT *,
      |    (event_id IS NOT NULL AND event_type IS NOT NULL
      |      AND user_id IS NOT NULL AND event_type IN
      |      ('login','view_item','add_to_cart','purchase')) AS clean
      |  FROM rall),
      |r AS (SELECT *, CASE WHEN event_id IS NULL THEN 1
      |    ELSE SUM(CASE WHEN clean THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY event_id
      |      ORDER BY clean DESC, ts, user_id, event_type
      |      ROWS UNBOUNDED PRECEDING) END AS rn
      |  FROM t),
      |tagged AS (SELECT *,
      |    CASE WHEN event_id IS NULL THEN 'null_event_id'
      |      WHEN event_type IS NULL THEN 'null_event_type'
      |      WHEN user_id IS NULL THEN 'null_user_id'
      |      WHEN event_type NOT IN
      |        ('login','view_item','add_to_cart','purchase')
      |        THEN 'invalid_event_type'
      |      WHEN rn > 1 THEN 'dup_event_id' END AS reason
      |  FROM r)""".stripMargin

  val all: Seq[Q] = Seq(
    // --- quarantine mode end-to-end --------------------------------------
    // Row-level diversion instead of the all-or-nothing gate: the
    // poisoned partition runs through Pipeline.runPartitionQuarantine —
    // offending rows land in the quarantine zone with their reason, the
    // clean remainder in curated, the run's report (original-batch
    // counters) in the audit table — and the query reads all three
    // stores back as one (src, metric, n) relation.
    Q(
      "q_dq_quarantine",
      s"""WITH $OracleRaw,
         |c AS (SELECT COUNT(*) AS total_rows,
         |    COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS null_event_id,
         |    COUNT(CASE WHEN event_type IS NULL THEN 1 END)
         |      AS null_event_type,
         |    COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
         |    COUNT(CASE WHEN event_type NOT IN
         |      ('login','view_item','add_to_cart','purchase') THEN 1 END)
         |      AS invalid_event_type,
         |    COUNT(*) - COUNT(DISTINCT event_id)
         |      - CASE WHEN COUNT(CASE WHEN event_id IS NULL THEN 1 END) > 0
         |          THEN 1 ELSE 0 END AS dup_extra_rows
         |  FROM rall)
         |SELECT src, metric, CAST(n AS BIGINT) AS n FROM (
         |  SELECT 'quarantine' AS src, reason AS metric, COUNT(*) AS n
         |  FROM tagged WHERE reason IS NOT NULL GROUP BY reason
         |  UNION ALL
         |  SELECT 'valid', 'rows', COUNT(*) FROM tagged WHERE reason IS NULL
         |  UNION ALL SELECT 'audit', 'total_rows', total_rows FROM c
         |  UNION ALL SELECT 'audit', 'null_event_id', null_event_id FROM c
         |  UNION ALL SELECT 'audit', 'null_event_type', null_event_type FROM c
         |  UNION ALL SELECT 'audit', 'null_user_id', null_user_id FROM c
         |  UNION ALL SELECT 'audit', 'invalid_event_type',
         |    invalid_event_type FROM c
         |  UNION ALL SELECT 'audit', 'dup_extra_rows', dup_extra_rows FROM c
         |  UNION ALL SELECT 'audit', 'pass_runs', 1)
         |ORDER BY src, metric""".stripMargin
    ) { (s, d) =>
      val root = scratch(d, "quarantine")
      wipe(s, root)
      val conf = PipelineConfig(s"$root/raw", s"$root/curated",
        s"$root/metrics", auditTable = Some(s"$root/audit"))
      poisoned(s, d).write.mode("overwrite")
        .json(RawEvents.partitionPath(conf.rawBase, Date))
      // ~23% of rows divert on this corpus — feed-level failure is 0.5
      Pipeline.runPartitionQuarantine(s, conf, Date,
        quarantineBase = s"$root/quarantine", maxQuarantineRate = 0.5)
      val quar = s.read.parquet(
          RawEvents.partitionPath(s"$root/quarantine", Date))
        .groupBy(col("quarantine_reason"))
        .agg(count(lit(1)).as("n"))
        .select(lit("quarantine").as("src"),
          col("quarantine_reason").as("metric"), col("n"))
      val valid = s.read.parquet(
          RawEvents.partitionPath(conf.curatedBase, Date))
        .agg(count(lit(1)).as("n"))
        .select(lit("valid").as("src"), lit("rows").as("metric"), col("n"))
      val audit = DqAudit.history(s, conf.auditTable.get)
        .where(col("ingestion_date") === Date)
        .select(
          col("total_rows"), col("null_event_id"), col("null_event_type"),
          col("null_user_id"), col("invalid_event_type"),
          col("dup_extra_rows"),
          when(col("status") === "PASS", 1L).otherwise(0L).as("pass_runs"))
      val auditRows = Seq("total_rows", "null_event_id", "null_event_type",
        "null_user_id", "invalid_event_type", "dup_extra_rows", "pass_runs")
      val auditLong = audit.select(explode(array(auditRows.map(m =>
          struct(lit(m).as("metric"), col(m).cast("long").as("n"))): _*))
          .as("x"))
        .select(lit("audit").as("src"), col("x.metric").as("metric"),
          col("x.n").as("n"))
      quar.unionByName(valid).unionByName(auditLong)
        .orderBy(col("src"), col("metric"))
    },

    // --- run-history audit across a failed attempt and its retry ---------
    // The operator's daily relation (reference `docs/design.md:119-127`'s
    // alerting surface as a TABLE): attempt 1 feeds the UNMAPPED corpus
    // (every non-purchase type outside the domain → the quarantine rate
    // gate trips, DqFailedException AFTER the audit append — the
    // report-precedes-raise contract), the feed is fixed (all types
    // mapped into the domain) and the date re-runs clean. The audit
    // table then holds BOTH attempts; the query reads them back in
    // run_ts order with their counters.
    Q(
      "q_dq_audit_history",
      """WITH a1 AS (SELECT COUNT(*) AS total_rows,
        |    COUNT(CASE WHEN event_type NOT IN
        |      ('login','view_item','add_to_cart','purchase') THEN 1 END)
        |      AS invalid
        |  FROM events)
        |SELECT attempt, status, total_rows, invalid_event_type,
        |  null_user_id, dup_extra_rows FROM (
        |  SELECT 1 AS attempt, 'FAIL' AS status, total_rows,
        |    invalid AS invalid_event_type, CAST(0 AS BIGINT)
        |      AS null_user_id, CAST(0 AS BIGINT) AS dup_extra_rows
        |  FROM a1
        |  UNION ALL
        |  SELECT 2, 'PASS', total_rows, CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM a1)
        |ORDER BY attempt""".stripMargin
    ) { (s, d) =>
      val root = scratch(d, "audit_history")
      wipe(s, root)
      val conf = PipelineConfig(s"$root/raw", s"$root/curated",
        s"$root/metrics", auditTable = Some(s"$root/audit"))
      val ev = Tables.events(s, d)
      def feed(mapped: Boolean): DataFrame = ev.select(
        col("event_id").cast("string").as("event_id"),
        col("user_id").cast("string").as("user_id"),
        (if (mapped)
          when(col("event_type") === "click", "login")
            .when(col("event_type") === "view", "view_item")
            .when(col("event_type") === "signup", "add_to_cart")
            .otherwise(lit("purchase")) // purchase stays; error fixed
        else col("event_type")).as("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("value").cast("double").as("amount"))
      // attempt 1: the broken feed — gate trips AFTER the audit append
      feed(mapped = false).write.mode("overwrite")
        .json(RawEvents.partitionPath(conf.rawBase, Date))
      try {
        Pipeline.runPartitionQuarantine(s, conf, Date,
          quarantineBase = s"$root/quarantine")
        sys.error("q_dq_audit_history: the broken feed must gate-fail")
      } catch { case _: DqFailedException => () }
      // attempt 2: the fixed feed re-runs the SAME date clean
      feed(mapped = true).write.mode("overwrite")
        .json(RawEvents.partitionPath(conf.rawBase, Date))
      Pipeline.runPartitionQuarantine(s, conf, Date,
        quarantineBase = s"$root/quarantine")
      // the 2-row attempt index is a window over the audit table's
      // per-date slice (bounded by attempts per date, never data-scale)
      val w = Window.partitionBy(col("ingestion_date"))
        .orderBy(col("run_ts"))
      DqAudit.history(s, conf.auditTable.get)
        .where(col("ingestion_date") === Date)
        .withColumn("attempt", row_number().over(w))
        .select(col("attempt"), col("status"), col("total_rows"),
          col("invalid_event_type"), col("null_user_id"),
          col("dup_extra_rows"))
        .orderBy(col("attempt"))
    },

    // --- append-only raw arrivals + compaction, counters byte-stable -----
    // The reference's own production tradeoff (ref: docs/design.md:
    // 155-157): raw is append-only — separate arrival files land per
    // partition and a compaction step merges them later. Three arrival
    // files (the clean feed split by event_id mod 3) land in one
    // partition dir; the DQ gate runs over the MERGED multi-file view;
    // [[graft.io.Compaction.compactRawPartition]] rewrites the dir into
    // one NDJSON file under the crash-convergent swap; the gate re-runs
    // over the compacted view. The query emits both phases' artifacts —
    // file counts, the six report counters, curated row counts, gate
    // status — as one (phase, metric, n) relation; the oracle restates
    // the feed and the counter pass flat in SQL, once per phase, so a
    // hash match proves the counters are byte-stable across the rewrite.
    Q(
      "q_raw_compaction",
      """WITH f AS (SELECT
        |    CAST(event_id AS VARCHAR) AS event_id,
        |    CAST(user_id AS VARCHAR) AS user_id,
        |    CASE WHEN event_type = 'click' THEN 'login'
        |         WHEN event_type = 'view' THEN 'view_item'
        |         WHEN event_type = 'signup' THEN 'add_to_cart'
        |         ELSE 'purchase' END AS event_type
        |  FROM events),
        |c AS (SELECT COUNT(*) AS total_rows,
        |    COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS null_event_id,
        |    COUNT(CASE WHEN event_type IS NULL THEN 1 END)
        |      AS null_event_type,
        |    COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
        |    COUNT(CASE WHEN event_type NOT IN
        |      ('login','view_item','add_to_cart','purchase') THEN 1 END)
        |      AS invalid_event_type,
        |    COUNT(*) - COUNT(DISTINCT event_id)
        |      - CASE WHEN COUNT(CASE WHEN event_id IS NULL THEN 1 END) > 0
        |          THEN 1 ELSE 0 END AS dup_extra_rows
        |  FROM f),
        |p AS (SELECT * FROM (VALUES ('arrivals', 3), ('compacted', 1))
        |  AS t(phase, n_files))
        |SELECT phase, metric, CAST(n AS BIGINT) AS n FROM (
        |  SELECT phase, 'n_files' AS metric, n_files AS n FROM p
        |  UNION ALL SELECT phase, 'total_rows', total_rows
        |    FROM p CROSS JOIN c
        |  UNION ALL SELECT phase, 'null_event_id', null_event_id
        |    FROM p CROSS JOIN c
        |  UNION ALL SELECT phase, 'null_event_type', null_event_type
        |    FROM p CROSS JOIN c
        |  UNION ALL SELECT phase, 'null_user_id', null_user_id
        |    FROM p CROSS JOIN c
        |  UNION ALL SELECT phase, 'invalid_event_type', invalid_event_type
        |    FROM p CROSS JOIN c
        |  UNION ALL SELECT phase, 'dup_extra_rows', dup_extra_rows
        |    FROM p CROSS JOIN c
        |  UNION ALL SELECT phase, 'curated_rows', total_rows
        |    FROM p CROSS JOIN c
        |  UNION ALL SELECT phase, 'status_pass', 1 FROM p)
        |ORDER BY phase, metric""".stripMargin
    ) { (s, d) =>
      val root = scratch(d, "raw_compaction")
      wipe(s, root)
      val conf = PipelineConfig(s"$root/raw", s"$root/curated",
        s"$root/metrics")
      val rawDir = RawEvents.partitionPath(conf.rawBase, Date)
      val feed = Tables.events(s, d).select(
        col("event_id").cast("string").as("event_id"),
        col("user_id").cast("string").as("user_id"),
        when(col("event_type") === "click", "login")
          .when(col("event_type") === "view", "view_item")
          .when(col("event_type") === "signup", "add_to_cart")
          .otherwise(lit("purchase")).as("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("value").cast("double").as("amount"),
        col("event_id").as("orig_id"))
      // three append-only arrivals: separate producer flushes landing
      // in the SAME partition dir (each exactly one NDJSON part file)
      (0 until 3).foreach { i =>
        feed.where(pmod(col("orig_id"), lit(3)) === i).drop("orig_id")
          .repartition(1).write.mode("append").json(rawDir)
      }
      def jsonFiles(): Long = {
        val p = new Path(rawDir)
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .listStatus(p)
          .count(f => f.isFile && f.getPath.getName.endsWith(".json"))
          .toLong
      }
      def curatedRows(): Long = s.read.parquet(
        RawEvents.partitionPath(conf.curatedBase, Date)).count()
      def phaseRows(phase: String, nFiles: Long, curated: Long,
          r: graft.dq.DqReport): DataFrame = {
        val c = r.counters
        val ms = Seq(
          "n_files" -> nFiles, "total_rows" -> c.totalRows,
          "null_event_id" -> c.nullEventId,
          "null_event_type" -> c.nullEventType,
          "null_user_id" -> c.nullUserId,
          "invalid_event_type" -> c.invalidEventType,
          "dup_extra_rows" -> c.dupExtraRows,
          "curated_rows" -> curated,
          "status_pass" -> (if (r.status == "PASS") 1L else 0L))
        s.range(1).select(explode(array(ms.map { case (m, n) =>
            struct(lit(m).as("metric"), lit(n).as("n")) }: _*)).as("x"))
          .select(lit(phase).as("phase"), col("x.metric").as("metric"),
            col("x.n").as("n"))
      }
      // DQ gate over the merged 3-arrival view, then compact, then the
      // SAME gate over the compacted view — counters must not move
      val pre = Pipeline.runPartition(s, conf, Date)
      val preFiles = jsonFiles()
      // snapshot the pre-compaction curated count NOW: phaseRows reads
      // curatedRows() at call time, and the "arrivals" row must capture
      // the state BEFORE the post-compaction re-run rewrites curated
      val preCurated = curatedRows()
      val postFiles = graft.io.Compaction.compactRawPartition(
        s, rawDir, graft.schema.EventSchema.raw,
        targetBytes = Long.MaxValue).toLong
      val post = Pipeline.runPartition(s, conf, Date)
      phaseRows("arrivals", preFiles, preCurated, pre)
        .unionByName(phaseRows("compacted", postFiles, curatedRows(), post))
        .orderBy(col("phase"), col("metric"))
    },

    // --- quarantine re-admission under a relaxed gate --------------------
    // The operational sequel to q_dq_quarantine: the poisoned partition
    // quarantines under the default domain, then 'error' is declared a
    // legal type and [[Pipeline.readmitQuarantine]] replays the
    // invalid_event_type + dup_event_id rows through the relaxed gate.
    // Now-clean rows move into curated via the idempotent partition
    // rewrite; a replayed row whose event_id the original run already
    // admitted stays quarantined as dup_event_id (the curated-collision
    // anti-join — every valid dup's second copy exercises it); an
    // invalid DUP's second copy stays via the replay's own in-batch
    // ranking. The oracle replays the splitQuarantine predicate TWICE —
    // once per domain — plus the collision rule, flat in SQL, so a hash
    // match proves the replay drains exactly the now-legal rows and
    // nothing else.
    Q(
      "q_dq_readmission",
      s"""WITH $OracleRaw,
         |cand AS (SELECT event_id, user_id, event_type, ts FROM tagged
         |  WHERE reason IN ('invalid_event_type','dup_event_id')),
         |t2 AS (SELECT *, (event_id IS NOT NULL AND event_type IS NOT NULL
         |    AND user_id IS NOT NULL AND event_type IN
         |    ('login','view_item','add_to_cart','purchase','error'))
         |    AS clean2
         |  FROM cand),
         |r2 AS (SELECT *, CASE WHEN event_id IS NULL THEN 1
         |    ELSE SUM(CASE WHEN clean2 THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY event_id
         |      ORDER BY clean2 DESC, ts, user_id, event_type
         |      ROWS UNBOUNDED PRECEDING) END AS rn2
         |  FROM t2),
         |tagged2 AS (SELECT *,
         |    CASE WHEN event_id IS NULL THEN 'null_event_id'
         |      WHEN event_type IS NULL THEN 'null_event_type'
         |      WHEN user_id IS NULL THEN 'null_user_id'
         |      WHEN event_type NOT IN
         |        ('login','view_item','add_to_cart','purchase','error')
         |        THEN 'invalid_event_type'
         |      WHEN rn2 > 1 THEN 'dup_event_id' END AS reason2
         |  FROM r2),
         |cur0 AS (SELECT event_id FROM tagged WHERE reason IS NULL),
         |adm AS (SELECT event_id FROM tagged2 WHERE reason2 IS NULL
         |  AND event_id NOT IN (SELECT event_id FROM cur0)),
         |qafter AS (
         |  SELECT reason FROM tagged WHERE reason IS NOT NULL
         |    AND reason NOT IN ('invalid_event_type','dup_event_id')
         |  UNION ALL SELECT reason2 FROM tagged2 WHERE reason2 IS NOT NULL
         |  UNION ALL SELECT 'dup_event_id' FROM tagged2
         |  WHERE reason2 IS NULL AND event_id IN
         |    (SELECT event_id FROM cur0)),
         |b AS (SELECT COUNT(*) AS rows_before FROM tagged
         |  WHERE reason IS NULL),
         |a2 AS (SELECT COUNT(*) AS n_adm FROM adm),
         |ct AS (SELECT COUNT(*) AS cand_rows FROM cand)
         |SELECT src, metric, CAST(n AS BIGINT) AS n FROM (
         |  SELECT 'audit' AS src, 'pass_runs' AS metric, 2 AS n
         |  UNION ALL SELECT 'curated', 'rows_before', rows_before FROM b
         |  UNION ALL SELECT 'curated', 'rows_after', rows_before + n_adm
         |    FROM b CROSS JOIN a2
         |  UNION ALL SELECT 'quarantine', reason, COUNT(*)
         |    FROM qafter GROUP BY reason
         |  UNION ALL SELECT 'replay', 'readmitted', n_adm FROM a2
         |  UNION ALL SELECT 'replay', 'total_rows', cand_rows FROM ct)
         |ORDER BY src, metric""".stripMargin
    ) { (s, d) =>
      val root = scratch(d, "readmission")
      wipe(s, root)
      val conf = PipelineConfig(s"$root/raw", s"$root/curated",
        s"$root/metrics", auditTable = Some(s"$root/audit"))
      val qBase = s"$root/quarantine"
      poisoned(s, d).write.mode("overwrite")
        .json(RawEvents.partitionPath(conf.rawBase, Date))
      Pipeline.runPartitionQuarantine(s, conf, Date,
        quarantineBase = qBase, maxQuarantineRate = 0.5)
      def curatedCount(): Long = s.read.parquet(
        RawEvents.partitionPath(conf.curatedBase, Date)).count()
      val before = curatedCount()
      val rep = Pipeline.readmitQuarantine(s, conf, Date, qBase,
        reasons = Seq("invalid_event_type", "dup_event_id"),
        allowed = graft.schema.EventSchema.allowedEventTypes :+ "error")
      val after = curatedCount()
      val quarAfter = s.read.parquet(RawEvents.partitionPath(qBase, Date))
        .groupBy(col("quarantine_reason"))
        .agg(count(lit(1)).as("n"))
        .select(lit("quarantine").as("src"),
          col("quarantine_reason").as("metric"), col("n"))
      val passRuns = DqAudit.history(s, conf.auditTable.get)
        .where(col("ingestion_date") === Date && col("status") === "PASS")
        .count()
      val scalars = Seq(
        ("audit", "pass_runs", passRuns),
        ("curated", "rows_before", before),
        ("curated", "rows_after", after),
        ("replay", "readmitted", after - before),
        ("replay", "total_rows", rep.counters.totalRows))
      val scalarDf = s.range(1).select(explode(array(scalars.map {
          case (src, m, n) => struct(lit(src).as("src"), lit(m).as("metric"),
            lit(n).as("n")) }: _*)).as("x"))
        .select(col("x.src").as("src"), col("x.metric").as("metric"),
          col("x.n").as("n"))
      quarAfter.unionByName(scalarDf)
        .orderBy(col("src"), col("metric"))
    }
  )
}
