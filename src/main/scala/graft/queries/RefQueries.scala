package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Reference-parity query inventory (SURVEY §2.12 Q1–Q6) re-expressed over
  * the driver's `events` table.
  *
  * Grounding (citations into /root/reference/):
  *  - partition counts: sql/athena/curated_events.sql:17-20
  *  - null audit:       sql/athena/curated_events.sql:23-27
  *  - dup top-k:        sql/athena/curated_events.sql:31-36
  *  - DQ counters:      glue/jobs/raw_to_curated_events_v3_dq.py:70-87
  *  - invalid domain (negated isin, 3-valued logic): raw_to_curated_events_v3_dq.py:78
  *  - typed projection/filter: raw_to_curated_events_v1.py:34-47
  *
  * Scale notes: every query here is a single scan → partial/final hash
  * aggregate (no shuffle beyond the group-by exchange); counters collapse
  * to ONE aggregation pass vs the reference's six separate actions
  * (raw_to_curated_events_v3_dq.py:70-82). At 100 TB these stay
  * scan-bound: all aggregates are map-side-combinable and the scans prune
  * to ≤4 columns (verified via explain: ReadSchema lists only used cols).
  */
object RefQueries {

  /** Event-type domain treated as valid; 'error' rows are the injected
    * "invalid" class so the invalid-domain counter is non-zero (the
    * reference's ALLOWED_EVENT_TYPES gate, ..._v3_dq.py:22). */
  private val allowedTypes = Seq("click", "view", "purchase", "signup")

  /** Date-partitioned curated layout of one sf dir's events table —
    * the `ingestion_date=` directory shape the pipeline writes
    * (CuratedWriter K1) — built once per FIXTURE GENERATION under the
    * system tmp dir: the key fingerprints the source's (path, mtime,
    * total length), so a driver-regenerated fixture rebuilds the
    * layout instead of serving stale rows, while warm bench samples
    * measure the pruned scan rather than the one-off write. */
  private def partitionedEventsDir(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val src = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val f = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val sum = f.getContentSummary(src)
    val st = f.getFileStatus(src)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${st.getModificationTime}|${sum.getLength}"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    val dir = s"${System.getProperty("java.io.tmpdir")}" +
      s"/graft_events_bydate_$key"
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")))
      Tables.events(s, d)
        .withColumn("event_date", to_date(col("ts")).cast("string"))
        .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    dir
  }

  val all: Seq[Q] = Seq(
    // --- Q-ingest analogue: schema-typed projection + filter + cast ------
    Q(
      "ref_typed_project",
      """SELECT event_id, CAST(ts AS DATE) AS event_date, event_type, value
        |FROM events
        |WHERE event_type <> 'error' AND value > 50
        |ORDER BY event_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("event_type") =!= "error" && col("value") > 50)
        .select(
          col("event_id"),
          to_date(col("ts")).as("event_date"),
          col("event_type"),
          col("value"))
        .orderBy(col("event_id"))
    },

    // --- Q-partition-counts: GROUP BY day, COUNT(*), ORDER BY -----------
    Q(
      "ref_partition_counts",
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n
        |FROM events GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_date"))
    },

    // --- Q-null-audit: global conditional aggregation --------------------
    Q(
      "ref_null_audit",
      """SELECT COUNT(*) AS total_rows,
        |  COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
        |  COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS null_event_type
        |FROM events""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d).agg(
        count(lit(1)).as("total_rows"),
        count(when(col("user_id").isNull, 1)).as("null_user_id"),
        count(when(col("event_type").isNull, 1)).as("null_event_type"))
    },

    // --- Q-dup-topk: GROUP BY HAVING COUNT>1 ORDER BY c DESC LIMIT ------
    // (user_id is the repeated key in this table; event_id is unique.)
    Q(
      "ref_dup_topk",
      """SELECT user_id, COUNT(*) AS c
        |FROM events GROUP BY user_id HAVING COUNT(*) > 1
        |ORDER BY c DESC, user_id NULLS FIRST
        |LIMIT 20""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .orderBy(col("c").desc, col("user_id").asc)
        .limit(20)
    },

    // --- Q-dq-counters: the six DQ counters D1–D6 in ONE pass -----------
    Q(
      "ref_dq_counters",
      s"""SELECT COUNT(*) AS total_rows,
         |  COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS null_event_id,
         |  COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS null_event_type,
         |  COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
         |  CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS DOUBLE)
         |    / COUNT(*) AS null_user_rate,
         |  COUNT(CASE WHEN event_type NOT IN (${allowedTypes.map("'" + _ + "'").mkString(",")})
         |        THEN 1 END) AS invalid_event_type,
         |  COUNT(*) - COUNT(DISTINCT event_id) AS dup_extra_rows,
         |  CAST(COUNT(*) - COUNT(DISTINCT event_id) AS DOUBLE)
         |    / COUNT(*) AS dup_rate
         |FROM events""".stripMargin
    ) { (s, d) =>
      val total = count(lit(1))
      val nullUser = count(when(col("user_id").isNull, 1))
      val dupExtra = count(lit(1)) - count_distinct(col("event_id"))
      Tables.events(s, d).agg(
        total.as("total_rows"),
        count(when(col("event_id").isNull, 1)).as("null_event_id"),
        count(when(col("event_type").isNull, 1)).as("null_event_type"),
        nullUser.as("null_user_id"),
        (nullUser.cast("double") / total).as("null_user_rate"),
        count(when(!col("event_type").isin(allowedTypes: _*), 1))
          .as("invalid_event_type"),
        dupExtra.as("dup_extra_rows"),
        (dupExtra.cast("double") / total).as("dup_rate"))
    },

    // --- Q-invalid-domain: negated isin with SQL 3-valued logic ---------
    Q(
      "ref_invalid_domain",
      s"""SELECT COUNT(CASE WHEN event_type NOT IN (${allowedTypes.map("'" + _ + "'").mkString(",")})
         |       THEN 1 END) AS invalid_rows
         |FROM events""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d).agg(
        count(when(!col("event_type").isin(allowedTypes: _*), 1))
          .as("invalid_rows"))
    },

    // --- hourly bucket aggregation (windowed-batch analogue) ------------
    Q(
      "ref_event_hourly",
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY hour
        |ORDER BY hour NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy(col("hour"))
    },

    // --- rolling 7-day baseline (docs/design.md:167 made real) ----------
    Q(
      "ref_rolling_baseline",
      """SELECT event_date, n,
        |  AVG(n) OVER (ORDER BY event_date
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS baseline
        |FROM (SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n
        |      FROM events GROUP BY event_date)
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("event_date")).rowsBetween(-7, -1)
      daily
        .withColumn("baseline", avg(col("n")).over(w))
        .orderBy(col("event_date"))
    },

    // --- volume anomaly days (roadmap docs/design.md:166-168) -----------
    // the rolling baseline turned into an alerting signal: a day whose
    // count deviates ±50% from its trailing week is flagged. Exercises
    // graft.dq.Anomaly.dailyVolume, the module the pipeline's DqReport
    // warning rides on.
    Q(
      "ref_anomaly_days",
      """SELECT event_date, n, baseline,
        |  (baseline IS NOT NULL
        |     AND (n > baseline * 1.5 OR n < baseline * 0.5)) AS is_anomaly
        |FROM (
        |  SELECT event_date, n,
        |    AVG(n) OVER (ORDER BY event_date
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS baseline
        |  FROM (SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n
        |        FROM events GROUP BY event_date))
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      graft.dq.Anomaly.dailyVolume(Tables.events(s, d))
        .orderBy(col("event_date"))
    },

    // --- per-event-type distribution drift -------------------------------
    // The second anomaly check the reference roadmap names
    // (docs/design.md:166-168): a (day, type) share vs the type's share
    // of the trailing 7 calendar days, compared by DECIMAL cross-
    // multiplication so no share is ever divided (exact on both engines
    // at any count magnitude — double products clip past 2^53). Flag
    // logic proven to fire in DqSpec on injected drift; this corpus's
    // uniform generator keeps every share steady, which the oracle
    // confirms row by row.
    Q(
      "ref_type_drift",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS event_date, event_type, COUNT(*) AS n,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ord
        |  FROM events GROUP BY 1, 2, 4),
        |tot AS (SELECT event_date, ord, CAST(SUM(n) AS BIGINT) AS total
        |        FROM daily GROUP BY 1, 2),
        |tot2 AS (SELECT event_date, total,
        |  CAST(SUM(total) OVER (ORDER BY ord
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |    AS base_total
        |  FROM tot),
        |d2 AS (SELECT event_date, event_type, n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY ord
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS base_n
        |  FROM daily)
        |SELECT event_date, event_type, n, total, base_n, base_total,
        |  (base_n IS NOT NULL AND base_total IS NOT NULL AND
        |   (CAST(n AS DECIMAL(18,0)) * base_total >
        |      CAST(base_n * 2 AS DECIMAL(18,0)) * total
        |    OR CAST(n * 2 AS DECIMAL(18,0)) * base_total <
        |      CAST(base_n AS DECIMAL(18,0)) * total)) AS is_drift
        |FROM d2 JOIN tot2 USING (event_date)
        |ORDER BY event_date NULLS FIRST, event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      graft.dq.Anomaly.typeDrift(Tables.events(s, d))
        .orderBy(col("event_date"), col("event_type"))
    },

    // --- intra-day coverage gaps (third monitoring shape) ---------------
    // Anomaly.coverageGaps under the oracle gate: per day, the distinct
    // hours with data and the longest quiet interval between consecutive
    // events — the check that catches a feed dying mid-day while its
    // daily count still looks plausible. Alert threshold fires in DqSpec
    // on injected sparse days; this corpus is dense, which the oracle
    // confirms row by row.
    Q(
      "ref_gap_detection",
      """WITH e AS (SELECT CAST(ts AS DATE) AS event_date,
        |    epoch_us(date_trunc('second', ts)) // 1000000 AS ts_s,
        |    hour(ts) AS h, event_id
        |  FROM events),
        |g AS (SELECT event_date, h,
        |    ts_s - lag(ts_s) OVER (PARTITION BY event_date
        |      ORDER BY ts_s, event_id) AS gap
        |  FROM e)
        |SELECT event_date, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT h) AS BIGINT) AS hours_observed,
        |  CAST(24 - COUNT(DISTINCT h) AS BIGINT) AS hours_missing,
        |  CAST(MAX(gap) AS BIGINT) AS max_gap_s,
        |  (MAX(gap) > 3600) AS is_gap_alert
        |FROM g GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      graft.dq.Anomaly.coverageGaps(Tables.events(s, d))
        .orderBy(col("event_date"))
    },

    // --- CUSUM changepoint score over daily volumes ----------------------
    // Fourth monitoring shape: the rolling-baseline check reacts to one
    // bad day; CUSUM localizes a LEVEL SHIFT (deploy that silently
    // halved a feed) — the cumulative sum of deviations from the global
    // mean drifts fastest at the shift point, so the |cusum| peak marks
    // the candidate changepoint. Kept integer-exact by scaling: each
    // term is n_day·D − T (D days, T total rows) instead of n_day − T/D,
    // so no rational mean ever materializes. Windows are bounded by the
    // calendar (one row per date — the ref_rolling_baseline argument).
    Q(
      "ref_changepoint_cusum",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_date),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS d FROM daily),
        |c AS (SELECT event_date, n,
        |    CAST(SUM(n * d - total) OVER (ORDER BY event_date)
        |      AS BIGINT) AS cusum_scaled
        |  FROM daily, t)
        |SELECT event_date, n, cusum_scaled,
        |  (abs(cusum_scaled) = MAX(abs(cusum_scaled)) OVER ()) AS is_peak
        |FROM c ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      val totals = daily.agg(sum(col("n")).cast("long").as("total"),
        count(lit(1)).as("d"))
      val cum = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy()
      daily.crossJoin(broadcast(totals))
        .withColumn("cusum_scaled",
          sum(col("n") * col("d") - col("total")).over(cum))
        .withColumn("is_peak",
          abs(col("cusum_scaled"))
            === max(abs(col("cusum_scaled"))).over(whole))
        .select(col("event_date"), col("n"), col("cusum_scaled"),
          col("is_peak"))
        .orderBy(col("event_date"))
    },

    // --- exponentially weighted volume baseline --------------------------
    // Completes the anomaly-baseline trio (trailing-mean, CUSUM, and now
    // EWMA): ewma_t = 0.3·n_t + 0.7·ewma_{t−1}, seeded with the first
    // day — the standard drift-tolerant baseline that discounts old
    // volume geometrically instead of cliff-dropping it like the 7-day
    // window. The recurrence is inherently sequential, but it runs on
    // the DAILY ROLLUP (one row per calendar day — O(days), bounded by
    // the calendar, never by data); the distributed work is only the
    // per-day count. Per-row prefix folds keep the fold order explicit
    // (oldest→current), so the oracle's list_reduce replays the exact
    // IEEE sequence: identical init, identical 0.3·x + 0.7·acc per step,
    // bit-identical doubles. A day is flagged when its count exceeds
    // 1.5× yesterday's EWMA (the baseline must not absorb today's spike
    // before judging it).
    Q(
      "ref_ewma_baseline",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY event_date),
        |h AS (SELECT event_date, n,
        |    list(CAST(n AS DOUBLE)) OVER (ORDER BY event_date
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
        |    list(CAST(n AS DOUBLE)) OVER (ORDER BY event_date
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hist
        |  FROM daily)
        |SELECT event_date, n,
        |  ROUND(list_reduce(hist, (acc, x) -> 0.3 * x + 0.7 * acc), 6)
        |    AS ewma,
        |  (COALESCE(len(prev), 0) > 0 AND n > ROUND(list_reduce(prev,
        |     (acc, x) -> 0.3 * x + 0.7 * acc), 6) * 1.5) AS is_spike
        |FROM h ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      val cum = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevW = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, -1)
      def fold(histCol: Column): Column =
        round(aggregate(
          slice(histCol, lit(2), greatest(size(histCol) - 1, lit(0))),
          element_at(histCol, 1),
          (acc, x) => lit(0.3) * x + lit(0.7) * acc), 6)
      daily
        .withColumn("hist", collect_list(col("n").cast("double")).over(cum))
        .withColumn("prev",
          collect_list(col("n").cast("double")).over(prevW))
        .select(col("event_date"), col("n"),
          fold(col("hist")).as("ewma"),
          (size(col("prev")) > 0
            && col("n") > fold(col("prev")) * 1.5).as("is_spike"))
        .orderBy(col("event_date"))
    },

    // --- join-size estimation by deterministic key-domain sampling -------
    // The optimizer statistic that decides shuffle strategy before any
    // shuffle runs: |A ⋈ B| = Σ_k cA(k)·cB(k), estimated from the 1/4
    // of the KEY DOMAIN whose md5 hash ≡ 0 (mod 4) — deterministic
    // domain sampling (Gibbons' distinct sampling), so the estimate is
    // a reproducible VALUE, not a random draw. Per-key counts are
    // computed for sampled keys only (O(sample) aggregate state); the
    // exact answer — the join count itself — rides along as the
    // yardstick with its error in ppm. At 100 TB the estimator reads
    // two aggregates; the exact join it predicts may be the thing you
    // choose never to run.
    Q(
      "ref_join_size_estimate", {
        val h = graft.functions.TextOps.md5Low60Sql(
          "CAST(user_id AS VARCHAR)")
        s"""WITH a AS (SELECT user_id FROM events
           |  WHERE user_id IS NOT NULL AND event_id % 2 = 0),
           |b AS (SELECT user_id FROM events
           |  WHERE user_id IS NOT NULL AND event_id % 2 = 1),
           |ca AS (SELECT user_id, COUNT(*) AS c FROM a GROUP BY user_id),
           |cb AS (SELECT user_id, COUNT(*) AS c FROM b GROUP BY user_id),
           |s AS (SELECT CAST(4 * SUM(ca.c * cb.c) AS BIGINT) AS est
           |      FROM ca JOIN cb USING (user_id)
           |      WHERE $h % 4 = 0),
           |x AS (SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS exact
           |      FROM ca JOIN cb USING (user_id))
           |SELECT est, exact,
           |  CAST(ABS(est - exact) * 1000000 // exact AS BIGINT)
           |    AS err_ppm
           |FROM s CROSS JOIN x""".stripMargin
      }
    ) { (s, d) =>
      val ev = Tables.events(s, d).where(col("user_id").isNotNull)
      def counts(parity: Int) = ev
        .where(pmod(col("event_id"), lit(2)) === parity)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val ca = counts(0).select(col("user_id"), col("c").as("ca"))
      val cb = counts(1).select(col("user_id"), col("c").as("cb"))
      val joined = ca.join(cb, Seq("user_id"))
      val hash = graft.functions.TextOps.md5Low60(
        col("user_id").cast("string"))
      val est = joined.where(pmod(hash, lit(4)) === 0)
        .agg((lit(4) * sum(col("ca") * col("cb"))).cast("long").as("est"))
      val exact = joined
        .agg(sum(col("ca") * col("cb")).cast("long").as("exact"))
      est.crossJoin(broadcast(exact))
        .select(col("est"), col("exact"),
          expr("abs(est - exact) * 1000000 div exact").cast("long")
            .as("err_ppm"))
    },

    // --- referential-integrity audit (FK orphan counts) ------------------
    // The star-schema conformance check a warehouse runs after every
    // load: per fact FK, how many fact rows reference a missing
    // dimension row. Three LEFT ANTI joins (each a broadcast against
    // its dim at these sizes, SMJ when a dim outgrows the threshold —
    // stats-driven like the star queries), unioned into one audit
    // frame. Zero orphans is the expected answer on conformant data —
    // the query EARNS that zero rather than assuming it.
    Q(
      "ref_fk_orphans",
      """SELECT fk, CAST(n_orphans AS BIGINT) AS n_orphans FROM (
        |  SELECT 'l_orderkey' AS fk, COUNT(*) AS n_orphans
        |  FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT 'l_partkey', COUNT(*)
        |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_partkey IS NULL
        |  UNION ALL
        |  SELECT 'l_suppkey', COUNT(*)
        |  FROM lineitem l LEFT JOIN supplier s
        |    ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_suppkey IS NULL)
        |ORDER BY fk NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d)
      def orphans(fk: String, dim: DataFrame, dimKey: String) =
        li.join(dim, col(fk) === col(dimKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(fk).as("fk"), col("n_orphans"))
      orphans("l_orderkey", Tables.orders(s, d), "o_orderkey")
        .unionByName(orphans("l_partkey", Tables.part(s, d), "p_partkey"))
        .unionByName(
          orphans("l_suppkey", Tables.supplier(s, d), "s_suppkey"))
        .orderBy(col("fk"))
    },

    // --- Holt double-exponential volume forecast -------------------------
    // The trend-aware step past ref_ewma_baseline: level AND trend
    // smoothed jointly (l_t = α·n_t + (1−α)(l+t);
    // t_t = β(l_t − l) + (1−β)t), so a steadily growing table stops
    // reading as a permanent anomaly — the forecast chases the slope.
    // Pair-state recurrence: the engine folds a (l, t) STRUCT
    // accumulator over the per-row history prefix (O(days²) lambda
    // steps on the O(days) daily rollup — bounded by the calendar); the
    // oracle replays it as a recursive CTE. Re-computing l_t inside the
    // trend update (Spark lambdas bind no intermediates) is bit-safe:
    // identical IEEE ops give identical doubles whether referenced or
    // recomputed. A day is a surprise when it exceeds 1.5× YESTERDAY'S
    // forecast — the baseline never absorbs the spike it is judging.
    Q(
      "ref_holt_forecast",
      """WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY event_date),
        |idx AS (SELECT event_date, n,
        |    row_number() OVER (ORDER BY event_date) AS i FROM daily),
        |holt(i, event_date, n, l, t) AS (
        |  SELECT i, event_date, n, CAST(n AS DOUBLE), CAST(0 AS DOUBLE)
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.i, x.event_date, x.n,
        |    0.3 * CAST(x.n AS DOUBLE) + 0.7 * (h.l + h.t),
        |    0.2 * ((0.3 * CAST(x.n AS DOUBLE) + 0.7 * (h.l + h.t)) - h.l)
        |      + 0.8 * h.t
        |  FROM idx x JOIN holt h ON x.i = h.i + 1)
        |SELECT c.event_date, c.n,
        |  ROUND(c.l, 6) AS level, ROUND(c.t, 6) AS trend,
        |  ROUND(c.l + c.t, 6) AS forecast_next,
        |  (c.i > 1 AND CAST(c.n AS DOUBLE) > (p.l + p.t) * 1.5)
        |    AS is_surprise
        |FROM holt c LEFT JOIN holt p ON p.i = c.i - 1
        |ORDER BY c.event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      val cum = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevW = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // seed via null-tolerant get(): the first row's empty prev-prefix
      // must fold to a dummy (guarded out by the size(prev) > 0 flag),
      // not raise on element_at of an empty array
      def fold(histCol: Column): Column = aggregate(
        slice(histCol, lit(2), greatest(size(histCol) - 1, lit(0))),
        struct(coalesce(get(histCol, lit(0)), lit(0.0)).as("l"),
          lit(0.0).as("t")),
        (acc, x) => {
          val l = acc.getField("l"); val t = acc.getField("t")
          val lNew = lit(0.3) * x + lit(0.7) * (l + t)
          struct(lNew.as("l"),
            (lit(0.2) * (lNew - l) + lit(0.8) * t).as("t"))
        })
      daily
        .withColumn("hist", collect_list(col("n").cast("double")).over(cum))
        .withColumn("prev",
          collect_list(col("n").cast("double")).over(prevW))
        .withColumn("st", fold(col("hist")))
        .withColumn("sp", fold(col("prev")))
        .select(col("event_date"), col("n"),
          round(col("st.l"), 6).as("level"),
          round(col("st.t"), 6).as("trend"),
          round(col("st.l") + col("st.t"), 6).as("forecast_next"),
          (size(col("prev")) > 0 && col("n").cast("double") >
            (col("sp.l") + col("sp.t")) * 1.5).as("is_surprise"))
        .orderBy(col("event_date"))
    },

    // --- Holt forecast backtest (one-step-ahead errors) ------------------
    // The evaluation ref_holt_forecast itself never reports: replay the
    // same (l, t) recurrence and score each day's PRIOR-day forecast
    // against the realized count — MAE and MAPE over days 2..D, plus
    // the worst day. Same pair-state fold / recursive-CTE machinery;
    // the error rollup is one aggregate over the O(days) frame, and
    // every IEEE chain (error, |error|/n, the two means) is written
    // identically on both sides and ROUNDed.
    Q(
      "ref_holt_backtest",
      """WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY event_date),
        |idx AS (SELECT event_date, n,
        |    row_number() OVER (ORDER BY event_date) AS i FROM daily),
        |holt(i, event_date, n, l, t) AS (
        |  SELECT i, event_date, n, CAST(n AS DOUBLE), CAST(0 AS DOUBLE)
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.i, x.event_date, x.n,
        |    0.3 * CAST(x.n AS DOUBLE) + 0.7 * (h.l + h.t),
        |    0.2 * ((0.3 * CAST(x.n AS DOUBLE) + 0.7 * (h.l + h.t)) - h.l)
        |      + 0.8 * h.t
        |  FROM idx x JOIN holt h ON x.i = h.i + 1),
        |e AS (SELECT c.i, c.event_date, c.n,
        |    ABS(CAST(c.n AS DOUBLE) - (p.l + p.t)) AS abs_err,
        |    ABS(CAST(c.n AS DOUBLE) - (p.l + p.t)) / CAST(c.n AS DOUBLE)
        |      AS rel_err
        |  FROM holt c JOIN holt p ON p.i = c.i - 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
        |  ROUND(SUM(abs_err) / COUNT(*), 6) AS mae,
        |  ROUND(SUM(rel_err) / COUNT(*) * 1000000, 0) AS mape_ppm,
        |  MAX(CASE WHEN abs_err = (SELECT MAX(abs_err) FROM e)
        |    THEN event_date END) AS worst_day
        |FROM e""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      val cum = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prevW = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, -1)
      def fold(histCol: Column): Column = aggregate(
        slice(histCol, lit(2), greatest(size(histCol) - 1, lit(0))),
        struct(coalesce(get(histCol, lit(0)), lit(0.0)).as("l"),
          lit(0.0).as("t")),
        (acc, x) => {
          val l = acc.getField("l"); val t = acc.getField("t")
          val lNew = lit(0.3) * x + lit(0.7) * (l + t)
          struct(lNew.as("l"),
            (lit(0.2) * (lNew - l) + lit(0.8) * t).as("t"))
        })
      val e = daily
        .withColumn("prev",
          collect_list(col("n").cast("double")).over(prevW))
        .withColumn("sp", fold(col("prev")))
        .where(size(col("prev")) > 0)
        .select(col("event_date"),
          abs(col("n").cast("double") - (col("sp.l") + col("sp.t")))
            .as("abs_err"),
          (abs(col("n").cast("double") - (col("sp.l") + col("sp.t"))) /
            col("n").cast("double")).as("rel_err"))
      val worst = Window.partitionBy()
      e.withColumn("mx", max(col("abs_err")).over(worst))
        .agg(count(lit(1)).as("n_scored"),
          round(sum(col("abs_err")) / count(lit(1)), 6).as("mae"),
          round(sum(col("rel_err")) / count(lit(1)) * 1000000, 0)
            .as("mape_ppm"),
          max(when(col("abs_err") === col("mx"), col("event_date")))
            .as("worst_day"))
    },

    // --- order-insensitive content checksum (reconciliation) -------------
    // "Did the rerun/replica produce the SAME table?" answered in one
    // aggregate instead of a row-by-row diff: per ingestion day, the sum
    // mod 2^60 of each row's cross-engine MD5 hash over a canonical
    // column rendering. Addition commutes, so partitioning, shuffle
    // order, and file layout can't move the checksum — two environments
    // agree iff their row MULTISETS agree (mod the 2^60 collision bound).
    // The NUL delimiter cannot appear in the data, so field boundaries
    // --- join-key skew audit ---------------------------------------------
    // The pre-join diagnostic a 100 TB pipeline runs BEFORE shuffling on
    // a key: per-key counts (one combiner-friendly aggregation), then
    // three exact integer skew signals — max occupancy, the top-5 keys'
    // share, and max-over-mean — that decide between a plain shuffle,
    // AQE skew splitting, or the Salting operator. No global window and
    // no sort of the key histogram: top-5 rides a TakeOrdered heap, the
    // rest is one more aggregate, so the audit costs one pass over the
    // histogram regardless of key cardinality. Ratios in ppm via
    // DECIMAL cross-multiplication (exact at any magnitude — the
    // type-drift discipline); top-5 tie-breaks can differ between
    // engines but equal counts sum equally, so the share is stable.
    Q(
      "ref_key_skew",
      """WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events
        |           GROUP BY user_id),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |          CAST(SUM(cnt) AS BIGINT) AS total_rows,
        |          CAST(MAX(cnt) AS BIGINT) AS max_cnt
        |        FROM c),
        |top5 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS top5_rows FROM
        |         (SELECT cnt FROM c ORDER BY cnt DESC LIMIT 5)),
        |j AS (SELECT * FROM tot CROSS JOIN top5)
        |SELECT n_keys, total_rows, max_cnt,
        |  CAST(CAST(top5_rows AS HUGEINT) * 1000000
        |    // total_rows AS BIGINT) AS top5_share_ppm,
        |  CAST(CAST(max_cnt AS HUGEINT) * 1000000 * n_keys
        |    // total_rows AS BIGINT) AS max_over_mean_ppm
        |FROM j ORDER BY n_keys""".stripMargin
    ) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val tot = c.agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total_rows"), max(col("cnt")).as("max_cnt"))
      val top5 = c.orderBy(col("cnt").desc).limit(5)
        .agg(sum(col("cnt")).as("top5_rows"))
      tot.crossJoin(broadcast(top5))
        .select(col("n_keys"), col("total_rows"), col("max_cnt"),
          expr("""CAST(CAST(top5_rows AS DECIMAL(38,0)) * 1000000
            | div total_rows AS BIGINT)""".stripMargin)
            .as("top5_share_ppm"),
          expr("""CAST(CAST(max_cnt AS DECIMAL(38,0)) * 1000000 * n_keys
            | div total_rows AS BIGINT)""".stripMargin)
            .as("max_over_mean_ppm"))
        .orderBy(col("n_keys"))
    },

    // can't alias ("ab","c" vs "a","bc"). This is the cheap cross-
    // environment reconciliation a backfill verifies itself with.
    Q(
      "ref_table_checksum",
      s"""WITH r AS (SELECT CAST(ts AS DATE) AS event_date,
        |    ${graft.functions.TextOps.md5Low60Sql(
                "concat_ws(chr(0), COALESCE(CAST(event_id AS VARCHAR), ''), " +
                "COALESCE(CAST(user_id AS VARCHAR), ''), " +
                "COALESCE(event_type, ''), " +
                "COALESCE(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), ''))")}
        |      AS h
        |  FROM events)
        |SELECT event_date, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(h) % 1152921504606846976 AS BIGINT) AS checksum
        |FROM r GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // decimal rendering: both engines print DECIMAL(18,2) with its full
      // scale ("42.25"); the hash sum tops int64 (~2^60 x rows), so it
      // accumulates in DECIMAL(38,0) - DuckDB's SUM is HUGEINT natively
      val rendered = concat_ws("\u0000",
        coalesce(col("event_id").cast("string"), lit("")),
        coalesce(col("user_id").cast("string"), lit("")),
        coalesce(col("event_type"), lit("")),
        coalesce(col("value").cast("decimal(18,2)").cast("string"),
          lit("")))
      Tables.events(s, d)
        .select(to_date(col("ts")).as("event_date"),
          graft.functions.TextOps.md5Low60(rendered).as("h"))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          (sum(col("h").cast("decimal(38,0)"))
            % lit(1152921504606846976L)).cast("long").as("checksum"))
        .orderBy(col("event_date"))
    },

    // --- JSON extraction over events.props ------------------------------
    Q(
      "ref_json_extract",
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k"))
        .orderBy(col("event_id"))
    },

    // --- exact distinct users per event type ----------------------------
    Q(
      "ref_distinct_users",
      """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count_distinct(col("user_id")).as("users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // --- approximate distinct (HLL) — error-bound-checked ----------------
    // HLL register layouts and hashes differ across engines, so the sketch
    // VALUE is not oracle-comparable; what IS comparable is the accuracy
    // CONTRACT. Emit the exact count plus a boolean asserting the HLL
    // estimate landed within tolerance (5× the 2% target rsd, floor of 2
    // for tiny groups — robust to fixture regeneration, still a real
    // quality gate); the oracle recomputes the exact count and asserts
    // the boolean is always TRUE.
    Q(
      "ref_approx_distinct_users",
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_tol
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count_distinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= greatest(lit(2L), (col("exact_users") * 0.10).cast("long")))
            .as("within_tol"))
        .orderBy(col("event_type"))
    },

    // --- set ops over user populations ----------------------------------
    Q(
      "ref_users_intersect",
      """SELECT user_id FROM
        |  (SELECT DISTINCT user_id FROM events
        |     WHERE event_type = 'purchase' AND value > 100
        |   INTERSECT
        |   SELECT DISTINCT user_id FROM events
        |     WHERE event_type = 'view' AND value > 100)
        |ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      ev.where(col("event_type") === "purchase" && col("value") > 100)
        .select("user_id").distinct()
        .intersect(
          ev.where(col("event_type") === "view" && col("value") > 100)
            .select("user_id").distinct())
        .orderBy(col("user_id"))
    },

    // --- partition-pruned single-day scan over the curated layout --------
    // The pipeline's whole design point (Catalog.scala, SURVEY §3.2) is
    // that a WHERE ingestion_date = d scans ONE directory — but the
    // driver fixtures are single unpartitioned files, so no bench-path
    // query ever demonstrated it. This one materializes the
    // date-partitioned curated layout (once per fixture generation,
    // fingerprint-keyed) and scans a single day through it;
    // PartitionPruneSpec asserts the scan carries non-empty
    // PartitionFilters, i.e. file listing is O(partition), not O(table).
    Q(
      "ref_pruned_day_hourly",
      """SELECT CAST(hour(ts) AS INT) AS hr, COUNT(*) AS n
        |FROM events
        |WHERE CAST(ts AS DATE) = (SELECT MIN(CAST(ts AS DATE)) FROM events)
        |GROUP BY hr
        |ORDER BY hr NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val dir = partitionedEventsDir(s, d)
      val minDay = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).cast("string")).head.getString(0)
      val part = s.read.parquet(dir)
      // partition-type inference may surface event_date as DATE or
      // STRING; match the literal to the resolved type so the filter
      // stays a foldable partition predicate either way
      val dayLit = part.schema("event_date").dataType match {
        case org.apache.spark.sql.types.DateType => to_date(lit(minDay))
        case _ => lit(minDay)
      }
      part.where(col("event_date") === dayLit)
        .groupBy(hour(col("ts")).cast("int").as("hr"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("hr"))
    },

    Q(
      "ref_users_except",
      """SELECT user_id FROM
        |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |   EXCEPT
        |   SELECT DISTINCT user_id FROM events
        |     WHERE event_type = 'purchase' AND value > 300)
        |ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      ev.where(col("event_type") === "signup").select("user_id").distinct()
        .except(
          ev.where(col("event_type") === "purchase" && col("value") > 300)
            .select("user_id").distinct())
        .orderBy(col("user_id"))
    },

    // --- Benford first-digit audit (fraud/synthetic-data DQ check) ------
    // The classic forensic-accounting screen: natural multi-scale
    // magnitudes follow P(d) = log10(1+1/d); injected, capped, or
    // synthetic values don't, and the per-digit deviation localizes
    // WHERE the distribution bends (here the uniform generator earns a
    // large, stable deviation — the audit correctly flags it). The nine
    // expected shares are compile-time literals on BOTH sides — log10
    // is a libm call with no cross-engine rounding contract, so it never
    // runs in the query. First digit is exact piecewise arithmetic for
    // the data's [1, 1000) magnitude window (values < 1 are declared out
    // of scope and filtered identically). One narrow scan + one 9-group
    // aggregate; the total rides along as a broadcast 1-row frame.
    {
      val benford = (1 to 9)
        .map(dg => dg -> math.floor(math.log10(1 + 1.0 / dg) * 1e6) / 1e6)
      val caseSql = benford
        .map { case (dg, e) => s"WHEN $dg THEN $e" }
        .mkString("CASE digit ", " ", " END")
      Q(
        "ref_benford_digits",
        s"""WITH v AS (SELECT value FROM events WHERE value >= 1),
           |d AS (SELECT CASE WHEN value >= 100 THEN FLOOR(value / 100)
           |                  WHEN value >= 10 THEN FLOOR(value / 10)
           |                  ELSE FLOOR(value) END AS digit
           |      FROM v),
           |c AS (SELECT CAST(digit AS BIGINT) AS digit, COUNT(*) AS n
           |      FROM d GROUP BY digit),
           |t AS (SELECT COUNT(*) AS total FROM d)
           |SELECT digit, n,
           |  ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
           |  CAST($caseSql AS DOUBLE) AS expected,
           |  ROUND(ABS(CAST(n AS DOUBLE) / total - $caseSql), 6) AS abs_dev
           |FROM c CROSS JOIN t
           |ORDER BY digit NULLS FIRST""".stripMargin
      ) { (s, d) =>
        val expected = element_at(typedlit(benford.toMap), col("digit"))
        val digit = when(col("value") >= 100, floor(col("value") / 100))
          .when(col("value") >= 10, floor(col("value") / 10))
          .otherwise(floor(col("value")))
        val counts = Tables.events(s, d)
          .where(col("value") >= 1)
          .select(digit.cast("long").as("digit"))
          .groupBy(col("digit"))
          .agg(count(lit(1)).as("n"))
        val total = Tables.events(s, d).where(col("value") >= 1)
          .agg(count(lit(1)).as("total"))
        counts.crossJoin(broadcast(total))
          .select(col("digit"), col("n"),
            round(col("n").cast("double") / col("total"), 6).as("share"),
            expected.as("expected"),
            round(abs(col("n").cast("double") / col("total") - expected), 6)
              .as("abs_dev"))
          .orderBy(col("digit"))
      }
    },

    // --- full-history backfill wave plan ---------------------------------
    // The reprocessing planner behind the reference's bounded-parallel
    // backfill (Pipeline.backfillBounded runs it; this query PLANS it):
    // every observed date is assigned to a wave of 4 oldest-first —
    // wave = (rank-1) div 4, slot = (rank-1) mod 4 — with the day's row
    // volume carried along so each wave's capacity need is visible
    // before a single job launches. One daily rollup + one
    // calendar-bounded window; the plan table is O(days).
    Q(
      "ref_backfill_waves",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events WHERE ts IS NOT NULL GROUP BY day),
        |r AS (SELECT day, n_events,
        |    row_number() OVER (ORDER BY day) AS rn FROM daily)
        |SELECT day, n_events,
        |  CAST((rn - 1) // 4 AS BIGINT) AS wave,
        |  CAST((rn - 1) % 4 AS BIGINT) AS slot,
        |  CAST(SUM(n_events) OVER (PARTITION BY (rn - 1) // 4)
        |    AS BIGINT) AS wave_events
        |FROM r ORDER BY day NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events"))
      val r = daily.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("day"))))
        .withColumn("wave", expr("CAST((rn - 1) div 4 AS BIGINT)"))
      r.withColumn("wave_events",
        sum(col("n_events")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("wave"))).cast("long"))
        .select(col("day"), col("n_events"), col("wave"),
          ((col("rn") - 1) % 4).cast("long").as("slot"),
          col("wave_events"))
        .orderBy(col("day"))
    },

    // --- per-stream freshness / staleness check --------------------------
    // The DQ dimension the null/dup counters miss: is each event stream
    // still ARRIVING? Per event_type the last-seen second, minutes
    // behind the corpus frontier (exact integer epoch-second
    // arithmetic — no wall clock, so the check is reproducible), and a
    // 24 h SLA breach flag. One grouped aggregate over (type), then a
    // frontier comparison across the handful of type rows.
    Q(
      "ref_dq_freshness",
      """WITH t AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(MAX(epoch_us(date_trunc('second', ts)) // 1000000)
        |      AS BIGINT) AS last_s
        |  FROM events WHERE ts IS NOT NULL GROUP BY event_type),
        |f AS (SELECT event_type, n_events, last_s,
        |    CAST(MAX(last_s) OVER () AS BIGINT) AS frontier_s FROM t)
        |SELECT event_type, n_events,
        |  CAST((frontier_s - last_s) // 60 AS BIGINT) AS minutes_behind,
        |  ((frontier_s - last_s) // 60 > 1440) AS sla_breach
        |FROM f ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val t = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          max(col("ts").cast("long")).as("last_s"))
      t.withColumn("frontier_s",
        max(col("last_s")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()).cast("long"))
        .select(col("event_type"), col("n_events"),
          expr("CAST((frontier_s - last_s) div 60 AS BIGINT)")
            .as("minutes_behind"),
          (expr("(frontier_s - last_s) div 60") > 1440).as("sla_breach"))
        .orderBy(col("event_type"))
    },

    // --- k-anonymity audit before a data release -------------------------
    // The privacy screen beside text_pii_redact: with quasi-identifiers
    // (event_date, event_type, hour), any cell with fewer than k=5 rows
    // re-identifies; the release report counts, per day, the cells, the
    // sub-k cells, the rows those would suppress, and the suppressed
    // share in integer ppm. Two hash rollups (cell, then day) — the
    // same two-level shape at any scale.
    Q(
      "ref_k_anonymity",
      """WITH cells AS (SELECT CAST(ts AS DATE) AS event_date,
        |    event_type, hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL
        |  GROUP BY event_date, event_type, h)
        |SELECT event_date,
        |  CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS small_cells,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS suppressed_rows,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000
        |    // SUM(n) AS BIGINT) AS suppressed_ppm
        |FROM cells GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("event_date"),
          col("event_type"), hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("n") < 5, 1).otherwise(0)).cast("long")
            .as("small_cells"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).cast("long")
            .as("suppressed_rows"),
          sum(col("n")).cast("long").as("day_rows"))
        .select(col("event_date"), col("n_cells"), col("small_cells"),
          col("suppressed_rows"),
          expr("CAST(suppressed_rows * 1000000 div day_rows AS BIGINT)")
            .as("suppressed_ppm"))
        .orderBy(col("event_date"))
    },

    // --- l-diversity audit over the same quasi-identifier cells ----------
    // k-anonymity's known blind spot (Machanavajjhala et al. 2007): a
    // cell can hold ≥ k rows that all belong to ONE user — group size
    // passes, yet the quasi-identifiers still pinpoint the sensitive
    // value. Same (date, type, hour) cells as ref_k_anonymity, sensitive
    // attribute = user_id, l = 3: per day, how many cells carry fewer
    // than 3 distinct users, and what row mass a release would have to
    // suppress. One aggregate over the cell grain (count + distinct
    // count ride the same exchange), then a day rollup — the k-anonymity
    // scale shape unchanged.
    Q(
      "ref_l_diversity",
      """WITH cells AS (SELECT CAST(ts AS DATE) AS event_date,
        |    event_type, hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY event_date, event_type, h)
        |SELECT event_date,
        |  CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS low_diversity_cells,
        |  CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
        |    AS suppressed_rows,
        |  CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) * 1000000
        |    // SUM(n) AS BIGINT) AS suppressed_ppm
        |FROM cells GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy(col("ts").cast("date").as("event_date"),
          col("event_type"), hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("l"))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("l") < 3, 1).otherwise(0)).cast("long")
            .as("low_diversity_cells"),
          sum(when(col("l") < 3, col("n")).otherwise(0L)).cast("long")
            .as("suppressed_rows"),
          sum(col("n")).cast("long").as("day_rows"))
        .select(col("event_date"), col("n_cells"),
          col("low_diversity_cells"), col("suppressed_rows"),
          expr("CAST(suppressed_rows * 1000000 div day_rows AS BIGINT)")
            .as("suppressed_ppm"))
        .orderBy(col("event_date"))
    },

    // --- error-budget burn rate over the DQ threshold ---------------------
    // The reference's 3% null-user threshold
    // (raw_to_curated_events_v3_dq.py:25) restated as an SRE error
    // budget with Google's multiwindow burn-rate alerting: per hour,
    // burn = null_rate / budget in centi-units (100 = consuming exactly
    // at budget); a day report carries the worst hour, the count of
    // fast-burn hours (burn > 14.4× — the page-now threshold), and the
    // day-level burn. Turns the binary gate the reference has into the
    // graded signal an on-call rotation actually uses. One hour-grain
    // aggregate + one day rollup, integer ppm/centi throughout.
    Q(
      "ref_error_budget_burn",
      """WITH hourly AS (SELECT CAST(ts AS DATE) AS event_date,
        |    hour(ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nulls
        |  FROM events WHERE ts IS NOT NULL
        |  GROUP BY event_date, h),
        |hb AS (SELECT event_date, h, n, nulls,
        |    CAST((nulls * 1000000 // n) * 100 // 30000 AS BIGINT)
        |      AS burn_centi
        |  FROM hourly)
        |SELECT event_date,
        |  CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(MAX(burn_centi) AS BIGINT) AS worst_hour_burn_centi,
        |  CAST(SUM(CASE WHEN burn_centi > 1440 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS fast_burn_hours,
        |  CAST((SUM(nulls) * 1000000 // SUM(n)) * 100 // 30000 AS BIGINT)
        |    AS day_burn_centi
        |FROM hb GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("event_date"),
          hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("user_id").isNull, 1).otherwise(0)).cast("long")
            .as("nulls"))
        .withColumn("burn_centi",
          expr("CAST((nulls * 1000000 div n) * 100 div 30000 AS BIGINT)"))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n_hours"),
          max(col("burn_centi")).cast("long")
            .as("worst_hour_burn_centi"),
          sum(when(col("burn_centi") > 1440, 1).otherwise(0)).cast("long")
            .as("fast_burn_hours"),
          expr("CAST((sum(nulls) * 1000000 div sum(n)) * 100 div 30000" +
            " AS BIGINT)").as("day_burn_centi"))
        .orderBy(col("event_date"))
    },

    // --- Holt-Winters triple-exponential forecast (weekly season) --------
    // The seasonal step past ref_holt_forecast: level, trend AND a
    // 7-slot additive seasonal state smoothed jointly (l_t = α(y_t −
    // s_{t−m}) + (1−α)(l+b); b_t = β(l_t−l) + (1−β)b; s_t = γ(y_t −
    // l_t) + (1−γ)s_{t−m}), so a weekday-shaped series stops leaking
    // its weekly ripple into the trend. State is (l, b, s[7]) with the
    // seasonal ring rotating head→tail each day (s[1] is always the
    // slot that applies NEXT); zero-seeded, so the first week runs as
    // plain Holt while the ring warms. Same execution shape as the
    // Holt pair: the engine folds the struct accumulator over per-row
    // history prefixes (O(days²) lambda steps on the calendar-bounded
    // rollup), the oracle replays a recursive CTE carrying the list —
    // identical IEEE ops in identical order, so doubles match
    // bit-for-bit and recomputing l_t inside the b/s updates is safe
    // (the ref_holt_forecast precedent).
    Q(
      "ref_holt_winters",
      """WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY event_date),
        |idx AS (SELECT event_date, n,
        |    row_number() OVER (ORDER BY event_date) AS i FROM daily),
        |hw(i, event_date, n, l, b, s) AS (
        |  SELECT i, event_date, n, CAST(n AS DOUBLE), CAST(0 AS DOUBLE),
        |    [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0]
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.i, x.event_date, x.n,
        |    0.3 * (CAST(x.n AS DOUBLE) - h.s[1]) + 0.7 * (h.l + h.b),
        |    0.2 * ((0.3 * (CAST(x.n AS DOUBLE) - h.s[1])
        |        + 0.7 * (h.l + h.b)) - h.l) + 0.8 * h.b,
        |    list_append(h.s[2:7],
        |      0.3 * (CAST(x.n AS DOUBLE)
        |          - (0.3 * (CAST(x.n AS DOUBLE) - h.s[1])
        |             + 0.7 * (h.l + h.b)))
        |        + 0.7 * h.s[1])
        |  FROM idx x JOIN hw h ON x.i = h.i + 1)
        |SELECT event_date, n, ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
        |  ROUND(s[7], 6) AS seasonal,
        |  ROUND(l + b + s[1], 6) AS forecast_next
        |FROM hw ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      val cum = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def fold(histCol: Column): Column = aggregate(
        slice(histCol, lit(2), greatest(size(histCol) - 1, lit(0))),
        struct(coalesce(get(histCol, lit(0)), lit(0.0)).as("l"),
          lit(0.0).as("b"), array_repeat(lit(0.0), lit(7)).as("s")),
        (acc, x) => {
          val l = acc.getField("l")
          val b = acc.getField("b")
          val sArr = acc.getField("s")
          val sHead = element_at(sArr, 1)
          val lN = lit(0.3) * (x - sHead) + lit(0.7) * (l + b)
          val bN = lit(0.2) * (lN - l) + lit(0.8) * b
          val sN = lit(0.3) * (x - lN) + lit(0.7) * sHead
          struct(lN.as("l"), bN.as("b"),
            concat(slice(sArr, 2, 6), array(sN)).as("s"))
        })
      daily
        .withColumn("hist", collect_list(col("n").cast("double")).over(cum))
        .withColumn("st", fold(col("hist")))
        .select(col("event_date"), col("n"),
          round(col("st.l"), 6).as("level"),
          round(col("st.b"), 6).as("trend"),
          round(element_at(col("st.s"), 7), 6).as("seasonal"),
          round(col("st.l") + col("st.b") + element_at(col("st.s"), 1), 6)
            .as("forecast_next"))
        .orderBy(col("event_date"))
    },

    // --- Holt vs Holt-Winters one-step backtest ---------------------------
    // The model-selection readout the two smoothers need: replay BOTH
    // recurrences over the same daily series and score each day's
    // prior-day forecast (Holt: l+t; HW: l+b+s[1]) — if the series
    // carries a real weekly ripple, the seasonal model's one-step MAE
    // drops below the pair-state model's, and THAT delta (not theory)
    // is what justifies the extra state at 100 TB. Same prefix-fold /
    // recursive-CTE machinery as the parent queries, two bounded error
    // rollups unioned; identical IEEE chains, ROUNDed.
    Q(
      "ref_hw_backtest",
      """WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) AS event_date,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY event_date),
        |idx AS (SELECT event_date, n,
        |    row_number() OVER (ORDER BY event_date) AS i FROM daily),
        |holt(i, n, l, t) AS (
        |  SELECT i, n, CAST(n AS DOUBLE), CAST(0 AS DOUBLE)
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.i, x.n,
        |    0.3 * CAST(x.n AS DOUBLE) + 0.7 * (h.l + h.t),
        |    0.2 * ((0.3 * CAST(x.n AS DOUBLE) + 0.7 * (h.l + h.t)) - h.l)
        |      + 0.8 * h.t
        |  FROM idx x JOIN holt h ON x.i = h.i + 1),
        |hw(i, n, l, b, s) AS (
        |  SELECT i, n, CAST(n AS DOUBLE), CAST(0 AS DOUBLE),
        |    [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0]
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT x.i, x.n,
        |    0.3 * (CAST(x.n AS DOUBLE) - h.s[1]) + 0.7 * (h.l + h.b),
        |    0.2 * ((0.3 * (CAST(x.n AS DOUBLE) - h.s[1])
        |        + 0.7 * (h.l + h.b)) - h.l) + 0.8 * h.b,
        |    list_append(h.s[2:7],
        |      0.3 * (CAST(x.n AS DOUBLE)
        |          - (0.3 * (CAST(x.n AS DOUBLE) - h.s[1])
        |             + 0.7 * (h.l + h.b)))
        |        + 0.7 * h.s[1])
        |  FROM idx x JOIN hw h ON x.i = h.i + 1),
        |eh AS (SELECT ABS(CAST(c.n AS DOUBLE) - (p.l + p.t)) AS abs_err
        |  FROM holt c JOIN holt p ON p.i = c.i - 1),
        |ew AS (SELECT ABS(CAST(c.n AS DOUBLE) - (p.l + p.b + p.s[1]))
        |      AS abs_err
        |  FROM hw c JOIN hw p ON p.i = c.i - 1)
        |SELECT model, n_scored, mae FROM (
        |  SELECT 'holt' AS model, CAST(COUNT(*) AS BIGINT) AS n_scored,
        |    ROUND(SUM(abs_err) / COUNT(*), 6) AS mae FROM eh
        |  UNION ALL
        |  SELECT 'hw', CAST(COUNT(*) AS BIGINT),
        |    ROUND(SUM(abs_err) / COUNT(*), 6) FROM ew)
        |ORDER BY model""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("n"))
      val prevW = Window.orderBy(col("event_date"))
        .rowsBetween(Window.unboundedPreceding, -1)
      def foldHolt(histCol: Column): Column = aggregate(
        slice(histCol, lit(2), greatest(size(histCol) - 1, lit(0))),
        struct(coalesce(get(histCol, lit(0)), lit(0.0)).as("l"),
          lit(0.0).as("t")),
        (acc, x) => {
          val l = acc.getField("l"); val t = acc.getField("t")
          val lNew = lit(0.3) * x + lit(0.7) * (l + t)
          struct(lNew.as("l"),
            (lit(0.2) * (lNew - l) + lit(0.8) * t).as("t"))
        })
      def foldHw(histCol: Column): Column = aggregate(
        slice(histCol, lit(2), greatest(size(histCol) - 1, lit(0))),
        struct(coalesce(get(histCol, lit(0)), lit(0.0)).as("l"),
          lit(0.0).as("b"), array_repeat(lit(0.0), lit(7)).as("s")),
        (acc, x) => {
          val l = acc.getField("l")
          val b = acc.getField("b")
          val sArr = acc.getField("s")
          val sHead = element_at(sArr, 1)
          val lN = lit(0.3) * (x - sHead) + lit(0.7) * (l + b)
          val bN = lit(0.2) * (lN - l) + lit(0.8) * b
          val sN = lit(0.3) * (x - lN) + lit(0.7) * sHead
          struct(lN.as("l"), bN.as("b"),
            concat(slice(sArr, 2, 6), array(sN)).as("s"))
        })
      val base = daily
        .withColumn("prev",
          collect_list(col("n").cast("double")).over(prevW))
        .where(size(col("prev")) > 0)
      val eh = base.withColumn("sp", foldHolt(col("prev")))
        .select(abs(col("n").cast("double")
          - (col("sp.l") + col("sp.t"))).as("abs_err"))
      val ew = base.withColumn("sp", foldHw(col("prev")))
        .select(abs(col("n").cast("double")
          - (col("sp.l") + col("sp.b") + element_at(col("sp.s"), 1)))
          .as("abs_err"))
      def rollup(df: DataFrame, model: String) =
        df.agg(count(lit(1)).cast("long").as("n_scored"),
          round(sum(col("abs_err")) / count(lit(1)), 6).as("mae"))
          .select(lit(model).as("model"), col("n_scored"), col("mae"))
      rollup(eh, "holt").unionByName(rollup(ew, "hw"))
        .orderBy(col("model"))
    },

    // --- partition-key advisor over candidate layout columns -------------
    // THE physical-layout decision the reference's date-partitioned lake
    // already made (ingestion_date) — stated as a measurable query so
    // the next table's choice is data-driven: for each candidate column
    // the distinct-value count (too many → tiny files; too few → no
    // pruning), the skew of the biggest partition over the mean in
    // exact milli (max·card·1000 div total), and the verdict under the
    // standard band (10 ≤ card ≤ 10 000, skew < 10×). One grouped
    // rollup per candidate, unioned — each a single exchange.
    Q(
      "ref_partition_key_advisor",
      """WITH cand AS (
        |  SELECT 'event_type' AS col_name, COALESCE(event_type, '<null>')
        |    AS v FROM events
        |  UNION ALL
        |  SELECT 'event_date', CAST(CAST(ts AS DATE) AS VARCHAR)
        |    FROM events WHERE ts IS NOT NULL
        |  UNION ALL
        |  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        |    WHERE user_id IS NOT NULL),
        |g AS (SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM cand GROUP BY col_name, v),
        |m AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) AS card,
        |    CAST(MAX(n) AS BIGINT) AS max_part,
        |    CAST(SUM(n) AS BIGINT) AS total
        |  FROM g GROUP BY col_name)
        |SELECT col_name, card, max_part,
        |  CAST(max_part * card * 1000 // total AS BIGINT) AS skew_milli,
        |  (card BETWEEN 10 AND 10000
        |   AND max_part * card * 1000 // total < 10000) AS recommended
        |FROM m ORDER BY col_name NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val cand = ev.select(lit("event_type").as("col_name"),
          coalesce(col("event_type"), lit("<null>")).as("v"))
        .unionAll(ev.where(col("ts").isNotNull)
          .select(lit("event_date").as("col_name"),
            col("ts").cast("date").cast("string").as("v")))
        .unionAll(ev.where(col("user_id").isNotNull)
          .select(lit("user_id").as("col_name"),
            col("user_id").cast("string").as("v")))
      cand.groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("card"),
          max(col("n")).cast("long").as("max_part"),
          sum(col("n")).cast("long").as("total"))
        .select(col("col_name"), col("card"), col("max_part"),
          expr("CAST(max_part * card * 1000 div total AS BIGINT)")
            .as("skew_milli"),
          (col("card").between(10, 10000) &&
            expr("max_part * card * 1000 div total") < 10000)
            .as("recommended"))
        .orderBy(col("col_name"))
    },

    // --- day-of-week-adjusted (deseasonalized) daily volume --------------
    // The monitoring view that stops weekends from paging on-call: each
    // day's count divided by its DOW's average-over-overall-average
    // factor (ratio-to-DOW-mean deseasonalization), entirely in scaled
    // integer arithmetic — factor_ppm = dowsum·days·10⁶ div
    // (dowdays·total), adjusted_milli = n·10⁹ div factor_ppm — so no
    // libm and no float divergence. All windows ride the
    // calendar-bounded daily rollup.
    Q(
      "ref_deseasonalized_daily",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    dayofweek(ts) + 1 AS dow, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY d, dow),
        |w AS (SELECT d, dow, n,
        |    CAST(SUM(n) OVER (PARTITION BY dow) AS BIGINT) AS dowsum,
        |    CAST(COUNT(*) OVER (PARTITION BY dow) AS BIGINT) AS dowdays,
        |    CAST(SUM(n) OVER () AS BIGINT) AS total,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS days
        |  FROM daily),
        |f AS (SELECT d, dow, n,
        |    CAST(dowsum * days * 1000000 // (dowdays * total) AS BIGINT)
        |      AS factor_ppm
        |  FROM w)
        |SELECT d, CAST(dow AS INT) AS dow, n, factor_ppm,
        |  CAST(n * 1000000000 // factor_ppm AS BIGINT) AS adjusted_milli
        |FROM f ORDER BY d NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("d"),
          dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n"))
      import org.apache.spark.sql.expressions.{Window => W}
      val wDow = W.partitionBy(col("dow"))
      val wAll = W.partitionBy()
      daily
        .withColumn("dowsum", sum(col("n")).over(wDow).cast("long"))
        .withColumn("dowdays", count(lit(1)).over(wDow).cast("long"))
        .withColumn("total", sum(col("n")).over(wAll).cast("long"))
        .withColumn("days", count(lit(1)).over(wAll).cast("long"))
        .withColumn("factor_ppm",
          expr("CAST(dowsum * days * 1000000 div (dowdays * total) AS BIGINT)"))
        .select(col("d"), col("dow").cast("int").as("dow"), col("n"),
          col("factor_ppm"),
          expr("CAST(n * 1000000000 div factor_ppm AS BIGINT)")
            .as("adjusted_milli"))
        .orderBy(col("d"))
    },

    // --- day-over-day distribution drift (total variation) ------------------
    // The log-free drift gate: per day, the total-variation distance
    // ½·Σ|p_t − q_t| between today's and yesterday's event-type mix —
    // the metric DQ pipelines page on when an upstream producer changes
    // its emission mix (PSI and KL need logarithms; TV bounds both and
    // stays in exact integers). Evaluated WITHOUT per-type floor-ppm
    // rounding: TV_ppm = Σ|n_t·N_prev − m_t·N_cur|·1e6 // (2·N_cur·
    // N_prev) cross-multiplies so only one floor happens at the end.
    // The (days × types) spine is bounded (calendar × enum), so the
    // lag windows ride frames thousands of rows wide at any corpus
    // size; the only data-scale stage is the (day, type) count.
    Q(
      "ref_tv_drift",
      """WITH cnt AS (SELECT CAST(ts AS DATE) AS d, event_type AS t,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY d, t),
        |spine AS (SELECT d, t FROM (SELECT DISTINCT d FROM cnt),
        |                          (SELECT DISTINCT t FROM cnt)),
        |f AS (SELECT spine.d, spine.t, COALESCE(cnt.n, 0) AS n
        |  FROM spine LEFT JOIN cnt ON spine.d = cnt.d AND spine.t = cnt.t),
        |w AS (SELECT d, t, n,
        |    lag(n) OVER (PARTITION BY t ORDER BY d) AS np,
        |    CAST(SUM(n) OVER (PARTITION BY d) AS BIGINT) AS nd
        |  FROM f),
        |w2 AS (SELECT d, t, n, np, nd,
        |    lag(nd) OVER (PARTITION BY t ORDER BY d) AS ndp
        |  FROM w)
        |SELECT d, CAST(MAX(nd) AS BIGINT) AS n_cur,
        |  CAST(MAX(ndp) AS BIGINT) AS n_prev,
        |  CAST(SUM(ABS(CAST(n AS HUGEINT) * ndp
        |      - CAST(np AS HUGEINT) * nd)) * 1000000
        |    // (2 * CAST(MAX(nd) AS HUGEINT) * MAX(ndp)) AS BIGINT)
        |    AS tv_ppm
        |FROM w2 WHERE np IS NOT NULL
        |GROUP BY d ORDER BY d NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val cnt = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("d"),
          col("event_type").as("t"))
        .agg(count(lit(1)).cast("long").as("n"))
      val days = cnt.select(col("d")).distinct()
      val types = cnt.select(col("t")).distinct()
      val f = days.crossJoin(types)
        .join(cnt, Seq("d", "t"), "left")
        .select(col("d"), col("t"), coalesce(col("n"), lit(0L)).as("n"))
      val wt = Window.partitionBy(col("t")).orderBy(col("d"))
      val wd = Window.partitionBy(col("d"))
      val w2 = f
        .withColumn("np", lag(col("n"), 1).over(wt))
        .withColumn("nd", sum(col("n")).over(wd).cast("long"))
        .withColumn("ndp", lag(col("nd"), 1).over(wt))
        .where(col("np").isNotNull)
      w2.groupBy(col("d"))
        .agg(max(col("nd")).cast("long").as("n_cur"),
          max(col("ndp")).cast("long").as("n_prev"),
          expr("CAST(sum(abs(CAST(n AS DECIMAL(19,0)) * ndp" +
            " - CAST(np AS DECIMAL(19,0)) * nd)) * 1000000" +
            " div (2 * CAST(max(nd) AS DECIMAL(19,0)) * max(ndp))" +
            " AS BIGINT)").as("tv_ppm"))
        .orderBy(col("d"))
    },

    // --- one-pass column completeness/cardinality profile --------------------
    // The data-profiler head every ingestion DQ report starts with: per
    // column of the raw events table, null count, null rate, and
    // distinct cardinality — the profile that catches a producer
    // silently dropping a field (nulls spike) or fat-fingering an enum
    // (cardinality jumps) before any downstream rule fires. One corpus
    // scan computes all 6×2 aggregates side by side (Spark expands the
    // multi-DISTINCT into one Expand — still a single pass over the
    // files); the 6-row readout is then unpivoted from the 1-row frame.
    // At 100 TB this is the same shape as the DQ counters: one
    // combiner-friendly pass, O(columns) output.
    Q(
      "ref_column_profile", {
        val cols = Seq("event_id", "ts", "user_id", "event_type",
          "value", "props")
        val aggs = cols.map { c =>
          s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  AS null_$c,
             |CAST(COUNT(DISTINCT $c) AS BIGINT) AS dist_$c"""
            .stripMargin
        }.mkString(",\n")
        val legs = cols.map { c =>
          s"""SELECT '$c' AS column_name, n_rows, null_$c AS n_null,
             |  CAST(null_$c * 1000000 // n_rows AS BIGINT) AS null_ppm,
             |  dist_$c AS n_distinct FROM a""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           |$aggs
           |  FROM events)
           |$legs
           |ORDER BY column_name NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val colsP = Seq("event_id", "ts", "user_id", "event_type",
        "value", "props")
      val aggExprs = Seq(count(lit(1)).cast("long").as("n_rows")) ++
        colsP.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
              .as(s"null_$c"),
            countDistinct(col(c)).cast("long").as(s"dist_$c"))
        }
      val a = Tables.events(s, d).agg(aggExprs.head, aggExprs.tail: _*)
      val legs = colsP.map { c =>
        struct(lit(c).as("column_name"), col("n_rows"),
          col(s"null_$c").as("n_null"),
          expr(s"CAST(null_$c * 1000000 div n_rows AS BIGINT)")
            .as("null_ppm"),
          col(s"dist_$c").as("n_distinct"))
      }
      a.select(explode(array(legs: _*)).as("r"))
        .select(col("r.column_name"), col("r.n_rows"), col("r.n_null"),
          col("r.null_ppm"), col("r.n_distinct"))
        .orderBy(col("column_name"))
    }
  )
}
