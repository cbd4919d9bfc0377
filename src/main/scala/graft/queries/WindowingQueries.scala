package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch time-windowing + multidimensional aggregation extensions
  * (SURVEY §2.12): tumbling windows are in RefQueries; here the sliding /
  * session variants, CUBE, pivot, and schema-full JSON parsing.
  */
object WindowingQueries {

  val all: Seq[Q] = Seq(
    // --- sliding window: 1 h window every 30 min -------------------------
    // each event lands in 2 windows; oracle reproduces Spark's assignment
    // by unnesting both candidate starts per row.
    Q(
      "q_sliding_window",
      """SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS window_start,
        |  COUNT(*) AS n
        |FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                    time_bucket(INTERVAL '30 minutes', ts)
        |                      - INTERVAL '30 minutes']) AS w_start
        |      FROM events)
        |GROUP BY w_start
        |ORDER BY window_start NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm")
            .as("window_start"),
          col("n"))
        .orderBy(col("window_start"))
    },

    // --- session window: gap-based batch sessionization ------------------
    // Oracle reimplements the gap rule from first principles (lag → break
    // flag → running session id): a new session starts when the gap to
    // the previous event EXCEEDS 10 min — session_window's merge is
    // gap-inclusive (an event at exactly last+gap still merges; verified
    // against Spark 4.1 on the test corpus, where `>=` splits one extra
    // session). Both sides sessionize on second-truncated ts so ns-vs-µs
    // parquet precision can't shift a boundary comparison.
    Q(
      "q_session_window",
      """WITH e AS (SELECT user_id, date_trunc('second', ts) AS ts
        |           FROM events),
        |m AS (SELECT user_id, ts,
        |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                  > INTERVAL '10 minutes' THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |sd AS (SELECT user_id, ts,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |       FROM m)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events
        |FROM sd GROUP BY user_id, sid
        |ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(date_trunc("second", col("ts")), "10 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // --- CUBE: all grouping-set combinations -----------------------------
    Q(
      "q_cube_order_dims",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // --- explicit GROUPING SETS (not expressible as rollup/cube) ---------
    // the two one-dimension margins + grand total, skipping the full
    // cross grouping — the shape reporting pipelines actually want.
    Q(
      "q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
          o_orderpriority ASC NULLS FIRST""")
    },

    // --- multiplicity-preserving set ops (INTERSECT/EXCEPT ALL) ----------
    // bag semantics: per user, min(click, purchase) occurrences survive
    // the intersect; click − purchase survive the except. Counted per
    // user so the output is a compact, totally-ordered summary.
    Q(
      "q_intersect_all_users",
      """SELECT user_id, COUNT(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      ev.where(col("event_type") === "click").select(col("user_id"))
        .intersectAll(
          ev.where(col("event_type") === "purchase").select(col("user_id")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },

    Q(
      "q_except_all_users",
      """SELECT user_id, COUNT(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      ev.where(col("event_type") === "click").select(col("user_id"))
        .exceptAll(
          ev.where(col("event_type") === "purchase").select(col("user_id")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },

    // --- the rest of the window-function battery --------------------------
    // lag/lead (navigation), ntile (equi-depth bucketing), percent_rank
    // (relative position) over one per-customer ordering; percent_rank is
    // (rank-1)/(n-1) of identical longs → identical doubles both engines.
    Q(
      "q_window_funcs",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey) OVER w AS prev_order,
        |  lead(o_orderkey) OVER w AS next_order,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  ROUND(percent_rank() OVER w, 6) AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // --- time-series resample: dense hourly spine + gap fill -------------
    // The missing-bucket problem groupBy can't see: a spine of EVERY hour
    // in the observed range (sequence + explode) × event types, left join
    // of the actual hourly counts, zeros filled, plus a carry-forward of
    // the last OBSERVED count (last ignoreNulls window) — the standard
    // prepare-for-forecasting shape. Spine size is hours × types
    // (computed, never shuffled wide); the one real shuffle is the
    // hourly pre-aggregation.
    Q(
      "q_resample_hourly",
      """WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
        |                  date_trunc('hour', MAX(ts)) AS hi FROM events),
        |spine AS (SELECT t.event_type, h.hour
        |          FROM (SELECT DISTINCT event_type FROM events) t
        |          CROSS JOIN (SELECT unnest(generate_series(lo, hi,
        |                        INTERVAL 1 HOUR)) AS hour FROM bounds) h),
        |hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |             COUNT(*) AS n
        |           FROM events GROUP BY event_type, hour)
        |SELECT * FROM (
        |  SELECT spine.event_type AS event_type,
        |    strftime(spine.hour, '%Y-%m-%d %H:%M') AS hour,
        |    CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n,
        |    CAST(last_value(hourly.n IGNORE NULLS) OVER (
        |      PARTITION BY spine.event_type ORDER BY spine.hour
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS last_observed
        |  FROM spine LEFT JOIN hourly
        |    ON spine.event_type = hourly.event_type
        |    AND spine.hour = hourly.hour)
        |ORDER BY event_type NULLS FIRST, hour NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val spine = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("hour"))))
      val hourly = ev
        .groupBy(col("event_type").as("h_type"),
          date_trunc("hour", col("ts")).as("h_hour"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, col("event_type") === col("h_type")
          && col("hour") === col("h_hour"), "left")
        .select(col("event_type"),
          col("hour"), col("n"))
        .select(col("event_type"),
          date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("n"), ignoreNulls = true).over(w).as("last_observed"))
        .orderBy(col("event_type"), col("hour"))
    },

    // --- pivot: event-type counts per user (fixed pivot values) ----------
    Q(
      "q_pivot_user_events",
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase"))
        .orderBy(col("user_id"))
    },

    // --- as-of join: each purchase matched to the user's latest prior ---
    // signup (inclusive). Engine side: graft.operators.AsOfJoin (union +
    // carry-forward window, one shuffle); oracle side: DuckDB's NATIVE
    // ASOF LEFT JOIN — two independent implementations of the operator.
    Q(
      "q_asof_purchase_signup",
      """WITH p AS (SELECT event_id, user_id,
        |             date_trunc('second', ts) AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT DISTINCT user_id,
        |             date_trunc('second', ts) AS s_ts
        |           FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(s.s_ts, '%Y-%m-%d %H:%M:%S') AS asof_signup_ts
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.p_ts >= s.s_ts
        |ORDER BY event_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("p_ts"))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), date_trunc("second", col("ts")).as("s_ts"))
        .distinct()
      graft.operators.AsOfJoin
        .backward(purchases, signups, Seq("user_id"), "p_ts", "s_ts", Nil)
        .select(col("event_id"), col("user_id"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("asof_s_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("asof_signup_ts"))
        .orderBy(col("event_id"))
    },

    // --- forward as-of join: each purchase → the user's NEXT signup ------
    // (at-or-after, inclusive). Engine: AsOfJoin.forward (the same
    // one-shuffle union+carry window, over descending time); oracle: a
    // correlated MIN subquery — an independent statement of the
    // semantics (DuckDB's native ASOF is backward-only).
    Q(
      "q_asof_next_signup",
      """WITH p AS (SELECT event_id, user_id,
        |             date_trunc('second', ts) AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT DISTINCT user_id,
        |             date_trunc('second', ts) AS s_ts
        |           FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime((SELECT MIN(s.s_ts) FROM s
        |            WHERE s.user_id = p.user_id AND s.s_ts >= p.p_ts),
        |           '%Y-%m-%d %H:%M:%S') AS asof_signup_ts
        |FROM p
        |ORDER BY event_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("p_ts"))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), date_trunc("second", col("ts")).as("s_ts"))
        .distinct()
      graft.operators.AsOfJoin
        .forward(purchases, signups, Seq("user_id"), "p_ts", "s_ts", Nil)
        .select(col("event_id"), col("user_id"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("asof_s_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("asof_signup_ts"))
        .orderBy(col("event_id"))
    },

    // --- as-of join with a staleness tolerance ---------------------------
    // pandas merge_asof's `tolerance` semantics on the same operator:
    // the backward match still picks the LATEST prior signup, but a
    // match older than 7 days is rejected (NULLed), not replaced by an
    // older one — attribution pipelines cap how stale a touchpoint may
    // be. Composed as AsOfJoin.backward + a post-filter on the matched
    // timestamp (one plan, no second join); the oracle states the same
    // thing over DuckDB's native ASOF JOIN.
    Q(
      "q_asof_tolerance",
      """WITH p AS (SELECT event_id, user_id,
        |             date_trunc('second', ts) AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT DISTINCT user_id,
        |             date_trunc('second', ts) AS s_ts
        |           FROM events WHERE event_type = 'signup'),
        |     m AS (SELECT p.event_id, p.user_id, p.p_ts,
        |             CASE WHEN s.s_ts IS NOT NULL
        |                   AND p.p_ts - s.s_ts <= INTERVAL 7 DAY
        |               THEN s.s_ts END AS ok_ts
        |           FROM p ASOF LEFT JOIN s
        |             ON p.user_id = s.user_id AND p.p_ts >= s.s_ts)
        |SELECT event_id, user_id,
        |  strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(ok_ts, '%Y-%m-%d %H:%M:%S') AS signup_within_7d,
        |  (ok_ts IS NOT NULL) AS attributable
        |FROM m ORDER BY event_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("p_ts"))
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), date_trunc("second", col("ts")).as("s_ts"))
        .distinct()
      val okTs = when(col("asof_s_ts").isNotNull &&
          col("asof_s_ts") >= col("p_ts") - expr("INTERVAL 7 DAY"),
        col("asof_s_ts"))
      graft.operators.AsOfJoin
        .backward(purchases, signups, Seq("user_id"), "p_ts", "s_ts", Nil)
        .select(col("event_id"), col("user_id"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(okTs, "yyyy-MM-dd HH:mm:ss").as("signup_within_7d"),
          okTs.isNotNull.as("attributable"))
        .orderBy(col("event_id"))
    },

    // --- from_json: schema-full JSON parsing of props --------------------
    Q(
      "q_from_json_props",
      """SELECT k, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS users
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |             user_id
        |      FROM events)
        |GROUP BY k
        |ORDER BY k NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .select(
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"),
          col("user_id"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("users"))
        .orderBy(col("k"))
    },

    // --- exact rolling 7-day active users (retention's workhorse) --------
    // Exact sliding-window DISTINCT cannot ride a window function (no
    // distinct agg over frames), so: dedup to (date, user) pairs ONCE —
    // the only big shuffle, and it combines map-side — then EXPLODE each
    // pair into the 7 window-end dates it contributes to (a narrow
    // per-row sequence, no join) and count distinct per date; a
    // broadcast HASH join against the observed-dates spine drops window
    // ends outside the data. A range-join formulation (d BETWEEN end-6
    // AND end) plans as a BroadcastNestedLoopJoin — calendar-bounded
    // here, but the explode+equi shape keeps every operator hash-based.
    // The fan-out multiplies the already-deduped pair set, not raw
    // events: the textbook exact shape (the approximate alternative is
    // per-day HLL sketches merged over the window — mergeable, but not
    // oracle-able).
    Q(
      "q_rolling_active_users",
      """WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        |               FROM events WHERE user_id IS NOT NULL),
        |days AS (SELECT DISTINCT d FROM pairs)
        |SELECT days.d AS event_date,
        |  CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS active_7d
        |FROM days JOIN pairs p
        |  ON p.d BETWEEN days.d - 6 AND days.d
        |GROUP BY days.d
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val pairs = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("d"), col("user_id"))
        .distinct()
      val days = pairs.select(col("d").as("win_end")).distinct()
      pairs
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("d"))
        .select(col("user_id"), expr("date_add(d, i)").as("win_end"))
        .join(broadcast(days), "win_end")
        .groupBy(col("win_end").as("event_date"))
        .agg(count_distinct(col("user_id")).as("active_7d"))
        .orderBy(col("event_date"))
    },

    // --- signup-cohort weekly retention matrix ---------------------------
    // The product-analytics staple: users grouped by first-signup week,
    // counted per subsequent active week. Two combiner-friendly
    // aggregates (first signup per user; distinct user-weeks) meet in
    // one equi-join on user_id — both sides pre-shrunk to one row per
    // user(-week) before the join, so the shuffles carry dedup'd keys,
    // never raw events. Week truncation is Monday-start in both engines.
    Q(
      "q_cohort_retention",
      """WITH su AS (SELECT user_id,
        |              CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        |            FROM events
        |            WHERE event_type = 'signup' AND user_id IS NOT NULL
        |            GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id,
        |          CAST(date_trunc('week', ts) AS DATE) AS act_week
        |        FROM events WHERE user_id IS NOT NULL)
        |SELECT cohort_week,
        |  CAST((act_week - cohort_week) // 7 AS INT) AS week_offset,
        |  CAST(COUNT(DISTINCT su.user_id) AS BIGINT) AS n_users
        |FROM su JOIN act ON su.user_id = act.user_id
        |WHERE act_week >= cohort_week
        |GROUP BY 1, 2
        |ORDER BY cohort_week NULLS FIRST, week_offset NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d).where(col("user_id").isNotNull)
      val su = e.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
        .select(col("user_id"),
          date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
      val act = e
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("act_week"))
        .distinct()
      su.join(act, "user_id")
        .where(col("act_week") >= col("cohort_week"))
        .groupBy(col("cohort_week"),
          expr("datediff(act_week, cohort_week) div 7").cast("int")
            .as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // --- batch funnel: click → purchase conversion within 1 hour ---------
    // The daily-conversion companion to the streaming clickToPurchase
    // join, built on AsOfJoin.forward: each click picks its user's
    // EARLIEST purchase at-or-after it (one shuffle on user_id, no
    // range-join fan-out), then the 1-hour bound and a per-day rollup.
    // The oracle re-derives the same earliest-purchase per click row
    // (row_number keeps duplicate click events distinct — as-of
    // preserves left multiplicity).
    Q(
      "q_funnel_conversion",
      """WITH p AS (SELECT user_id, ts FROM events
        |      WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |c2 AS (SELECT row_number() OVER (ORDER BY event_id, ts) AS rid,
        |         user_id, ts FROM events
        |       WHERE event_type = 'click' AND user_id IS NOT NULL),
        |m AS (SELECT c2.rid, c2.ts AS cts, MIN(p.ts) AS pts
        |      FROM c2 LEFT JOIN p
        |        ON p.user_id = c2.user_id AND p.ts >= c2.ts
        |      GROUP BY c2.rid, c2.ts)
        |SELECT CAST(cts AS DATE) AS click_date,
        |  COUNT(*) AS clicks,
        |  CAST(COUNT(CASE WHEN pts <= cts + INTERVAL 1 HOUR THEN 1 END)
        |    AS BIGINT) AS conversions
        |FROM m GROUP BY 1
        |ORDER BY click_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d).where(col("user_id").isNotNull)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      graft.operators.AsOfJoin
        .forward(clicks, purchases, Seq("user_id"), "ts", "p_ts", Seq())
        .select(to_date(col("ts")).as("click_date"),
          (col("asof_p_ts").isNotNull &&
            col("asof_p_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
            .as("conv"))
        .groupBy(col("click_date"))
        .agg(count(lit(1)).as("clicks"),
          count(when(col("conv"), 1)).as("conversions"))
        .orderBy(col("click_date"))
    },

    // --- MATCH_RECOGNIZE-style event-sequence pattern matching -----------
    // SQL:2016 row-pattern recognition, Spark-first: each user's events
    // collapse to a string of event-type initials (c/e/p/s/v — all
    // distinct) in (ts, event_id) order, then funnels are plain regexes
    // over that string: subsequence view→click→purchase, and a strict
    // variant with no intervening purchase. One shuffle on user_id; the
    // per-user state is ONE character per event, so even a power user
    // with 10^6 events folds to a 1 MB string (cap with a window row
    // limit if the product allows). Both engines count non-overlapping
    // leftmost matches, and [^p]* cannot cross a 'p', so match extents
    // are forced — no greedy-vs-lazy divergence. Ordering parity: Spark's
    // ts is already µs-truncated (Tables.events), the oracle truncates
    // explicitly; event_id breaks exact-µs ties identically.
    Q(
      "q_event_pattern_funnel",
      """WITH seq AS (SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY date_trunc('microseconds', ts), event_id) AS seq
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY user_id)
        |SELECT user_id,
        |  CAST(length(seq) AS BIGINT) AS n_events,
        |  md5(seq) AS seq_fp,
        |  regexp_matches(seq, 'v.*c.*p') AS has_funnel,
        |  CAST(len(regexp_extract_all(seq, 'v[^p]*c[^p]*p')) AS BIGINT)
        |    AS n_strict_funnels
        |FROM seq ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val tagged = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("i")).as("e"))
      tagged.groupBy(col("user_id"))
        .agg(array_join(
          transform(array_sort(collect_list(col("e"))),
            x => x.getField("i")), "").as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast("long").as("n_events"),
          md5(col("seq")).as("seq_fp"),
          col("seq").rlike("v.*c.*p").as("has_funnel"),
          regexp_count(col("seq"), lit("v[^p]*c[^p]*p")).cast("long")
            .as("n_strict_funnels"))
        .orderBy(col("user_id"))
    },

    // --- week-over-week growth per event type ----------------------------
    // The BI staple: weekly volumes with the previous week's count and
    // the growth in ppm (integer cross-division; negative growth routes
    // through the abs+sign discipline — Spark div truncates, DuckDB //
    // floors). Weeks key on date_trunc('week', ts) rendered as a DATE —
    // both engines are ISO-Monday — and the lag window is RANGE-free
    // (rows offset 1 per (type, week) — one row per key by construction).
    Q(
      "q_wow_growth",
      """WITH w AS (SELECT event_type,
        |    CAST(date_trunc('week', ts) AS DATE) AS week_start,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type, week_start),
        |g AS (SELECT event_type, week_start, n,
        |    lag(n) OVER (PARTITION BY event_type ORDER BY week_start)
        |      AS prev_n
        |  FROM w)
        |SELECT event_type, week_start, n, prev_n,
        |  CAST(CASE WHEN prev_n IS NULL THEN NULL
        |    WHEN n >= prev_n THEN (n - prev_n) * 1000000 // prev_n
        |    ELSE -((prev_n - n) * 1000000 // prev_n) END AS BIGINT)
        |    AS growth_ppm
        |FROM g
        |ORDER BY event_type NULLS FIRST, week_start NULLS FIRST"""
        .stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val byWeek = W.partitionBy(col("event_type"))
        .orderBy(col("week_start"))
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("week", col("ts")).cast("date").as("week_start"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev_n", lag(col("n"), 1).over(byWeek))
        .withColumn("growth_ppm",
          when(col("prev_n").isNull, lit(null).cast("long"))
            .otherwise(when(col("n") >= col("prev_n"),
              expr("(n - prev_n) * 1000000 div prev_n"))
              .otherwise(-expr("(prev_n - n) * 1000000 div prev_n"))
              .cast("long")))
        .orderBy(col("event_type"), col("week_start"))
    },

    // --- inter-purchase intervals: retention-cadence distribution --------
    // How often do converted users come back? Per user, the gaps between
    // CONSECUTIVE purchases (second-truncated, event_id tiebreak), then
    // the corpus-wide cadence distribution: gap count and exact p50/p90
    // in seconds. p50 of integers lands on exact halves, but p90's 0.9
    // fraction is float interpolation — ROUND(…,6) absorbs the last-ulp
    // engine divergence (the q_value_percentiles precedent). One
    // user_id-partitioned window over the purchase subset, one global
    // aggregate.
    Q(
      "q_interpurchase_intervals",
      """WITH p AS (SELECT user_id, event_id,
        |    epoch_us(date_trunc('second', ts)) // 1000000 AS ts_s
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type = 'purchase'),
        |g AS (SELECT user_id,
        |    ts_s - lag(ts_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS gap_s
        |  FROM p)
        |SELECT CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_repeat_users,
        |  ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_gap_s,
        |  ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s
        |FROM g WHERE gap_s IS NOT NULL""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val seq = W.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id"))
      Tables.events(s, d)
        .where(col("user_id").isNotNull && col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("ts_s"))
        .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(seq))
        .where(col("gap_s").isNotNull)
        .agg(count(col("gap_s")).as("n_gaps"),
          count_distinct(col("user_id")).as("n_repeat_users"),
          round(expr("percentile(gap_s, 0.5)"), 6).as("p50_gap_s"),
          round(expr("percentile(gap_s, 0.9)"), 6).as("p90_gap_s"))
    },

    // --- gaps-and-islands: longest same-type streak per user -------------
    // The classic sequence pattern the transition matrix doesn't answer:
    // how LONG do users stay in one behavior? Islands form by the
    // two-window trick — flag type changes with lag(), integrate the
    // flags into island ids with a running sum, count per island, take
    // the per-user max with a (len desc, type asc, start asc) row_number
    // so equal-length streaks break ties deterministically. Ordering
    // rides the second-truncated-ts + event_id discipline. Two shuffles
    // on user_id (both windows share the partitioning — one exchange,
    // Spark reuses it), one aggregate.
    Q(
      "q_longest_streak",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    date_trunc('second', ts) AS ts
        |  FROM events WHERE user_id IS NOT NULL),
        |f AS (SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN event_type IS DISTINCT FROM
        |      lag(event_type) OVER w THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, event_type,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS isl
        |  FROM f),
        |s AS (SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS len
        |  FROM g GROUP BY user_id, event_type, isl),
        |r AS (SELECT user_id, event_type, len, row_number()
        |    OVER (PARTITION BY user_id
        |          ORDER BY len DESC, event_type) AS rn
        |  FROM s)
        |SELECT user_id, len AS streak_len, event_type AS streak_type
        |FROM r WHERE rn = 1
        |ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val seq = W.partitionBy(col("user_id"))
        .orderBy(date_trunc("second", col("ts")), col("event_id"))
      val byLen = W.partitionBy(col("user_id"))
        .orderBy(col("len").desc, col("event_type"))
      Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .withColumn("brk",
          when(!(col("event_type") <=> lag(col("event_type"), 1).over(seq)),
            1).otherwise(0))
        .withColumn("isl", sum(col("brk")).over(seq))
        .groupBy(col("user_id"), col("event_type"), col("isl"))
        .agg(count(lit(1)).as("len"))
        .withColumn("rn", row_number().over(byLen))
        .where(col("rn") === 1)
        .select(col("user_id"), col("len").as("streak_len"),
          col("event_type").as("streak_type"))
        .orderBy(col("user_id"))
    },

    // --- unpivot (melt): wide measures → long (measure, value) -----------
    // The inverse of q_pivot_user_events and the standard reshape before
    // per-measure profiling: lineitem's four numeric measures unpivot to
    // (measure, value) rows — Dataset.unpivot, Spark's native melt; the
    // oracle states the equivalent UNION ALL (exactly unpivot's
    // semantics, one branch per measure). The narrow 4× row expansion
    // happens INSIDE the aggregate's scan stage (no shuffle carries the
    // melted rows; partial aggregation collapses them map-side). Sums in
    // DECIMAL for engine-exact doubles.
    Q(
      "q_unpivot_measures",
      """SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
        |  UNION ALL
        |  SELECT 'price', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'tax', l_tax FROM lineitem)
        |GROUP BY measure
        |ORDER BY measure NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_quantity").as("quantity"),
          col("l_extendedprice").as("price"),
          col("l_discount").as("discount"), col("l_tax").as("tax"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("quantity"), col("price"), col("discount"),
            col("tax")), "measure", "v")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("measure"))
    },

    // --- first-touch attribution over a 7-day lookback --------------------
    // The marketing-analytics counterpart of the as-of join (last-touch):
    // each purchase is credited to the FIRST event of its user inside
    // the trailing week. The oracle states it as the banded range join
    // (purchases × user events in the lookback, arg_min over the packed
    // ts_s·2³²+event_id key — lexicographic while ids stay under 2³²);
    // the ENGINE plan is the skew-proof equivalent: the trailing
    // sliding-window min of the packed key via
    // [[graft.operators.SlidingMin]] (two-bucket decomposition —
    // partitions are (user, week-bucket), both passes incremental
    // cumulative mins), then one uniform-key join mapping each
    // purchase's winning key back to its event_type. The conv ×
    // touches join this replaces is QUADRATIC in the hot key (200k
    // convs × 800k touches for one user at the round-11 ×100 skew
    // tier) — the one shape AQE's splits cannot save because the
    // blow-up is join OUTPUT, not partition size; and the single
    // per-user RANGE window that replaces IT measured 63 s vs 6.5 s
    // uniform on the same tier (one task owns the hot user's whole
    // history). BASELINE.md round-11 skew-join tier records all three
    // shapes. Revenue stays in integer cents.
    Q(
      "q_attribution_first_touch",
      """WITH s AS (SELECT user_id, event_id, event_type,
        |    epoch_us(date_trunc('second', ts)) // 1000000 AS ts_s, value
        |  FROM events WHERE user_id IS NOT NULL),
        |p AS (SELECT user_id, event_id AS pid, ts_s AS pts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM s WHERE event_type = 'purchase'),
        |f AS (SELECT p.pid, p.cents,
        |    arg_min(s.event_type, s.ts_s * 4294967296 + s.event_id)
        |      AS first_touch_type
        |  FROM p JOIN s ON s.user_id = p.user_id
        |    AND s.ts_s <= p.pts AND s.ts_s >= p.pts - 604800
        |  GROUP BY p.pid, p.cents)
        |SELECT first_touch_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM f GROUP BY first_touch_type
        |ORDER BY first_touch_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("ts_s"),
          col("value"))
        .withColumn("packed",
          col("ts_s") * lit(4294967296L) + col("event_id"))
      // trailing-window min per user, probed at purchases only; the
      // [pts−604800, pts] interval is inclusive on both ends like the
      // oracle's value predicate (SlidingMin's RANGE-frame contract)
      val purchases = graft.operators.SlidingMin.trailing(
          ev, "user_id", "ts_s", "packed", "packed", 604800L, "win_key",
          probeFilter = col("event_type") === "purchase")
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"),
          col("win_key"))
      // uniform-key lookup of the winner's type (packed is unique)
      purchases
        .join(ev.select(col("packed").as("win_key"),
          col("event_type").as("first_touch_type")), Seq("win_key"))
        .groupBy(col("first_touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).cast("long").as("sum_cents"))
        .orderBy(col("first_touch_type"))
    },

    // --- Markov transition matrix over per-user event sequences ----------
    // The sequence-analytics primitive behind session modeling and
    // next-event prediction features: for each user's time-ordered event
    // stream, count (previous type → next type) transitions and each
    // row's share of its source state (ppm, integer-exact: n·10^6 div
    // row-total via a window over the aggregate). Ordering is
    // (second-truncated ts, event_id) — the repo's cross-engine tiebreak
    // discipline: events.ts is ns in parquet and µs in Spark, so raw-ts
    // ordering could legally differ between engines within a µs; the
    // truncate+id pair is total and identical. Scale: one shuffle on
    // user_id for the lag window, one hash aggregate on the (prev, next)
    // pair — 25 output rows regardless of input size; the ppm window
    // runs over those aggregated rows only.
    Q(
      "q_event_transitions",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |            date_trunc('second', ts) AS ts
        |          FROM events WHERE user_id IS NOT NULL),
        |t AS (SELECT event_type AS next_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev_type
        |      FROM e),
        |g AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM t WHERE prev_type IS NOT NULL
        |      GROUP BY prev_type, next_type)
        |SELECT prev_type, next_type, n,
        |  CAST(n * 1000000 // CAST(SUM(n) OVER (PARTITION BY prev_type)
        |                          AS BIGINT) AS BIGINT) AS ppm
        |FROM g
        |ORDER BY prev_type NULLS FIRST, next_type NULLS FIRST"""
        .stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val seq = W.partitionBy(col("user_id"))
        .orderBy(date_trunc("second", col("ts")), col("event_id"))
      Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("event_type").as("next_type"),
          lag(col("event_type"), 1).over(seq).as("prev_type"))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("ppm",
          expr("n * 1000000 div sum(n) over (partition by prev_type)")
            .cast("long"))
        .orderBy(col("prev_type"), col("next_type"))
    },

    // --- top user paths per session (path analytics) --------------------
    // The "what journeys happen" query product analytics builds on top
    // of sessionization: per 10-minute-gap session, the ordered
    // event-type sequence truncated to its first 5 steps (bounding path
    // cardinality — untruncated paths are near-unique and useless as
    // groups), then the top-10 paths by session count with a conversion
    // flag. Spark side groups by the native session_window and assembles
    // the path with sort_array(collect_list(struct)) — deterministic
    // because the struct sorts by (ts, event_id); the oracle replays the
    // gap-sum sessionization q_session_window already proved equivalent.
    // Two shuffles (session agg keyed by user, path count keyed by
    // path), both high-cardinality; collect_list state is bounded by
    // session length, not corpus.
    Q(
      "q_session_paths",
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             date_trunc('second', ts) AS ts
        |           FROM events),
        |m AS (SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) > INTERVAL '10 minutes'
        |        THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |sd AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |       FROM m),
        |p AS (SELECT user_id, sid,
        |        array_to_string(
        |          list(event_type ORDER BY ts, event_id)[1:5], '>') AS path
        |      FROM sd GROUP BY user_id, sid)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  contains(path, 'purchase') AS converted
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(date_trunc("second", col("ts")), "10 minutes"))
        .agg(array_join(
          slice(transform(
            sort_array(collect_list(struct(
              date_trunc("second", col("ts")).as("ts"),
              col("event_id").as("event_id"),
              col("event_type").as("event_type")))),
            x => x.getField("event_type")), 1, 5), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .select(col("path"), col("n_sessions"),
          col("path").contains("purchase").as("converted"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(10)
    },

    // --- session abandonment (engaged but not converted) ----------------
    // The per-day funnel-health number product teams page on: of the
    // sessions that ENGAGED (≥1 click), how many ended without a
    // purchase. Sessionization is the proven 10-minute-gap machinery
    // (native session_window vs the oracle's gap-sum replay); the
    // engaged/converted flags are two conditional maxes inside the same
    // session aggregate — no second pass, no join. Day keyed by session
    // START (a session belongs to the day it began).
    Q(
      "q_session_abandonment",
      """WITH e AS (SELECT user_id, event_type,
        |             date_trunc('second', ts) AS ts
        |           FROM events),
        |m AS (SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts) > INTERVAL '10 minutes'
        |        THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |sd AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
        |          ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |       FROM m),
        |sess AS (SELECT user_id, sid,
        |           CAST(MIN(ts) AS DATE) AS d,
        |           MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |             AS clicked,
        |           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |             AS purchased
        |         FROM sd GROUP BY user_id, sid),
        |eng AS (SELECT d, COUNT(*) AS n_engaged,
        |          SUM(CASE WHEN purchased = 0 THEN 1 ELSE 0 END)
        |            AS n_abandoned
        |        FROM sess WHERE clicked = 1 GROUP BY d)
        |SELECT d, CAST(n_engaged AS BIGINT) AS n_engaged,
        |  CAST(n_abandoned AS BIGINT) AS n_abandoned,
        |  CAST(n_abandoned * 1000000 // n_engaged AS BIGINT)
        |    AS abandon_ppm
        |FROM eng
        |ORDER BY d NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(date_trunc("second", col("ts")), "10 minutes"))
        .agg(
          max(when(col("event_type") === "click", 1).otherwise(0))
            .as("clicked"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("purchased"))
        .where(col("clicked") === 1)
        .select(to_date(col("session_window.start")).as("d"),
          col("purchased"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_engaged"),
          sum(when(col("purchased") === 0, 1).otherwise(0))
            .as("n_abandoned"))
        .select(col("d"), col("n_engaged").cast("long").as("n_engaged"),
          col("n_abandoned").cast("long").as("n_abandoned"),
          expr("n_abandoned * 1000000 div n_engaged").cast("long")
            .as("abandon_ppm"))
        .orderBy(col("d"))
    },

    // --- event-time RANGE window frame (interval-bounded moving sum) ----
    // The window-frame type the rest of the family doesn't exercise:
    // RANGE BETWEEN INTERVAL 1 HOUR PRECEDING — a VALUE-bounded frame
    // over event time, not a row count, so the frame is identical no
    // matter how peers are ordered (ties share one frame by
    // definition — determinism for free where a ROWS frame would need a
    // total tiebreak). Integer cents keep every sum exact. One shuffle
    // on user_id; per-partition sort on ts; frame evaluation is the
    // two-pointer sliding scan, O(rows).
    Q(
      "q_window_time_range",
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, cents,
        |  CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS hour_sum
        |FROM e
        |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d).where(col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("cents"),
          expr("sum(cents) over (partition by user_id order by ts " +
            "range between interval 1 hour preceding and current row)")
            .cast("long").as("hour_sum"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // --- time-decay multi-touch attribution -----------------------------
    // The credit model between first-touch (q_attribution_first_touch)
    // and last-touch: every touch in the 7-day lookback before a
    // conversion earns exponentially decaying credit, halving per day.
    // The decay weights are INTEGERS — u = 2^(7−days), 1..128 — and the
    // per-conversion normalization is integer ppm (u·10⁶ div Σu), so the
    // whole model is exact arithmetic end-to-end: no pow(), no float
    // credit sums whose merge order could diverge. Day-granular by
    // declared semantics (date diff, not timestamp) — and day
    // granularity is what makes the engine plan COLLAPSE the join's
    // touch side: every touch sharing (user, type, day) earns the same
    // u and the same per-touch credit, so touches pre-aggregate to
    // (user, type, day, cnt) BEFORE the join. The conv ⋈ touches join
    // is quadratic in a hot user (200k convs × 800k touches at the
    // round-11 ×100 skew tier — join OUTPUT, which AQE's skew splits
    // cannot shrink); conv ⋈ day-aggregates is bounded by 4 types ×
    // the corpus day span per conversion regardless of skew. Credit
    // reconstitutes exactly: Σu over touches = Σ(cnt·u) over groups,
    // per-touch credit is constant within a group, group credit =
    // cnt · (u·10⁶ div Σu). The normalization window partitions on
    // conv_id (high-cardinality); the final rollup is a 5-group agg.
    Q(
      "q_decay_attribution",
      """WITH conv AS (SELECT event_id AS conv_id, user_id,
        |                CAST(ts AS DATE) AS cd
        |              FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_type, CAST(ts AS DATE) AS td
        |      FROM events WHERE event_type <> 'purchase'),
        |j AS (SELECT conv_id, event_type,
        |        (1 << (7 - date_diff('day', td, cd))) AS u
        |      FROM conv JOIN t USING (user_id)
        |      WHERE date_diff('day', td, cd) BETWEEN 0 AND 7),
        |c AS (SELECT conv_id, event_type, u,
        |        CAST(CAST(u AS BIGINT) * 1000000
        |          // SUM(u) OVER (PARTITION BY conv_id) AS BIGINT)
        |          AS credit_ppm
        |      FROM j)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm
        |FROM c GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          to_date(col("ts")).as("cd"))
      // touch side pre-aggregated to (user, type, day): the join's
      // per-user fan-out becomes 4 types × day span, skew-immune
      val tAgg = ev.where(col("event_type") =!= "purchase")
        .groupBy(col("user_id"), col("event_type"),
          to_date(col("ts")).as("td"))
        .agg(count(lit(1)).as("cnt"))
      val dday = datediff(col("cd"), col("td"))
      conv.join(tAgg, Seq("user_id"))
        .where(dday.between(0, 7))
        .select(col("conv_id"), col("event_type"), col("cnt"),
          expr("shiftleft(1, 7 - datediff(cd, td))").as("u"))
        .withColumn("credit_ppm",
          expr("CAST(u AS BIGINT) * 1000000 div " +
            "sum(cnt * u) over (partition by conv_id)").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("n_touches"),
          sum(col("cnt") * col("credit_ppm")).cast("long")
            .as("credit_ppm"))
        .orderBy(col("event_type"))
    },

    // --- position-based (U-shaped) multi-touch attribution ---------------
    // The third credit model beside first-touch and time-decay: 40% to
    // the first touch, 40% to the last, the middle 20% split evenly —
    // the "bookends matter" heuristic marketing platforms ship as
    // "position-based". Exact integer ppm: 1-touch journeys take the
    // full 10⁶, 2-touch split 500k/500k, longer ones 400k/400k +
    // 200000 div (n−2) per middle touch (truncation remainder stays
    // unallocated BY DESIGN — deterministic on both engines). The
    // oracle states the model per touch (rn over conv_id); the engine
    // reconstitutes it from DAY-aggregated touches, like
    // q_decay_attribution's skew-proof plan: credits depend only on
    // n, the first/last touch's TYPE, and per-type counts — first =
    // argmin of (day, touch_id) over the window's per-day argmins,
    // last the argmax, middles = cnt − the bookend indicators. Both
    // join legs fan out ≤ day-span rows per conversion where the
    // per-touch join was quadratic in a hot user.
    Q(
      "q_position_attribution",
      """WITH conv AS (SELECT event_id AS conv_id, user_id,
        |                CAST(ts AS DATE) AS cd
        |              FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT event_id AS touch_id, user_id, event_type,
        |        CAST(ts AS DATE) AS td
        |      FROM events WHERE event_type <> 'purchase'),
        |j AS (SELECT conv_id, touch_id, event_type, td
        |      FROM conv JOIN t USING (user_id)
        |      WHERE date_diff('day', td, cd) BETWEEN 0 AND 7),
        |p AS (SELECT conv_id, event_type,
        |        row_number() OVER (PARTITION BY conv_id
        |          ORDER BY td, touch_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY conv_id) AS n
        |      FROM j),
        |c AS (SELECT conv_id, event_type,
        |        CAST(CASE WHEN n = 1 THEN 1000000
        |          WHEN n = 2 THEN 500000
        |          WHEN rn = 1 OR rn = n THEN 400000
        |          ELSE 200000 // (n - 2) END AS BIGINT) AS credit_ppm
        |      FROM p)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm
        |FROM c GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          to_date(col("ts")).as("cd"))
      val t = ev.where(col("event_type") =!= "purchase")
        .select(col("event_id").as("touch_id"), col("user_id"),
          col("event_type"), to_date(col("ts")).as("td"))
      // two day-granular reductions of the touch side: per-(user, type,
      // day) counts, and per-(user, day) bookends (order within a conv
      // is (td, touch_id), so a day's argmin/argmax by touch_id are the
      // only candidates for the conv-level first/last)
      val tCnt = t.groupBy(col("user_id"), col("event_type"), col("td"))
        .agg(count(lit(1)).as("cnt"))
      val tDay = t.groupBy(col("user_id"), col("td"))
        .agg(count(lit(1)).as("day_cnt"),
          min_by(col("event_type"), col("touch_id")).as("day_first_type"),
          min(col("touch_id")).as("day_min_tid"),
          max_by(col("event_type"), col("touch_id")).as("day_last_type"),
          max(col("touch_id")).as("day_max_tid"))
      val dday = datediff(col("cd"), col("td"))
      // (td, touch_id) packs lexicographically while ids stay under 2³²
      // (the q_attribution_first_touch key discipline)
      val convStats = conv.join(tDay, Seq("user_id"))
        .where(dday.between(0, 7))
        .groupBy(col("conv_id"))
        .agg(sum(col("day_cnt")).as("n"),
          min_by(col("day_first_type"),
            unix_date(col("td")) * lit(4294967296L) + col("day_min_tid"))
            .as("first_type"),
          max_by(col("day_last_type"),
            unix_date(col("td")) * lit(4294967296L) + col("day_max_tid"))
            .as("last_type"))
      val typeCnt = conv.join(tCnt, Seq("user_id"))
        .where(dday.between(0, 7))
        .groupBy(col("conv_id"), col("event_type"))
        .agg(sum(col("cnt")).as("cnt_t"))
      val isFirst = (col("first_type") <=> col("event_type"))
        .cast("long")
      val isLast = (col("last_type") <=> col("event_type")).cast("long")
      typeCnt.join(convStats, Seq("conv_id"))
        .withColumn("credit_ppm",
          when(col("n") === 1, lit(1000000L) * col("cnt_t"))
            .when(col("n") === 2, lit(500000L) * col("cnt_t"))
            .otherwise(lit(400000L) * (isFirst + isLast) +
              (col("cnt_t") - isFirst - isLast) *
                expr("200000 div (n - 2)")).cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("cnt_t")).as("n_touches"),
          sum(col("credit_ppm")).cast("long").as("credit_ppm"))
        .orderBy(col("event_type"))
    },

    // --- peak concurrent sessions per day (two-phase sweep line) ---------
    // The capacity question behind every connection-pool and autoscaler
    // setting: how many 30-min-gap sessions were open AT ONCE? A naive
    // sweep orders ALL of a day's ±1 points in one window — one task
    // per day forever. This is the two-phase form (the
    // q_weighted_median_price discipline): minute buckets first (each
    // day's 1440-row cumulative gives every minute its opening offset),
    // then the exact sweep runs only WITHIN each minute, partitioned by
    // (day, minute). Ends sort after starts at the same second
    // (inclusive overlap); a session belongs to its start day by
    // declared semantics. The per-day peak is the max over bounded
    // minute partitions.
    Q(
      "q_concurrent_sessions",
      """WITH e AS (SELECT user_id,
        |    epoch_us(date_trunc('second', ts)) // 1000000 AS ts_s,
        |    event_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT user_id, ts_s,
        |    CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) > 1800 OR lag(ts_s) OVER (
        |      PARTITION BY user_id ORDER BY ts_s, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |sess AS (SELECT user_id, ts_s,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_s) AS sid
        |  FROM f),
        |iv AS (SELECT MIN(ts_s) AS st, MAX(ts_s) AS en
        |  FROM sess GROUP BY user_id, sid),
        |pts AS (SELECT CAST(to_timestamp(st) AS DATE) AS day, st AS t,
        |    1 AS d FROM iv
        |  UNION ALL
        |  SELECT CAST(to_timestamp(st) AS DATE), en, -1 FROM iv),
        |mb AS (SELECT day, t // 60 AS m, CAST(SUM(d) AS BIGINT) AS net
        |  FROM pts GROUP BY day, m),
        |off AS (SELECT day, m,
        |    CAST(COALESCE(SUM(net) OVER (PARTITION BY day ORDER BY m
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS base
        |  FROM mb),
        |sweep AS (SELECT p.day, p.t // 60 AS m,
        |    CAST(SUM(p.d) OVER (PARTITION BY p.day, p.t // 60
        |      ORDER BY p.t, p.d DESC ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS run
        |  FROM pts p),
        |conc AS (SELECT s.day, s.run + o.base AS c
        |  FROM sweep s JOIN off o ON s.day = o.day AND s.m = o.m),
        |ns AS (SELECT CAST(to_timestamp(st) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_sessions FROM iv GROUP BY day)
        |SELECT ns.day AS day, n_sessions,
        |  CAST(MAX(c) AS BIGINT) AS peak_concurrent
        |FROM ns JOIN conc ON ns.day = conc.day
        |GROUP BY ns.day, n_sessions
        |ORDER BY day NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts").cast("long").as("ts_s"),
          col("event_id"))
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id"))
      val sess = e
        .withColumn("brk", when(lag(col("ts_s"), 1).over(wu).isNull ||
          col("ts_s") - lag(col("ts_s"), 1).over(wu) > 1800, 1)
          .otherwise(0))
        .withColumn("sid", sum(col("brk")).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val iv = sess.groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_s")).as("st"), max(col("ts_s")).as("en"))
      val pts = iv.select(to_date(timestamp_seconds(col("st"))).as("day"),
          col("st").as("t"), lit(1).as("d"))
        .unionAll(iv.select(to_date(timestamp_seconds(col("st"))).as("day"),
          col("en").as("t"), lit(-1).as("d")))
      val mb = pts.groupBy(col("day"), expr("t div 60").as("m"))
        .agg(sum(col("d")).cast("long").as("net"))
      val off = mb.withColumn("base", coalesce(
        sum(col("net")).over(Window.partitionBy(col("day"))
          .orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .cast("long"))
      val sweep = pts
        .withColumn("m", expr("t div 60"))
        .withColumn("run", sum(col("d")).over(
          Window.partitionBy(col("day"), col("m"))
            .orderBy(col("t"), col("d").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      val conc = sweep.join(off.select(col("day"), col("m"), col("base")),
          Seq("day", "m"))
        .select(col("day"), (col("run") + col("base")).as("c"))
      val ns = iv.groupBy(to_date(timestamp_seconds(col("st"))).as("day"))
        .agg(count(lit(1)).as("n_sessions"))
      ns.join(conc, Seq("day"))
        .groupBy(col("day"), col("n_sessions"))
        .agg(max(col("c")).cast("long").as("peak_concurrent"))
        .orderBy(col("day"))
    },

    // --- semi-additive rollup (period-end balance) -------------------------
    // The aggregation class plain SUM gets WRONG: a balance-like measure
    // (here: each user's latest event value) is additive ACROSS entities
    // but not across time — the day total is the sum of every user's
    // last-known value AT day end, not the day's transaction sum. The
    // canonical warehouse shape: per-(entity, day) closing value (argmax
    // by (ts, event_id) — one aggregate), a bounded day spine crossed
    // with the entity list (fanout = days, broadcast side = spine; at
    // 100 TB the spine is still just the calendar), forward fill per
    // entity (last ignoreNulls over the day order), then one rollup per
    // day. A user contributes from their first event day onward.
    Q(
      "q_semi_additive_balance",
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
        |    value FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL),
        |pd AS (SELECT user_id, day, value AS v FROM ev
        |  QUALIFY row_number() OVER (PARTITION BY user_id, day
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |f AS (SELECT sp.user_id, sp.day,
        |    last_value(pd.v IGNORE NULLS) OVER (PARTITION BY sp.user_id
        |      ORDER BY sp.day) AS bal
        |  FROM (SELECT user_id, day FROM u CROSS JOIN days) sp
        |  LEFT JOIN pd USING (user_id, day))
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        |FROM f WHERE bal IS NOT NULL
        |GROUP BY day ORDER BY day NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
        .where(col("ts").isNotNull && col("user_id").isNotNull
          && col("value").isNotNull)
      val perDay = ev
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("day"), col("m.value").as("v"))
      val days = ev
        .agg(min(col("ts").cast("date")).as("d0"),
          max(col("ts").cast("date")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val spine = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(days))
      spine.join(perDay, Seq("user_id", "day"), "left")
        .withColumn("bal", last(col("v"), ignoreNulls = true)
          .over(Window.partitionBy(col("user_id")).orderBy(col("day"))))
        .where(col("bal").isNotNull)
        .groupBy(col("day"))
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("total_balance"))
        .orderBy(col("day"))
    },

    // --- clamped running balance (non-associative per-entity scan) --------
    // The recurrence class window frames CANNOT express: a balance that
    // floors at zero (wallets, inventory, rate-limit tokens) is
    // b_i = max(0, b_{i-1} + Δ_i) — non-associative, so no partial
    // aggregation and no window SUM rewrite exists. The scalable shape:
    // per-entity event lists fold through a codegen'd higher-order
    // `aggregate` (bounded by per-entity events, embarrassingly parallel
    // across entities — the Holt/BPE in-plan-recurrence precedent), with
    // the (balance, clamp-count) state packed into ONE int64
    // (bal·2²⁰ + clamps) because DuckDB's list_reduce is homogeneous in
    // the element type — the encoding makes both engines run literally
    // the same fold. Deltas are floor(value·100) cents (floor, not
    // round/cast: both engines floor doubles identically). Top-20 final
    // balances under a total tiebreak.
    Q(
      "q_clamped_running_balance",
      """WITH ev AS (SELECT user_id, ts, event_id,
        |    CAST(FLOOR(value * 100) AS BIGINT) *
        |      (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
        |      AS delta
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL),
        |f AS (SELECT user_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list(delta ORDER BY ts, event_id)),
        |      (acc, x) -> CASE WHEN (acc // 1048576) + x < 0
        |        THEN acc % 1048576 + 1
        |        ELSE ((acc // 1048576) + x) * 1048576 + acc % 1048576
        |        END) AS enc
        |  FROM ev GROUP BY user_id)
        |SELECT user_id, CAST(enc // 1048576 AS BIGINT) AS final_cents,
        |  CAST(enc % 1048576 AS BIGINT) AS n_clamps
        |FROM f ORDER BY final_cents DESC, user_id LIMIT 20""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("ts").isNotNull && col("user_id").isNotNull
          && col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          (floor(col("value") * 100).cast("long") *
            when(col("event_type") === "purchase", 1L).otherwise(-1L))
            .as("delta"))
        .groupBy(col("user_id"))
        .agg(expr("array_sort(collect_list(struct(ts, event_id, delta)))")
          .as("a"))
        .select(col("user_id"),
          expr("""aggregate(transform(a, x -> x.delta),
            |  CAST(0 AS BIGINT),
            |  (acc, x) -> CASE WHEN (acc div 1048576) + x < 0
            |    THEN acc % 1048576 + 1
            |    ELSE ((acc div 1048576) + x) * 1048576 + acc % 1048576
            |    END)""".stripMargin).as("enc"))
        .select(col("user_id"),
          expr("enc div 1048576").as("final_cents"),
          expr("enc % 1048576").as("n_clamps"))
        .orderBy(col("final_cents").desc, col("user_id"))
        .limit(20)
    },

    // --- frequent event sequences (3-step sequential patterns) ------------
    // Sequence MINING where the funnel queries only MATCH: enumerate
    // every consecutive event-type trigram in each user's journey (two
    // leads over the per-user time order — per-user windows, so the
    // shuffle key is user_id and parallelism is user-count, never a
    // global sort) and rank patterns by distinct-user support with raw
    // occurrence count as tiebreak. The top pattern is what "typical
    // journey" dashboards and next-event recommenders are built from;
    // support counting per pattern is a hash aggregate on the trigram
    // key. Deterministic total order inside a user: (ts, event_id) —
    // both engines read µs timestamps, and the id tiebreak pins
    // same-instant events.
    Q(
      "q_frequent_sequences",
      """WITH s AS (SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM s WHERE e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n_users DESC, n_occurrences DESC,
        |  e1 NULLS FIRST, e2 NULLS FIRST, e3 NULLS FIRST
        |LIMIT 10""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .where(col("e3").isNotNull)
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(countDistinct(col("user_id")).cast("long").as("n_users"),
          count(lit(1)).cast("long").as("n_occurrences"))
        .orderBy(col("n_users").desc, col("n_occurrences").desc,
          col("e1"), col("e2"), col("e3"))
        .limit(10)
    },

    // --- last-touch conversion attribution ----------------------------------
    // Marketing attribution over the event stream: every purchase is
    // credited to the user's most recent PRECEDING non-purchase event
    // type (the touch channel), via an ignore-nulls last_value window
    // bounded at 1 PRECEDING — per-user partitions, so the scan
    // parallelizes across users like sessionization, and the
    // deterministic (ts, event_id) intra-user order pins same-instant
    // events. Purchases with no prior touch in-window surface as the
    // NULL channel row (ordered first — the NULLS FIRST contract), so
    // credited + uncredited sum to total conversions. Revenue is exact
    // integer cents (DECIMAL-cast, never float addition).
    Q(
      "q_attribution_last_touch",
      """WITH s AS (SELECT user_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS channel
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |    CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |  FROM s WHERE event_type = 'purchase' GROUP BY channel)
        |SELECT channel, n_conversions, revenue_cents,
        |  CAST(n_conversions * 1000000 // SUM(n_conversions) OVER ()
        |    AS BIGINT) AS share_ppm
        |FROM c ORDER BY channel NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"),
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w).as("channel"))
        .where(col("event_type") === "purchase")
        .groupBy(col("channel"))
        .agg(count(lit(1)).cast("long").as("n_conversions"),
          sum(col("cents")).cast("long").as("revenue_cents"))
        .withColumn("share_ppm",
          expr("CAST(n_conversions * 1000000" +
            " div sum(n_conversions) over () AS BIGINT)"))
        .orderBy(col("channel"))
    },

    // --- audience overlap matrix (Jaccard between event-type cohorts) -------
    // Segment-overlap analytics: for every pair of event types, the
    // Jaccard similarity of their USER sets — the matrix behind "do
    // purchasers also view?" dashboards and behavioral-cohort merges.
    // Candidate generation is the wedge join on the user key (two
    // copies of the distinct (type, user) relation meeting on user —
    // the q_link_prediction shape with users as the shared endpoint),
    // so intersections arrive by hash shuffle, never a set comparison;
    // per-type cohort sizes come back by two equi-joins on the
    // enum-bounded key, and |A∪B| = |A|+|B|−|A∩B| closes the Jaccard
    // without ever materializing the union.
    Q(
      "q_audience_overlap",
      """WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |sz AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY t),
        |ix AS (SELECT a.t AS t1, b.t AS t2, CAST(COUNT(*) AS BIGINT)
        |      AS n_both
        |  FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
        |  GROUP BY a.t, b.t)
        |SELECT ix.t1, ix.t2, s1.n AS n_users_1, s2.n AS n_users_2,
        |  ix.n_both,
        |  CAST(ix.n_both * 1000000 // (s1.n + s2.n - ix.n_both)
        |    AS BIGINT) AS jaccard_ppm
        |FROM ix JOIN sz s1 ON ix.t1 = s1.t
        |        JOIN sz s2 ON ix.t2 = s2.t
        |ORDER BY ix.t1 NULLS FIRST, ix.t2 NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val tu = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("event_type").as("t"), col("user_id").as("u"))
        .distinct()
        // tu feeds three branches (sizes + both wedge sides): checkpoint
        // so the corpus is scanned/deduped once, not four times — the
        // q_growth_accounting discipline
        .localCheckpoint()
      val sz = tu.groupBy(col("t"))
        .agg(count(lit(1)).cast("long").as("n"))
      val ix = tu.as("a")
        .join(tu.as("b"), col("a.u") === col("b.u")
          && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
        .agg(count(lit(1)).cast("long").as("n_both"))
      ix.join(broadcast(sz.select(col("t").as("st1"),
          col("n").as("n_users_1"))), col("t1") === col("st1"))
        .join(broadcast(sz.select(col("t").as("st2"),
          col("n").as("n_users_2"))), col("t2") === col("st2"))
        .select(col("t1"), col("t2"), col("n_users_1"),
          col("n_users_2"), col("n_both"),
          expr("CAST(n_both * 1000000" +
            " div (n_users_1 + n_users_2 - n_both) AS BIGINT)")
            .as("jaccard_ppm"))
        .orderBy(col("t1"), col("t2"))
    }
  )
}
