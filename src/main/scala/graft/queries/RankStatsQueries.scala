package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Rank-based / nonparametric statistics: the experiment-readout layer a
  * data platform runs when the parametric assumptions (normality, equal
  * variance) behind the z-test family (q_funnel_sig, q_ab_cuped) don't
  * hold — Mann-Whitney U, Kolmogorov-Smirnov, Gini concentration, Simpson
  * diversity, autocorrelation, Theil-Sen robust trend, and a discrete-time
  * survival hazard table.
  *
  * Oracle-parity approach (Q.scala rules): every statistic is reduced to
  * EXACT integer/decimal moments first (rank sums, cumulative counts, tie
  * terms), then finished in one short, identically-parenthesized IEEE
  * chain (divisions + at most one sqrt, both correctly rounded) and
  * ROUND(_, 6)ed — the q_funnel_sig / q_corr_matrix precedent.
  *
  * Scale notes: the rank machinery never sorts raw rows globally — ranks
  * are derived from a groupBy on the VALUE GRID (purchase amounts are a
  * 2-decimal cents lattice, ≤ ~37k distinct cells at any corpus size), so
  * the only ordered window runs over a bounded, pre-aggregated frame.
  * Daily/weekly spines are calendar-bounded. Gini's per-USER-total grid
  * is unbounded, so its cumulative rides [[graft.operators.RangeCum]]
  * (two-phase bucket offsets — no single-partition window anywhere in
  * this family).
  */
object RankStatsQueries {

  private val armSql = TextOps.md5Low60Sql("CAST(user_id AS VARCHAR)") + " % 2"

  /** Purchases keyed to the exact cents lattice with the standard MD5 arm. */
  private def purchases(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("user_id").isNotNull && col("event_type") === "purchase")
      .select(
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (TextOps.md5Low60(col("user_id").cast("string")) % 2).as("arm"),
        col("user_id"))

  private val purchasesSql =
    s"""SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    $armSql AS arm, user_id
       |  FROM events
       |  WHERE user_id IS NOT NULL AND event_type = 'purchase'""".stripMargin

  private def dd(c: Column): Column = c.cast("double")
  private def dd(n: String): Column = col(n).cast("double")

  val all: Seq[Q] = Seq(
    // --- Mann-Whitney U between the experiment arms ----------------------
    // The nonparametric "did arm 1 shift purchase amounts?" readout.
    // Ranks come from the cents lattice: one groupBy(cents) produces tie
    // group sizes t and arm-1 members c1; a cumulative window over the
    // ≤37k-cell grid yields `before` (rows ranked lower), and the DOUBLED
    // rank sum 2·R1 = Σ c1·(2·before + t + 1) stays integer-exact (the
    // ×2 absorbs the half-rank of even tie groups). U, the tie term
    // Σ(t³−t) (DECIMAL(38,0) — cubes outgrow int64 under heavy ties) and
    // the tie-corrected normal approximation finish it. z is 0 by
    // definition when an arm is empty or the grid has one cell.
    Q(
      "q_mann_whitney",
      s"""WITH p AS ($purchasesSql),
         |g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS t,
         |    CAST(SUM(arm) AS BIGINT) AS c1
         |  FROM p GROUP BY cents),
         |o AS (SELECT t, c1,
         |    CAST(SUM(t) OVER (ORDER BY cents) - t AS BIGINT) AS before
         |  FROM g),
         |m AS (SELECT
         |    CAST(SUM(t - c1) AS BIGINT) AS n0,
         |    CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c1 * (2 * before + t + 1)) AS BIGINT) AS two_r1,
         |    CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DECIMAL(38,0))
         |      AS t_term,
         |    CAST(COUNT(*) AS BIGINT) AS dv
         |  FROM o),
         |z AS (SELECT n0, n1, two_r1 - n1 * (n1 + 1) AS two_u1, dv, t_term
         |  FROM m)
         |SELECT n0, n1, two_u1,
         |  ROUND(CASE WHEN n0 > 0 AND n1 > 0 AND dv > 1 THEN
         |    (CAST(two_u1 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))
         |    / (2 * SQRT(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12
         |        * (CAST(n0 + n1 + 1 AS DOUBLE)
         |           - CAST(t_term AS DOUBLE)
         |             / (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 - 1 AS DOUBLE)))))
         |    ELSE CAST(0 AS DOUBLE) END, 6) AS z
         |FROM z""".stripMargin
    ) { (s, d) =>
      val g = purchases(s, d)
        .groupBy(col("cents"))
        .agg(count(lit(1)).as("t"), sum(col("arm")).cast("long").as("c1"))
      val w = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val o = g.select(col("t"), col("c1"),
        (sum(col("t")).over(w) - col("t")).cast("long").as("before"))
      val m = o.agg(
        sum(col("t") - col("c1")).cast("long").as("n0"),
        sum(col("c1")).cast("long").as("n1"),
        sum(col("c1") * (lit(2) * col("before") + col("t") + 1)).cast("long")
          .as("two_r1"),
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
          .cast("decimal(38,0)").as("t_term"),
        count(lit(1)).as("dv"))
        .withColumn("two_u1", col("two_r1") - col("n1") * (col("n1") + 1))
      val zval = when(col("n0") > 0 && col("n1") > 0 && col("dv") > 1,
        (dd("two_u1") - dd("n1") * dd("n0")) /
          (lit(2) * sqrt(dd("n1") * dd("n0") / lit(12) *
            (dd(col("n0") + col("n1") + 1) -
              dd("t_term") / (dd(col("n0") + col("n1")) *
                dd(col("n0") + col("n1") - 1))))))
        .otherwise(lit(0.0))
      m.select(col("n0"), col("n1"), col("two_u1"),
        round(zval, 6).as("z"))
    },

    // --- Kolmogorov-Smirnov distance between the arms --------------------
    // D = max |ECDF₀ − ECDF₁| over the same cents lattice. The supremum
    // is scanned in EXACT integers — |cum0·n1 − cum1·n0| per grid cell,
    // totals via an empty-frame window — and only the final normalization
    // D = num / (n0·n1) and the α=0.05 critical value c(α)·√((n0+n1)/(n0·n1))
    // are IEEE, written identically on both sides.
    Q(
      "q_ks_arms",
      s"""WITH p AS ($purchasesSql),
         |g AS (SELECT cents, CAST(COUNT(*) - SUM(arm) AS BIGINT) AS c0,
         |    CAST(SUM(arm) AS BIGINT) AS c1
         |  FROM p GROUP BY cents),
         |o AS (SELECT
         |    CAST(SUM(c0) OVER (ORDER BY cents) AS BIGINT) AS cum0,
         |    CAST(SUM(c1) OVER (ORDER BY cents) AS BIGINT) AS cum1,
         |    CAST(SUM(c0) OVER () AS BIGINT) AS n0,
         |    CAST(SUM(c1) OVER () AS BIGINT) AS n1
         |  FROM g),
         |m AS (SELECT MAX(n0) AS n0, MAX(n1) AS n1,
         |    CAST(MAX(ABS(cum0 * n1 - cum1 * n0)) AS BIGINT) AS d_num
         |  FROM o)
         |SELECT n0, n1,
         |  ROUND(CASE WHEN n0 > 0 AND n1 > 0 THEN
         |      CAST(d_num AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
         |    ELSE CAST(0 AS DOUBLE) END, 6) AS d_stat,
         |  CASE WHEN n0 > 0 AND n1 > 0 THEN
         |    CAST(d_num AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
         |    > 1.358 * SQRT(CAST(n0 + n1 AS DOUBLE)
         |        / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))
         |  ELSE FALSE END AS significant
         |FROM m""".stripMargin
    ) { (s, d) =>
      val g = purchases(s, d)
        .groupBy(col("cents"))
        .agg((count(lit(1)) - sum(col("arm"))).cast("long").as("c0"),
          sum(col("arm")).cast("long").as("c1"))
      val wc = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy()
      val o = g.select(
        sum(col("c0")).over(wc).cast("long").as("cum0"),
        sum(col("c1")).over(wc).cast("long").as("cum1"),
        sum(col("c0")).over(wt).cast("long").as("n0"),
        sum(col("c1")).over(wt).cast("long").as("n1"))
      val m = o.agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
        max(abs(col("cum0") * col("n1") - col("cum1") * col("n0")))
          .cast("long").as("d_num"))
      val dStat = dd("d_num") / (dd("n0") * dd("n1"))
      val crit = lit(1.358) * sqrt(dd(col("n0") + col("n1")) /
        (dd("n0") * dd("n1")))
      val ok = col("n0") > 0 && col("n1") > 0
      m.select(col("n0"), col("n1"),
        round(when(ok, dStat).otherwise(lit(0.0)), 6).as("d_stat"),
        when(ok, dStat > crit).otherwise(lit(false)).as("significant"))
    },

    // --- Gini coefficient of per-user purchase spend ---------------------
    // The inequality summary behind q_revenue_concentration's whale curve:
    // G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with x ascending. The rank
    // product and both sums stay in exact BIGINT cents; the single
    // closing division is the only IEEE op. NO per-user rank is ever
    // materialized: users collapse to the distinct-total grid (ranks of
    // a tie group are consecutive, so Σ rn·x over the group is the
    // closed form x·(t·before + t(t+1)/2) — the user_id tiebreak can't
    // matter when x is constant within the group), and `before` comes
    // from the two-phase RangeCum, so the only ordered global window
    // runs over the BUCKET frame, never users. The oracle keeps the
    // textbook row_number formulation — a hash match proves the
    // closed form IS the rank sum.
    Q(
      "q_gini_spend",
      s"""WITH p AS ($purchasesSql),
         |u AS (SELECT user_id, CAST(SUM(cents) AS BIGINT) AS cents
         |  FROM p GROUP BY user_id),
         |r AS (SELECT cents,
         |    row_number() OVER (ORDER BY cents, user_id) AS rn FROM u),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |    CAST(SUM(cents) AS BIGINT) AS total_cents,
         |    CAST(SUM(rn * cents) AS BIGINT) AS s1
         |  FROM r)
         |SELECT n_users, total_cents,
         |  ROUND(CASE WHEN n_users > 0 AND total_cents > 0 THEN
         |      CAST(2 * s1 - (n_users + 1) * total_cents AS DOUBLE)
         |      / (CAST(n_users AS DOUBLE) * CAST(total_cents AS DOUBLE))
         |    ELSE CAST(0 AS DOUBLE) END, 6) AS gini
         |FROM m""".stripMargin
    ) { (s, d) =>
      val u = purchases(s, d)
        .groupBy(col("user_id"))
        .agg(sum(col("cents")).cast("long").as("cents"))
      val g = u.groupBy(col("cents")).agg(count(lit(1)).as("t"))
      val wb = graft.operators.RangeCum.exclusive(g,
        expr("cents div 4096"), Seq(col("cents")),
        Seq((col("t"), "before")))
      val m = wb.agg(
        coalesce(sum(col("t")), lit(0L)).cast("long").as("n_users"),
        sum(col("cents") * col("t")).cast("long").as("total_cents"),
        sum(col("cents") *
          (col("t") * col("before") + expr("t * (t + 1) div 2")))
          .cast("long").as("s1"))
      val gini = dd(lit(2) * col("s1") - (col("n_users") + 1) * col("total_cents")) /
        (dd("n_users") * dd("total_cents"))
      m.select(col("n_users"), col("total_cents"),
        round(when(col("n_users") > 0 && col("total_cents") > 0, gini)
          .otherwise(lit(0.0)), 6).as("gini"))
    },

    // --- Simpson diversity of the daily event-type mix -------------------
    // Log-free diversity (entropy needs libm — banned by the parity
    // rules): Gini-Simpson impurity 1 − Σp² and the effective number of
    // types 1/Σp², from exact per-day integer counts; two short IEEE
    // chains close it. One hash aggregate per day — no windows, scales as
    // a plain two-level rollup.
    Q(
      "q_type_diversity",
      """WITH c AS (SELECT CAST(ts AS DATE) AS d, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE ts IS NOT NULL
        |  GROUP BY d, event_type),
        |m AS (SELECT d, CAST(SUM(c) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(c * c) AS BIGINT) AS ssq
        |  FROM c GROUP BY d)
        |SELECT d, n_events, n_types,
        |  ROUND(1 - CAST(ssq AS DOUBLE)
        |    / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)), 6)
        |    AS impurity,
        |  ROUND(CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)
        |    / CAST(ssq AS DOUBLE), 6) AS effective_types
        |FROM m ORDER BY d NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val c = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("d"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val m = c.groupBy(col("d"))
        .agg(sum(col("c")).cast("long").as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).cast("long").as("ssq"))
      m.select(col("d"), col("n_events"), col("n_types"),
        round(lit(1) - dd("ssq") / (dd("n_events") * dd("n_events")), 6)
          .as("impurity"),
        round(dd("n_events") * dd("n_events") / dd("ssq"), 6)
          .as("effective_types"))
        .orderBy(col("d"))
    },

    // --- lag-1 / lag-7 autocorrelation of daily volume -------------------
    // The seasonality detector behind q_weekly_seasonality's DOW means:
    // Pearson r between the daily-count series and itself shifted 1 and 7
    // days. Pairs come from an equi-join of the calendar-bounded daily
    // rollup with its shifted self; moments are exact BIGINT; the closing
    // Pearson chain is the q_corr_matrix precedent. A constant series has
    // no defined r — guarded to 0 on exact integer conditions.
    Q(
      "ref_autocorr_daily",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE ts IS NOT NULL GROUP BY d),
        |pairs AS (
        |  SELECT 1 AS lag, a.c AS x, b.c AS y
        |  FROM daily a JOIN daily b ON a.d = b.d + 1
        |  UNION ALL
        |  SELECT 7 AS lag, a.c AS x, b.c AS y
        |  FROM daily a JOIN daily b ON a.d = b.d + 7),
        |m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM pairs GROUP BY lag)
        |SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
        |  ROUND(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    ELSE CAST(0 AS DOUBLE) END, 6) AS r
        |FROM m ORDER BY lag NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("c"))
      def leg(k: Int): DataFrame = {
        val a = daily.select(col("d").as("da"), col("c").as("x"))
        val b = daily.select(col("d").as("db"), col("c").as("y"))
        a.join(b, col("da") === date_add(col("db"), k))
          .select(lit(k).as("lag"), col("x"), col("y"))
      }
      val m = leg(1).unionAll(leg(7))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("y") * col("y")).cast("long").as("syy"),
          sum(col("x") * col("y")).cast("long").as("sxy"))
      val rr = (dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
        (sqrt(dd("n") * dd("sxx") - dd("sx") * dd("sx")) *
          sqrt(dd("n") * dd("syy") - dd("sy") * dd("sy")))
      val ok = col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
        col("n") * col("syy") - col("sy") * col("sy") > 0
      m.select(col("lag").cast("int").as("lag"), col("n").as("n_pairs"),
        round(when(ok, rr).otherwise(lit(0.0)), 6).as("r"))
        .orderBy(col("lag"))
    },

    // --- Theil-Sen robust trend of daily revenue --------------------------
    // The outlier-immune alternative to q_trend_slope's least squares:
    // the median of all pairwise slopes of the daily revenue series.
    // O(days²) pairs BY DEFINITION — but over the calendar-bounded daily
    // ROLLUP (30 rows → 435 pairs here; even a decade is ~6.7M pairs),
    // never the event stream. Each slope is one exact-int division; the
    // median is the same sort-based interpolation on both engines
    // (percentile ≡ quantile_cont — the q_value_percentiles precedent).
    Q(
      "ref_theil_sen_trend",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type = 'purchase'
        |  GROUP BY d),
        |slopes AS (SELECT
        |    CAST(b.cents - a.cents AS DOUBLE)
        |      / CAST(b.d - a.d AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON b.d > a.d)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  ROUND(quantile_cont(slope, 0.5), 6) AS slope_cents_per_day
        |FROM slopes""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull && col("event_type") === "purchase")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .cast("long").as("cents"))
      val a = daily.select(col("d").as("da"), col("cents").as("ca"))
      val b = daily.select(col("d").as("db"), col("cents").as("cb"))
      val slopes = a.join(b, col("db") > col("da"))
        .select((dd(col("cb") - col("ca")) /
          dd(datediff(col("db"), col("da")))).as("slope"))
      val nDays = daily.agg(count(lit(1)).as("n_days"))
      slopes.agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("slope_cents_per_day"))
        .crossJoin(broadcast(nDays))
        .select(col("n_days"), col("n_pairs"), col("slope_cents_per_day"))
    },

    // --- discrete-time survival: weekly conversion hazard ----------------
    // Time-to-first-high-value-purchase as a life table: users enter at
    // their first-seen day, convert in week w = ⌊days/7⌋, or are censored
    // at the corpus horizon. hazard_w = converters_w / at-risk_w in exact
    // integer ppm — the log-free core of Kaplan-Meier (the survival
    // product needs exp/ln; the hazard table is the mergeable part).
    // Users collapse to (conv_week, obs_weeks) cells first, so the
    // week-spine range join touches a weeks×cells frame, not users.
    Q(
      "q_survival_hazard",
      """WITH u AS (SELECT user_id,
        |    MIN(CAST(ts AS DATE)) AS first_d,
        |    MIN(CASE WHEN event_type = 'purchase' AND value > 300
        |      THEN CAST(ts AS DATE) END) AS conv_d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY user_id),
        |h AS (SELECT MAX(CAST(ts AS DATE)) AS max_d FROM events
        |  WHERE ts IS NOT NULL),
        |cells AS (SELECT
        |    CAST(conv_d - first_d AS BIGINT) // 7 AS conv_week,
        |    CAST(max_d - first_d AS BIGINT) // 7 AS obs_weeks,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM u, h GROUP BY 1, 2),
        |weeks AS (SELECT unnest(range(0,
        |    (SELECT MAX(obs_weeks) FROM cells) + 1)) AS week)
        |SELECT CAST(week AS BIGINT) AS week,
        |  CAST(SUM(cnt) AS BIGINT) AS at_risk,
        |  CAST(SUM(CASE WHEN conv_week = week THEN cnt ELSE 0 END)
        |    AS BIGINT) AS converted,
        |  CAST(SUM(CASE WHEN conv_week = week THEN cnt ELSE 0 END) * 1000000
        |    // SUM(cnt) AS BIGINT) AS hazard_ppm
        |FROM weeks JOIN cells
        |  ON obs_weeks >= week AND (conv_week IS NULL OR conv_week >= week)
        |GROUP BY week
        |ORDER BY week NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
      val u = ev.groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("first_d"),
          min(when(col("event_type") === "purchase" && col("value") > 300,
            col("ts").cast("date"))).as("conv_d"))
      val h = ev.agg(max(col("ts").cast("date")).as("max_d"))
      val cells = u.crossJoin(broadcast(h))
        .select(
          expr("CAST(datediff(conv_d, first_d) AS BIGINT) div 7")
            .as("conv_week"),
          expr("CAST(datediff(max_d, first_d) AS BIGINT) div 7")
            .as("obs_weeks"))
        .groupBy(col("conv_week"), col("obs_weeks"))
        .agg(count(lit(1)).as("cnt"))
      val weeks = cells.agg(max(col("obs_weeks")).as("mw"))
        .select(explode(sequence(lit(0L), col("mw"))).as("week"))
      weeks.join(broadcast(cells),
        col("obs_weeks") >= col("week") &&
          (col("conv_week").isNull || col("conv_week") >= col("week")))
        .groupBy(col("week"))
        .agg(sum(col("cnt")).cast("long").as("at_risk"),
          sum(when(col("conv_week") === col("week"), col("cnt"))
            .otherwise(0L)).cast("long").as("converted"))
        .select(col("week"), col("at_risk"), col("converted"),
          expr("CAST(converted * 1000000 div at_risk AS BIGINT)")
            .as("hazard_ppm"))
        .orderBy(col("week"))
    }
  )
}
