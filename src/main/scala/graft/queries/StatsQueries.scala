package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical operators: exact + approximate quantiles, histogram
  * binning, stratified sampling — the profiling/sampling surface a
  * training-data pipeline runs before and after every filter stage.
  *
  * Scale notes: exact percentile is sort-based per group (fine for
  * profiling runs); `percentile_approx` (KLL-sketch-like, mergeable) is
  * the 100 TB path and sits beside it rows-only (algorithm-specific, not
  * oracle-comparable). width_bucket histograms are one scan + one tiny
  * shuffle. Stratified sampling via seeded `sampleBy` is deterministic
  * per (seed, value) — reproducible corpus draws without materializing
  * anything.
  */
object StatsQueries {

  val all: Seq[Q] = Seq(
    // --- exact quantiles per event type ---------------------------------
    // identical sort-based interpolation definition in both engines
    // (Spark percentile ≡ DuckDB quantile_cont); rounded to absorb the
    // final fp interpolation step.
    Q(
      "q_value_percentiles",
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(value, 0.9), 6) AS p90,
        |  ROUND(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy(col("event_type"))
    },

    // --- approximate quantiles (mergeable sketch) — rank-bound-checked ---
    // GK-sketch values are algorithm-specific, so the approx VALUE is not
    // oracle-comparable; the rank-error CONTRACT is. accuracy=10000 bounds
    // rank error at n/10000; the check verifies it in RANK space: the
    // returned value v must have #{x < v} ≤ q·n + slack and
    // #{x ≤ v} ≥ q·n − slack, slack = 0.01·n + 1 (100× the guarantee,
    // +1 absorbs rounding at tiny n). Counting ranks — rather than
    // bracketing v between interpolated exact percentiles — stays correct
    // for ANY group size (a 2-row group's interpolated p50 brackets no
    // data value at all) and avoids the exact-percentile aggregate's
    // buffer-everything memory cost: the second pass is a narrow
    // conditional count against the broadcast 3-value sketch row. The
    // oracle enumerates the groups and asserts the booleans are TRUE.
    Q(
      "q_value_percentiles_approx",
      """SELECT event_type, TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM (SELECT DISTINCT event_type FROM events)
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val aq = ev.groupBy(col("event_type"))
        .agg(expr("percentile_approx(value, array(0.5, 0.9, 0.99), 10000)")
          .as("aq"))
        .select(col("event_type").as("et"),
          element_at(col("aq"), 1).as("a50"),
          element_at(col("aq"), 2).as("a90"),
          element_at(col("aq"), 3).as("a99"))
      val counted = ev
        .join(broadcast(aq), col("event_type") <=> col("et"), "left")
        .groupBy(col("event_type"))
        .agg(
          count(col("value")).as("n"),
          count(when(col("value") < col("a50"), 1)).as("lt50"),
          count(when(col("value") <= col("a50"), 1)).as("le50"),
          count(when(col("value") < col("a90"), 1)).as("lt90"),
          count(when(col("value") <= col("a90"), 1)).as("le90"),
          count(when(col("value") < col("a99"), 1)).as("lt99"),
          count(when(col("value") <= col("a99"), 1)).as("le99"))
      def ok(q: Double, lt: String, le: String) = {
        val slack = col("n") * 0.01 + 1
        val target = col("n") * q
        // all-NULL value group: sketch returns NULL, n = 0 — that's a pass
        when(col("n") === 0, lit(true))
          .otherwise(col(lt) <= target + slack && col(le) >= target - slack)
      }
      counted.select(col("event_type"),
        ok(0.5, "lt50", "le50").as("ok50"),
        ok(0.9, "lt90", "le90").as("ok90"),
        ok(0.99, "lt99", "le99").as("ok99"))
        .orderBy(col("event_type"))
    },

    // --- KMV approximate distinct — value-exact sketch --------------------
    // The oracle-checkable counterpart to ref_approx_distinct_users (HLL,
    // engine-internal): a k-minimum-values sketch (Bar-Yossef et al. 2002)
    // over the cross-engine MD5 hash. Per event_type keep the k=128
    // smallest distinct 60-bit hashes of user_id; if fewer than k exist
    // the count is exact, else estimate (k−1)·2^60 / kth_min. Every step
    // is engine-replayable: the hash is TextOps.md5Low60 ≡ DuckDB
    // md5_number_upper mod 2^60, the k-smallest selection runs on the
    // native bounded-heap TopK operator (shuffle carries ≤ k rows per
    // group per map partition), and the estimate divides bit-identical
    // doubles ((k−1)·2^60 has 7 significant bits — exact; both engines
    // round kth to double the same IEEE way). Scale: dedup is one
    // map-side-combined exchange, the top-k never materializes more than
    // k·partitions rows — this is the mergeable-sketch shape HLL has,
    // with an oracle HLL can't give.
    Q(
      "ref_approx_distinct_kmv",
      s"""WITH h AS (SELECT DISTINCT event_type,
        |    ${graft.functions.TextOps.md5Low60Sql("CAST(user_id AS VARCHAR)")} AS hv
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |  FROM h),
        |k AS (SELECT event_type, COUNT(*) AS n_kept, MAX(hv) AS kth
        |  FROM r WHERE rn <= 128 GROUP BY event_type)
        |SELECT event_type,
        |  CAST(CASE WHEN n_kept < 128 THEN n_kept
        |    ELSE FLOOR(CAST(127 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
        |               / CAST(kth AS DOUBLE)) END AS BIGINT) AS approx_users
        |FROM k ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val k = 128
      val hashed = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("event_type"),
          graft.functions.TextOps.md5Low60(col("user_id").cast("string"))
            .as("hv"))
        .dropDuplicates("event_type", "hv")
      val kept = graft.operators.TopK.perGroup(hashed, k,
        Seq("event_type"), Seq(graft.operators.TopK.asc("hv")))
      kept.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth"))
        .select(col("event_type"),
          when(col("n_kept") < k, col("n_kept"))
            .otherwise(floor(lit((k - 1).toDouble)
              * lit(1152921504606846976L).cast("double")
              / col("kth").cast("double")))
            .cast("long").as("approx_users"))
        .orderBy(col("event_type"))
    },

    // --- KMV set algebra: union/intersection of sketches -----------------
    // The property that makes sketches distributed-systems citizens:
    // MERGEABILITY. Two per-type KMV sketches combine into the union's
    // sketch by re-taking the k smallest of their concatenation (k-min
    // of a union of k-mins ≡ k-min of the union — every global k-min
    // hash survives in its own type's sketch), and the intersection
    // estimate falls out by inclusion–exclusion. No re-scan of raw data
    // is needed to answer a NEW question ("how many users clicked OR
    // viewed?") — exactly how per-partition / per-day sketches roll up
    // at 100 TB. Deterministic hashing keeps every estimate
    // value-exact against the oracle replaying the same algebra.
    Q(
      "ref_kmv_set_algebra",
      s"""WITH h AS (SELECT DISTINCT event_type,
        |    ${graft.functions.TextOps.md5Low60Sql("CAST(user_id AS VARCHAR)")} AS hv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IN ('click', 'view')),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |  FROM h),
        |sk AS (SELECT event_type, hv FROM r WHERE rn <= 128),
        |u AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn
        |  FROM (SELECT DISTINCT hv FROM sk)),
        |est AS (
        |  SELECT event_type AS tag, COUNT(*) AS n_kept, MAX(hv) AS kth
        |  FROM sk GROUP BY event_type
        |  UNION ALL
        |  SELECT 'union', COUNT(*), MAX(hv) FROM u WHERE rn <= 128),
        |e2 AS (SELECT tag,
        |  CAST(CASE WHEN n_kept < 128 THEN n_kept
        |    ELSE FLOOR(CAST(127 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
        |               / CAST(kth AS DOUBLE)) END AS BIGINT) AS est
        |  FROM est)
        |SELECT
        |  (SELECT est FROM e2 WHERE tag = 'click') AS est_click,
        |  (SELECT est FROM e2 WHERE tag = 'view') AS est_view,
        |  (SELECT est FROM e2 WHERE tag = 'union') AS est_union,
        |  (SELECT est FROM e2 WHERE tag = 'click')
        |    + (SELECT est FROM e2 WHERE tag = 'view')
        |    - (SELECT est FROM e2 WHERE tag = 'union') AS est_intersect"""
        .stripMargin
    ) { (s, d) =>
      val k = 128
      def estimate(nKept: Column, kth: Column): Column =
        when(nKept < k, nKept)
          .otherwise(floor(lit((k - 1).toDouble)
            * lit(1152921504606846976L).cast("double")
            / kth.cast("double")))
          .cast("long")
      val hashed = Tables.events(s, d)
        .where(col("user_id").isNotNull
          && col("event_type").isin("click", "view"))
        .select(col("event_type"),
          graft.functions.TextOps.md5Low60(col("user_id").cast("string"))
            .as("hv"))
        .dropDuplicates("event_type", "hv")
      val sk = graft.operators.TopK.perGroup(hashed, k,
        Seq("event_type"), Seq(graft.operators.TopK.asc("hv")))
      val perType = sk.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth"))
        .select(col("event_type"),
          estimate(col("n_kept"), col("kth")).as("est"))
      val unionSk = graft.operators.TopK.perGroup(
        sk.select(col("hv")).dropDuplicates("hv"), k,
        Seq.empty, Seq(graft.operators.TopK.asc("hv")))
      val unionEst = unionSk
        .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth"))
        .select(estimate(col("n_kept"), col("kth")).as("est_union"))
      // TOTAL per-type pivot: a global agg of conditional MAXes always
      // yields exactly one row (absent type → NULL est, matching the
      // oracle's scalar subqueries), where a filter+crossJoin of
      // per-type 1-row frames would collapse to ZERO rows if either
      // type were missing from the data — a shape mismatch.
      val types = perType.agg(
        max(when(col("event_type") === "click", col("est"))).as("est_click"),
        max(when(col("event_type") === "view", col("est"))).as("est_view"))
      types.crossJoin(broadcast(unionEst))
        .select(col("est_click"), col("est_view"), col("est_union"),
          (col("est_click") + col("est_view") - col("est_union"))
            .as("est_intersect"))
    },

    // --- mergeable HLL sketch columns (DataSketches) ---------------------
    // The store-sketches-merge-at-read pattern a 100 TB lake runs on:
    // each partition (here: event day) aggregates its users into ONE
    // binary HLL sketch; any rollup (month, all-time, ad-hoc day ranges)
    // is a cheap union of those sketches — no rescan of the raw rows.
    // Like the KMV/GK entries above, the sketch VALUE is engine-specific,
    // so the oracle asserts the accuracy CONTRACT: estimate within 5× the
    // lgK=12 target rsd (~1.6%) of the exact count, floor 2 for tiny
    // partitions. Exact counts ride along in the same single-shuffle agg.
    Q(
      "q_hll_daily_users",
      """SELECT CAST(ts AS DATE) AS event_date,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_tol
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"),
          count_distinct(col("user_id")).as("exact_users"))
        .select(col("event_date"), col("exact_users"),
          (abs(col("est") - col("exact_users"))
            <= greatest(lit(2L), (col("exact_users") * 0.08).cast("long")))
            .as("within_tol"))
        .orderBy(col("event_date"))
    },

    // The merge leg: union the per-day sketches into an all-time
    // estimate WITHOUT touching the raw rows again (the daily sketch
    // frame is the only input to the union). The exact all-time count —
    // one extra scan here — exists purely as the oracle's yardstick; at
    // scale the union-of-sketches IS the answer.
    Q(
      "q_hll_mergeable_total",
      """SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_total,
        |  TRUE AS within_tol
        |FROM events WHERE user_id IS NOT NULL""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d).where(col("user_id").isNotNull)
      val daily = ev
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev.agg(count_distinct(col("user_id")).as("exact_total"))
      merged.crossJoin(broadcast(exact))
        .select(col("n_days"), col("exact_total"),
          // zero qualifying rows: the union over an empty frame is NULL,
          // which must read as a pass against an exact count of 0 (the
          // oracle's aggregates are total and emit one TRUE row)
          when(col("est").isNull, col("exact_total") === 0)
            .otherwise(abs(col("est") - col("exact_total"))
              <= greatest(lit(2L), (col("exact_total") * 0.08).cast("long")))
            .as("within_tol"))
    },

    // --- incremental distinct maintenance through the oracle gate --------
    // Exercises io.IncrementalDistinct END-TO-END inside the correctness
    // gate (IncrementalAgg's machinery is spec-only; this one is also
    // oracle-checked): the events are split by user-id parity into two
    // batches, folded through the versioned sketch state — so the HLL
    // UNION of partial per-key sketches across batches is what's being
    // verified, not a single-shot aggregation — and the served estimates
    // are tolerance-checked against exact counts, same contract as
    // q_hll_daily_users.
    Q(
      "q_incremental_distinct_users",
      """SELECT CAST(ts AS DATE) AS event_date,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_tol
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("event_date"), col("user_id"))
      val statePath = java.nio.file.Files
        .createTempDirectory("incdist-q").toString
      graft.io.IncrementalDistinct.update(s, statePath,
        ev.where(pmod(col("user_id"), lit(2)) === 0),
        Seq("event_date"), "user_id", "even")
      graft.io.IncrementalDistinct.update(s, statePath,
        ev.where(pmod(col("user_id"), lit(2)) =!= 0),
        Seq("event_date"), "user_id", "odd")
      // Materialize the served estimates (one row per date — bounded
      // small) so the temp state dirs can be reclaimed NOW rather than
      // leaking one pair of parquet generations per Verify/Bench
      // invocation; the returned plan then reads a local frame, not the
      // deleted path.
      import scala.jdk.CollectionConverters._
      val estDf = graft.io.IncrementalDistinct.estimates(
        s, statePath, Seq("event_date"), Some(ev))
      val estSchema = estDf.schema
      val estRows = estDf.collect().toIndexedSeq
      locally {
        import java.nio.file.{Files, Path, Paths}
        Files.walk(Paths.get(statePath)).iterator().asScala.toSeq.reverse
          .foreach((p: Path) => Files.deleteIfExists(p))
      }
      val est = s.createDataFrame(estRows.asJava, estSchema)
      val exact = ev.groupBy(col("event_date"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
      // Null-safe on the date key: a NULL ts (with non-null user_id)
      // groups under a NULL event_date in BOTH frames and in the
      // oracle's GROUP BY — an inner equi-join would silently drop it.
      exact.as("x").join(est.as("e"),
          col("x.event_date") <=> col("e.event_date"))
        .select(col("x.event_date").as("event_date"), col("exact_users"),
          (abs(col("distinct_est") - col("exact_users"))
            <= greatest(lit(2L), (col("exact_users") * 0.08).cast("long")))
            .as("within_tol"))
        .orderBy(col("event_date"))
    },

    // --- incremental view maintenance: delta-join algebra ----------------
    // Classic IVM over a JOIN view (Blakeley et al., SIGMOD'86): the
    // per-customer revenue view V = γ(O ⋈ L) is refreshed from deltas as
    //   ΔV = γ(ΔO ⋈ L_old) ⊎ γ(O_old ⋈ ΔL) ⊎ γ(ΔO ⋈ ΔL)
    // and merged into the stored view by re-aggregating partial SUM/COUNT
    // (the self-maintainable aggregates — AVG et al. must be derived from
    // them, never stored). The query splits both base tables, computes
    // the base view and all three delta legs, merges, and the oracle — a
    // flat join+group over the FULL inputs — certifies the algebra is
    // exact: every delta leg joins O(|Δ|·fanout) rows, never re-scans
    // the base-× -base pairing. At 100 TB this is the difference between
    // a nightly view refresh costing O(new data) and O(lake); it is the
    // join-view counterpart of io.IncrementalAgg's snapshot-state
    // protocol (which owns WHERE partials live between refreshes).
    // Decimal-exact partials make the merge order-insensitive.
    Q(
      "q_incremental_join_view",
      """SELECT o_custkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_custkey
        |ORDER BY o_custkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)").as("rev"))
      // the "already loaded" bases and the two incoming deltas
      val oBase = o.where(pmod(col("o_orderkey"), lit(4)) =!= 0)
      val oDelta = o.where(pmod(col("o_orderkey"), lit(4)) === 0)
      val lBase = l.where(col("l_linenumber") <= 4)
      val lDelta = l.where(col("l_linenumber") > 4)
      def partial(odf: DataFrame, ldf: DataFrame): DataFrame =
        odf.join(ldf, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("rev")).as("rev_part"),
            count(lit(1)).as("n_part"))
      val baseView = partial(oBase, lBase)
      val deltaView = partial(oDelta, lBase)
        .unionByName(partial(oBase, lDelta))
        .unionByName(partial(oDelta, lDelta))
      baseView.unionByName(deltaView)
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev_part")).cast("double").as("revenue"),
          sum(col("n_part")).as("n_items"))
        .orderBy(col("o_custkey"))
    },

    // --- deterministic hash-sampled quantiles ----------------------------
    // The replayable scale path for quantiles, beside the GK sketch
    // (q_value_percentiles_approx, rows-only by nature): a 1/8 Bernoulli
    // sample drawn by the same cross-engine MD5 hash (keep rows whose
    // 60-bit hash of event_id falls below 2^60/8), then EXACT percentiles
    // over the sample. The sample is a fixed per-row decision — identical
    // on retries, backfills, and in the oracle — so unlike rand()-based
    // sampling the result is a value, not a distribution. At 100 TB the
    // sort that exact percentile needs runs over 12.5% of the data; the
    // hash filter is a narrow codegen'd projection that pushes nothing
    // extra through the shuffle.
    Q(
      "q_value_percentiles_sampled",
      s"""SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50_s,
        |  ROUND(quantile_cont(value, 0.9), 6) AS p90_s,
        |  CAST(COUNT(*) AS BIGINT) AS sample_n
        |FROM events
        |WHERE ${graft.functions.TextOps.md5Low60Sql("CAST(event_id AS VARCHAR)")}
        |      < 144115188075855872
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(graft.functions.TextOps.md5Low60(col("event_id").cast("string"))
          < lit(144115188075855872L))
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50_s"),
          round(expr("percentile(value, 0.9)"), 6).as("p90_s"),
          count(lit(1)).as("sample_n"))
        .orderBy(col("event_type"))
    },

    // --- mergeable bottom-k quantile sample ------------------------------
    // Fixed-SIZE counterpart to the fixed-RATE hash sample above, and the
    // quantile analogue of the KMV distinct sketch: keep the K=256 rows
    // with the smallest MD5(event_id) per DAY (bounded heaps in the
    // native TopK operator — no per-day sort, no collect_list), then
    // merge partitions at read by keeping the bottom K of the union.
    // Merge is EXACT by construction: any row in the global bottom-K is
    // in its own day's bottom-K, so bottom-K(union of per-day bottom-Ks)
    // ≡ bottom-K(all rows) — the query computes both legs and asserts
    // equality in `merge_matches_direct`. That containment is what makes
    // the per-day sketch a mergeable rollup: store 256 rows per
    // partition, serve corpus-wide quantiles from any subset of days by
    // re-merging O(days×K) rows — state never grows with data, unlike
    // the 1/8 rate sample whose sort input scales with the corpus. The
    // hash ordering makes the sample a per-row deterministic VALUE
    // (replayed verbatim by the oracle), not a distribution.
    Q(
      "q_bottomk_mergeable_percentiles",
      s"""WITH ev AS (SELECT
        |    ${graft.functions.TextOps.md5Low60Sql("CAST(event_id AS VARCHAR)")}
        |      AS h, value
        |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
        |m AS (SELECT value FROM (
        |    SELECT value, row_number() OVER (ORDER BY h, value) AS rn
        |    FROM ev) WHERE rn <= 256)
        |SELECT ROUND(quantile_cont(value, 0.5), 6) AS p50_m,
        |  ROUND(quantile_cont(value, 0.9), 6) AS p90_m,
        |  CAST(COUNT(*) AS BIGINT) AS sample_n,
        |  TRUE AS merge_matches_direct
        |FROM m""".stripMargin
    ) { (s, d) =>
      import graft.operators.TopK
      val k = 256
      val ev = Tables.events(s, d)
        .where(col("value").isNotNull && col("event_id").isNotNull)
        .select(to_date(col("ts")).as("event_date"),
          graft.functions.TextOps.md5Low60(col("event_id").cast("string"))
            .as("h"),
          col("value"))
      // store leg: bounded per-day heaps (the per-partition sketch)
      val daily = TopK.perGroup(ev, k, Seq("event_date"),
        Seq(TopK.asc("h"), TopK.asc("value")))
      // serve leg: re-merge the per-day samples (O(days×K) rows)
      val merged = TopK.perGroup(
        daily.select(col("h"), col("value")).withColumn("g", lit(1)),
        k, Seq("g"), Seq(TopK.asc("h"), TopK.asc("value")))
      // direct leg: the oracle's formulation, straight off the raw rows
      val direct = TopK.perGroup(
        ev.select(col("h"), col("value")).withColumn("g", lit(1)),
        k, Seq("g"), Seq(TopK.asc("h"), TopK.asc("value")))
      def stats(df: DataFrame, suffix: String): DataFrame =
        df.agg(
          round(expr("percentile(value, 0.5)"), 6).as(s"p50$suffix"),
          round(expr("percentile(value, 0.9)"), 6).as(s"p90$suffix"),
          count(lit(1)).as(s"n$suffix"))
      stats(merged, "_m").crossJoin(broadcast(stats(direct, "_d")))
        .select(col("p50_m"), col("p90_m"), col("n_m").as("sample_n"),
          (col("p50_m") <=> col("p50_d") && col("p90_m") <=> col("p90_d")
            && col("n_m") === col("n_d")).as("merge_matches_direct"))
    },

    // --- mergeable t-digest quantile rollup ------------------------------
    // The sketch-family counterpart of the bottom-k sample above and of
    // q_hll_daily_users/q_hll_mergeable_total: a per-DAY t-digest of
    // `value` (graft.functions.TDigest, the k₁-scale merging digest) is
    // the stored rollup state; the corpus-wide quantiles are served by
    // UNIONING the daily digests — O(days × δ) bytes — without touching
    // the raw rows again. Unlike the bottom-k sample (exact replay,
    // fixed 256 rows, accuracy O(1/√K) everywhere) the digest spends its
    // δ centroids tail-heavy, so p99 holds up where a uniform sample
    // thins out; the price is run-to-run layout variance, so correctness
    // is asserted in RANK space against exact counts (same contract as
    // q_value_percentiles_approx for Spark's own GK sketch): the count
    // of rows below the served estimate must land within 2% + 1 of the
    // target rank, checked at p50/p90/p99.
    Q(
      "q_tdigest_mergeable_quantiles",
      """SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM events WHERE value IS NOT NULL""".stripMargin
    ) { (s, d) =>
      import graft.functions.TDigest
      val ev = Tables.events(s, d).where(col("value").isNotNull)
      val daily = ev
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(TDigest.sketch_agg(col("value")).as("sk"))
      val served = daily.agg(
        count(col("event_date")).as("n_days"), // null-date group excluded
        TDigest.merge_agg(col("sk")).as("msk"))
        .select(col("n_days"),
          TDigest.quantile(col("msk"), 0.5).as("e50"),
          TDigest.quantile(col("msk"), 0.9).as("e90"),
          TDigest.quantile(col("msk"), 0.99).as("e99"))
      val counted = ev.crossJoin(broadcast(served))
        .agg(
          first(col("n_days")).as("n_days"),
          count(lit(1)).as("n"),
          count(when(col("value") < col("e50"), 1)).as("lt50"),
          count(when(col("value") <= col("e50"), 1)).as("le50"),
          count(when(col("value") < col("e90"), 1)).as("lt90"),
          count(when(col("value") <= col("e90"), 1)).as("le90"),
          count(when(col("value") < col("e99"), 1)).as("lt99"),
          count(when(col("value") <= col("e99"), 1)).as("le99"))
      def ok(q: Double, lt: String, le: String) = {
        val slack = col("n") * 0.02 + 1
        val target = col("n") * q
        col(lt) <= target + slack && col(le) >= target - slack
      }
      counted.select(col("n_days"), col("n"),
        ok(0.5, "lt50", "le50").as("ok50"),
        ok(0.9, "lt90", "le90").as("ok90"),
        ok(0.99, "lt99", "le99").as("ok99"))
    },

    // --- robust outliers: median/MAD in exact integer cents --------------
    // The robust-statistics cleaning pass (median + median-absolute-
    // deviation beats mean/stddev under the heavy tails that motivate
    // outlier removal in the first place). Exactness without rounding:
    // `value` is cast to DECIMAL(18,2) and scaled to integer CENTS, so
    // every percentile interpolation lands on an exact half (integers in
    // doubles), and the flag test |cents−med| > 3·1.4826·mad is
    // multiplied through to integers (×10⁴ both sides → strict integer
    // compare, no float threshold). Two broadcast joins of 5-row stats
    // frames; the corpus is scanned twice (med pass, then MAD+flag
    // pass) — the unavoidable two-pass structure of exact MAD; the
    // sampled-quantile trick above is the single-pass approximation.
    Q(
      "q_outlier_mad",
      """WITH e AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DOUBLE) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med_c
        |  FROM e GROUP BY event_type),
        |d AS (SELECT e.event_type, cents, med_c,
        |    abs(cents - med_c) AS adev
        |  FROM e JOIN m USING (event_type)),
        |s AS (SELECT event_type, med_c, quantile_cont(adev, 0.5) AS mad_c
        |  FROM d GROUP BY event_type, med_c)
        |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  s.med_c, s.mad_c,
        |  CAST(COUNT(CASE WHEN abs(cents - s.med_c) * 10000
        |                       > 44478 * s.mad_c
        |                  THEN 1 END) AS BIGINT) AS n_outliers
        |FROM d JOIN s ON d.event_type = s.event_type
        |GROUP BY d.event_type, s.med_c, s.mad_c
        |ORDER BY d.event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d)
        .where(col("value").isNotNull)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("double")
            .as("cents"))
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(cents, 0.5)").as("med_c"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("cents") - col("med_c")))
      val mad = dev.groupBy(col("event_type"), col("med_c"))
        .agg(expr("percentile(adev, 0.5)").as("mad_c"))
      dev.drop("med_c")
        .join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med_c"), col("mad_c"))
        .agg(count(lit(1)).as("n"),
          count(when(abs(col("cents") - col("med_c")) * 10000
            > lit(44478) * col("mad_c"), 1)).as("n_outliers"))
        .select(col("event_type"), col("n"), col("med_c"), col("mad_c"),
          col("n_outliers"))
        .orderBy(col("event_type"))
    },

    // --- per-group trend: integer-exact least-squares slope --------------
    // Segment-level trend estimation (is spend per event type drifting?)
    // as closed-form simple regression of cents on hours-since-epoch,
    // computed ENTIRELY in integers: x is the hour-truncated epoch hour,
    // y integer cents; slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with
    // the sums in DECIMAL(38,0) (n·Σx² overflows int64; DuckDB's HUGEINT
    // and Spark's decimal both hold it) and the result emitted in ppm by
    // integer division. Numerator sign is routed through abs() because
    // Spark's `div` truncates toward zero while DuckDB's `//` floors —
    // they agree only on non-negative operands. One aggregate per type;
    // a single scan, no joins.
    Q(
      "q_trend_slope",
      // (sums stay HUGEINT in DuckDB — casting to DECIMAL(38,0) would
      // make the products spill past precision 38 and silently degrade
      // to DOUBLE; HUGEINT arithmetic is exact 128-bit)
      """WITH e AS (SELECT event_type,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS x,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT event_type, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM e GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN n * sxy - sx * sy >= 0
        |    THEN (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
        |    ELSE -((sx * sy - n * sxy) * 1000000 // (n * sxx - sx * sx))
        |  END AS BIGINT) AS slope_ppm_cents_per_hour
        |FROM a ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val dec = "decimal(38,0)"
      val e = Tables.events(s, d)
        .where(col("value").isNotNull)
        .select(col("event_type"),
          expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("x"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("y"))
      val a = e.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("sx"),
          sum(col("y")).cast(dec).as("sy"),
          sum(col("x") * col("y")).cast(dec).as("sxy"),
          sum(col("x") * col("x")).cast(dec).as("sxx"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      a.select(col("event_type"), col("n").cast("long").as("n"),
          when(num >= 0, expr(
            "CAST((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)" +
              " AS DECIMAL(38,0))"))
            .otherwise(-expr(
              "CAST((sx * sy - n * sxy) * 1000000 div (n * sxx - sx * sx)" +
                " AS DECIMAL(38,0))"))
            .cast("long").as("slope_ppm_cents_per_hour"))
        .orderBy(col("event_type"))
    },

    // --- deterministic A/B assignment + conversion readout ---------------
    // The experimentation primitive: users hash into arms (low bit of
    // the cross-engine MD5 — the same salt-free deterministic bucketing
    // online systems use so a user sees one arm forever, across
    // services, with no assignment table to join), then per arm the
    // user count, converters (≥1 purchase), and conversion ppm by
    // integer division. The whole readout is two hash aggregates on
    // user_id; assignment adds zero shuffles because it's a projection
    // of the hash the aggregate already groups by.
    Q(
      "q_ab_assignment",
      s"""WITH u AS (SELECT user_id,
        |    ${graft.functions.TextOps.md5Low60Sql("CAST(user_id AS VARCHAR)")} % 2 AS arm,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY user_id, arm)
        |SELECT CAST(arm AS BIGINT) AS arm,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(converted) AS BIGINT) AS converters,
        |  CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT)
        |    AS conversion_ppm
        |FROM u GROUP BY arm
        |ORDER BY arm NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .groupBy(col("user_id"),
          (graft.functions.TextOps.md5Low60(col("user_id").cast("string"))
            % 2).as("arm"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("converted")).cast("long").as("converters"))
        .select(col("arm"), col("n_users"), col("converters"),
          expr("CAST(converters * 1000000 div n_users AS BIGINT)")
            .as("conversion_ppm"))
        .orderBy(col("arm"))
    },

    // --- revenue concentration: top-1% users' share ----------------------
    // The whale-curve question ("how much revenue rides on the top 1%?")
    // answered in exact integers: top-1% is RANK-defined (k = ⌈users/100⌉
    // by spend desc, user_id tiebreak), NOT an interpolated p99 boundary
    // — interpolation is float arithmetic two engines may round apart,
    // and a membership comparison can't absorb that with ROUND the way
    // the percentile queries do. Fully plan-side, no per-user rank and
    // no driver scalar: users collapse to the distinct-spend grid, the
    // users-before-each-group cumulative (spend DESC) comes from the
    // two-phase RangeCum, and the top-k spend is the closed form
    // Σ cents · max(0, min(t, k − before)) — the user_id tiebreak can't
    // matter because every user of a tie group contributes the same
    // cents. k rides the 1-row totals broadcast; share is integer ppm.
    Q(
      "q_revenue_concentration",
      """WITH u AS (SELECT user_id,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type = 'purchase'
        |  GROUP BY user_id),
        |r AS (SELECT cents, row_number()
        |    OVER (ORDER BY cents DESC, user_id) AS rn FROM u),
        |k AS (SELECT CAST((COUNT(*) + 99) // 100 AS BIGINT) AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(cents) AS BIGINT) AS total_cents FROM u)
        |SELECT n_users, k AS top_k, total_cents,
        |  CAST(SUM(CASE WHEN rn <= k THEN cents ELSE 0 END) AS BIGINT)
        |    AS top_cents,
        |  CAST(SUM(CASE WHEN rn <= k THEN cents ELSE 0 END) * 1000000
        |       // total_cents AS BIGINT) AS top_share_ppm
        |FROM r, k GROUP BY n_users, k, total_cents""".stripMargin
    ) { (s, d) =>
      val u = Tables.events(s, d)
        .where(col("user_id").isNotNull && col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .cast("long").as("cents"))
      val totals = u.agg(count(lit(1)).as("n_users"),
        coalesce(sum(col("cents")), lit(0L)).cast("long")
          .as("total_cents"))
        .withColumn("k", expr("(n_users + 99) div 100"))
      val g = u.groupBy(col("cents")).agg(count(lit(1)).as("t"))
      val wb = graft.operators.RangeCum.exclusive(g,
        expr("-(cents div 4096)"), Seq(col("cents").desc),
        Seq((col("t"), "before_cnt")))
      // an empty grid (no purchases) GROUP-BYs to the oracle's empty
      // cross join — 0 rows, no special case
      wb.crossJoin(broadcast(totals))
        .groupBy(col("n_users"), col("k"), col("total_cents"))
        .agg(sum(col("cents") * greatest(lit(0L),
          least(col("t"), col("k") - col("before_cnt"))))
          .cast("long").as("top_cents"))
        .select(col("n_users"), col("k").as("top_k"),
          col("total_cents"), col("top_cents"),
          when(col("total_cents") > 0,
            expr("CAST(top_cents * 1000000 div total_cents AS BIGINT)"))
            .otherwise(lit(0L)).as("top_share_ppm"))
    },

    // --- chi-square independence scan (event_type × weekday) -------------
    // The dependence detector behind "does the type mix shift by
    // weekday?" — the same contingency arithmetic a feature-selection
    // pass runs over (label × bucketed-feature) tables. The statistic is
    // kept integer: per cell, observed o and expected e = r·c/N are
    // compared via the scaled term (o·N − r·c)² // (r·c·N) — everything
    // BIGINT-products-in-HUGEINT/DECIMAL(38), positive throughout, and
    // the final Σ is the familiar N·χ² scaling (divide by N for χ²; the
    // scale-free peak cell and per-cell ordering are what the monitor
    // consumes). One aggregate for cells, two tiny margin aggregates
    // broadcast back in.
    Q(
      "q_chisq_type_weekday",
      // DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based
      // (Sunday=1) — the +1 aligns them. The squared deviation tops
      // BIGINT (~1e20), so it squares in HUGEINT.
      """WITH cell AS (SELECT event_type, dayofweek(ts) + 1 AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY event_type, dow),
        |r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM cell
        |      GROUP BY event_type),
        |c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct FROM cell
        |      GROUP BY dow),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM cell)
        |SELECT cell.event_type, CAST(cell.dow AS BIGINT) AS dow, o,
        |  CAST(CAST(o * nt - rt * ct AS HUGEINT)
        |       * CAST(o * nt - rt * ct AS HUGEINT)
        |       // (CAST(rt AS HUGEINT) * ct * nt) AS BIGINT)
        |    AS chisq_term_scaled
        |FROM cell JOIN r USING (event_type) JOIN c USING (dow), n
        |ORDER BY event_type NULLS FIRST, dow NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val cell = Tables.events(s, d)
        .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("o"))
      val r = cell.groupBy(col("event_type"))
        .agg(sum(col("o")).cast("long").as("rt"))
      val c = cell.groupBy(col("dow"))
        .agg(sum(col("o")).cast("long").as("ct"))
      val n = cell.agg(sum(col("o")).cast("long").as("nt"))
      cell.join(broadcast(r), "event_type")
        .join(broadcast(c), "dow")
        .crossJoin(broadcast(n))
        .select(col("event_type"), col("dow").cast("long").as("dow"),
          col("o"),
          expr("CAST((CAST(o AS DECIMAL(38,0)) * nt - CAST(rt AS DECIMAL(38,0)) * ct)" +
            " * (CAST(o AS DECIMAL(38,0)) * nt - CAST(rt AS DECIMAL(38,0)) * ct)" +
            " div (CAST(rt AS DECIMAL(38,0)) * ct * nt) AS DECIMAL(38,0))")
            .cast("long").as("chisq_term_scaled"))
        .orderBy(col("event_type"), col("dow"))
    },

    // --- equi-depth histogram via percentile boundaries ------------------
    // The profiling sibling of the equi-WIDTH histogram below: ~10% of
    // rows per bucket regardless of skew. Deliberately NOT ntile() — a
    // global ntile needs one total ordering in a single window task (the
    // known unbounded-cardinality window trap); instead the 9 decile
    // boundaries come from one exact-percentile aggregate (engine-equal
    // doubles, the q_value_percentiles precedent), broadcast into a
    // second scan that assigns buckets by strict comparison. Two narrow
    // passes, no global sort, no single-task stage. Bucket populations
    // differ from ntile's only by boundary ties (documented, exact on
    // both engines the same way).
    Q(
      "q_value_equidepth",
      """WITH b AS (SELECT [
        |    quantile_cont(value, 0.1), quantile_cont(value, 0.2),
        |    quantile_cont(value, 0.3), quantile_cont(value, 0.4),
        |    quantile_cont(value, 0.5), quantile_cont(value, 0.6),
        |    quantile_cont(value, 0.7), quantile_cont(value, 0.8),
        |    quantile_cont(value, 0.9)] AS bs
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT value, 1 + len(list_filter(bs, x -> x < value)) AS bucket
        |  FROM events, b WHERE value IS NOT NULL)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(value) AS lo, MAX(value) AS hi
        |FROM a GROUP BY bucket
        |ORDER BY bucket NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d).where(col("value").isNotNull)
      val bounds = e.agg(expr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("bs"))
      e.crossJoin(broadcast(bounds))
        .select(col("value"),
          (lit(1) + size(filter(col("bs"), x => x < col("value"))))
            .cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("bucket"))
    },

    // --- histogram binning via width_bucket ------------------------------
    Q(
      "q_value_histogram",
      // DuckDB 1.0 has no width_bucket; the oracle spells out its full
      // contract — floor((v-min)/width)+1 with the same double division,
      // PLUS the underflow (0) and overflow (n+1) buckets. The in-range
      // shortcut held at sf0.01 but sf0.1 has values ≥ 500 that
      // width_bucket clamps into bucket 21 while a bare floor keeps
      // counting upward — range-edge semantics are part of the operator.
      """SELECT CAST(CASE WHEN value < 0 THEN 0
        |            WHEN value >= 500 THEN 21
        |            ELSE FLOOR(value / 25.0) + 1 END AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY bucket
        |ORDER BY bucket NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(width_bucket(col("value"), lit(0), lit(500), lit(20))
          .as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // --- range join: event values into OVERLAPPING value bands -----------
    // Not a width_bucket: bands [i·25, i·25+50) overlap pairwise, so a
    // value can match two bands — a genuine interval join. Engine side
    // goes through graft.operators.RangeJoin (bucketed equi-join
    // decomposition: O(points + intervals·2 + matches), never the
    // BroadcastNestedLoopJoin Spark would plan for the raw theta join);
    // the oracle states the naive BETWEEN semantics directly.
    Q(
      "q_range_join_bands",
      """WITH bands AS (SELECT i AS band_id, i * 25.0 AS lo,
        |                 i * 25.0 + 50.0 AS hi
        |               FROM range(0, 20) t(i))
        |SELECT band_id, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band_id
        |ORDER BY band_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val bands = s.range(0, 20).select(col("id").as("band_id"),
        (col("id") * 25.0).as("lo"), (col("id") * 25.0 + 50.0).as("hi"))
      graft.operators.RangeJoin.pointInInterval(
          Tables.events(s, d).select(col("value"), col("user_id")),
          bands, "value", "lo", "hi", bucketWidth = 25.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("users"))
        .orderBy(col("band_id"))
    },

    // --- typed Aggregator: exact weighted mean ---------------------------
    // The Dataset-API custom aggregate (expressions.Aggregator via udaf):
    // quantity weighted by price, accumulated as integer cents so the
    // buffer merge is associative/order-independent — correct under
    // partial aggregation and AQE at any partitioning. The oracle states
    // the same integer-exact arithmetic; the final long→double division
    // is bit-identical on both sides.
    Q(
      "q_weighted_mean_qty",
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT)
        |                 * CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT)) AS BIGINT)
        |    AS w_mean_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val wm = udaf(new graft.functions.TypedAggregators.WeightedMean,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaDouble))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(wm(col("l_quantity"), col("l_extendedprice")).as("w_mean_qty"))
        .orderBy(col("l_returnflag"))
    },

    // --- salted aggregation over a hot-key distribution ------------------
    // event_type has ~5 values → a plain groupBy funnels each through one
    // reducer (the classic hot-key shape at 100 TB). Engine side goes
    // through Salting.saltedCounts: phase 1 on (key, salt-of-user_id)
    // spreads each hot key over 16 reducers; phase 2 merges partials.
    // Salting by the distinct column keeps count-distinct exact, so the
    // oracle is the plain one-phase SQL.
    Q(
      "q_salted_type_counts",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_user_id
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      graft.operators.Salting.saltedCounts(
          Tables.events(s, d).select(col("event_type"), col("user_id")),
          Seq("event_type"), "user_id", nSalts = 16)
        .orderBy(col("event_type"))
    },

    // --- stratified sample: fixed fraction per event_type ----------------
    // Deterministic multiplicative-hash draw (Knuth 2654435761 mod 2³²)
    // instead of `stat.sampleBy`: same reproducible per-row decision,
    // but engine-independent arithmetic → oracle-checkable, and at scale
    // the draw recomputes identically on retries/backfills (no RNG state).
    // Per-stratum thresholds are floor(fraction · 2³²) integer compares —
    // no float division in the hot filter. (Test-data event_id < 2³¹ keeps
    // the product far from Long overflow; a production variant would
    // xxhash64 the id first for the same contract.)
    Q(
      "q_stratified_sample",
      """SELECT event_type, COUNT(*) AS sampled_n
        |FROM events
        |WHERE (event_id * 2654435761) % 4294967296 <
        |  CASE event_type
        |    WHEN 'click' THEN 429496729 WHEN 'view' THEN 429496729
        |    WHEN 'purchase' THEN 2147483648 WHEN 'signup' THEN 2147483648
        |    WHEN 'error' THEN 85899345 END
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val strata = Seq("click" -> 429496729L, "view" -> 429496729L,
        "purchase" -> 2147483648L, "signup" -> 2147483648L,
        "error" -> 85899345L)
      val thr = strata.foldLeft(lit(null).cast("long")) {
        case (acc, (k, v)) => when(col("event_type") === k, lit(v))
          .otherwise(acc)
      }
      val draw = pmod(col("event_id") * lit(2654435761L), lit(4294967296L))
      Tables.events(s, d)
        .where(draw < thr)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("sampled_n"))
        .orderBy(col("event_type"))
    },

    // --- column profile (the ANALYZE/DQ-dashboard operator) -------------
    // One aggregate PER COLUMN, unioned: each scan is pruned to a single
    // column (same total bytes as one 4-column scan) and carries exactly
    // one exact count-distinct — avoiding the multi-distinct Expand,
    // which multiplies every row by the number of distinct aggregates
    // before the partial agg (measured 1.54 s → 0.7 s at sf0.1; at
    // 100 TB the Expand is a 4× row blowup through the first stage).
    // Swap in approx_count_distinct for a cheaper, non-oracle-able
    // variant. Numeric min/max surface as DOUBLE (exact for int64 <
    // 2^53); lexicographic min/max only for the string column — never
    // stringify doubles across engines (formatting differs).
    Q(
      "ref_profile_columns",
      """WITH a AS (SELECT
        |  COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT(event_id) AS null_event_id,
        |  COUNT(DISTINCT event_id) AS d_event_id,
        |  CAST(MIN(event_id) AS DOUBLE) AS min_event_id,
        |  CAST(MAX(event_id) AS DOUBLE) AS max_event_id,
        |  COUNT(*) - COUNT(user_id) AS null_user_id,
        |  COUNT(DISTINCT user_id) AS d_user_id,
        |  CAST(MIN(user_id) AS DOUBLE) AS min_user_id,
        |  CAST(MAX(user_id) AS DOUBLE) AS max_user_id,
        |  COUNT(*) - COUNT(value) AS null_value,
        |  COUNT(DISTINCT value) AS d_value,
        |  MIN(value) AS min_value,
        |  MAX(value) AS max_value,
        |  COUNT(*) - COUNT(event_type) AS null_event_type,
        |  COUNT(DISTINCT event_type) AS d_event_type,
        |  MIN(event_type) AS mins_event_type,
        |  MAX(event_type) AS maxs_event_type
        |  FROM events)
        |SELECT col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
        |       min_str, max_str FROM (
        |  SELECT 'event_id' AS col_name, n_rows,
        |    CAST(null_event_id AS BIGINT) AS n_nulls, d_event_id AS n_distinct,
        |    min_event_id AS min_num, max_event_id AS max_num,
        |    NULL AS min_str, NULL AS max_str FROM a
        |  UNION ALL
        |  SELECT 'event_type', n_rows, CAST(null_event_type AS BIGINT),
        |    d_event_type, NULL, NULL, mins_event_type, maxs_event_type FROM a
        |  UNION ALL
        |  SELECT 'user_id', n_rows, CAST(null_user_id AS BIGINT), d_user_id,
        |    min_user_id, max_user_id, NULL, NULL FROM a
        |  UNION ALL
        |  SELECT 'value', n_rows, CAST(null_value AS BIGINT), d_value,
        |    min_value, max_value, NULL, NULL FROM a)
        |ORDER BY col_name NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d)
      val nullS = lit(null).cast("string")
      val nullD = lit(null).cast("double")
      def profile(name: String, numeric: Boolean) = {
        val c = col(name)
        e.select(c).agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(c)).as("n_nulls"),
          count_distinct(c).as("n_distinct"),
          (if (numeric) min(c).cast("double") else nullD).as("min_num"),
          (if (numeric) max(c).cast("double") else nullD).as("max_num"),
          (if (numeric) nullS else min(c)).as("min_str"),
          (if (numeric) nullS else max(c)).as("max_str"))
          .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_num"), col("max_num"),
            col("min_str"), col("max_str"))
      }
      profile("event_id", numeric = true)
        .unionByName(profile("event_type", numeric = false))
        .unionByName(profile("user_id", numeric = true))
        .unionByName(profile("value", numeric = true))
        .orderBy(col("col_name"))
    },

    // --- DSv2 connector end-to-end (graft.sources.SyntheticSource) ------
    // The custom DataSource V2 source under the full oracle gate: the id
    // range predicate pushes into PARTITION PLANNING (the source
    // generates [10000, 50000) and nothing else — spec-asserted), column
    // pruning reaches the reader, and because the generator is integer
    // arithmetic on the row index, DuckDB replays the identical stream
    // from range() and the aggregate hash-matches. min/max of
    // bit-identical doubles are engine-safe; no double is ever summed.
    Q(
      "q_synth_source",
      s"""WITH t AS (SELECT ${graft.sources.SyntheticSource.rowSql("i")}
         |  FROM range(10000, 50000) r(i))
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
         |  MIN(value) AS min_v, MAX(value) AS max_v
         |FROM t GROUP BY event_type
         |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      s.read.format("graft-synth")
        .option("numRows", 60000).option("numPartitions", 8).load()
        .where(col("id") >= 10000L && col("id") < 50000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("users"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
        .orderBy(col("event_type"))
    },

    // --- Morton (Z-order) cell map of the (user, hour) activity grid ----
    // The query half of io.Layout.writeZOrdered: per-(user_id, hour)
    // event counts keyed by the 2-D Morton code, emitted in curve order —
    // rows that are adjacent in the output are adjacent in BOTH
    // dimensions, which is exactly why a z-sorted layout skips files for
    // predicates on either one. The z arithmetic is pure bitwise builtins
    // (ZOrder.zvalue16) and the oracle runs the IDENTICAL expression
    // generated from the same mask table (ZOrder.zvalueSql). One hash
    // aggregate on (user_id, h); hour() can't diverge across the µs/ns
    // parquet precision split (truncation never crosses an hour).
    Q(
      "q_zorder_cells",
      s"""WITH e AS (SELECT user_id, hour(ts) AS h FROM events
         |           WHERE user_id IS NOT NULL)
         |SELECT user_id, CAST(h AS BIGINT) AS h,
         |  ${graft.functions.ZOrder.zvalueSql("user_id", "h")} AS zvalue,
         |  COUNT(*) AS n
         |FROM e GROUP BY user_id, h
         |ORDER BY zvalue NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .select(col("user_id"), hour(col("ts")).cast("long").as("h"))
        .groupBy(col("user_id"), col("h"))
        .agg(count(lit(1)).as("n"))
        .withColumn("zvalue",
          graft.functions.ZOrder.zvalue16(col("user_id"), col("h")))
        .select(col("user_id"), col("h"), col("zvalue"), col("n"))
        .orderBy(col("zvalue"))
    },

    // --- cohort lifetime value (cumulative revenue triangle) ------------
    // The money sibling of q_cohort_retention: customers grouped by
    // first-order year, revenue accumulated along the offset axis — the
    // LTV curve finance discount models read off. Per-cell revenue is
    // DECIMAL-exact; the cumulative window runs over the ≤7-row offset
    // axis per cohort (calendar-bounded, never data-bounded). First
    // order per customer is a min-aggregate + equi-join, no window over
    // the orders stream.
    Q(
      "q_ltv_cohort",
      """WITH fo AS (SELECT o_custkey, MIN(year(o_orderdate)) AS cohort_year
        |            FROM orders GROUP BY o_custkey),
        |j AS (SELECT cohort_year,
        |        year(o.o_orderdate) - cohort_year AS offset_y,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS rev, o.o_custkey
        |      FROM orders o JOIN fo USING (o_custkey)),
        |g AS (SELECT cohort_year, offset_y,
        |        COUNT(DISTINCT o_custkey) AS n_active,
        |        SUM(rev) AS rev
        |      FROM j GROUP BY cohort_year, offset_y)
        |SELECT CAST(cohort_year AS BIGINT) AS cohort_year,
        |  CAST(offset_y AS BIGINT) AS offset_y,
        |  CAST(n_active AS BIGINT) AS n_active,
        |  CAST(SUM(rev) OVER (PARTITION BY cohort_year ORDER BY offset_y
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
        |FROM g
        |ORDER BY cohort_year NULLS FIRST, offset_y NULLS FIRST"""
        .stripMargin
    ) { (s, d) =>
      val fo = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min(year(col("o_orderdate"))).as("cohort_year"))
      val g = Tables.orders(s, d)
        .join(fo, Seq("o_custkey"))
        .select(col("cohort_year"),
          (year(col("o_orderdate")) - col("cohort_year")).as("offset_y"),
          col("o_totalprice").cast("decimal(18,2)").as("rev"),
          col("o_custkey"))
        .groupBy(col("cohort_year"), col("offset_y"))
        .agg(count_distinct(col("o_custkey")).as("n_active"),
          sum(col("rev")).as("rev"))
      val cum = Window.partitionBy(col("cohort_year"))
        .orderBy(col("offset_y"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("cohort_year").cast("long").as("cohort_year"),
          col("offset_y").cast("long").as("offset_y"),
          col("n_active"),
          sum(col("rev")).over(cum).cast("double").as("cum_rev"))
        .orderBy(col("cohort_year"), col("offset_y"))
    },

    // --- Pareto concentration: users covering 80% of activity -----------
    // The inverse of q_revenue_concentration's top-share: the SMALLEST
    // set of users that accounts for ≥80% of events — the "how top-heavy
    // is the workload" number capacity planning and abuse review both
    // start from. NO per-user window anywhere: users collapse to the
    // distinct-activity grid (n, t = users with exactly n events), the
    // exclusive cumulative (events and users before each group under
    // n DESC) comes from the two-phase RangeCum — the only ordered
    // global window runs over the BUCKET frame — and the crossing user
    // inside the unique threshold group is closed-form: the smallest j
    // with 5·(before_sum + j·n) ≥ 4·total, i.e.
    // j = ⌈(4·total − 5·before_sum) / (5n)⌉, all exact integers. The
    // user_id tiebreak can't matter: every user in a tie group adds the
    // same n. The oracle keeps the textbook row_number/cum formulation —
    // a hash match proves the closed form IS the rank scan.
    Q(
      "q_pareto_users",
      """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events
        |           WHERE user_id IS NOT NULL GROUP BY user_id),
        |t AS (SELECT SUM(n) AS total, COUNT(*) AS n_users FROM c),
        |r AS (SELECT n, SUM(n) OVER (ORDER BY n DESC, user_id
        |        ROWS UNBOUNDED PRECEDING) AS cum,
        |        row_number() OVER (ORDER BY n DESC, user_id) AS rk
        |      FROM c)
        |SELECT CAST(n_users AS BIGINT) AS n_users,
        |  CAST(total AS BIGINT) AS total_events,
        |  CAST(MIN(CASE WHEN cum * 5 >= total * 4 THEN rk END) AS BIGINT)
        |    AS n_top80,
        |  CAST(CAST(MIN(CASE WHEN cum * 5 >= total * 4 THEN rk END)
        |    AS BIGINT) * 1000000 // n_users AS BIGINT)
        |    AS top80_user_share_ppm
        |FROM r CROSS JOIN t
        |GROUP BY n_users, total""".stripMargin
    ) { (s, d) =>
      val c = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_users"))
      val g = c.groupBy(col("n")).agg(count(lit(1)).as("t"))
      val wb = graft.operators.RangeCum.exclusive(g,
        expr("-(n div 1024)"), Seq(col("n").desc),
        Seq((col("n") * col("t"), "before_sum"), (col("t"), "before_cnt")))
      // the unique threshold group: its cum crosses 4/5·total and its
      // predecessor's doesn't (the next group's before_sum = this cum,
      // so no second group can satisfy both)
      wb.crossJoin(broadcast(t))
        .where(lit(5) * (col("before_sum") + col("n") * col("t")) >=
          lit(4) * col("total") &&
          lit(5) * col("before_sum") < lit(4) * col("total"))
        .select(col("n_users").cast("long").as("n_users"),
          col("total").cast("long").as("total_events"),
          (col("before_cnt") +
            expr("(4 * total - 5 * before_sum + 5 * n - 1) div (5 * n)"))
            .cast("long").as("n_top80"))
        // BIGINT before the multiply: at tier user counts the int32
        // product overflows under ANSI
        .withColumn("top80_user_share_ppm",
          expr("CAST(n_top80 AS BIGINT) * 1000000 div n_users")
            .cast("long"))
    },

    // --- day-of-week × hour activity heat profile ------------------------
    // The 7×24 usage grid behind every "when are users active" dashboard
    // panel, with share in ppm of the whole week so panels compare
    // across deployments. One hash aggregate on a 168-cell key space —
    // combiner-friendly, calendar-bounded output. ISO day numbering
    // (Mon=1) via DuckDB isodow ≡ Spark's ((dayofweek+5)%7)+1.
    Q(
      "q_dow_hour_profile",
      """WITH e AS (SELECT isodow(ts) AS dow, hour(ts) AS hr
        |  FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT dow, hr, COUNT(*) AS n FROM e GROUP BY dow, hr),
        |t AS (SELECT SUM(n) AS total FROM c)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // total AS BIGINT) AS share_ppm
        |FROM c CROSS JOIN t
        |ORDER BY dow NULLS FIRST, hr NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val c = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .select(
          ((dayofweek(col("ts")) + 5) % 7 + 1).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hr"))
        .groupBy(col("dow"), col("hr")).agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("total"))
      c.crossJoin(broadcast(t))
        .select(col("dow"), col("hr"), col("n"),
          expr("n * 1000000 div total").cast("long").as("share_ppm"))
        .orderBy(col("dow"), col("hr"))
    },

    // --- RFM customer segmentation (quintile grid) ----------------------
    // The classic CRM cut: recency (last order date), frequency (order
    // count), monetary (DECIMAL-exact spend) per customer, each
    // quintiled by ntile(5) under a TOTAL order (metric, custkey — ties
    // can't float between engines), then the populated cells of the
    // 5×5×5 grid. The ntile windows are unpartitioned — fine at
    // customer-table cardinality, and at 100 TB the swap is
    // q_value_equidepth's shape (approx boundaries + bucket join), same
    // downstream grid. One scan to per-customer aggregates; everything
    // after is customer-table-sized.
    Q(
      "q_rfm_segments",
      """WITH c AS (SELECT o_custkey,
        |    MAX(o_orderdate) AS last_order,
        |    COUNT(*) AS freq,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |q AS (SELECT o_custkey,
        |    ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_q,
        |    ntile(5) OVER (ORDER BY freq, o_custkey) AS f_q,
        |    ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_q
        |  FROM c)
        |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
        |  CAST(m_q AS BIGINT) AS m_q,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM q GROUP BY r_q, f_q, m_q
        |ORDER BY r_q NULLS FIRST, f_q NULLS FIRST, m_q NULLS FIRST"""
        .stripMargin
    ) { (s, d) =>
      val c = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
      def q5(m: String) = ntile(5).over(
        Window.orderBy(col(m), col("o_custkey")))
      c.select(col("o_custkey"),
          q5("last_order").cast("long").as("r_q"),
          q5("freq").cast("long").as("f_q"),
          q5("monetary").cast("long").as("m_q"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    },

    // --- two-proportion z-test on the experiment arms -------------------
    // The significance readout beside q_ab_assignment's raw conversion
    // ppm: pooled-variance z for the difference in per-arm conversion.
    // Conversion = a high-value purchase (value > 300) so the rate is
    // non-degenerate on this corpus (plain purchase saturates at 100%,
    // which zeroes the pooled variance — ANSI division would reject).
    // All inputs are exact integers; the z is a fixed sequence of IEEE
    // ops (divisions, one sqrt — both correctly rounded) written
    // IDENTICALLY on both sides, so the statistic hash-matches to 6
    // decimals. The decision threshold (|z| > 1.96) ships with the
    // query — the readout a dashboard actually wants.
    Q(
      "q_funnel_sig",
      s"""WITH u AS (SELECT user_id,
         |    ${graft.functions.TextOps.md5Low60Sql("CAST(user_id AS VARCHAR)")} % 2 AS arm,
         |    MAX(CASE WHEN event_type = 'purchase' AND value > 300
         |      THEN 1 ELSE 0 END) AS conv
         |  FROM events WHERE user_id IS NOT NULL
         |  GROUP BY user_id, arm),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n0,
         |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS c0,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS c1
         |  FROM u),
         |z AS (SELECT n0, c0, n1, c1,
         |    CASE WHEN n0 > 0 AND n1 > 0 AND c0 + c1 > 0
         |        AND c0 + c1 < n0 + n1 THEN
         |      (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
         |      / SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
         |          * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
         |          * (1.0 / n0 + 1.0 / n1))
         |    ELSE CAST(0 AS DOUBLE) END AS zval
         |  FROM a)
         |SELECT n0, c0, n1, c1, ROUND(zval, 6) AS z,
         |  ABS(zval) > 1.96 AS significant
         |FROM z""".stripMargin
    ) { (s, d) =>
      val u = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .groupBy(col("user_id"),
          (graft.functions.TextOps.md5Low60(col("user_id").cast("string"))
            % 2).as("arm"))
        .agg(max(when(col("event_type") === "purchase"
            && col("value") > 300, 1).otherwise(0)).as("conv"))
      val a = u.agg(
        sum(when(col("arm") === 0, 1).otherwise(0)).cast("long").as("n0"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0)).cast("long")
          .as("c0"),
        sum(when(col("arm") === 1, 1).otherwise(0)).cast("long").as("n1"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0)).cast("long")
          .as("c1"))
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      val pPool = dd(col("c0") + col("c1")) / (col("n0") + col("n1"))
      // guarded on INTEGER conditions: z is undefined when an arm is
      // empty or the pooled rate is degenerate (0 or 1 — zero pooled
      // variance; true at the sf0.001 smoke tier) — ANSI mode rejects
      // the division, and 0 is the defined no-signal answer
      val zval = when(
        col("n0") > 0 && col("n1") > 0 &&
          col("c0") + col("c1") > 0 &&
          col("c0") + col("c1") < col("n0") + col("n1"),
        (dd(col("c1")) / col("n1") - dd(col("c0")) / col("n0")) /
          sqrt(pPool * (lit(1) - pPool) *
            (lit(1.0) / col("n0") + lit(1.0) / col("n1"))))
        .otherwise(lit(0.0))
      a.select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(zval, 6).as("z"), (abs(zval) > 1.96).as("significant"))
    },

    // --- new vs returning daily actives (growth accounting) -------------
    // The first split every growth dashboard makes: each day's active
    // users divided by whether the day is their FIRST-SEEN day. One
    // pass to per-user first dates (a min-aggregate — no window over
    // the event stream), one distinct-actives pass, an equi-join on
    // user_id, and a calendar-bounded rollup. Integer ppm share.
    Q(
      "q_new_vs_returning",
      """WITH au AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fs AS (SELECT user_id, MIN(d) AS first_d FROM au GROUP BY user_id)
        |SELECT d,
        |  CAST(SUM(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  CAST(SUM(CASE WHEN d > first_d THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_users,
        |  CAST(SUM(CASE WHEN d = first_d THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS new_share_ppm
        |FROM au JOIN fs USING (user_id)
        |GROUP BY d
        |ORDER BY d NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val au = Tables.events(s, d)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(to_date(col("ts")).as("d"), col("user_id"))
        .distinct()
      val fs = au.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
      au.join(fs, Seq("user_id"))
        .groupBy(col("d"))
        .agg(
          sum(when(col("d") === col("first_d"), 1).otherwise(0))
            .cast("long").as("new_users"),
          sum(when(col("d") > col("first_d"), 1).otherwise(0))
            .cast("long").as("returning_users"),
          expr("CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) " +
            "* 1000000 div count(1) AS BIGINT)").as("new_share_ppm"))
        .orderBy(col("d"))
    },

    // --- day-of-week seasonality (lagged autocorrelation) ---------------
    // Does volume repeat on a weekly cycle? Pearson r between the daily
    // rollup and its 7-day lag, with the 1-day lag as the contrast row
    // (strong lag-7 + weak lag-1 = weekly seasonality; both strong =
    // trend). Counts are integers, so every moment sum is EXACT in
    // BIGINT — the r is a handful of deterministic double ops, no
    // streaming co-moments. All on the O(days) rollup: the distributed
    // work is one per-day count, the rest is calendar-bounded.
    Q(
      "q_weekly_seasonality",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY d),
        |p1 AS (SELECT b.n AS x, a.n AS y FROM daily a
        |       JOIN daily b ON b.d = a.d - 1),
        |p7 AS (SELECT b.n AS x, a.n AS y FROM daily a
        |       JOIN daily b ON b.d = a.d - 7),
        |m1 AS (SELECT COUNT(*) AS np, SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |       FROM p1),
        |m7 AS (SELECT COUNT(*) AS np, SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |       FROM p7)
        |SELECT lag, n_pairs,
        |  ROUND((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (SQRT(CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |       * SQRT(CAST(np AS DOUBLE) * syy
        |              - CAST(sy AS DOUBLE) * sy)), 6) AS corr
        |FROM (
        |  SELECT CAST(1 AS BIGINT) AS lag, CAST(np AS BIGINT) AS n_pairs,
        |    np, sx, sy, sxx, syy, sxy FROM m1
        |  UNION ALL
        |  SELECT 7, CAST(np AS BIGINT), np, sx, sy, sxx, syy, sxy FROM m7)
        |ORDER BY lag NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      def moments(lag: Int) = daily.as("a")
        .join(daily.as("b"), col("b.d") === date_sub(col("a.d"), lag))
        .select(col("b.n").as("x"), col("a.n").as("y"))
        .agg(count(lit(1)).as("np"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("lag", lit(lag.toLong))
      def dd(n: String) = col(n).cast("double")
      moments(1).unionByName(moments(7))
        .select(col("lag"), col("np").cast("long").as("n_pairs"),
          round((dd("np") * col("sxy") - dd("sx") * col("sy")) /
            (sqrt(dd("np") * col("sxx") - dd("sx") * col("sx")) *
              sqrt(dd("np") * col("syy") - dd("sy") * col("sy"))), 6)
            .as("corr"))
        .orderBy(col("lag"))
    },

    // --- market-basket association rules (support/confidence/lift) ------
    // The retail classic over the order→parts incidence: pair support
    // from a within-order self-join (fanout C(items,2) per order —
    // bounded by basket size, never corpus²), per-part order frequencies,
    // and the rule metrics as exact-integer ratios in ppm plus one
    // deterministic double (lift). Complements the co-purchase GRAPH
    // queries (PageRank/components/triangles) with the RULE view —
    // directional confidence is what a recommender actually thresholds.
    // Min-support floor keeps accidental pairs out of the ranking.
    Q(
      "q_basket_rules",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
        |pc AS (SELECT l_partkey, COUNT(*) AS c FROM op GROUP BY l_partkey),
        |pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |         COUNT(*) AS c_ab
        |       FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
        |         AND a.l_partkey < b.l_partkey
        |       GROUP BY part_a, part_b)
        |SELECT part_a, part_b, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(c_ab * 1000000 // ca.c AS BIGINT) AS conf_ab_ppm,
        |  CAST(c_ab * 1000000 // cb.c AS BIGINT) AS conf_ba_ppm,
        |  ROUND((CAST(c_ab AS DOUBLE) * n_orders)
        |    / (CAST(ca.c AS DOUBLE) * cb.c), 6) AS lift
        |FROM pr JOIN pc ca ON ca.l_partkey = part_a
        |        JOIN pc cb ON cb.l_partkey = part_b
        |        CROSS JOIN n
        |WHERE c_ab >= 3
        |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin
    ) { (s, d) =>
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val n = op.agg(count_distinct(col("l_orderkey")).as("n_orders"))
      val pc = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val pr = op.as("a").join(op.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 3)
      pr.join(pc.select(col("l_partkey").as("part_a"), col("c").as("ca")),
          Seq("part_a"))
        .join(pc.select(col("l_partkey").as("part_b"), col("c").as("cb")),
          Seq("part_b"))
        .crossJoin(broadcast(n))
        .select(col("part_a"), col("part_b"), col("c_ab"),
          expr("c_ab * 1000000 div ca").cast("long").as("conf_ab_ppm"),
          expr("c_ab * 1000000 div cb").cast("long").as("conf_ba_ppm"),
          round((col("c_ab").cast("double") * col("n_orders"))
            / (col("ca").cast("double") * col("cb")), 6).as("lift"))
        .orderBy(col("lift").desc, col("part_a"), col("part_b"))
        .limit(20)
    },

    // --- CUPED variance-reduced experiment readout ----------------------
    // The adjustment every mature experimentation platform applies
    // (Deng et al., WSDM'13): regress each user's post-period metric on
    // their PRE-period metric (θ = cov/var over all users) and report
    // arm means of y − θ(x − x̄) — same expectation, strictly less
    // variance, tighter A/B readouts at the same traffic. Everything up
    // to θ is DECIMAL-exact moment algebra (per-user sums, then global
    // and per-arm moment sums — never a float accumulation over users:
    // the adjusted arm mean is computed algebraically as
    // (Sy − θ(Sx − n·x̄))/n from exact sums, so no order-dependent
    // Σ of per-user doubles exists anywhere). One scan to per-user
    // aggregates, one reduce each for global/per-arm moments.
    Q(
      "q_ab_cuped", {
        val h = graft.functions.TextOps.md5Low60Sql(
          "CAST(user_id AS VARCHAR)")
        """WITH u AS (SELECT user_id, HASHARM % 2 AS arm,
          |    SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
          |      THEN CAST(value AS DECIMAL(18,2))
          |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS pre,
          |    SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
          |      THEN CAST(value AS DECIMAL(18,2))
          |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS post
          |  FROM events WHERE user_id IS NOT NULL
          |  GROUP BY user_id, arm),
          |g AS (SELECT COUNT(*) AS n,
          |    SUM(CAST(pre AS DECIMAL(19,2))) AS sx,
          |    SUM(CAST(post AS DECIMAL(19,2))) AS sy,
          |    SUM(CAST(pre AS DECIMAL(19,2)) * CAST(pre AS DECIMAL(19,2)))
          |      AS sxx,
          |    SUM(CAST(pre AS DECIMAL(19,2)) * CAST(post AS DECIMAL(19,2)))
          |      AS sxy
          |  FROM u),
          |th AS (SELECT n, CAST(sx AS DOUBLE) / n AS xbar,
          |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
          |  FROM g),
          |a AS (SELECT arm, COUNT(*) AS n_arm,
          |    SUM(CAST(pre AS DECIMAL(19,2))) AS sxa,
          |    SUM(CAST(post AS DECIMAL(19,2))) AS sya
          |  FROM u GROUP BY arm)
          |SELECT CAST(arm AS BIGINT) AS arm,
          |  CAST(n_arm AS BIGINT) AS n_users,
          |  ROUND(CAST(sya AS DOUBLE) / n_arm, 6) AS mean_post,
          |  ROUND(theta, 6) AS theta,
          |  ROUND((CAST(sya AS DOUBLE)
          |    - theta * (CAST(sxa AS DOUBLE)
          |      - CAST(n_arm AS DOUBLE) * xbar)) / n_arm, 6) AS mean_adj
          |FROM a CROSS JOIN th
          |ORDER BY arm NULLS FIRST""".stripMargin
          .replace("HASHARM", h)
      }
    ) { (s, d) =>
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
      val split = to_date(col("ts")) < lit("2024-01-16").cast("date")
      val u = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .groupBy(col("user_id"),
          (graft.functions.TextOps.md5Low60(col("user_id").cast("string"))
            % 2).as("arm"))
        .agg(
          sum(when(split, dec(col("value"))).otherwise(dec(lit(0))))
            .as("pre0"),
          sum(when(!split, dec(col("value"))).otherwise(dec(lit(0))))
            .as("post0"))
        .select(col("arm"), dec(col("pre0")).as("pre"),
          dec(col("post0")).as("post"))
      val g = u.agg(count(lit(1)).as("n"),
        sum(col("pre")).as("sx"), sum(col("post")).as("sy"),
        sum(col("pre") * col("pre")).as("sxx"),
        sum(col("pre") * col("post")).as("sxy"))
      def dd(c: String) = col(c).cast("double")
      val th = g.select(col("n"), (dd("sx") / col("n")).as("xbar"),
        ((dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
          (dd("n") * dd("sxx") - dd("sx") * dd("sx"))).as("theta"))
      val a = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_arm"),
          sum(col("pre")).as("sxa"), sum(col("post")).as("sya"))
      a.crossJoin(broadcast(th))
        .select(col("arm").cast("long").as("arm"),
          col("n_arm").as("n_users"),
          round(dd("sya") / col("n_arm"), 6).as("mean_post"),
          round(col("theta"), 6).as("theta"),
          round((dd("sya") - col("theta") *
            (dd("sxa") - dd("n_arm") * col("xbar"))) / col("n_arm"), 6)
            .as("mean_adj"))
        .orderBy(col("arm"))
    },

    // --- one-pass Pearson correlation matrix ----------------------------
    // All 6 pairwise correlations of the 4 lineitem measures from ONE
    // scan and ONE reduce: the agg computes the full moment matrix
    // (n, Σx, Σx², Σxy — 15 aggregates) and every r falls out of the
    // single result row as driver-free arithmetic. The naive form — six
    // corr() calls or six self-joins — re-scans the fact table per pair;
    // at 100 TB the moment matrix IS the only affordable shape, and it
    // extends to p columns at O(p²) agg state, still one scan. Engines'
    // built-in corr() is streaming-co-moment (merge-order-dependent
    // floats) so it can never hash-match; the moment sums here are
    // DECIMAL-exact (2-decimal inputs cast to DECIMAL(18,4) — products
    // and sums stay rational-exact), making the final double arithmetic
    // bit-identical in both engines.
    {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = cols.combinations(2).map(p => (p(0), p(1))).toSeq
      // width 19 (not 18): DuckDB stores width<=18 decimals in int64 and
      // its product overflows int64 for 1e5-scale inputs; 19 forces
      // int128 arithmetic. Still rational-exact, so parity with Spark's
      // decimal(18,4) path is unaffected.
      def decS(c: String) = s"CAST($c AS DECIMAL(19,4))"
      def corrS(a: String, b: String): String = {
        def dd(n: String) = s"CAST($n AS DOUBLE)"
        s"""ROUND((${dd("n")} * ${dd(s"sp_${a}_$b")}
           |      - ${dd(s"s_$a")} * ${dd(s"s_$b")})
           |    / (SQRT(${dd("n")} * ${dd(s"ss_$a")}
           |            - ${dd(s"s_$a")} * ${dd(s"s_$a")})
           |       * SQRT(${dd("n")} * ${dd(s"ss_$b")}
           |              - ${dd(s"s_$b")} * ${dd(s"s_$b")})), 6)""".stripMargin
      }
      val momentsS =
        (cols.flatMap(c => Seq(
          s"SUM(${decS(c)}) AS s_$c",
          s"SUM(${decS(c)} * ${decS(c)}) AS ss_$c")) ++
          pairs.map { case (a, b) =>
            s"SUM(${decS(a)} * ${decS(b)}) AS sp_${a}_$b" })
          .mkString(",\n    ")
      val legsS = pairs.map { case (a, b) =>
        s"SELECT '$a' AS col_x, '$b' AS col_y, ${corrS(a, b)} AS r FROM m"
      }.mkString("\nUNION ALL\n")
      Q(
        "q_corr_matrix",
        s"""WITH m AS (SELECT COUNT(*) AS n,
           |    $momentsS
           |  FROM lineitem)
           |$legsS
           |ORDER BY col_x NULLS FIRST, col_y NULLS FIRST""".stripMargin
      ) { (s, d) =>
        def dec(c: String) = col(c).cast("decimal(18,4)")
        val aggs = Seq(count(lit(1)).as("n")) ++
          cols.flatMap(c => Seq(
            sum(dec(c)).as(s"s_$c"),
            sum(dec(c) * dec(c)).as(s"ss_$c"))) ++
          pairs.map { case (a, b) =>
            sum(dec(a) * dec(b)).as(s"sp_${a}_$b") }
        def dd(n: String) = col(n).cast("double")
        def corr(a: String, b: String) =
          round((dd("n") * dd(s"sp_${a}_$b") - dd(s"s_$a") * dd(s"s_$b")) /
            (sqrt(dd("n") * dd(s"ss_$a") - dd(s"s_$a") * dd(s"s_$a")) *
              sqrt(dd("n") * dd(s"ss_$b") - dd(s"s_$b") * dd(s"s_$b"))), 6)
        Tables.lineitem(s, d)
          .agg(aggs.head, aggs.tail: _*)
          .select(explode(array(pairs.map { case (a, b) =>
            struct(lit(a).as("col_x"), lit(b).as("col_y"),
              corr(a, b).as("r"))
          }: _*)).as("p"))
          .select(col("p.col_x").as("col_x"), col("p.col_y").as("col_y"),
            col("p.r").as("r"))
          .orderBy(col("col_x"), col("col_y"))
      }
    },

    // --- automation/bot screening metrics per user -----------------------
    // The abuse screen a clickstream runs before analytics trust the
    // traffic: per user the event volume, the burstiest minute (max
    // events in any single minute bucket), and the gap-regularity
    // signal (count of DISTINCT inter-event gaps in exact seconds — a
    // metronome scripts to 1). Flags: burst ≥ 5/min, or ≥ 5 events all
    // at one fixed cadence. Everything is hash aggregates keyed by
    // user (+minute/+bucket); the flags are booleans the oracle
    // re-derives. The gap signal is HOT-KEY-PROOF by construction: a
    // per-user lag window would put a bot-heavy user's ENTIRE history
    // in one task (the exact population this query screens for — the
    // round-11 ×100 skew tier measured it at 1.68× of uniform, and
    // WORSE under the AQE knobs that heal every join, because the
    // straggler is the window, not the shuffle). Instead gaps are
    // computed per (user, hour-bucket) — lag inside the bucket — and
    // each bucket's FIRST row takes its predecessor timestamp from the
    // closest earlier non-empty bucket's last timestamp, carried by a
    // per-user lag over BUCKET AGGREGATES (rows bounded by the time
    // range / 3600, never by a user's event count) and stitched back
    // with one (user, bucket) equi-join — the SlidingMin two-bucket
    // discipline. bucket = ts div 3600 is monotone in ts, so "previous
    // event" is always same-bucket or closest-earlier-bucket-last.
    Q(
      "q_bot_screen",
      """WITH e AS (SELECT user_id,
        |    epoch_us(date_trunc('second', ts)) // 1000000 AS ts_s,
        |    event_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT user_id, CAST(MAX(c) AS BIGINT) AS max_per_minute
        |  FROM (SELECT user_id, ts_s // 60 AS minute, COUNT(*) AS c
        |        FROM e GROUP BY user_id, minute)
        |  GROUP BY user_id),
        |g AS (SELECT user_id,
        |    ts_s - lag(ts_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS gap
        |  FROM e),
        |u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT gap) AS BIGINT) AS distinct_gaps
        |  FROM g GROUP BY user_id)
        |SELECT u.user_id AS user_id, n_events, max_per_minute,
        |  distinct_gaps,
        |  (max_per_minute >= 5) AS burst_flag,
        |  (n_events >= 5 AND distinct_gaps = 1) AS metronome_flag
        |FROM u JOIN m ON u.user_id = m.user_id
        |ORDER BY user_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts").cast("long").as("ts_s"),
          col("event_id"))
      val m = e.groupBy(col("user_id"),
          expr("ts_s div 60").as("minute"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(max(col("c")).cast("long").as("max_per_minute"))
      val eb = e.withColumn("__bkt", expr("ts_s div 3600"))
      val wIn = Window.partitionBy(col("user_id"), col("__bkt"))
        .orderBy(col("ts_s"), col("event_id"))
      val inBkt = eb.withColumn("__prev", lag(col("ts_s"), 1).over(wIn))
      val wB = Window.partitionBy(col("user_id")).orderBy(col("__bkt"))
      val carry = eb.groupBy(col("user_id"), col("__bkt"))
        .agg(max(col("ts_s")).as("__last"))
        .withColumn("__carry", lag(col("__last"), 1).over(wB))
        .select(col("user_id"), col("__bkt"), col("__carry"))
      val u = inBkt.join(carry, Seq("user_id", "__bkt"))
        // a user's very first event has neither an in-bucket
        // predecessor nor a carried one → NULL gap, excluded by
        // COUNT(DISTINCT) exactly as the single-window form excluded it
        .withColumn("gap",
          col("ts_s") - coalesce(col("__prev"), col("__carry")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("gap")).as("distinct_gaps"))
      u.join(m, Seq("user_id"))
        .select(col("user_id"), col("n_events"), col("max_per_minute"),
          col("distinct_gaps"),
          (col("max_per_minute") >= 5).as("burst_flag"),
          (col("n_events") >= 5 && col("distinct_gaps") === 1)
            .as("metronome_flag"))
        .orderBy(col("user_id"))
    },

    // --- sample-ratio-mismatch check on the experiment arms --------------
    // The FIRST gate any experiment readout must pass: a 50/50
    // assignment whose realized arm sizes differ beyond chance means
    // the bucketing (or logging) is broken and every downstream metric
    // is suspect. One-df chi-square against the even split reduces to
    // (n0−n1)²/(n0+n1) — exact integer counts, one IEEE division,
    // flagged at the 0.05 critical value 3.841459.
    Q(
      "q_ab_srm",
      s"""WITH u AS (SELECT user_id,
         |    ${graft.functions.TextOps.md5Low60Sql("CAST(user_id AS VARCHAR)")} % 2 AS arm
         |  FROM events WHERE user_id IS NOT NULL
         |  GROUP BY user_id, arm),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |  FROM u)
         |SELECT n0, n1,
         |  ROUND(CASE WHEN n0 + n1 > 0 THEN
         |      CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
         |    ELSE CAST(0 AS DOUBLE) END, 6) AS chi2,
         |  CASE WHEN n0 + n1 > 0 THEN
         |    CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
         |      > 3.841459
         |  ELSE FALSE END AS srm_flag
         |FROM a""".stripMargin
    ) { (s, d) =>
      val a = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .groupBy(col("user_id"),
          (graft.functions.TextOps.md5Low60(col("user_id").cast("string"))
            % 2).as("arm"))
        .agg(count(lit(1)).as("_n"))
        .agg(
          sum(when(col("arm") === 0, 1).otherwise(0)).cast("long").as("n0"),
          sum(when(col("arm") === 1, 1).otherwise(0)).cast("long").as("n1"))
      val chi2sql = expr(
        "CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)")
      val ok = col("n0") + col("n1") > 0
      a.select(col("n0"), col("n1"),
        round(when(ok, chi2sql).otherwise(lit(0.0)), 6).as("chi2"),
        when(ok, chi2sql > 3.841459).otherwise(lit(false)).as("srm_flag"))
    },

    // --- experiment power: required sample + days to reach it ------------
    // The planning readout beside q_funnel_sig's verdict: with the
    // pooled high-value conversion rate p̂, the per-arm sample for 80%
    // power at α=.05 on a 10% relative lift is n* = 7.849·2·p̂(1−p̂)/(0.1p̂)²,
    // and the runway is n*·2 over the average daily active users —
    // CEILed in exact integer arithmetic. All inputs are exact counts;
    // the n* chain is one fixed IEEE sequence both engines share.
    Q(
      "q_ab_power_duration",
      """WITH u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' AND value > 300
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY user_id),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(conv) AS BIGINT) AS converters FROM u),
        |au AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |act AS (SELECT CAST(COUNT(*) AS BIGINT) AS user_days,
        |    CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days FROM au),
        |m AS (SELECT n_users, converters, user_days, n_days,
        |    CASE WHEN converters > 0 AND converters < n_users THEN
        |      CAST(CEIL(7.849 * 2
        |          * (CAST(converters AS DOUBLE) / n_users)
        |          * (1 - CAST(converters AS DOUBLE) / n_users)
        |          / ((0.1 * (CAST(converters AS DOUBLE) / n_users))
        |             * (0.1 * (CAST(converters AS DOUBLE) / n_users))))
        |        AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS n_star
        |  FROM c, act)
        |SELECT n_users, converters,
        |  CAST(converters * 1000000 // n_users AS BIGINT) AS conv_ppm,
        |  n_star AS n_star_per_arm,
        |  CAST(user_days // n_days AS BIGINT) AS avg_daily_users,
        |  CAST(CASE WHEN user_days // n_days > 0
        |    THEN (2 * n_star + user_days // n_days - 1)
        |         // (user_days // n_days)
        |    ELSE 0 END AS BIGINT) AS days_needed
        |FROM m""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d).where(col("user_id").isNotNull)
      val c = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase"
          && col("value") > 300, 1).otherwise(0)).as("conv"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("conv")).cast("long").as("converters"))
      val act = ev.where(col("ts").isNotNull)
        .select(col("ts").cast("date").as("d"), col("user_id")).distinct()
        .agg(count(lit(1)).as("user_days"),
          countDistinct(col("d")).as("n_days"))
      val p = col("converters").cast("double") / col("n_users")
      val nStar = when(
        col("converters") > 0 && col("converters") < col("n_users"),
        ceil(lit(7.849) * 2 * p * (lit(1) - p) /
          ((lit(0.1) * p) * (lit(0.1) * p))).cast("long"))
        .otherwise(lit(0L))
      c.crossJoin(broadcast(act))
        .withColumn("n_star", nStar)
        .withColumn("daily", expr("user_days div n_days"))
        .select(col("n_users"), col("converters"),
          expr("CAST(converters * 1000000 div n_users AS BIGINT)")
            .as("conv_ppm"),
          col("n_star").as("n_star_per_arm"),
          col("daily").cast("long").as("avg_daily_users"),
          when(col("daily") > 0,
            expr("(2 * n_star + daily - 1) div daily"))
            .otherwise(lit(0L)).cast("long").as("days_needed"))
    },

    // --- largest-remainder apportionment ----------------------------------
    // The exact-integer allocation operator (budget/seat apportionment,
    // Hamilton's method): split a fixed budget of 1,000,000 units across
    // nations proportional to revenue so the parts SUM EXACTLY to the
    // budget — naive rounding drifts by ±n. floor share =
    // budget·rev div total (128-bit product); the leftover
    // (≤ nations−1) goes one unit each to the largest fractional
    // remainders (budget·rev mod total, tiebreak n_name). The remainder
    // rank is a window over the 25-row nation rollup — bounded by the
    // enum, like q_chisq's grid; the corpus-scale work is the one
    // revenue aggregate.
    Q(
      "q_largest_remainder_apportion",
      """WITH rev AS (SELECT n_name,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      ) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name),
        |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev),
        |fl AS (SELECT n_name, cents,
        |    CAST(CAST(1000000 AS HUGEINT) * cents // total AS BIGINT)
        |      AS floor_units,
        |    CAST(CAST(1000000 AS HUGEINT) * cents % total AS BIGINT)
        |      AS rem
        |  FROM rev, t),
        |lo AS (SELECT CAST(1000000 - SUM(floor_units) AS BIGINT)
        |    AS leftover FROM fl),
        |rk AS (SELECT n_name, cents, floor_units,
        |    CAST(row_number() OVER (ORDER BY rem DESC, n_name) AS BIGINT)
        |      AS r
        |  FROM fl)
        |SELECT n_name, cents, floor_units,
        |  CAST(floor_units + CASE WHEN r <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc_units
        |FROM rk, lo
        |ORDER BY n_name NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      val t = rev.agg(sum(col("cents")).cast("long").as("total"))
      val fl = rev.crossJoin(broadcast(t))
        .select(col("n_name"), col("cents"),
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cents div total " +
            "AS BIGINT)").as("floor_units"),
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cents % total " +
            "AS BIGINT)").as("rem"))
      val lo = fl.agg((lit(1000000L) - sum(col("floor_units")))
        .cast("long").as("leftover"))
      fl.withColumn("r", row_number()
          .over(Window.orderBy(col("rem").desc, col("n_name"))).cast("long"))
        .crossJoin(broadcast(lo))
        .select(col("n_name"), col("cents"), col("floor_units"),
          (col("floor_units")
            + when(col("r") <= col("leftover"), 1L).otherwise(0L))
            .cast("long").as("alloc_units"))
        .orderBy(col("n_name"))
    },

    // --- Pettitt changepoint test (rank-based, exact) ---------------------
    // The nonparametric companion to ref_changepoint_cusum: CUSUM needs
    // a level estimate; Pettitt's U_t = Σ_{i≤t} Σ_{j>t} sign(x_j − x_i)
    // is distribution-free and all-integer. Computed on the daily volume
    // series — the O(days²) pair frame rides the calendar-bounded spine
    // (ref_theil_sen_trend's justified shape; 365 days = 66k pairs at
    // ANY corpus size), while the corpus-scale work is the one per-day
    // count. Output: the t maximizing |U_t| (first such t on ties) and
    // the K statistic.
    Q(
      "q_pettitt_changepoint",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL GROUP BY day),
        |u AS (SELECT a.day AS t,
        |    CAST(SUM(CASE WHEN b.x > a2.x THEN 1
        |             WHEN b.x < a2.x THEN -1 ELSE 0 END) AS BIGINT) AS ut
        |  FROM daily a JOIN daily a2 ON a2.day <= a.day
        |       JOIN daily b ON b.day > a.day
        |  GROUP BY a.day)
        |SELECT t AS change_day, ut AS u_stat,
        |  CAST(ABS(ut) AS BIGINT) AS k_stat
        |FROM u
        |ORDER BY ABS(ut) DESC, t LIMIT 1""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val u = daily.as("a")
        .join(daily.as("a2"), col("a2.day") <= col("a.day"))
        .join(daily.as("b"), col("b.day") > col("a.day"))
        .groupBy(col("a.day").as("t"))
        .agg(sum(when(col("b.x") > col("a2.x"), 1L)
          .when(col("b.x") < col("a2.x"), -1L).otherwise(0L))
          .cast("long").as("ut"))
      u.select(col("t").as("change_day"), col("ut").as("u_stat"),
          abs(col("ut")).cast("long").as("k_stat"))
        .orderBy(abs(col("ut")).desc, col("t"))
        .limit(1)
    },

    // --- rank correlation: Spearman rho + Kendall tau ---------------------
    // Are busier days richer days? Monotone association between daily
    // order count and daily revenue, measured twice: Spearman's rho via
    // the classic 1 − 6Σd²/(n(n²−1)) on tiebroken permutation ranks
    // (rank by (metric, day) — a TOTAL order, so the formula's
    // distinct-rank precondition holds and the result is exactly
    // rational), and Kendall's tau-a as sign-summed concordance over the
    // day-pair join. Everything integer: ranks from single-partition
    // windows over the ≤days-sized daily rollup (the
    // ref_deseasonalized_daily precedent), the pair join is days² — a
    // calendar-bounded self-join (the Pettitt precedent), NOT data-scale.
    // Both engines truncate integer division toward zero, so the
    // possibly-negative ppm quotients agree exactly.
    Q(
      "q_rank_correlation",
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY day),
        |r AS (SELECT day, n, cents,
        |    CAST(row_number() OVER (ORDER BY n, day) AS BIGINT) AS rx,
        |    CAST(row_number() OVER (ORDER BY cents, day) AS BIGINT) AS ry
        |  FROM daily),
        |sp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sd2
        |  FROM r),
        |kd AS (SELECT CAST(SUM(CASE
        |      WHEN (b.n - a.n) * (b.cents - a.cents) > 0 THEN 1
        |      WHEN (b.n - a.n) * (b.cents - a.cents) < 0 THEN -1
        |      ELSE 0 END) AS BIGINT) AS s_kendall
        |  FROM daily a JOIN daily b ON a.day < b.day)
        |SELECT n_days, sd2,
        |  CAST((1000000 * (n_days * (n_days * n_days - 1)) - 6000000 * sd2)
        |    // (n_days * (n_days * n_days - 1)) AS BIGINT) AS spearman_ppm,
        |  s_kendall,
        |  CAST(2000000 * s_kendall // (n_days * (n_days - 1)) AS BIGINT)
        |    AS kendall_ppm
        |FROM sp, kd ORDER BY n_days""".stripMargin
    ) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
      val wx = Window.orderBy(col("n"), col("day"))
      val wy = Window.orderBy(col("cents"), col("day"))
      val r = daily
        .withColumn("rx", row_number().over(wx).cast("long"))
        .withColumn("ry", row_number().over(wy).cast("long"))
      val sp = r.agg(count(lit(1)).cast("long").as("n_days"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry")))
          .cast("long").as("sd2"))
      val kd = daily.as("a")
        .join(daily.as("b"), col("a.day") < col("b.day"))
        .agg(sum(when(
            (col("b.n") - col("a.n")) * (col("b.cents") - col("a.cents"))
              > 0, 1L)
          .when((col("b.n") - col("a.n")) * (col("b.cents") - col("a.cents"))
              < 0, -1L)
          .otherwise(0L)).cast("long").as("s_kendall"))
      sp.crossJoin(kd)
        .select(col("n_days"), col("sd2"),
          expr("CAST((1000000 * (n_days * (n_days * n_days - 1))" +
            " - 6000000 * sd2)" +
            " div (n_days * (n_days * n_days - 1)) AS BIGINT)")
            .as("spearman_ppm"),
          col("s_kendall"),
          expr("CAST(2000000 * s_kendall div (n_days * (n_days - 1))" +
            " AS BIGINT)").as("kendall_ppm"))
        .orderBy(col("n_days"))
    },

    // --- forecast evaluation: MASE over a 7-day holdout -------------------
    // The eval half of the ref_holt_forecast family: score the two
    // standard reference forecasters — naive-1 (yesterday) and
    // seasonal-naive-7 (same weekday last week) — on the LAST 7 days of
    // the daily revenue series, scaled by the in-sample naive-1 MAE
    // (Hyndman's MASE: scale-free, zero-safe, no logs). mase_ppm < 1e6
    // means the model beats a random-walk carried out of sample.
    // Predictions are row-lags over the day-ordered spine (bounded
    // single-partition window, the deseasonalize precedent); the ratio
    // of rational means is computed exactly as one 128-bit integer
    // division (DECIMAL(38,0) ↔ HUGEINT — the clamped-balance
    // precedent), so cents × 1e6 × days can never wrap.
    Q(
      "q_forecast_mase",
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY day),
        |l AS (SELECT day, cents,
        |    lag(cents, 1) OVER (ORDER BY day) AS p1,
        |    lag(cents, 7) OVER (ORDER BY day) AS p7,
        |    row_number() OVER (ORDER BY day DESC) AS rd
        |  FROM daily),
        |g AS (SELECT
        |    CAST(SUM(CASE WHEN rd > 7 AND p1 IS NOT NULL
        |      THEN ABS(cents - p1) ELSE 0 END) AS BIGINT) AS sum_in,
        |    CAST(SUM(CASE WHEN rd > 7 AND p1 IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
        |    CAST(SUM(CASE WHEN rd <= 7 THEN ABS(cents - p1) ELSE 0 END)
        |      AS BIGINT) AS err1,
        |    CAST(SUM(CASE WHEN rd <= 7 THEN ABS(cents - p7) ELSE 0 END)
        |      AS BIGINT) AS err7,
        |    CAST(SUM(CASE WHEN rd <= 7 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_test
        |  FROM l)
        |SELECT model, n_test, err_cents,
        |  CAST(CAST(err_cents AS HUGEINT) * 1000000 * n_in
        |    // (CAST(n_test AS HUGEINT) * sum_in) AS BIGINT) AS mase_ppm
        |FROM (SELECT 'naive1' AS model, n_test, err1 AS err_cents,
        |        n_in, sum_in FROM g
        |      UNION ALL
        |      SELECT 'snaive7', n_test, err7, n_in, sum_in FROM g)
        |ORDER BY model""".stripMargin
    ) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      val w = Window.orderBy(col("day"))
      val wd = Window.orderBy(col("day").desc)
      val l = daily
        .withColumn("p1", lag(col("cents"), 1).over(w))
        .withColumn("p7", lag(col("cents"), 7).over(w))
        .withColumn("rd", row_number().over(wd))
      val g = l.agg(
        sum(when(col("rd") > 7 && col("p1").isNotNull,
          abs(col("cents") - col("p1"))).otherwise(0L))
          .cast("long").as("sum_in"),
        sum(when(col("rd") > 7 && col("p1").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_in"),
        sum(when(col("rd") <= 7, abs(col("cents") - col("p1")))
          .otherwise(0L)).cast("long").as("err1"),
        sum(when(col("rd") <= 7, abs(col("cents") - col("p7")))
          .otherwise(0L)).cast("long").as("err7"),
        sum(when(col("rd") <= 7, 1L).otherwise(0L)).cast("long")
          .as("n_test"))
      g.select(explode(array(
          struct(lit("naive1").as("model"), col("n_test"),
            col("err1").as("err_cents"), col("n_in"), col("sum_in")),
          struct(lit("snaive7").as("model"), col("n_test"),
            col("err7").as("err_cents"), col("n_in"), col("sum_in"))))
          .as("e"))
        .select(col("e.model").as("model"), col("e.n_test").as("n_test"),
          col("e.err_cents").as("err_cents"),
          expr("CAST(CAST(e.err_cents AS DECIMAL(38,0)) * 1000000" +
            " * e.n_in div (CAST(e.n_test AS DECIMAL(38,0)) * e.sum_in)" +
            " AS BIGINT)").as("mase_ppm"))
        .orderBy(col("model"))
    },

    // --- bootstrap confidence interval (deterministic resampling) ---------
    // Resampling inference with NO random state: rep b's draw d selects
    // day index md5(b:d) % n + 1 — the md5Low60 bridge both engines
    // share (the pipe_epoch_shuffle permutation), so every resample is
    // replayed bit-for-bit. B=30 full-size resamples of the daily
    // revenue series, each rep's statistic the exact integer mean of
    // its drawn days; the 90% percentile-method CI is the 2nd/29th
    // order statistic of the 30 rep means (bounded window over B rows).
    // The draw relation is reps × days (the day spine REUSED as the
    // draw index — no generator needed) joined back to values on the
    // drawn index: an equi-join on a hash-uniform key, B·days rows —
    // calendar-bounded, embarrassingly parallel, nothing data-scale
    // passes through a single partition.
    Q(
      "q_bootstrap_ci", {
        val h = graft.functions.TextOps.md5Low60Sql(
          "CAST(b.rep AS VARCHAR) || ':' || CAST(d.i AS VARCHAR)")
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
           |      AS BIGINT) AS cents
           |  FROM orders GROUP BY day),
           |idx AS (SELECT cents,
           |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
           |  FROM daily),
           |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM idx),
           |reps AS (SELECT CAST(unnest(range(1, 31)) AS BIGINT) AS rep),
           |draws AS (SELECT b.rep, $h % n.n_days + 1 AS pick
           |  FROM reps b, idx d, n),
           |rm AS (SELECT dr.rep,
           |    CAST(SUM(v.cents) // COUNT(*) AS BIGINT) AS mean_cents
           |  FROM draws dr JOIN idx v ON dr.pick = v.i
           |  GROUP BY dr.rep),
           |rk AS (SELECT mean_cents,
           |    row_number() OVER (ORDER BY mean_cents, rep) AS r
           |  FROM rm)
           |SELECT n.n_days, CAST(30 AS BIGINT) AS b_reps,
           |  CAST((SELECT SUM(cents) // COUNT(*) FROM idx) AS BIGINT)
           |    AS mean_cents,
           |  (SELECT mean_cents FROM rk WHERE r = 2) AS ci_lo_cents,
           |  (SELECT mean_cents FROM rk WHERE r = 29) AS ci_hi_cents
           |FROM n ORDER BY n_days""".stripMargin
      }
    ) { (s, d) =>
      import graft.functions.TextOps
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      val idx = daily
        .withColumn("i",
          row_number().over(Window.orderBy(col("day"))).cast("long"))
        .select(col("cents"), col("i"))
      val n = idx.agg(count(lit(1)).cast("long").as("n_days"))
      val reps = idx.sparkSession.range(1, 31)
        .select(col("id").as("rep"))
      val draws = reps.crossJoin(idx.select(col("i")))
        .crossJoin(broadcast(n))
        .select(col("rep"),
          (TextOps.md5Low60(concat(col("rep").cast("string"), lit(":"),
            col("i").cast("string"))) % col("n_days") + 1).as("pick"))
      val rm = draws.join(idx, col("pick") === col("i"))
        .groupBy(col("rep"))
        .agg(expr("CAST(sum(cents) div count(*) AS BIGINT)")
          .as("mean_cents"))
      val rk = rm.withColumn("r",
        row_number().over(Window.orderBy(col("mean_cents"), col("rep"))))
      val lo = rk.where(col("r") === 2)
        .select(col("mean_cents").as("ci_lo_cents"))
      val hi = rk.where(col("r") === 29)
        .select(col("mean_cents").as("ci_hi_cents"))
      val overall = idx.agg(
        expr("CAST(sum(cents) div count(*) AS BIGINT)").as("mean_cents"))
      n.withColumn("b_reps", lit(30L))
        .crossJoin(broadcast(overall))
        .crossJoin(broadcast(lo))
        .crossJoin(broadcast(hi))
        .orderBy(col("n_days"))
    },

    // --- Herfindahl–Hirschman supplier concentration ------------------------
    // Market-concentration audit per nation: each supplier's share of
    // the nation's discounted revenue in floor-ppm, HHI = Σ share² the
    // antitrust way (≈1e6/n when even, →1e12/1e6 = 1e6 under monopoly;
    // the same index the curation inventory uses for SOURCE
    // concentration screens — this is the relational form over the star
    // schema). Revenue is exact integer cents×(100−pct); nation totals
    // come back via a 25-row broadcast join, never a data-scale window;
    // shares and Σshare² stay under 2^63 by construction (Σshare ≤ 1e6
    // ⇒ Σshare² ≤ 1e12). At 100 TB the per-supplier rollup is the only
    // data-scale aggregate, keyed on l_suppkey — a map-side-combinable
    // hash shuffle. Revenue accumulates in DECIMAL(38,0)/HUGEINT so
    // year-scale fact tables can't overflow the cents·pct units.
    Q(
      "q_herfindahl_suppliers",
      """WITH r AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |          AS BIGINT)
        |        * (100 - CAST(CAST(l_discount AS DECIMAL(3,2)) * 100
        |            AS BIGINT)) AS HUGEINT)) AS HUGEINT) AS rev
        |  FROM lineitem GROUP BY l_suppkey),
        |j AS (SELECT n.n_name, r.l_suppkey, r.rev FROM r
        |  JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |t AS (SELECT n_name, CAST(SUM(rev) AS HUGEINT) AS tot
        |  FROM j GROUP BY n_name),
        |sh AS (SELECT j.n_name,
        |    CAST(j.rev * 1000000 // t.tot AS BIGINT) AS share_ppm
        |  FROM j JOIN t ON j.n_name = t.n_name)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |  CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
        |  CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm
        |FROM sh GROUP BY n_name
        |ORDER BY n_name NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val r = Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
            " AS BIGINT)").cast("decimal(19,0)") *
            expr("100 - CAST(CAST(l_discount AS DECIMAL(3,2)) * 100" +
              " AS BIGINT)")).as("rc"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("rc")).cast("decimal(38,0)").as("rev"))
      val j = r
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("rev"))
      val t = j.groupBy(col("n_name").as("tn"))
        .agg(sum(col("rev")).cast("decimal(38,0)").as("tot"))
      j.join(broadcast(t), col("n_name") === col("tn"))
        .select(col("n_name"),
          expr("CAST(rev * 1000000 div tot AS BIGINT)").as("share_ppm"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).cast("long").as("n_suppliers"),
          expr("CAST(sum(share_ppm * share_ppm) div 1000000 AS BIGINT)")
            .as("hhi_ppm"),
          max(col("share_ppm")).cast("long").as("top_share_ppm"))
        .orderBy(col("n_name"))
    },

    // --- weekly-seasonality strength of daily revenue -----------------------
    // Hyndman's seasonal-strength diagnostic, restated exactly: fit the
    // day-of-week means model (seasonal component s_dow = floor-mean of
    // the dow's daily cents — an integer-DEFINED statistic, the
    // ref_deseasonalized_daily convention), take residuals r = x − s_dow,
    // and report strength_ppm = max(0, 1e6 − SSR·1e6/SST) where SSR/SST
    // are the variance NUMERATORS N·Σv²−(Σv)² (the shared N² factor
    // cancels in the ratio, so no rational mean ever materializes — the
    // q_mann_whitney discipline). Squares accumulate in DECIMAL(38,0)/
    // HUGEINT so year-scale daily cents can't overflow. Everything
    // rides the calendar-bounded daily rollup: one data-scale hash
    // aggregate, then O(days) frames.
    Q(
      "q_seasonality_strength",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    dayofweek(ts) + 1 AS dow,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL AND event_type = 'purchase'
        |  GROUP BY d, dow),
        |sea AS (SELECT dow, CAST(SUM(x) // COUNT(*) AS BIGINT) AS s
        |  FROM daily GROUP BY dow),
        |r AS (SELECT daily.d, daily.x, daily.x - sea.s AS r
        |  FROM daily JOIN sea ON daily.dow = sea.dow),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) // COUNT(*) AS BIGINT) AS mean_daily_cents,
        |    CAST(COUNT(*) AS HUGEINT)
        |      * SUM(CAST(x AS HUGEINT) * x)
        |      - CAST(SUM(x) AS HUGEINT) * CAST(SUM(x) AS HUGEINT) AS sst,
        |    CAST(COUNT(*) AS HUGEINT)
        |      * SUM(CAST(r AS HUGEINT) * r)
        |      - CAST(SUM(r) AS HUGEINT) * CAST(SUM(r) AS HUGEINT) AS ssr
        |  FROM r)
        |SELECT n_days, mean_daily_cents,
        |  CAST(GREATEST(0, 1000000 - ssr * 1000000 // sst) AS BIGINT)
        |    AS strength_ppm
        |FROM m ORDER BY n_days""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .where(col("ts").isNotNull && col("event_type") === "purchase")
        .groupBy(col("ts").cast("date").as("d"),
          dayofweek(col("ts")).as("dow"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .cast("long").as("x"))
      val sea = daily.groupBy(col("dow").as("sdow"))
        .agg(expr("CAST(sum(x) div count(*) AS BIGINT)").as("s"))
      daily.join(broadcast(sea), col("dow") === col("sdow"))
        .select(col("x"), (col("x") - col("s")).as("r"))
        .agg(count(lit(1)).cast("long").as("n_days"),
          expr("CAST(sum(x) div count(*) AS BIGINT)")
            .as("mean_daily_cents"),
          (count(lit(1)).cast("decimal(38,0)") *
            sum(expr("CAST(x AS DECIMAL(19,0)) * x")) -
            sum(col("x")).cast("decimal(38,0)") *
            sum(col("x")).cast("decimal(38,0)")).as("sst"),
          (count(lit(1)).cast("decimal(38,0)") *
            sum(expr("CAST(r AS DECIMAL(19,0)) * r")) -
            sum(col("r")).cast("decimal(38,0)") *
            sum(col("r")).cast("decimal(38,0)")).as("ssr"))
        .select(col("n_days"), col("mean_daily_cents"),
          expr("CAST(GREATEST(0, 1000000 - ssr * 1000000 div sst)" +
            " AS BIGINT)").as("strength_ppm"))
        .orderBy(col("n_days"))
    },

    // --- weekly growth accounting (new / retained / resurrected / churned) --
    // The 5-state user-growth matrix (Social Capital's "growth
    // accounting"): per active week, every user is exactly one of NEW
    // (first active week), RETAINED (also active the previous week), or
    // RESURRECTED (active before, but not last week) — so n_active =
    // new + retained + resurrected by construction — plus CHURNED
    // (active last week, silent this week), reported against this
    // week's spine. q_new_vs_returning answers the 2-state daily
    // version; the lag states need the shifted self-join on
    // (user, week−7), which stays a hash equi-join on the distinct
    // (week, user) relation — two aggregates, two joins, nothing
    // data-scale beyond the initial distinct.
    Q(
      "q_growth_accounting",
      """WITH au AS (SELECT DISTINCT
        |    CAST(date_trunc('week', ts) AS DATE) AS wk, user_id AS u
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fs AS (SELECT u, MIN(wk) AS fw FROM au GROUP BY u),
        |prev AS (SELECT wk + 7 AS wk, u FROM au),
        |cls AS (SELECT a.wk,
        |    CASE WHEN a.wk = fs.fw THEN 'new'
        |         WHEN p.u IS NOT NULL THEN 'retained'
        |         ELSE 'resurrected' END AS st
        |  FROM au a JOIN fs ON a.u = fs.u
        |  LEFT JOIN prev p ON a.u = p.u AND a.wk = p.wk),
        |agg AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
        |    CAST(SUM(CASE WHEN st = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(SUM(CASE WHEN st = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN st = 'resurrected' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_resurrected
        |  FROM cls GROUP BY wk),
        |ch AS (SELECT p.wk, CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM prev p LEFT JOIN au a ON p.u = a.u AND p.wk = a.wk
        |  WHERE a.u IS NULL GROUP BY p.wk)
        |SELECT g.wk, g.n_active, g.n_new, g.n_retained,
        |  g.n_resurrected, COALESCE(ch.n_churned, 0) AS n_churned
        |FROM agg g LEFT JOIN ch ON g.wk = ch.wk
        |ORDER BY g.wk NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val au = Tables.events(s, d)
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(date_trunc("week", col("ts")).cast("date").as("wk"),
          col("user_id").as("u"))
        .distinct()
        .localCheckpoint() // au feeds three branches; one computation
      val fs = au.groupBy(col("u").as("fu")).agg(min(col("wk")).as("fw"))
      val prev = au.select(date_add(col("wk"), 7).as("pwk"),
        col("u").as("pu"))
      val cls = au
        .join(fs, col("u") === col("fu"))
        .join(prev, col("u") === col("pu") && col("wk") === col("pwk"),
          "left")
        .select(col("wk"),
          when(col("wk") === col("fw"), "new")
            .when(col("pu").isNotNull, "retained")
            .otherwise("resurrected").as("st"))
      val agg = cls.groupBy(col("wk"))
        .agg(count(lit(1)).cast("long").as("n_active"),
          sum(when(col("st") === "new", 1L).otherwise(0L)).cast("long")
            .as("n_new"),
          sum(when(col("st") === "retained", 1L).otherwise(0L))
            .cast("long").as("n_retained"),
          sum(when(col("st") === "resurrected", 1L).otherwise(0L))
            .cast("long").as("n_resurrected"))
      val ch = prev
        .join(au, col("pu") === col("u") && col("pwk") === col("wk"),
          "left_anti")
        .groupBy(col("pwk"))
        .agg(count(lit(1)).cast("long").as("n_churned"))
      agg.join(ch, col("wk") === col("pwk"), "left")
        .select(col("wk"), col("n_active"), col("n_new"),
          col("n_retained"), col("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy(col("wk"))
    }
  )
}
