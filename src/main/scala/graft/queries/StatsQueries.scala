package graft.queries

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

    // --- approximate quantiles (mergeable sketch) — rows-only ------------
    Q.noOracle("q_value_percentiles_approx") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(expr("percentile_approx(value, array(0.5, 0.9, 0.99), 10000)")
          .as("approx_quantiles"))
        .orderBy(col("event_type"))
    },

    // --- histogram binning via width_bucket ------------------------------
    Q(
      "q_value_histogram",
      // DuckDB 1.0 has no width_bucket; for in-range values it equals
      // floor((v-min)/width)+1 with the same double division, so the
      // oracle spells out the arithmetic (data range 0 < v < 500).
      """SELECT CAST(FLOOR(value / 25.0) + 1 AS BIGINT) AS bucket,
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

    // --- stratified sample: fixed fraction per event_type — rows-only ----
    // (seeded & deterministic per value, but the hash draw is
    // Spark-specific, so no cross-engine oracle)
    Q.noOracle("q_stratified_sample") { (s, d) =>
      val fractions = Map("click" -> 0.1, "view" -> 0.1,
        "purchase" -> 0.5, "signup" -> 0.5, "error" -> 0.02)
      Tables.events(s, d)
        .stat.sampleBy("event_type", fractions, seed = 42L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("sampled_n"))
        .orderBy(col("event_type"))
    }
  )
}
