package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Regression fixtures for the review-hardened degenerate shapes in
  * StatsQueries (commit "Harden edge cases flagged in review"):
  *
  *  - q_revenue_concentration on a corpus with ZERO purchase rows must
  *    return 0 rows (the oracle's final `FROM r, k` is an empty cross
  *    join), not NPE on the driver-side totals pull;
  *  - ref_kmv_set_algebra with an ABSENT event type must return exactly
  *    one row with a NULL estimate for the missing type (the oracle's
  *    scalar subqueries are total), not collapse to zero rows.
  *
  * These ran only against the full driver testdata before, where both
  * degenerate shapes never occur — so a regression would be invisible
  * until a correctness round with different data.
  */
class StatsEdgeCasesSpec extends SparkSpec {

  private def q(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
    StatsQueries.all.find(_.name == name).getOrElse(fail(s"no query $name")).run

  /** Write an events.parquet with the driver fixture's column set into a
    * fresh temp dir and return the dir (the loaders read `$dir/events.parquet`). */
  private def eventsDir(rows: Seq[(Long, String, java.lang.Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tmpDir("stats-edge")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "CAST(NULL AS STRING) AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_revenue_concentration: zero purchase rows -> 0 rows, no NPE") {
    val d = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 10L, "click", 1.0),
      (2L, "2024-01-01 00:01:00", 11L, "view", 2.0)))
    val out = q("q_revenue_concentration")(spark, d)
    assert(out.count() === 0L)
    assert(out.columns.toSeq ===
      Seq("n_users", "top_k", "total_cents", "top_cents", "top_share_ppm"))
  }

  test("q_revenue_concentration: all-zero-value purchases -> share 0, no div-by-zero") {
    val d = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 10L, "purchase", 0.0),
      (2L, "2024-01-01 00:01:00", 11L, "purchase", 0.0)))
    val r = q("q_revenue_concentration")(spark, d).head()
    assert(r.getAs[Long]("n_users") === 2L)
    assert(r.getAs[Long]("total_cents") === 0L)
    assert(r.getAs[Long]("top_share_ppm") === 0L)
  }

  test("ref_kmv_set_algebra: absent event type -> one total row with NULL estimate") {
    // clicks only, no views: per-type KMV frame has one group; the pivot
    // must still emit one row with est_view NULL (not zero rows).
    val d = eventsDir((1L to 40L).map(i =>
      (i, "2024-01-01 00:00:00", java.lang.Long.valueOf(i % 7), "click", 1.0)))
    val out = q("ref_kmv_set_algebra")(spark, d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(!r.isNullAt(r.fieldIndex("est_click")))
    assert(r.isNullAt(r.fieldIndex("est_view")))
  }

  test("ref_kmv_set_algebra: no qualifying rows at all -> still one row") {
    val d = eventsDir(Seq((1L, "2024-01-01 00:00:00", 10L, "signup", 1.0)))
    val out = q("ref_kmv_set_algebra")(spark, d).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("est_click")))
    assert(out.head.isNullAt(out.head.fieldIndex("est_view")))
  }

  test("q_value_percentiles_approx: tiny groups pass the rank-bound check") {
    // a 2-value group has NO data value inside interpolated p50±1% bounds
    // — the rank-space check must still pass (review finding, round 6)
    val d = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 10L, "click", 1.0),
      (2L, "2024-01-01 00:01:00", 11L, "click", 100.0),
      (3L, "2024-01-01 00:02:00", 12L, "view", 7.0)))
    val out = q("q_value_percentiles_approx")(spark, d).collect()
    assert(out.length === 2)
    out.foreach { r =>
      Seq("ok50", "ok90", "ok99").foreach(c =>
        assert(r.getAs[Boolean](c),
          s"$c false for ${r.getString(0)} on a tiny group"))
    }
  }

  test("q_hll_mergeable_total: zero qualifying rows -> within_tol TRUE, not NULL") {
    val d = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", null, "click", 1.0),
      (2L, "2024-01-01 00:01:00", null, "view", 2.0)))
    val r = q("q_hll_mergeable_total")(spark, d).head()
    assert(r.getAs[Long]("n_days") === 0L)
    assert(r.getAs[Long]("exact_total") === 0L)
    assert(!r.isNullAt(r.fieldIndex("within_tol")) &&
      r.getAs[Boolean]("within_tol"))
    // the per-day leg on the same fixture: zero groups on both sides
    assert(q("q_hll_daily_users")(spark, d).count() === 0L)
  }
}
