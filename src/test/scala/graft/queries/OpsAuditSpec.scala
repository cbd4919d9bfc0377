package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkSpec

/** Closed-form fixtures for the round-7 ops/audit additions — the claims
  * the value-replaying oracle can't state:
  *
  *  - dedup_edit_distance's RECALL CONTRACT (suffix edits caught, prefix
  *    edits structurally missed — the documented blocking trade-off);
  *  - q_item_cf's Jaccard on a hand-built co-purchase graph;
  *  - q_weighted_median_price's rank definition under skewed weights;
  *  - ref_k_anonymity on constructed sub-k cells;
  *  - q_asof_tolerance nulling ONLY the stale match (not falling back
  *    to an older in-window one — the pandas tolerance semantics);
  *  - q_ab_srm firing on a deliberately imbalanced assignment.
  */
class OpsAuditSpec extends SparkSpec {

  private def run(name: String, dir: String): DataFrame =
    graft.SparkEntry.inventory.find(_.name == name)
      .getOrElse(fail(s"no query $name")).run(spark, dir)

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = tmpDir("graft-opsaudit")
    rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_edit_distance: suffix edit caught, prefix edit missed") {
    val base = ("w " * 30).trim // 59 chars, well past the 40-char block key
    val d = docsDir(Seq(
      (1L, base, "en", "src0"),
      (2L, base + " extra tail", "en", "src0"),     // suffix edit: lev 11? no - " extra tail" = 11 chars -> lev 11 > 10
      (3L, base + " tail", "en", "src0"),           // suffix edit: lev 5 <= 10 -> caught
      (4L, "XX" + base.drop(2), "en", "src0"),      // prefix edit: lev 2 but block differs -> missed
      (5L, base, "fr", "src0")))                    // same text, other lang -> blocked by lang
    val out = run("dedup_edit_distance", d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,3): suffix edit within threshold; (2,3): " extra tail" vs
    // " tail" is distance 6 — also a true pair; (1,2) exceeds the
    // threshold 10; (1,4): prefix edit -> different block ->
    // structurally missed; (1,5): lang mismatch -> blocked.
    assert(out === Set((1L, 3L, 5L), (2L, 3L, 6L)))
  }

  test("q_item_cf: hand-built co-purchases give exact jaccard ppm") {
    import spark.implicits._
    val d = tmpDir("graft-itemcf")
    // parts 10,20 co-occur in orders 1,2,3 (and nowhere else):
    // n(10)=3, n(20)=4, co=3 -> jaccard = 3/4 -> 750000 ppm
    Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 20L), (4L, 30L),
      (5L, 30L))
      .toDF("l_orderkey", "l_partkey")
      .selectExpr("l_orderkey", "l_partkey", "1 AS l_linenumber",
        "CAST(1.0 AS DOUBLE) AS l_quantity",
        "CAST(1.0 AS DOUBLE) AS l_extendedprice",
        "CAST(0.0 AS DOUBLE) AS l_discount",
        "CAST(0.0 AS DOUBLE) AS l_tax",
        "'N' AS l_returnflag", "'O' AS l_linestatus",
        "CAST('2024-01-01' AS TIMESTAMP) AS l_shipdate",
        "CAST(1 AS BIGINT) AS l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = run("q_item_cf", d).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) ->
        r.getAs[Long]("jaccard_ppm")).toMap
    assert(out((10L, 20L)) === 750000L)
    assert(out((20L, 10L)) === 750000L)
    // co(20,30)=1 < support floor 2 -> absent
    assert(!out.contains((20L, 30L)))
  }

  test("q_weighted_median_price: heavy weight drags the median down") {
    import spark.implicits._
    val d = tmpDir("graft-wmed")
    // prices 1.00 (qty 10), 5.00 (qty 1), 9.00 (qty 1): totw=12,
    // 2*cumw at 100 cents = 20 >= 12 -> weighted median 100 cents
    // (unweighted median would be 500)
    Seq((1.00, 10.0), (5.00, 1.0), (9.00, 1.0))
      .toDF("l_extendedprice", "l_quantity")
      .selectExpr("CAST(1 AS BIGINT) AS l_orderkey",
        "CAST(1 AS BIGINT) AS l_partkey", "CAST(1 AS BIGINT) AS l_suppkey",
        "1 AS l_linenumber", "l_quantity", "l_extendedprice",
        "CAST(0.0 AS DOUBLE) AS l_discount", "CAST(0.0 AS DOUBLE) AS l_tax",
        "'N' AS l_returnflag", "'O' AS l_linestatus",
        "CAST('2024-01-01' AS TIMESTAMP) AS l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = run("q_weighted_median_price", d).head()
    assert(r.getAs[Long]("total_qty") === 12L)
    assert(r.getAs[Long]("wmedian_cents") === 100L)
  }

  private def eventsDir(rows: Seq[(Long, String, java.lang.Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tmpDir("graft-opsaudit-ev")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "CAST(NULL AS STRING) AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ref_k_anonymity: constructed sub-k cells are counted and sized") {
    // day 1: one cell of 6 (safe) + one cell of 2 (suppressed)
    val rows = (0 until 6).map { i =>
      ((i + 1).toLong, "2024-01-01 10:00:00", java.lang.Long.valueOf(1L),
        "view", 1.0)
    } ++ Seq(
      (10L, "2024-01-01 11:00:00", java.lang.Long.valueOf(1L), "click", 1.0),
      (11L, "2024-01-01 11:30:00", java.lang.Long.valueOf(1L), "click", 1.0))
    val r = run("ref_k_anonymity", eventsDir(rows.map {
      case (a, b, c, d2, e) => (a: Long, b, c, d2, e)
    })).head()
    assert(r.getAs[Long]("n_cells") === 2L)
    assert(r.getAs[Long]("small_cells") === 1L)
    assert(r.getAs[Long]("suppressed_rows") === 2L)
    assert(r.getAs[Long]("suppressed_ppm") === 250000L) // 2 of 8
  }

  test("q_asof_tolerance: stale best match is NULLED, not replaced") {
    val rows = Seq[(Long, String, java.lang.Long, String, Double)](
      // user 1: signup 20 days before purchase (stale), an even older
      // one 25 days before. tolerance must null BOTH (the best match is
      // stale; no fallback to the older one either).
      (1L, "2024-01-01 00:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-06 00:00:00", 1L, "signup", 0.0),
      (3L, "2024-01-26 00:00:00", 1L, "purchase", 10.0),
      // user 2: signup 2 days prior -> attributable
      (4L, "2024-01-10 00:00:00", 2L, "signup", 0.0),
      (5L, "2024-01-12 00:00:00", 2L, "purchase", 10.0))
    val out = run("q_asof_tolerance", eventsDir(rows)).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("signup_within_7d"), r.getAs[Boolean]("attributable")))
      .toMap
    assert(out(3L) === ((null, false)))
    assert(out(5L) === (("2024-01-10 00:00:00", true)))
  }

  test("q_ab_srm: deliberately imbalanced arms trip the flag") {
    import spark.implicits._
    // find users per arm via the production hash, load 12 vs 1
    val armed = (1L to 300L).toDF("user_id")
      .select(col("user_id"),
        (graft.functions.TextOps.md5Low60(col("user_id").cast("string")) % 2)
          .as("arm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a0 = armed.filter(_._2 == 0L).map(_._1).take(12)
    val a1 = armed.filter(_._2 == 1L).map(_._1).take(1)
    val rows = (a0 ++ a1).zipWithIndex.map { case (u, i) =>
      ((i + 1).toLong, "2024-01-01 00:00:00",
        java.lang.Long.valueOf(u), "view", 1.0)
    }
    val r = run("q_ab_srm", eventsDir(rows)).head()
    // chi2 = (12-1)^2 / 13 = 9.307 > 3.841
    assert(r.getAs[Long]("n0") === 12L)
    assert(r.getAs[Long]("n1") === 1L)
    assert(r.getAs[Boolean]("srm_flag"))
  }

  test("emb_lsh_occupancy: per-table sizes sum to the corpus") {
    val out = run("emb_lsh_occupancy", "/root/testdata/sf0.001").collect()
    assert(out.length === 16)
    val n = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    out.foreach { r =>
      assert(r.getAs[Long]("buckets_used") <= 64L)
      assert(r.getAs[Long]("max_bucket") <= n)
      // expected probe cost >= uniform floor n/64 (in milli): Jensen
      assert(r.getAs[Long]("expected_probe_milli") >= n * 1000 / 64)
    }
  }
}
