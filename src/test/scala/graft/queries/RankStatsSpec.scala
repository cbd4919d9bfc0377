package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Closed-form fixtures for RankStatsQueries — the claims the DuckDB
  * oracle can't state (it only replays the same formula): known-answer
  * checks against hand-computed statistics on tiny constructed corpora.
  *
  * Arm membership is the production MD5 bucketing (not injectable), so
  * fixtures that need balanced arms first ASK the engine which arm each
  * candidate user lands in, then select users per arm — the test stays
  * pinned to the real assignment function.
  */
class RankStatsSpec extends SparkSpec {

  private def q(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
    RankStatsQueries.all.find(_.name == name)
      .getOrElse(fail(s"no query $name")).run

  private def eventsDir(rows: Seq[(Long, String, java.lang.Long, String, Double)]): String = {
    import spark.implicits._
    val dir = tmpDir("rankstats")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "CAST(NULL AS STRING) AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** First `k` user ids of each arm among candidates 1..200, via the
    * production hash. */
  private def usersByArm(k: Int): (Seq[Long], Seq[Long]) = {
    import spark.implicits._
    val armed = (1L to 200L).toDF("user_id")
      .select(col("user_id"),
        (graft.functions.TextOps.md5Low60(col("user_id").cast("string")) % 2)
          .as("arm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (armed.filter(_._2 == 0L).map(_._1).take(k).toSeq,
      armed.filter(_._2 == 1L).map(_._1).take(k).toSeq)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("q_mann_whitney: arm1 strictly dominates -> U1 maximal, z > 0") {
    val (arm0, arm1) = usersByArm(3)
    val rows = arm0.zip(Seq(1.0, 2.0, 3.0)).map { case (u, v) =>
      (u, "2024-01-01 00:00:00", java.lang.Long.valueOf(u), "purchase", v)
    } ++ arm1.zip(Seq(4.0, 5.0, 6.0)).map { case (u, v) =>
      (u + 1000, "2024-01-01 00:00:00", java.lang.Long.valueOf(u), "purchase", v)
    }
    val out = q("q_mann_whitney")(spark, eventsDir(rows.map {
      case (id, ts, u, t, v) => (id: Long, ts, u, t, v)
    })).head()
    assert(out.getAs[Long]("n0") === 3L)
    assert(out.getAs[Long]("n1") === 3L)
    // every arm-1 value beats every arm-0 value: U1 = n0*n1 = 9, 2U1 = 18
    assert(out.getAs[Long]("two_u1") === 18L)
    // z = 9 / (2*sqrt(9/12*7)) = 1.963961...
    assert(math.abs(out.getAs[Double]("z") - 1.963961) < 1e-5)
  }

  test("q_mann_whitney: everything tied on one cell -> guarded z = 0") {
    val (arm0, arm1) = usersByArm(2)
    val rows = (arm0 ++ arm1).zipWithIndex.map { case (u, i) =>
      ((i + 1).toLong, "2024-01-01 00:00:00",
        java.lang.Long.valueOf(u), "purchase", 7.0)
    }
    val out = q("q_mann_whitney")(spark, eventsDir(rows)).head()
    assert(out.getAs[Double]("z") === 0.0)
  }

  test("q_ks_arms: disjoint supports -> D = 1 and significant on big n") {
    val (arm0, arm1) = usersByArm(3)
    // 12 purchases per arm (repeat users), arm0 all below arm1
    val rows = (0 until 12).map { i =>
      ((i + 1).toLong, "2024-01-01 00:00:00",
        java.lang.Long.valueOf(arm0(i % 3)), "purchase", 1.0 + i * 0.01)
    } ++ (0 until 12).map { i =>
      ((i + 100).toLong, "2024-01-01 00:00:00",
        java.lang.Long.valueOf(arm1(i % 3)), "purchase", 50.0 + i * 0.01)
    }
    val out = q("q_ks_arms")(spark, eventsDir(rows)).head()
    assert(out.getAs[Double]("d_stat") === 1.0)
    // crit = 1.358*sqrt(24/144) = 0.5544 < 1
    assert(out.getAs[Boolean]("significant"))
  }

  test("q_gini_spend: equal spends -> 0; one whale among n -> (n-1)/n") {
    val equal = (1L to 4L).map { u =>
      (u, "2024-01-01 00:00:00", java.lang.Long.valueOf(u), "purchase", 10.0)
    }
    val g0 = q("q_gini_spend")(spark, eventsDir(equal)).head()
    assert(g0.getAs[Double]("gini") === 0.0)

    // 5 users, only user 5 spends: G = (n-1)/n = 0.8 exactly
    val whale = (1L to 4L).map { u =>
      (u, "2024-01-01 00:00:00", java.lang.Long.valueOf(u), "purchase", 0.0)
    } :+ ((5L, "2024-01-01 00:00:00", java.lang.Long.valueOf(5L),
      "purchase", 100.0))
    val g1 = q("q_gini_spend")(spark, eventsDir(whale)).head()
    assert(g1.getAs[Double]("gini") === 0.8)
  }

  test("q_type_diversity: k equally-likely types -> effective k, impurity 1-1/k") {
    val rows = (0 until 12).map { i =>
      ((i + 1).toLong, "2024-01-03 08:00:00", java.lang.Long.valueOf(1L),
        Seq("login", "view_item", "purchase")(i % 3), 1.0)
    }
    val out = q("q_type_diversity")(spark, eventsDir(rows)).head()
    assert(out.getAs[Long]("n_types") === 3L)
    assert(out.getAs[Double]("effective_types") === 3.0)
    assert(math.abs(out.getAs[Double]("impurity") - (1.0 - 1.0 / 3)) < 1e-6)
  }

  test("ref_autocorr_daily: period-7 series -> lag-7 r = 1") {
    // 21 days, counts cycle 1..7 by day-of-week: lag-7 pairs are identical
    val rows = (0 until 21).flatMap { day =>
      val c = day % 7 + 1
      (0 until c).map { j =>
        ((day * 10 + j + 1).toLong, f"2024-01-${day + 1}%02d 12:00:00",
          java.lang.Long.valueOf(1L), "view", 1.0)
      }
    }
    val out = q("ref_autocorr_daily")(spark, eventsDir(rows))
      .collect().map(r => r.getAs[Int]("lag") -> r.getAs[Double]("r")).toMap
    assert(out(7) === 1.0)
    assert(out(1) < 1.0) // the sawtooth decorrelates adjacent days
  }

  test("ref_theil_sen_trend: linear daily revenue -> exact slope") {
    // revenue d-th day = (100 + 50*d) cents -> every pairwise slope = 50
    val rows = (0 until 10).map { day =>
      ((day + 1).toLong, f"2024-01-${day + 1}%02d 12:00:00",
        java.lang.Long.valueOf(1L), "purchase", 1.0 + 0.5 * day)
    }
    val out = q("ref_theil_sen_trend")(spark, eventsDir(rows)).head()
    assert(out.getAs[Long]("n_days") === 10L)
    assert(out.getAs[Long]("n_pairs") === 45L)
    assert(out.getAs[Double]("slope_cents_per_day") === 50.0)
  }

  test("q_survival_hazard: at-risk never grows, week 0 covers all users") {
    val rows = Seq[(Long, String, java.lang.Long, String, Double)](
      // u1 converts in week 0, u2 in week 2, u3 censored, u4 censored late
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 350.0),
      (2L, "2024-01-01 00:00:00", 2L, "login", 0.0),
      (3L, "2024-01-16 00:00:00", 2L, "purchase", 400.0),
      (4L, "2024-01-02 00:00:00", 3L, "view", 0.0),
      (5L, "2024-01-25 00:00:00", 4L, "view", 0.0))
    val out = q("q_survival_hazard")(spark, eventsDir(rows))
      .collect().sortBy(_.getAs[Long]("week"))
    assert(out.head.getAs[Long]("week") === 0L)
    assert(out.head.getAs[Long]("at_risk") === 4L)
    val risks = out.map(_.getAs[Long]("at_risk")).toSeq
    assert(risks === risks.sorted.reverse, s"at_risk not non-increasing: $risks")
    out.foreach { r =>
      assert(r.getAs[Long]("converted") <= r.getAs[Long]("at_risk"))
      assert(r.getAs[Long]("hazard_ppm") <= 1000000L)
    }
  }
}
