package graft.queries

import graft.SparkSpec

/** Pins the STATS-DRIVEN dim-join strategy of the star queries (the
  * big-dim tier contract): customer/supplier/part joins carry no
  * `broadcast()` hint, so
  *
  *  - while the dims sit under the broadcast threshold (any local sf
  *    tier), Catalyst's parquet size stats broadcast them exactly as a
  *    hint would — no regression on the common path;
  *  - once they outgrow it (threshold disabled here — the plan-shape
  *    equivalent of a ×1000 dim tier, where a forced hint would
  *    materialize a multi-GB table on the driver), the very same joins
  *    demote to SortMergeJoin/ShuffledHashJoin.
  *
  * The bounded enums (nation/region) keep explicit hints and stay
  * broadcast in BOTH worlds — asserted so a future refactor doesn't
  * silently drop them to shuffles of a 25-row table.
  */
class BigDimPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // per query: the scalable-dim join keys whose strategy must flip
  private val cases: Seq[(String, Seq[String])] = Seq(
    "q5_local_supplier_volume" -> Seq("c_custkey#", "s_suppkey#"),
    "q7_volume_shipping" -> Seq("c_custkey#", "s_suppkey#"),
    "q8_market_share" -> Seq("c_custkey#", "s_suppkey#", "p_partkey#"),
    "q9_product_profit" -> Seq("s_suppkey#", "p_partkey#"),
    // round-7 eleventh-pass addition: part joins with no hint, so the
    // elasticity fit inherits the same stats-driven flip
    "q_discount_elasticity" -> Seq("p_partkey#"),
    // round-8: the linkage/CF family joins dims and dim-derived
    // relations too (record linkage blocks customer on (s, seg);
    // CF self-joins the order-part relation) — the big-dim tier
    // measured exactly these flips (BASELINE.md: bhj 2→0 and 3→0), so
    // pin them the same stats-driven way. q_triangle_copurchase's flip
    // (bhj 26→8 on the same tier) is evidenced by the recorded bench
    // only: its persisted edge relation freezes inner subtrees at
    // first-plan time, so the threshold-toggle trick this spec uses
    // cannot observe the replan.
    "q_record_linkage" -> Seq("seg#"),
    "q_item_cf" -> Seq("l_partkey#", "pa#", "pb#"))

  private def q(name: String) =
    graft.SparkEntry.inventory.find(_.name == name)
      .getOrElse(fail(s"no query named $name"))

  private def planLines(name: String): Seq[String] =
    q(name).run(spark, sfDir)
      .queryExecution.executedPlan.toString.linesIterator.toSeq

  private def joinLines(lines: Seq[String], strategy: String,
      keys: Seq[String]): Seq[String] =
    lines.filter(l => l.contains(strategy) && keys.exists(l.contains))

  test("under the threshold, scalable-dim joins broadcast from stats " +
      "alone (no hint needed)") {
    cases.foreach { case (name, keys) =>
      val lines = planLines(name)
      val bhj = joinLines(lines, "BroadcastHashJoin", keys)
      assert(bhj.nonEmpty,
        s"$name: expected stats-driven broadcast of ${keys.mkString("/")} " +
          s"at sf0.001, plan:\n${lines.mkString("\n")}")
    }
  }

  test("past the threshold, the same joins demote to shuffled " +
      "strategies — no hard-coded hint pins them to broadcast") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try cases.foreach { case (name, keys) =>
      val lines = planLines(name)
      val bhj = joinLines(lines, "BroadcastHashJoin", keys)
      assert(bhj.isEmpty,
        s"$name: dim joins must demote when stats exceed the threshold, " +
          s"but found forced broadcasts:\n${bhj.mkString("\n")}")
      val shuffled = joinLines(lines, "SortMergeJoin", keys) ++
        joinLines(lines, "ShuffledHashJoin", keys)
      assert(shuffled.nonEmpty,
        s"$name: expected SMJ/shuffled-hash on ${keys.mkString("/")}, " +
          s"plan:\n${lines.mkString("\n")}")
      // the 25-row enums keep their hints: broadcast even with the
      // threshold off (a shuffle of nation/region would be pure waste).
      // Only meaningful for queries that JOIN an enum dim —
      // q_discount_elasticity touches part alone.
      if (lines.exists(l => Seq("n_nationkey#", "n_regionkey#", "s_nk#",
          "c_nk#").exists(l.contains))) {
        val enumBhj = joinLines(lines, "BroadcastHashJoin",
          Seq("n_nationkey#", "n_regionkey#", "s_nk#", "c_nk#"))
        assert(enumBhj.nonEmpty,
          s"$name: nation/region must stay hint-broadcast, " +
            s"plan:\n${lines.mkString("\n")}")
      }
    } finally spark.conf.set(key, prior)
  }
}
