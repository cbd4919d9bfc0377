package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q_link_prediction's oracle mirrors the same wedge algorithm, so it
  * cannot catch an algorithmic miss (a candidate pair double-counted
  * through two shared neighbors, an adjacent pair surviving the
  * anti-join). This spec proves the wedge candidate generation against
  * the brute-force definition on the sf0.001 co-purchase graph:
  * identical (pair → common-neighbor-count) MAPS over all non-adjacent
  * pairs, not just the top-20 head the query serves. */
class LinkPredictionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def edges = {
    import graft.Tables
    val pp = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    pp.as("a")
      .join(pp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select(col("u"), col("v"))
  }

  test("wedge candidates equal brute-force common-neighbor counts") {
    val e0 = edges.cache()
    try {
      val adj = e0.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force on the driver: neighbor sets, then every
      // non-adjacent pair with a non-empty intersection
      val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
        .withDefaultValue(Set.empty)
      adj.foreach { case (u, v) =>
        nbrs(u) = nbrs(u) + v; nbrs(v) = nbrs(v) + u
      }
      val nodes = nbrs.keys.toSeq.sorted
      val brute = (for {
        i <- nodes.indices.iterator
        j <- (i + 1) until nodes.size
        x = nodes(i); y = nodes(j)
        if !adj.contains((x, y))
        cn = (nbrs(x) & nbrs(y)).size
        if cn > 0
      } yield (x, y) -> cn.toLong).toMap

      // engine shape: wedge equi-join + anti-join (the query's stages)
      val e = e0.unionByName(
        e0.select(col("v").as("u"), col("u").as("v")))
      val cand = e.as("a")
        .join(e.as("b"),
          col("a.u") === col("b.u") && col("a.v") < col("b.v"))
        .groupBy(col("a.v").as("x"), col("b.v").as("y"))
        .agg(count(lit(1)).as("cn"))
        .join(e0, col("x") === e0("u") && col("y") === e0("v"),
          "left_anti")
      val got = cand.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      assert(got.sizeIs > 0, "empty candidate set — degenerate graph")
      assert(got == brute,
        s"wedge candidates diverge from brute force: " +
          s"${(got.keySet diff brute.keySet).take(5)} extra, " +
          s"${(brute.keySet diff got.keySet).take(5)} missing")
    } finally { e0.unpersist(); () }
  }

  // ---- adversarial planted-hub fixture for the hub-degree cap ----------
  // One hub of degree 2000 (nodes 1..2000 all touch it) plus a tiny
  // non-hub structure: nodes 1 and 2 share the low-degree neighbor
  // 50000. Uncapped, the hub alone floods the wedge join with
  // C(2000,2) = 1,999,000 candidate pairs; capped, the candidate set
  // collapses to the 2 pairs that carry real signal. Degrees: hub
  // 2000; nodes 1, 2, 50000 each 2; nodes 3..2000 each 1.

  private val HubId = 100000L
  private val SharedId = 50000L

  private def hubFixture = {
    val s = spark
    import s.implicits._
    val e0 = ((1L to 2000L).map(i => (i, HubId)) ++
      Seq((1L, SharedId), (2L, SharedId))).toDF("u", "v")
    val e = e0.unionByName(
      e0.select(col("v").as("u"), col("u").as("v")))
    (e0, e)
  }

  private def scored(cap: Long) = {
    val (e0, e) = hubFixture
    GraphQueries.linkPredictionScores(e0, e, cap)
  }

  test("hub cap bounds the wedge candidate volume on a planted " +
      "power-law hub and keeps small-degree recall intact") {
    // engaged cap: the hub (degree 2000) is dropped as a wedge center
    val capped = scored(cap = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(capped.size == 2,
      s"capped candidates must collapse to the 2 signal pairs: $capped")
    // (1,2) share the NON-hub neighbor 50000: recall intact, cn counts
    // common non-hub neighbors, Jaccard keeps FULL degrees (2 and 2)
    assert(capped((1L, 2L)) == ((1L, 1000000L / 3)),
      "small-degree pair must survive with its non-hub wedge count")
    // (50000, hub) is reached through the low-degree centers 1 and 2 —
    // the cap drops the hub as a CENTER, never as an endpoint
    assert(capped((SharedId, HubId)) == ((2L, 1000L)),
      "hub may still appear as a wedge ENDPOINT")

    // uncapped (default cap = 10000 > hub degree): the hub floods the
    // candidate set — C(2000,2) hub pairs + the (50000, hub) pair
    val pure = scored(cap = GraphQueries.DefaultHubCap)
    assert(pure.count() == 1999001L,
      "uncapped candidate volume must show the quadratic hub flood")
  }

  test("the cap engages exactly at the degree threshold") {
    // cap just below the hub degree → hub dropped, 2 candidates
    assert(scored(cap = 1999L).count() == 2L)
    // cap at the hub degree → hub kept, pure-form volume
    assert(scored(cap = 2000L).count() == 1999001L)
  }
}
