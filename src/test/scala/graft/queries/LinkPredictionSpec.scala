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
}
