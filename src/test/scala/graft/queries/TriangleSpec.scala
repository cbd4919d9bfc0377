package graft.queries

import graft.SparkSpec

/** Cross-checks q_triangle_copurchase against a brute-force reference:
  * the degree-oriented compact-forward join must count exactly the
  * triangles a naive adjacency-set scan finds (orientation changes the
  * join order, never the triangle set). */
class TriangleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q = GraphQueries.all.find(_.name == "q_triangle_copurchase").get

  /** Brute-force per-part triangle participation from the same edge
    * definition (pairs co-purchased in >= 2 distinct orders). */
  private def bruteForce(): Map[Long, Long] = {
    val pairs = graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
      // NB: .filter + .keySet, not .collect{... => e}: collect on a Map
      // with a tuple-valued function rebuilds a MAP, silently collapsing
      // the edge set to one edge per left endpoint.
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for {
      (u, v) <- edges
      w <- adj(u) intersect adj(v) if w > v // u < v < w by construction
    } {
      Seq(u, v, w).foreach(x => counts(x) = counts.getOrElse(x, 0L) + 1L)
    }
    counts.toMap
  }

  test("per-part counts equal the brute-force adjacency scan") {
    val got = q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bruteForce()
    assert(got == want,
      s"diff: extra=${got.toSet.diff(want.toSet)} missing=${want.toSet.diff(got.toSet)}")
  }

  test("total participation is divisible by three") {
    val total = q.run(spark, dir).collect().map(_.getLong(1)).sum
    assert(total % 3 == 0, s"participation sum $total not divisible by 3")
  }
}
