package graft.queries

import graft.SparkSpec

/** Invariants of the integer PageRank the oracle equality can't state:
  * conservation bounds and determinism across reruns. */
class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run() =
    GraphQueries.all.find(_.name == "q_pagerank_copurchase").get
      .run(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))

  test("ranks respect the damping floor and the total-mass ceiling") {
    val ranks = run()
    assert(ranks.nonEmpty)
    // every surviving node got the teleport base plus something
    assert(ranks.forall(_._2 >= 150000L), "rank below the teleport base")
    // floor divisions only lose mass: no rank can exceed the whole
    // system's initial mass
    val nodes = graft.Tables.orders(spark, dir)
      .select("o_custkey").distinct().count() +
      graft.Tables.lineitem(spark, dir)
        .select("l_suppkey").distinct().count()
    assert(ranks.forall(_._2 <= nodes * 1000000L), "rank above total mass")
  }

  test("iteration is deterministic across independent runs") {
    assert(run().toSeq == run().toSeq)
  }
}
