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

  test("random walks are VALID paths (every consecutive step is an " +
      "edge) and deterministic across runs") {
    import org.apache.spark.sql.functions._
    def walks() = GraphQueries.all
      .find(_.name == "q_graph_random_walks").get
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w = walks()
    assert(w.length % 5 == 0 && w.nonEmpty, s"20 walks x 5 steps: ${w.length}")
    // undirected edge set, straight from the same derivation
    val pp = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = GraphQueries.rawPairCounts(pp)
      .where(col("w") >= 2).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
    w.groupBy(_._1).foreach { case (id, steps) =>
      val path = steps.sortBy(_._2).map(_._3)
      assert(path.head == id, "walks start at their seed")
      path.zip(path.tail).foreach { case (a, b) =>
        assert(edges.contains((a, b)),
          s"walk $id hops a non-edge ($a,$b)")
      }
    }
    assert(w.toSeq == walks().toSeq, "walk corpus must be reproducible")
  }
}
