package graft.queries

import graft.SparkSpec

class GraphShuffleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val flag = "spark.graft.pagerank.shuffle"

  private def pagerank() =
    GraphQueries.all.find(_.name == "q_pagerank_copurchase").get
      .run(spark, sfDir)

  test("shuffle-superstep flag keeps the result bit-identical and drops " +
      "every broadcast of ranks from the plan") {
    val baseline = pagerank().collect().map(_.toSeq).toSeq

    spark.conf.set(flag, "true")
    try {
      // the Q entry returns a collected LocalRelation (it materializes
      // the bounded top-50 and releases the edge cache), so the plan
      // assertions inspect the LAZY frame the entry materializes
      val (lazyDf, cache) = GraphQueries.pagerankTopK(spark, sfDir)
      val plan = lazyDf.queryExecution.executedPlan.toString
      cache.unpersist()
      val df = pagerank()
      // the edge-build lineage inside the cache legitimately broadcasts
      // its dimension joins — only RANK-side joins (the ones keyed on
      // `node`) must never broadcast
      val rankBroadcasts = plan.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") && l.contains("node#")).toSeq
      assert(rankBroadcasts.isEmpty,
        s"rank joins must be shuffled, not broadcast: $rankBroadcasts")
      assert(plan.linesIterator.exists(l =>
        l.contains("ShuffledHashJoin") && l.contains("node#")),
        "the hint must materialize as a shuffled hash join on ranks")
      assert(df.collect().map(_.toSeq).toSeq == baseline,
        "the flag changes the plan, never the integer result")
    } finally spark.conf.unset(flag)
  }
}
