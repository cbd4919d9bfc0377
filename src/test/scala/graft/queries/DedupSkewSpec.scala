package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Adversarial-skew fixture for the near-dup candidate generators: a
  * boilerplate cluster of 200 near-identical docs (every pair jac ≈
  * 0.95) floods LSH band buckets and PPJoin prefix postings with a
  * single hot key, which is exactly the input that turns the candidate
  * self-join quadratic in one task. The occupancy cap must collapse
  * that blowup while leaving small-bucket pairs untouched. */
class DedupSkewSpec extends SparkSpec {

  private val hotN = 200

  private def corpus(): DataFrame = {
    val s = spark
    import s.implicits._
    // hot cluster: 40 shared tokens + 1 unique tail token per doc
    val boiler = (0 until 40).map(t => s"w$t").mkString(" ")
    val hot = (1 to hotN).map(i => (1000L + i, s"$boiler u$i"))
    // three clean exact-dup pairs with disjoint vocabularies: their
    // band buckets have occupancy 2 and must survive any sane cap
    val clean = (1 to 3).flatMap { k =>
      val text = (0 until 20).map(t => s"c${k}x$t").mkString(" ")
      Seq((2000L + 2 * k, text), (2001L + 2 * k, text))
    }
    (hot ++ clean).toDF("doc_id", "text")
  }

  private def cleanPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 >= 2000L).toSet

  private val expectedClean =
    (1 to 3).map(k => (2000L + 2 * k, 2001L + 2 * k)).toSet

  test("LSH: hot-bucket cap bounds the candidate join under boilerplate " +
      "skew and keeps small-bucket pairs") {
    val sh = DedupQueries.shingled(corpus()).persist()
    try {
      val uncapped = DedupQueries.lshCandidatePairs(sh, Int.MaxValue)
      val nUncapped = uncapped.count()
      assert(nUncapped >= (hotN.toLong * (hotN - 1)) / 2,
        s"fixture must actually blow up uncapped (got $nUncapped)")

      val capped = DedupQueries.lshCandidatePairs(sh, 50)
      val nCapped = capped.count()
      assert(nCapped < nUncapped / 20,
        s"cap must collapse the hot cluster: $nUncapped → $nCapped")
      assert(cleanPairs(capped) == expectedClean,
        "occupancy-2 buckets must be untouched by the cap")
    } finally sh.unpersist()
  }

  test("PPJoin: hot-posting cap bounds the prefix join and exact small " +
      "pairs still verify at jac = 1.0") {
    val docs = corpus()
    val uncapped = DedupQueries.ppjoinPairs(docs) // default cap ≫ 200
    val nUncapped = uncapped.count()
    assert(nUncapped >= (hotN.toLong * (hotN - 1)) / 2,
      s"uncapped prefix join must surface the hot cluster ($nUncapped)")

    val capped = DedupQueries.ppjoinPairs(docs, maxPostingOccupancy = 50)
    val nCapped = capped.count()
    assert(nCapped < nUncapped / 20,
      s"cap must collapse the hot cluster: $nUncapped → $nCapped")
    val clean = capped.where(org.apache.spark.sql.functions.col("a_id")
      >= 2000L)
    assert(cleanPairs(clean) == expectedClean)
    assert(clean.collect().forall(_.getAs[Double]("jac") == 1.0),
      "exact dups must verify at jaccard 1.0")
  }
}
