package graft.queries

import graft.SparkSpec

class DedupGuardSpec extends SparkSpec {

  test("quadratic-baseline guard admits small sources, refuses big ones") {
    val s = spark
    import s.implicits._
    val docs = (1 to 100).map(i => (i.toLong, s"src${i % 4}"))
      .toDF("doc_id", "source")
    // 25 docs/source — far under any sane limit
    DedupQueries.guardQuadraticBaseline(docs)
    // refuse once one source crosses the ceiling
    val ex = intercept[IllegalArgumentException] {
      DedupQueries.guardQuadraticBaseline(docs, maxDocsPerSource = 10L)
    }
    assert(ex.getMessage.contains("dedup_minhash_lsh"),
      "the error must point at the production path")
  }
}
