package graft.queries

import graft.SparkSpec

/** Hand-computed expectations for the round-4 curation additions:
  * corpus-frequency boilerplate-line removal and bigram-LM fluency
  * scoring. A 3-doc planted corpus small enough to verify on paper —
  * the sf-corpus hash check proves engine≡oracle; this proves both
  * match the DEFINITION.
  */
class BoilerplateLmSpec extends SparkSpec {

  /** d1/d2 share their first 8-token line (planted boilerplate); d3 is a
    * single-token doc (the zero-bigram / partial-line edge). */
  private lazy val dir: String = {
    val d = tmpDir("graft-bplm")
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h x y"),
      (3L, "q"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def q(name: String) =
    (CurationQueries.all ++ TextQueries.all).find(_.name == name).get
      .run(spark, dir)

  test("pipe_boilerplate_lines: shared line removed, unique lines kept in order") {
    val rows = q("pipe_boilerplate_lines").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, 2L, 1L, "i j"),   // "a b c d e f g h" df=2 → dropped
      (2L, 2L, 1L, "x y"),
      (3L, 1L, 1L, "q")))    // df=1 line survives; partial line intact
  }

  test("text_lm_score: bigram MLE mean in ppm matches hand computation") {
    // c(w1)=2 for a..h; (h,i)/(h,x) are the only p=1/2 bigrams, the
    // other 8 per doc are p=1 → floor((7*1e6 + 5e5 + 1e6)/9) = 944444.
    val rows = q("text_lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (1L, 9L, 944444L),
      (2L, 9L, 944444L),
      (3L, 0L, 0L)))         // 1-token doc: no bigrams, score 0
  }

  test("invariants on the test corpus: bounds and exact-dup elimination") {
    val real = "/root/testdata/sf0.001"
    val bp = CurationQueries.all.find(_.name == "pipe_boilerplate_lines").get
      .run(spark, real).collect()
    bp.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"doc ${r.getLong(0)}: kept>total")
    }
    // a doc with an exact-text twin shares EVERY line → nothing survives
    val dups = graft.Tables.documents(spark, real)
      .groupBy("text").count().where("count >= 2")
      .join(graft.Tables.documents(spark, real), "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    if (dups.nonEmpty)
      bp.filter(r => dups(r.getLong(0))).foreach { r =>
        assert(r.getLong(2) == 0L,
          s"exact-dup doc ${r.getLong(0)} must lose all lines")
      }
    val lm = TextQueries.all.find(_.name == "text_lm_score").get
      .run(spark, real).collect()
    lm.foreach { r =>
      val s = r.getLong(2)
      assert(s >= 0L && s <= 1000000L,
        s"doc ${r.getLong(0)}: score_ppm $s out of [0, 1e6]")
    }
  }
}
