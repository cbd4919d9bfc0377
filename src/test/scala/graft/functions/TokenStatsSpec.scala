package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenStatsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("token_stats ratios agree with TextOps.qualityFeatures (reference impl)") {
    val df = docs(
      (1L, "the cat and the dog"),
      (2L, "unique words only here"),
      (3L, "a a a a"),
      (4L, "x"))
    val rows = df.select(
      col("doc_id"),
      TokenStats.token_stats(col("text")).as("k"),
      TextOps.qualityFeatures(col("text")).as("ref"))
      .collect()
    rows.foreach { r =>
      val k = r.getStruct(1)
      val ref = r.getStruct(2)
      val id = r.getLong(0)
      assert(k.getLong(0) == ref.getLong(0), s"n_chars doc $id")
      assert(k.getLong(1) == ref.getLong(1), s"n_tokens doc $id")
      assert(k.getLong(2) == ref.getLong(2), s"n_distinct doc $id")
      // kernel-derived ratios must equal the compositional struct's
      assert(k.getLong(2).toDouble / k.getLong(1) == ref.getDouble(3),
        s"distinct_ratio doc $id")
      assert((k.getLong(0) - k.getLong(1) + 1).toDouble / k.getLong(1)
        == ref.getDouble(4), s"avg_token_len doc $id")
      assert(k.getLong(3).toDouble / k.getLong(1) == ref.getDouble(5),
        s"stopword_ratio doc $id")
    }
  }

  test("split semantics edge: empty string is one empty token") {
    val k = docs((1L, ""))
      .select(TokenStats.token_stats(col("text")).as("k"))
      .head().getStruct(0)
    assert(k.getLong(0) == 0L) // chars
    assert(k.getLong(1) == 1L) // split("", " ") → [""]
    assert(k.getLong(2) == 1L)
  }

  test("interpreted and codegen paths agree") {
    val df = docs((1L, "the quick brown fox the end"))
      .select(TokenStats.token_stats(col("text")).as("k"))
    val viaCodegen = df.head().getStruct(0).toString
    withInterpretedEval {
      assert(df.head().getStruct(0).toString == viaCodegen)
    }
  }
}
