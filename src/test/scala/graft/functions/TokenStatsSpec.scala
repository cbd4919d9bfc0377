package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenStatsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("token_stats agrees with the compositional HOF features on every field") {
    val df = docs(
      (1L, "the cat and the dog"),
      (2L, "unique words only here"),
      (3L, "a a a a"),
      (4L, "x"))
    val toks = TextOps.tokens(col("text"))
    val rows = df.select(
      col("doc_id"),
      TokenStats.token_stats(col("text")).as("k"),
      length(col("text")).cast("long").as("ref_chars"),
      size(toks).cast("long").as("ref_tokens"),
      size(array_distinct(toks)).cast("long").as("ref_distinct"),
      TextOps.occurrencesIn(toks, TextOps.EnglishStopwords).cast("long")
        .as("ref_stops"))
      .collect()
    rows.foreach { r =>
      val k = r.getStruct(1)
      assert(k.getLong(0) == r.getLong(2), s"chars doc ${r.getLong(0)}")
      assert(k.getLong(1) == r.getLong(3), s"tokens doc ${r.getLong(0)}")
      assert(k.getLong(2) == r.getLong(4), s"distinct doc ${r.getLong(0)}")
      assert(k.getLong(3) == r.getLong(5), s"stops doc ${r.getLong(0)}")
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
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.head().getStruct(0).toString == viaCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    }
  }
}
