package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Semantic checks of retr_hybrid_rrf beyond the oracle equality: the
  * fusion must actually prefer documents both rankers agree on (the
  * reason hybrid retrieval exists), and the served scores must be the
  * declared rank-only arithmetic.
  */
class RetrievalSpec extends SparkSpec {

  private def q = RetrievalQueries.all.find(_.name == "retr_hybrid_rrf").get

  /** Corpus engineered so the rankers disagree: for anchor 0,
    *  - doc 10 is a LEXICAL twin (identical text, orthogonal embedding),
    *  - doc 11 is a SEMANTIC twin (identical embedding, disjoint text),
    *  - doc 12 is moderately similar on BOTH axes,
    *  - docs 13..34 are 22 fillers with small positive cosine (0.1) and
    *    disjoint vocabulary — enough of them that the lexical twin falls
    *    OUT of the semantic head entirely.
    * RRF must rank doc 12 (two moderate ranks) above both single-axis
    * twins (one excellent rank each). */
  private lazy val corpusDir: String = {
    val dir = tmpDir("rrf-corpus")
    val dim = 64
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](dim)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    val anchorTexts = (0 until 5).map(i =>
      s"anchor$i word${i}a word${i}b word${i}c")
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val vecs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    // anchors 0..4: basis vectors on dims 0..4
    for (i <- 0 until 5) {
      docs += ((i.toLong, anchorTexts(i)))
      vecs += ((i.toLong, vec(i -> 1f)))
    }
    docs += ((10L, anchorTexts(0))) // lexical twin of anchor 0
    vecs += ((10L, vec(9 -> 1f))) // ... semantically orthogonal
    docs += ((11L, "zeta eta theta iota")) // lexically disjoint
    vecs += ((11L, vec(0 -> 1f))) // ... semantic twin of anchor 0
    docs += ((12L, "anchor0 word0a zeta eta")) // jac 2/6 vs anchor 0
    vecs += ((12L, vec(0 -> 0.9f, 9 -> math.sqrt(0.19).toFloat)))
    for (i <- 13 until 35) { // fillers: cos 0.1, no shared tokens
      docs += ((i.toLong, s"filler$i noise${i}a noise${i}b"))
      vecs += ((i.toLong, vec(0 -> 0.1f, (i % 50 + 10) -> 0.995f)))
    }
    val dSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        docs.map { case (id, t) =>
          Row(id, t, "en", "synth", t.length.toLong)
        }.toSeq, 2), dSchema)
      .write.parquet(s"$dir/documents.parquet")
    val eSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map { case (id, v) => Row(id, v.toSeq, 0) }.toSeq, 2), eSchema)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("both-ranker agreement beats either single-axis twin") {
    val rows = q.run(spark, corpusDir).collect()
      .filter(_.getLong(0) == 0L)
    assert(rows.nonEmpty)
    val byRank = rows.sortBy(_.getInt(2))
    assert(byRank.head.getLong(1) == 12L,
      s"expected hybrid doc 12 at rank 1, got ${byRank.head.getLong(1)}")
    val ranked = byRank.map(_.getLong(1)).toSeq
    val r12 = ranked.indexOf(12L)
    val r10 = ranked.indexOf(10L)
    val r11 = ranked.indexOf(11L)
    assert(r10 > r12 && r11 > r12,
      s"single-axis twins must trail the hybrid doc: order $ranked")
  }

  test("served rrf is exactly the rank-only arithmetic, ranks contiguous") {
    val rows = q.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val sem = if (r.isNullAt(5)) None else Some(r.getInt(5))
      val expected = BigDecimal(
        lex.map(x => 1.0 / (60 + x)).getOrElse(0.0)
          + sem.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expected) < 1e-9,
        s"rrf mismatch on row $r")
      assert(lex.nonEmpty || sem.nonEmpty, s"rankless row served: $r")
    }
    rows.groupBy(_.getLong(0)).foreach { case (qId, g) =>
      val ranks = g.map(_.getInt(2)).sorted.toSeq
      assert(ranks == (1 to ranks.size).toSeq,
        s"ranks not contiguous for q_id $qId: $ranks")
    }
  }
}
