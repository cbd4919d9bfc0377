package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The unigram-LM trainer's structural claims that the oracle equality
  * cannot state: every vocabulary generation is prefix-closed (the
  * property that makes the extend-while-member fold equal greedy
  * longest-match), every segmentation is a valid maximal cover of its
  * word, and the vocabulary shrinks monotonically across rounds.
  */
class UnigramSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rounds = TextQueries.unigramRounds(spark, sf)

  test("every vocabulary generation is prefix-closed and shrinks " +
      "monotonically") {
    val (trace, finalVocab, _) = rounds
    val vs = finalVocab.toSet
    finalVocab.filter(_.length >= 2).foreach { p =>
      (1 until p.length).foreach { j =>
        assert(vs.contains(p.substring(0, j)),
          s"piece '$p' missing prefix '${p.substring(0, j)}'")
      }
    }
    assert(trace.map(_._1) == Seq(1L, 2L, 3L))
    val sizes = trace.map(_._2)
    assert(sizes == sizes.sorted.reverse,
      s"vocabulary must shrink monotonically: $sizes")
    assert(trace.forall(_._3 > 0))
  }

  test("segmentation is a valid MAXIMAL cover: pieces concatenate to " +
      "the word, all in vocabulary, none extendable") {
    val (_, vocab, v0) = rounds
    val vs = vocab.toSet
    val segs = TextQueries.unigramSegment(v0, vocab)
      .select(col("word"), col("s")).limit(2000).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(segs.nonEmpty)
    segs.foreach { case (word, s) =>
      val pieces = s.split(' ')
      assert(pieces.mkString("") == word,
        s"'$s' does not reassemble '$word'")
      pieces.foreach(p => assert(vs.contains(p),
        s"piece '$p' of '$word' not in vocabulary"))
      // greedy maximality: a piece ends only because extending it by
      // the NEXT char would leave the vocabulary (or the word ended)
      pieces.zip(pieces.tail).foreach { case (a, b) =>
        assert(!vs.contains(a + b.head),
          s"non-maximal piece '$a' before '$b' in '$word' " +
            s"('${a + b.head}' is in the vocabulary)")
      }
    }
  }
}
