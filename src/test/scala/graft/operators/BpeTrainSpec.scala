package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {

  private def fold(syms: Seq[String], l: String, r: String): Seq[String] = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(syms)).toDF("syms")
      .select(BpeTrain.applyMerge(col("syms"), l, r).as("out"))
      .collect()(0).getSeq[String](0)
  }

  test("applyMerge is the greedy leftmost non-overlapping rewrite") {
    // overlap run: every other pair merges, scan resumes after a merge
    assert(fold(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(fold(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // the merged symbol does not re-merge as `l` within the same round
    assert(fold(Seq("a", "a", "b"), "a", "b") == Seq("a", "ab"))
    // non-adjacent occurrences all merge
    assert(fold(Seq("x", "e", "r", "y", "e", "r"), "e", "r")
      == Seq("x", "er", "y", "er"))
    // no occurrence → unchanged; single symbol → unchanged
    assert(fold(Seq("q", "w"), "e", "r") == Seq("q", "w"))
    assert(fold(Seq("e"), "e", "r") == Seq("e"))
  }

  test("train learns composed merges on a tiny corpus, deterministically") {
    val s = spark
    import s.implicits._
    // 3×"abc" + 2×"abd": round 1 must pick (a,b) [count 5]; round 2
    // then sees symbols {ab, c, d} and must pick (ab, c) [count 3] —
    // a merge that only exists BECAUSE round 1 rewrote the vocab.
    val vocab = Seq(
      (Seq("a", "b", "c"), 3L),
      (Seq("a", "b", "d"), 2L)).toDF("syms", "wf")
    val merges = BpeTrain.train(vocab, 3)
    assert(merges.map(m => (m.round, m.l, m.r, m.pairCount)) == Seq(
      (1, "a", "b", 5L),
      (2, "ab", "c", 3L),
      (3, "ab", "d", 2L)))
  }

  test("trainWithVocab returns the fully-rewritten final generation") {
    val s = spark
    import s.implicits._
    val vocab = Seq(
      (Seq("a", "b", "c"), 3L),
      (Seq("a", "b", "d"), 2L)).toDF("syms", "wf")
    val (merges, encoded) = BpeTrain.trainWithVocab(vocab, 2)
    // after (a,b) then (ab,c): "abc" is ONE symbol, "abd" is two
    val got = encoded.collect()
      .map(r => r.getSeq[String](0) -> r.getLong(1)).toMap
    assert(merges.size == 2)
    assert(got == Map(Seq("abc") -> 3L, Seq("ab", "d") -> 2L))
  }

  test("train stops when the pair table drains") {
    val s = spark
    import s.implicits._
    val vocab = Seq((Seq("x", "y"), 1L)).toDF("syms", "wf")
    // round 1 merges (x,y) -> one symbol left -> rounds 2+ drain
    val merges = BpeTrain.train(vocab, 5)
    assert(merges.map(m => (m.round, m.merged)) == Seq((1, "xy")))
  }

  test("tiebreak is count DESC, then l, then r — total order") {
    val s = spark
    import s.implicits._
    // (a,z) and (b,c) both count 1: l ascending picks (a,z)
    val vocab = Seq(
      (Seq("a", "z"), 1L),
      (Seq("b", "c"), 1L)).toDF("syms", "wf")
    val merges = BpeTrain.train(vocab, 1)
    assert(merges.head.l == "a" && merges.head.r == "z")
  }
}
