package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property pins for BpeTrain against a plain-Scala reference
  * implementation of the Sennrich merge semantics: the Spark fold and
  * the reference must agree on random vocabularies, not just the
  * hand-picked examples in BpeTrainSpec. */
class BpePropertySpec extends SparkSpec {

  /** Deterministic sampling loop standing in for forAll (same device as
    * DqPropertySpec — reproducible seeds, no flaky shrinkage). */
  private def forAll[A](g: Gen[A], trials: Int = 8)(f: A => Unit): Unit =
    (1 to trials).foreach { i =>
      f(g.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))
    }

  /** Reference greedy leftmost merge — the textbook fold. */
  private def refApply(syms: List[String], l: String, r: String)
      : List[String] =
    syms.foldLeft(List.empty[String]) {
      case (acc, s) if acc.nonEmpty && acc.last == l && s == r =>
        acc.init :+ (l + r)
      case (acc, s) => acc :+ s
    }

  /** Reference trainer: pair counts weighted by wf, argmax with the
    * (count DESC, l, r) tiebreak, rewrite, repeat. */
  private def refTrain(vocab0: Seq[(List[String], Long)], rounds: Int)
      : Seq[(String, String, Long)] = {
    var vocab = vocab0
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < rounds && !done) {
      val counts = vocab.flatMap { case (syms, wf) =>
        syms.zip(syms.drop(1)).map(p => p -> wf)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.map { case (syms, wf) => (refApply(syms, l, r), wf) }
        k += 1
      }
    }
    out.result()
  }

  private val word: Gen[List[String]] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield cs

  private val vocabGen: Gen[List[(List[String], Long)]] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, word)
    fs <- Gen.listOfN(n, Gen.choose(1L, 9L))
  } yield ws.zip(fs)

  test("applyMerge ≡ reference fold on random symbol runs") {
    val s = spark
    import s.implicits._
    val runs: Gen[(List[String], String, String)] = for {
      syms <- word
      l <- Gen.oneOf("a", "b", "c")
      r <- Gen.oneOf("a", "b", "c")
    } yield (syms, l, r)
    forAll(runs, trials = 20) { case (syms, l, r) =>
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(BpeTrain.applyMerge(col("syms"), l, r))
        .collect()(0).getSeq[String](0).toList
      assert(got == refApply(syms, l, r), s"syms=$syms merge=($l,$r)")
    }
  }

  test("train ≡ reference trainer on random vocabularies") {
    val s = spark
    import s.implicits._
    forAll(vocabGen, trials = 6) { vocab =>
      val df = vocab.toDF("syms", "wf")
      val got = BpeTrain.train(df, 4)
        .map(m => (m.l, m.r, m.pairCount))
      assert(got == refTrain(vocab, 4), s"vocab=$vocab")
    }
  }
}
