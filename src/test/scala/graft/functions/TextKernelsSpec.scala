package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextKernelsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("sorted_jaccard equals the set-semantics HOF jaccard") {
    val df = docs(
      (1L, "a b c d e"), (2L, "c d e f g"), (3L, "a b"), (4L, "x y z"))
    val toks = array_sort(array_distinct(split(col("text"), " ")))
    val prepared = df.select(col("doc_id"), toks.as("toks"))
    val pairs = prepared.as("a").join(prepared.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        TextKernels.sorted_jaccard(col("a.toks"), col("b.toks")).as("fast"),
        TextOps.jaccard(col("a.toks"), col("b.toks")).as("ref"))
      .collect()
    pairs.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"mismatch for pair (${r.getLong(0)},${r.getLong(1)})")
    }
    // spot value: {a,b,c,d,e} vs {c,d,e,f,g} → 3/7
    val v = pairs.find(r => r.getLong(0) == 1 && r.getLong(1) == 2).get
    assert(math.abs(v.getDouble(2) - 3.0 / 7) < 1e-15)
  }

  test("sorted_jaccard: empty vs empty is 0, interpreted matches codegen") {
    val df = docs((1L, "x"))
      .select(TextKernels.sorted_jaccard(
        array().cast("array<string>"), array().cast("array<string>")).as("j"))
    assert(df.head().getDouble(0) == 0.0)
    withInterpretedEval {
      assert(df.head().getDouble(0) == 0.0)
    }
  }

  test("tokens_in_set equals the compositional filter+contains form") {
    val words = Seq("the", "a", "of", "und", "el")
    val df = docs(
      (1L, "the cat of a hat the"),   // repeats count as occurrences
      (2L, "und der el the"),
      (3L, "nothing matches here"),
      (4L, ""))                       // single empty token
    val out = df.select(col("doc_id"),
        TextKernels.tokens_in_set(split(col("text"), " "), words).as("fast"),
        size(filter(split(col("text"), " "),
          t => array_contains(lit(words.toArray), t))).as("ref"))
      .collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"mismatch for doc ${r.getLong(0)}"))
    assert(out.find(_.getLong(0) == 1L).get.getInt(1) == 4)
    // interpreted path agrees with codegen
    withInterpretedEval {
      val i = df.select(TextKernels.tokens_in_set(
        split(col("text"), " "), words).as("c")).collect().map(_.getInt(0))
      assert(i.toSeq == out.sortBy(_.getLong(0)).map(_.getInt(1)).toSeq)
    }
    // null array → null (HOF size(filter(null)) semantics)
    val n = df.select(TextKernels.tokens_in_set(
      lit(null).cast("array<string>"), words).as("c")).head()
    assert(n.isNullAt(0))
  }

  test("minhash_sig: deterministic, k slots, estimator tracks jaccard") {
    val base = (1 to 30).map(i => s"s$i").mkString(" ")
    val near = (1 to 28).map(i => s"s$i").mkString(" ") + " t1 t2"
    val far = (1 to 30).map(i => s"q$i").mkString(" ")
    val df = docs((1L, base), (2L, base), (3L, near), (4L, far))
      .select(col("doc_id"),
        TextKernels.minhash_sig(split(col("text"), " "), 64).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.length == 64))
    assert(sigs(1L) == sigs(2L))
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 64.0
    // true unigram jaccard(base, near) = 28/32 = 0.875
    assert(est(1L, 3L) > 0.6, s"near est ${est(1L, 3L)}")
    assert(est(1L, 4L) < 0.15, s"far est ${est(1L, 4L)}")
  }

  test("sorted_shingles equals array_sort(array_distinct(shingles))") {
    val df = docs(
      (1L, "a b c d e a b c"),   // repeated trigram → dedup
      (2L, "x y"),               // shorter than n → whole-doc shingle
      (3L, "one"),               // single token
      (4L, "t t t t"))           // all-equal tokens → one distinct shingle
    val toks = split(col("text"), " ")
    val rows = df.select(
      TextKernels.sorted_shingles(toks, 3).as("fast"),
      array_sort(array_distinct(TextOps.shingles(toks, 3))).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"kernel ${r.getSeq[String](0)} != HOF ${r.getSeq[String](1)}")
    }
    // n=1 degenerates to the sorted distinct token set
    val uni = df.select(
      TextKernels.sorted_shingles(toks, 1).as("fast"),
      array_sort(array_distinct(toks)).as("ref")).collect()
    uni.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // interpreted path matches codegen
    withInterpretedEval {
      val r = df.where(col("doc_id") === 1)
        .select(TextKernels.sorted_shingles(toks, 3)).head()
      assert(r.getSeq[String](0).head == "a b c")
    }
  }

  test("pre_token_count equals size(regexp_extract_all) on edge and " +
      "random strings") {
    val edge = Seq(
      "", " ", "   ", "abc", "abc def", "a1b2", "123 456", "A", "AA a",
      "hello, world!", "tab\there", "line\nbreak", "mixed CASE text 42",
      "éclair café", "日本語 text", "emoji 😀 here",
      "a  double  spaces", "!!!", "a!b?c", "trailing space ", " leading")
    val rnd = new scala.util.Random(11)
    val alphabet = "abc XYZ019 .,!é日"
    val fuzz = (1 to 200).map(_ =>
      (1 to rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = docs((edge ++ fuzz).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }: _*)
    val out = df.select(col("doc_id"), col("text"),
        TextKernels.pre_token_count(col("text")).as("fast"),
        size(TextOps.regexTokens(col("text"))).cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(2) == r.getLong(3),
      s"mismatch on ${r.getString(1)}: " +
        s"kernel ${r.getLong(2)} != regex ${r.getLong(3)}"))
    // interpreted path matches codegen
    withInterpretedEval {
      val i = df.orderBy(col("doc_id"))
        .select(TextKernels.pre_token_count(col("text")))
        .collect().map(_.getLong(0))
      assert(i.toSeq ==
        out.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq)
    }
    // null text → null
    assert(df.limit(1).select(TextKernels.pre_token_count(
      lit(null).cast("string"))).head().isNullAt(0))
  }
}
