package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: n-grams, short docs collapse to whole-doc shingle") {
    val df = docs((1L, "a b c d"), (2L, "a b"))
      .select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L) == Seq("a b"))
  }

  test("jaccard: exact set semantics incl. duplicates collapsed") {
    val df = docs((1L, "a a b c"))
      .select(TextOps.jaccard(
        array_distinct(TextOps.tokens(col("text"))),
        array(lit("b"), lit("c"), lit("d"))).as("j"))
    // {a,b,c} vs {b,c,d}: |∩|=2, |∪|=4
    assert(df.head().getDouble(0) == 0.5)
  }

  test("minhash signature: identical inputs → identical sigs; estimator tracks jaccard") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val near = base + " extra"                  // high overlap
    val far = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10" // disjoint
    val df = docs((1L, base), (2L, base), (3L, near), (4L, far))
      .select(col("doc_id"), TextOps.minhashSignature(
        TextOps.shingles(TextOps.tokens(col("text")), 3), 64).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L)) // deterministic
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 64.0
    assert(est(1L, 3L) > 0.7, s"near-dup estimate ${est(1L, 3L)}")
    assert(est(1L, 4L) < 0.2, s"disjoint estimate ${est(1L, 4L)}")
  }

  test("simhash: deterministic, near-dup few bits apart, disjoint far apart") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => s"tok$i").mkString(" ") + " novel"
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    val df = docs((1L, base), (2L, base), (3L, near), (4L, far))
      .select(col("doc_id"), TextOps.simhash(TextOps.tokens(col("text"))).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(m(a) ^ m(b))
    assert(ham(1L, 3L) <= 8, s"near hamming ${ham(1L, 3L)}")
    assert(ham(1L, 4L) > 12, s"far hamming ${ham(1L, 4L)}")
  }

  test("simhash token hash equals DuckDB md5_number_upper (cross-engine pin)") {
    // DuckDB: SELECT md5_number_upper('abc') → 12704604231530709392
    // (first 8 MD5 bytes, little-endian, as unsigned); as a signed long
    // that bit pattern is 12704604231530709392 - 2^64.
    val expected = java.lang.Long.parseUnsignedLong("12704604231530709392")
    assert(SimHashImpl.tokenHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")) == expected)
  }

  test("simhash matches between interpreted eval and codegen path") {
    val df = docs((1L, "alpha beta gamma delta"))
    val viaCodegen = df
      .select(TextOps.simhash(TextOps.tokens(col("text"))).as("sh"))
      .head().getLong(0)
    val viaInterp = withInterpretedEval {
      df.select(TextOps.simhash(TextOps.tokens(col("text"))).as("sh"))
        .head().getLong(0)
    }
    assert(viaCodegen == viaInterp)
  }

  test("hamming64 via bit_count stays consistent with JVM bitCount") {
    val df = docs((1L, "x")).select(
      TextOps.hamming64(lit(0xF0F0L), lit(0x0F0FL)).as("h"))
    assert(df.head().getInt(0) == java.lang.Long.bitCount(0xF0F0L ^ 0x0F0FL))
  }

  test("langId picks the language whose stopwords dominate") {
    val df = docs(
      (1L, "the cat and the dog are in the house"),
      (2L, "el perro y la casa de la playa en madrid"))
      .select(col("doc_id"), TextOps.langId(col("text")).as("p"))
    val m = df.collect().map(r => r.getLong(0) ->
      r.getStruct(1).getString(1)).toMap
    assert(m(1L) == "en")
    assert(m(2L) == "es")
  }

  test("LSH banding finds the planted near-duplicate pair") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " z1 z2"
    val others = (1 to 30).map(j =>
      (100L + j, (1 to 60).map(i => s"doc${j}tok$i").mkString(" ")))
    val df = docs(Seq((1L, base), (2L, nearDup)) ++ others: _*)
    val sigs = df.select(col("doc_id"),
      TextOps.lshBands(TextOps.minhashSignature(
        TextOps.shingles(TextOps.tokens(col("text")), 3), 48), 12, 4)
        .as("bands"))
      .select(col("doc_id"), explode(col("bands")).as("b"))
    val a = sigs.select(col("b").as("ab"), col("doc_id").as("a_id"))
    val b = sigs.select(col("b").as("bb"), col("doc_id").as("b_id"))
    val pairs = a.join(b, col("ab") === col("bb") && col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing planted pair in $pairs")
    // unrelated docs shouldn't flood the candidate set
    assert(pairs.size < 20, s"too many collisions: ${pairs.size}")
  }

  test("md5Low60: SQL built-in pipeline equals the JVM kernel masked to " +
      "60 bits (the cross-engine sketch-hash contract)") {
    val s = spark
    import s.implicits._
    val inputs = (1 to 200).map(_.toString) ++
      Seq("", "a", "hello world", "ünïcödé", "0", "-17")
    val got = inputs.toDF("s")
      .select(col("s"), TextOps.md5Low60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { in =>
      val expected = SimHashImpl.tokenHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(in)) &
        0xFFFFFFFFFFFFFFFL
      assert(got(in) == expected, s"hash mismatch for '$in'")
      assert(got(in) >= 0L && got(in) < (1L << 60))
    }
  }
}
