package graft.gen

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fresh-embeddings scale tier (ScaleUp default): per-copy cyclic
  * dimension shift — orthogonal, so within-copy geometry is EXACT
  * while cross-copy exact/near duplicates disappear. */
class FreshVecsSpec extends SparkSpec {

  test("copy 0 pristine; within-copy cosines preserved exactly; " +
      "cross-copy verbatim duplicates gone; --verbatim-embeddings " +
      "restores key-offset copies") {
    val s = spark
    import s.implicits._
    val src = "/root/testdata/sf0.001"
    val dst = tmpDir("fresh_vecs")
    ScaleUp.run(spark, Array(src, dst, "3", "--tables=embeddings"))
    val base = spark.read.parquet(s"$src/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val out = spark.read.parquet(s"$dst/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    assert(out.size == base.size * 3)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / math.sqrt(a.map(x => x.toDouble * x).sum *
        b.map(x => x.toDouble * x).sum)
    }
    val ids = base.keys.toSeq.sorted.take(4)
    val stride = 10000000L
    // copy 0 byte-identical
    ids.foreach(i => assert(out(i) == base(i), s"copy 0 of $i pristine"))
    // within-copy cosine EXACT (permutations are orthogonal)
    for (k <- 1 to 2; Seq(a, b) <- ids.combinations(2)) {
      val orig = cos(base(a), base(b))
      val shifted = cos(out(a + k * stride), out(b + k * stride))
      assert(math.abs(orig - shifted) < 1e-12,
        s"within-copy-$k cosine of ($a,$b): $orig vs $shifted")
    }
    // cross-copy: a shifted vector is no longer its sibling's duplicate
    val dups = ids.count(i => out(i + stride) == base(i))
    assert(dups == 0, "no copy-1 vector may equal its copy-0 sibling")
    assert(ids.forall(i => cos(out(i + stride), base(i)) < 0.999),
      "cross-copy near-identity must be broken")
    // opt-out restores verbatim copies
    val dst2 = tmpDir("verb_vecs")
    ScaleUp.run(spark,
      Array(src, dst2, "2", "--tables=embeddings", "--verbatim-embeddings"))
    val v = spark.read.parquet(s"$dst2/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    ids.foreach(i => assert(v(i + stride) == base(i),
      "verbatim mode keeps exact copies"))
  }
}
