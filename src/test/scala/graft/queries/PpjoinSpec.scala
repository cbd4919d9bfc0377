package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Boundary proof for the prefix-filtered exact similarity join: the
  * jac = 0.5 pair at the extreme size ratio (|B| = 2|A|, A's shingles
  * ⊂ B's) sits exactly on BOTH filter edges — the prefix length bound
  * and the 2× length filter — and must still surface; a jac = 0.4 pair
  * must not. Ground truth computed by hand over crafted token streams
  * (k tokens → k−2 distinct 3-shingles).
  */
class PpjoinSpec extends SparkSpec {

  test("ppjoin finds exactly the jac ≥ 0.5 pairs incl. the 0.5 boundary") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // A: shingles {w1w2w3, w2w3w4}, n=2
      (1L, "w1 w2 w3 w4"),
      // B: shingles n=4 ⊇ A's → jac(A,B) = 2/4 = 0.5 (boundary, |B|=2|A|)
      (2L, "w1 w2 w3 w4 w5 w6"),
      // C: shingles n=5 ⊇ A's → jac(A,C) = 2/5 = 0.4 (below), and
      // jac(B,C) = 4/5 = 0.8 (above)
      (3L, "w1 w2 w3 w4 w5 w6 w7"),
      // D1/D2: identical → jac 1.0; unrelated to the w-family
      (4L, "z1 z2 z3"),
      (5L, "z1 z2 z3")
    ).toDF("doc_id", "text")
    val out = DedupQueries.ppjoinPairs(docs)
      .where(col("jac") >= 0.5)
      .orderBy(col("a_id"), col("b_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.5), (2L, 3L, 0.8), (4L, 5L, 1.0)))
  }
}
