package graft.queries

import graft.SparkSpec

/** `q_hierarchy_rollup`'s pointer jumping claims convergence for ANY
  * int64 key space in its fixed 5 rounds (2^5 = 32 hops ≥ log7(2^63) ≈
  * 22.6). The oracle only exercises depth ~6 (test-tier part keys), so
  * this spec drives the SAME query over a synthetic part table whose
  * keys sit at the deep end of the int64 7-ary tree — depths the bench
  * corpus never reaches — and checks every root and the max depth
  * against an iteratively-computed reference. */
class HierarchySpec extends SparkSpec {

  test("pointer jumping converges at int64-deep trees (depth > 20)") {
    val s = spark
    import s.implicits._
    // keys along one deep spine (7^21 ≈ 5.6e17, depth 21) plus scattered
    // members of other roots — each expanded to its FULL ancestor chain:
    // the join-based pointer jump requires ancestor closure (every
    // parent key present in the table), the standard BOM-table
    // invariant, which the dense 1..N part keys satisfy by construction
    // (k div 7 < k and ≥ 1 for k ≥ 7). An unclosed fixture drops
    // orphans at the first join — this spec proves depth, not orphan
    // handling.
    def chain(k: Long): Seq[Long] =
      Iterator.iterate(k)(_ / 7).takeWhile(_ >= 1).toSeq
    val seeds = Seq(BigInt(7).pow(21).toLong, 3L, 6L, 48L,
      343L * 5 + 2, BigInt(7).pow(15).toLong + 13)
    val keys = seeds.flatMap(chain).distinct
    def refRoot(k: Long): Long = { var c = k; while (c >= 7) c /= 7; c }
    def refDepth(k: Long): Long = {
      var c = k; var d = 0L; while (c >= 7) { c /= 7; d += 1 }; d
    }
    val dir = tmpDir("hier")
    keys.map(k => (k, 1.0)).toDF("p_partkey", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = StarQueries.all.find(_.name == "q_hierarchy_rollup").get
      .run(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    val want = keys.groupBy(refRoot).map { case (root, ks) =>
      root -> (ks.size.toLong, ks.map(refDepth).max)
    }
    assert(out == want,
      s"pointer-jump rollup diverged from the iterative reference:\n" +
        s"got  $out\nwant $want")
    assert(want.values.map(_._2).max >= 21L,
      "the fixture must actually exercise depth ≥ 21")
  }
}
