package graft.queries

import graft.SparkSpec

/** Invariant specs for the round-8 audit operators whose oracles
  * replay the same algorithm (the SpatialJoinSpec rationale): the
  * total-variation drift series, the dedup-cascade funnel, and the
  * per-source dedup impact must satisfy their DEFINITIONAL bounds, not
  * just cross-engine equality. */
class DriftFunnelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("ref_tv_drift stays in [0, 1e6] and spans consecutive days") {
    val rows = graft.SparkEntry.queries("ref_tv_drift")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getLong(3)
      assert(tv >= 0 && tv <= 1000000L,
        s"day ${r.get(0)}: TV $tv outside [0, 1e6]")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0,
        s"day ${r.get(0)}: empty day totals")
    }
  }

  test("pipe_dedup_cascade funnel is monotonically non-increasing") {
    val rows = graft.SparkEntry.queries("pipe_dedup_cascade")(spark, sf)
      .collect()
    assert(rows.length == 4, "expected stages 0..3")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1),
        s"stage ${b.getLong(0)}: docs grew ${a.getLong(1)} -> " +
          s"${b.getLong(1)}")
      assert(b.getLong(2) <= a.getLong(2), "chars grew across a stage")
      assert(b.getLong(3) <= a.getLong(3), "retention rose")
    }
    assert(rows.head.getLong(3) == 1000000L,
      "stage 0 must retain everything")
  }

  test("dedup_impact_by_source sums to the corpus-level dup count") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("dedup_impact_by_source")(
      spark, sf).collect()
    val totalDupes = rows.map(_.getLong(2)).sum
    val docs = graft.Tables.documents(spark, sf)
    val expected = docs.count() -
      docs.groupBy(md5(col("text"))).count().count()
    assert(totalDupes == expected,
      s"per-source dupes $totalDupes != corpus dupes $expected")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"source ${r.get(0)}: more dupes than docs")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L,
        s"source ${r.get(0)}: removed share outside [0, 1e6]")
    }
  }
}
