package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def pointsDf(vs: Double*) = {
    val s = spark
    import s.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
  }

  private def intervalsDf(iv: (Long, Double, Double)*) = {
    val s = spark
    import s.implicits._
    iv.toDF("band_id", "lo", "hi")
  }

  test("matches the naive theta join, overlapping intervals included") {
    val pts = pointsDf(0.0, 5.0, 24.999, 25.0, 49.9, 75.0, 120.0, -3.0)
    val ivs = intervalsDf(
      (0L, 0.0, 50.0), (1L, 25.0, 75.0),   // overlap: 25..50 double-match
      (2L, 75.0, 125.0), (3L, -10.0, 0.0)) // negative lo
    val fast = RangeJoin
      .pointInInterval(pts, ivs, "v", "lo", "hi", bucketWidth = 25.0)
      .select("pid", "band_id")
    val naive = pts.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "band_id")
    val f = fast.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(f.sameElements(n), s"fast ${f.toSeq} != naive ${n.toSeq}")
    // the overlap region really produces two matches
    assert(f.count(_._1 == 4L) == 2) // 49.9 ∈ [0,50) and [25,75)
    // hi is exclusive, lo inclusive: 75.0 ∉ [25,75) but ∈ [75,125)
    assert(f.contains((5L, 2L)) && !f.contains((5L, 1L)))
  }

  test("bucket width does not change the result") {
    val pts = pointsDf((0 until 50).map(_ * 3.7): _*)
    val ivs = intervalsDf((0L, 10.0, 60.0), (1L, 55.0, 57.0), (2L, 100.0, 180.5))
    def run(w: Double) = RangeJoin
      .pointInInterval(pts, ivs, "v", "lo", "hi", w)
      .select("pid", "band_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(1.0) == run(25.0) && run(25.0) == run(1000.0))
  }

  test("plans as an equi-join, not a nested-loop join") {
    val pts = pointsDf(1.0, 2.0)
    val ivs = intervalsDf((0L, 0.0, 10.0))
    val plan = RangeJoin
      .pointInInterval(pts, ivs, "v", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
