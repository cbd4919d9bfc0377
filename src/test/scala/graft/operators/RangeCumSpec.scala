package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-phase global running sums ([[RangeCum]]): must equal the
  * single-partition window exactly — including across bucket
  * boundaries, ties, and descending orders — while the plan keeps the
  * data-scale window PARTITIONED (only the bucket-totals frame takes an
  * unpartitioned window).
  */
class RangeCumSpec extends SparkSpec {

  test("exclusive sums equal the single-partition window, asc and desc, " +
      "with ties and multi-row buckets") {
    val s = spark
    import s.implicits._
    // values straddle bucket boundaries (div 10) and carry ties
    val df = Seq(3L, 7L, 7L, 9L, 10L, 11L, 25L, 25L, 25L, 40L, 41L)
      .zipWithIndex.map { case (v, i) => (s"id$i", v) }
      .toDF("id", "v")

    val wAsc = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wantAsc = df
      .withColumn("cum", coalesce(sum(col("v")).over(wAsc), lit(0L)))
      .select(col("id"), col("cum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotAsc = RangeCum.exclusive(df, expr("v div 10"),
        Seq(col("v"), col("id")), Seq((col("v"), "cum")))
      .select(col("id"), col("cum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotAsc == wantAsc, s"asc mismatch:\n got $gotAsc\nwant $wantAsc")

    val wDesc = Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wantDesc = df
      .withColumn("cum", coalesce(sum(col("v")).over(wDesc), lit(0L)))
      .withColumn("cnt", coalesce(sum(lit(1L)).over(wDesc), lit(0L)))
      .select(col("id"), col("cum"), col("cnt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val gotDesc = RangeCum.exclusive(df, expr("-(v div 10)"),
        Seq(col("v").desc, col("id")),
        Seq((col("v"), "cum"), (lit(1L), "cnt")))
      .select(col("id"), col("cum"), col("cnt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(gotDesc == wantDesc,
      s"desc mismatch:\n got $gotDesc\nwant $wantDesc")
  }

  test("the data-scale window is bucket-partitioned; only the bucket " +
      "frame takes an unpartitioned window") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (s"id$i", i.toLong)).toDF("id", "v")
    val plan = RangeCum.exclusive(df, expr("v div 10"),
        Seq(col("v"), col("id")), Seq((col("v"), "cum")))
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.size >= 2, s"expected both phase windows:\n$plan")
    // a PARTITIONED Window node prints three bracket groups
    // (functions], [partitionKeys], [order...); an unpartitioned one
    // only two. Every window over the DATA (not the _rc_tot_* bucket
    // totals) must be partitioned by the bucket key.
    val partitioned = "\\], \\[_rc_bucket#\\d+L\\], \\[".r
    val dataWindows = windows.filterNot(_.contains("_rc_tot_"))
    assert(dataWindows.nonEmpty)
    dataWindows.foreach { w =>
      assert(partitioned.findFirstIn(w).isDefined,
        s"data-scale window is not bucket-partitioned:\n$w")
    }
    // and the offsets window exists, over the bucket totals only
    assert(windows.exists(_.contains("_rc_tot_")),
      "missing the bucket-offsets window")
  }

  test("a NULL bucket fails fast instead of silently dropping rows at " +
      "the offsets equi-join") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1L)), ("b", None), ("c", Some(3L)))
      .toDF("id", "v")
    val out = RangeCum.exclusive(df, col("v") / 2,
      Seq(col("v"), col("id")), Seq((col("v"), "cum")))
    val e = intercept[Exception] { out.collect() }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(e).exists(m => m != null && m.contains(
      "bucket expression evaluated to NULL")), s"got: ${causes(e)}")
  }
}
