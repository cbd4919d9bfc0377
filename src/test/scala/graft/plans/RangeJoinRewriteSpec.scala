package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-level range-join decomposition: same results as the
  * nested-loop plan, but as a bucket equi-join the planner can hash,
  * shuffle, and skew-split. */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-rangejoin-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
  }

  private def withWidth[T](w: String)(body: => T): T = {
    spark.conf.set(RangeJoinRewrite.WidthConf, w)
    try body finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  private def points: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 1000).map(i => (i.toLong, i * 0.5)).toDF("id", "p")
  }

  private def intervals: DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, 0.0, 50.0), (1L, 40.0, 90.0), (2L, 300.0, 310.0),
      (3L, 480.0, 600.0)).toDF("band", "lo", "hi")
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("without the conf, a range join is a nested-loop plan") {
    spark.sparkContext.setLogLevel("WARN")
    val j = points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))
    assert(physical(j).contains("BroadcastNestedLoopJoin"))
  }

  test("with a bucket width, the join becomes an equi-join with " +
      "identical results") {
    val naive = points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))
      .select("id", "band").orderBy("id", "band").collect().toSeq
    assert(naive.nonEmpty)

    withWidth("25") {
      val j = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      val plan = physical(j)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not rewrite:\n$plan")
      assert(plan.contains("__graft_interval_bucket"))
      val got = j.select("id", "band").orderBy("id", "band").collect().toSeq
      assert(got == naive)
    }
  }

  test("point side on the right works too") {
    withWidth("25") {
      val j = intervals.join(points,
        col("p") >= col("lo") && col("p") < col("hi"))
      val plan = physical(j)
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      assert(j.count() ==
        points.join(intervals,
          col("p") >= col("lo") && col("p") < col("hi")).count())
    }
  }

  test("an existing cross-side equality disables the rewrite") {
    val s = spark
    import s.implicits._
    val keyedIv = intervals.withColumn("k", col("band") % 2)
    val keyedPt = points.withColumn("k", col("id") % 2)
    withWidth("25") {
      val j = keyedPt.join(keyedIv,
        keyedPt("k") === keyedIv("k") &&
          col("p") >= col("lo") && col("p") < col("hi"))
      assert(!physical(j).contains("__graft_interval_bucket"))
    }
  }

  test("inverted and NULL-bounded intervals yield no rows, no error") {
    val s = spark
    import s.implicits._
    val bad = Seq((0L, Some(90.0), Some(10.0)), (1L, None, Some(50.0)),
      (2L, Some(10.0), None)).toDF("band", "lo", "hi")
    withWidth("25") {
      val j = points.join(bad,
        col("p") >= col("lo") && col("p") < col("hi"))
      assert(!physical(j).contains("BroadcastNestedLoopJoin"))
      assert(j.count() == 0)
    }
  }

  test("operator and rule decompositions agree on the bands query shape") {
    val s = spark
    import s.implicits._
    val viaOperator = graft.operators.RangeJoin.pointInInterval(
      points, intervals, "p", "lo", "hi", bucketWidth = 25.0)
      .select("id", "band").orderBy("id", "band").collect().toSeq
    val viaRule = withWidth("25") {
      points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
        .select("id", "band").orderBy("id", "band").collect().toSeq
    }
    assert(viaOperator == viaRule)
  }
}
