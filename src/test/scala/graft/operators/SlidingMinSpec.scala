package graft.operators

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SlidingMin.trailing]] must equal the single-partition RANGE window
  * exactly — the two-bucket decomposition's whole point is changing the
  * PLAN (per-(key, bucket) partitions, incremental frames), never the
  * answer. Random data straddles bucket boundaries, carries ord ties
  * (including probe-threshold ties at exactly t−W), and includes rows
  * whose window reaches before the key's first event.
  */
class SlidingMinSpec extends SparkSpec {

  private val W = 97L // bucket size deliberately off every data period

  test("trailing min equals the single-partition RANGE window on random " +
      "data with ties and boundary ords") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val rows = Seq.tabulate(800) { i =>
      val key = rnd.nextInt(5).toLong
      // cluster ords so ties and exact multiples of W occur
      val ord = (rnd.nextInt(60) * 10 + rnd.nextInt(3)).toLong
      (key, ord, rnd.nextInt(100000).toLong, i.toLong)
    } ++ Seq( // hand-planted edges: exact bucket boundaries and t−W ties
      (9L, 0L, 5L, 900L), (9L, W, 4L, 901L), (9L, 2 * W, 3L, 902L),
      (9L, W - 1, 6L, 903L), (9L, W + 1, 7L, 904L),
      (8L, 5L, 50L, 905L), (8L, 5L + W, 60L, 906L), // probe hits 5 exactly
      (7L, 3L, 1L, 907L)) // singleton key
    val df = rows.toDF("key", "ord", "value", "id")

    val naive = Window.partitionBy(col("key")).orderBy(col("ord"))
      .rangeBetween(-W, 0)
    val want = df.withColumn("m", min(col("value")).over(naive))
      .select(col("id"), col("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val got = SlidingMin.trailing(df, "key", "ord", "value", "id", W, "m")
      .select(col("id"), col("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("probeFilter: only satisfying rows get an answer, others NULL; " +
      "row count and columns preserved") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 7L, 0L, "a"), (1L, 12L, 3L, 1L, "b"),
      (1L, 200L, 9L, 2L, "a"), (2L, 12L, 1L, 3L, "b"))
      .toDF("key", "ord", "value", "id", "tag")
    val out = SlidingMin.trailing(df, "key", "ord", "value", "id", W, "m",
      probeFilter = col("tag") === "a")
    assert(out.count() == 4)
    assert(out.columns.toSeq ==
      Seq("key", "ord", "value", "id", "tag", "m"))
    val m = out.select(col("id"), col("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // id 0: window [−87, 10] → min(7) = 7; id 2: window [103, 200] → 9
    assert(m == Map(0L -> Some(7L), 1L -> None, 2L -> Some(9L),
      3L -> None))
  }

  test("plan: no single-key window partition — both passes partition by " +
      "(key, bucket)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 7L, 0L)).toDF("key", "ord", "value", "id")
    val plan = SlidingMin.trailing(df, "key", "ord", "value", "id", W, "m")
      .queryExecution.optimizedPlan.toString
    // every Window node must carry the bucket in its partition spec
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition"))
    windowSpecs.foreach { l =>
      assert(l.contains("__bkt"),
        s"window without the bucket in its partition spec:\n$l")
    }
  }
}
