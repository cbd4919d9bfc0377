package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TopK

class TopKSpec extends SparkSpec {

  private def sample: DataFrame = {
    val s = spark
    import s.implicits._
    // 3 groups; group "a" has a tie on value (ids 2,3) straddling the
    // k=2 boundary, group "c" is smaller than k
    Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 5.0), ("b", 6L, 7.0), ("b", 7L, 6.0),
      ("c", 8L, 1.0)
    ).toDF("g", "id", "v").repartition(4, col("id"))
  }

  private def windowTopK(df: DataFrame, k: Int): Set[(String, Long, Double)] = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.select(col("g"), col("id"), col("v"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= k).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def nativeTopK(df: DataFrame, k: Int): DataFrame =
    TopK.perGroup(df, k, Seq("g"), Seq(TopK.desc("v"), TopK.asc("id")))

  test("per-group top-k matches the window formulation (ties, small groups)") {
    val got = nativeTopK(sample, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == windowTopK(sample, 2))
    // tie at the k boundary resolved by the id tiebreak: id 2 in, id 4 out
    assert(got.contains(("a", 2L, 30.0)) && got.contains(("a", 3L, 30.0)))
    assert(!got.exists(t => t._1 == "a" && t._2 == 4L))
    // group smaller than k survives whole
    assert(got.contains(("c", 8L, 1.0)))
  }

  test("k larger than every group returns the input unchanged") {
    val got = nativeTopK(sample, 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == sample.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("result is partitioning-invariant (map-side pass is a pure refinement)") {
    val expected = windowTopK(sample, 2)
    for (parts <- Seq(1, 3, 7)) {
      val got = nativeTopK(sample.repartition(parts), 2).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("physical plan: partial below the exchange, final above it") {
    val plan = nativeTopK(sample, 2).queryExecution.executedPlan
    val rendered = plan.toString
    assert(rendered.contains("TopKPerGroupPartial"), rendered)
    assert(rendered.contains("TopKPerGroupFinal"), rendered)
    // partial → exchange → final: the exchange sits BETWEEN the two
    // (map-side refinement happens before rows cross the wire)
    val iFinal = rendered.indexOf("TopKPerGroupFinal")
    val iExch = rendered.indexOf("Exchange", iFinal)
    val iPartial = rendered.indexOf("TopKPerGroupPartial", iFinal)
    assert(iExch >= 0 && iPartial > iExch,
      s"expected Final > Exchange > Partial order in:\n$rendered")
  }

  test("empty input yields empty output") {
    val empty = sample.where(col("v") < 0)
    assert(nativeTopK(empty, 2).collect().isEmpty)
  }

  test("empty grouping = global top-k across all partitions") {
    // regression guard: without the AllTuples requirement each
    // partition would emit its own "top 2"
    val got = TopK.perGroup(sample.repartition(4), 2, Seq.empty,
        Seq(TopK.desc("v"), TopK.asc("id")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L), ("a", 3L))) // the two 30.0 rows
  }

  test("NULL order values follow window semantics (desc → nulls last)") {
    val s = spark
    import s.implicits._
    val df = Seq[(String, Long, Option[Double])](
      ("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(7.0)),
      ("b", 4L, None), ("b", 5L, None),
      ("c", 6L, None), ("c", 7L, Some(1.0)), ("c", 8L, Some(2.0))
    ).toDF("g", "id", "v").repartition(3, col("id"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val expected = df.select(col("g"), col("id"), col("v"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= 2).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = nativeTopK(df, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected, s"got $got expected $expected")
    // group a: 7.0 and 5.0 beat the NULL; group b is all-NULL (both kept)
    assert(got == Set(("a", 3L), ("a", 1L), ("b", 4L), ("b", 5L),
      ("c", 8L), ("c", 7L)))
  }

  test("strategy is available via GraftExtensions-free sessions (runtime registration)") {
    // TopK.perGroup registers the strategy on the session it sees — the
    // same mechanism the driver-created Verify/Bench sessions rely on
    assert(spark.experimental.extraStrategies.contains(TopKStrategy))
  }
}
