package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TypedAggregatorsSpec extends SparkSpec {

  private def wm = udaf(new TypedAggregators.WeightedMean,
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))

  test("weighted mean matches the closed form and ignores partitioning") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 10.0, 1.50), ("a", 20.0, 3.00), ("a", 30.0, 0.50),
      ("b", 5.0, 2.00))
      .toDF("k", "v", "w")
    def run(parts: Int) = df.repartition(parts)
      .groupBy("k").agg(wm(col("v"), col("w")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expectA = (150 * 10 + 300 * 20 + 50 * 30).toDouble / (150 + 300 + 50)
    assert(run(1)("a") == expectA && run(1)("b") == 5.0)
    // merge is associative/order-independent → any partitioning agrees
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("empty group yields NaN, not a crash") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0, 0.0)).toDF("k", "v", "w") // zero total weight
    val m = df.groupBy("k").agg(wm(col("v"), col("w")).as("m"))
      .head().getDouble(1)
    assert(m.isNaN)
  }
}
