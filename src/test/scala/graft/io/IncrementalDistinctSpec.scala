package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental HLL distinct state: estimate parity with a from-scratch
  * rebuild (register-max union is order-independent, so equality is
  * EXACT, not within-tolerance), replay idempotence, and key-type
  * preservation through the v0 template. */
class IncrementalDistinctSpec extends SparkSpec {

  private def batch(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("day_key", "user")
  }

  private def estMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("estimates equal a from-scratch rebuild after every update") {
    val t = tmpDir("incdist")
    val b1 = batch((1L, "u1"), (1L, "u2"), (2L, "u1"))
    val b2 = batch((1L, "u2"), (1L, "u3"), (3L, "u9"))
    val b3 = batch((2L, "u1"), (2L, "u2"), (2L, "u2"), (1L, "u1"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    Seq(("b1", b1), ("b2", b2), ("b3", b3)).foreach { case (id, b) =>
      IncrementalDistinct.update(spark, t, b, Seq("day_key"), "user", id)
      seen += b
      val live = estMap(IncrementalDistinct.estimates(
        spark, t, Seq("day_key"), Some(b)))
      val rebuilt = estMap(seen.reduce(_ unionByName _)
        .where(col("user").isNotNull)
        .groupBy(col("day_key"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user")))
          .as("distinct_est")))
      assert(live === rebuilt, s"divergence after $id")
    }
    // tiny cardinalities: HLL is exact in sparse mode — pin the values
    val fin = estMap(IncrementalDistinct.estimates(
      spark, t, Seq("day_key"), Some(b1)))
    assert(fin === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("replaying an applied batch id is a no-op") {
    val t = tmpDir("incdist-replay")
    val b = batch((1L, "u1"), (1L, "u2"))
    IncrementalDistinct.update(spark, t, b, Seq("day_key"), "user", "b1")
    val before = estMap(IncrementalDistinct.estimates(
      spark, t, Seq("day_key"), Some(b)))
    // same id again — even with DIFFERENT rows, the fold must not apply
    IncrementalDistinct.update(spark, t,
      batch((1L, "u3"), (9L, "u9")), Seq("day_key"), "user", "b1")
    val after = estMap(IncrementalDistinct.estimates(
      spark, t, Seq("day_key"), Some(b)))
    assert(after === before)
    assert(IncrementalDistinct.appliedBatches(spark, t) === Set("b1"))
  }

  test("v0 template preserves non-string key types; null values ignored") {
    val t = tmpDir("incdist-types")
    val b = batch((5L, "u1"), (5L, null), (6L, null))
    val live = IncrementalDistinct.update(
      spark, t, b, Seq("day_key"), "user", "b1")
    assert(live.schema("day_key").dataType ===
      org.apache.spark.sql.types.LongType)
    val est = estMap(IncrementalDistinct.estimates(
      spark, t, Seq("day_key"), Some(b)))
    // day 6 had only null users → no sketch row at all (like COUNT DISTINCT
    // over zero non-null values yielding no group in the delta agg)
    assert(est === Map(5L -> 1L))
  }
}
