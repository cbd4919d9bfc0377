package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra–Gries sketch: the frequent-item guarantee must survive Spark's
  * partial/final aggregation (serialize → shuffle → merge), not just a
  * single in-memory stream — that is what makes it usable at scale. */
class HeavyHittersSpec extends SparkSpec {

  private def hh(col: org.apache.spark.sql.DataFrame, capacity: Int) =
    col.agg(HeavyHitters.heavy_hitters(org.apache.spark.sql.functions.col("w"),
      capacity).as("cand"))
      .head().getSeq[String](0)

  test("guarantee: every item above n/(capacity+1) survives the sketch") {
    val s = spark
    import s.implicits._
    // 20 heavy items x200 + 5000 singleton noise items, vocab >> capacity
    val heavy = (0 until 20).flatMap(i => Seq.fill(200)(f"heavy_$i%02d"))
    val noise = (0 until 5000).map(i => s"noise_$i")
    val df = (heavy ++ noise).toDF("w")
    // n = 9000, capacity 64 -> bound ~138.5 < 200: all heavies must survive
    val cand = hh(df, 64)
    val missing = (0 until 20).map(i => f"heavy_$i%02d").filterNot(cand.contains)
    assert(missing.isEmpty, s"guarantee violated, lost: $missing")
    assert(cand.size <= 64)
  }

  test("guarantee holds across partial/final merges (16 partitions)") {
    val s = spark
    import s.implicits._
    val heavy = (0 until 20).flatMap(i => Seq.fill(200)(f"heavy_$i%02d"))
    val noise = (0 until 5000).map(i => s"noise_$i")
    // adversarial layout: heavies clumped in few partitions, noise spread
    val df = (heavy ++ noise).toDF("w").repartition(16)
    val cand = hh(df, 64)
    val missing = (0 until 20).map(i => f"heavy_$i%02d").filterNot(cand.contains)
    assert(missing.isEmpty, s"merge broke the guarantee, lost: $missing")
    assert(cand.size <= 64)
  }

  test("vocab within capacity: sketch is exact (all items, sorted)") {
    val s = spark
    import s.implicits._
    val df = Seq("c", "a", "b", "a", "c", "a").toDF("w").repartition(3)
    assert(hh(df, 8) == Seq("a", "b", "c"))
  }

  test("nulls are skipped") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("w")
    assert(hh(df, 8) == Seq("a", "b"))
  }

  test("sketch + exact recount reproduces the true top-k") {
    val s = spark
    import s.implicits._
    val heavy = (0 until 10).flatMap(i => Seq.fill(300 + 10 * i)(f"h$i%02d"))
    val noise = (0 until 3000).map(i => s"noise_$i")
    val w = (heavy ++ noise).toDF("w").repartition(8)

    val cand = w.agg(HeavyHitters.heavy_hitters(col("w"), 64).as("c"))
      .select(explode(col("c")).as("w"))
    val got = w.join(broadcast(cand), "w")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val want = w.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    assert(got == want)
  }
}
