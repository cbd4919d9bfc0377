package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error-envelope and merge-invariance checks for the merging t-digest —
  * the properties the rank-space oracle of q_tdigest_mergeable_quantiles
  * asserts only once, at one corpus shape.
  */
class TDigestSpec extends SparkSpec {

  private def rankError(values: Array[Double], est: Double, q: Double): Double = {
    val below = values.count(_ < est).toDouble
    val atOrBelow = values.count(_ <= est).toDouble
    val target = q * values.length
    // distance from the target rank to the [below, atOrBelow] interval
    val d = if (target < below) below - target
            else if (target > atOrBelow) target - atOrBelow
            else 0.0
    d / values.length
  }

  private val qs = Seq(0.01, 0.1, 0.5, 0.9, 0.99)

  test("rank error stays under 1% on uniform and heavy-tailed data") {
    val rnd = new Random(42)
    val uniform = Array.fill(50000)(rnd.nextDouble() * 1000)
    val lognorm = Array.fill(50000)(math.exp(rnd.nextGaussian() * 2))
    for (data <- Seq(uniform, lognorm)) {
      val st = new TDigest.State(200)
      data.foreach(st.add(_, 1L))
      for (q <- qs) {
        val est = st.quantile(q).get
        val err = rankError(data, est, q)
        assert(err <= 0.01, s"rank error $err at q=$q")
      }
    }
  }

  test("merging 20 partial digests preserves the error envelope") {
    val rnd = new Random(7)
    val data = Array.fill(40000)(math.exp(rnd.nextGaussian() * 1.5))
    val merged = new TDigest.State(200)
    data.grouped(2000).foreach { chunk =>
      val part = new TDigest.State(200)
      chunk.foreach(part.add(_, 1L))
      merged.absorb(part.serialized)
    }
    for (q <- qs) {
      val est = merged.quantile(q).get
      val err = rankError(data, est, q)
      assert(err <= 0.015, s"post-merge rank error $err at q=$q")
    }
  }

  test("centroid count is bounded by O(compression), not data size") {
    val rnd = new Random(3)
    val st = new TDigest.State(100)
    (1 to 200000).foreach(_ => st.add(rnd.nextDouble(), 1L))
    st.compress()
    assert(st.means.size <= 200,
      s"${st.means.size} centroids for compression 100")
    // and the digest serializes small: the whole point of the rollup
    assert(st.serialized.length <= 8 + 200 * 16)
  }

  test("quantiles are monotone in q and exact on tiny inputs") {
    val st = new TDigest.State(200)
    Seq(5.0, 1.0, 3.0).foreach(st.add(_, 1L))
    val ests = qs.map(st.quantile(_).get)
    assert(ests == ests.sorted, s"non-monotone: $ests")
    assert(st.quantile(0.0).get == 1.0 && st.quantile(1.0).get == 5.0)
    assert(new TDigest.State(200).quantile(0.5).isEmpty)
  }

  test("Spark two-phase aggregation matches a single-node digest") {
    val rnd = new Random(11)
    val data = Array.fill(20000)(rnd.nextGaussian() * 50 + 100)
    import spark.implicits._
    // 16 partitions force real partial/merge traffic through
    // serialize/deserialize; the group-then-merge leg exercises the
    // stored-rollup path (sketch per group, merge_agg at read).
    val df = spark.sparkContext.parallelize(data.toSeq, 16)
      .toDF("v").withColumn("g", pmod(crc32(col("v").cast("string")), lit(8)))
    val direct = df.agg(TDigest.sketch_agg(col("v")).as("sk"))
      .select(TDigest.quantile(col("sk"), 0.5), TDigest.quantile(col("sk"), 0.99))
      .head()
    val rolled = df.groupBy(col("g"))
      .agg(TDigest.sketch_agg(col("v")).as("sk"))
      .agg(TDigest.merge_agg(col("sk")).as("msk"))
      .select(TDigest.quantile(col("msk"), 0.5), TDigest.quantile(col("msk"), 0.99))
      .head()
    for ((est, q) <- Seq(direct.getDouble(0) -> 0.5, direct.getDouble(1) -> 0.99,
        rolled.getDouble(0) -> 0.5, rolled.getDouble(1) -> 0.99)) {
      val err = rankError(data, est, q)
      assert(err <= 0.015, s"Spark-path rank error $err at q=$q (est $est)")
    }
    // nulls are ignored; an all-null column digests to the empty sketch
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    val r = nulls.agg(TDigest.sketch_agg(col("v")).as("sk"))
      .select(TDigest.quantile(col("sk"), 0.5)).head()
    assert(r.isNullAt(0))
  }
}
