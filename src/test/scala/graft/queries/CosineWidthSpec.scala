package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorOps

/** The corpus-sized LSH width ladder behind `dedup_embedding_cosine`
  * ([[VectorOps.lshWidthFor]]): recall of true near-duplicates is
  * preserved as the width adapts, and occupancy — the quantity whose
  * quadratic blow-up the ladder exists to stop — stays bounded. */
class CosineWidthSpec extends SparkSpec {

  private val Dim = 64

  /** `n` seeded gaussian vectors plus `nDups` EXACT duplicate pairs
    * (ids n..n+nDups-1 duplicate ids 0..nDups-1) — the fresh-vector
    * analogue: random vectors are mutually near-orthogonal, so the
    * planted pairs are the only cosine ≥ 0.4 pairs by construction at
    * small n, and at any n they are the only cos = 1.0 rows. */
  private def corpus(n: Int, nDups: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val base = Array.fill(n)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (0 until nDups).map(i => ((n + i).toLong, base(i)))
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("width ladder: integer thresholds, clamped, monotone; sf0.01 " +
      "and sf0.1 corpora stay at 8 bits (bench/baseline continuity)") {
    assert(VectorOps.lshWidthFor(500) == 8, "sf0.01 tier")
    assert(VectorOps.lshWidthFor(2000) == 8, "sf0.1 bench tier")
    assert(VectorOps.lshWidthFor(2048) == 8)
    assert(VectorOps.lshWidthFor(2049) == 9)
    assert(VectorOps.lshWidthFor(20000) == 12, "×10 sweep tier")
    assert(VectorOps.lshWidthFor(200000) == 15, "×100 tier")
    assert(VectorOps.lshWidthFor(Long.MaxValue) == 24, "clamped")
    val widths = (1L to 21L).map(e => VectorOps.lshWidthFor(1L << e))
    assert(widths == widths.sorted, "monotone in corpus size")
  }

  test("planted exact-duplicate pairs are found at EVERY width " +
      "(widening only appends bits), and the adaptive width cuts " +
      "bucket occupancy below the fixed-8-bit saturation") {
    val s = spark
    import s.implicits._
    val n = 30000
    val emb = corpus(n, nDups = 5).cache()
    val adaptive = VectorOps.lshWidthFor(n + 5)
    assert(adaptive == 12, "this corpus must exercise a ×16-wider key")
    val planted = (0 until 5).map(i => (i.toLong, (n + i).toLong)).toSet
    for (w <- Seq(8, adaptive)) {
      val pairs = SimilarityQueries.cosineNearDupPairs(emb, w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(planted.subsetOf(pairs),
        s"width $w must find every planted duplicate pair")
    }
    // occupancy: candidate-pair volume Σ occ·(occ−1)/2 must shrink
    // with the wider key — this is the n² term the ladder bounds
    def candPairs(w: Int): Long =
      emb.withColumn("bucket",
          VectorOps.lshBucket(col("embedding"), Dim, w))
        .groupBy("bucket").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
        .head().getLong(0)
    val c8 = candPairs(8)
    val cAdaptive = candPairs(adaptive)
    assert(cAdaptive * 4 < c8,
      s"adaptive width must cut candidate volume ≥4×: 8-bit=$c8, " +
        s"$adaptive-bit=$cAdaptive")
    // and the adaptive volume is near-linear: ≤ a small multiple of n
    assert(cAdaptive < 16L * (n + 5),
      s"occupancy-targeted width keeps candidates O(n): $cAdaptive")
    emb.unpersist()
    ()
  }

  test("narrow bucket is a coarsening of the wide one (prefix-stable " +
      "planes): equal wide buckets ⇒ equal narrow buckets") {
    val s = spark
    import s.implicits._
    val emb = corpus(200, 0)
    val both = emb.select(
      VectorOps.lshBucket(col("embedding"), Dim, 8).as("b8"),
      VectorOps.lshBucket(col("embedding"), Dim, 12).as("b12"))
      .as[(Long, Long)].collect()
    assert(both.forall { case (b8, b12) => (b12 & 0xFFL) == b8 },
      "the first 8 bits of the 12-bit key ARE the 8-bit key")
  }
}
