package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorOps

/** emb_knn_lsh_multiprobe's contract beyond the oracle replay: the
  * Hamming-1 probe set must (a) contain every single-bucket hit — so
  * multiprobe recall dominates plain one-table LSH by construction —
  * and (b) match, hit for hit, the brute-force definition "corpus
  * vectors whose bucket differs from the query's in at most one bit".
  * Proven on sf0.001 against driver-side bit arithmetic. */
class MultiprobeLshSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("probe union equals the Hamming<=1 bucket definition") {
    import graft.Tables
    val emb = Tables.embeddings(spark, sf)
      .withColumn("bucket",
        VectorOps.lshBucket(col("embedding"), dim = 64, nBits = 8))
      .select(col("vec_id"), col("bucket"))
      .cache()
    try {
      val all = emb.collect().map(r => r.getLong(0) -> r.getLong(1))
      val buckets = all.toMap
      val qs = all.filter(_._1 < 10)
      assert(qs.nonEmpty, "no query vectors at sf0.001")

      // brute force: popcount(bucket xor qbucket) <= 1, excluding self
      val brute = (for {
        (qid, qb) <- qs
        (cid, cb) <- all
        if cid != qid &&
          java.lang.Long.bitCount(qb ^ cb) <= 1
      } yield (qid, cid)).toSet

      // engine shape: 9 probe keys, bucket equi-join
      val probes = col("bucket") +:
        (0 until 8).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          explode(array(probes: _*)).as("probe"))
      val got = emb
        .join(q, col("bucket") === col("probe")
          && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(got == brute,
        s"probe union diverges from Hamming<=1: " +
          s"${(got diff brute).take(5)} extra, " +
          s"${(brute diff got).take(5)} missing")

      // dominance: single-bucket (plain LSH) hits are a subset
      val single = (for {
        (qid, qb) <- qs
        (cid, cb) <- all
        if cid != qid && qb == cb
      } yield (qid, cid)).toSet
      assert(single.subsetOf(got),
        "multiprobe candidate set lost single-bucket hits")
    } finally { emb.unpersist(); () }
  }
}
