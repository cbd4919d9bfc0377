package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Claims of the composed IVF+PQ serve that the oracle equality cannot
  * state: scoring parity with the pure-PQ path (the ADC arithmetic must
  * be the SAME kernel, not a reimplementation), and cluster-level recall
  * on a trivially separable corpus (candidate restriction must not lose
  * the true neighbors when the coarse quantizer captures the structure).
  */
class IvfPqSpec extends SparkSpec {

  /** 8 well-separated clusters of 10 vectors on basis dims 0..7; queries
    * (vec_id < 10) are cluster 0, so their true neighbors are their
    * cluster twins. */
  private lazy val dir: String = {
    val d = tmpDir("ivfpq")
    val dim = 64
    val rows = for (cluster <- 0 until 8; i <- 0 until 10) yield {
      val id = cluster * 10 + i
      val v = new Array[Float](dim)
      v(cluster) = 1f
      v(16 + (id % 8)) = 0.05f * ((id % 3) + 1)
      Row(id.toLong, v.toSeq, cluster)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("IVFPQ finds the cluster twins of every query on separable data") {
    val emb = graft.Tables.embeddings(spark, dir)
    val rows = SimilarityQueries.knnIvfPq(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.length == 10 * 5, s"expected 10 queries x top-5: ${rows.length}")
    // every returned neighbor of a cluster-0 query is a cluster-0 twin:
    // the probe keeps cell 0 and ADC ranks the twins first
    assert(rows.forall { case (_, neighbor, _, _) => neighbor < 10 },
      s"non-twin neighbor served: ${rows.filterNot(_._2 < 10).toSeq}")
  }

  test("ADC scores agree bit-for-bit with the pure-PQ path on shared pairs") {
    val emb = graft.Tables.embeddings(spark, dir)
    def scores(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivfpq = scores(SimilarityQueries.knnIvfPq(emb))
    val pq = scores(SimilarityQueries.knnPq(emb))
    val shared = ivfpq.keySet.intersect(pq.keySet)
    assert(shared.nonEmpty, "no shared (query, candidate) pairs to compare")
    val drift = shared.filter(k => ivfpq(k) != pq(k))
    assert(drift.isEmpty, s"ADC drift on ${drift.toSeq.sortBy(identity)}")
  }
}
