package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the shared-scan shape of `emb_recall_at_k` (verdict r6: the
  * query re-read and re-computed the same corpus four times): the
  * harness persists the corpus and the 50-row ground truth once, runs
  * the three index chains concurrently against those caches, and must
  * produce EXACTLY the numbers a from-scratch join of the standalone Q
  * entries yields — the builds are the same parameterized functions, so
  * nothing can drift between what's measured and what's served.
  */
class RecallCacheSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("emb_recall_at_k registers the corpus and ground truth in the " +
      "cache manager (one scan shared by all four builds)") {
    val recall = RecallQueries.all.find(_.name == "emb_recall_at_k").get
    val df = recall.run(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 4, rows.mkString("\n"))
    // Dataset.storageLevel consults the cache manager by canonicalized
    // plan — NONE would mean the corpus was not registered as cached
    val emb = graft.Tables.embeddings(spark, sfDir)
    assert(emb.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "embeddings corpus must be registered in the cache manager")
    val brute = SimilarityQueries.knnBrute(emb)
      .select(col("q_id"), col("vec_id"), col("rank"))
    assert(brute.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "the brute-force ground truth must be registered in the cache manager")
  }

  test("recall numbers equal a from-scratch join of the standalone Q " +
      "entries (shared-scan refactor changed the plan, not the math)") {
    val recall = RecallQueries.all.find(_.name == "emb_recall_at_k").get
      .run(spark, sfDir).collect()
      .map(r => r.getAs[String]("index_name") ->
        (r.getAs[Long]("hits"), r.getAs[Long]("possible"),
          r.getAs[Long]("recall_ppm"))).toMap

    def standalone(name: String) =
      SimilarityQueries.all.find(_.name == name).get.run(spark, sfDir)
    val brute = standalone("emb_knn_brute")
      .select(col("q_id"), col("vec_id"), col("rank"))
    val nq = brute.select(countDistinct(col("q_id"))).head().getLong(0)
    def expected(name: String, k: Int) = {
      val hits = brute.where(col("rank") <= k)
        .join(standalone(name).select(col("q_id"), col("vec_id")),
          Seq("q_id", "vec_id")).count()
      (hits, nq * k, hits * 1000000L / (nq * k))
    }
    assert(recall("lsh") == expected("emb_knn_lsh", 3))
    assert(recall("ivf") == expected("emb_knn_ivf", 3))
    assert(recall("pq") == expected("emb_knn_pq", 5))
    assert(recall("graph") == expected("emb_knn_graph", 3))
  }

  test("standalone index queries and the recall harness share builders " +
      "(same results by construction)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val viaQ = SimilarityQueries.all.find(_.name == "emb_knn_ivf").get
      .run(spark, sfDir).collect().map(_.toSeq).toSeq
    val direct = SimilarityQueries.knnIvf(emb).collect().map(_.toSeq).toSeq
    assert(viaQ == direct)
  }
}
