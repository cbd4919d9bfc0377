package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** emb_recall_at_k's build-once stores: each serve-from-store path
  * must be RESULT-IDENTICAL to its inline build-and-query sibling —
  * the contract that lets the recall query keep the inline builders'
  * oracle SQL while only serving committed indexes. */
class RecallStoreSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("serve-from-store ≡ inline build for all four index legs; " +
      "second ensureStores call is a no-op reuse") {
    val s = spark
    val root = RecallQueries.ensureStores(s, d)
    val emb = graft.Tables.embeddings(s, d)

    assert(rows(SimilarityQueries.knnLshServe(emb,
        s.read.parquet(s"$root/lsh_buckets"))) ==
      rows(SimilarityQueries.knnLsh(emb)), "lsh serve ≡ inline")

    assert(rows(SimilarityQueries.knnPqServe(emb,
        s.read.parquet(s"$root/pq_codes"),
        SimilarityQueries.pqBooks(emb))) ==
      rows(SimilarityQueries.knnPq(emb)), "pq serve ≡ inline")

    assert(rows(SimilarityQueries.ivfServe(s, emb,
        SimilarityQueries.ivfFit(emb), s"$root/ivf")) ==
      rows(SimilarityQueries.knnIvf(emb)), "ivf serve ≡ inline")

    assert(rows(SimilarityQueries.knnGraphQuery(s, emb,
        s"$root/graph_edges")) ==
      rows(SimilarityQueries.knnGraphServe(s, d,
        tmpDir("recall_graph_inline") + "/edges")),
      "graph serve ≡ inline build+serve")

    // reuse: the marker matches the corpus fingerprint → same root,
    // stores untouched (mtime of the committed ivf pointer unchanged)
    val ptr = new java.io.File(s"$root/ivf/_CURRENT")
    val mt = ptr.lastModified()
    assert(RecallQueries.ensureStores(s, d) == root)
    assert(ptr.lastModified() == mt, "a fresh-fingerprint store is reused")
  }

  test("a corpus regeneration invalidates the store (fingerprint " +
      "mismatch forces a rebuild)") {
    val s = spark
    val root = RecallQueries.ensureStores(s, d)
    val marker = new java.io.File(root, "_BUILT")
    java.nio.file.Files.writeString(marker.toPath, "stale-fingerprint")
    val ptr = new java.io.File(s"$root/ivf/_CURRENT")
    val mt = ptr.lastModified()
    assert(RecallQueries.ensureStores(s, d) == root)
    assert(java.nio.file.Files.readString(marker.toPath) !=
      "stale-fingerprint", "marker rewritten with the true fingerprint")
    assert(ptr.lastModified() >= mt, "store rebuilt from scratch")
    assert(new java.io.File(s"$root/graph_edges/_CURRENT").isFile)
  }
}
