package graft.queries

import org.apache.spark.sql.functions._

/** Index-quality measurement: recall@k of each ANN index against the
  * brute-force ground truth — the number a user checks before trusting
  * an index at scale (an oracle-exact index build says the MATH is
  * right; recall says the INDEX is useful). Reuses the existing Q
  * entries on both sides: the engine re-runs their builders, the oracle
  * embeds their SQL as derived tables, so the measured indexes are
  * exactly the shipped ones — no drift between what's measured and
  * what's served. All-integer output (hits, ppm) → fully deterministic.
  */
object RecallQueries {

  private def q(name: String): Q =
    SimilarityQueries.all.find(_.name == name)
      .getOrElse(sys.error(s"RecallQueries: no such query $name"))

  val all: Seq[Q] = Seq(
    Q(
      "emb_recall_at_k", {
        val brute = q("emb_knn_brute").oracle.get
        val lsh = q("emb_knn_lsh").oracle.get
        val ivf = q("emb_knn_ivf").oracle.get
        val pq = q("emb_knn_pq").oracle.get
        s"""WITH brute AS (SELECT q_id, vec_id, rank FROM ($brute)),
           |i_lsh AS (SELECT q_id, vec_id FROM ($lsh)),
           |i_ivf AS (SELECT q_id, vec_id FROM ($ivf)),
           |i_pq AS (SELECT q_id, vec_id FROM ($pq)),
           |m AS (
           |  SELECT 'ivf' AS index_name, 3 AS k,
           |    (SELECT COUNT(*) FROM brute b
           |       JOIN i_ivf i USING (q_id, vec_id) WHERE b.rank <= 3)
           |    AS hits
           |  UNION ALL
           |  SELECT 'lsh', 3,
           |    (SELECT COUNT(*) FROM brute b
           |       JOIN i_lsh i USING (q_id, vec_id) WHERE b.rank <= 3)
           |  UNION ALL
           |  SELECT 'pq', 5,
           |    (SELECT COUNT(*) FROM brute b
           |       JOIN i_pq i USING (q_id, vec_id) WHERE b.rank <= 5)),
           |nq AS (SELECT COUNT(DISTINCT q_id) AS n_queries FROM brute)
           |SELECT index_name, CAST(k AS BIGINT) AS k,
           |  CAST(n_queries AS BIGINT) AS n_queries,
           |  CAST(n_queries * k AS BIGINT) AS possible,
           |  CAST(hits AS BIGINT) AS hits,
           |  CAST(hits * 1000000 // (n_queries * k) AS BIGINT) AS recall_ppm
           |FROM m CROSS JOIN nq
           |ORDER BY index_name""".stripMargin
      }
    ) { (s, d) =>
      // ONE persisted corpus scan shared by the ground truth and all
      // three index builds (and their k-means trainings — eager driver
      // loops that would otherwise each re-read the parquet): the
      // builds are the same parameterized functions the standalone Q
      // entries call, so the measured indexes are still exactly the
      // shipped ones. The eager count() materializes the cache before
      // the trainings run; CacheManager dedupes by canonicalized plan,
      // so repeated invocations (bench samples) reuse one cache entry
      // rather than stacking new ones.
      import org.apache.spark.storage.StorageLevel
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      import s.implicits._
      // ONE persisted corpus scan shared by everything downstream,
      // materialized before any fork so concurrent readers hit the
      // cache instead of racing to build it
      val emb = graft.Tables.embeddings(s, d)
        .persist(StorageLevel.MEMORY_AND_DISK)
      emb.count()
      // ground truth ONCE, persisted (50 rows): it feeds all three hit
      // joins plus the n_queries count, and Spark does no cross-branch
      // subtree dedup — unshared, the full cosine scan would re-execute
      // four times
      val brute = SimilarityQueries.knnBrute(emb)
        .select(col("q_id"), col("vec_id"), col("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // each index chain — build (incl. its eager k-means training),
      // join vs ground truth, count hits — runs in its OWN thread:
      // Catalyst analysis + whole-stage codegen are driver-side and
      // per-plan, so threading overlaps the compile of PQ's large ADC
      // expression tree with IVF's training jobs, not just the cluster
      // work. Results are deterministic regardless of interleaving.
      def hitsOf(idx: org.apache.spark.sql.DataFrame, k: Int): Long =
        brute.where(col("rank") <= k)
          .join(idx.select(col("q_id"), col("vec_id")),
            Seq("q_id", "vec_id"))
          .count()
      // fork the TRAINED chains first: their Lloyd iterations buy the
      // main thread time to materialize the ground-truth cache they
      // will join at the end; the training-free LSH chain starts only
      // after brute is cached (it would otherwise race to compute it)
      val ivfF = Future(hitsOf(SimilarityQueries.knnIvf(emb), 3))
      val pqF = Future(hitsOf(SimilarityQueries.knnPq(emb), 5))
      val nQueries: Long = brute.select(countDistinct(col("q_id")))
        .as[Long].head()
      val lshF = Future(hitsOf(SimilarityQueries.knnLsh(emb), 3))
      def row(tag: String, k: Long, f: Future[Long]) = {
        val hits = Await.result(f, Duration.Inf)
        (tag, k, nQueries, nQueries * k, hits,
          hits * 1000000L / (nQueries * k))
      }
      // already index_name-ordered: ivf < lsh < pq
      Seq(row("ivf", 3, ivfF), row("lsh", 3, lshF), row("pq", 5, pqF))
        .toDF("index_name", "k", "n_queries", "possible", "hits",
          "recall_ppm")
    }
  )
}
