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
      // ground truth once; each index's top-k joined against it on
      // (q_id, vec_id) — 50-row frames, so the joins are trivial; the
      // cost is rebuilding the indexes themselves, which is the point
      // (measure the shipped build, not a snapshot of it)
      val brute = q("emb_knn_brute").run(s, d)
        .select(col("q_id"), col("vec_id"), col("rank"))
      def hitsOf(tag: String, name: String, k: Int) =
        brute.where(col("rank") <= k)
          .join(q(name).run(s, d).select(col("q_id"), col("vec_id")),
            Seq("q_id", "vec_id"))
          .agg(count(lit(1)).as("hits"))
          .select(lit(tag).as("index_name"), lit(k.toLong).as("k"),
            col("hits"))
      val m = hitsOf("lsh", "emb_knn_lsh", 3)
        .unionByName(hitsOf("ivf", "emb_knn_ivf", 3))
        .unionByName(hitsOf("pq", "emb_knn_pq", 5))
      val nq = brute.agg(countDistinct(col("q_id")).as("n_queries"))
      m.crossJoin(broadcast(nq))
        .select(col("index_name"), col("k"), col("n_queries"),
          (col("n_queries") * col("k")).as("possible"), col("hits"),
          expr("CAST(hits * 1000000 div (n_queries * k) AS BIGINT)")
            .as("recall_ppm"))
        .orderBy(col("index_name"))
    }
  )
}
