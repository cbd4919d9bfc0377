package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextKernels, TextOps, VectorOps}

/** Hybrid retrieval over the aligned `documents`/`embeddings` pair
  * (doc_id ≡ vec_id): a lexical ranker and a semantic ranker fused by
  * reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) — the
  * standard first-stage shape of a RAG corpus-serving stack, and the
  * natural companion to the chunking (`pipe_chunk_overlap`) and BM25
  * (`text_bm25_topk`) entries.
  *
  * Scale design: both rankers are broadcast-queries × corpus-scan with
  * per-query bounded heads (row_number ≤ K under a deterministic
  * tiebreak), so the fusion join moves O(queries × K) rows — never the
  * corpus. At 100 TB the brute scans swap for the LSH/IVF index scans
  * (`emb_knn_lsh`/`emb_knn_ivf`) and the PPJoin prefix index
  * (`dedup_ppjoin`) with the SAME fused head downstream; RRF only ever
  * sees (q_id, doc_id, rank) triples, which is what makes it the
  * index-agnostic fusion layer.
  *
  * RRF arithmetic is rank-derived (1/(60+rank) in IEEE double, lexical
  * term + semantic term in fixed order), so the oracle reproduces the
  * scores bit-for-bit from the same small integers.
  */
object RetrievalQueries {

  private val NQueries = 5 // anchor docs: doc_id < 5
  private val HeadK = 20 // per-ranker head size
  private val FuseK = 10 // fused results served per query
  private val RrfK = 60 // the canonical RRF dampening constant

  /** Single-term eval queries for `retr_mrr` — the BM25 vocabulary from
    * `text_bm25_topk` (three content terms + the idf-suppressed
    * near-stopword, which exercises the all-scores-tie path). */
  private val MrrTerms = Seq("spark", "merge", "window", "the")

  /** floor(1e6 / log2(rank+1)) for ranks 1..10 — the NDCG position
    * discounts as exact integer constants (both engines consume the
    * same literals; no libm in any plan). */
  private val NdcgDiscounts: Seq[(Int, Long)] = Seq(
    1 -> 1000000L, 2 -> 630929L, 3 -> 500000L, 4 -> 430676L,
    5 -> 386852L, 6 -> 356207L, 7 -> 333333L, 8 -> 315464L,
    9 -> 301029L, 10 -> 289064L)

  /** Oracle for `retr_mrr`: the BM25 s/g CTE shape (one tf column per
    * term, corpus stats in one row), per-term score legs with EXPLICIT
    * idf × (num // den) grouping (DuckDB's `//` is left-associative at
    * `*`'s precedence — unparenthesized it would regroup the integer
    * division), the best relevant doc per term under (score DESC,
    * doc_id), and its rank restated as 1 + count(strictly-ahead). */
  private lazy val MrrOracle: String = {
    val tfs = MrrTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
    }.mkString(",\n        ")
    val dfs = MrrTerms.indices.map { i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(",\n        ")
    val legs = MrrTerms.zipWithIndex.map { case (t, i) =>
      s"""SELECT '$t' AS term, doc_id,
         |  CAST(CASE WHEN tf$i > 0 THEN
         |    (length(bin(n_docs)) - length(bin(df$i)))
         |    * ((20 * tf$i * avgdl * 1000000)
         |       // (8 * tf$i * avgdl + 3 * avgdl + 9 * dl)) ELSE 0 END
         |    AS BIGINT) AS score,
         |  tf$i > 0 AS rel FROM s, g""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (SELECT doc_id, len(toks) AS dl,
       |        $tfs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
       |        FROM documents)),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |        CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
       |          AS avgdl,
       |        $dfs
       |  FROM s),
       |sc AS ($legs),
       |best AS (SELECT term, doc_id AS best_doc, score AS bscore FROM sc
       |  WHERE rel QUALIFY row_number() OVER (PARTITION BY term
       |    ORDER BY score DESC, doc_id) = 1),
       |r AS (SELECT b.term, b.best_doc,
       |    CAST(1 + COUNT(CASE WHEN sc.score > b.bscore
       |      OR (sc.score = b.bscore AND sc.doc_id < b.best_doc)
       |      THEN 1 END) AS BIGINT) AS first_rank
       |  FROM best b JOIN sc ON sc.term = b.term
       |  GROUP BY b.term, b.best_doc)
       |SELECT term, best_doc, first_rank,
       |  CAST(1000000 // first_rank AS BIGINT) AS rr_ppm
       |FROM r ORDER BY term NULLS FIRST""".stripMargin
  }

  /** Oracle for `retr_map`: the same s/g/legs BM25 shape as
    * [[MrrOracle]], plus a per-term relevance flag (term within the
    * first 20 tokens), full per-term ranking windows, and floor-ppm
    * average precision. */
  private lazy val MapOracle: String = {
    val tfs = MrrTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
    }.mkString(",\n        ")
    val rels = MrrTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks[1:20], x -> x = '$t')) > 0 AS rel$i"
    }.mkString(",\n        ")
    val dfs = MrrTerms.indices.map { i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(",\n        ")
    val legs = MrrTerms.zipWithIndex.map { case (t, i) =>
      s"""SELECT '$t' AS term, doc_id,
         |  CAST(CASE WHEN tf$i > 0 THEN
         |    (length(bin(n_docs)) - length(bin(df$i)))
         |    * ((20 * tf$i * avgdl * 1000000)
         |       // (8 * tf$i * avgdl + 3 * avgdl + 9 * dl)) ELSE 0 END
         |    AS BIGINT) AS score,
         |  rel$i AS rel FROM s, g""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (SELECT doc_id, len(toks) AS dl,
       |        $tfs,
       |        $rels
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
       |        FROM documents)),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |        CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
       |          AS avgdl,
       |        $dfs
       |  FROM s),
       |sc AS ($legs),
       |rk AS (SELECT term, doc_id, rel,
       |    CAST(row_number() OVER (PARTITION BY term
       |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc),
       |pr AS (SELECT term, rank,
       |    CAST(row_number() OVER (PARTITION BY term ORDER BY rank)
       |      AS BIGINT) AS rel_idx
       |  FROM rk WHERE rel),
       |ap AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_rel,
       |    CAST(SUM(rel_idx * 1000000 // rank) // COUNT(*) AS BIGINT)
       |      AS ap_ppm
       |  FROM pr GROUP BY term)
       |SELECT term, n_rel, ap_ppm,
       |  CAST(SUM(ap_ppm) OVER () // COUNT(*) OVER () AS BIGINT)
       |    AS map_ppm
       |FROM ap ORDER BY term NULLS FIRST""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // --- mean-reciprocal-rank eval of the BM25 ranker ---------------------
    // The retrieval-QUALITY metric the serving entries don't measure
    // (emb_recall_at_k audits the ANN legs; nothing audits the lexical
    // leg): for each eval term, the rank of the first relevant document
    // (relevance = the term occurs) under the integer-exact BM25 order,
    // served as reciprocal rank in ppm. Rank is computed WITHOUT a
    // global sort: the best relevant doc per term is an argmax aggregate
    // (max of (score, −doc_id) structs), and its rank is
    // 1 + count(docs strictly ahead) — two corpus aggregates and a
    // 4-row broadcast, the same no-global-window discipline as
    // pipe_shard_manifest. The idf-zero term ('the') ties every score
    // at 0, proving the doc_id tiebreak path end-to-end.
    Q("retr_mrr", MrrOracle) { (s, d) =>
      val toksCol = graft.functions.TextOps.tokens(col("text"))
      val tfCols = MrrTerms.zipWithIndex.map { case (t, i) =>
        size(filter(toksCol, x => x === t)).as(s"tf$i")
      }
      val sfr = Tables.documents(s, d)
        .select(Seq(col("doc_id"), size(toksCol).as("dl")) ++ tfCols: _*)
      val dfAggs = MrrTerms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("long")
          .as(s"df$i")
      }
      val gCols = Seq(count(lit(1)).cast("long").as("n_docs"),
        expr("CAST(sum(dl) AS BIGINT) div count(*)").as("avgdl")) ++ dfAggs
      val g = sfr.agg(gCols.head, gCols.tail: _*)
      def flog2(c: org.apache.spark.sql.Column) = length(bin(c))
      val legs = MrrTerms.zipWithIndex.map { case (t, i) =>
        struct(
          lit(t).as("term"),
          ((flog2(col("n_docs")) - flog2(col(s"df$i"))).cast("long") *
            expr(s"CASE WHEN tf$i > 0 THEN (20 * tf$i * avgdl * 1000000)" +
              s" div (8 * tf$i * avgdl + 3 * avgdl + 9 * dl)" +
              " ELSE 0 END")).as("score"),
          (col(s"tf$i") > 0).as("rel"))
      }
      // one corpus pass: the four per-term legs ride an explode, not
      // four re-scans of the tf projection
      val sc = sfr.crossJoin(broadcast(g))
        .select(col("doc_id"), explode(array(legs: _*)).as("e"))
        .select(col("doc_id"), col("e.term").as("term"),
          col("e.score").as("score"), col("e.rel").as("rel"))
      val best = sc.where(col("rel"))
        .groupBy(col("term"))
        .agg(max(struct(col("score").as("s"),
          (-col("doc_id")).as("nd"))).as("b"))
        .select(col("term"), col("b.s").as("bscore"),
          (-col("b.nd")).as("best_doc"))
      sc.join(broadcast(best), "term")
        .groupBy(col("term"), col("best_doc"))
        .agg((sum(when(col("score") > col("bscore")
          || (col("score") === col("bscore")
            && col("doc_id") < col("best_doc")), 1L).otherwise(0L)) + 1L)
          .cast("long").as("first_rank"))
        .select(col("term"), col("best_doc").cast("long").as("best_doc"),
          col("first_rank"),
          expr("CAST(1000000 div first_rank AS BIGINT)").as("rr_ppm"))
        .orderBy(col("term"))
    },

    Q(
      "retr_hybrid_rrf",
      s"""WITH dt AS (SELECT doc_id,
         |    list_distinct(string_split(text, ' ')) AS toks
         |  FROM documents),
         |qd AS (SELECT doc_id AS q_id, toks AS q_toks FROM dt
         |       WHERE doc_id < $NQueries),
         |lexall AS (SELECT qd.q_id, d.doc_id,
         |    ROUND(CAST(len(list_intersect(qd.q_toks, d.toks)) AS DOUBLE)
         |      / (len(qd.q_toks) + len(d.toks)
         |         - len(list_intersect(qd.q_toks, d.toks))), 6) AS jac
         |  FROM dt d CROSS JOIN qd WHERE d.doc_id <> qd.q_id),
         |lex AS (SELECT q_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY jac DESC, doc_id) AS INT) AS lex_rank
         |  FROM lexall WHERE jac > 0 QUALIFY lex_rank <= $HeadK),
         |qe AS (SELECT vec_id AS q_id, embedding AS q_vec
         |       FROM embeddings WHERE vec_id < $NQueries),
         |semall AS (SELECT q_id, vec_id AS doc_id,
         |    ROUND(${SimilarityQueries.Sql.cos("q_vec", "embedding")}, 6)
         |      AS cos
         |  FROM embeddings CROSS JOIN qe WHERE vec_id <> q_id),
         |sem AS (SELECT q_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY cos DESC, doc_id) AS INT) AS sem_rank
         |  FROM semall WHERE cos > 0 QUALIFY sem_rank <= $HeadK),
         |f AS (SELECT COALESCE(lex.q_id, sem.q_id) AS q_id,
         |    COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         |    lex_rank, sem_rank,
         |    ROUND(COALESCE(CAST(1 AS DOUBLE) / ($RrfK + lex_rank), 0)
         |      + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + sem_rank), 0), 6)
         |      AS rrf
         |  FROM lex FULL OUTER JOIN sem
         |    ON lex.q_id = sem.q_id AND lex.doc_id = sem.doc_id)
         |SELECT q_id, doc_id, rank, rrf, lex_rank, sem_rank FROM (
         |  SELECT q_id, doc_id, rrf, lex_rank, sem_rank,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY rrf DESC, doc_id) AS INT) AS rank
         |  FROM f) WHERE rank <= $FuseK
         |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // Lexical leg: unigram-jaccard against the broadcast anchors. The
      // token-set projection is computed once per doc behind its own
      // exchange (same narrow-pairs discipline as dedup_ngram_jaccard);
      // the merge-walk jaccard kernel runs once per (anchor, doc).
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          TextOps.sortedShingleSet(TextOps.tokens(col("text")), 1)
            .as("toks"))
      val qDocs = broadcast(
        docs.where(col("doc_id") < NQueries)
          .select(col("doc_id").as("q_id"), col("toks").as("q_toks")))
      val wLex = Window.partitionBy(col("q_id"))
        .orderBy(col("jac").desc, col("doc_id"))
      val lex = docs.join(qDocs, col("doc_id") =!= col("q_id"))
        .select(col("q_id"), col("doc_id"),
          round(TextKernels.sorted_jaccard(col("q_toks"), col("toks")), 6)
            .as("jac"))
        // a ranker only returns positively-scored documents — without
        // this, zero-overlap docs occupy head slots by id order and
        // crowd genuine matches out of the fused top-k
        .where(col("jac") > 0)
        .withColumn("lex_rank", row_number().over(wLex))
        .where(col("lex_rank") <= HeadK)
        .select(col("q_id"), col("doc_id"), col("lex_rank"))
      // Semantic leg: brute cosine against the same broadcast anchors
      // (the correctness baseline; the index scan swaps in at scale).
      val emb = Tables.embeddings(s, d)
      val qVecs = broadcast(
        emb.where(col("vec_id") < NQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
      val wSem = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("doc_id"))
      val sem = emb.join(qVecs, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("doc_id"),
          round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
            .as("cos"))
        .where(col("cos") > 0)
        .withColumn("sem_rank", row_number().over(wSem))
        .where(col("sem_rank") <= HeadK)
        .select(col("q_id"), col("doc_id"), col("sem_rank"))
      // Fusion: full-outer on the two bounded heads (O(queries × K)
      // rows), rank-only arithmetic, re-rank, serve the top FuseK.
      val wRrf = Window.partitionBy(col("q_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
        .select(col("q_id"), col("doc_id"), col("lex_rank"),
          col("sem_rank"),
          round(
            coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0))
              + coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")),
                lit(0.0)), 6).as("rrf"))
        .withColumn("rank", row_number().over(wRrf))
        .where(col("rank") <= FuseK)
        .select(col("q_id"), col("doc_id"), col("rank"), col("rrf"),
          col("lex_rank"), col("sem_rank"))
        .orderBy(col("q_id"), col("rank"))
    },

    // --- pseudo-relevance feedback (RM3-style query expansion) ----------
    // The second classic first-stage trick after fusion: run the query,
    // mine the top-3 docs for their 2 heaviest non-query terms, and
    // re-score with the expanded term set — recall goes up without any
    // model, which is why PRF survives in modern RAG stacks. Both
    // rounds use the JOIN-based form of the integer BM25 formula
    // (terms as rows, not per-literal columns — the form that admits
    // data-dependent terms), and the expansion stays entirely in-plan:
    // a 2-row frame unioned with the 4 seed terms, no driver collect.
    // Integer-exact end to end; the idf × (num // den) grouping is
    // parenthesized identically on both sides because integer division
    // does not distribute. Plan: tf/df are the inverted-index
    // aggregates; each scoring round joins tf against a ≤6-row
    // broadcast term set, so the work is O(postings of the query
    // terms), the same serving class as text_bm25_persist.
    Q(
      "retr_prf_expand", {
        val contrib =
          """(length(bin(n_docs)) - length(bin(df)))
            |  * ((20 * tf * avgdl * 1000000)
            |     // (8 * tf * avgdl + 3 * avgdl + 9 * dl))""".stripMargin
        s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' '))
           |    AS word FROM documents),
           |dlt AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
           |gg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |         CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dlt),
           |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok
           |       GROUP BY doc_id, word),
           |dfs AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
           |q0(word) AS (VALUES ('spark'), ('merge'), ('window'), ('the')),
           |s1 AS (SELECT tf.doc_id, SUM($contrib) AS score1
           |       FROM tf JOIN q0 USING (word) JOIN dfs USING (word)
           |         JOIN dlt USING (doc_id) CROSS JOIN gg
           |       GROUP BY tf.doc_id),
           |top3 AS (SELECT doc_id FROM s1
           |         ORDER BY score1 DESC, doc_id LIMIT 3),
           |exp AS (SELECT word FROM tf JOIN top3 USING (doc_id)
           |        WHERE word NOT IN (SELECT word FROM q0)
           |        GROUP BY word ORDER BY SUM(tf) DESC, word LIMIT 2),
           |qe AS (SELECT word FROM q0 UNION ALL SELECT word FROM exp),
           |s2 AS (SELECT tf.doc_id, SUM($contrib) AS score
           |       FROM tf JOIN qe USING (word) JOIN dfs USING (word)
           |         JOIN dlt USING (doc_id) CROSS JOIN gg
           |       GROUP BY tf.doc_id)
           |SELECT doc_id, CAST(score AS BIGINT) AS score
           |FROM s2 ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
      }
    ) { (s, d) =>
      import s.implicits._
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text")))
          .as("word"))
      val dlt = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val gg = dlt.agg(count(lit(1)).cast("long").as("n_docs"),
        expr("CAST(sum(dl) AS BIGINT) div count(1)").as("avgdl"))
      val tf = tok.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val dfs = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val q0 = Seq("spark", "merge", "window", "the").toDF("word")
      val contrib = expr(
        "(length(bin(n_docs)) - length(bin(df))) * " +
          "((20 * tf * avgdl * 1000000) div " +
          "(8 * tf * avgdl + 3 * avgdl + 9 * dl))")
      def score(terms: org.apache.spark.sql.DataFrame) = tf
        .join(broadcast(terms), Seq("word"))
        .join(dfs, Seq("word"))
        .join(dlt, Seq("doc_id"))
        .crossJoin(broadcast(gg))
        .groupBy(col("doc_id"))
        .agg(sum(contrib).as("score"))
      val top3 = score(q0)
        .orderBy(col("score").desc, col("doc_id")).limit(3)
        .select(col("doc_id"))
      val exp = tf.join(broadcast(top3), Seq("doc_id"))
        .join(q0, Seq("word"), "left_anti")
        .groupBy(col("word")).agg(sum(col("tf")).as("wtf"))
        .orderBy(col("wtf").desc, col("word")).limit(2)
        .select(col("word"))
      score(q0.union(exp))
        .select(col("doc_id"), col("score").cast("long").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },

    // --- mean average precision of the BM25 ranker ------------------------
    // MRR grades only the FIRST relevant hit; MAP grades the whole
    // ranked list. To keep the metric non-degenerate, relevance is a
    // signal the ranker does NOT directly optimize: the eval term occurs
    // in the document's first 20 tokens (a title-match proxy), while the
    // ranking is whole-document integer BM25 — so AP < 1 exactly when
    // body-only matches outrank early-mention docs. AP is the standard
    // rational 1/R·Σ precision@rank(rel doc), evaluated in floor-ppm per
    // element so both engines agree bit-for-bit; map_ppm averages over
    // the 4-row term frame. The per-term ranking is a row_number window
    // PARTITIONED BY TERM — the per-query ranking shape of an eval
    // harness (parallelism = #eval queries, each a corpus-sized sort;
    // bounded by the eval set, not the corpus — and the idf-zero term
    // makes the full-corpus doc_id tiebreak path part of the contract).
    Q("retr_map", MapOracle) { (s, d) =>
      val toksCol = graft.functions.TextOps.tokens(col("text"))
      val tfCols = MrrTerms.zipWithIndex.map { case (t, i) =>
        size(filter(toksCol, x => x === t)).as(s"tf$i")
      }
      val relCols = MrrTerms.zipWithIndex.map { case (t, i) =>
        array_contains(slice(toksCol, 1, 20), t).as(s"rel$i")
      }
      val sfr = Tables.documents(s, d)
        .select(Seq(col("doc_id"), size(toksCol).as("dl"))
          ++ tfCols ++ relCols: _*)
      val dfAggs = MrrTerms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("long")
          .as(s"df$i")
      }
      val gCols = Seq(count(lit(1)).cast("long").as("n_docs"),
        expr("CAST(sum(dl) AS BIGINT) div count(*)").as("avgdl")) ++ dfAggs
      val g = sfr.agg(gCols.head, gCols.tail: _*)
      def flog2(c: org.apache.spark.sql.Column) = length(bin(c))
      val legs = MrrTerms.zipWithIndex.map { case (t, i) =>
        struct(
          lit(t).as("term"),
          ((flog2(col("n_docs")) - flog2(col(s"df$i"))).cast("long") *
            expr(s"CASE WHEN tf$i > 0 THEN (20 * tf$i * avgdl * 1000000)" +
              s" div (8 * tf$i * avgdl + 3 * avgdl + 9 * dl)" +
              " ELSE 0 END")).as("score"),
          col(s"rel$i").as("rel"))
      }
      val sc = sfr.crossJoin(broadcast(g))
        .select(col("doc_id"), explode(array(legs: _*)).as("e"))
        .select(col("doc_id"), col("e.term").as("term"),
          col("e.score").as("score"), col("e.rel").as("rel"))
      val wr = Window.partitionBy(col("term"))
        .orderBy(col("score").desc, col("doc_id"))
      val ranked = sc
        .withColumn("rank", row_number().over(wr).cast("long"))
        .where(col("rel"))
      val wi = Window.partitionBy(col("term")).orderBy(col("rank"))
      val ap = ranked
        .withColumn("rel_idx", row_number().over(wi).cast("long"))
        .withColumn("prec_ppm",
          expr("CAST(rel_idx * 1000000 div rank AS BIGINT)"))
        .groupBy(col("term"))
        .agg(count(lit(1)).cast("long").as("n_rel"),
          expr("CAST(sum(prec_ppm) div count(*) AS BIGINT)").as("ap_ppm"))
      ap.withColumn("map_ppm",
          expr("CAST(sum(ap_ppm) over () div count(*) over () AS BIGINT)"))
        .orderBy(col("term"))
    },

    // --- NDCG@10 of the BM25 ranker ---------------------------------------
    // The GRADED companion to retr_map's binary AP: relevance earns
    // grade 2 when the eval term sits in the document's first 10 tokens
    // (title zone), grade 1 in tokens 11–20 (lead zone), 0 otherwise —
    // so the metric rewards ranking title hits over lead hits, which
    // whole-document BM25 does not directly optimize. Gains are the
    // standard 2^g−1 ∈ {0,1,3}; position discounts 1/log2(r+1) are the
    // ONE transcendental in the formula, so they enter as a 10-row
    // LITERAL table in floor-ppm (precomputed constants shared verbatim
    // by both engines — the no-libm discipline, same as the quality
    // scorer's weight table). DCG@10 rides the retr_map per-term
    // ranking window; IDCG@10 ranks by grade directly; ndcg_ppm is one
    // exact 64-bit division. At 100 TB the eval-set-bounded windows are
    // the scaling story, exactly as in retr_map.
    Q(
      "retr_ndcg", {
        val discVals = NdcgDiscounts
          .map { case (r, p) => s"($r, $p)" }.mkString(", ")
        val tfs = MrrTerms.zipWithIndex.map { case (t, i) =>
          s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
        }.mkString(",\n        ")
        val grades = MrrTerms.zipWithIndex.map { case (t, i) =>
          s"""CASE WHEN len(list_filter(toks[1:10], x -> x = '$t')) > 0
             |  THEN 3 WHEN len(list_filter(toks[1:20], x -> x = '$t')) > 0
             |  THEN 1 ELSE 0 END AS gain$i""".stripMargin
        }.mkString(",\n        ")
        val dfs = MrrTerms.indices.map { i =>
          s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT)" +
            s" AS df$i"
        }.mkString(",\n        ")
        val legs = MrrTerms.zipWithIndex.map { case (t, i) =>
          s"""SELECT '$t' AS term, doc_id,
             |  CAST(CASE WHEN tf$i > 0 THEN
             |    (length(bin(n_docs)) - length(bin(df$i)))
             |    * ((20 * tf$i * avgdl * 1000000)
             |       // (8 * tf$i * avgdl + 3 * avgdl + 9 * dl)) ELSE 0 END
             |    AS BIGINT) AS score,
             |  CAST(gain$i AS BIGINT) AS gain FROM s, g""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH disc(rank, disc_ppm) AS (VALUES $discVals),
           |s AS (SELECT doc_id, len(toks) AS dl,
           |        $tfs,
           |        $grades
           |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
           |        FROM documents)),
           |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |        CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
           |          AS avgdl,
           |        $dfs
           |  FROM s),
           |sc AS ($legs),
           |rk AS (SELECT term, gain,
           |    CAST(row_number() OVER (PARTITION BY term
           |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
           |  FROM sc),
           |ik AS (SELECT term, gain,
           |    CAST(row_number() OVER (PARTITION BY term
           |           ORDER BY gain DESC, doc_id) AS BIGINT) AS rank
           |  FROM sc),
           |dcg AS (SELECT term,
           |    CAST(SUM(gain * disc_ppm) AS BIGINT) AS dcg_ppm
           |  FROM rk JOIN disc USING (rank) GROUP BY term),
           |idcg AS (SELECT term,
           |    CAST(SUM(gain * disc_ppm) AS BIGINT) AS idcg_ppm
           |  FROM ik JOIN disc USING (rank) GROUP BY term)
           |SELECT term, dcg_ppm, idcg_ppm,
           |  CAST(CASE WHEN idcg_ppm > 0
           |    THEN dcg_ppm * 1000000 // idcg_ppm ELSE 0 END AS BIGINT)
           |    AS ndcg_ppm
           |FROM dcg JOIN idcg USING (term)
           |ORDER BY term NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val toksCol = graft.functions.TextOps.tokens(col("text"))
      val tfCols = MrrTerms.zipWithIndex.map { case (t, i) =>
        size(filter(toksCol, x => x === t)).as(s"tf$i")
      }
      val gainCols = MrrTerms.zipWithIndex.map { case (t, i) =>
        when(array_contains(slice(toksCol, 1, 10), t), 3L)
          .when(array_contains(slice(toksCol, 1, 20), t), 1L)
          .otherwise(0L).as(s"gain$i")
      }
      val sfr = Tables.documents(s, d)
        .select(Seq(col("doc_id"), size(toksCol).as("dl"))
          ++ tfCols ++ gainCols: _*)
      val dfAggs = MrrTerms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("long")
          .as(s"df$i")
      }
      val gCols = Seq(count(lit(1)).cast("long").as("n_docs"),
        expr("CAST(sum(dl) AS BIGINT) div count(*)").as("avgdl")) ++ dfAggs
      val g = sfr.agg(gCols.head, gCols.tail: _*)
      def flog2(c: org.apache.spark.sql.Column) = length(bin(c))
      val legs = MrrTerms.zipWithIndex.map { case (t, i) =>
        struct(
          lit(t).as("term"),
          ((flog2(col("n_docs")) - flog2(col(s"df$i"))).cast("long") *
            expr(s"CASE WHEN tf$i > 0 THEN (20 * tf$i * avgdl * 1000000)" +
              s" div (8 * tf$i * avgdl + 3 * avgdl + 9 * dl)" +
              " ELSE 0 END")).as("score"),
          col(s"gain$i").as("gain"))
      }
      val sc = sfr.crossJoin(broadcast(g))
        .select(col("doc_id"), explode(array(legs: _*)).as("e"))
        .select(col("doc_id"), col("e.term").as("term"),
          col("e.score").as("score"), col("e.gain").as("gain"))
      import s.implicits._
      val disc = broadcast(
        NdcgDiscounts.toDF("rank", "disc_ppm")
          .select(col("rank").cast("long"),
            col("disc_ppm").cast("long")))
      val wr = Window.partitionBy(col("term"))
        .orderBy(col("score").desc, col("doc_id"))
      val wi = Window.partitionBy(col("term"))
        .orderBy(col("gain").desc, col("doc_id"))
      val dcg = sc.withColumn("rank", row_number().over(wr).cast("long"))
        .join(disc, "rank")
        .groupBy(col("term"))
        .agg(sum(col("gain") * col("disc_ppm")).cast("long")
          .as("dcg_ppm"))
      val idcg = sc.withColumn("rank", row_number().over(wi).cast("long"))
        .join(disc, "rank")
        .groupBy(col("term"))
        .agg(sum(col("gain") * col("disc_ppm")).cast("long")
          .as("idcg_ppm"))
      dcg.join(idcg, "term")
        .select(col("term"), col("dcg_ppm"), col("idcg_ppm"),
          expr("CAST(CASE WHEN idcg_ppm > 0 THEN" +
            " dcg_ppm * 1000000 div idcg_ppm ELSE 0 END AS BIGINT)")
            .as("ndcg_ppm"))
        .orderBy(col("term"))
    }
  )
}
