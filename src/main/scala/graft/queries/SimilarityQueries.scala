package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (`embedding` is
  * array<float>[64]).
  *
  * Scale design: brute-force cosine top-k is the correctness baseline —
  * a broadcast of the (small) query set against a scan of the candidate
  * corpus, no shuffle of the corpus itself. The production path is
  * random-hyperplane LSH: bucket by sign-bit key, equi-join buckets, so
  * the candidate set per query is O(bucket) not O(corpus). Both use the
  * codegen'd [[graft.functions.VectorDot]] kernel.
  */
object SimilarityQueries {

  private val Dim = 64

  val all: Seq[Q] = Seq(
    // --- per-vector L2 norm — deterministic row-local fold → oracle-able
    Q(
      "emb_norm",
      """SELECT vec_id,
        |  ROUND(SQRT(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
        |FROM embeddings ORDER BY vec_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          round(VectorOps.normL2(col("embedding")), 6).as("norm"))
        .orderBy(col("vec_id"))
    },

    // --- distributed centroid components per label ----------------------
    // posexplode → EXACT per-(label, dim) sums: each float has a 24-bit
    // mantissa, so v·2⁵² is an exactly-representable integer below 2⁵³ — casting it
    // to DECIMAL(38,0) never rounds, making the sum order-independent AND
    // engine-independent (rounding a double to a decimal scale would tie-
    // break differently: Spark half-up vs DuckDB half-even — observed as
    // a 1-digit mismatch at sf0.1; and Spark's double→decimal cast goes
    // through Double.toString, which is only digit-exact below 2⁵³ —
    // hence 2⁵², not 2⁶⁰). Exactness holds for components with
    // 2⁻²⁹ ≤ |v| < 2 — true of unit-scale embeddings generally and this
    // corpus specifically (observed range [8.1e-6, 0.53]); components
    // outside it would quietly reintroduce the rounding divergence.
    Q(
      "emb_centroid_components",
      """SELECT label, CAST(pos AS BIGINT) AS pos,
        |  CAST(SUM(CAST(CAST(v AS DOUBLE) * 4503599627370496 AS DECIMAL(38,0))) AS DOUBLE)
        |    / 4503599627370496 AS comp_sum,
        |  COUNT(*) AS n
        |FROM (SELECT label, unnest(embedding) AS v,
        |        generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos
        |ORDER BY label NULLS FIRST, pos NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val scale = lit(4503599627370496L) // 2^52
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
        .groupBy(col("label"), (col("p") + 1).cast("long").as("pos"))
        .agg(
          (sum((col("v").cast("double") * scale).cast("decimal(38,0)"))
            .cast("double") / scale).as("comp_sum"),
          count(lit(1)).as("n"))
        .orderBy(col("label"), col("pos"))
    },

    // --- brute-force cosine top-k (baseline) — rows-only -----------------
    // query set: vec_id < 10 (broadcast side); corpus scanned once.
    Q.noOracle("emb_knn_brute") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = broadcast(
        emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      emb.join(queries, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
            .as("cos"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .orderBy(col("q_id"), col("rank"))
    },

    // --- LSH-bucketed ANN (scale path) — rows-only -----------------------
    // multi-table random-hyperplane keys (6 bits × 8 tables): candidates
    // share ANY table's bucket with the query; top-3 by exact cosine over
    // the deduped candidate set. Bits tune bucket size (corpus/2^bits per
    // table), tables tune recall — the two independent knobs at scale.
    Q.noOracle("emb_knn_lsh") { (s, d) =>
      val emb = Tables.embeddings(s, d).withColumn("t",
        explode(VectorOps.lshTables(col("embedding"), Dim,
          nBits = 6, nTables = 8)))
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("t").as("q_t"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      emb.join(queries,
          col("t") === col("q_t") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("q_vec"), col("embedding"))
        .distinct() // union of per-table collisions
        .select(col("q_id"), col("vec_id"),
          round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
            .as("cos"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .orderBy(col("q_id"), col("rank"))
    },

    // --- embedding-cosine near-duplicate pairs — rows-only ---------------
    // same LSH bucketing, self-join, high-threshold filter: the
    // embedding-space analogue of MinHash dedup.
    Q.noOracle("dedup_embedding_cosine") { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .withColumn("bucket",
          VectorOps.lshBucket(col("embedding"), Dim, nBits = 8))
      val a = emb.select(col("bucket"), col("vec_id").as("a_id"),
        col("embedding").as("a_vec"))
      val b = emb.select(col("bucket").as("b_bucket"),
        col("vec_id").as("b_id"), col("embedding").as("b_vec"))
      a.join(b, col("bucket") === col("b_bucket")
          && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          round(VectorOps.cosine(col("a_vec"), col("b_vec")), 6).as("cos"))
        // threshold calibrated to the synthetic corpus (random gaussians:
        // cosine maxes out ≈0.5; a real near-dup corpus would use ≥0.95)
        .where(col("cos") >= 0.4)
        .orderBy(col("a_id"), col("b_id"))
    }
  )
}
