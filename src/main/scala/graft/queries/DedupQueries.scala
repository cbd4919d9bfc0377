package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextOps

/** Deduplication operator family over `documents` (training-data-pipeline
  * surface of the build brief): exact, keep-first, MinHash+LSH, SimHash,
  * n-gram Jaccard.
  *
  * Scale design: the exact variants are one hash-aggregate / one window
  * over a single shuffle; the near-dup variants go through LSH banding —
  * candidate generation is a bucket equi-join on (band, band_hash), never
  * an all-pairs cross join, so cost is O(docs × bands + collisions), the
  * standard web-scale dedup shape (e.g. the C4/RefinedWeb pipelines).
  */
object DedupQueries {

  /** MinHash parameters: 12 bands × 4 rows = 48 hashes; band collision
    * prob = j⁴ per band → catches j ≳ 0.6 pairs with high recall. */
  private val MinhashK = 48
  private val Bands = 12
  private val RowsPerBand = 4

  /** Skew ceiling for candidate generation: a band bucket (LSH) or
    * prefix posting list (PPJoin) holding more than this many docs is
    * DROPPED before the self-join — the same head-cap discipline
    * `text_inverted_index` applies to posting lists. An over-full
    * bucket is boilerplate by construction (hundreds of near-identical
    * docs hashing together), and it is exactly the input that turns the
    * bucket join quadratic: one 10⁵-doc bucket alone is 5·10⁹ candidate
    * pairs in a single task. With the cap, per-bucket work is ≤ cap²/2
    * regardless of corpus skew, so task time stays bounded (p99 ≈ p50).
    * Recall contract: pairs colliding ONLY in over-full buckets are
    * lost; genuinely near-dup pairs collide in multiple independent
    * bands (LSH) / share rare shingles too (PPJoin), and boilerplate
    * clusters past the cap are what exact dedup already catches.
    * Default is far above any test-corpus occupancy (max observed ≈ 20
    * at sf0.1), so the cap changes nothing below adversarial skew —
    * DedupSkewSpec proves both sides. */
  private[queries] val HotBucketCap = 1000

  /** LSH candidate pairs for docs(doc_id, sh): band, cap hot buckets,
    * self-join narrow columns, distinct. The occupancy window rides
    * the same hash partitioning the self-join needs, so the cap adds
    * no extra shuffle of the bucket stream. */
  private[queries] def lshCandidatePairs(
      docs: org.apache.spark.sql.DataFrame,
      maxBucketOccupancy: Int = HotBucketCap)
      : org.apache.spark.sql.DataFrame = {
    val buckets = docs.select(col("doc_id"),
      explode(TextOps.lshBands(
        TextOps.minhashSignature(col("sh"), MinhashK),
        Bands, RowsPerBand)).as("b"))
    val kept = buckets
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("b"))))
      .where(col("occ") <= maxBucketOccupancy)
      .drop("occ")
    kept.as("x")
      .join(kept.as("y"),
        col("x.b") === col("y.b") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  private[queries] def shingled(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    base.select(
      col("doc_id"),
      TextOps.sortedShingleSet(TextOps.tokens(col("text")), 3).as("sh"))
      .repartition(col("doc_id"))

  /** Jaccard-verified near-dup pairs via MinHash+LSH — the shared
    * candidate pipeline behind `dedup_minhash_lsh` and `dedup_clusters`.
    * Three shuffle-isolated stages (see the scaladoc at the top of this
    * file and docs/DESIGN_NOTES.md for why the exchanges are load-
    * bearing): shingle once per doc, bucket-join narrow columns, join
    * shingles back and verify once per distinct pair. */
  private def verifiedNearDupPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = shingled(Tables.documents(s, d))
    verifyPairs(lshCandidatePairs(docs), docs)
  }

  /** Exact-jaccard verification of a candidate pair stream: join the
    * shingle table back by id, one merge-walk kernel call per distinct
    * pair. */
  private[queries] def verifyPairs(cand: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")),
        "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")),
        "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.TextKernels.sorted_jaccard(
          col("a_sh"), col("b_sh")).as("jac"))

  /** Hard ceiling on per-source document count for the exact-pair
    * baseline below: pairs grow as Σ n_source², so the guard bounds the
    * pair count at ~maxDocsPerSource²/2 per source. The default admits
    * the test corpora (≤ ~500 docs/source at sf0.1) with two orders of
    * headroom while making the query REFUSE to run at a scale where the
    * quadratic blowup would silently eat a cluster. */
  private[queries] def guardQuadraticBaseline(
      docs: org.apache.spark.sql.DataFrame,
      maxDocsPerSource: Long = 100000L): Unit = {
    val worst = docs.groupBy(col("source")).count()
      .agg(max(col("count"))).head().getLong(0)
    require(worst <= maxDocsPerSource,
      s"dedup_ngram_jaccard is an ORACLE BASELINE with O(n²/source) " +
        s"pairs; largest source has $worst docs > limit $maxDocsPerSource. " +
        s"Use dedup_minhash_lsh (the production path) at this scale.")
  }

  /** Prefix-filtered exact set-similarity pipeline behind `dedup_ppjoin`
    * (threshold ½ is baked into the ⌊n/2⌋+1 prefix length and the 2×
    * length filter — see the query's scaladoc for the theorem). Input
    * needs (doc_id, text); emits every verified candidate pair with its
    * exact jaccard, unfiltered — the caller applies the threshold. */
  /** Stage 1 of the PPJoin pipeline: (doc_id, sorted shingle set, size).
    * Exposed separately so the profiler measures EXACTLY the shipped
    * stages — a tuned threshold or cap changes both in one place. */
  private[queries] def ppjoinDocs(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    base.select(
      col("doc_id"),
      TextOps.sortedShingleSet(TextOps.tokens(col("text")), 3).as("sh"))
      .withColumn("n", size(col("sh")))
      .repartition(col("doc_id"))

  /** Stage 2: rarest-first prefix occurrences under the ⌊n/2⌋+1 prefix
    * length and the hot-posting occupancy cap (see [[ppjoinPairs]]). */
  private[queries] def ppjoinPrefix(docs: org.apache.spark.sql.DataFrame,
      maxPostingOccupancy: Int = HotBucketCap)
      : org.apache.spark.sql.DataFrame = {
    val ex = docs.select(col("doc_id"), col("n"),
      explode(col("sh")).as("g"))
    val gdf = ex.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("gdf"), col("g"))
    // Hot-posting cap (see HotBucketCap): under the rarest-first global
    // order a stopword-class shingle sits at the END of prefixes, so on
    // natural corpora prefix postings stay short; an adversarial corpus
    // of near-identical docs floods even rare-first prefixes, and this
    // cap is what keeps the prefix self-join from going quadratic on it.
    ex.join(gdf, "g")
      .withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <= expr("n div 2 + 1"))
      .withColumn("pocc", count(lit(1)).over(Window.partitionBy(col("g"))))
      .where(col("pocc") <= maxPostingOccupancy)
      .select(col("g"), col("doc_id"), col("n"), col("rn"))
  }

  /** The length + positional candidate filters as a reusable join
    * condition over two aliased prefix frames (x, y). */
  private[queries] def ppjoinCandCond: org.apache.spark.sql.Column =
    col("x.g") === col("y.g") &&
      col("x.doc_id") < col("y.doc_id") &&
      col("x.n") <= col("y.n") * 2 &&
      col("y.n") <= col("x.n") * 2 &&
      lit(3) * (lit(1) + least(col("x.n") - col("x.rn"),
        col("y.n") - col("y.rn"))) >= col("x.n") + col("y.n")

  private[queries] def ppjoinPairs(base: org.apache.spark.sql.DataFrame,
      maxPostingOccupancy: Int = HotBucketCap)
      : org.apache.spark.sql.DataFrame = {
    // both stages are CUT (localCheckpoint): `prefix` feeds BOTH sides
    // of the candidate self-join and `docs` is re-joined twice in the
    // verify step — left lazy, the shingle computation ran ~4× and the
    // prefix windows 2× inside one plan (profiled at sf0.1: the two
    // 2.3–2.6 s duplicate subtree jobs were exactly this; guide §1.2,
    // "don't compute things twice"). The checkpoints also shorten the
    // self-join plan the way the graph supersteps' cuts do.
    //
    // The prefix cut is REPARTITIONED to the session's defaultParallelism
    // first: AQE sizes post-shuffle stages by BYTES, and the prefix
    // table is byte-small but feeds the CPU-DENSE candidate join (hash
    // probes × positional filters per posting) — measured at sf0.1,
    // AQE's 4 coalesced partitions left 28 of 32 cores idle through the
    // two most expensive stages of the whole query (guide §2.5: bytes
    // are the wrong sizing signal for compute-bound stages). The count
    // is environment-derived (cores here, cluster cores on a real
    // deployment), not a local constant.
    val spark = base.sparkSession
    val para = spark.sparkContext.defaultParallelism
    val docs = ppjoinDocs(base).localCheckpoint()
    val prefix = ppjoinPrefix(docs, maxPostingOccupancy)
      .repartition(para, col("g")).localCheckpoint()
    // Positional filter (the PPJoin refinement over AllPairs): a match
    // at prefix positions (i, j) can extend to at most
    // 1 + min(nₐ−i, n_b−j) common shingles — everything before the
    // match position in either set is, by the global order, disjoint
    // from the other's remainder on the matched element's side. If even
    // that ceiling misses the required overlap ⌈(nₐ+n_b)/3⌉ the
    // occurrence can't witness a qualifying pair; the FIRST common
    // prefix shingle has the loosest ceiling, so per-occurrence
    // filtering before the distinct loses no pair. Measured at sf0.1:
    // 310k → 125k candidates on this shingle-dense corpus.
    // same bytes-vs-CPU correction for the verify stage: the candidate
    // list is a few MB but each row pays a merge-walk jaccard over two
    // shingle arrays. The explicit repartition sits BELOW the distinct
    // (it satisfies the distinct's clustering, so it IS the distinct's
    // exchange and the verify stage inherits its parallelism) — placed
    // ABOVE, the optimizer drops it as redundant over the same keys and
    // AQE byte-coalesces the verify back to one task (measured).
    val cand = prefix.as("x")
      .join(prefix.as("y"), ppjoinCandCond)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .repartition(para, col("a_id"), col("b_id"))
      .distinct()
    // the scored pairs are CUT too: the caller's ORDER BY range-samples
    // its child, so left lazy the whole verify projection — 125k merge-
    // walk jaccards — evaluated TWICE (profiled: two single-task 2.5 s
    // stages, the sampling pass and the real exchange). The checkpoint
    // evaluates it once, at the repartition's full parallelism.
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")),
        "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")),
        "b_id")
      .select(col("a_id"), col("b_id"),
        round(graft.functions.TextKernels.sorted_jaccard(
          col("a_sh"), col("b_sh")), 6).as("jac"))
      .localCheckpoint()
  }

  /** DuckDB CTEs computing the EXACT jac ≥ 0.5 near-dup pair set with an
    * inverted shingle index (unnest → self-join on shingle → common
    * count → jac = c/(na+nb−c)) — the same integers the engine's
    * merge-walk kernel divides, so the doubles match bit-for-bit. The
    * index join touches only pairs sharing ≥ 1 shingle: seconds at
    * sf0.1 where the naive all-pairs formulation takes tens of minutes.
    *
    * This is the ground truth the LSH path is judged against: the hash
    * check passes iff banded recall is 1.0 on every pair above the
    * threshold (verified at sf0.01 AND sf0.1). On a corpus with
    * borderline pairs (jac 0.5–0.7, where 12×4 banding recall < 1) a
    * mismatch would surface the recall gap — by design. */
  private def exactPairCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |    ELSE list_transform(range(1, len(toks) - 1),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS s
      |  FROM t),
      |sz AS (SELECT doc_id, len(s) AS n FROM sh),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
      |           FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2),
      |p AS (SELECT a_id, b_id, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
      |      FROM common
      |      JOIN sz sa ON sa.doc_id = a_id
      |      JOIN sz sb ON sb.doc_id = b_id)""".stripMargin

  val all: Seq[Q] = Seq(
    // --- exact dedup: group identical content, keep lowest doc_id -------
    Q(
      "dedup_exact_groups",
      """SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY fp
        |ORDER BY keep_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    },

    // --- keep-first dedup via window (row_number = 1) --------------------
    Q(
      "dedup_keep_first",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC,
        |                       doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          row_number().over(w).as("rn"))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // --- unigram Jaccard near-dup pairs within source --------------------
    Q(
      "dedup_ngram_jaccard",
      """SELECT a_id, b_id, jac FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    ROUND(CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
        |                                  list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
        |      / len(list_distinct(list_concat(string_split(a.text, ' '),
        |                                      string_split(b.text, ' ')))), 6) AS jac
        |  FROM documents a JOIN documents b
        |    ON a.source = b.source AND a.doc_id < b.doc_id)
        |WHERE jac >= 0.8
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // ORACLE BASELINE, NOT THE PRODUCTION PATH: this query enumerates
      // ALL same-source pairs — inherently O(n²/sources) — to serve as
      // the exact ground truth the LSH path (`dedup_minhash_lsh`) is
      // judged against. The guard refuses to run past a per-source size
      // where the pair count would be a cluster-killer.
      guardQuadraticBaseline(Tables.documents(s, d))
      // Pair generation is NARROW (ids + source only — column pruning
      // keeps the token arrays out of the parquet scan), so the few-key
      // source self-join and the re-spreading exchange move ~16-byte
      // rows, not token arrays (the array-carrying formulation shuffled
      // pairs × 2 arrays ≈ 2.5 GB at sf0.1 — measured 3.8 s; this shape
      // cuts it to ~1 s). Token arrays are computed once per doc behind
      // their own exchange and joined back by id — at corpus scale those
      // joins shuffle O(docs), never O(pairs × array).
      val base = Tables.documents(s, d)
      val ids = base.select(col("doc_id"), col("source"))
      val pairs = ids.select(col("doc_id").as("a_id"), col("source"))
        .join(ids.select(col("doc_id").as("b_id"),
          col("source").as("b_source")),
          col("source") === col("b_source") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        // few-key source join leaves ≤ n_sources active tasks; re-spread
        // the O(n²/sources) pair stream before the per-pair set math
        .repartition(col("a_id"), col("b_id"))
      // sort+distinct once per doc (1-shingle kernel ≡ sorted distinct
      // token set) → merge-walk jaccard kernel per pair
      val docs = base
        .select(col("doc_id"),
          TextOps.sortedShingleSet(TextOps.tokens(col("text")), 1).as("toks"))
        .repartition(col("doc_id"))
      pairs
        .join(docs.select(col("doc_id").as("a_id"), col("toks").as("a_toks")),
          "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("toks").as("b_toks")),
          "b_id")
        .select(col("a_id"), col("b_id"),
          round(graft.functions.TextKernels.sorted_jaccard(
            col("a_toks"), col("b_toks")), 6).as("jac"))
        .where(col("jac") >= 0.8)
        .orderBy(col("a_id"), col("b_id"))
    },

    // --- MinHash + LSH near-dup candidate pairs — rows-only --------------
    // Three-stage shape, each stage shuffle-isolated so nothing heavy is
    // recomputed inside a join (projection collapse would otherwise
    // re-evaluate the shingle transform PER CANDIDATE PAIR — measured as
    // a single-core straggler at sf0.1):
    //  1. shingle+sign once per doc, materialized by an exchange;
    //  2. bucket join on NARROW columns only (ids + band hash), distinct;
    //  3. join candidate ids back to the shingle table, jaccard once per
    //     distinct pair, spread across the cluster.
    // Oracle = the exact pair set (see exactPairCtes): equality IS the
    // 100%-recall check on this corpus's above-threshold pairs.
    Q(
      "dedup_minhash_lsh",
      s"""WITH $exactPairCtes
         |SELECT a_id, b_id, ROUND(jac, 6) AS jac FROM p
         |WHERE jac >= 0.5
         |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      verifiedNearDupPairs(s, d)
        .select(col("a_id"), col("b_id"), round(col("jac"), 6).as("jac"))
        .where(col("jac") >= 0.5)
        .orderBy(col("a_id"), col("b_id"))
    },

    // --- near-dup clusters + representative selection --------------------
    // The composition a production MinHash dedup actually ships: verified
    // near-dup PAIRS (the dedup_minhash_lsh relation) are only the edge
    // list — the keep/drop decision needs connected COMPONENTS over
    // them (near-duplication is not transitive, but its closure defines
    // the dedup group: A≈B≈C drops two docs even when A̸≈C), then one
    // representative per component (keep-first = min doc_id, the same
    // rule the exact family and the streaming ingest use). Components
    // via the RDD-free alternating-star min-agg loop
    // (DedupClusters.fromPairsStars — O(log n) rounds of equi-joins, no
    // GraphX hot-vertex straggler); the oracle replays the closure with
    // a recursive label-propagation CTE over the identical exact-jaccard
    // pair set. Scale: the pair relation is the LSH bucket join's
    // output (bounded by band occupancy caps); components run on pairs,
    // never documents.
    Q(
      "dedup_near_clusters",
      s"""WITH RECURSIVE $exactPairCtes,
         |e0 AS (SELECT a_id AS u, b_id AS v FROM p WHERE jac >= 0.5),
         |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
         |cc AS (SELECT u AS node, u AS comp FROM e
         |       UNION
         |       SELECT e.v, cc.comp FROM cc JOIN e ON e.u = cc.node),
         |lab AS (SELECT node, MIN(comp) AS cluster_id FROM cc
         |        GROUP BY node)
         |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(MIN(node) AS BIGINT) AS keep_id,
         |  CAST(COUNT(*) - 1 AS BIGINT) AS dropped
         |FROM lab GROUP BY cluster_id
         |ORDER BY cluster_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val edges = verifiedNearDupPairs(s, d)
        .where(col("jac") >= 0.5)
        .select(col("a_id"), col("b_id"))
      graft.operators.DedupClusters.fromPairsStars(s, edges, "a_id", "b_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          min(col("doc_id")).as("keep_id"),
          (count(lit(1)) - 1).as("dropped"))
        .orderBy(col("cluster_id"))
    },

    // --- cross-source corpus overlap audit -------------------------------
    // The corpus-LEVEL dedup question the doc-level family doesn't answer:
    // how much does source A's content overlap source B's? (CommonCrawl
    // snapshots overlap ~50% month-over-month; a mix budget that counts
    // both pays twice.) Exact shingle-set Jaccard and containment per
    // source pair, computed from the per-source DISTINCT shingle relation:
    // one shingle-keyed exchange, then a self-equi-join on the shingle
    // whose fanout is bounded by #sources (each shingle contributes at
    // most C(s,2) pairs, s = sources containing it) — never doc-pairs.
    // At 100 TB per-source shingle sets are the mergeable unit: the same
    // relation also serves incremental audits (new snapshot vs corpus).
    // Integer ppm via cross-multiplication (the suppressed_ppm idiom).
    Q(
      "dedup_source_overlap",
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks
        |  FROM documents),
        |sh AS (SELECT source,
        |  unnest(list_distinct(CASE WHEN len(toks) < 3
        |    THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    END)) AS g
        |  FROM t),
        |ds AS (SELECT DISTINCT source, g FROM sh),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ds
        |       GROUP BY source),
        |ix AS (SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM ds a JOIN ds b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, n_common,
        |  CAST(n_common * 1000000 // (sa.n + sb.n - n_common) AS BIGINT)
        |    AS jaccard_ppm,
        |  CAST(n_common * 1000000 // LEAST(sa.n, sb.n) AS BIGINT)
        |    AS containment_ppm
        |FROM ix JOIN sz sa ON sa.source = src_a
        |        JOIN sz sb ON sb.source = src_b
        |ORDER BY src_a NULLS FIRST, src_b NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val ds = Tables.documents(s, d)
        .select(col("source"),
          explode(TextOps.sortedShingleSet(
            TextOps.tokens(col("text")), 3)).as("g"))
        .distinct()
      val sz = ds.groupBy(col("source")).agg(count(lit(1)).as("n"))
      ds.as("a")
        .join(ds.as("b"),
          col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_common"))
        .join(broadcast(sz.select(col("source").as("src_a"),
          col("n").as("n_a"))), "src_a")
        .join(broadcast(sz.select(col("source").as("src_b"),
          col("n").as("n_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          col("n_common"),
          expr("CAST(n_common * 1000000 div (n_a + n_b - n_common) " +
            "AS BIGINT)").as("jaccard_ppm"),
          expr("CAST(n_common * 1000000 div least(n_a, n_b) AS BIGINT)")
            .as("containment_ppm"))
        .orderBy(col("src_a"), col("src_b"))
    },

    // --- prefix-filtered EXACT set-similarity join (AllPairs/PPJoin) ----
    // The exact-at-scale third leg of the near-dup family: same jac ≥ 0.5
    // pair set as dedup_minhash_lsh, but with NO probabilistic recall —
    // prefix filtering (Chaudhuri/Ganti/Kaushik SSJoin 2006, Bayardo
    // AllPairs WWW'07, Xiao PPJoin WWW'08; public algorithms) guarantees
    // every qualifying pair surfaces as a candidate by construction.
    //
    // Under a GLOBAL shingle order (rarest-first: ascending global df,
    // shingle as tiebreak — the order that minimizes candidates), each
    // doc exposes only its first ⌊n/2⌋+1 shingles. Why that suffices at
    // t = 0.5: jac ≥ ½ forces overlap i ≥ ⌈(nₐ+n_b)/3⌉ ≥ ⌈nₐ/2⌉ (using
    // n_b ≥ nₐ/2, itself implied by jac ≥ ½ and enforced as the length
    // filter in the join), and two sets whose (n−α+1)-prefixes are
    // disjoint can share at most α−1 elements — every common element
    // must sort after the smaller prefix boundary, landing in an
    // (α−1)-sized suffix. Contrapositive: qualifying pairs collide on
    // some prefix shingle.
    //
    // Scale shape: candidate generation is an equi-join on prefix
    // shingles (rare by choice of order), never all-pairs; the length
    // filter prunes inside the join; verification reuses the LSH path's
    // merge-walk kernel once per distinct candidate. Cost is
    // O(docs·prefix + collisions) — the exact-join sibling of the LSH
    // bucket bound, with recall 1 as a theorem instead of a measurement.
    Q(
      "dedup_ppjoin",
      s"""WITH $exactPairCtes
         |SELECT a_id, b_id, ROUND(jac, 6) AS jac FROM p
         |WHERE jac >= 0.5
         |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      ppjoinPairs(Tables.documents(s, d))
        .where(col("jac") >= 0.5)
        .orderBy(col("a_id"), col("b_id"))
    },

    // --- asymmetric containment pairs (quote/excerpt detection) ---------
    // The near-dup relation Jaccard structurally misses: when a short
    // doc is a SUBSET of a long one (a quote, an excerpt, a template
    // instance), |A∩B|/|A∪B| is dragged down by the size gap while
    // containment = c/min(na, nb) stays at 1 — the measure excerpt
    // dedup actually thresholds (Broder's containment, resemblance's
    // asymmetric sibling). Candidates via the shingle inverted index
    // (equi-join on gram, O(collisions) — the same bound as the exact
    // jaccard CTEs; at corpus scale the prefix/LSH index bounds the
    // postings, same as the other legs). One int/int-ish division per
    // pair — deterministic.
    Q(
      "dedup_containment",
      s"""WITH $exactPairCtes,
         |cont AS (SELECT a_id, b_id, c,
         |    sa.n AS na, sb.n AS nb,
         |    CAST(c AS DOUBLE) / LEAST(sa.n, sb.n) AS containment
         |  FROM common
         |  JOIN sz sa ON sa.doc_id = a_id
         |  JOIN sz sb ON sb.doc_id = b_id)
         |SELECT a_id, b_id, CAST(c AS BIGINT) AS c,
         |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         |  ROUND(containment, 6) AS containment
         |FROM cont WHERE containment >= 0.8
         |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val docs = shingled(Tables.documents(s, d))
      val ex = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      val common = ex.as("a")
        .join(ex.as("b"), col("a.g") === col("b.g")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("c"))
      val sz = docs.select(col("doc_id"), size(col("sh")).as("n"))
      common
        .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")),
          Seq("a_id"))
        .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")),
          Seq("b_id"))
        .select(col("a_id"), col("b_id"), col("c"),
          col("na").cast("long").as("na"), col("nb").cast("long").as("nb"),
          (col("c").cast("double") / least(col("na"), col("nb")))
            .as("containment"))
        .where(col("containment") >= 0.8)
        .select(col("a_id"), col("b_id"), col("c"), col("na"), col("nb"),
          round(col("containment"), 6).as("containment"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // --- LSH banding design table (the S-curve, computed in-engine) ------
    // The table that justifies every (bands, rows) choice in this file:
    // candidate probability P = 1 − (1 − j^r)^b across a jaccard grid
    // for the shipped 12×4 config and its neighbors. Powers are INTEGER
    // exponents expanded to explicit left-associated multiplication
    // chains — identical IEEE sequences on both sides, no libm pow —
    // so the design table itself is oracle-exact. Data-free by nature
    // (a property of the hash family, not the corpus); emitted as a
    // query so the recall contract ships next to the code that relies
    // on it.
    {
      val grid = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
      val configs = Seq((12, 4), (8, 8), (16, 6))
      def powChainSql(base: String, n: Int): String =
        (1 until n).foldLeft(base)((acc, _) => s"($acc * $base)")
      val rowsSql = (for ((b, r) <- configs; j <- grid) yield {
        // bare 0.x literals parse as DECIMAL in DuckDB — force DOUBLE so
        // the multiplication chain is IEEE like the engine's
        val jr = powChainSql(s"CAST($j AS DOUBLE)", r)
        val p = s"1 - ${powChainSql(s"(1 - $jr)", b)}"
        s"SELECT $b AS bands, $r AS rows_per_band, CAST($j AS DOUBLE) " +
          s"AS jac, ROUND(CAST($p AS DOUBLE), 6) AS p_candidate"
      }).mkString("\nUNION ALL\n")
      Q(
        "dedup_banding_curve",
        s"""SELECT CAST(bands AS BIGINT) AS bands,
           |  CAST(rows_per_band AS BIGINT) AS rows_per_band, jac,
           |  p_candidate
           |FROM ($rowsSql)
           |ORDER BY bands NULLS FIRST, rows_per_band NULLS FIRST,
           |  jac NULLS FIRST""".stripMargin
      ) { (s, d) =>
        def powChain(base: org.apache.spark.sql.Column, n: Int) =
          (1 until n).foldLeft(base)((acc, _) => acc * base)
        val rows = for ((b, r) <- configs; j <- grid) yield {
          val jr = powChain(lit(j), r)
          val p = lit(1) - powChain(lit(1) - jr, b)
          (b.toLong, r.toLong, j, p)
        }
        import s.implicits._
        // literal frame + per-row expression: build via union of selects
        rows.map { case (b, r, j, p) =>
          s.range(1).select(lit(b).as("bands"),
            lit(r).as("rows_per_band"), lit(j).as("jac"),
            round(p.cast("double"), 6).as("p_candidate"))
        }.reduce(_.unionByName(_))
          .orderBy(col("bands"), col("rows_per_band"), col("jac"))
      }
    },

    // --- duplicate clusters: transitive closure over VERIFIED near-dup --
    // pairs — rows-only. GraphX connected components turn pairwise edges
    // into keep-one-per-group clusters (a~b, b~c ⇒ {a,b,c}); clustering
    // runs on jaccard-verified pairs, not raw bucket collisions, so a
    // chance LSH collision can't weld two unrelated groups together.
    // Oracle: connected components as a recursive CTE (min-label
    // propagation over the exact pair set; UNION dedups rows so the
    // fixpoint terminates) — GraphX's Pregel result re-derived in pure
    // SQL, down to the members-array string rendering.
    Q(
      "dedup_clusters",
      s"""WITH RECURSIVE $exactPairCtes,
         |e AS (SELECT a_id AS u, b_id AS v FROM p WHERE jac >= 0.5
         |      UNION ALL
         |      SELECT b_id, a_id FROM p WHERE jac >= 0.5),
         |cc AS (SELECT u AS node, u AS comp FROM e
         |       UNION
         |       SELECT e.v, cc.comp FROM cc JOIN e ON e.u = cc.node),
         |comp AS (SELECT node AS doc_id, MIN(comp) AS cluster_id
         |         FROM cc GROUP BY node)
         |SELECT cluster_id, MIN(doc_id) AS keep_id,
         |  COUNT(*) AS n_members,
         |  CAST(list(doc_id ORDER BY doc_id) AS VARCHAR) AS members
         |FROM comp GROUP BY cluster_id
         |ORDER BY keep_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val verified = verifiedNearDupPairs(s, d)
        .where(col("jac") >= 0.5)
        .select(col("a_id"), col("b_id"))
      graft.operators.DedupClusters.summarize(
        graft.operators.DedupClusters.fromPairs(s, verified, "a_id", "b_id"))
        .select(col("cluster_id"), col("keep_id"), col("n_members"),
          col("members").cast("string").as("members"))
        .orderBy(col("keep_id"))
    },

    // --- quality-aware canonical selection: keep-BEST per dup cluster ---
    // Production dedup keeps the best member of each near-dup group, not
    // the arbitrary first: pretraining pipelines keep the longest /
    // highest-quality copy (truncated mirrors and boilerplate-stripped
    // variants lose to the full document). Composition of the shipped
    // pieces: verified LSH pairs → connected components → argmax by
    // (n_chars, doc_id) per cluster — one extra window over the
    // cluster-id shuffle the summary already pays. Oracle extends the
    // dedup_clusters recursive-CTE components with the same argmax.
    Q(
      "dedup_keep_best",
      s"""WITH RECURSIVE $exactPairCtes,
         |e AS (SELECT a_id AS u, b_id AS v FROM p WHERE jac >= 0.5
         |      UNION ALL
         |      SELECT b_id, a_id FROM p WHERE jac >= 0.5),
         |cc AS (SELECT u AS node, u AS comp FROM e
         |       UNION
         |       SELECT e.v, cc.comp FROM cc JOIN e ON e.u = cc.node),
         |comp AS (SELECT node AS doc_id, MIN(comp) AS cluster_id
         |         FROM cc GROUP BY node),
         |m AS (SELECT comp.doc_id, CAST(comp.cluster_id AS BIGINT)
         |        AS cluster_id, d.n_chars
         |      FROM comp JOIN documents d USING (doc_id)),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY n_chars DESC, doc_id) AS rn,
         |        COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
         |      FROM m)
         |SELECT cluster_id, doc_id AS keep_id,
         |  CAST(n_chars AS BIGINT) AS kept_chars,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM r WHERE rn = 1
         |ORDER BY cluster_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val verified = verifiedNearDupPairs(s, d)
        .where(col("jac") >= 0.5)
        .select(col("a_id"), col("b_id"))
      val clusters = graft.operators.DedupClusters
        .fromPairs(s, verified, "a_id", "b_id")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
      val byCluster = Window.partitionBy(col("cluster_id"))
      clusters.join(docs, "doc_id")
        .withColumn("rn", row_number().over(
          byCluster.orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("n_members", count(lit(1)).over(byCluster))
        .where(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("keep_id"),
          col("n_chars").cast("long").as("kept_chars"), col("n_members"))
        .orderBy(col("cluster_id"))
    },

    // --- incremental dedup: new batch vs existing corpus -----------------
    // THE daily-production shape at 100 TB: dedup an incoming delta
    // (docs with doc_id % 10 = 0 stand in for "today's batch") against
    // the standing corpus WITHOUT re-pairing the corpus with itself.
    // Same three-stage LSH pipeline as dedup_minhash_lsh, but the bucket
    // join is ASYMMETRIC (new × old only) — candidate cost scales with
    // the delta, not the corpus squared; the corpus side contributes one
    // shingle+sign pass that an operational pipeline would persist and
    // reuse. Oracle = exact asymmetric inverted-index pair set (same
    // recall argument as dedup_minhash_lsh).
    Q(
      "dedup_incremental",
      s"""WITH $exactPairCtes
         |SELECT a_id, b_id, ROUND(jac, 6) AS jac FROM p
         |WHERE jac >= 0.5
         |  AND ((a_id % 10 = 0) <> (b_id % 10 = 0))
         |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        (pmod(col("doc_id"), lit(10)) === 0).as("is_new"),
        TextOps.sortedShingleSet(TextOps.tokens(col("text")), 3).as("sh"))
        .repartition(col("doc_id"))
      val buckets = docs.select(col("doc_id"), col("is_new"),
        explode(TextOps.lshBands(
          TextOps.minhashSignature(col("sh"), MinhashK),
          Bands, RowsPerBand)).as("b"))
      // corpus-side hot-bucket cap (see HotBucketCap): per-band work is
      // bounded by batch_occ × cap instead of batch_occ × corpus_occ
      val corpus = buckets.where(!col("is_new"))
        .withColumn("occ",
          count(lit(1)).over(Window.partitionBy(col("b"))))
        .where(col("occ") <= HotBucketCap)
        .drop("occ")
      val cand = buckets.where(col("is_new")).as("x")
        .join(corpus.as("y"),
          col("x.b") === col("y.b"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
        .distinct()
      cand
        .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")),
          "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")),
          "b_id")
        .select(col("a_id"), col("b_id"),
          round(graft.functions.TextKernels.sorted_jaccard(
            col("a_sh"), col("b_sh")), 6).as("jac"))
        .where(col("jac") >= 0.5)
        .orderBy(col("a_id"), col("b_id"))
    },

    // --- SimHash near-dup pairs (custom Catalyst expression) -------------
    // Candidate generation: 4×16-bit bands. The pigeonhole bound makes
    // banded recall EXACT here (Hamming ≤ 3 over 4 bands ⇒ ≥ 1 band has
    // zero differing bits ⇒ the pair collides), so the engine's banded
    // output IS the all-pairs Hamming ≤ 3 set — which the oracle states
    // directly. Token hashes are MD5-derived ([[graft.functions.SimHash]])
    // so DuckDB replays the full 64-bit signature via md5_number_upper:
    // per (doc, token) hash → ±1 vote per bit over range(64) → sign bits
    // reassembled with shifts — value-exact, not rows-only.
    Q(
      "dedup_simhash",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |th AS (SELECT doc_id, md5_number_upper(g) AS h, COUNT(*) AS w
        |       FROM (SELECT doc_id, unnest(toks) AS g FROM t)
        |       GROUP BY doc_id, h),
        |bits AS (SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) AS c
        |  FROM th CROSS JOIN range(64) r(b) GROUP BY doc_id, b),
        |sig AS (SELECT doc_id,
        |    SUM(CASE WHEN c > 0
        |        THEN (CAST(1 AS UBIGINT) << CAST(b AS INT))
        |        ELSE CAST(0 AS UBIGINT) END) AS sh
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // exchange boundary: fingerprint computed once per doc (without it,
      // projection collapse re-derives simhash(split(text)) per pair)
      val docs = Tables.documents(s, d).select(col("doc_id"),
        TextOps.simhash(TextOps.tokens(col("text"))).as("sh"))
        .repartition(col("doc_id"))
      // banding adapts to corpus size (graft.operators.SimHashBanding —
      // Manku et al.'s block-combination scheme): ≤2^19 docs keeps the
      // 4×16-bit bands; the ladder then steps 5→6→8 blocks, widening
      // every key (26/32/40 bits) so buckets never saturate. Threshold
      // derivation lives with the scheme — a same-tier A/B at 500k
      // docs (b=4 21.9 s / b=5 22.5 s / b=6 26.9 s) pinned the 4→5
      // crossover and the explode-vs-candidate cost constant. Recall
      // stays 1 by pigeonhole under EVERY scheme and the pair
      // predicate is unchanged, so the result — and the oracle — are
      // scheme-independent; the one-row count that picks the scheme is
      // the same stats-driven planning as the dimension join demotion.
      val scheme =
        graft.operators.SimHashBanding.choose(Tables.documents(s, d).count())
      val banded = docs.select(col("doc_id"), col("sh"),
        explode(graft.operators.SimHashBanding.bands(col("sh"), scheme))
          .as("b"))
      val a = banded.select(col("b").as("ab"), col("doc_id").as("a_id"),
        col("sh").as("a_sh"))
      val b = banded.select(col("b").as("bb"), col("doc_id").as("b_id"),
        col("sh").as("b_sh"))
      // hamming filter BEFORE the pair-dedup distinct: the xor+popcount
      // is one codegen'd op per candidate, while distinct() is a shuffle
      // of the whole candidate stream — and band-bucket candidates grow
      // superlinearly once 2^16 buckets saturate (at 500k docs each
      // 16-bit band holds ~8 docs/bucket). Filtering first shuffles
      // O(matches), not O(candidates); distinct-then-filter and
      // filter-then-distinct are equivalent because hamming is a pure
      // function of the pair.
      // physical strategy rides the SAME corpus-size signal as the
      // banding scheme: small corpora (b=4) leave the join unhinted so
      // stats broadcast the banded side for free; past 2^19 docs the
      // widened keys make per-band buckets tiny and neither side
      // benefits from ordering, so shuffle_hash skips both O(n·bands)
      // sorts. Locally the win is small (27.8 → 26.9 s vs SMJ at the
      // ×100 fresh tier; the wall is explode + hamming CPU), but at
      // cluster scale the sorts are the spill surface this removes.
      // Residual skew from a hot band key is bounded by the same
      // band-occupancy argument as the MinHash caps.
      val bb = if (scheme.blocks > 4) b.hint("shuffle_hash") else b
      a.join(bb, col("ab") === col("bb") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          TextOps.hamming64(col("a_sh"), col("b_sh")).as("hamming"))
        .where(col("hamming") <= 3)
        .distinct()
        .orderBy(col("a_id"), col("b_id"))
    },

    // --- exact repeated-substring dedup (suffix-array semantics) ---------
    // The ExactSubstr pass of Lee et al., "Deduplicating Training Data
    // Makes Language Models Better" (ACL 2022): drop every token span
    // that occurs verbatim elsewhere in the corpus (any doc, or earlier
    // in the same doc), keeping the globally first occurrence. The paper
    // builds a suffix array; this plan gets the IDENTICAL coverage set
    // from L-gram anchoring, exactly — a position lies inside a repeated
    // substring of length ≥ L iff some repeated L-gram covers it (every
    // L-window of a repeated substring repeats with it; a repeated
    // L-gram IS a repeated substring) — so no suffix array and no
    // pair enumeration are needed, just:
    //   1. slide L=8 token windows (explode ≈ one row per token — the
    //      same cost class as the shingle passes above);
    //   2. per gram keep-first = one combiner-friendly MIN of the packed
    //      (doc_id·1024 + pos) key — skew-safe where a row_number-per-
    //      gram window would serialize hot grams onto one task (pack
    //      constant: pos < 1024 ≫ max doc length here; at larger doc
    //      lengths widen the shift, doc_id·2²⁰ still fits int64 to
    //      ~10¹² docs);
    //   3. non-first occurrences merge into maximal dropped spans with
    //      one bounded window PER DOC (gaps-and-islands; fixed L makes
    //      "previous max end" = lag(p)+L−1, so one lag suffices).
    // Output: per affected doc, the maximal repeated-span count and
    // dropped-token total — integers, replayed exactly by the oracle.
    Q(
      "dedup_substring",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
        |    array_to_string(list_slice(toks, p, p + 7), ' ') AS gram
        |  FROM t, UNNEST(range(1, len(toks) - 6)) AS u(p)),
        |m AS (SELECT gram, MIN(doc_id * 1024 + p) AS first_occ
        |      FROM g GROUP BY gram),
        |mk AS (SELECT doc_id, p FROM g JOIN m USING (gram)
        |       WHERE doc_id * 1024 + p <> first_occ),
        |isl AS (SELECT doc_id, p,
        |    CASE WHEN lag(p) OVER w IS NULL OR p > lag(p) OVER w + 7
        |         THEN 1 ELSE 0 END AS brk
        |  FROM mk WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
        |isl2 AS (SELECT doc_id, p,
        |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
        |  FROM isl),
        |spans AS (SELECT doc_id, island, MIN(p) AS s, MAX(p) + 7 AS e
        |          FROM isl2 GROUP BY doc_id, island)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_rep_spans,
        |  CAST(SUM(e - s + 1) AS BIGINT) AS toks_dropped
        |FROM spans GROUP BY doc_id
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      substringDedupSpans(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
        .orderBy(col("doc_id"))
    },

    // --- Record linkage: segment-blocked edit-distance matching ----------
    // Entity resolution for dirty records: link each corrupted key string
    // back to its best canonical record. Candidate generation is
    // PassJoin-style segment blocking (Li, Deng, Feng 2011 — public):
    // split the fixed-length key into 3 segments; any single-substitution
    // corruption leaves >= 2 segments intact (pigeonhole), so an
    // equi-join on (segment_index, segment_value) finds every such pair
    // exactly — recall is a THEOREM for the substitution class, and a
    // stated contract for insert/delete shifts (PassJoin's shifted
    // segments would close those; the verifier below already scores them
    // when blocking surfaces the pair).
    //
    // The fixture plants the dirty side deterministically (same
    // augmentation pattern as pipe_pii_redact): every 7th customer's
    // zero-padded key, digits REVERSED so the uniform low-order digits
    // lead the string (segment blocks stay small), one digit at position
    // key%9 shifted +5 mod 10. Hot blocks — the shared high-order-zero
    // segment — are dropped by an occupancy cap (<= 1000), the same skew
    // discipline as the MinHash LSH band caps; a planted pair always
    // retains one uniform intact segment, so cap recall stays 100%
    // (spec-proven). Verification is levenshtein <= 2 on candidates
    // only; best match per dirty record = MIN over the packed
    // (dist * 1e10 + key) integer — an exact argmin with deterministic
    // ties, combiner-friendly, identical in both engines.
    Q(
      "q_record_linkage",
      """WITH clean AS (SELECT c_custkey AS key,
        |    reverse(lpad(CAST(c_custkey AS VARCHAR), 9, '0')) AS rid
        |  FROM customer),
        |dirty AS (SELECT key,
        |    concat(substr(rid, 1, CAST(key % 9 AS INT)),
        |      CAST((CAST(substr(rid, CAST(key % 9 AS INT) + 1, 1) AS INT)
        |            + 5) % 10 AS VARCHAR),
        |      substr(rid, CAST(key % 9 AS INT) + 2)) AS rid
        |  FROM clean WHERE key % 7 = 0),
        |cb AS (SELECT key, rid, s, substr(rid, s * 3 + 1, 3) AS seg
        |       FROM clean CROSS JOIN range(3) r(s)),
        |db AS (SELECT key, rid, s, substr(rid, s * 3 + 1, 3) AS seg
        |       FROM dirty CROSS JOIN range(3) r(s)),
        |occ AS (SELECT s, seg FROM cb GROUP BY s, seg
        |        HAVING COUNT(*) <= 1000),
        |cand AS (SELECT DISTINCT db.key AS b_key, cb.key AS a_key,
        |                db.rid AS b_rid, cb.rid AS a_rid
        |         FROM db JOIN occ USING (s, seg) JOIN cb USING (s, seg)),
        |m AS (SELECT a_key, b_key,
        |        CAST(levenshtein(a_rid, b_rid) AS BIGINT) AS dist
        |      FROM cand WHERE levenshtein(a_rid, b_rid) <= 2),
        |best AS (SELECT b_key, MIN(dist * 10000000000 + a_key) AS enc
        |         FROM m GROUP BY b_key)
        |SELECT b_key, CAST(enc % 10000000000 AS BIGINT) AS a_key,
        |  CAST(enc // 10000000000 AS INT) AS dist
        |FROM best ORDER BY b_key NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val clean = Tables.customer(s, d).select(
        col("c_custkey").as("key"),
        reverse(lpad(col("c_custkey").cast("string"), 9, "0")).as("rid"))
      val dirty = clean.where(col("key") % 7 === 0)
        .select(col("key"), expr(
          """concat(substring(rid, 1, cast(key % 9 as int)),
            |  cast((cast(substring(rid, cast(key % 9 as int) + 1, 1)
            |        as int) + 5) % 10 as string),
            |  substring(rid, cast(key % 9 as int) + 2))""".stripMargin)
          .as("rid"))
      def segmented(df: org.apache.spark.sql.DataFrame) = df
        .select(col("key"), col("rid"),
          explode(array((0 until 3).map(i =>
            struct(lit(i).as("s"),
              substring(col("rid"), i * 3 + 1, 3).as("seg"))): _*)).as("x"))
        .select(col("key"), col("rid"), col("x.s").as("s"),
          col("x.seg").as("seg"))
      val cb = segmented(clean)
      val db = segmented(dirty)
      val occ = cb.groupBy(col("s"), col("seg"))
        .agg(count(lit(1)).as("n")).where(col("n") <= 1000)
        .select(col("s"), col("seg"))
      val cand = db
        .join(occ, Seq("s", "seg"), "left_semi")
        .join(cb.select(col("s"), col("seg"), col("key").as("a_key"),
          col("rid").as("a_rid")), Seq("s", "seg"))
        .select(col("key").as("b_key"), col("a_key"),
          col("rid").as("b_rid"), col("a_rid"))
        .distinct()
      cand
        .where(levenshtein(col("a_rid"), col("b_rid")) <= 2)
        .select(col("a_key"), col("b_key"),
          levenshtein(col("a_rid"), col("b_rid")).cast("long").as("dist"))
        .groupBy(col("b_key"))
        .agg(min(col("dist") * lit(10000000000L) + col("a_key")).as("enc"))
        .select(col("b_key"),
          (col("enc") % lit(10000000000L)).as("a_key"),
          expr("enc div 10000000000").cast("int").as("dist"))
        .orderBy(col("b_key"))
    },

    // --- blocked edit-distance near-dup join -----------------------------
    // The character-level sibling of dedup_minhash_lsh, staged the way a
    // real pipeline stages it:
    //  1. EXACT dedup first — one representative (min doc_id) per
    //     (lang, text) group. Identical copies are the textbook
    //     quadratic trap for any pairwise distance (k copies in a block
    //     = C(k,2) pointless zero-distance DPs); exact dedup is O(n)
    //     and always precedes near-dup in production (C4/RefinedWeb).
    //  2. PREFIX-BLOCK the representatives: equi-join on (lang, first
    //     40 chars) — O(docs + collisions), with the stated recall
    //     contract that suffix-confined edits (this corpus's near-dup
    //     perturbation, and the common real one: appended boilerplate/
    //     footers) are caught; prefix edits land in other blocks
    //     (dedup_minhash_lsh covers those).
    //  3. Distance on the PREFIX-STRIPPED suffixes with the banded
    //     τ=10 kernel (levenshtein is invariant under removal of a
    //     common prefix, so lev(sfx_a, sfx_b) IS the full-text
    //     distance — ~half the DP work for free, early-exit past τ).
    Q(
      "dedup_edit_distance",
      """WITH r AS (SELECT lang, text, MIN(doc_id) AS doc_id
        |  FROM documents GROUP BY lang, text),
        |d AS (SELECT doc_id, lang, substr(text, 1, 40) AS blk,
        |    substr(text, 41) AS sfx
        |  FROM r)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.sfx, b.sfx) AS BIGINT) AS lev
        |FROM d a JOIN d b
        |  ON a.lang = b.lang AND a.blk = b.blk AND b.doc_id > a.doc_id
        |WHERE levenshtein(a.sfx, b.sfx) <= 10
        |ORDER BY doc_a NULLS FIRST, doc_b NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val reps = Tables.documents(s, d)
        .groupBy(col("lang"), col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 40).as("blk"),
          expr("substring(text, 41)").as("sfx"))
      val a = reps.select(col("doc_id").as("doc_a"), col("sfx").as("sa"),
        col("lang").as("la"), col("blk").as("ba"))
      val b = reps.select(col("doc_id").as("doc_b"), col("sfx").as("sb"),
        col("lang").as("lb"), col("blk").as("bb"))
      a.join(b, col("la") === col("lb") && col("ba") === col("bb") &&
          col("doc_b") > col("doc_a") &&
          levenshtein(col("sa"), col("sb"), 10) >= 0)
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("sa"), col("sb"), 10).cast("long").as("lev"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // --- MinHash estimator accuracy audit --------------------------------
    // The sketch-trust check run before shipping signature-only dedup
    // (at true scale the exact verify pass is the expensive half — this
    // query measures whether the 48-slot estimate could replace it):
    // for every verified near-dup pair, the signature-agreement estimate
    // ĵ must sit within 0.25 of the exact Jaccard — 3.5σ for k=48
    // (σ = √(j(1−j)/48) ≤ 0.072), the same contract-check framing as
    // q_value_percentiles_approx (the estimate VALUE is
    // algorithm-specific; the BOUND is the oracle-able fact). Exact jac
    // comes from the merge-walk kernel, ĵ from the same signatures the
    // LSH bands hash — one extra narrow column through the existing
    // candidate pipeline, no new shuffles.
    Q(
      "dedup_minhash_accuracy",
      s"""WITH $exactPairCtes
         |SELECT a_id, b_id, ROUND(jac, 6) AS jac, TRUE AS within_bound
         |FROM p WHERE jac >= 0.5
         |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val docs = shingled(Tables.documents(s, d))
        .select(col("doc_id"), col("sh"),
          TextOps.minhashSignature(col("sh"), MinhashK).as("sig"))
      val cand = lshCandidatePairs(docs.select(col("doc_id"), col("sh")))
      val est = TextOps.minhashJaccard(col("a_sig"), col("b_sig"))
      val jac = graft.functions.TextKernels.sorted_jaccard(
        col("a_sh"), col("b_sh"))
      cand
        .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
          col("sig").as("a_sig")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
          col("sig").as("b_sig")), "b_id")
        .select(col("a_id"), col("b_id"), jac.as("jac"), est.as("est"))
        .where(col("jac") >= 0.5)
        .select(col("a_id"), col("b_id"), round(col("jac"), 6).as("jac"),
          (abs(col("est") - col("jac")) <= 0.25).as("within_bound"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // --- dedup impact by source ------------------------------------------------
    // The per-source accounting of what exact dedup REMOVES — the audit
    // that catches a mirror-heavy crawl source before its survivors are
    // over-represented downstream: per source, document and char counts,
    // how many documents lose to keep-first (min doc_id per md5 key,
    // the dedup_exact_groups rule), and the removed char share. Losers
    // arrive by an anti-join of the corpus against the keeper set, so
    // the query is two hash aggregates and one key-equi anti-join — the
    // exact-dedup cost shape, per-source readout.
    Q(
      "dedup_impact_by_source",
      """WITH k AS (SELECT MIN(doc_id) AS doc_id FROM documents
        |  GROUP BY md5(text)),
        |lost AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_dupes,
        |    CAST(SUM(d.n_chars) AS BIGINT) AS chars_removed
        |  FROM documents d
        |  WHERE NOT EXISTS (SELECT 1 FROM k WHERE k.doc_id = d.doc_id)
        |  GROUP BY d.source),
        |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source)
        |SELECT t.source, t.n_docs, COALESCE(l.n_dupes, 0) AS n_dupes,
        |  COALESCE(l.chars_removed, 0) AS chars_removed,
        |  CAST(COALESCE(l.chars_removed, 0) * 1000000 // t.n_chars
        |    AS BIGINT) AS removed_share_ppm
        |FROM tot t LEFT JOIN lost l ON t.source = l.source
        |ORDER BY t.source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val k = docs.groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("kid"))
        .select(col("kid"))
      val lost = docs
        .join(k, col("doc_id") === col("kid"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_dupes"),
          sum(col("n_chars")).cast("long").as("chars_removed"))
      val tot = docs.groupBy(col("source").as("tsource"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars"))
      tot.join(lost, col("tsource") === col("source"), "left")
        .select(col("tsource").as("source"), col("n_docs"),
          coalesce(col("n_dupes"), lit(0L)).as("n_dupes"),
          coalesce(col("chars_removed"), lit(0L)).as("chars_removed"),
          expr("CAST(COALESCE(chars_removed, 0) * 1000000 div n_chars" +
            " AS BIGINT)").as("removed_share_ppm"))
        .orderBy(col("source"))
    }
  )

  /** Maximal repeated-span summary per doc for `dedup_substring` (and
    * direct unit tests): docs(doc_id, text) → (doc_id, n_rep_spans,
    * toks_dropped), only docs with ≥ 1 non-first repeated L-gram. */
  private[queries] def substringDedupSpans(
      docs: org.apache.spark.sql.DataFrame, L: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    val base = docs.select(col("doc_id"),
      TextOps.tokens(col("text")).as("toks"))
    val grams = base
      .select(col("doc_id"), posexplode(expr(
        s"CASE WHEN size(toks) >= $L THEN transform(" +
          s"sequence(1, size(toks) - ${L - 1}), " +
          s"p -> concat_ws(' ', slice(toks, p, $L))) " +
          "ELSE CAST(array() AS array<string>) END")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("gram"))
    val firsts = grams.groupBy(col("gram"))
      .agg(min(col("doc_id") * 1024 + col("p")).as("first_occ"))
    val marked = grams.join(firsts, "gram")
      .where(col("doc_id") * 1024 + col("p") =!= col("first_occ"))
      .select(col("doc_id"), col("p"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val isl = marked
      .withColumn("brk", when(lag(col("p"), 1).over(w).isNull
        || col("p") > lag(col("p"), 1).over(w) + (L - 1), 1)
        .otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(L - 1)).as("e"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rep_spans"),
        sum(col("e") - col("s") + 1).as("toks_dropped"))
  }
}
