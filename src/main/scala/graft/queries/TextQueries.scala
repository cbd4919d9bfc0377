package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{HeavyHitters, TextOps}

/** Text-analysis query inventory over the `documents` table: token
  * counting, word counts, quality scoring, language-ID, fingerprinting
  * (the training-data-pipeline text surface of the build brief).
  *
  * All row-level features are narrow projections (no shuffle); only the
  * word-count aggregation exchanges data, on the word key — both shapes
  * hold unchanged at 100 TB.
  */
object TextQueries {

  /** Training rounds for `text_bpe_train` — enough that later merges
    * provably compose earlier ones (round 6 merges "m"+"er"). */
  private val BpeRounds = 6

  /** Shared BPE oracle WITH-chain: one block per round — pair counts
    * from the previous vocabulary generation, the 1-row argmax (same
    * tiebreak as the engine: count DESC, l, r), and the rewritten
    * generation via the same greedy leftmost fold the engine applies
    * (list_reduce over the symbol list; accumulator = space-joined
    * symbols — symbols never contain spaces). Each generation carries
    * the word itself so the encode oracle can join back to documents. */
  private def bpeWithChain(rounds: Int): String = {
    val roundBlocks = (1 to rounds).map { k =>
      s"""p$k AS (SELECT list_extract(syms, CAST(i AS INT)) AS l,
         |        list_extract(syms, CAST(i AS INT) + 1) AS r, wf
         |      FROM v${k - 1}, UNNEST(range(1, len(syms))) AS t(i)),
         |b$k AS (SELECT l, r, l || r AS m,
         |        CAST(SUM(wf) AS BIGINT) AS pair_count
         |      FROM p$k GROUP BY l, r
         |      ORDER BY pair_count DESC, l, r LIMIT 1),
         |v$k AS (SELECT word, string_split(list_reduce(syms,
         |        (acc, s) -> CASE
         |          WHEN regexp_extract(acc, '[^ ]*$$') = b$k.l AND s = b$k.r
         |          THEN CASE WHEN strpos(acc, ' ') = 0 THEN b$k.m
         |               ELSE regexp_replace(acc, ' [^ ]*$$', '') ||
         |            ' ' || b$k.m END
         |          ELSE acc || ' ' || s END), ' ') AS syms, wf
         |      FROM v${k - 1}, b$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |      '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word FROM documents),
       |v0 AS (SELECT word, string_split(word, '') AS syms, COUNT(*) AS wf
       |      FROM tok GROUP BY word),
       |$roundBlocks""".stripMargin
  }

  private def bpeTrainOracle(rounds: Int): String = {
    val out = (1 to rounds)
      .map(k => s"SELECT $k AS round, m AS merge, l, r, pair_count FROM b$k")
      .mkString(" UNION ALL ")
    s"""${bpeWithChain(rounds)}
       |SELECT * FROM ($out) ORDER BY round""".stripMargin
  }

  private def bpeEncodeOracle(rounds: Int): String =
    s"""${bpeWithChain(rounds)},
       |enc AS (SELECT word, len(syms) AS n_sub FROM v$rounds)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_sub) AS BIGINT) AS n_subwords
       |FROM tok JOIN enc USING (word)
       |GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin

  // ---- unigram-LM tokenizer (SentencePiece-style sibling of BPE) -------
  //
  // Kudo's unigram LM trainer (ACL 2018, public) seeds a large
  // substring vocabulary and alternates segment → re-estimate → prune.
  // The engine-exact restatement here keeps that loop shape but swaps
  // the float EM for integer machinery both engines replay bit-for-bit:
  //
  //  - SEED: all corpus substrings of length 1..UniMaxLen scored by
  //    occurrence frequency; keep the top UniSeedK multi-char pieces by
  //    (freq DESC, piece ASC) plus every single char (coverage). This
  //    ordering makes the seed PREFIX-CLOSED for free: a prefix occurs
  //    at least wherever its extension does (freq(prefix) ≥ freq(p)),
  //    and on ties the prefix sorts first — so p in the top-K implies
  //    every prefix is too.
  //  - SEGMENT: greedy longest-match, implemented as a single
  //    char-fold — extend the last token while the extension is in the
  //    vocabulary, else start a new token. With a prefix-closed
  //    vocabulary extend-while-member IS longest-match (the chain of
  //    prefixes to the longest piece is all present), which is what
  //    makes the fold exact in both engines (DuckDB list_reduce ↔
  //    Spark aggregate, the text_bpe_train codec: tokens never contain
  //    spaces, so the accumulator is the space-joined segmentation).
  //  - PRUNE: usage = Σ word_freq per piece used; keep the top
  //    UniKeepK(r) multi-char pieces by (usage DESC, piece ASC), then
  //    RE-CLOSE by AUGMENTATION — union the kept pieces' proper
  //    prefixes back in (usage is not antitone: segmentation consumes
  //    prefixes inside longer matches, so a useful piece's prefix can
  //    have zero usage of its own; dropping unclosed pieces instead
  //    was measured to collapse the vocabulary to near-alphabet in one
  //    round, while augmentation costs at most 2 extra pieces per kept
  //    one at UniMaxLen = 4).
  //
  // Vocabulary state between rounds is BOUNDED (≤ UniSeedK + alphabet)
  // and passes through the driver as literals — the KMeans-centroid /
  // BPE-merge discipline — so rounds never nest lineage. The only
  // corpus-sized work is the word-vocab build and the encode join;
  // every segmentation runs over DISTINCT words (the vocab trick).
  private val UniMaxLen = 4
  private val UniSeedK = 120
  // keep budgets BELOW the used-piece count so each prune forces a
  // re-segmentation (a budget above it only drops unused pieces and
  // the loop trivially fixpoints — measured: 80 left corpus_tokens
  // unchanged across all rounds at sf0.01, 40/25 moves every round)
  private val UniKeepK = Seq(40, 25)
  private val UniRounds = 3

  /** Oracle WITH-chain through seg$UniRounds: same seed, same fold,
    * same prune+close per round. MATERIALIZED throughout — v0 and each
    * seg are referenced twice downstream (the k-core CTE lesson). */
  private def unigramWithChain: String = {
    val fold = (src: String) =>
      s"""SELECT word, wf, list_reduce(string_split(word, ''),
         |        (acc, c) -> CASE WHEN list_contains(vl,
         |            regexp_extract(acc, '[^ ]*$$') || c)
         |          THEN acc || c ELSE acc || ' ' || c END) AS s
         |      FROM v0, $src""".stripMargin
    val rounds = (1 until UniRounds).map { r =>
      s"""use$r AS MATERIALIZED (SELECT piece,
         |        CAST(SUM(wf) AS BIGINT) AS u
         |      FROM (SELECT unnest(string_split(s, ' ')) AS piece, wf
         |            FROM seg$r) GROUP BY piece),
         |kept$r AS MATERIALIZED (SELECT piece FROM use$r
         |      WHERE length(piece) >= 2
         |      ORDER BY u DESC, piece LIMIT ${UniKeepK(r - 1)}),
         |cl$r AS MATERIALIZED (SELECT DISTINCT piece FROM (
         |      SELECT piece FROM kept$r
         |      UNION ALL SELECT substr(piece, 1, 2) AS piece
         |        FROM kept$r WHERE length(piece) >= 3
         |      UNION ALL SELECT substr(piece, 1, 3) AS piece
         |        FROM kept$r WHERE length(piece) >= 4)),
         |vl${r + 1} AS (SELECT list(piece) AS vl FROM
         |      (SELECT piece FROM chars UNION ALL SELECT piece FROM cl$r)),
         |seg${r + 1} AS MATERIALIZED (${fold(s"vl${r + 1}")})"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |      '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word FROM documents),
       |v0 AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS wf
       |      FROM tok GROUP BY word),
       |sub AS MATERIALIZED (SELECT
       |        substr(word, CAST(p AS INT), CAST(l AS INT)) AS piece,
       |        CAST(SUM(wf) AS BIGINT) AS freq
       |      FROM v0,
       |        UNNEST(range(1, length(word) + 1)) AS tp(p),
       |        UNNEST(range(1, ${UniMaxLen + 1})) AS tl(l)
       |      WHERE p + l - 1 <= length(word)
       |      GROUP BY piece),
       |chars AS MATERIALIZED (SELECT piece FROM sub
       |      WHERE length(piece) = 1),
       |seed AS MATERIALIZED (SELECT piece FROM sub
       |      WHERE length(piece) >= 2
       |      ORDER BY freq DESC, piece LIMIT $UniSeedK),
       |vl1 AS (SELECT list(piece) AS vl FROM
       |      (SELECT piece FROM chars UNION ALL SELECT piece FROM seed)),
       |seg1 AS MATERIALIZED (${fold("vl1")}),
       |$rounds""".stripMargin
  }

  private def unigramTrainOracle: String = {
    // derived, never hand-listed: round r segments with the vocab named
    // here, so the list MUST track UniRounds/UniKeepK — a literal
    // Seq("seed","cl1","cl2") compiled fine after a constant bump but
    // silently desynchronized oracle from engine
    require(UniKeepK.length == UniRounds - 1,
      s"unigram config: UniKeepK has ${UniKeepK.length} entries " +
        s"but UniRounds=$UniRounds needs ${UniRounds - 1}")
    val vocabOf = "seed" +: (1 until UniRounds).map(r => s"cl$r")
    val out = (1 to UniRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  CAST((SELECT COUNT(*) FROM chars)
         |    + (SELECT COUNT(*) FROM ${vocabOf(r - 1)}) AS BIGINT)
         |    AS vocab_size,
         |  CAST((SELECT SUM(wf * len(string_split(s, ' '))) FROM seg$r)
         |    AS BIGINT) AS corpus_tokens""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$unigramWithChain
       |SELECT * FROM (
       |$out)
       |ORDER BY round""".stripMargin
  }

  private def unigramEncodeOracle: String =
    s"""$unigramWithChain,
       |enc AS (SELECT word,
       |      CAST(len(string_split(s, ' ')) AS BIGINT) AS n_p
       |      FROM seg$UniRounds)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_p) AS BIGINT) AS n_pieces
       |FROM tok JOIN enc USING (word)
       |GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin

  /** The engine loop: returns (per-round trace, final vocabulary, the
    * checkpointed word vocab for the encode join). Bounded driver
    * state only — the per-round vocabulary and usage head. */
  private[queries] def unigramRounds(s: org.apache.spark.sql.SparkSession,
      d: String): (Seq[(Long, Long, Long)], Seq[String],
      org.apache.spark.sql.DataFrame) = {
    val v0 = Tables.documents(s, d)
      .select(explode(TextOps.regexTokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).cast("long").as("wf"))
      .localCheckpoint()
    val sub = v0.select(col("wf"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), p -> " +
          s"transform(sequence(1, least($UniMaxLen, length(word) - p + 1))," +
          s" l -> substring(word, p, l))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wf")).as("freq"))
    val chars = sub.where(length(col("piece")) === 1)
      .select(col("piece")).collect().map(_.getString(0)).toSeq.sorted
    var multi = sub.where(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(UniSeedK)
      .select(col("piece")).collect().map(_.getString(0)).toSeq
    val trace = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    for (r <- 1 to UniRounds) {
      val seg = unigramSegment(v0, chars ++ multi)
      val tokens = seg
        .agg(sum(col("wf") * size(split(col("s"), " "))).cast("long"))
        .head().getLong(0)
      trace += ((r.toLong, (chars.size + multi.size).toLong, tokens))
      if (r < UniRounds) {
        val usage = seg
          .select(explode(split(col("s"), " ")).as("piece"), col("wf"))
          .groupBy(col("piece")).agg(sum(col("wf")).cast("long").as("u"))
          .where(length(col("piece")) >= 2)
          .orderBy(col("u").desc, col("piece")).limit(UniKeepK(r - 1))
          .select(col("piece")).collect().map(_.getString(0)).toSeq
        multi = (usage ++
          usage.filter(_.length >= 3).map(_.substring(0, 2)) ++
          usage.filter(_.length >= 4).map(_.substring(0, 3))).distinct
      }
    }
    (trace.toSeq, chars ++ multi, v0)
  }

  /** The greedy longest-match fold over a prefix-closed vocabulary —
    * the Spark twin of the oracle's list_reduce. */
  private[queries] def unigramSegment(v0: org.apache.spark.sql.DataFrame,
      vocab: Seq[String]): org.apache.spark.sql.DataFrame = {
    val vlArr = array(vocab.map(lit): _*)
    v0.withColumn("cs", filter(split(col("word"), ""), c => c =!= ""))
      .withColumn("s", aggregate(
        expr("slice(cs, 2, size(cs) - 1)"),
        element_at(col("cs"), 1),
        (acc, c) => when(
          array_contains(vlArr,
            concat(regexp_extract(acc, "[^ ]*$", 0), c)),
          concat(acc, c)).otherwise(concat(acc, lit(" "), c))))
  }

  /** DuckDB list literal of the English stopwords (shared by quality +
    * langid + pipeline oracles — one source, no drift). */
  private def stopwordsSql: String =
    TextOps.EnglishStopwords.map("'" + _ + "'").mkString("[", ",", "]")

  /** The langid argmax as a DuckDB expression over `text`, generated
    * from the same LangProfiles the engine scores with. */
  private def langidBestSql: String = {
    val structs = TextOps.LangProfiles.map { case (lang, words) =>
      val wl = words.map("'" + _ + "'").mkString("[", ",", "]")
      s"""struct_pack(score := CAST(len(list_filter(string_split(text, ' '),
         |      t -> list_contains($wl, t))) AS DOUBLE)
         |      / len(string_split(text, ' ')), lang := '$lang')""".stripMargin
    }.mkString(",\n    ")
    s"list_max([\n    $structs])"
  }

  /** Hashing-trick linear model shared by engine and oracle: 1024 hashed
    * feature buckets, integer weights derived from the bucket id by a
    * Knuth multiplicative hash. In production the weight vector comes
    * from a trained classifier; the deterministic table is the declared
    * stand-in (same contract as the multimodal decoder stub) — what is
    * being proven is the inference plumbing: featurize → broadcast
    * weight lookup → per-doc reduce, all in exact integer arithmetic. */
  /** BM25 query vocabulary: three content terms plus one near-stopword
    * ('the', df > N/2 → idf2 = 0) proving the suppression path. */
  private val Bm25Terms = Seq("spark", "merge", "window", "the")

  private val ModelBuckets = 1024
  private[queries] val ModelWeights: Array[Long] =
    Array.tabulate(ModelBuckets)(b => ((b.toLong * 2654435761L) % 4096L) - 2048L)

  /** In-engine trainer config for `text_quality_train`: hashed-feature
    * bucket count (md5-derived, so both engines agree bit-for-bit) and
    * fixed batch-perceptron iteration count. Bucket `TrainBuckets` is
    * the bias feature (count 1 per document). */
  private val TrainBuckets = 256
  private val TrainIters = 3

  /** Shared feature/label derivation for the in-engine quality trainer:
    * `feat` = per-(doc, hashed-bucket) token counts plus the bias row;
    * `st` = per-doc token total and the training label. The label is the
    * repetition heuristic text_quality gates on, restated in pure
    * integer cross-multiplication (dup_word_frac ≤ 0.9 ⇔
    * 10·n_distinct ≥ n_words; top_word_frac ≤ 0.2 ⇔ 5·top_f ≤ n_words)
    * so both engines compare identical integers — the trainer then
    * learns to PREDICT that label from hashed unigrams alone, which is
    * exactly the fastText-style distillation production quality
    * classifiers are built by. */
  private def qualityTrainFrames(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
    val bucket = pmod(
      conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"),
      lit(TrainBuckets.toLong))
    val feat = toks
      .select(col("doc_id"), bucket.as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .unionByName(Tables.documents(s, d).select(col("doc_id"),
        lit(TrainBuckets.toLong).as("bucket"), lit(1L).as("cnt")))
    val st = toks.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("doc_id"))
      .agg(sum(col("f")).as("nw"), count(lit(1)).as("nd"),
        max(col("f")).as("tf"))
      .select(col("doc_id"), col("nw").cast("long").as("n_tokens"),
        (col("nd") * 10 >= col("nw") && col("tf") * 5 <= col("nw"))
          .as("label"))
    (feat, st)
  }

  /** Fixed-iteration batch perceptron over the hashed features, exact
    * integer arithmetic throughout: margin_i = Σ_b cnt_{i,b}·w_b (the
    * weight vector rides the plan as a broadcast literal, like the
    * fixed ModelWeights table); every misclassified document
    * contributes ±cnt to its buckets' gradient; w += gradient. Each
    * iteration is ONE distributed pass over the (doc, bucket) count
    * table plus a collect bounded by the MODEL size (≤ 257 gradient
    * rows — the k-means/BPE bounded-collect precedent), so the shape
    * is full-batch distributed GD with a driver-side parameter update —
    * the right 100 TB topology for a model this small (a parameter
    * server only becomes necessary when the model outgrows a
    * broadcast). Deterministic: no sampling, no shuffling, integer
    * sums — the oracle replays every iteration verbatim. */
  private def trainQualityWeights(s: org.apache.spark.sql.SparkSession,
      d: String): Array[Long] = {
    val (feat0, st0) = qualityTrainFrames(s, d)
    // both frames are read TrainIters times — persist for the training
    // loop, release before returning (the weighted-median discipline)
    val feat = feat0.persist(); val st = st0.persist()
    val wts = Array.fill(TrainBuckets + 1)(0L)
    try {
      for (_ <- 1 to TrainIters) {
        val wlit = typedlit(wts.toSeq)
        val mis = feat
          .select(col("doc_id"), (col("cnt") *
            element_at(wlit, (col("bucket") + 1).cast("int"))).as("p"))
          .groupBy(col("doc_id")).agg(sum(col("p")).as("margin"))
          .join(st, "doc_id")
          .where((col("margin") > 0) =!= col("label"))
          .select(col("doc_id"), col("label"))
        val grad = feat.join(mis, "doc_id")
          .groupBy(col("bucket"))
          .agg(sum(when(col("label"), col("cnt")).otherwise(-col("cnt")))
            .cast("long").as("gr"))
          .collect() // ≤ TrainBuckets+1 rows — model-sized, not corpus
        grad.foreach(r => wts(r.getLong(0).toInt) += r.getLong(1))
      }
    } finally { feat.unpersist(); st.unpersist() }
    wts
  }

  /** Oracle WITH-chain replaying the trainer: one (margin → gradient →
    * weight) block per iteration, seeded from an all-zero weight table
    * (the bpeWithChain unroll pattern — fixed iteration count makes the
    * replay a plain CTE chain, no recursion). */
  private def perceptronChain(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""m$k AS (SELECT f.doc_id, l.label, SUM(f.cnt * w.w) AS margin
         |  FROM feat f JOIN w${k - 1} w USING (bucket)
         |  JOIN st l USING (doc_id)
         |  GROUP BY f.doc_id, l.label),
         |g$k AS (SELECT f.bucket,
         |    CAST(SUM(CASE WHEN m.label THEN f.cnt ELSE -f.cnt END)
         |      AS BIGINT) AS gr
         |  FROM feat f JOIN m$k m USING (doc_id)
         |  WHERE (m.margin > 0) <> m.label
         |  GROUP BY f.bucket),
         |w$k AS (SELECT w.bucket,
         |    CAST(w.w + COALESCE(g.gr, 0) AS BIGINT) AS w
         |  FROM w${k - 1} w LEFT JOIN g$k g USING (bucket))""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |wf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM tok GROUP BY doc_id, word),
       |st AS (SELECT doc_id, CAST(SUM(f) AS BIGINT) AS n_tokens,
       |    (10 * COUNT(*) >= SUM(f) AND 5 * MAX(f) <= SUM(f)) AS label
       |  FROM wf GROUP BY doc_id),
       |feat AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(word), 1, 15))::BIGINT % $TrainBuckets
       |      AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM tok GROUP BY doc_id, bucket
       |  UNION ALL
       |  SELECT doc_id, CAST($TrainBuckets AS BIGINT), CAST(1 AS BIGINT)
       |  FROM documents),
       |w0 AS (SELECT CAST(range AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w
       |  FROM range(${TrainBuckets + 1})),
       |$rounds""".stripMargin
  }

  /** Shared BM25 oracle (see text_bm25_topk's scaladoc for the
    * integer-exact formula) — reused verbatim by text_bm25_persist: the
    * posting-list storage layer must be invisible to the ranking. */
  private lazy val Bm25Oracle: String = {
    val tfs = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
    }.mkString(",\n        ")
    val dfs = Bm25Terms.indices.map { i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(",\n        ")
    val scores = Bm25Terms.indices.map { i =>
      s"""CASE WHEN tf$i > 0 THEN
         |  (length(bin(n_docs)) - length(bin(df$i)))
         |  * (20 * tf$i * avgdl * 1000000)
         |  // (8 * tf$i * avgdl + 3 * avgdl + 9 * dl) ELSE 0 END"""
        .stripMargin
    }.mkString(" +\n        ")
    s"""WITH s AS (SELECT doc_id, len(toks) AS dl,
       |        $tfs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
       |        FROM documents)),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |        CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
       |          AS avgdl,
       |        $dfs
       |  FROM s)
       |SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       |  CAST($scores AS BIGINT) AS score
       |FROM s, g
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // --- token counting: whitespace + regex (BPE-ish pre-tokenizer) ----
    Q(
      "text_token_counts",
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |    AS n_regex_tokens
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val toks = TextOps.tokens(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.TextKernels.pre_token_count(col("text"))
          .as("n_regex_tokens"))
        .orderBy(col("doc_id"))
    },

    // --- corpus word frequencies, top 50 --------------------------------
    Q(
      "text_wordcount_topk",
      """SELECT word, COUNT(*) AS n FROM
        |  (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word
        |ORDER BY n DESC, word NULLS FIRST
        |LIMIT 50""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    },

    // --- quality scoring: lexical diversity + stopword density ----------
    Q(
      "text_quality",
      s"""SELECT doc_id,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |    AS n_distinct,
         |  ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / len(string_split(text, ' ')), 6) AS distinct_ratio,
         |  ROUND(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
         |    / len(string_split(text, ' ')), 6) AS avg_token_len,
         |  ROUND(CAST(len(list_filter(string_split(text, ' '),
         |      t -> list_contains(${TextOps.EnglishStopwords.map("'" + _ + "'").mkString("[", ",", "]")}, t))) AS DOUBLE)
         |    / len(string_split(text, ' ')), 6) AS stopword_ratio
         |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // one-pass native kernel (TokenStats); ratio math mirrors the
      // compositional TextOps.qualityFeatures exactly (spec-asserted)
      val f = graft.functions.TokenStats.token_stats(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), f.as("f"))
        .select(
          col("doc_id"),
          col("f.n_distinct").as("n_distinct"),
          round(col("f.n_distinct").cast("double") / col("f.n_tokens"), 6)
            .as("distinct_ratio"),
          round((col("f.n_chars") - col("f.n_tokens") + 1).cast("double")
            / col("f.n_tokens"), 6).as("avg_token_len"),
          round(col("f.stopword_hits").cast("double") / col("f.n_tokens"), 6)
            .as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },

    // --- language-ID heuristic (stopword-profile argmax) ----------------
    // Oracle is generated from the SAME LangProfiles wordlists: per-lang
    // score = stopword-hit rate, argmax via list_max over (score, lang)
    // structs — DuckDB's struct compare is lexicographic like Spark's
    // array_max, so ties break identically (max lang name). The score is
    // one integer division → bit-identical doubles on both sides.
    Q(
      "text_langid",
      s"""SELECT doc_id, labeled_lang,
         |  best.lang AS pred_lang, ROUND(best.score, 6) AS score
         |FROM (SELECT doc_id, lang AS labeled_lang, $langidBestSql AS best
         |  FROM documents)
         |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TextOps.langId(col("text")).as("pred"))
        .select(col("doc_id"), col("labeled_lang"),
          col("pred.lang").as("pred_lang"),
          round(col("pred.score"), 6).as("score"))
        .orderBy(col("doc_id"))
    },

    // --- language-ID evaluation (confusion matrix + per-label accuracy) -
    // The eval half of text_langid: the corpus carries ground-truth
    // labels, so the classifier earns a confusion matrix — (labeled,
    // predicted, n) cells plus per-label accuracy in integer ppm (a
    // window over the labeled partition; ≤ langs² cells, trivially
    // small). Model-quality measurement is as much a pipeline operator
    // as the model itself: this is the query a curation stack runs
    // before trusting a language filter at 100 TB.
    Q(
      "text_langid_eval",
      s"""WITH p AS (SELECT lang AS labeled_lang,
         |    ($langidBestSql).lang AS pred_lang
         |  FROM documents),
         |c AS (SELECT labeled_lang, pred_lang, COUNT(*) AS n
         |      FROM p GROUP BY labeled_lang, pred_lang)
         |SELECT labeled_lang, pred_lang, CAST(n AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN pred_lang = labeled_lang THEN n ELSE 0 END)
         |      OVER (PARTITION BY labeled_lang) * 1000000
         |    // SUM(n) OVER (PARTITION BY labeled_lang) AS BIGINT)
         |    AS label_acc_ppm
         |FROM c
         |ORDER BY labeled_lang NULLS FIRST, pred_lang NULLS FIRST"""
        .stripMargin
    ) { (s, d) =>
      val c = Tables.documents(s, d)
        .select(col("lang").as("labeled_lang"),
          TextOps.langId(col("text")).getField("lang").as("pred_lang"))
        .groupBy(col("labeled_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("label_acc_ppm",
          expr("sum(CASE WHEN pred_lang = labeled_lang THEN n ELSE 0 END)" +
            " over (partition by labeled_lang) * 1000000 div " +
            "sum(n) over (partition by labeled_lang)").cast("long"))
        .orderBy(col("labeled_lang"), col("pred_lang"))
    },

    // --- corpus-frequency rarity score (CCNet-style quality signal) -----
    // Two-pass rare-token scoring: pass 1 builds the corpus unigram table
    // (hash aggregate on the word key, combiner-friendly); pass 2 joins
    // each token instance back to its corpus count and aggregates per doc.
    // The token join is a SHUFFLE join on `word` by design — at 100 TB the
    // vocabulary (hundreds of millions of types with long-tail web text)
    // outgrows a broadcast, and the word key is high-cardinality so the
    // exchange balances; docs with rarer vocabulary score lower mean_freq.
    // All outputs are exact BIGINTs plus ONE int/int division — a single
    // IEEE division of exact integers is correctly rounded identically in
    // both engines (operands < 2^53), so the double is bit-exact.
    Q(
      "text_rarity_score",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |cf AS (SELECT word, COUNT(*) AS cf FROM w GROUP BY word)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(cf) AS BIGINT) AS freq_sum,
        |  CAST(MIN(cf) AS BIGINT) AS min_cf,
        |  CAST(SUM(cf) AS DOUBLE) / COUNT(*) AS mean_freq
        |FROM w JOIN cf USING (word)
        |GROUP BY doc_id
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      val cf = w.groupBy(col("word")).agg(count(lit(1)).as("cf"))
      w.join(cf, "word")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(col("cf")).as("freq_sum"),
          min(col("cf")).as("min_cf"))
        .select(col("doc_id"), col("n_tokens"), col("freq_sum"), col("min_cf"),
          (col("freq_sum").cast("double") / col("n_tokens")).as("mean_freq"))
        .orderBy(col("doc_id"))
    },

    // --- model-based quality filtering (hashing-trick linear scorer) ----
    // The fastText-style quality-classifier pass every production corpus
    // runs: hash each token into a fixed bucket space (md5-derived, so
    // both engines agree bit-for-bit), look its weight up in the
    // broadcast model table, sum per document. The weight table rides
    // into the plan as an array literal — O(buckets) bytes broadcast
    // once, independent of corpus size; featurize+lookup is a narrow
    // codegen projection; the only shuffle is the per-doc combiner-
    // friendly sum. Score stays integral (exact); mean_w is one
    // int/int division (bit-exact, operands < 2^53).
    Q(
      "text_quality_model",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |           FROM documents),
         |b AS (SELECT doc_id,
         |        ${ModelWeights.mkString("[", ",", "]")}[
         |          (('0x' || substr(md5(word), 1, 15))::BIGINT % 1024) + 1]
         |          AS wt
         |      FROM w)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(wt) AS BIGINT) AS score,
         |  CAST(SUM(wt) AS DOUBLE) / COUNT(*) AS mean_w,
         |  CAST(SUM(wt) AS BIGINT) > 0 AS is_quality
         |FROM b GROUP BY doc_id
         |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val bucket = pmod(
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"),
        lit(1024L))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("doc_id"),
          element_at(typedlit(ModelWeights.toSeq), (bucket + 1).cast("int"))
            .as("wt"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("score"))
        .select(col("doc_id"), col("n_tokens"), col("score"),
          (col("score").cast("double") / col("n_tokens")).as("mean_w"),
          (col("score") > 0).as("is_quality"))
        .orderBy(col("doc_id"))
    },

    // --- exact top-k words via heavy-hitters sketch + recount -----------
    // The scale pattern for exact top-k over web-scale text: a mergeable
    // Misra–Gries sketch (TypedImperativeAggregate — O(capacity) state
    // per task, merged on the reducer) yields ≤256 candidate words in one
    // pass; the candidates broadcast back over the token stream for exact
    // counts; top-20 of the recount. Result provably equals the exact
    // GROUP-BY answer whenever the 20th word's true count exceeds
    // n/257 — which the oracle (the plain exact aggregation) verifies.
    // Exact GROUP BY shuffles the full type table (hundreds of millions
    // of keys on real corpora); this shuffles ≤256 keys.
    Q(
      "text_heavy_hitters",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |           FROM documents)
        |SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM w GROUP BY word
        |ORDER BY n DESC, word LIMIT 20""".stripMargin
    ) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
      val cand = w
        .agg(HeavyHitters.heavy_hitters(col("word"), 256).as("cand"))
        .select(explode(col("cand")).as("word"))
      w.join(broadcast(cand), "word")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    },

    // --- deterministic content fingerprint (md5 of normalized text) -----
    Q(
      "text_fingerprint",
      """SELECT doc_id, md5(lower(text)) AS fp
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
        .orderBy(col("doc_id"))
    },

    // --- the composite: a full curation pass over the corpus -------------
    // What the library exists for, as ONE declarative plan: score every
    // doc (one-pass TokenStats kernel + langid), drop exact duplicates
    // (keep lowest doc_id per content hash), gate on quality thresholds,
    // and emit the manifest with a running corpus token budget. Shape at
    // 100 TB: one scan, one narrow shuffle on the content hash, one
    // all-reduce for the budget — no stage is O(pairs).
    Q(
      "pipe_curated_corpus",
      s"""WITH scored AS (
         |  SELECT doc_id, md5(text) AS fp,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS distinct_ratio,
         |    CAST(len(list_filter(string_split(text, ' '),
         |        t -> list_contains($stopwordsSql, t))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS stopword_ratio,
         |    $langidBestSql.lang AS pred_lang
         |  FROM documents),
         |kept AS (SELECT * FROM scored
         |  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
         |SELECT doc_id, pred_lang, n_tokens,
         |  CAST(SUM(n_tokens) OVER () AS BIGINT) AS corpus_tokens
         |FROM kept
         |WHERE n_tokens >= 30 AND stopword_ratio >= 0.02
         |  AND distinct_ratio >= 0.5
         |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val f = graft.functions.TokenStats.token_stats(col("text"))
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"), f.as("f"),
          TextOps.langId(col("text")).getField("lang").as("pred_lang"))
        .select(col("doc_id"), col("fp"), col("pred_lang"),
          col("f.n_tokens").as("n_tokens"),
          (col("f.n_distinct").cast("double") / col("f.n_tokens"))
            .as("distinct_ratio"),
          (col("f.stopword_hits").cast("double") / col("f.n_tokens"))
            .as("stopword_ratio"))
      val keepFirst = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      scored
        .withColumn("rn", row_number().over(keepFirst))
        .where(col("rn") === 1)
        .where(col("n_tokens") >= 30 && col("stopword_ratio") >= 0.02
          && col("distinct_ratio") >= 0.5)
        .select(col("doc_id"), col("pred_lang"), col("n_tokens"),
          sum(col("n_tokens")).over(Window.partitionBy())
            .as("corpus_tokens"))
        .orderBy(col("doc_id"))
    },

    // --- BPE merge candidates: tokenizer training, step one -------------
    // The first merge selection of byte-pair-encoding training: count
    // adjacent character pairs over the corpus, weighted by word
    // frequency. The classic scale trick is load-bearing: pair counting
    // runs over the VOCABULARY (distinct pre-tokenized words with their
    // frequencies — one corpus-sized shuffle on the word key, the same
    // exchange text_wordcount_topk pays), never over running text, so
    // the char-pair explode + HOF lambda touch |vocab| rows, orders of
    // magnitude below corpus size. Top-k via sort+limit
    // (TakeOrderedAndProject), total order so the rank-20 boundary cuts
    // deterministically.
    Q(
      "text_bpe_merges",
      """WITH w AS (SELECT unnest(regexp_extract_all(text,
        |             '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word
        |           FROM documents),
        |v AS (SELECT word, COUNT(*) AS wf FROM w GROUP BY word),
        |p AS (SELECT substring(word, CAST(i AS INT), 1) AS l,
        |             substring(word, CAST(i AS INT) + 1, 1) AS r, wf
        |      FROM v, UNNEST(range(1, length(word))) AS t(i)
        |      WHERE length(word) >= 2)
        |SELECT l || r AS merge, l, r, CAST(SUM(wf) AS BIGINT) AS pair_count
        |FROM p GROUP BY l, r
        |ORDER BY pair_count DESC, l NULLS FIRST, r NULLS FIRST
        |LIMIT 20""".stripMargin
    ) { (s, d) =>
      val vocab = Tables.documents(s, d)
        .select(explode(TextOps.regexTokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wf"))
        .where(length(col("word")) >= 2)
      vocab
        .select(col("wf"),
          explode(transform(sequence(lit(1), length(col("word")) - 1),
            i => struct(col("word").substr(i, lit(1)).as("l"),
              col("word").substr(i + lit(1), lit(1)).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wf")).as("pair_count"))
        .select(concat(col("l"), col("r")).as("merge"), col("l"), col("r"),
          col("pair_count"))
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(20)
    },

    // --- iterative BPE training: the full merge loop ---------------------
    // text_bpe_merges is round 1's candidate table; this is the actual
    // trainer (operators.BpeTrain): 6 rounds of count → argmax → greedy
    // leftmost rewrite over the vocabulary, each later round seeing the
    // merged symbols of the earlier ones (the sf0.01 corpus learns
    // "m"+"er"→"mer" at round 6 on top of round 1's "e"+"r"). One
    // corpus-sized shuffle builds the vocab; every round after is
    // vocab-sized. The oracle replays the identical fold per round via
    // list_reduce with a string accumulator (symbols never contain
    // spaces, so join-on-space is a faithful codec).
    Q("text_bpe_train", bpeTrainOracle(BpeRounds)) { (s, d) =>
      val vocab = Tables.documents(s, d)
        .select(explode(TextOps.regexTokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wf"))
        .select(filter(split(col("word"), ""), x => x =!= "").as("syms"),
          col("wf"))
      val merges = graft.operators.BpeTrain.train(vocab, BpeRounds)
      import s.implicits._
      merges.map(m => (m.round, m.merged, m.l, m.r, m.pairCount))
        .toDF("round", "merge", "l", "r", "pair_count")
        .orderBy(col("round"))
    },

    // --- tokenizer application: encode the corpus with learned merges ---
    // The second half of the tokenizer lifecycle: per-document subword
    // counts under the merges text_bpe_train just learned — the number
    // that prices a corpus in tokens for a GIVEN tokenizer (fertility =
    // n_subwords/n_words; text_token_fertility measures a fixed scheme,
    // this measures the learned one). Encoding is the vocab trick again:
    // every DISTINCT word is encoded once (R narrow rewrites over the
    // vocab — no shuffle), then one corpus-sized join word→subword-count
    // and a per-doc sum. The vocab join is stats-driven, NOT hinted:
    // vocabulary grows with the corpus (Heaps' law — the ×100
    // fresh-text tier has 2.7M distinct words), so a forced broadcast
    // would ship an ever-growing table to every executor; small vocabs
    // broadcast from size stats anyway, large ones correctly demote to
    // a shuffle join on the word key (the big-dim lesson applied).
    Q("text_bpe_encode", bpeEncodeOracle(BpeRounds)) { (s, d) =>
      val docsW = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.regexTokens(col("text"))).as("word"))
      val vocab = docsW.groupBy(col("word")).agg(count(lit(1)).as("wf"))
        .select(col("word"),
          filter(split(col("word"), ""), x => x =!= "").as("syms"),
          col("wf"))
      // checkpointed final generation (shallow plan, blocks freed on GC)
      val (_, encoded) =
        graft.operators.BpeTrain.trainWithVocab(vocab, BpeRounds)
      val perWord =
        encoded.select(col("word"), size(col("syms")).as("n_sub"))
      docsW.join(perWord, "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
        .orderBy(col("doc_id"))
    },

    // --- unigram-LM tokenizer training (SentencePiece-style) ------------
    // BPE's missing sibling (see the unigram block comment above
    // [[unigramWithChain]]): seed a big substring vocabulary, then
    // alternate segment → usage-count → prune+re-close for UniRounds
    // rounds. The output is the convergence trace — per round, the
    // vocabulary size in force and the total corpus tokens its
    // segmentation produces — which proves the oracle replayed every
    // round, not just the final state (the text_bpe_train contract).
    Q("text_unigram_train", unigramTrainOracle) { (s, d) =>
      val (trace, _, _) = unigramRounds(s, d)
      import s.implicits._
      trace.toDF("round", "vocab_size", "corpus_tokens")
        .orderBy(col("round"))
    },

    // --- encode the corpus with the trained unigram vocabulary ----------
    // The lifecycle's second half (text_bpe_encode's twin): per-document
    // word and piece counts under the FINAL pruned vocabulary — the
    // token-pricing number for THIS tokenizer. Distinct words encode
    // once (the vocab trick); the only corpus-sized step is the
    // word→piece-count join, stats-driven like the BPE encode join.
    Q("text_unigram_encode", unigramEncodeOracle) { (s, d) =>
      val (_, vocab, v0) = unigramRounds(s, d)
      val perWord = unigramSegment(v0, vocab)
        .select(col("word"),
          size(split(col("s"), " ")).cast("long").as("n_p"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.regexTokens(col("text"))).as("word"))
        .join(perWord, "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_p")).as("n_pieces"))
        .orderBy(col("doc_id"))
    },

    // --- encode served off a COMMITTED vocabulary store ------------------
    // The build-once/serve-many split the BM25/IVF/graph families
    // already have, for the tokenizer: training commits the
    // prefix-closed vocabulary as a snapshot table (vocab-sized — the
    // cheapest index in the repo, but the LIFECYCLE is the point:
    // versioned, time-travelable, atomically replaceable under readers
    // when the tokenizer retrains), and encoding reads the pieces OFF
    // THE STORE — a tokenizer upgrade is a snapshot commit, not a
    // redeploy. Shares text_unigram_encode's oracle VERBATIM: a hash
    // match proves the store round-trip changed nothing. The corpus
    // tokenization (v0) is the query's input, not index state — only
    // the vocabulary crosses the store.
    Q("text_unigram_serve", unigramEncodeOracle) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = s"${sys.props("java.io.tmpdir")}/graft_unigram_vocab/$tag"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val (_, vocab, v0) = unigramRounds(s, d)
      // BUILD: the trained vocab becomes a snapshot table, partitioned
      // by piece length (bounded: 1..UniMaxLen partitions)
      import s.implicits._
      graft.io.Snapshots.commitFull(
        vocab.toDF("piece").withColumn("pl", length(col("piece"))),
        root, "pl")
      // SERVE: the fold's vocabulary comes from the STORE (vocab-sized
      // driver pull — the same bounded class the trainer itself holds)
      val served = graft.io.Snapshots.read(s, root)
        .select(col("piece")).collect().map(_.getString(0)).toSeq.sorted
      val perWord = unigramSegment(v0, served)
        .select(col("word"),
          size(split(col("s"), " ")).cast("long").as("n_p"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.regexTokens(col("text"))).as("word"))
        .join(perWord, "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_p")).as("n_pieces"))
        .orderBy(col("doc_id"))
    },

    // --- quality-model threshold sweep (operating curve) ----------------
    // The go/no-go artifact every filtered pretraining corpus ships
    // with: for each score threshold, how many documents and tokens
    // survive. Reuses the text_quality_model scorer, buckets scores to
    // a 500-wide grid (IEEE double divide + floor — correctly rounded,
    // so both engines land on identical buckets), then one cumulative
    // window DESC over the bucket table. The window is global but runs
    // over |buckets| rows (~hundreds), the ref_rolling_baseline
    // bounded-by-design shape — the corpus-sized work is the same
    // per-doc scoring exchange the model query already pays.
    Q(
      "text_quality_threshold_sweep",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |           FROM documents),
         |b AS (SELECT doc_id,
         |        ${ModelWeights.mkString("[", ",", "]")}[
         |          (('0x' || substr(md5(word), 1, 15))::BIGINT % 1024) + 1]
         |          AS wt
         |      FROM w),
         |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |         CAST(SUM(wt) AS BIGINT) AS score
         |       FROM b GROUP BY doc_id),
         |bu AS (SELECT CAST(floor(score / 500) * 500 AS BIGINT) AS threshold,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_tokens) AS BIGINT) AS n_toks
         |       FROM sc GROUP BY 1)
         |SELECT threshold,
         |  CAST(SUM(n_docs) OVER (ORDER BY threshold DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_docs_ge,
         |  CAST(SUM(n_toks) OVER (ORDER BY threshold DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_tokens_ge
         |FROM bu ORDER BY threshold DESC""".stripMargin
    ) { (s, d) =>
      val bucket = pmod(
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"),
        lit(1024L))
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("doc_id"),
          element_at(typedlit(ModelWeights.toSeq), (bucket + 1).cast("int"))
            .as("wt"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("score"))
      val buckets = scored
        .select((floor(col("score") / lit(500)) * 500).cast("long")
          .as("threshold"), col("n_tokens"))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_toks"))
      val cum = Window.orderBy(col("threshold").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      buckets
        .select(col("threshold"),
          sum(col("n_docs")).over(cum).as("n_docs_ge"),
          sum(col("n_toks")).over(cum).as("n_tokens_ge"))
        .orderBy(col("threshold").desc)
    },

    // --- quality-model calibration (reliability table) --------------------
    // The model-eval artifact the operating curve
    // (text_quality_threshold_sweep: how MANY survive per threshold)
    // doesn't show: is the score CALIBRATED — does the label rate
    // actually rise with the score? Per 500-wide score bucket: document
    // count and the positive rate (in ppm) of the same integer
    // repetition label the in-engine trainer learns against
    // (text_quality_train's `st` derivation, restated verbatim). Scoring
    // and labeling are two vocabulary/doc-keyed aggregates over the one
    // exploded scan; the bucket rollup is |buckets|-sized.
    Q(
      "text_quality_calibration",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |           FROM documents),
         |b AS (SELECT doc_id,
         |        ${ModelWeights.mkString("[", ",", "]")}[
         |          (('0x' || substr(md5(word), 1, 15))::BIGINT % 1024) + 1]
         |          AS wt
         |      FROM w),
         |sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score
         |       FROM b GROUP BY doc_id),
         |wf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS f
         |       FROM w GROUP BY doc_id, word),
         |st AS (SELECT doc_id,
         |        (10 * COUNT(*) >= SUM(f) AND 5 * MAX(f) <= SUM(f)) AS label
         |       FROM wf GROUP BY doc_id)
         |SELECT CAST(floor(score / 500) * 500 AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS pos_ppm
         |FROM sc JOIN st USING (doc_id)
         |GROUP BY bucket ORDER BY bucket NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      val bucket1024 = pmod(
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"),
        lit(1024L))
      val sc = toks
        .select(col("doc_id"),
          element_at(typedlit(ModelWeights.toSeq), (bucket1024 + 1).cast("int"))
            .as("wt"))
        .groupBy(col("doc_id")).agg(sum(col("wt")).as("score"))
      val st = toks.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("f"))
        .groupBy(col("doc_id"))
        .agg(sum(col("f")).as("nw"), count(lit(1)).as("nd"),
          max(col("f")).as("tf"))
        .select(col("doc_id"),
          (col("nd") * 10 >= col("nw") && col("tf") * 5 <= col("nw"))
            .as("label"))
      sc.join(st, "doc_id")
        .groupBy((floor(col("score") / lit(500)) * 500).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          expr("CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) * 1000000 " +
            "div count(1) AS BIGINT)").as("pos_ppm"))
        .orderBy(col("bucket"))
    },

    // --- IN-ENGINE quality-model training (batch perceptron) ------------
    // Closes the loop text_quality_model leaves open: instead of scoring
    // with a FIXED weight table, learn the weights inside the engine.
    // Fixed-iteration batch perceptron over md5-hashed unigram counts
    // (+ bias), trained to predict the integer-exact repetition label —
    // the fastText-style distillation that produces production quality
    // classifiers. All arithmetic integral and deterministic, so the
    // oracle replays every iteration as an unrolled CTE chain and the
    // final weight VECTOR matches bit-for-bit (see trainQualityWeights
    // for the scale shape: per-iteration one corpus pass + a
    // model-sized collect).
    Q(
      "text_quality_train",
      s"""${perceptronChain(TrainIters)}
         |SELECT bucket, w AS weight FROM w$TrainIters
         |ORDER BY bucket NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val wts = trainQualityWeights(s, d)
      import s.implicits._
      wts.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq
        .toDF("bucket", "weight").orderBy(col("bucket"))
    },

    // --- operating curve of the TRAINED scorer ---------------------------
    // The go/no-go artifact, now consuming the trained weights instead
    // of the fixed table: per 500-wide score threshold, surviving docs,
    // tokens, and how many of them the training label marks positive —
    // the per-threshold precision readout a filtering decision needs.
    // Training replays inside the query (the index-build measurement
    // convention: the cost of producing the model is part of the
    // operator); scoring is the same broadcast-literal lookup as
    // text_quality_model.
    Q(
      "text_quality_train_sweep",
      s"""${perceptronChain(TrainIters)},
         |sc AS (SELECT f.doc_id, CAST(SUM(f.cnt * w.w) AS BIGINT) AS score
         |  FROM feat f JOIN w$TrainIters w USING (bucket)
         |  GROUP BY f.doc_id),
         |bu AS (SELECT CAST(floor(score / 500) * 500 AS BIGINT)
         |      AS threshold,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(l.n_tokens) AS BIGINT) AS n_toks,
         |    CAST(SUM(CASE WHEN l.label THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos
         |  FROM sc JOIN st l USING (doc_id) GROUP BY threshold)
         |SELECT threshold,
         |  CAST(SUM(n_docs) OVER cw AS BIGINT) AS n_docs_ge,
         |  CAST(SUM(n_toks) OVER cw AS BIGINT) AS n_tokens_ge,
         |  CAST(SUM(n_pos) OVER cw AS BIGINT) AS n_label_pos_ge
         |FROM bu
         |WINDOW cw AS (ORDER BY threshold DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY threshold DESC""".stripMargin
    ) { (s, d) =>
      val wts = trainQualityWeights(s, d)
      val (feat, st) = qualityTrainFrames(s, d)
      val wlit = typedlit(wts.toSeq)
      val scored = feat
        .select(col("doc_id"), (col("cnt") *
          element_at(wlit, (col("bucket") + 1).cast("int"))).as("p"))
        .groupBy(col("doc_id")).agg(sum(col("p")).cast("long").as("score"))
      val buckets = scored.join(st, "doc_id")
        .select((floor(col("score") / lit(500)) * 500).cast("long")
          .as("threshold"), col("n_tokens"), col("label"))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_toks"),
          sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"))
      val cum = Window.orderBy(col("threshold").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      buckets.select(col("threshold"),
        sum(col("n_docs")).over(cum).cast("long").as("n_docs_ge"),
        sum(col("n_toks")).over(cum).cast("long").as("n_tokens_ge"),
        sum(col("n_pos")).over(cum).cast("long").as("n_label_pos_ge"))
        .orderBy(col("threshold").desc)
    },

    // --- vocabulary drift: per-source L1 distance from the corpus --------
    // The text-monitoring bridge: which source's word DISTRIBUTION
    // diverges from the corpus (topic shift, spam injection, template
    // leak)? L1 distance Σ_w |p_s(w) − p(w)| kept integer by cross-
    // multiplication: each present word contributes |n_{w,s}·N − n_w·N_s|
    // and the words ABSENT from the source close in closed form —
    // Σ_{w∉s} n_w·N_s = (N − Σ_{w∈s} n_w)·N_s — so no (source × word)
    // grid is ever materialized (the grid is |vocab|×|sources| rows; the
    // closed form is one aggregate over present words). Result in ppm of
    // the max distance 2 (disjoint vocabularies ⇒ 2 000 000). Sums ride
    // DECIMAL(38)/HUGEINT; division is positive integer //.
    Q(
      "text_vocab_drift",
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |sw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS nws
        |  FROM w GROUP BY source, word),
        |gw AS (SELECT word, CAST(SUM(nws) AS BIGINT) AS nw FROM sw
        |  GROUP BY word),
        |st AS (SELECT source, CAST(SUM(nws) AS BIGINT) AS ns FROM sw
        |  GROUP BY source),
        |g AS (SELECT CAST(SUM(nws) AS BIGINT) AS n FROM sw),
        |d AS (SELECT sw.source,
        |    SUM(abs(CAST(nws AS HUGEINT) * n - CAST(nw AS HUGEINT) * ns))
        |      AS present,
        |    CAST(n AS HUGEINT) - SUM(CAST(nw AS HUGEINT)) AS absent_mass
        |  FROM sw JOIN gw USING (word) JOIN st USING (source), g
        |  GROUP BY sw.source, st.ns, g.n),
        |f AS (SELECT d.source, st.ns,
        |    present + absent_mass * st.ns AS l1_scaled
        |  FROM d JOIN st USING (source))
        |SELECT f.source, CAST(f.ns AS BIGINT) AS n_tokens,
        |  CAST(l1_scaled * 1000000 // (CAST(f.ns AS HUGEINT) * g.n)
        |    AS BIGINT) AS drift_ppm
        |FROM f, g
        |ORDER BY source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val dec = "decimal(38,0)"
      val w = Tables.documents(s, d)
        .select(col("source"),
          explode(TextOps.tokens(col("text"))).as("word"))
      val sw = w.groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("nws"))
      val gw = sw.groupBy(col("word"))
        .agg(sum(col("nws")).cast("long").as("nw"))
      val st = sw.groupBy(col("source"))
        .agg(sum(col("nws")).cast("long").as("ns"))
      val g = sw.agg(sum(col("nws")).cast("long").as("n"))
      val joined = sw.join(gw, "word").join(broadcast(st), "source")
        .crossJoin(broadcast(g))
      val perSource = joined
        .groupBy(col("source"), col("ns"), col("n"))
        .agg(
          sum(abs(col("nws").cast(dec) * col("n")
            - col("nw").cast(dec) * col("ns"))).as("present"),
          (col("n").cast(dec)
            - sum(col("nw").cast(dec))).as("absent_mass"))
      perSource
        .select(col("source"), col("ns").cast("long").as("n_tokens"),
          expr("CAST((present + absent_mass * ns) * 1000000 div " +
            "(CAST(ns AS DECIMAL(38,0)) * n) AS DECIMAL(38,0))")
            .cast("long").as("drift_ppm"))
        .orderBy(col("source"))
    },

    // --- inverted index build: per-term stats + bounded posting heads ----
    // The index-construction half of corpus search (text_bm25_topk is the
    // serving half): explode documents into (term, doc) postings, then
    // per term the document frequency, total occurrence count, and the
    // FIRST 5 doc ids of the posting list. The head is capped through
    // the native bounded-heap TopK operator — the full posting list of a
    // stopword is O(corpus) and collect_list-ing it on one reducer is
    // exactly the hot-key failure mode; the heap never holds more than
    // 5 ids per term per map partition. collect_list then runs on ≤5
    // rows per term. Scale: explode is the one row-multiplying step
    // (inherent to index build); everything after shuffles (term, doc)
    // pairs only.
    Q(
      "text_inverted_index",
      """WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |stats AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
        |    CAST(COUNT(*) AS BIGINT) AS total_tf
        |  FROM p GROUP BY term),
        |d AS (SELECT DISTINCT term, doc_id FROM p),
        |r AS (SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM d),
        |posting AS (SELECT term,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |      AS posting_head
        |  FROM r WHERE rn <= 5 GROUP BY term)
        |SELECT term, df, total_tf, posting_head
        |FROM stats JOIN posting USING (term)
        |ORDER BY term NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("term"))
      val stats = pairs.groupBy(col("term"))
        .agg(count_distinct(col("doc_id")).as("df"),
          count(lit(1)).as("total_tf"))
      val top5 = graft.operators.TopK.perGroup(
        pairs.dropDuplicates("term", "doc_id"), 5,
        Seq("term"), Seq(graft.operators.TopK.asc("doc_id")))
      val posting = top5.groupBy(col("term"))
        .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("posting_head"))
      stats.join(posting, "term")
        .select(col("term"), col("df"), col("total_tf"), col("posting_head"))
        .orderBy(col("term"))
    },

    // --- BM25 full-text relevance: integer-exact top-k --------------------
    // Corpus search over `documents` for a fixed query-term set — the
    // inverted-index aggregation shape (per-doc term frequencies → global
    // document frequencies → length-normalized relevance → top-k). BM25
    // (Robertson–Spärck Jones; public formula) with k1=3/2, b=3/4
    // rationalized so every step is BIGINT:
    //   idf2   = floor(log2 N) − floor(log2 df)   [= length(bin(x))−1,
    //            exact in both engines — no float log]
    //   score  = idf2 · 20·tf·avgdl·10^6 // (8·tf·avgdl + 3·avgdl + 9·dl)
    //            [k1,b multiplied through; avgdl = Σdl // N]
    // Per-term tf is size(filter(tokens, = term)) — a narrow codegen'd
    // projection, NO explode: the classic explode→filter→groupBy plan
    // multiplies every row by its token count before filtering; for a
    // fixed query vocabulary the per-term counter touches each doc once.
    // The one-row corpus stats frame broadcasts into the scoring pass;
    // top-k is TakeOrderedAndProject. High-df terms ('the') get idf2=0
    // and drop out — stopword suppression falls out of the formula.
    Q(
      "text_bm25_topk",
      Bm25Oracle
    ) { (s, d) =>
      val toks = TextOps.tokens(col("text"))
      val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
        size(filter(toks, x => x === lit(t))).as(s"tf$i")
      }
      val base = Tables.documents(s, d)
        .select(col("doc_id") +: size(toks).as("dl") +: tfCols: _*)
      val dfAggs = Bm25Terms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
      }
      val statAggs = count(lit(1)).as("n_docs") +:
        expr("CAST(sum(dl) AS BIGINT) div count(1)").as("avgdl") +: dfAggs
      val stats = base.agg(statAggs.head, statAggs.tail: _*)
      def flog2(c: Column) = length(bin(c)) // floor(log2)+1; diffs cancel
      val score = Bm25Terms.indices.map { i =>
        when(col(s"tf$i") > 0,
          (flog2(col("n_docs")) - flog2(col(s"df$i"))).cast("long")
            * expr(s"(20 * tf$i * avgdl * 1000000) div " +
              s"(8 * tf$i * avgdl + 3 * avgdl + 9 * dl)"))
          .otherwise(0L)
      }.reduce(_ + _)
      base.crossJoin(broadcast(stats))
        .select(col("doc_id"), col("dl").cast("long").as("dl"),
          score.cast("long").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // --- BM25 served from a PERSISTED posting-list table -----------------
    // text_bm25_topk fused index-build and serve into one plan; this is
    // the production split (the text twin of emb_ivf_persist): commit
    // the postings (term, doc_id, tf, dl) RANGE-SORTED on term — each
    // file covers a disjoint term range, recorded as manifest min/max —
    // plus a 1-row corpus-stats table, then serve the query by reading
    // ONLY the query terms' posting files: O(postings of query terms),
    // never O(corpus). df per term comes from the read postings
    // themselves (exact); n_docs/avgdl from the stats row. Serving
    // covers every doc holding ≥1 query term — standard IR semantics
    // (a doc with no query term is not retrievable) — and matches the
    // fused oracle whenever ≥ k docs score positive, which holds at
    // every doc carrying one.
    //
    // The declared semantic difference from the fused query: the fused
    // oracle's LIMIT 20 back-fills with score-0 docs drawn from the
    // WHOLE corpus (even docs containing no query term — an artifact of
    // ranking everything), which a posting serve cannot and should not
    // see. This oracle therefore adds the retrievability predicate
    // (≥ 1 query-term occurrence) — the definition of a posting-list
    // search — and the two queries agree on every positively-scored
    // rank.
    Q(
      "text_bm25_persist",
      Bm25Oracle.replace(
        "FROM s, g\nORDER BY",
        "FROM s, g\nWHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0 OR tf3 > 0\nORDER BY")
    ) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = s"${sys.props("java.io.tmpdir")}/graft_bm25_index/$tag"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val toksCol = TextOps.tokens(col("text"))
      val base = Tables.documents(s, d)
        .select(col("doc_id"), size(toksCol).as("dl"),
          explode(toksCol).as("term"))
      // BUILD: postings carry dl so scoring never re-touches documents
      val postings = base
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .repartitionByRange(8, col("term"))
        .withColumn("pfx", substring(col("term"), 1, 1))
      graft.io.Snapshots.commitFull(postings, s"$root/postings", "pfx",
        statsCols = Seq("term"))
      val corpus = Tables.documents(s, d)
        .select(size(TextOps.tokens(col("text"))).as("dl"))
        .agg(count(lit(1)).as("n_docs"),
          expr("CAST(sum(dl) AS BIGINT) div count(1)").as("avgdl"))
        .withColumn("g", lit(1))
      graft.io.Snapshots.commitFull(corpus, s"$root/stats", "g")
      // SERVE: one stats-pruned read per query term
      val qp = Bm25Terms.map(t =>
          graft.io.Snapshots.readRange(s, s"$root/postings", "term", t, t))
        .reduce(_.unionByName(_))
      val dfs = qp.groupBy(col("term"))
        .agg(count(lit(1)).cast("long").as("df"))
      val stats = graft.io.Snapshots.read(s, s"$root/stats")
        .select(col("n_docs"), col("avgdl"))
      def flog2(c: Column) = length(bin(c))
      val contrib =
        (flog2(col("n_docs")) - flog2(col("df"))).cast("long") *
          expr("(20 * tf * avgdl * 1000000) div " +
            "(8 * tf * avgdl + 3 * avgdl + 9 * dl)")
      qp.join(broadcast(dfs), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("dl"), contrib.as("c"))
        .groupBy(col("doc_id"), col("dl"))
        .agg(sum(col("c")).as("score"))
        .select(col("doc_id"), col("dl").cast("long").as("dl"),
          col("score").cast("long").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // --- BM25 index maintained INCREMENTALLY (append-only freshness) -----
    // The text twin of emb_ivf_append: a live corpus cannot rebuild its
    // posting table per batch, so new documents land as an O(delta)
    // commitAppend of THEIR postings only (each delta file carries its
    // own term min/max in the manifest, so term-pruned serving reads
    // base and delta generations alike), and the corpus stats roll
    // forward mergeably — (n_docs, sum_dl) are sums, so the update is
    // one broadcast of the delta aggregate onto the 1-row stats table,
    // never a corpus re-scan. Serving is identical to text_bm25_persist
    // (df exact from the postings actually read; avgdl = sum_dl div
    // n_docs reproduces the full-rebuild integer exactly because both
    // terms are exact sums). The oracle is the full-corpus BM25 — value
    // equality IS the proof that base + append serves bit-identically
    // to a from-scratch rebuild.
    Q(
      "text_bm25_append",
      Bm25Oracle.replace(
        "FROM s, g\nORDER BY",
        "FROM s, g\nWHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0 OR tf3 > 0\nORDER BY")
    ) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = s"${sys.props("java.io.tmpdir")}/graft_bm25_inc/$tag"
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = Tables.documents(s, d)
      def postingsOf(df: org.apache.spark.sql.DataFrame) = {
        val toksCol = TextOps.tokens(col("text"))
        df.select(col("doc_id"), size(toksCol).as("dl"),
            explode(toksCol).as("term"))
          .groupBy(col("term"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).as("tf"))
          .repartitionByRange(8, col("term"))
          .withColumn("pfx", substring(col("term"), 1, 1))
      }
      def statsOf(df: org.apache.spark.sql.DataFrame) =
        df.select(size(TextOps.tokens(col("text"))).as("dl"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            expr("CAST(sum(dl) AS BIGINT)").as("sum_dl"))
      // day 0: base build (every doc_id % 5 != 0)
      val base = docs.where(col("doc_id") % 5 =!= 0)
      graft.io.Snapshots.commitFull(postingsOf(base), s"$root/postings",
        "pfx", statsCols = Seq("term"))
      graft.io.Snapshots.commitFull(statsOf(base).withColumn("g", lit(1)),
        s"$root/stats", "g")
      // day 1: the delta arrives — O(delta) posting append + O(1)
      // mergeable stats roll (a new 1-row stats version)
      val delta = docs.where(col("doc_id") % 5 === 0)
      graft.io.Snapshots.commitAppend(postingsOf(delta), s"$root/postings",
        "pfx", statsCols = Seq("term"))
      val rolled = graft.io.Snapshots.read(s, s"$root/stats")
        .crossJoin(broadcast(statsOf(delta)
          .select(col("n_docs").as("dn"), col("sum_dl").as("dsum"))))
        .select((col("n_docs") + col("dn")).as("n_docs"),
          (col("sum_dl") + col("dsum")).as("sum_dl"), col("g"))
      graft.io.Snapshots.commitFull(rolled, s"$root/stats", "g")
      // SERVE: term-pruned read across base + delta posting files
      val qp = Bm25Terms.map(t =>
          graft.io.Snapshots.readRange(s, s"$root/postings", "term", t, t))
        .reduce(_.unionByName(_))
      val dfs = qp.groupBy(col("term"))
        .agg(count(lit(1)).cast("long").as("df"))
      val stats = graft.io.Snapshots.read(s, s"$root/stats")
        .select(col("n_docs"),
          expr("sum_dl div n_docs").as("avgdl"))
      def flog2(c: Column) = length(bin(c))
      val contrib =
        (flog2(col("n_docs")) - flog2(col("df"))).cast("long") *
          expr("(20 * tf * avgdl * 1000000) div " +
            "(8 * tf * avgdl + 3 * avgdl + 9 * dl)")
      qp.join(broadcast(dfs), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("dl"), contrib.as("c"))
        .groupBy(col("doc_id"), col("dl"))
        .agg(sum(col("c")).as("score"))
        .select(col("doc_id"), col("dl").cast("long").as("dl"),
          col("score").cast("long").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // --- Zipf rank-frequency slope over the head vocabulary --------------
    // The corpus-health fingerprint tokenizer papers plot first: natural
    // text has log-frequency falling ~linearly in log-rank with slope
    // ≈ −1; template/boilerplate corpora flatten it, spam steepens it.
    // Exact-integer restatement (no libm): x = ⌊log2 rank⌋ and
    // y = ⌊log2 freq⌋ via bin-length, least squares on the top-1024
    // ranks in exact integer sums, slope served as positive
    // neg_slope_ppm = (ΣxΣy − nΣxy)·10⁶ div (nΣx² − (Σx)²) so both
    // engines divide a positive numerator (truncation = floor there).
    // Scale: the corpus-sized work is the word-count aggregate; the
    // ranked head is a bounded 1024-row frame (native-top-k class), so
    // the regression itself is constant work at any corpus size.
    Q(
      "text_zipf_slope",
      """WITH wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  GROUP BY word),
        |top AS (SELECT word, f,
        |    CAST(row_number() OVER (ORDER BY f DESC, word) AS BIGINT) AS r
        |  FROM wf ORDER BY f DESC, word LIMIT 1024),
        |pts AS (SELECT length(bin(r)) - 1 AS x, length(bin(f)) - 1 AS y
        |  FROM top),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x*y) AS BIGINT) AS sxy,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx
        |  FROM pts)
        |SELECT n_types, sx, sy, sxy, sxx,
        |  CAST((sx*sy - n_types*sxy) * 1000000
        |    // (n_types*sxx - sx*sx) AS BIGINT) AS neg_slope_ppm
        |FROM s ORDER BY n_types NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val wf = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("f"))
      // bounded head: orderBy+limit plans as TakeOrderedAndProject —
      // per-partition heaps + one driver merge, never a global sort
      val top = wf.orderBy(col("f").desc, col("word")).limit(1024)
        .withColumn("r", row_number().over(
          Window.orderBy(col("f").desc, col("word"))).cast("long"))
      def flog2(c: org.apache.spark.sql.Column) = length(bin(c)) - 1
      top
        .select(flog2(col("r")).cast("long").as("x"),
          flog2(col("f")).cast("long").as("y"))
        .agg(count(lit(1)).cast("long").as("n_types"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("x") * col("x")).cast("long").as("sxx"))
        .select(col("n_types"), col("sx"), col("sy"), col("sxy"),
          col("sxx"),
          expr("CAST((sx*sy - n_types*sxy) * 1000000 div " +
            "(n_types*sxx - sx*sx) AS BIGINT)").as("neg_slope_ppm"))
        .orderBy(col("n_types"))
    },

    // --- URL canonicalization + canonical-URL dedup ----------------------
    // The first dedup key of a web-corpus pipeline (UrlOps scaladoc). The
    // test tables carry no URL column, so the query SYNTHESIZES a messy
    // URL per document with engine-shared string arithmetic — mixed-case
    // scheme/host, www. prefixes, default ports, trailing slashes,
    // utm_/ref tracking params in shuffled order, fragments — such that
    // distinct raw spellings collapse to the same canonical form exactly
    // when (source, doc_id mod 40, scheme) agree. Both engines then run
    // the IDENTICAL canonicalization pipeline (UrlOps.canonicalize ≡
    // UrlOps.canonicalSql: regex + list-HOF built-ins, no UDF) and dedup
    // on the canonical string. Scale: canonicalize is a narrow
    // projection; the dedup is one hash aggregate on the canonical key —
    // the same shape as dedup_exact_groups.
    Q(
      "text_url_dedup",
      s"""WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END ||
        |     '://' ||
        |     CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
        |     source || '.Example.COM' ||
        |     CASE WHEN doc_id % 5 = 0 THEN
        |       CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
        |     ELSE '' END ||
        |     '/docs/' || CAST(doc_id % 40 AS VARCHAR) ||
        |     CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
        |     CASE WHEN doc_id % 2 = 0
        |       THEN '?utm_source=feed&b=2&a=' || CAST(doc_id % 40 AS VARCHAR)
        |       ELSE '?a=' || CAST(doc_id % 40 AS VARCHAR) || '&b=2&ref=abc'
        |     END ||
        |     CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END) AS url
        |  FROM documents),
        |c AS (SELECT doc_id, url,
        |    ${graft.functions.UrlOps.canonicalSql("url")} AS canonical_url
        |  FROM u)
        |SELECT canonical_url,
        |  CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_variants,
        |  CAST(COUNT(DISTINCT url) AS BIGINT) AS n_spellings
        |FROM c GROUP BY canonical_url
        |ORDER BY canonical_url NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val id = col("doc_id")
      val url = concat(
        when(id % 2 === 0, lit("HTTP")).otherwise(lit("https")),
        lit("://"),
        when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".Example.COM"),
        when(id % 5 === 0,
          when(id % 2 === 0, lit(":80")).otherwise(lit(":443")))
          .otherwise(lit("")),
        lit("/docs/"), (id % 40).cast("string"),
        when(id % 4 === 0, lit("/")).otherwise(lit("")),
        when(id % 2 === 0,
          concat(lit("?utm_source=feed&b=2&a="), (id % 40).cast("string")))
          .otherwise(concat(lit("?a="), (id % 40).cast("string"),
            lit("&b=2&ref=abc"))),
        when(id % 7 === 0, lit("#sec2")).otherwise(lit("")))
      Tables.documents(s, d)
        .select(id, url.as("url"))
        .withColumn("canonical_url",
          graft.functions.UrlOps.canonicalize(col("url")))
        .groupBy(col("canonical_url"))
        .agg(min(id).cast("long").as("keep_id"),
          count(lit(1)).as("n_variants"),
          count_distinct(col("url")).as("n_spellings"))
        .orderBy(col("canonical_url"))
    },

    // --- tokenizer fertility by language ---------------------------------
    // The number that drives language-mix budgeting: subword tokens per
    // word (and per 1000 chars) by language. A language whose fertility
    // is 2× costs 2× the context window per word — mix weights and
    // packing budgets ("how many docs fit a 4k-token sequence") both
    // divide by it. Subword proxy = the BPE-ish regex token stream
    // (letters / digit runs / single non-alphanumerics), the same
    // kernel `text_token_counts` exposes per doc; ratios in integer ppm
    // (div), so the rollup is engine-exact. One column-pruned scan, one
    // combiner-friendly aggregate on a ~unit-cardinality key.
    Q(
      "text_token_fertility",
      """SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS words,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
        |    AS subwords,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) * 1000000
        |       // SUM(len(string_split(text, ' '))) AS BIGINT) AS fertility_ppm,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) * 1000
        |       // SUM(length(text)) AS BIGINT) AS subwords_per_kchar
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text")))).cast("long").as("words"),
          sum(graft.functions.TextKernels.pre_token_count(col("text")))
            .cast("long").as("subwords"),
          sum(length(col("text"))).cast("long").as("chars"))
        .select(col("lang"), col("n_docs"), col("words"), col("subwords"),
          expr("CAST(subwords * 1000000 div words AS BIGINT)")
            .as("fertility_ppm"),
          expr("CAST(subwords * 1000 div chars AS BIGINT)")
            .as("subwords_per_kchar"))
        .orderBy(col("lang"))
    },

    // --- bigram language-model fluency scoring ---------------------------
    // The CCNet-style LM quality filter: train an n-gram LM on the corpus,
    // score every doc by how well the model predicts it, and gate on the
    // score (high = fluent/common phrasing, low = gibberish or off-domain
    // text). Here the model is the corpus's own bigram MLE — P(w2|w1) =
    // c(w1,w2)/c(w1·) — and the doc score is the mean conditional
    // probability of its bigrams, kept in integer ppm (floor division,
    // all operands positive) so engine and oracle agree bit-for-bit —
    // real pipelines use log-probs, whose float summation is
    // order-dependent and would break cross-engine hashing.
    //
    // Scale shape: the bigram explode is ~tokens rows; the two count
    // tables are combiner-friendly hash aggs whose OUTPUT is vocabulary-
    // sized (vocab + vocab² entries ≪ corpus), so the score join streams
    // the bigram stream past two small build sides (broadcastable on a
    // real cluster; AQE picks that up from size stats); per-doc scoring
    // is one more hash agg keyed by doc_id. The model never touches the
    // driver and no step is quadratic in docs.
    Q(
      "text_lm_score",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |bi AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |  FROM t),
        |b AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM bi),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM b GROUP BY w1),
        |p AS (SELECT b.doc_id, (1000000 * c2.c2) // c1.c1 AS p_ppm
        |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
        |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS score_ppm
        |  FROM p GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(sc.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(sc.score_ppm, 0) AS score_ppm
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // slice-zip instead of sequence(1, n-1): sequence(1, 0) would run
      // DESCENDING for a 1-token doc; slice with length 0 is just empty.
      val bigrams = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(expr(
            """arrays_zip(slice(toks, 1, size(toks) - 1),
              |           slice(toks, 2, size(toks) - 1))""".stripMargin))
            .as("z"))
        .select(col("doc_id"), col("z.0").as("w1"), col("z.1").as("w2"))
      val c2 = bigrams.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2"))
      val c1 = bigrams.groupBy(col("w1"))
        .agg(count(lit(1)).as("c1"))
      val scored = bigrams
        .join(c2, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .select(col("doc_id"), expr("(1000000 * c2) div c1").as("p_ppm"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_ppm) div count(1)").as("score_ppm"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("score_ppm"), lit(0L)).as("score_ppm"))
        .orderBy(col("doc_id"))
    },

    // --- Kneser-Ney-smoothed bigram LM fluency scoring --------------------
    // The production upgrade of text_lm_score's MLE bigram model: MLE
    // assigns high probability to any frequent continuation regardless
    // of context diversity, so boilerplate ("click here here here")
    // outscores fluent prose. Interpolated Kneser-Ney (Kneser & Ney '95,
    // the smoothing every n-gram LM pipeline ships) discounts each seen
    // bigram by D = 3/4 and redistributes the held-out mass over the
    // CONTINUATION unigram — how many distinct contexts a word follows,
    // not how often it occurs:
    //   P(w2|w1) = (c12 − D)/c1 + (D·N1+(w1·)/c1)·(N1+(·w2)/T).
    // With D = 3/4 the whole expression is one exact rational over the
    // common denominator 4·c1·T:
    //   P_ppm = ((4·c12 − 3)·T + 3·N1fwd·N1bwd)·10⁶ div (4·c1·T)
    // — a SINGLE integer division, so no div-grouping drift between
    // engines; the numerator is computed in 128-bit (DECIMAL(38,0) /
    // HUGEINT) because c12·T·10⁶ outgrows int64 on ×100 corpora. Plan
    // shape adds two combiner-friendly distinct-count aggregates (per-w1
    // fan-out, per-w2 fan-in) and a 1-row type total to text_lm_score's
    // joins — all vocabulary-keyed, nothing quadratic.
    Q(
      "text_lm_kneser_ney",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |bi AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |  FROM t),
        |b AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM bi),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
        |    CAST(COUNT(*) AS BIGINT) AS n1fwd
        |  FROM c2 GROUP BY w1),
        |cb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bwd
        |  FROM c2 GROUP BY w2),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM c2),
        |p AS (SELECT b.doc_id,
        |    CAST(((4 * CAST(c2.c2 AS HUGEINT) - 3)
        |        * CAST(tt.t_types AS HUGEINT)
        |        + 3 * CAST(c1.n1fwd AS HUGEINT)
        |            * CAST(cb.n1bwd AS HUGEINT)) * 1000000
        |      // (4 * CAST(c1.c1 AS HUGEINT)
        |         * CAST(tt.t_types AS HUGEINT)) AS BIGINT) AS p_ppm
        |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |       JOIN cb USING (w2) CROSS JOIN tt),
        |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS score_ppm
        |  FROM p GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(sc.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(sc.score_ppm, 0) AS score_ppm
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val bigrams = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(expr(
            """arrays_zip(slice(toks, 1, size(toks) - 1),
              |           slice(toks, 2, size(toks) - 1))""".stripMargin))
            .as("z"))
        .select(col("doc_id"), col("z.0").as("w1"), col("z.1").as("w2"))
      val c2 = bigrams.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy(col("w1"))
        .agg(sum(col("c2")).cast("long").as("c1"),
          count(lit(1)).cast("long").as("n1fwd"))
      val cb = c2.groupBy(col("w2"))
        .agg(count(lit(1)).cast("long").as("n1bwd"))
      val tt = c2.agg(count(lit(1)).cast("long").as("t_types"))
      val scored = bigrams
        .join(c2, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .join(cb, Seq("w2"))
        .crossJoin(broadcast(tt))
        .select(col("doc_id"),
          expr("""((4 * CAST(c2 AS DECIMAL(38,0)) - 3)
            |    * CAST(t_types AS DECIMAL(38,0))
            |    + 3 * CAST(n1fwd AS DECIMAL(38,0))
            |        * CAST(n1bwd AS DECIMAL(38,0))) * 1000000
            |  div (4 * CAST(c1 AS DECIMAL(38,0))
            |     * CAST(t_types AS DECIMAL(38,0)))""".stripMargin)
            .cast("long").as("p_ppm"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_ppm) div count(1)").as("score_ppm"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("score_ppm"), lit(0L)).as("score_ppm"))
        .orderBy(col("doc_id"))
    },

    // --- count-min sketch frequency contract ------------------------------
    // The last gap in the mergeable-sketch family (HLL, Misra-Gries, KMV,
    // GK, bottom-k, t-digest): point-frequency estimation under the
    // store-sketches / merge-at-read rollup shape. Spark's built-in
    // count_min_sketch aggregate (partial sketches per partition, merged
    // associatively — O(width·depth) state regardless of corpus) builds
    // the sketch; the driver deserializes the ONE sketch-sized binary
    // and probes the 20 heaviest words. Estimates are hash-layout
    // values, so (q_value_percentiles_approx precedent) the oracle
    // checks the CMS theorem instead: exact_count ≤ estimate ≤
    // exact_count + ⌈ε·N⌉, with the exact counts (which ARE
    // cross-engine) value-checked alongside.
    Q(
      "text_cms_contract",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_count
        |  FROM w GROUP BY word)
        |SELECT word, exact_count, TRUE AS within_bounds FROM c
        |ORDER BY exact_count DESC, word LIMIT 20""".stripMargin
    ) { (s, d) =>
      val eps = 0.001
      val words = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
      val aggRow = words
        .agg(count(lit(1)).cast("long").as("n"),
          count_min_sketch(col("word"), lit(eps), lit(0.99), lit(42))
            .as("sk"))
        .head()
      val n = aggRow.getLong(0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(aggRow.getAs[Array[Byte]](1)))
      val slack = math.ceil(eps * n).toLong
      val top = words.groupBy(col("word"))
        .agg(count(lit(1)).cast("long").as("exact_count"))
        .orderBy(col("exact_count").desc, col("word")).limit(20)
        .collect() // 20 rows — probe-sized, not corpus
      import s.implicits._
      top.toSeq.map { r =>
        val (w, exact) = (r.getString(0), r.getLong(1))
        val est = cms.estimateCount(w)
        (w, exact, est >= exact && est <= exact + slack)
      }.toDF("word", "exact_count", "within_bounds")
        .orderBy(col("exact_count").desc, col("word"))
    },

    // --- corpus novelty curve (n-gram first-occurrence profile) -----------
    // The data-freshness signal a growing pretraining corpus is monitored
    // by (and what near-dup rates only show indirectly): bucket documents
    // by ingestion order (50 ids per bucket), and measure what fraction
    // of each bucket's distinct trigrams appears THERE FIRST. A healthy
    // crawl holds a stable novelty floor; a collapsing one (re-crawls,
    // mirror floods) trends to zero ahead of any dedup stage firing.
    // Shapes: one (bucket, gram) distinct, one gram-keyed min-aggregate
    // (the global first bucket), one join back — all gram-keyed
    // exchanges, the text_vocab_drift class.
    Q(
      "text_ngram_novelty",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  unnest(list_distinct(CASE WHEN len(toks) < 3
        |    THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    END)) AS g
        |  FROM t),
        |dg AS (SELECT DISTINCT doc_id // 50 AS bucket, g FROM sh),
        |fb AS (SELECT g, CAST(MIN(bucket) AS BIGINT) AS firstb FROM dg
        |       GROUP BY g)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN firstb = bucket THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(SUM(CASE WHEN firstb = bucket THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM dg JOIN fb USING (g)
        |GROUP BY bucket ORDER BY bucket NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val dg = Tables.documents(s, d)
        .select(expr("doc_id div 50").as("bucket"),
          explode(TextOps.sortedShingleSet(
            TextOps.tokens(col("text")), 3)).as("g"))
        .distinct()
      val fb = dg.groupBy(col("g"))
        .agg(min(col("bucket")).cast("long").as("firstb"))
      dg.join(fb, "g")
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("firstb") === col("bucket"), 1).otherwise(0))
            .cast("long").as("n_new"))
        .select(col("bucket"), col("n_grams"), col("n_new"),
          expr("CAST(n_new * 1000000 div n_grams AS BIGINT)")
            .as("novelty_ppm"))
        .orderBy(col("bucket"))
    },

    // --- RAKE keyphrase extraction ----------------------------------------
    // Rapid Automatic Keyword Extraction (Rose et al. 2010) — the
    // multi-word companion to text_tfidf_keywords' unigrams: candidate
    // phrases are maximal stopword-free token runs; each word scores
    // deg/freq over its phrase OCCURRENCES (deg = Σ lengths of phrases
    // containing it, freq = occurrence count — co-occurrence pushes
    // phrase words above isolated frequent words); a phrase scores the
    // sum of its member word scores. All exact integer ppm (deg·10⁶ div
    // freq per word, summed). Plan shape: phrase segmentation is one
    // per-doc window (running stopword count = segment id — the
    // gaps-and-islands idiom), then three vocabulary/phrase-keyed hash
    // aggregates; nothing quadratic, the per-doc window partitions by
    // doc_id. The oracle re-derives phrases with an ORDER BY-list
    // aggregate — different mechanism, identical strings.
    Q(
      "text_rake_keyphrases",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         |tk AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    toks[CAST(i AS INT)] AS word
         |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
         |gr AS (SELECT doc_id, pos, word,
         |    SUM(CASE WHEN list_contains($stopwordsSql, word)
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
         |    list_contains($stopwordsSql, word) AS stop
         |  FROM tk),
         |ph AS (SELECT doc_id, grp,
         |    array_to_string(list(word ORDER BY pos), ' ') AS phrase,
         |    CAST(COUNT(*) AS BIGINT) AS len
         |  FROM gr WHERE NOT stop GROUP BY doc_id, grp),
         |pw AS (SELECT doc_id, grp, phrase, len,
         |    unnest(string_split(phrase, ' ')) AS word
         |  FROM ph),
         |wsc AS (SELECT word,
         |    CAST(SUM(len) AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT)
         |      AS wscore
         |  FROM pw GROUP BY word),
         |osc AS (SELECT pw.doc_id, pw.grp, pw.phrase,
         |    CAST(SUM(wsc.wscore) AS BIGINT) AS score_ppm
         |  FROM pw JOIN wsc USING (word)
         |  GROUP BY pw.doc_id, pw.grp, pw.phrase)
         |SELECT phrase, score_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n_occurrences
         |FROM osc GROUP BY phrase, score_ppm
         |ORDER BY score_ppm DESC, phrase LIMIT 20""".stripMargin
    ) { (s, d) =>
      val sw = TextOps.EnglishStopwords
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "word")))
      val grouped = toks
        .withColumn("stop", col("word").isInCollection(sw))
        .withColumn("grp", sum(when(col("stop"), 1).otherwise(0))
          .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        .where(!col("stop"))
      val phr = grouped.groupBy(col("doc_id"), col("grp"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, word)))," +
          " x -> x.word)").as("ws"))
        .select(col("doc_id"), col("grp"),
          concat_ws(" ", col("ws")).as("phrase"),
          size(col("ws")).cast("long").as("len"), col("ws"))
      val pw = phr.select(col("doc_id"), col("grp"), col("phrase"),
        col("len"), explode(col("ws")).as("word"))
      val wsc = pw.groupBy(col("word"))
        .agg(expr("CAST(sum(len) AS BIGINT) * 1000000 div " +
          "CAST(count(1) AS BIGINT)").as("wscore"))
      pw.join(wsc, "word")
        .groupBy(col("doc_id"), col("grp"), col("phrase"))
        .agg(sum(col("wscore")).cast("long").as("score_ppm"))
        .groupBy(col("phrase"), col("score_ppm"))
        .agg(count(lit(1)).cast("long").as("n_occurrences"))
        .orderBy(col("score_ppm").desc, col("phrase"))
        .limit(20)
    },

    // --- collocation mining (lift-scored bigrams) -----------------------
    // The phrase-detection pass (word2vec's phrase pass, NPMI collocation
    // extraction) that turns corpora into vocabularies with multi-word
    // units: score each bigram by lift = p(xy) / (p(x)·p(y)) — the
    // ratio PMI exponentiates, kept as pure IEEE arithmetic so both
    // engines produce bit-identical doubles (log/exp are libm calls with
    // no cross-engine rounding contract) — with a min-support floor
    // (c_xy ≥ 5) so rare accidental pairs can't top the ranking. Plan
    // shape: bigram and unigram counts are two combiner-friendly hash
    // aggregates over one exploded scan each; the score join is equi on
    // the word keys (vocabulary-sized — shuffle join, same contract as
    // text_rarity_score's); the two corpus totals ride in as broadcast
    // 1-row frames. Everything before the top-20 is exact integers.
    Q(
      "text_collocations",
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT unnest(toks) AS word FROM t),
        |uni AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
        |nu AS (SELECT COUNT(*) AS n_uni FROM w),
        |bg AS (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]))
        |         AS p
        |       FROM t),
        |bp AS (SELECT p[1] AS w1, p[2] AS w2 FROM bg),
        |bc AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bp GROUP BY w1, w2),
        |nb AS (SELECT COUNT(*) AS n_bi FROM bp)
        |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
        |  ROUND((CAST(c_xy AS DOUBLE) * n_uni * n_uni)
        |    / (CAST(n_bi AS DOUBLE) * u1.c * u2.c), 6) AS lift
        |FROM bc JOIN uni u1 ON u1.word = bc.w1
        |        JOIN uni u2 ON u2.word = bc.w2
        |        CROSS JOIN nu CROSS JOIN nb
        |WHERE c_xy >= 5
        |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin
    ) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(TextOps.tokens(col("text")).as("toks"))
      val w = t.select(explode(col("toks")).as("word"))
      val uni = w.groupBy(col("word")).agg(count(lit(1)).as("c"))
      val nu = w.agg(count(lit(1)).as("n_uni"))
      val bp = t.select(
          explode(expr(
            """arrays_zip(slice(toks, 1, size(toks) - 1),
              |           slice(toks, 2, size(toks) - 1))""".stripMargin))
            .as("p"))
        .select(col("p.0").as("w1"), col("p.1").as("w2"))
      val bc = bp.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c_xy"))
        .where(col("c_xy") >= 5)
      val nb = bp.agg(count(lit(1)).as("n_bi"))
      bc.join(uni.select(col("word").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("word").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(nu))
        .crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c_xy"),
          round((col("c_xy").cast("double") * col("n_uni") * col("n_uni"))
            / (col("n_bi").cast("double") * col("c1") * col("c2")), 6)
            .as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // --- per-document keyword extraction (TF-IDF top-3) -----------------
    // The tagging pass behind search facets and topic labels: score each
    // (doc, word) by tf · N/df — N/df is the idf ratio before the log,
    // kept as pure IEEE arithmetic (exact-int products, one correctly-
    // rounded division) for the same libm-free reason as
    // text_collocations; log is monotone, so the per-doc top-3 is the
    // true TF-IDF top-3. tf and df are two combiner-friendly aggregates
    // over one exploded scan; the df join is equi on the vocabulary key;
    // the per-doc window partitions on doc_id (high-cardinality,
    // balanced). At 100 TB nothing here grows beyond the corpus scan +
    // vocabulary-keyed exchange.
    Q(
      "text_tfidf_keywords",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w
        |       GROUP BY doc_id, word),
        |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w
        |       GROUP BY word),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, word, tf, df,
        |         (CAST(tf AS DOUBLE) * n_docs) / df AS score
        |       FROM tf JOIN df USING (word) CROSS JOIN nd)
        |SELECT doc_id, rank, word, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, ROUND(score, 6) AS score
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, word) AS INT) AS rank
        |      FROM sc)
        |WHERE rank <= 3
        |ORDER BY doc_id NULLS FIRST, rank NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      val tf = w.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val df = w.groupBy(col("word"))
        .agg(count_distinct(col("doc_id")).as("df"))
      val nd = Tables.documents(s, d)
        .agg(count_distinct(col("doc_id")).as("n_docs"))
      val win = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("word"))
      tf.join(df, Seq("word"))
        .crossJoin(broadcast(nd))
        .select(col("doc_id"), col("word"), col("tf"), col("df"),
          ((col("tf").cast("double") * col("n_docs")) / col("df"))
            .as("score"))
        .withColumn("rank", row_number().over(win))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"), col("tf"),
          col("df"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // --- vocabulary growth curve (Heaps'-law measurement) ---------------
    // How fast the type count grows with the corpus — the curve that
    // sizes tokenizer vocabularies and predicts OOV rates before
    // training. Measured at doc-count checkpoints (50..500 by doc_id
    // order): distinct words and token totals under each prefix, from
    // ONE exploded scan — the checkpoint key is derived per token row
    // (the SMALLEST checkpoint admitting the doc; each token then rolls
    // up into suffix sums via a 10-row cumulative window), not one scan
    // per checkpoint. The type count per checkpoint is a distinct-agg
    // over (checkpoint, word) — vocabulary-bounded. Heaps exponent
    // fitting stays offline: log-log regression is libm; the curve
    // itself is exact integers.
    Q(
      "text_vocab_growth",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |cp AS (SELECT ((doc_id // 50) + 1) * 50 AS checkpoint, word
        |       FROM w),
        |tok AS (SELECT checkpoint, COUNT(*) AS toks
        |        FROM cp GROUP BY checkpoint),
        |typ AS (SELECT checkpoint, word, MIN(checkpoint) AS first_cp
        |        FROM cp GROUP BY checkpoint, word)
        |SELECT g.checkpoint,
        |  CAST(SUM(t2.toks) AS BIGINT) AS n_tokens,
        |  CAST((SELECT COUNT(DISTINCT word) FROM cp c
        |        WHERE c.checkpoint <= g.checkpoint) AS BIGINT) AS n_types
        |FROM (SELECT DISTINCT checkpoint FROM cp) g
        |JOIN tok t2 ON t2.checkpoint <= g.checkpoint
        |GROUP BY g.checkpoint
        |ORDER BY g.checkpoint NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text")))
          .as("word"))
      val cp = w.select(
        expr("(doc_id div 50 + 1) * 50").as("checkpoint"), col("word"))
      // per-checkpoint increments, then suffix-rollup via cumulative
      // windows over the ~10-row checkpoint frame
      val tok = cp.groupBy(col("checkpoint")).agg(count(lit(1)).as("toks"))
      val firstSeen = cp.groupBy(col("word"))
        .agg(min(col("checkpoint")).as("checkpoint"))
        .groupBy(col("checkpoint")).agg(count(lit(1)).as("new_types"))
      val cum = Window.orderBy(col("checkpoint"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tok.join(firstSeen, Seq("checkpoint"), "left")
        .select(col("checkpoint"),
          sum(col("toks")).over(cum).cast("long").as("n_tokens"),
          sum(coalesce(col("new_types"), lit(0L))).over(cum).cast("long")
            .as("n_types"))
        .orderBy(col("checkpoint"))
    },

    // --- readability scoring (Flesch-style, libm-free) ------------------
    // The reading-level feature text-difficulty curricula and
    // age-appropriateness filters use. Syllables are proxied by vowel
    // GROUPS (maximal [aeiouy]+ runs — the standard cheap estimator),
    // sentences by terminal punctuation (min 1). The Flesch formula's
    // constants are plain literals and the score is three exact-int
    // divisions and fixed-order arithmetic — no libm anywhere. Narrow
    // one-pass projection; regexp counts are the only per-row work.
    Q(
      "text_reading_level",
      """WITH f AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]')), 1)
        |      AS BIGINT) AS sentences,
        |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
        |      AS syllables
        |  FROM documents)
        |SELECT doc_id, words, sentences, syllables,
        |  ROUND(206.835
        |    - 1.015 * (CAST(words AS DOUBLE) / sentences)
        |    - 84.6 * (CAST(syllables AS DOUBLE) / words), 6) AS flesch
        |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("words"),
          greatest(size(expr("regexp_extract_all(text, '[.!?]', 0)")),
            lit(1)).cast("long").as("sentences"),
          size(expr("regexp_extract_all(text, '[aeiouy]+', 0)"))
            .cast("long").as("syllables"))
        .select(col("doc_id"), col("words"), col("sentences"),
          col("syllables"),
          round(lit(206.835)
            - lit(1.015) * (col("words").cast("double") / col("sentences"))
            - lit(84.6) * (col("syllables").cast("double") / col("words")),
            6).as("flesch"))
        .orderBy(col("doc_id"))
    },

    // --- negative-sampling table (unigram^0.75 distribution) ------------
    // The smoothed sampling distribution word2vec/contrastive training
    // draws negatives from: weight = count^0.75, which flattens the
    // head and lifts the tail vs raw frequency. pow() is libm with no
    // cross-engine contract, but 0.75 = 3/4, so c^0.75 =
    // sqrt(c·sqrt(c)) — two correctly-rounded IEEE sqrts and one
    // multiply, bit-identical in both engines. Weights are then floored
    // to integer milli-units so the vocabulary total, ppm shares, and
    // the cumulative boundaries the sampler actually buckets on are all
    // exact integer arithmetic. One exploded scan + vocab aggregate; the
    // total rides along as a 1-row broadcast; the cumulative window runs
    // over the 20-row head only, never the vocabulary.
    Q(
      "text_negative_sampling",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |c AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
        |wt AS (SELECT word, c,
        |    CAST(FLOOR(SQRT(CAST(c AS DOUBLE) * SQRT(CAST(c AS DOUBLE)))
        |      * 1000) AS BIGINT) AS w_milli
        |  FROM c),
        |t AS (SELECT SUM(w_milli) AS total FROM wt),
        |top AS (SELECT word, c, w_milli,
        |    CAST(w_milli * 1000000 // total AS BIGINT) AS share_ppm
        |  FROM wt CROSS JOIN t
        |  ORDER BY c DESC, word LIMIT 20)
        |SELECT word, CAST(c AS BIGINT) AS c, w_milli, share_ppm,
        |  CAST(SUM(share_ppm) OVER (ORDER BY c DESC, word
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ppm
        |FROM top
        |ORDER BY c DESC, word""".stripMargin
    ) { (s, d) =>
      val counts = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
      val wt = counts.select(col("word"), col("c"),
        floor(sqrt(col("c").cast("double") * sqrt(col("c").cast("double")))
          * 1000).cast("long").as("w_milli"))
      val total = wt.agg(sum(col("w_milli")).as("total"))
      val top = wt.crossJoin(broadcast(total))
        .select(col("word"), col("c"), col("w_milli"),
          expr("w_milli * 1000000 div total").cast("long").as("share_ppm"))
        .orderBy(col("c").desc, col("word"))
        .limit(20)
      val cum = Window.orderBy(col("c").desc, col("word"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.withColumn("cum_ppm", sum(col("share_ppm")).over(cum).cast("long"))
        .orderBy(col("c").desc, col("word"))
    },

    // --- per-source hapax / type-token profile ---------------------------
    // The lexical-richness lens data curation applies per source: hapax
    // legomena share (words seen once — high hapax = fresh/noisy text,
    // low = templated) and type-token ratio, in exact integer ppm. Two
    // hash aggregates — (source, word) then source — no windows, no
    // driver state; the vocabulary-keyed exchange is the same shape the
    // 100 TB wordcount takes.
    Q(
      "text_hapax_profile",
      """WITH w AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |c AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM w GROUP BY source, word)
        |SELECT source,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS vocab,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
        |    AS BIGINT) AS hapax_ppm,
        |  CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS ttr_ppm
        |FROM c GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1).otherwise(0)).cast("long").as("hapax"))
        .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
          expr("CAST(hapax * 1000000 div vocab AS BIGINT)").as("hapax_ppm"),
          expr("CAST(vocab * 1000000 div n_tokens AS BIGINT)").as("ttr_ppm"))
        .orderBy(col("source"))
    },

    // --- out-of-vocabulary rate vs a capped training vocabulary ----------
    // The vocab-budget check run before serving a tokenizer on a new
    // source: the vocabulary is the TOP-20 words of the src0-src9 half
    // by train frequency (real tokenizers ship a fixed budget, not
    // every word ever seen), then each held-out source's token-level
    // OOV rate via a broadcast vocab anti-probe (left join + null test
    // — the capped vocabulary is O(budget), so at 100 TB this is a
    // broadcast join against the token scan, not a shuffle of it).
    Q(
      "text_oov_rate",
      """WITH w AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |v AS (SELECT word FROM (
        |    SELECT word, COUNT(*) AS c FROM w
        |    WHERE CAST(substr(source, 4) AS INT) < 10
        |    GROUP BY word ORDER BY c DESC, word LIMIT 20)),
        |e AS (SELECT w.source, w.word, v.word AS known
        |  FROM w LEFT JOIN v ON w.word = v.word
        |  WHERE CAST(substr(w.source, 4) AS INT) >= 10)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN known IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS oov_tokens,
        |  CAST(SUM(CASE WHEN known IS NULL THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS oov_ppm
        |FROM e GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("word"))
        .withColumn("src_n", substring(col("source"), 4, 10).cast("int"))
      val vocab = w.where(col("src_n") < 10)
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word")).limit(20)
        .select(col("word"))
      w.where(col("src_n") >= 10)
        .join(broadcast(vocab.withColumn("known", col("word"))
          .select(col("word"), col("known"))), Seq("word"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("known").isNull, 1).otherwise(0)).cast("long")
            .as("oov_tokens"))
        .select(col("source"), col("n_tokens"), col("oov_tokens"),
          expr("CAST(oov_tokens * 1000000 div n_tokens AS BIGINT)")
            .as("oov_ppm"))
        .orderBy(col("source"))
    },

    // --- doc-level template detection by frequent prefixes ---------------
    // The boilerplate lens ABOVE pipe_boilerplate_lines' line level:
    // documents opening with the same 5-token prefix are template
    // instances (form letters, scraped listing pages). One prefix
    // rollup, keep prefixes with ≥ 3 instances, report each template's
    // doc count, distinct sources (cross-source templates are scraper
    // artifacts) and corpus share in ppm via an empty-frame total
    // window over the O(templates) result.
    Q(
      "text_template_prefixes",
      """WITH d AS (SELECT doc_id, source,
        |    array_to_string(string_split(text, ' ')[1:5], ' ') AS prefix
        |  FROM documents),
        |t AS (SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM d GROUP BY prefix HAVING COUNT(*) >= 3),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS corpus FROM d)
        |SELECT prefix, n_docs, n_sources,
        |  CAST(n_docs * 1000000 // corpus AS BIGINT) AS share_ppm
        |FROM t CROSS JOIN c
        |ORDER BY n_docs DESC, prefix NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 5))
            .as("prefix"))
      val t = docs.groupBy(col("prefix"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
        .where(col("n_docs") >= 3)
      val c = docs.agg(count(lit(1)).as("corpus"))
      t.crossJoin(broadcast(c))
        .select(col("prefix"), col("n_docs"), col("n_sources"),
          expr("CAST(n_docs * 1000000 div corpus AS BIGINT)")
            .as("share_ppm"))
        .orderBy(col("n_docs").desc, col("prefix"))
    },

    // --- Cohen's kappa for the language classifier ------------------------
    // text_langid_eval shows the confusion matrix; kappa compresses it to
    // the chance-corrected agreement number a labeling pipeline gates on
    // (raw accuracy flatters any classifier when one class dominates —
    // exactly the skewed-lang mix a web corpus has). kappa = (po − pe) /
    // (1 − pe) with po, pe rational in confusion counts, so the whole
    // statistic is ONE 128-bit integer division: 1e6·(N·diag − Σ_k
    // row_k·col_k) / (N² − Σ_k row_k·col_k). The marginals join on the
    // ≤langs² cell table — model-sized, not data-sized; the only
    // data-scale pass is the classify+count aggregate itself.
    Q(
      "text_langid_kappa",
      s"""WITH p AS (SELECT lang AS labeled,
         |    ($langidBestSql).lang AS pred
         |  FROM documents),
         |c AS (SELECT labeled, pred, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM p GROUP BY labeled, pred),
         |m AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN labeled = pred THEN n ELSE 0 END)
         |      AS BIGINT) AS agree
         |  FROM c),
         |rs AS (SELECT labeled AS k, CAST(SUM(n) AS BIGINT) AS rn
         |       FROM c GROUP BY labeled),
         |cs AS (SELECT pred AS k, CAST(SUM(n) AS BIGINT) AS cn
         |       FROM c GROUP BY pred),
         |rc AS (SELECT CAST(SUM(rs.rn * cs.cn) AS BIGINT) AS src
         |       FROM rs JOIN cs ON rs.k = cs.k)
         |SELECT n_docs, agree,
         |  CAST(agree * 1000000 // n_docs AS BIGINT) AS po_ppm,
         |  CAST(CAST(src AS HUGEINT) * 1000000
         |    // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS pe_ppm,
         |  CAST((CAST(n_docs AS HUGEINT) * agree - src) * 1000000
         |    // (CAST(n_docs AS HUGEINT) * n_docs - src) AS BIGINT)
         |    AS kappa_ppm
         |FROM m, rc ORDER BY n_docs""".stripMargin
    ) { (s, d) =>
      val c = Tables.documents(s, d)
        .select(col("lang").as("labeled"),
          TextOps.langId(col("text")).getField("lang").as("pred"))
        .groupBy(col("labeled"), col("pred"))
        .agg(count(lit(1)).as("n"))
      val m = c.agg(sum(col("n")).cast("long").as("n_docs"),
        sum(when(col("labeled") === col("pred"), col("n")).otherwise(0L))
          .cast("long").as("agree"))
      val rs = c.groupBy(col("labeled").as("k"))
        .agg(sum(col("n")).cast("long").as("rn"))
      val cs = c.groupBy(col("pred").as("k"))
        .agg(sum(col("n")).cast("long").as("cn"))
      val rc = rs.join(cs, "k")
        .agg(sum(col("rn") * col("cn")).cast("long").as("src"))
      m.crossJoin(rc)
        .select(col("n_docs"), col("agree"),
          expr("CAST(agree * 1000000 div n_docs AS BIGINT)").as("po_ppm"),
          expr("CAST(CAST(src AS DECIMAL(38,0)) * 1000000" +
            " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)")
            .as("pe_ppm"),
          expr("CAST((CAST(n_docs AS DECIMAL(38,0)) * agree - src)" +
            " * 1000000" +
            " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs - src)" +
            " AS BIGINT)").as("kappa_ppm"))
        .orderBy(col("n_docs"))
    },

    // --- decile lift table for the trained quality scorer -----------------
    // The third leg of the model-eval tripod (threshold sweep = volume
    // tradeoff, calibration = probability honesty, LIFT = ranking
    // power): bucket the scored corpus into score deciles and report
    // each decile's label rate plus cumulative lift over the base rate.
    // Deciles are assigned at BIN granularity — the bounded floor-500
    // score-bin table is ranked and each bin mapped to
    // least(9, docs_before·10/total) — so no data-scale row ever rides
    // a global ranking window (the bin-then-rank shape a 100 TB scorer
    // eval actually uses); every window here is over the ≤bins-sized
    // rollup. Training replays the same deterministic perceptron chain
    // as text_quality_train (shared helpers, shared oracle CTEs).
    Q(
      "text_quality_lift",
      s"""${perceptronChain(TrainIters)},
         |sc AS (SELECT f.doc_id, CAST(SUM(f.cnt * w.w) AS BIGINT) AS score
         |  FROM feat f JOIN w$TrainIters w USING (bucket)
         |  GROUP BY f.doc_id),
         |bu AS (SELECT CAST(floor(score / 500) * 500 AS BIGINT) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN l.label THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos
         |  FROM sc JOIN st l USING (doc_id) GROUP BY bin),
         |cb AS (SELECT bin, n_docs, n_pos,
         |    COALESCE(CAST(SUM(n_docs) OVER (ORDER BY bin DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS before_docs,
         |    CAST(SUM(n_docs) OVER () AS BIGINT) AS tot_docs,
         |    CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
         |  FROM bu),
         |db AS (SELECT CAST(LEAST(9, before_docs * 10 // tot_docs)
         |      AS BIGINT) AS decile,
         |    n_docs, n_pos, tot_docs, tot_pos FROM cb),
         |dc AS (SELECT decile, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_pos) AS BIGINT) AS n_pos,
         |    MAX(tot_docs) AS tot_docs, MAX(tot_pos) AS tot_pos
         |  FROM db GROUP BY decile)
         |SELECT decile, n_docs, n_pos,
         |  CAST(n_pos * 1000000 // n_docs AS BIGINT) AS pos_rate_ppm,
         |  CAST(CAST(SUM(n_pos) OVER cw AS HUGEINT) * tot_docs * 1000000
         |    // (CAST(SUM(n_docs) OVER cw AS HUGEINT) * tot_pos)
         |    AS BIGINT) AS cum_lift_ppm
         |FROM dc
         |WINDOW cw AS (ORDER BY decile
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY decile""".stripMargin
    ) { (s, d) =>
      val wts = trainQualityWeights(s, d)
      val (feat, st) = qualityTrainFrames(s, d)
      val wlit = typedlit(wts.toSeq)
      val scored = feat
        .select(col("doc_id"), (col("cnt") *
          element_at(wlit, (col("bucket") + 1).cast("int"))).as("p"))
        .groupBy(col("doc_id")).agg(sum(col("p")).cast("long").as("score"))
      val bu = scored.join(st, "doc_id")
        .groupBy((floor(col("score") / lit(500)) * 500).cast("long")
          .as("bin"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("label"), 1L).otherwise(0L)).cast("long")
            .as("n_pos"))
      val cb = bu
        .withColumn("before_docs",
          coalesce(expr("CAST(sum(n_docs) over (order by bin desc" +
            " rows between unbounded preceding and 1 preceding)" +
            " AS BIGINT)"), lit(0L)))
        .withColumn("tot_docs", expr("CAST(sum(n_docs) over () AS BIGINT)"))
        .withColumn("tot_pos", expr("CAST(sum(n_pos) over () AS BIGINT)"))
      val dc = cb
        .select(least(lit(9L), expr("before_docs * 10 div tot_docs"))
          .cast("long").as("decile"),
          col("n_docs"), col("n_pos"), col("tot_docs"), col("tot_pos"))
        .groupBy(col("decile"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_pos")).cast("long").as("n_pos"),
          max(col("tot_docs")).as("tot_docs"),
          max(col("tot_pos")).as("tot_pos"))
      dc.select(col("decile"), col("n_docs"), col("n_pos"),
          expr("CAST(n_pos * 1000000 div n_docs AS BIGINT)")
            .as("pos_rate_ppm"),
          expr("CAST(CAST(sum(n_pos) over (order by decile rows between" +
            " unbounded preceding and current row) AS DECIMAL(38,0))" +
            " * tot_docs * 1000000" +
            " div (CAST(sum(n_docs) over (order by decile rows between" +
            " unbounded preceding and current row) AS DECIMAL(38,0))" +
            " * tot_pos) AS BIGINT)").as("cum_lift_ppm"))
        .orderBy(col("decile"))
    },

    // --- lexical diversity per source ---------------------------------------
    // The two diversity indices quality pipelines gate crawl sources
    // on, both exact rationals (no logs, so no libm): type–token ratio
    // (distinct words per token, the vocabulary-richness screen that
    // catches keyword-stuffed or template spam) and Gini–Simpson
    // diversity 1 − Σpᵢ² (the probability two random tokens differ —
    // the no-transcendentals stand-in for entropy, same ranking power
    // for the degenerate-source screen). One (source, word) hash
    // aggregate then a per-source rollup; Σcnt² reaches Σcnt² ≤ N², so
    // it accumulates in DECIMAL(38,0)/HUGEINT (128-bit exact on both
    // engines) and the final ppm division happens at 128 bits too.
    Q(
      "text_token_diversity",
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |c AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY source, w),
        |a AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sq
        |  FROM c GROUP BY source)
        |SELECT source, n_tokens, n_types,
        |  CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
        |  CAST(1000000 - sq * 1000000
        |    // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
        |    AS simpson_ppm
        |FROM a ORDER BY source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).cast("long").as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("n_types"),
          sum(expr("CAST(c AS DECIMAL(19,0)) * c"))
            .cast("decimal(38,0)").as("sq"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr("CAST(n_types * 1000000 div n_tokens AS BIGINT)")
            .as("ttr_ppm"),
          expr("CAST(1000000 - sq * 1000000" +
            " div (CAST(n_tokens AS DECIMAL(19,0)) * n_tokens)" +
            " AS BIGINT)").as("simpson_ppm"))
        .orderBy(col("source"))
    },

    // --- term burstiness (Fano factor) --------------------------------------
    // Church & Gale's burstiness diagnostic: content words CLUMP (a doc
    // that mentions a topic word mentions it repeatedly → per-doc count
    // variance far above Poisson), function words spread evenly
    // (Fano ≈ 1e6, the Poisson line). Fano = Var/mean over per-doc
    // counts INCLUDING zero-occurrence docs, evaluated without ever
    // materializing the zeros: with S = Σtf, Q = Σtf² over occurring
    // docs only, the zero docs contribute nothing to either, so
    // Fano_ppm = (N·Q − S²)·1e6 / (N·S) — one (term, doc) hash agg, one
    // term rollup, 128-bit products. The candidate set is the top-20
    // df terms (deterministic term tiebreak); the 1-row corpus size
    // broadcasts into that bounded head.
    Q(
      "text_burstiness",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY w, doc_id),
        |st AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
        |    CAST(SUM(tf) AS BIGINT) AS s,
        |    CAST(SUM(CAST(tf AS HUGEINT) * tf) AS HUGEINT) AS q
        |  FROM tf GROUP BY w),
        |top AS (SELECT * FROM st ORDER BY df DESC, w LIMIT 20),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT w AS term, df, s AS total_tf,
        |  CAST((n_docs * q - CAST(s AS HUGEINT) * s) * 1000000
        |    // (CAST(n_docs AS HUGEINT) * s) AS BIGINT) AS fano_ppm
        |FROM top, n
        |ORDER BY fano_ppm DESC, term""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val st = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("w"), col("doc_id"))
        .agg(count(lit(1)).cast("long").as("tf"))
        .groupBy(col("w"))
        .agg(count(lit(1)).cast("long").as("df"),
          sum(col("tf")).cast("long").as("s"),
          sum(expr("CAST(tf AS DECIMAL(19,0)) * tf"))
            .cast("decimal(38,0)").as("q"))
      val top = st.orderBy(col("df").desc, col("w")).limit(20)
      val n = docs.agg(count(lit(1)).cast("long").as("n_docs"))
      top.crossJoin(broadcast(n))
        .select(col("w").as("term"), col("df"), col("s").as("total_tf"),
          expr("CAST((n_docs * q - CAST(s AS DECIMAL(19,0)) * s)" +
            " * 1000000 div (CAST(n_docs AS DECIMAL(19,0)) * s)" +
            " AS BIGINT)").as("fano_ppm"))
        .orderBy(col("fano_ppm").desc, col("term"))
    },

    // --- windowed word association (Dice coefficient) ------------------------
    // Word-association mining beyond adjacency: unordered token pairs
    // co-occurring within a ±3 window, scored by the log-free Dice
    // coefficient 2·c(a,b)/(c(a)+c(b)) in floor-ppm (text_collocations
    // covers ADJACENT bigrams by lift; association windows catch
    // "merge … conflict"-style skip-gram affinities the bigram misses).
    // Pair generation is position arithmetic INSIDE the row — an offset
    // explode (k ∈ 1..3) plus 1-based element_at, no self-join, so the
    // only shuffles are the two hash aggregates (pair counts, unigram
    // counts) and the bounded top-20 head. Unordered = lexicographic
    // min/max, identical byte-compare in both engines.
    Q(
      "text_word_association",
      """WITH t AS (SELECT string_split(text, ' ') AS toks
        |  FROM documents),
        |p AS (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM t),
        |k AS (SELECT toks, i, unnest([1, 2, 3]) AS k FROM p),
        |pr AS (SELECT
        |    LEAST(toks[CAST(i AS INT)], toks[CAST(i + k AS INT)]) AS w1,
        |    GREATEST(toks[CAST(i AS INT)], toks[CAST(i + k AS INT)])
        |      AS w2
        |  FROM k WHERE i + k <= len(toks)
        |    AND toks[CAST(i AS INT)] <> toks[CAST(i + k AS INT)]),
        |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
        |  FROM pr GROUP BY w1, w2),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(toks) AS w FROM t) GROUP BY w)
        |SELECT w1, w2, c_xy,
        |  CAST(2 * c_xy * 1000000 // (u1.c + u2.c) AS BIGINT)
        |    AS dice_ppm
        |FROM pc JOIN uni u1 ON pc.w1 = u1.w
        |        JOIN uni u2 ON pc.w2 = u2.w
        |WHERE c_xy >= 5
        |ORDER BY dice_ppm DESC, w1, w2 LIMIT 20""".stripMargin
    ) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(TextOps.tokens(col("text")).as("toks"))
      val pr = t
        .select(col("toks"), posexplode(col("toks")).as(Seq("i0", "w")))
        .select(col("toks"), (col("i0") + 1).as("i"), col("w"),
          explode(array(lit(1), lit(2), lit(3))).as("k"))
        .where(col("i") + col("k") <= size(col("toks")))
        .select(col("w").as("wa"),
          element_at(col("toks"), (col("i") + col("k")).cast("int"))
            .as("wb"))
        .where(col("wa") =!= col("wb"))
        .select(least(col("wa"), col("wb")).as("w1"),
          greatest(col("wa"), col("wb")).as("w2"))
      val pc = pr.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).cast("long").as("c_xy"))
        .where(col("c_xy") >= 5)
      val uni = t.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).cast("long").as("c"))
      pc.join(uni.select(col("w").as("uw1"), col("c").as("c1")),
          col("w1") === col("uw1"))
        .join(uni.select(col("w").as("uw2"), col("c").as("c2")),
          col("w2") === col("uw2"))
        .select(col("w1"), col("w2"), col("c_xy"),
          expr("CAST(2 * c_xy * 1000000 div (c1 + c2) AS BIGINT)")
            .as("dice_ppm"))
        .orderBy(col("dice_ppm").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // --- document length profile per language ----------------------------------
    // The length-distribution report a per-language filter threshold is
    // read off of (too-short = boilerplate, too-long = concatenation
    // bugs): per language, exact median and p90 of n_chars via the
    // bounded length GRID — counts per (lang, n_chars) first, then the
    // cumulative rank walk over the grid (the q_weighted_median_price
    // two-level discipline: the window rides |distinct lengths| rows
    // per language, never the corpus). Both quantiles are the standard
    // lower-rank order statistic: smallest value whose cumulative count
    // reaches ⌈q·N⌉, stated integer-exactly as k·cum ≥ q·k·N.
    Q(
      "text_length_profile",
      """WITH g AS (SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM documents GROUP BY lang, n_chars),
        |c AS (SELECT lang, n_chars, w,
        |    CAST(SUM(w) OVER (PARTITION BY lang ORDER BY n_chars)
        |      AS BIGINT) AS cumw,
        |    CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS tot
        |  FROM g)
        |SELECT lang, MAX(tot) AS n_docs,
        |  CAST(MIN(CASE WHEN 2 * cumw >= tot THEN n_chars END)
        |    AS BIGINT) AS median_chars,
        |  CAST(MIN(CASE WHEN 10 * cumw >= 9 * tot THEN n_chars END)
        |    AS BIGINT) AS p90_chars
        |FROM c GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val g = Tables.documents(s, d)
        .groupBy(col("lang"), col("n_chars"))
        .agg(count(lit(1)).cast("long").as("w"))
      val wc = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wl = Window.partitionBy(col("lang"))
      g.withColumn("cumw", sum(col("w")).over(wc).cast("long"))
        .withColumn("tot", sum(col("w")).over(wl).cast("long"))
        .groupBy(col("lang"))
        .agg(max(col("tot")).as("n_docs"),
          min(when(lit(2) * col("cumw") >= col("tot"), col("n_chars")))
            .cast("long").as("median_chars"),
          min(when(lit(10) * col("cumw") >= lit(9) * col("tot"),
            col("n_chars"))).cast("long").as("p90_chars"))
        .orderBy(col("lang"))
    }
  )
}
