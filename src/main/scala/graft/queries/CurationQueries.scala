package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and tokenization: PII redaction, benchmark
  * decontamination, repetition signals (Gopher-style), language-balanced
  * sampling, and sequence packing. Extension surface beyond the reference
  * (its pipeline stops at DQ-gated curated parquet); every query is
  * value-exact against the DuckDB oracle.
  *
  * Scale notes per query inline; the common theme: row-local signals are
  * narrow projections, cross-doc steps are hash joins / combiner-friendly
  * aggregates on keys (gram, lang, source), never all-pairs or global
  * windows.
  */
object CurationQueries {

  /** Regexes kept to the syntax subset Java regex and RE2 (DuckDB) parse
    * identically — no backrefs, no lookaround. */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "555-[0-9]{3}-[0-9]{4}"

  /** Deterministic PII augmentation shared by engine and oracle: the
    * test corpus is synthetic lowercase prose with no PII, so both sides
    * plant the same emails/phones before redacting — the regexes then
    * exercise real matches. */
  /** NOTE: embedded into an outer stripMargin string — no line here may
    * begin with `|` after whitespace, or the outer strip eats it. */
  private def augmentedSql: String =
    """SELECT doc_id,
      |  concat(text,
      |    CASE WHEN doc_id % 3 = 0
      |      THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@example.com now')
      |      ELSE '' END,
      |    CASE WHEN doc_id % 5 = 0
      |      THEN concat(' call 555-', CAST(100 + doc_id % 900 AS VARCHAR),
      |                  '-', CAST(1000 + doc_id % 9000 AS VARCHAR))
      |      ELSE '' END) AS aug
      |FROM documents""".stripMargin

  private def augmented(d: org.apache.spark.sql.DataFrame) =
    d.select(col("doc_id"),
      concat(
        col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(""),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" call 555-"),
            (lit(100) + pmod(col("doc_id"), lit(900))).cast("string"),
            lit("-"),
            (lit(1000) + pmod(col("doc_id"), lit(9000))).cast("string")))
          .otherwise("")).as("aug"))

  val all: Seq[Q] = Seq(
    // --- PII detection + redaction --------------------------------------
    // Row-local regex work, narrow projection — embarrassingly parallel.
    // The fingerprint column proves the REDACTED text is identical
    // across engines, not just the match counts.
    Q(
      "text_pii_redact",
      s"""WITH a AS ($augmentedSql)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(aug, '$EmailRe', '<EMAIL>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g')) AS redacted_fp
         |FROM a ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      augmented(Tables.documents(s, d))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("aug"), lit(PhoneRe)).cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>")).as("redacted_fp"))
        .orderBy(col("doc_id"))
    },

    // --- benchmark decontamination (Dolma/FineWeb-style) ----------------
    // Docs sharing any 5-gram with the held-out "benchmark" slice
    // (source = src0 stands in for an eval set). Candidate generation is
    // an inverted-index equi-join on the gram — the same
    // never-materialize-all-pairs shape as the LSH dedup path: cost is
    // O(grams + collisions). Distinct-ify BEFORE the join on both sides
    // so a hot gram contributes |A|×|B| pairs of IDs, not of texts.
    Q(
      "pipe_contamination",
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, source,
        |        unnest(list_distinct(CASE WHEN len(toks) < 5
        |          THEN [array_to_string(toks, ' ')]
        |          ELSE list_transform(range(1, len(toks) - 3),
        |            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                 || ' ' || toks[i+3] || ' ' || toks[i+4]) END)) AS gram
        |      FROM t),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |corpus AS (SELECT doc_id, gram FROM g WHERE source <> 'src0')
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_common_5grams
        |FROM corpus c JOIN bench b ON c.gram = b.gram
        |GROUP BY c.doc_id
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val grams = docs.select(col("doc_id"), col("source"),
        explode(graft.functions.TextOps.sortedShingleSet(
          graft.functions.TextOps.tokens(col("text")), 5)).as("gram"))
      val bench = grams.where(col("source") === "src0")
        .select(col("gram")).distinct()
      grams.where(col("source") =!= "src0")
        .join(bench, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_common_5grams"))
        .orderBy(col("doc_id"))
    },

    // --- repetition signals (Gopher §A1.1-style filters) ----------------
    // Per-doc word and bigram duplication plus top-word dominance. One
    // explode + combiner-friendly two-level aggregate keyed by
    // (doc_id, word) — no windows, no joins; fractions are int/int
    // divisions so both engines produce identical doubles.
    Q(
      "text_repetition_signals",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |w AS (SELECT doc_id, unnest(toks) AS word FROM t),
        |wf AS (SELECT doc_id, word, COUNT(*) AS f
        |       FROM w GROUP BY doc_id, word),
        |agg AS (SELECT doc_id,
        |          CAST(SUM(f) AS BIGINT) AS n_words,
        |          CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |          CAST(MAX(f) AS BIGINT) AS top_f
        |        FROM wf GROUP BY doc_id),
        |bg AS (SELECT doc_id,
        |         CAST(len(toks) - 1 AS BIGINT) AS n_bigrams,
        |         CAST(len(list_distinct(list_transform(range(1, len(toks)),
        |           i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS n_distinct_bigrams
        |       FROM t WHERE len(toks) >= 2)
        |SELECT a.doc_id, n_words,
        |  1.0 - CAST(n_distinct AS DOUBLE) / n_words AS dup_word_frac,
        |  CAST(top_f AS DOUBLE) / n_words AS top_word_frac,
        |  1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams AS dup_bigram_frac,
        |  (1.0 - CAST(n_distinct AS DOUBLE) / n_words) <= 0.9
        |    AND CAST(top_f AS DOUBLE) / n_words <= 0.2 AS keep
        |FROM agg a JOIN bg USING (doc_id)
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val toks = graft.functions.TextOps.tokens(col("text"))
      val t = Tables.documents(s, d).select(col("doc_id"), toks.as("toks"))
      val wf = t.select(col("doc_id"), explode(col("toks")).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("f"))
      val agg = wf.groupBy(col("doc_id")).agg(
        sum(col("f")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("f")).as("top_f"))
      val bg = t.where(size(col("toks")) >= 2).select(col("doc_id"),
        (size(col("toks")) - 1).cast("long").as("n_bigrams"),
        size(array_distinct(graft.functions.TextOps.shingles(col("toks"), 2)))
          .cast("long").as("n_distinct_bigrams"))
      val dupWord = lit(1.0) - col("n_distinct").cast("double") / col("n_words")
      val topWord = col("top_f").cast("double") / col("n_words")
      agg.join(bg, "doc_id")
        .select(col("doc_id"), col("n_words"),
          dupWord.as("dup_word_frac"),
          topWord.as("top_word_frac"),
          (lit(1.0) - col("n_distinct_bigrams").cast("double")
            / col("n_bigrams")).as("dup_bigram_frac"),
          (dupWord <= 0.9 && topWord <= 0.2).as("keep"))
        .orderBy(col("doc_id"))
    },

    // --- language-balanced sampling -------------------------------------
    // At most 40 docs per language, chosen by a deterministic md5 draw —
    // the per-language quota pass that balances a multilingual corpus.
    // One shuffle on lang; the md5 order makes the sample reproducible
    // by any engine (same trick as q_stratified_sample).
    Q(
      "pipe_language_balanced",
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 40
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 40)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // --- sequence packing (concat-and-chunk, per shard) -----------------
    // The GPT-style packing contract: within each source shard,
    // documents concatenate in doc_id order and split every T=256
    // tokens; each doc reports its token interval and the chunks it
    // spans. A per-SOURCE running sum (partitioned window, integer
    // arithmetic only) — production packs per shard exactly so the
    // window never goes global.
    Q(
      "pipe_pack_sequences",
      """SELECT doc_id, source, n_tokens, tok_start,
        |  tok_start // 256 AS chunk_first,
        |  (tok_start + n_tokens - 1) // 256 AS chunk_last
        |FROM (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(SUM(len(string_split(text, ' ')))
        |        OVER (PARTITION BY source ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS tok_start
        |  FROM documents)
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val nTok = size(graft.functions.TextOps.tokens(col("text")))
        .cast("long")
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), nTok.as("n_tokens"))
        .withColumn("tok_start",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("tok_start"),
          // integer `div`, not floor(double /): exact at any magnitude
          expr("tok_start div 256").as("chunk_first"),
          expr("(tok_start + n_tokens - 1) div 256").as("chunk_last"))
        .orderBy(col("doc_id"))
    },

    // --- training-shard manifest (global token-budget assignment) --------
    // The last hop before training: assign every document to a ~4096-
    // token shard under the GLOBAL deterministic order (source, doc_id)
    // and emit the per-shard manifest a data loader consumes. The
    // global running token sum is the textbook scale trap (a single-
    // partition window); this computes it as the two-phase form that
    // survives 100 TB: per-source totals (a ~unit-cardinality frame)
    // → exclusive running offsets over THAT tiny frame → broadcast
    // offsets back and add the per-source partition-local running sum.
    // A document is assigned by its START token, so a shard may
    // overflow by at most one document's tail — the standard
    // contract. Everything integer; `div` sharding is engine-exact.
    Q(
      "pipe_shard_manifest",
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
        |        ORDER BY source, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tok_start
        |  FROM d)
        |SELECT CAST(tok_start // 4096 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  arg_min(doc_id, tok_start) AS first_doc,
        |  arg_max(doc_id, tok_start) AS last_doc
        |FROM c GROUP BY shard_id
        |ORDER BY shard_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val nTok = size(graft.functions.TextOps.tokens(col("text")))
        .cast("long")
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), nTok.as("n_tokens"))
      // phase 1: per-source totals → exclusive offsets (tiny frame; the
      // global window here is over ~#sources rows, not the corpus)
      val offsets = base.groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("src_toks"))
        .withColumn("src_offset",
          coalesce(sum(col("src_toks")).over(
            Window.orderBy(col("source"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .drop("src_toks")
      // phase 2: partition-local running sum + broadcast offset
      val local = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      base
        .withColumn("local_start",
          coalesce(sum(col("n_tokens")).over(local), lit(0L)))
        .join(broadcast(offsets), "source")
        .withColumn("tok_start", col("local_start") + col("src_offset"))
        .withColumn("shard_id", expr("tok_start div 4096"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          min_by(col("doc_id"), col("tok_start")).as("first_doc"),
          max_by(col("doc_id"), col("tok_start")).as("last_doc"))
        .orderBy(col("shard_id"))
    },

    // --- deterministic train/val/test split ------------------------------
    // The assignment every corpus needs before training: split decided
    // by a hash of the STABLE document id (not rand() — reproducible
    // across runs, engines, and re-partitioning; same conv-md5 bridge as
    // the k-means seeds), 98/1/1 by hash bucket. Narrow projection +
    // one combiner-friendly aggregate; at 100 TB the split column would
    // simply be written back as a partition column.
    Q(
      "pipe_train_val_split",
      """WITH d AS (SELECT source,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 100 AS h,
        |    len(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN h < 98 THEN 'train' WHEN h < 99 THEN 'val'
        |       ELSE 'test' END AS split,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS n_tokens
        |FROM d GROUP BY source, split
        |ORDER BY source NULLS FIRST, split NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val h = pmod(
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(100L))
      Tables.documents(s, d)
        .select(col("source"),
          when(h < 98, "train").when(h < 99, "val").otherwise("test")
            .as("split"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .orderBy(col("source"), col("split"))
    },

    // --- C4-style span-level dedup (keep first occurrence) ---------------
    // Fixed-width token spans (10 tokens, non-overlapping) dedup GLOBALLY:
    // any span seen earlier — in another doc or earlier in the same doc —
    // is dropped, and each doc is reassembled from its surviving spans
    // (the C4 "repeated three-sentence span" rule, word-granular since
    // this corpus has no sentence marks). Two shuffles, both scalable:
    // keep-first is a window over the span VALUE (high-cardinality key,
    // one row of state, balanced by construction), reassembly is a hash
    // aggregate on doc_id. Span explosion is 1/10 of token count, so the
    // exchanged volume is ~the corpus itself — the same cost class as
    // exact dedup, with no pair enumeration anywhere.
    Q(
      "pipe_span_dedup",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, unnest(list_transform(
        |        range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT), 1),
        |        i -> struct_pack(pos := i,
        |               span := array_to_string(toks[i*10+1:i*10+10], ' '))))
        |        AS sp
        |      FROM t),
        |k AS (SELECT doc_id, sp.pos AS pos, sp.span AS span,
        |        row_number() OVER (PARTITION BY sp.span
        |          ORDER BY doc_id, sp.pos) = 1 AS keep
        |      FROM s)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
        |  md5(COALESCE(string_agg(CASE WHEN keep THEN span END, ' '
        |    ORDER BY pos), '')) AS kept_fp
        |FROM k GROUP BY doc_id
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val spans = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(0L),
              ceil(size(col("toks")).cast("double") / 10.0).cast("long") - 1),
            i => array_join(
              slice(col("toks"), (i * 10 + 1).cast("int"), lit(10)), " "))))
        .withColumnRenamed("col", "span")
      val firstSeen = Window.partitionBy(col("span"))
        .orderBy(col("doc_id"), col("pos"))
      spans
        .withColumn("keep", row_number().over(firstSeen) === 1)
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_spans"),
          count(when(col("keep"), 1)).as("n_kept"),
          md5(array_join(
            transform(
              array_sort(collect_list(
                when(col("keep"), struct(col("pos"), col("span"))))),
              x => x.getField("span")), " ")).as("kept_fp"))
        .orderBy(col("doc_id"))
    },

    // --- temperature-based source resampling (τ = 0.5) -------------------
    // The multilingual-LM mixing rule (sample source s proportional to
    // n_s^τ) with τ = 0.5: per-source quota = ⌊4·√n_s⌋, docs chosen by
    // the deterministic md5 draw. Downweights oversized sources toward a
    // flatter mix without a cross-source normalizer — each quota depends
    // only on that source's own count, so the whole pass is ONE shuffle
    // on source and no global sum of doubles (cross-engine float-exact:
    // √ is IEEE-correctly-rounded in both engines and ×4 is a power of
    // two, so the quota integer is bit-identical).
    Q(
      "pipe_temperature_mix",
      """SELECT doc_id, source, quota FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    CAST(floor(4 * sqrt(CAST(COUNT(*) OVER (PARTITION BY source)
        |      AS DOUBLE))) AS BIGINT) AS quota
        |  FROM documents)
        |WHERE rk <= quota
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val bySrc = Window.partitionBy(col("source"))
      val draw = bySrc.orderBy(md5(col("doc_id").cast("string")),
        col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("rk", row_number().over(draw))
        .withColumn("quota",
          floor(lit(4) * sqrt(count(lit(1)).over(bySrc).cast("double")))
            .cast("long"))
        .where(col("rk") <= col("quota"))
        .select(col("doc_id"), col("source"), col("quota"))
        .orderBy(col("doc_id"))
    },

    // --- corpus-frequency line (boilerplate) removal ---------------------
    // The CCNet/RefinedWeb pass that strips nav bars, cookie banners and
    // license headers: segment every doc into lines, count each line's
    // document frequency across the WHOLE corpus, and delete lines that
    // appear in >= 2 distinct docs (any line shared across documents is
    // template text, not content). The test corpus has no newlines, so a
    // "line" is a fixed window of 8 tokens — the segmentation is what
    // varies per corpus; the df-threshold machinery is the operator.
    //
    // Scale shape: segmentation is a narrow per-doc explode (~tokens/8
    // rows); df is ONE combiner-friendly hash agg on the line text
    // (partial distinct-by-doc inside each task); the boilerplate set is
    // only the lines with df >= 2 — tiny relative to the corpus — so the
    // subtraction is a left_anti hash join; reassembly is one groupBy
    // doc_id whose state is bounded by doc length. No all-pairs step,
    // no global window, no driver-side rows.
    Q(
      "pipe_boilerplate_lines",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |li AS (SELECT doc_id, toks,
        |    unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)))
        |      AS line_no
        |  FROM t),
        |l AS (SELECT doc_id, line_no,
        |    array_to_string(toks[line_no*8+1 : line_no*8+8], ' ') AS line
        |  FROM li),
        |b AS (SELECT line FROM l GROUP BY line
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |k AS (SELECT l.* FROM l ANTI JOIN b USING (line)),
        |n AS (SELECT doc_id,
        |    CAST(ceil(len(toks) / 8.0) AS BIGINT) AS n_lines FROM t),
        |ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |    string_agg(line, ' ' ORDER BY line_no) AS kept_text
        |  FROM k GROUP BY doc_id)
        |SELECT n.doc_id, n.n_lines,
        |  COALESCE(ka.n_kept, 0) AS n_kept,
        |  COALESCE(ka.kept_text, '') AS kept_text
        |FROM n LEFT JOIN ka USING (doc_id)
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextOps.tokens(col("text")).as("toks"))
      val lines = docs.select(col("doc_id"),
        posexplode(expr(
          """transform(
            |  sequence(0, cast(ceil(size(toks) / 8.0) as int) - 1),
            |  i -> array_join(slice(toks, i*8 + 1, 8), ' '))""".stripMargin))
          .as(Seq("line_no", "line")))
      val boiler = lines.groupBy(col("line"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .where(col("df") >= 2)
        .select(col("line"))
      val kept = lines.join(boiler, Seq("line"), "left_anti")
      // n_lines is arithmetic on the token count — no second explode/agg
      val perDoc = docs.select(col("doc_id"),
        expr("cast(ceil(size(toks) / 8.0) as bigint)").as("n_lines"))
      val keptAgg = kept.groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_kept"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("line_no"), col("line")))),
              x => x.getField("line")), " ").as("kept_text"))
      perDoc.join(keptAgg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_text"), lit("")).as("kept_text"))
        .orderBy(col("doc_id"))
    },

    // --- DSIR importance resampling -------------------------------------
    // Data Selection via Importance Resampling (Xie et al. 2023,
    // arXiv:2302.03169 — public): score every raw document by how much
    // more likely its hashed n-gram features are under a target
    // distribution than under the raw pool, then keep the top slice.
    // Features are unigram buckets b = md5Low60(token) % 256 (the
    // cross-engine MD5 hash [[graft.functions.TextOps.md5Low60]]; 256 is
    // a power of two so the low bits agree between engines regardless of
    // sign). The target here is the quality slice lang='en' AND
    // n_chars>=300 — DSIR's "formal text" target stated as a predicate.
    //
    // Engine-exactness: the paper's weight is Σ log p_t(b)/p_r(b); a
    // float log-sum is accumulation-order-dependent, so following the
    // repo's fixed-point convention ([[TextQueries]] text_lm_score) the
    // weight is the add-1-smoothed likelihood RATIO per token in exact
    // ppm integers — (ct+1)(Nr+B) // (cr+1)(Nt+B) — averaged per token
    // with floor division. Monotone in the per-bucket ratio, value-exact
    // in both engines (products in DECIMAL(38,0)/HUGEINT, never double).
    // Selection is the ε→0 temperature limit of the paper's Gumbel
    // top-k: deterministic top 20% by (score, doc_id).
    //
    // Scale shape: token→bucket is a narrow projection; the two count
    // tables are combiner-friendly aggregates on a 256-value key; the
    // per-token scoring join broadcasts a 256-row table; the final
    // selection is orderBy+limit = TakeOrderedAndProject (per-partition
    // top-k, then k-merge on the driver — never a global sort). The one
    // driver-side step is count()/5 to size k: a metadata-cheap job, and
    // the shape a real pipeline uses to pin the output budget.
    Q(
      "pipe_dsir_resample",
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |bk AS (SELECT doc_id,
        |    CAST(md5_number_upper(tok) % 1152921504606846976 AS BIGINT)
        |      % 256 AS b
        |  FROM t),
        |cr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bk GROUP BY b),
        |tgt AS (SELECT doc_id FROM documents
        |        WHERE lang = 'en' AND n_chars >= 300),
        |ct AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
        |       FROM bk JOIN tgt USING (doc_id) GROUP BY b),
        |tot AS (SELECT (SELECT SUM(cr) FROM cr) AS nr,
        |               (SELECT COALESCE(SUM(ct), 0) FROM ct) AS nt),
        |lr AS (SELECT cr.b,
        |    CAST((1000000::HUGEINT * (COALESCE(ct.ct, 0) + 1) * (tot.nr + 256))
        |         // ((cr.cr + 1) * (tot.nt + 256)) AS BIGINT) AS lr_ppm
        |  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot),
        |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |    CAST(SUM(lr_ppm) // COUNT(*) AS BIGINT) AS score_ppm
        |  FROM bk JOIN lr USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_toks, score_ppm FROM sc
        |ORDER BY score_ppm DESC, doc_id
        |LIMIT (SELECT COUNT(*) // 5 FROM documents)""".stripMargin
    ) { (s, d) =>
      import graft.functions.TextOps
      val docs = Tables.documents(s, d)
      // target membership is a row-local predicate, so BOTH count tables
      // fall out of ONE token pass (count / conditional count on the
      // 256-value bucket key — combiner-friendly, no semi-join shuffle)
      val bk = docs
        .select(col("doc_id"),
          (col("lang") === "en" && col("n_chars") >= 300).as("tgt"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .select(col("doc_id"), col("tgt"),
          (TextOps.md5Low60(col("tok")) % 256).as("b"))
      val counts = bk.groupBy(col("b"))
        .agg(count(lit(1)).as("cr"),
          count_if(col("tgt")).as("ct"))
      val tot = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
      val lr = counts.crossJoin(broadcast(tot))
        .select(col("b"), expr(
          """(cast(1000000 as decimal(38,0)) * (ct + 1) * (nr + 256))
            | div ((cr + 1) * (nt + 256))""".stripMargin).as("lr_ppm"))
      // second (and last) token pass: per-(doc, bucket) partial counts
      // ride the map-side combine, then score against the broadcast
      // 256-row ratio table
      val sc = bk.groupBy(col("doc_id"), col("b"))
        .agg(count(lit(1)).as("n"))
        .join(lr, Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_toks"),
          expr("sum(n * lr_ppm) div sum(n)").as("score_ppm"))
      val k = (docs.count() / 5).toInt
      sc.select(col("doc_id"), col("n_toks"), col("score_ppm"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .limit(k)
    },

    // --- sliding-window chunking for retrieval corpora -------------------
    // The doc→chunk explode every embedding/retrieval pipeline runs
    // before encoding: fixed 32-token windows at stride 24 (8-token
    // overlap keeps boundary context in both neighbors), short docs one
    // chunk, the tail chunk truncated, never dropped. A narrow per-row
    // explode — chunk count is arithmetic on the token count, chunk
    // boundaries are element_at probes — no shuffle at all until the
    // final presentation sort; at 100 TB this is a map-only pass that
    // multiplies rows by ~n/stride.
    Q(
      "pipe_chunk_overlap",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |c AS (SELECT doc_id, toks, n,
        |        CASE WHEN n <= 32 THEN 1
        |             ELSE 1 + (n - 32 + 23) // 24 END AS n_chunks
        |      FROM n),
        |x AS (SELECT doc_id, toks, n, CAST(i AS INT) AS chunk_idx
        |      FROM c, UNNEST(range(0, n_chunks)) AS u(i)),
        |s AS (SELECT doc_id, chunk_idx, chunk_idx * 24 AS start_tok,
        |        LEAST(32, n - chunk_idx * 24) AS chunk_len, toks
        |      FROM x)
        |SELECT doc_id, chunk_idx, CAST(start_tok AS BIGINT) AS start_tok,
        |  CAST(chunk_len AS BIGINT) AS chunk_len,
        |  list_extract(toks, start_tok + 1) AS first_word,
        |  list_extract(toks, start_tok + chunk_len) AS last_word
        |FROM s
        |ORDER BY doc_id NULLS FIRST, chunk_idx NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val C = 32
      val S = 24
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("n_chunks", when(col("n") <= C, lit(1))
          // positive operands: double-div + int cast truncates = floor
          .otherwise(lit(1) + ((col("n") - C + (S - 1)) / S).cast("int")))
      t.select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
        .withColumn("start_tok", col("chunk_idx") * S)
        .withColumn("chunk_len", least(lit(C), col("n") - col("start_tok")))
        .select(col("doc_id"), col("chunk_idx"),
          col("start_tok").cast("long").as("start_tok"),
          col("chunk_len").cast("long").as("chunk_len"),
          element_at(col("toks"), col("start_tok") + 1).as("first_word"),
          element_at(col("toks"), col("start_tok") + col("chunk_len"))
            .as("last_word"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // --- weighted sampling without replacement (A-Res) -------------------
    // Efraimidis–Spirakis 2006 (public): draw k docs with inclusion odds
    // proportional to a weight by ranking on key = u^(1/w), u uniform.
    // The twist that makes it a VALUE, not a distribution: u comes from
    // the cross-engine md5 hash of the doc id ((h+1)/2^60 ∈ (0,1]), so
    // the sample is identical on retries, backfills, and in the oracle —
    // the same fixed-per-row-decision discipline as the hash-Bernoulli
    // percentile sample. Weight = n_chars (length-weighted corpus
    // draw). Keys are rounded to 6 dp BEFORE ranking on both engines
    // (libm pow may differ in final ulps; ranking on the rounded value
    // with doc_id tiebreak makes the order engine-exact) — the same
    // round-then-rank device the cosine top-k family uses. One narrow
    // projection + a top-k TakeOrderedAndProject: no shuffle beyond the
    // k-row result at any corpus size.
    Q(
      "pipe_weighted_sample",
      s"""WITH k AS (SELECT doc_id, n_chars,
         |    ROUND(pow(CAST(${graft.functions.TextOps.md5Low60Sql(
                 "CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
         |        / 1152921504606846976.0, 1.0 / n_chars), 6) AS samp_key
         |  FROM documents)
         |SELECT doc_id, n_chars, samp_key,
         |  CAST(row_number() OVER (ORDER BY samp_key DESC, doc_id) AS INT)
         |    AS rank
         |FROM k
         |QUALIFY rank <= 20
         |ORDER BY rank""".stripMargin
    ) { (s, d) =>
      import graft.functions.TextOps
      val u = (TextOps.md5Low60(col("doc_id").cast("string")) + 1)
        .cast("double") / lit(1152921504606846976.0) // 2^60, exact
      // top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
      // global sort); the unpartitioned rank window then runs over the
      // 20 survivors, not the corpus
      val w = Window.orderBy(col("samp_key").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          round(pow(u, lit(1.0) / col("n_chars")), 6).as("samp_key"))
        .orderBy(col("samp_key").desc, col("doc_id"))
        .limit(20)
        .withColumn("rank", row_number().over(w))
        .orderBy(col("rank"))
    },

    // --- deterministic source interleave (training order) ----------------
    // The order data actually reaches the trainer in: one document from
    // each source, round-robin, so no gradient window is dominated by a
    // single crawl. Position is CLOSED-FORM — (rn−1)·n_sources + source
    // index — never a global window over the corpus: the per-source rn
    // partitions on source, the source index is a 20-row frame, and the
    // join is broadcast. Exact while shards are equal-sized (true of
    // this corpus and of packed training shards by construction); the
    // head of the schedule is the verifiable artifact.
    Q(
      "pipe_interleave_shards",
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |si AS (SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM si)
        |SELECT CAST((r.rn - 1) * n_sources + si.sidx AS BIGINT) AS pos,
        |  r.source, r.doc_id, CAST(r.rn AS BIGINT) AS rn
        |FROM r JOIN si USING (source) CROSS JOIN ns
        |ORDER BY pos LIMIT 50""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val r = docs.select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      val si = docs.select(col("source")).distinct()
        .withColumn("sidx", row_number().over(
          Window.orderBy(col("source"))).cast("long"))
      val ns = si.agg(count(lit(1)).as("n_sources"))
      r.join(broadcast(si), Seq("source"))
        .crossJoin(broadcast(ns))
        .select(
          ((col("rn") - 1) * col("n_sources") + col("sidx")).cast("long")
            .as("pos"),
          col("source"), col("doc_id"), col("rn").cast("long").as("rn"))
        .orderBy(col("pos"))
        .limit(50)
    },

    // --- safety/blocklist filtering (with audit trail) -------------------
    // The wordlist-based safety pass every corpus runs first (the cheap
    // gate before model-based classifiers): per document, total
    // blocklist occurrences, the DISTINCT terms that hit (sorted,
    // joined — the audit trail reviewers need, not just a boolean), and
    // the keep verdict. The blocklist rides into the plan as a literal
    // array (O(terms) broadcast once, like the quality-model weights);
    // the scan is a narrow row-local projection — a pure map pass at
    // any scale.
    Q(
      "pipe_safety_filter",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> list_contains(['slow','big','error'], t))) AS BIGINT)
        |    AS n_hits,
        |  COALESCE(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split(text, ' '),
        |      t -> list_contains(['slow','big','error'], t)))), ','), '')
        |    AS hit_terms,
        |  len(list_filter(string_split(text, ' '),
        |    t -> list_contains(['slow','big','error'], t))) = 0 AS keep
        |FROM documents
        |ORDER BY doc_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val hits = filter(graft.functions.TextOps.tokens(col("text")),
        t => t.isin("slow", "big", "error"))
      Tables.documents(s, d)
        .select(col("doc_id"), hits.as("h"))
        .select(col("doc_id"),
          size(col("h")).cast("long").as("n_hits"),
          array_join(array_sort(array_distinct(col("h"))), ",")
            .as("hit_terms"),
          (size(col("h")) === 0).as("keep"))
        .orderBy(col("doc_id"))
    },

    // --- topic exploration: cluster docs, label clusters by lift ---------
    // The corpus-cartography pass (cluster-then-label — what BERTopic
    // does with fancier parts): k-means over the aligned embeddings
    // (doc_id ≡ vec_id, shared engine-exact trainer), then each
    // cluster labeled with its 3 most DISTINCTIVE terms — lift =
    // in-cluster share / corpus share, the same ratio-not-log
    // discipline as text_collocations, with a min-count floor so rare
    // accidents can't label a cluster. Assignment is the broadcast-
    // centroid map; term stats are two hash aggregates; the label
    // ranking windows over (cluster, term) counts — k×vocab rows at
    // worst, vocabulary-bounded, corpus-scan-free after the explode.
    Q(
      "pipe_doc_topics", {
        val iters = 2
        s"""WITH ${SimilarityQueries.kmeansOracleCtes(k = 8, iters = iters)},
           |w AS (SELECT a.cid, t.word FROM af a
           |      JOIN (SELECT doc_id, unnest(string_split(text, ' '))
           |              AS word FROM documents) t
           |        ON t.doc_id = a.vec_id),
           |ct AS (SELECT cid, word, COUNT(*) AS n FROM w
           |       GROUP BY cid, word),
           |cs AS (SELECT cid, SUM(n) AS tc FROM ct GROUP BY cid),
           |gw AS (SELECT word, SUM(n) AS cw FROM ct GROUP BY word),
           |gt AS (SELECT SUM(n) AS total FROM ct),
           |sc AS (SELECT cid, word, n,
           |         (CAST(n AS DOUBLE) * total) / (CAST(tc AS DOUBLE) * cw)
           |           AS lift
           |       FROM ct JOIN cs USING (cid) JOIN gw USING (word)
           |         CROSS JOIN gt
           |       WHERE n >= 5)
           |SELECT cid, rank, word, CAST(n AS BIGINT) AS n,
           |  ROUND(lift, 6) AS lift
           |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY cid
           |        ORDER BY lift DESC, word) AS INT) AS rank
           |      FROM sc)
           |WHERE rank <= 3
           |ORDER BY cid NULLS FIRST, rank NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      import graft.operators.KMeans
      val emb = graft.Tables.embeddings(s, d)
      val cents = KMeans.fit(emb, k = 8, iters = 2)
      val assigned = emb.select(col("vec_id"),
        KMeans.assignExpr(col("embedding"), cents).as("cid"))
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
      val ct = toks.join(assigned, col("doc_id") === col("vec_id"))
        .groupBy(col("cid"), col("word")).agg(count(lit(1)).as("n"))
      val cs = ct.groupBy(col("cid")).agg(sum(col("n")).as("tc"))
      val gw = ct.groupBy(col("word")).agg(sum(col("n")).as("cw"))
      val gt = ct.agg(sum(col("n")).as("total"))
      val win = Window.partitionBy(col("cid"))
        .orderBy(col("lift").desc, col("word"))
      ct.where(col("n") >= 5)
        .join(cs, Seq("cid")).join(gw, Seq("word"))
        .crossJoin(broadcast(gt))
        .select(col("cid"), col("word"), col("n"),
          ((col("n").cast("double") * col("total"))
            / (col("tc").cast("double") * col("cw"))).as("lift"))
        .withColumn("rank", row_number().over(win))
        .where(col("rank") <= 3)
        .select(col("cid"), col("rank"), col("word"), col("n"),
          round(col("lift"), 6).as("lift"))
        .orderBy(col("cid"), col("rank"))
    },

    // --- leakage-safe GROUP split (hash the source, not the doc) ---------
    // pipe_train_val_split hashes doc_id, which puts near-duplicate
    // documents from one crawl/source on BOTH sides of the train/val
    // line — the classic eval-contamination leak. The group split hashes
    // the SOURCE, so an entire provenance group lands in exactly one
    // split by construction (GroupSplitSpec pins it); the price is
    // lumpier split sizes (group granularity), which is why the ratio
    // here is 90/5/5, not 98/1/1. Same narrow-projection + one-aggregate
    // plan; at 100 TB the source hash is a free partition column and
    // no shuffle keys change.
    Q(
      "pipe_group_split",
      """WITH d AS (SELECT source,
        |    ('0x' || substr(md5(source), 1, 15))::BIGINT % 100 AS h,
        |    len(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
        |            ELSE 'test' END AS split,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS n_tokens
        |FROM d GROUP BY split
        |ORDER BY split NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val h = pmod(
        conv(substring(md5(col("source")), 1, 15), 16, 10).cast("long"),
        lit(100L))
      Tables.documents(s, d)
        .select(col("source"),
          when(h < 90, "train").when(h < 95, "val").otherwise("test")
            .as("split"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy(col("split"))
        .agg(count_distinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .orderBy(col("split"))
    },

    // --- priority-fill token budget allocation ---------------------------
    // The OTHER curation allocator beside pipe_temperature_mix's
    // proportional sampling: greedy priority fill — rank sources by a
    // policy signal (here English share, a real "high-resource-first"
    // policy), pour the token budget down the ranking, take the
    // boundary source partially, zero the rest. Budget = half the
    // corpus tokens (self-scaling, so the boundary exists at every sf).
    // One per-source rollup + one window over the O(sources) frame;
    // exact integer tokens throughout.
    Q(
      "pipe_budget_fill",
      """WITH s AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN lang = 'en'
        |        THEN len(string_split(text, ' ')) ELSE 0 END) * 1000000
        |      // SUM(len(string_split(text, ' '))) AS BIGINT) AS en_ppm
        |  FROM documents GROUP BY source),
        |b AS (SELECT CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget FROM s),
        |c AS (SELECT source, n_tokens, en_ppm, budget,
        |    CAST(SUM(n_tokens) OVER (ORDER BY en_ppm DESC, source)
        |      AS BIGINT) AS cum
        |  FROM s CROSS JOIN b)
        |SELECT source, n_tokens, en_ppm,
        |  CAST(CASE WHEN cum <= budget THEN n_tokens
        |    WHEN cum - n_tokens < budget THEN budget - (cum - n_tokens)
        |    ELSE 0 END AS BIGINT) AS take_tokens,
        |  (cum <= budget) AS fully_taken
        |FROM c ORDER BY source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val toks = size(split(col("text"), " ")).cast("long")
      val src = Tables.documents(s, d)
        .select(col("source"), col("lang"), toks.as("t"))
        .groupBy(col("source"))
        .agg(sum(col("t")).cast("long").as("n_tokens"),
          sum(when(col("lang") === "en", col("t")).otherwise(0L))
            .cast("long").as("en_tok"))
        .select(col("source"), col("n_tokens"),
          expr("CAST(en_tok * 1000000 div n_tokens AS BIGINT)")
            .as("en_ppm"))
      val budget = src.agg(expr("CAST(sum(n_tokens) div 2 AS BIGINT)")
        .as("budget"))
      val w = Window.orderBy(col("en_ppm").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      src.crossJoin(broadcast(budget))
        .withColumn("cum", sum(col("n_tokens")).over(w).cast("long"))
        .select(col("source"), col("n_tokens"), col("en_ppm"),
          when(col("cum") <= col("budget"), col("n_tokens"))
            .when(col("cum") - col("n_tokens") < col("budget"),
              col("budget") - (col("cum") - col("n_tokens")))
            .otherwise(0L).cast("long").as("take_tokens"),
          (col("cum") <= col("budget")).as("fully_taken"))
        .orderBy(col("source"))
    },

    // --- padding waste by length bucket ----------------------------------
    // The batching-efficiency readout pipe_pack_sequences optimizes
    // AWAY: if documents were naively padded to their 64-token bucket
    // ceiling (the fixed-shape batching most training stacks start
    // with), how many pad tokens does each bucket burn? Per bucket:
    // docs, real tokens, pad tokens to the ceiling, waste share in
    // integer ppm. One rollup over ⌈len/64⌉ — the planning query that
    // justifies switching to packing.
    Q(
      "pipe_padding_waste",
      """WITH d AS (SELECT
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |b AS (SELECT ((toks + 63) // 64) * 64 AS ceilcap, toks FROM d)
        |SELECT CAST(ceilcap AS BIGINT) AS bucket_cap,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS real_tokens,
        |  CAST(SUM(ceilcap - toks) AS BIGINT) AS pad_tokens,
        |  CAST(SUM(ceilcap - toks) * 1000000 // SUM(ceilcap) AS BIGINT)
        |    AS waste_ppm
        |FROM b GROUP BY bucket_cap
        |ORDER BY bucket_cap NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("toks"))
        .select(col("toks"),
          expr("((toks + 63) div 64) * 64").as("ceilcap"))
        .groupBy(col("ceilcap").cast("long").as("bucket_cap"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast("long").as("real_tokens"),
          sum(col("ceilcap") - col("toks")).cast("long").as("pad_tokens"),
          expr("CAST(sum(ceilcap - toks) * 1000000 div sum(ceilcap) " +
            "AS BIGINT)").as("waste_ppm"))
        .orderBy(col("bucket_cap"))
    },

    // --- best-fit sequence packing (first-fit-decreasing bins) ----------
    // The packer production pipelines actually run: instead of padding
    // every document to a bucket ceiling (pipe_padding_waste) or
    // splitting documents across chunk boundaries (pipe_pack_sequences),
    // place each WHOLE document into the first 256-token bin that still
    // has room, longest documents first (first-fit-decreasing — the
    // classic 11/9·OPT+1 bin-packing greedy). Determinism and scale come
    // from the same discipline: packing runs inside fixed 64-document
    // blocks per source (seq = per-source length-desc rank; block =
    // seq div 64), because at 100 TB no packer sorts the whole corpus
    // into one sequential pass — streaming packers pack within bounded
    // buffers, and the block IS that buffer. The per-block fold is an
    // O(64 × bins) higher-order `aggregate` over an array<bigint> of
    // bin remainders — pure integer list logic, replayed move-for-move
    // by the oracle's recursive CTE (the Holt/BPE replay precedent), so
    // the result is value-exact, not rows-only. A document longer than
    // the 256 cap opens its own bin with remainder clamped to 0 (the
    // overflow convention). Output: per source, FFD bins + pad versus
    // the naive 64-ceiling padding baseline — the comparison row that
    // justifies the packer.
    Q(
      "pipe_pack_bestfit", {
        // same-type list_reduce trick (the accumulator must share the
        // element type in DuckDB): lift each length to a singleton list,
        // prepend the empty remainder list as the seed. list_position
        // returns 0 when absent (both engines agree), lambda index j is
        // 1-based like list_position — so the update transform mirrors
        // the Spark fold move-for-move.
        val POS =
          "list_position(list_transform(acc, rr -> rr >= el[1]), true)"
        s"""WITH d AS (SELECT doc_id, source,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
           |  FROM documents),
           |r AS (SELECT doc_id, source, toks,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY toks DESC, doc_id) AS seq
           |  FROM d),
           |g AS (SELECT source, CAST((seq - 1) // 64 AS BIGINT) AS block,
           |    list(toks ORDER BY toks DESC, doc_id) AS lens
           |  FROM r GROUP BY source, block),
           |pk AS (SELECT source, block,
           |    list_reduce(
           |      list_prepend(CAST([] AS BIGINT[]),
           |        list_transform(lens, x -> [x])),
           |      (acc, el) -> CASE WHEN $POS = 0
           |        THEN list_append(acc, greatest(256 - el[1], 0))
           |        ELSE list_transform(acc, (rr, j) ->
           |          CASE WHEN j = $POS THEN rr - el[1] ELSE rr END)
           |      END) AS rems
           |  FROM g),
           |sb AS (SELECT source, CAST(SUM(len(rems)) AS BIGINT) AS ffd_bins,
           |    CAST(SUM(list_sum(rems)) AS BIGINT) AS ffd_pad_tokens
           |  FROM pk GROUP BY source),
           |base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(toks) AS BIGINT) AS real_tokens,
           |    CAST(SUM(((toks + 63) // 64) * 64 - toks) AS BIGINT)
           |      AS naive_pad_tokens
           |  FROM d GROUP BY source)
           |SELECT b.source, n_docs, real_tokens, ffd_bins, ffd_pad_tokens,
           |  CAST(ffd_pad_tokens * 1000000 // (ffd_bins * 256) AS BIGINT)
           |    AS ffd_waste_ppm,
           |  naive_pad_tokens,
           |  CAST(naive_pad_tokens * 1000000
           |    // (real_tokens + naive_pad_tokens) AS BIGINT)
           |    AS naive_waste_ppm
           |FROM base b JOIN sb USING (source)
           |ORDER BY source NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val d0 = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      val seqW = Window.partitionBy(col("source"))
        .orderBy(col("toks").desc, col("doc_id"))
      // per-(source, block) fold: bin remainders as an array<bigint>
      // accumulator; first fit found via array_position over a boolean
      // transform, updated in place via the indexed transform — every
      // step pure integer, so both engines land on identical bins
      val packed = d0
        .withColumn("seq", row_number().over(seqW))
        .withColumn("block", expr("CAST((seq - 1) div 64 AS BIGINT)"))
        .groupBy(col("source"), col("block"))
        .agg(expr("transform(array_sort(collect_list(" +
          "struct(-toks AS nt, doc_id AS d, toks AS t))), e -> e.t)")
          .as("lens"))
        .withColumn("rems", expr(
          """aggregate(lens, cast(array() as array<bigint>),
            |  (acc, x) -> CASE
            |    WHEN array_position(transform(acc, rr -> rr >= x), true) > 0
            |    THEN transform(acc, (rr, j) ->
            |      IF(j = array_position(transform(acc, rr2 -> rr2 >= x),
            |           true) - 1,
            |         rr - x, rr))
            |    ELSE concat(acc, array(greatest(256 - x, bigint(0))))
            |  END)""".stripMargin))
      val sb = packed
        .select(col("source"),
          size(col("rems")).cast("long").as("bins"),
          expr("aggregate(rems, bigint(0), (a, rr) -> a + rr)").as("pad"))
        .groupBy(col("source"))
        .agg(sum(col("bins")).cast("long").as("ffd_bins"),
          sum(col("pad")).cast("long").as("ffd_pad_tokens"))
      val base = d0.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("real_tokens"),
        sum(expr("((toks + 63) div 64) * 64 - toks")).cast("long")
          .as("naive_pad_tokens"))
      base.join(sb, "source")
        .select(col("source"), col("n_docs"), col("real_tokens"),
          col("ffd_bins"), col("ffd_pad_tokens"),
          expr("CAST(ffd_pad_tokens * 1000000 div (ffd_bins * 256) " +
            "AS BIGINT)").as("ffd_waste_ppm"),
          col("naive_pad_tokens"),
          expr("CAST(naive_pad_tokens * 1000000 div " +
            "(real_tokens + naive_pad_tokens) AS BIGINT)")
            .as("naive_waste_ppm"))
        .orderBy(col("source"))
    },

    // --- deterministic per-epoch corpus shuffle + shard assignment --------
    // The data-loader ordering op every multi-epoch training run needs:
    // epoch k's visit order is a NEW pseudorandom permutation (hash of
    // epoch:doc_id — different epochs decorrelate, reruns reproduce
    // bit-for-bit, and a resumed job can recompute any shard's order
    // without global state). Shard = hash mod 8; within-shard position =
    // rank under the hash order. NO global sort anywhere: the permutation
    // is hash-derived per row, and ordering exists only inside the
    // per-(epoch, shard) window — the shape that keeps a 100 TB shuffle
    // embarrassingly parallel. Audited by an order-sensitive checksum
    // (Σ doc_id·position mod 2³¹ — any swap changes it) plus each
    // shard's first three visit ids; the oracle replays the same md5
    // permutation.
    Q(
      "pipe_epoch_shuffle",
      s"""WITH t AS (SELECT doc_id, e AS epoch
         |  FROM documents, UNNEST([1, 2]) AS u(e)),
         |h AS (SELECT doc_id, epoch,
         |    ${graft.functions.TextOps.md5Low60Sql(
        "CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM t),
         |r AS (SELECT doc_id, epoch, h % 8 AS shard,
         |    CAST(row_number() OVER (PARTITION BY epoch, h % 8
         |      ORDER BY h, doc_id) AS BIGINT) AS p
         |  FROM h)
         |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(doc_id * p) % 2147483647 AS BIGINT) AS order_checksum,
         |  concat_ws(',',
         |    CAST(MAX(CASE WHEN p = 1 THEN doc_id END) AS VARCHAR),
         |    CAST(MAX(CASE WHEN p = 2 THEN doc_id END) AS VARCHAR),
         |    CAST(MAX(CASE WHEN p = 3 THEN doc_id END) AS VARCHAR)) AS first3
         |FROM r GROUP BY epoch, shard
         |ORDER BY epoch NULLS FIRST, shard NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val tagged = Tables.documents(s, d)
        .select(col("doc_id"), explode(array(lit(1), lit(2))).as("epoch"))
        .withColumn("h", graft.functions.TextOps.md5Low60(
          concat(col("epoch").cast("string"), lit(":"),
            col("doc_id").cast("string"))))
        .withColumn("shard", pmod(col("h"), lit(8L)))
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("h"), col("doc_id"))
      tagged.withColumn("p", row_number().over(w).cast("long"))
        .groupBy(col("epoch").cast("long").as("epoch"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          expr("CAST(sum(doc_id * p) % 2147483647 AS BIGINT)")
            .as("order_checksum"),
          concat_ws(",",
            max(when(col("p") === 1, col("doc_id"))).cast("string"),
            max(when(col("p") === 2, col("doc_id"))).cast("string"),
            max(when(col("p") === 3, col("doc_id"))).cast("string"))
            .as("first3"))
        .orderBy(col("epoch"), col("shard"))
    },

    // --- dedup cascade retention funnel -----------------------------------
    // Production dedup is a CASCADE — cheap exact stages first, each
    // stage fed the previous stage's survivors — and the number that
    // justifies each stage is the retention funnel this query reports:
    // stage 0 (raw corpus) → 1 (exact full-text, md5 key) → 2
    // (normalized text: lowercased, non-alphanumerics stripped — the
    // casing/punctuation near-miss class) → 3 (80-char normalized
    // prefix — the boilerplate-template class). Keep-first (min doc_id)
    // per key at every stage; every stage is a hash groupBy on a
    // computed key + a semi-join back — no pairwise comparison
    // anywhere, so the cascade scales like the exact-dedup family, and
    // the funnel's char retention says how much the EXPENSIVE near-dup
    // stage downstream still has to look at.
    Q(
      "pipe_dedup_cascade",
      """WITH d0 AS (SELECT doc_id, text, n_chars FROM documents),
        |k1 AS (SELECT MIN(doc_id) AS doc_id FROM d0 GROUP BY md5(text)),
        |s1 AS (SELECT d0.* FROM d0 JOIN k1 USING (doc_id)),
        |n2 AS (SELECT doc_id,
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS norm,
        |    n_chars
        |  FROM s1),
        |k2 AS (SELECT MIN(doc_id) AS doc_id FROM n2 GROUP BY md5(norm)),
        |s2 AS (SELECT n2.* FROM n2 JOIN k2 USING (doc_id)),
        |k3 AS (SELECT MIN(doc_id) AS doc_id FROM s2
        |       GROUP BY substring(norm, 1, 80)),
        |s3 AS (SELECT s2.* FROM s2 JOIN k3 USING (doc_id)),
        |f AS (SELECT 0 AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |      CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM d0
        |    UNION ALL SELECT 1, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
        |      FROM s1
        |    UNION ALL SELECT 2, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
        |      FROM s2
        |    UNION ALL SELECT 3, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
        |      FROM s3)
        |SELECT CAST(stage AS BIGINT) AS stage,
        |  CAST(n_docs AS BIGINT) AS n_docs, n_chars,
        |  CAST(n_chars * 1000000 // (SELECT n_chars FROM f WHERE stage = 0)
        |    AS BIGINT) AS retained_ppm
        |FROM f ORDER BY stage""".stripMargin
    ) { (s, d) =>
      // each stage is CHECKPOINTED before feeding the next — the
      // production staging discipline (write survivors per stage):
      // without it every stage re-derives from the raw parquet through
      // the whole upstream lineage (measured: 16 scans of documents in
      // the final plan), and at 100 TB that's 16 corpus reads for a
      // 3-stage cascade
      val d0 = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("n_chars"))
        .localCheckpoint()
      def keepFirst(df: org.apache.spark.sql.DataFrame,
          key: org.apache.spark.sql.Column) = {
        val k = df.groupBy(key.as("k"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        df.join(k, "doc_id").localCheckpoint()
      }
      val s1 = keepFirst(d0, md5(col("text")))
      val n2 = s1.select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("norm"),
        col("n_chars"))
      val s2 = keepFirst(n2, md5(col("norm")))
      val s3 = keepFirst(s2, substring(col("norm"), 1, 80))
      def stageRow(df: org.apache.spark.sql.DataFrame, stage: Int) =
        df.agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars"))
          .select(lit(stage.toLong).as("stage"), col("n_docs"),
            col("n_chars"))
      val f = stageRow(d0, 0).unionByName(stageRow(s1, 1))
        .unionByName(stageRow(s2, 2)).unionByName(stageRow(s3, 3))
      val total = stageRow(d0, 0)
        .select(col("n_chars").as("total_chars"))
      f.crossJoin(broadcast(total))
        .select(col("stage"), col("n_docs"), col("n_chars"),
          expr("CAST(n_chars * 1000000 div total_chars AS BIGINT)")
            .as("retained_ppm"))
        .orderBy(col("stage"))
    }
  )
}
