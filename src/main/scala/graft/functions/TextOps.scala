package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale corpus processing, all
  * expressed with codegen'd built-in / higher-order functions (no Scala
  * UDFs → whole-stage codegen keeps the hot path fused; SURVEY §4).
  *
  * These power the training-data-pipeline operators: tokenization,
  * shingling, MinHash signatures + LSH banding, Jaccard, quality
  * metrics, language-ID.
  */
object TextOps {

  /** Whitespace tokenization (documents.text is single-space word soup). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: letter runs, digit runs, or single
    * non-space symbols — the classic pre-tokenizer split. The character
    * class excludes the literal space (not `\s`) so Spark and the DuckDB
    * oracle tokenize identically. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Word n-gram shingles. Docs shorter than n collapse to one shingle
    * (whole doc) so every doc has a non-empty shingle set. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Sorted distinct shingle SET — what MinHash/Jaccard actually consume.
    * Native kernel ([[SortedShingles]]): the compositional
    * `array_sort(array_distinct(shingles(...)))` evaluates interpreted
    * per element and dominated the dedup queries (2.0 s of 2.4 s at
    * sf0.1). Spec-asserted equal to the compositional form. */
  def sortedShingleSet(toks: Column, n: Int): Column =
    TextKernels.sorted_shingles(toks, n)

  /** MinHash signature: k permutations approximated by seeded hash
    * draws; signature element i = min hash under family member i. One
    * compiled pass over the shingle array per row, no shuffle — the
    * classic MinHash estimator (Broder 1997) via the native
    * [[MinHashSig]] kernel (the equivalent `transform`+`array_min`
    * formulation evaluates interpreted and costs k passes). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    TextKernels.minhash_sig(shingleCol, k)

  /** LSH banding: hash r consecutive signature slots per band. Two docs
    * collide in band j iff their signature slice j matches exactly →
    * P[collide] = jaccard^r per band. Returns array of (band, bandHash)
    * structs ready to explode + shuffle-join on — this is what turns the
    * O(n²) all-pairs problem into a bucket join at 100 TB. */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      struct(
        lit(j).as("band"),
        xxhash64(slice(signature, j * rowsPerBand + 1, rowsPerBand))
          .as("band_hash"))
    }: _*)

  /** Exact Jaccard similarity of two arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Estimated Jaccard from two equal-length MinHash signatures:
    * fraction of agreeing slots. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA)

  /** SimHash 64-bit fingerprint (custom Catalyst expression). */
  def simhash(toks: Column): Column = SimHashImpl.simhash(toks)

  /** Hamming distance between two 64-bit fingerprints — built-ins only,
    * stays in codegen. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Top-25 English stopwords (public list) — enough signal for ratio
    * features and the language-ID heuristic. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
    "from", "but", "not", "have")

  /** Count of tokens that appear in `words` (occurrences, not distinct).
    * Native kernel ([[TokensInSet]]): the compositional
    * `size(filter(toks, array_contains(lit(words), _)))` evaluates the
    * lambda interpreted per token with a linear probe of the literal
    * array — measured ~2× on text_langid at sf0.1. Spec-asserted equal
    * to the compositional form (TextKernelsSpec). */
  def occurrencesIn(toks: Column, words: Seq[String]): Column =
    TextKernels.tokens_in_set(toks, words)

  /** Quality features à la corpus-filtering pipelines: lengths, lexical
    * diversity, stopword density, mean token length. */
  def qualityFeatures(text: Column): Column = {
    val toks = tokens(text)
    struct(
      length(text).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      (size(array_distinct(toks)).cast("double") / size(toks))
        .as("distinct_ratio"),
      ((length(text) - size(toks) + 1).cast("double") / size(toks))
        .as("avg_token_len"),
      (occurrencesIn(toks, EnglishStopwords).cast("double") / size(toks))
        .as("stopword_ratio"))
  }

  /** Tiny per-language stopword profiles (public wordlists) for the
    * n-gram/stopword language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> EnglishStopwords,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "por",
      "con", "los", "las", "del", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "des", "les", "du",
      "en", "est", "que", "pour", "dans", "au"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "zu", "von",
      "mit", "ist", "den", "im", "für", "auf", "nicht"))

  /** Language-ID heuristic: argmax over per-language stopword hit rates.
    * Returns struct(lang, score). Scales as a single narrow projection —
    * no shuffle, no UDF. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = LangProfiles.map { case (lang, words) =>
      struct(
        (occurrencesIn(toks, words).cast("double") / size(toks)).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct sorts lexicographically: (score, lang) — ties
    // break on lang name, deterministic.
    array_max(array(scored: _*))
  }

  /** Low 60 bits of MD5(s) read little-endian — the cross-engine uniform
    * hash for sketch operators (KMV distinct, deterministic sampling).
    *
    * Equals DuckDB's `md5_number_upper(s) % 2^60`: that function takes
    * the first 8 MD5 bytes little-endian as a UBIGINT; reassembling the
    * same bytes from Spark's `md5` hex string (byte i lives at hex
    * position 2i−1) and dropping the top nibble keeps the value under
    * 2^60, so signed/unsigned never diverges and BIGINT holds it in both
    * engines. Pure built-ins (md5/substring/concat/conv) → stays inside
    * whole-stage codegen; [[SimHashImpl.tokenHash]] is the JVM-kernel
    * sibling of the same byte order. */
  def md5Low60(s: Column): Column = {
    val hex = md5(s)
    val le = concat((15 to 1 by -2).map(i => substring(hex, i, 2)): _*)
    conv(substring(le, 2, 15), 16, 10).cast("long")
  }

  /** DuckDB expression equal to [[md5Low60]] over SQL fragment `s`. */
  def md5Low60Sql(s: String): String =
    s"CAST(md5_number_upper($s) % 1152921504606846976 AS BIGINT)"
}
