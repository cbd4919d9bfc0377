package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps
import graft.operators.KMeans

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

  /** Round-robin the embeddings over the session's parallelism before
    * a CPU-dense derivation. The corpus is byte-small (one parquet
    * split even at the bench tier), so Spark's size-based splitting
    * hands the WHOLE encode/ADC/moment stage to one task — profiled at
    * sf0.1, emb_knn_pq spent 3.3 s of its 4.8 s in a single-task stage
    * while 31 cores idled (guide §2.5: repartition after the read when
    * the input layout, not the data volume, bounds parallelism). The
    * count is environment-derived; results are row-wise deterministic,
    * so placement cannot change any value. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Oracle-SQL fragments that replay the [[VectorOps]] kernels in
    * DuckDB with IDENTICAL IEEE arithmetic: products of float pairs in
    * double, summed sequentially left-to-right (list_sum), cosine as
    * dot / (√·√) in the same operation order — so the doubles are
    * bit-identical and survive the driver's value hash. The LSH planes
    * are serialized as float literals (exact shortest-round-trip reprs),
    * making bucket assignment itself cross-engine reproducible. */
  private[queries] object Sql {
    def floatList(p: Array[Float]): String =
      p.map(_.toDouble.toString).mkString("CAST([", ",", "] AS FLOAT[])")

    def dot(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), " +
        s"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

    def cos(a: String, b: String): String =
      s"(${dot(a, b)} / (SQRT(${dot(a, a)}) * SQRT(${dot(b, b)})))"

    def bucket(vec: String, planes: Array[Array[Float]]): String =
      planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN ${dot(vec, floatList(p))} >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")

    /** Squared L2 between a float[] and a double[] — subtraction/square
      * per slot in double, sequential sum (same fold as the Spark side's
      * zip_with + aggregate). */
    def l2sq(fvec: String, dvec: String): String =
      s"list_sum(list_transform(list_zip($fvec, $dvec), " +
        s"x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2])))"
  }

  /** Engine side of `dedup_embedding_cosine`, parameterized by bucket
    * width so CosineWidthSpec can pin the ladder's recall/occupancy
    * contract directly: bucket at `nbits`, self-join within buckets,
    * exact-cosine verify at `threshold`. (Threshold 0.4 is calibrated
    * to the synthetic corpus — random gaussians max out ≈0.5; a real
    * near-dup corpus would use ≥0.95.) */
  private[graft] def cosineNearDupPairs(embT: DataFrame, nbits: Int,
      threshold: Double = 0.4): DataFrame = {
    val emb = embT.withColumn("bucket",
      VectorOps.lshBucket(col("embedding"), Dim, nbits))
    val a = emb.select(col("bucket"), col("vec_id").as("a_id"),
      col("embedding").as("a_vec"))
    val b = emb.select(col("bucket").as("b_bucket"),
      col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    a.join(b, col("bucket") === col("b_bucket")
        && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(VectorOps.cosine(col("a_vec"), col("b_vec")), 6).as("cos"))
      .where(col("cos") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Shared k-means oracle replay, matching [[KMeans.fit]] +
    * [[KMeans.nearestExpr]] bit-for-bit: CTEs `c0..c<iters>` (centroid
    * tables per Lloyd iteration — md5-hash seeds, 2⁵²-exact means) and
    * `af` (final assignment with the winning distance `d`). One source
    * of truth for every query that trains a quantizer.
    *
    * `src` names the CTE/table holding (vec_id, embedding) — product
    * quantization trains one codebook per SLICED subspace, so it passes
    * a sliced CTE; `p` prefixes every generated CTE name so several
    * trainings coexist in one WITH clause (`s1c0`, `s1af`, ...). */
  private def kmeansCtes(k: Int, iters: Int,
      src: String = "embeddings", p: String = ""): String = {
    val scale = "4503599627370496" // 2^52
    val seedCte =
      s"""${p}c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS cid,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
         |  FROM (SELECT vec_id, embedding,
         |          ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |        FROM $src ORDER BY h, vec_id LIMIT $k))""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""${p}a$i AS (SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${Sql.l2sq("e.embedding", "c.cvec")}, c.cid) AS rn
         |    FROM $src e CROSS JOIN ${p}c${i - 1} c) WHERE rn = 1),
         |${p}m$i AS (SELECT cid, pos,
         |    CAST(SUM(CAST(CAST(v AS DOUBLE) * $scale AS DECIMAL(38,0))) AS DOUBLE)
         |      / $scale / COUNT(*) AS comp
         |  FROM (SELECT cid, unnest(embedding) AS v,
         |          generate_subscripts(embedding, 1) AS pos FROM ${p}a$i)
         |  GROUP BY cid, pos),
         |${p}c$i AS (SELECT cid, list(comp ORDER BY pos) AS cvec
         |        FROM ${p}m$i GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    val af =
      s"""${p}af AS (SELECT vec_id, embedding, cid, d FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |      ${Sql.l2sq("e.embedding", "c.cvec")} AS d,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${Sql.l2sq("e.embedding", "c.cvec")}, c.cid) AS rn
         |    FROM $src e CROSS JOIN ${p}c$iters c) WHERE rn = 1)"""
        .stripMargin
    s"$seedCte,\n$iterCtes,\n$af"
  }

  /** Package-visible alias so sibling modules (pipe_doc_topics) can
    * replay the shared k-means training in their oracles. */
  private[queries] def kmeansOracleCtes(k: Int, iters: Int): String =
    kmeansCtes(k, iters)

  /** Product-quantization geometry shared by `emb_pq_codes` /
    * `emb_knn_pq` and their oracles: 64 dims → 8 contiguous subspaces of
    * 8, one k=32 codebook per subspace (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011). 8 codes
    * (5 bits each = 40 bits) per vector vs 256 embedding bytes ≈ 51×
    * compression. r4 raised (M, k) from (4, 16) after emb_recall_at_k
    * put that geometry's recall@5 at 0.12 — more/finer subspace
    * codebooks are the PQ recall knobs that leave the serving plan
    * (narrow ADC map over codes, no join) unchanged; all the SQL/code
    * below is generated from these four constants. */
  private val PqM = 8
  private val PqSubDim = Dim / PqM
  private val PqK = 32
  private val PqIters = 2

  /** The 4 sliced-subspace CTEs + 4 per-subspace k-means trainings.
    * Subspace s trains over `embedding[lo:hi]` (DuckDB list slices are
    * 1-based inclusive) under CTE prefix `s<s>` → codebook `s<s>c2`,
    * final assignment `s<s>af`. */
  private def pqCtes: String =
    (1 to PqM).map { s =>
      val lo = (s - 1) * PqSubDim + 1
      val hi = s * PqSubDim
      s"""sub$s AS (SELECT vec_id, embedding[$lo:$hi] AS embedding
         |          FROM embeddings),
         |${kmeansCtes(PqK, PqIters, src = s"sub$s", p = s"s$s")}"""
        .stripMargin
    }.mkString(",\n")

  /** Engine-side PQ training: the M per-subspace k-means fits FUSED
    * into one corpus scan + one aggregate per Lloyd iteration
    * ([[KMeans.fitMulti]] — bit-identical to M separate fits, spec-
    * proven). Driver state is PqM × PqK × PqSubDim doubles — bounded,
    * broadcast-sized, exactly what a FAISS-style trainer would hold. */
  private def pqFit(emb: DataFrame): Seq[Seq[KMeans.Centroid]] =
    KMeans.fitMulti(emb, m = PqM, subDim = PqSubDim, k = PqK,
      iters = PqIters)

  /** The four index builds, parameterized by the corpus frame: the Q
    * entries below pass the plain loader, while `emb_recall_at_k`
    * ([[RecallQueries]]) passes ONE persisted corpus so the ground
    * truth + three index builds (and their k-means trainings) share a
    * single scan instead of four full re-reads. */
  def knnBrute(emb: DataFrame): DataFrame = {
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
  }

  def knnLsh(emb0: DataFrame): DataFrame = {
    val emb = emb0.withColumn("t",
      explode(VectorOps.lshTables(col("embedding"), Dim,
        nBits = 6, nTables = 16)))
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
  }

  /** The IVF pipeline split into its production halves: BUILD commits
    * the trained index as a snapshot table (one immutable dir per cell,
    * per-file `cell` min/max stats in the manifest), SERVE answers from
    * the STORED index reading only the probed cells — manifest pruning
    * skips every other cell's files at planning time, so the serve scan
    * is O(probed lists), never O(corpus). The inline `knnIvf` path
    * fuses both halves into one plan for the oracle's sake; this one is
    * the shape a 100 TB vector store actually runs: train/assign once,
    * commit, then every query session reads lists straight off the
    * manifest (rebuild only on index refresh, exactly like the HLL /
    * t-digest store-sketches-serve-later rollups).
    * Same result as [[knnIvf]] by construction — both share IvfOracle. */
  def knnIvfPersisted(s: SparkSession, d: String, table: String)
      : DataFrame = {
    val emb = Tables.embeddings(s, d)
    // clean slate so version numbers are deterministic per run
    val p = new org.apache.hadoop.fs.Path(table)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    // BUILD half
    val cents = KMeans.fit(emb, k = 8, iters = 3)
    val assigned = emb
      .withColumn("cid", KMeans.assignExpr(col("embedding"), cents))
      .withColumn("cell", col("cid")) // partition value also as DATA, for stats
    graft.io.Snapshots.commitFull(assigned, table, "cid",
      statsCols = Seq("cell"))
    ivfServe(s, emb, cents, table)
  }

  /** SERVE half of the persisted-IVF pipeline: probe nprobe=4 nearest
    * centroids per query, read ONLY the probed cells off the snapshot
    * manifest (one stats-pruned read per cell), exact-rerank, top-3.
    * `deletes`, when given, is the merge-on-read tombstone set: its ids
    * are anti-joined out of the probed lists BEFORE rerank (broadcast —
    * a delete batch is small by nature; compaction via
    * [[graft.io.Snapshots.deleteRows]] rewrites the affected cells and
    * retires the tombstones, IvfDeleteSpec proves the two shapes answer
    * identically). */
  private[queries] def ivfServe(s: SparkSession, emb: DataFrame,
      cents: Seq[KMeans.Centroid], table: String,
      deletes: Option[DataFrame] = None): DataFrame = {
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val probeEntries = array_sort(array(cents.map(c =>
      struct(
        graft.functions.VectorOps.l2sq(col("q_vec"),
          array(c.cvec.map(lit): _*)).as("d"),
        lit(c.cid).as("cid"))): _*))
    val probe = queries
      .select(col("q_id"), col("q_vec"),
        explode(slice(probeEntries, 1, 4)).as("pc"))
      .select(col("q_id"), col("q_vec"), col("pc.cid").as("probe_cid"))
    // bounded driver list: ≤ k distinct probed cells
    val probedCells = probe.select(col("probe_cid")).distinct()
      .collect().map(_.getInt(0)).sorted
    val stored = probedCells.map(c =>
        graft.io.Snapshots.readRange(s, table, "cell",
          c.toString, c.toString))
      .reduce(_.unionByName(_))
    val index = deletes.fold(stored)(dl =>
      stored.join(broadcast(dl.select(col("vec_id"))), Seq("vec_id"),
        "left_anti"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    index.join(broadcast(probe),
        col("cell") === col("probe_cid") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
          .as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 3)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Incremental index maintenance: train on the BASE half only, commit,
    * then assign the arriving DELTA with the STORED centroids (no
    * retrain) and commitAppend its cells — the index stays fresh for the
    * cost of assigning new rows, the retrain is deferred to an index
    * refresh. Serving is oblivious to the generation split: the manifest
    * union of both commits IS the index. The oracle trains k-means on
    * the base subset and assigns everything with those centroids, so a
    * hash match proves the no-retrain append changed nothing about the
    * answer's semantics. */
  def knnIvfAppended(s: SparkSession, d: String, table: String)
      : DataFrame = {
    val emb = Tables.embeddings(s, d)
    val p = new org.apache.hadoop.fs.Path(table)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    val base = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val delta = emb.where(pmod(col("vec_id"), lit(2)) =!= 0)
    val cents = KMeans.fit(base, k = 8, iters = 3)
    def assign(df: DataFrame): DataFrame = df
      .withColumn("cid", KMeans.assignExpr(col("embedding"), cents))
      .withColumn("cell", col("cid"))
    graft.io.Snapshots.commitFull(assign(base), table, "cid",
      statsCols = Seq("cell"))
    graft.io.Snapshots.commitAppend(assign(delta), table, "cid",
      statsCols = Seq("cell"))
    ivfServe(s, emb, cents, table)
  }

  /** Vector DELETES in the persisted store (GDPR erasure, dedup
    * retractions): the delete batch commits as a TOMBSTONE table — a
    * tiny sibling snapshot of ids, O(batch) to write, no index file
    * touched — and serving filters tombstoned ids inside the probed
    * cells (merge-on-read). Centroids never retrain on delete: cell
    * geometry is unchanged, so recall over the survivors is exactly
    * the recall a survivor-only serve would have (the oracle proves it
    * by excluding the ids from the candidate set of the FULL-corpus
    * training replay). `compact = true` runs the reclaim half instead:
    * [[graft.io.Snapshots.deleteRows]] rewrites the affected cells
    * copy-on-write and serving drops the tombstone filter —
    * IvfDeleteSpec proves both shapes answer identically and that the
    * compacted store physically holds no deleted row. */
  def knnIvfDeleted(s: SparkSession, d: String, table: String,
      compact: Boolean = false): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val p = new org.apache.hadoop.fs.Path(table)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    val tomb = s"${table}_tomb"
    val pt = new org.apache.hadoop.fs.Path(tomb)
    pt.getFileSystem(s.sparkContext.hadoopConfiguration).delete(pt, true)
    val cents = KMeans.fit(emb, k = 8, iters = 3)
    val assigned = emb
      .withColumn("cid", KMeans.assignExpr(col("embedding"), cents))
      .withColumn("cell", col("cid"))
    graft.io.Snapshots.commitFull(assigned, table, "cid",
      statsCols = Seq("cell"))
    graft.io.Snapshots.commitFull(
      emb.where(expr(DeletePred)).select(col("vec_id"))
        .withColumn("db", lit(0)),
      tomb, "db")
    val tombIds = graft.io.Snapshots.read(s, tomb)
    if (compact) {
      graft.io.Snapshots.deleteRows(s, table, "cid", "vec_id", tombIds,
        statsCols = Seq("cell"))
      ivfServe(s, emb, cents, table)
    } else ivfServe(s, emb, cents, table, deletes = Some(tombIds))
  }

  def knnIvf(emb: DataFrame): DataFrame = {
    // train the coarse quantizer (bounded driver state: k × dim doubles)
    val cents = KMeans.fit(emb, k = 8, iters = 3)
    // inverted lists: narrow assignment, no join
    val assigned = emb.withColumn("cid",
      KMeans.assignExpr(col("embedding"), cents))
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // probe: nprobe=4 nearest centroids (of k=8; r4 raised 2→4 after
    // emb_recall_at_k put nprobe=2 recall@3 at 0.47 — recall tracks
    // the probed corpus fraction) — array_sort of (d, cid) structs,
    // lexicographic = (distance, id tie-break); per-row expression,
    // no window, no shuffle
    val probeEntries = array_sort(array(cents.map(c =>
      struct(
        graft.functions.VectorOps.l2sq(col("q_vec"),
          array(c.cvec.map(lit): _*)).as("d"),
        lit(c.cid).as("cid"))): _*))
    val probe = queries
      .select(col("q_id"), col("q_vec"),
        explode(slice(probeEntries, 1, 4)).as("pc"))
      .select(col("q_id"), col("q_vec"), col("pc.cid").as("probe_cid"))
    // exact rerank within the probed lists only
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probe), col("cid") === col("probe_cid")
        && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.cosine(col("q_vec"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 3)
      .orderBy(col("q_id"), col("rank"))
  }

  def knnPq(emb: DataFrame): DataFrame = {
    val books = pqFit(emb)
    // codes/ADC are the CPU-dense half — spread them off the single scan split
    knnPqServe(emb, pqCodes(spread(emb), books), books)
  }

  // ---- build-once artifacts ([[RecallQueries]]'s per-tier stores) ------
  // Each serve consumes a PERSISTED index artifact and is candidate-
  // identical to its inline sibling (RecallStoreSpec pins equality):
  // the artifacts are pure deterministic functions of the corpus — the
  // same property that lets the DuckDB oracle replay the trainings.

  /** PQ codebooks — the training half of [[knnPq]]. */
  private[queries] def pqBooks(emb: DataFrame): Seq[Seq[KMeans.Centroid]] =
    pqFit(emb)

  /** PQ code assignment under given codebooks — the encode half. */
  private[queries] def pqCodes(emb: DataFrame,
      books: Seq[Seq[KMeans.Centroid]]): DataFrame =
    emb.select(
      col("vec_id") +: books.zipWithIndex.map { case (cents, i) =>
        KMeans.assignExpr(
          slice(col("embedding"), i * PqSubDim + 1, PqSubDim), cents)
          .as(s"c${i + 1}")
      }: _*)

  /** ADC serve over (possibly stored) PQ codes. */
  private[queries] def knnPqServe(emb: DataFrame, codes: DataFrame,
      books: Seq[Seq[KMeans.Centroid]]): DataFrame = {
    // per-query ADC lookup tables: cid → exact sub-distance
    val dtabs = books.zipWithIndex.map { case (cents, i) =>
      map(cents.flatMap(c => Seq(
        lit(c.cid),
        VectorOps.l2sq(
          slice(col("q_vec"), i * PqSubDim + 1, PqSubDim),
          array(c.cvec.map(lit): _*)))): _*).as(s"dt${i + 1}")
    }
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .select(col("q_id") +: dtabs: _*)
    val adc = (1 to PqM)
      .map(i => element_at(col(s"dt$i"), col(s"c$i")))
      .reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc"), col("vec_id"))
    codes.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adc.as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"),
        round(col("adc"), 6).as("adc"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The LSH hash-table assignment — [[knnLsh]]'s index artifact. */
  private[queries] def lshBuckets(emb: DataFrame): DataFrame =
    emb.withColumn("t",
      explode(VectorOps.lshTables(col("embedding"), Dim,
        nBits = 6, nTables = 16)))
      .select(col("vec_id"), col("t"))

  /** Serve top-3 from stored LSH buckets: hash the 10 query vectors
    * fresh (trivial), collect bucket collisions as narrow id pairs,
    * re-attach vectors, exact-rerank — the same candidate set as
    * [[knnLsh]] (pairs sharing ≥1 table) without re-hashing the
    * corpus. */
  private[queries] def knnLshServe(emb: DataFrame, buckets: DataFrame)
      : DataFrame = {
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val qb = queries.withColumn("q_t",
      explode(VectorOps.lshTables(col("q_vec"), Dim,
        nBits = 6, nTables = 16)))
      .select(col("q_id"), col("q_t"))
    val cand = buckets.join(broadcast(qb),
        col("t") === col("q_t") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .orderBy(col("q_id"), col("rank"))
  }

  /** The IVF coarse quantizer — [[knnIvf]]'s training half. */
  private[queries] def ivfFit(emb: DataFrame): Seq[KMeans.Centroid] =
    KMeans.fit(emb, k = 8, iters = 3)

  /** IVF and PQ composed (FAISS IVFPQ serving shape, no residual
    * encoding): the coarse quantizer restricts candidates to the probed
    * inverted lists, and WITHIN those lists candidates are scored by ADC
    * over their PQ codes — after indexing, serving touches only
    * `(cell, codes)` rows, never the float embeddings. The two
    * compressions compose independently: nprobe/k_coarse bounds the
    * fraction of the corpus scanned, the 40-bit codes bound the bytes
    * per scanned candidate — at 100 TB that is the difference between
    * reading 256 B × corpus and 5 B × corpus/2. Candidate generation is
    * [[knnIvf]]'s broadcast centroid probe; scoring is [[knnPq]]'s
    * per-query lookup tables (m map lookups + m−1 adds per candidate),
    * both unchanged, so the oracle composes their replays verbatim. */
  def knnIvfPq(emb: DataFrame): DataFrame = {
    val coarse = KMeans.fit(emb, k = 8, iters = 3)
    val books = pqFit(emb)
    // the stored index: one narrow projection — cell id + m code ids
    // (spread first: the assignment + ADC probe stage is CPU-dense)
    val indexed = spread(emb).select(
        col("vec_id"),
        KMeans.assignExpr(col("embedding"), coarse).as("cid"),
        KMeans.nearestAllExpr(col("embedding"), PqSubDim, books).as("pq"))
      .select(col("vec_id") +: col("cid") +:
        (1 to PqM).map(i =>
          element_at(col("pq"), i).getField("cid").as(s"c$i")): _*)
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val probeEntries = array_sort(array(coarse.map(c =>
      struct(
        VectorOps.l2sq(col("q_vec"), array(c.cvec.map(lit): _*)).as("d"),
        lit(c.cid).as("cid"))): _*))
    val dtabs = books.zipWithIndex.map { case (cents, i) =>
      map(cents.flatMap(c => Seq(
        lit(c.cid),
        VectorOps.l2sq(
          slice(col("q_vec"), i * PqSubDim + 1, PqSubDim),
          array(c.cvec.map(lit): _*)))): _*).as(s"dt${i + 1}")
    }
    // broadcast side: 10 queries × nprobe=4 probed cells, each row
    // carrying its ADC tables (k·m sub-distances per query)
    val probe = queries
      .select(col("q_id"), col("q_vec"),
        explode(slice(probeEntries, 1, 4)).as("pc"))
      .select(col("q_id") +: col("pc.cid").as("probe_cid") +: dtabs: _*)
    val adc = (1 to PqM)
      .map(i => element_at(col(s"dt$i"), col(s"c$i")))
      .reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc"), col("vec_id"))
    indexed.join(broadcast(probe),
        col("cid") === col("probe_cid") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adc.as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"),
        round(col("adc"), 6).as("adc"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Two-stage serve (the production pattern FAISS calls refine): the
    * PQ/ADC pass produces a cheap top-20 SHORTLIST over codes only,
    * then the exact cosine runs on just those 20 candidates per query —
    * full-precision quality at ~shortlist/corpus of the exact cost. The
    * refine join touches O(queries × shortlist) embedding rows, so at
    * 100 TB the floats are read for 200 rows, not the corpus. */
  def knnRefine(emb: DataFrame): DataFrame = {
    val books = pqFit(emb)
    val codes = spread(emb).select(
      col("vec_id") +: books.zipWithIndex.map { case (cents, i) =>
        KMeans.assignExpr(
          slice(col("embedding"), i * PqSubDim + 1, PqSubDim), cents)
          .as(s"c${i + 1}")
      }: _*)
    val dtabs = books.zipWithIndex.map { case (cents, i) =>
      map(cents.flatMap(c => Seq(
        lit(c.cid),
        VectorOps.l2sq(
          slice(col("q_vec"), i * PqSubDim + 1, PqSubDim),
          array(c.cvec.map(lit): _*)))): _*).as(s"dt${i + 1}")
    }
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val qtab = queries.select(col("q_id") +: dtabs: _*)
    val adc = (1 to PqM)
      .map(i => element_at(col(s"dt$i"), col(s"c$i")))
      .reduceLeft(_ + _)
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc"), col("vec_id"))
    val shortlist = codes.join(broadcast(qtab),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), adc.as("adc"))
      .withColumn("srank", row_number().over(wAdc))
      .where(col("srank") <= 20)
      .select(col("q_id"), col("vec_id"))
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
          .as("cos"))
      .withColumn("rank", row_number().over(wCos))
      .where(col("rank") <= 5)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Shared oracle of the IVF pipeline (train + probe + rerank): used
    * verbatim by emb_knn_ivf (inline build) and emb_ivf_persist (the
    * same result served from a committed snapshot index table — the
    * storage layer must be invisible to the answer). */
  /** The IVF serve oracle, with an optional extra candidate predicate
    * (emb_ivf_delete excludes the tombstoned ids here — centroids still
    * train on the FULL corpus, the no-retrain-on-delete contract). */
  private def ivfOracleSql(candFilter: String): String = {
    val iters = 3
    s"""WITH ${kmeansCtes(k = 8, iters = iters)},
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec
       |      FROM embeddings WHERE vec_id < 10),
       |qd AS (SELECT q_id, cid, ${Sql.l2sq("q_vec", "cvec")} AS d
       |       FROM q CROSS JOIN c$iters),
       |probe AS (SELECT q_id, cid FROM (
       |    SELECT q_id, cid,
       |      row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS pr
       |    FROM qd) WHERE pr <= 4),
       |cand AS (SELECT p.q_id, a.vec_id, a.embedding
       |         FROM af a JOIN probe p ON a.cid = p.cid
       |         WHERE a.vec_id <> p.q_id$candFilter),
       |s AS (SELECT cand.q_id, cand.vec_id,
       |        ROUND(${Sql.cos("q.q_vec", "cand.embedding")}, 6) AS cos
       |      FROM cand JOIN q ON q.q_id = cand.q_id)
       |SELECT q_id, vec_id, cos,
       |  CAST(row_number() OVER (PARTITION BY q_id
       |         ORDER BY cos DESC, vec_id) AS INT) AS rank
       |FROM s
       |QUALIFY rank <= 3
       |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  private lazy val IvfOracle: String = ivfOracleSql("")

  /** The delete batch emb_ivf_delete uses — one predicate, engine and
    * oracle forms kept side by side (queries vec_id < 10 stay alive so
    * the result keys are stable). */
  private val DeletePred = "vec_id % 7 = 3 AND vec_id >= 10"

  private lazy val IvfDeleteOracle: String = ivfOracleSql(
    " AND NOT (a.vec_id % 7 = 3 AND a.vec_id >= 10)")

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

    // --- brute-force cosine top-k (baseline) -----------------------------
    // query set: vec_id < 10 (broadcast side); corpus scanned once.
    // Oracle replays the exact cosine fold + (cos DESC, vec_id) ranking.
    Q(
      "emb_knn_brute",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
         |           FROM embeddings WHERE vec_id < 10),
         |s AS (SELECT q_id, vec_id,
         |        ROUND(${Sql.cos("q_vec", "embedding")}, 6) AS cos
         |      FROM embeddings CROSS JOIN q WHERE vec_id <> q_id)
         |SELECT q_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id
         |         ORDER BY cos DESC, vec_id) AS INT) AS rank
         |FROM s
         |QUALIFY rank <= 5
         |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
    ) { (s, d) => knnBrute(Tables.embeddings(s, d)) },

    // --- LSH-bucketed ANN (scale path) -----------------------------------
    // multi-table random-hyperplane keys (6 bits × 16 tables): candidates
    // share ANY table's bucket with the query; top-3 by exact cosine over
    // the deduped candidate set. Bits tune bucket size (corpus/2^bits per
    // table), tables tune recall — the two independent knobs at scale
    // (r4 doubled tables 8→16 after emb_recall_at_k put 8-table recall@3
    // at 0.33; more tables is the knob that preserves bucket size).
    // Oracle rebuilds all 16 bucket keys from the serialized planes.
    Q(
      "emb_knn_lsh", {
        val tables = (0 until 16).map { t =>
          val planes = VectorOps.hyperplanes(Dim, 6, 7L + 1000L * t)
          s"struct_pack(tbl := $t, bucket := ${Sql.bucket("embedding", planes)})"
        }.mkString(",\n    ")
        s"""WITH b AS (SELECT vec_id, embedding, unnest([
           |    $tables]) AS tb
           |  FROM embeddings),
           |x AS (SELECT vec_id, embedding, tb.tbl AS tbl, tb.bucket AS bucket
           |      FROM b),
           |q AS (SELECT vec_id AS q_id, tbl, bucket FROM x WHERE vec_id < 10),
           |cand AS (SELECT DISTINCT q.q_id, c.vec_id
           |         FROM x c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket
           |           AND c.vec_id <> q.q_id),
           |s AS (SELECT cand.q_id, cand.vec_id,
           |        ROUND(${Sql.cos("qe.embedding", "ce.embedding")}, 6) AS cos
           |      FROM cand
           |        JOIN embeddings qe ON qe.vec_id = cand.q_id
           |        JOIN embeddings ce ON ce.vec_id = cand.vec_id)
           |SELECT q_id, vec_id, cos,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |         ORDER BY cos DESC, vec_id) AS INT) AS rank
           |FROM s
           |QUALIFY rank <= 3
           |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
      }
    ) { (s, d) => knnLsh(Tables.embeddings(s, d)) },

    // --- multi-probe LSH ANN (one table, Hamming-1 probes) ----------------
    // Lv et al. (VLDB'07): instead of OR-amplifying recall with 16
    // index TABLES (emb_knn_lsh — 16× index footprint), keep ONE 8-bit
    // sign-LSH table and probe the query's bucket plus its 8 Hamming-1
    // neighbors — the buckets a near-neighbor most likely fell into
    // when one hyperplane's sign flipped. 9 probe keys × equi-join on
    // the bucket column = same join shape as single-table LSH with 9×
    // the PROBE cost and 1× the INDEX cost — the trade a 100 TB vector
    // store makes when the index dominates storage (probes explode on
    // the tiny query side; the corpus is scanned/bucketed once). Exact
    // cosine rerank of the deduped candidate union, same contract as
    // the other ANN entries.
    Q(
      "emb_knn_lsh_multiprobe", {
        val planes = VectorOps.hyperplanes(Dim, 8, 7L)
        val probes = (0 until 8)
          .map(i => s"xor(bucket, ${1L << i})")
          .mkString("[bucket, ", ", ", "]")
        s"""WITH e AS (SELECT vec_id, embedding,
           |    ${Sql.bucket("embedding", planes)} AS bucket
           |  FROM embeddings),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec,
           |    unnest($probes) AS probe
           |  FROM e WHERE vec_id < 10),
           |cand AS (SELECT DISTINCT q.q_id, c.vec_id
           |  FROM e c JOIN q ON c.bucket = q.probe
           |    AND c.vec_id <> q.q_id),
           |s AS (SELECT cand.q_id, cand.vec_id,
           |    ROUND(${Sql.cos("qe.embedding", "ce.embedding")}, 6) AS cos
           |  FROM cand
           |    JOIN embeddings qe ON qe.vec_id = cand.q_id
           |    JOIN embeddings ce ON ce.vec_id = cand.vec_id)
           |SELECT q_id, vec_id, cos,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |         ORDER BY cos DESC, vec_id) AS INT) AS rank
           |FROM s
           |QUALIFY rank <= 3
           |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .withColumn("bucket",
          VectorOps.lshBucket(col("embedding"), Dim, nBits = 8))
      val probes = col("bucket") +:
        (0 until 8).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          explode(array(probes: _*)).as("probe"))
      val cand = emb.select(col("bucket"), col("vec_id"),
          col("embedding"))
        .join(q, col("bucket") === col("probe")
          && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("q_vec"),
          col("embedding"))
        .distinct() // union of the 9 probe hits
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      cand
        .select(col("q_id"), col("vec_id"),
          round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
            .as("cos"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .orderBy(col("q_id"), col("rank"))
    },

    // --- IVF nprobe tuning curve (recall@3 vs probed lists) ----------------
    // The tuning artifact behind emb_knn_ivf's fixed nprobe=4 (chosen in
    // r4 when nprobe=2 measured recall 0.47): ONE trained quantizer,
    // ONE assignment pass, ONE brute-force ground truth, then the
    // recall@3 readout at nprobe ∈ {1,2,4,8} from the SAME probe
    // ranking — the marginal cost of each extra curve point is a probe
    // filter, not a retrain (every leg slices the rank-≤8 probe set).
    // This is the curve a 100 TB store reads to price recall against
    // probed-list I/O, and why nprobe lives in serving config rather
    // than the index: the index is identical at every point.
    Q(
      "emb_ivf_nprobe_curve", {
        val iters = 3
        val legs = Seq(1, 2, 4, 8).map { np =>
          s"""SELECT CAST($np AS BIGINT) AS nprobe, q_id, vec_id FROM (
             |  SELECT cand.q_id, cand.vec_id,
             |    row_number() OVER (PARTITION BY cand.q_id
             |      ORDER BY ${Sql.cos("q.q_vec", "cand.embedding")} DESC,
             |        cand.vec_id) AS rk
             |  FROM (SELECT p.q_id, a.vec_id, a.embedding
             |        FROM alla a JOIN probe p ON a.cid = p.cid
             |          AND p.pr <= $np AND a.vec_id <> p.q_id) cand
             |    JOIN q ON q.q_id = cand.q_id) WHERE rk <= 3"""
            .stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH ${kmeansCtes(k = 8, iters = iters)},
           |alla AS (SELECT vec_id, embedding, cid FROM (
           |    SELECT e.vec_id, e.embedding, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${Sql.l2sq("e.embedding", "c.cvec")}, c.cid)
           |        AS rn
           |    FROM embeddings e CROSS JOIN c$iters c) WHERE rn = 1),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec
           |      FROM embeddings WHERE vec_id < 10),
           |probe AS (SELECT q_id, cid,
           |    row_number() OVER (PARTITION BY q_id ORDER BY d, cid)
           |      AS pr
           |  FROM (SELECT q_id, cid, ${Sql.l2sq("q_vec", "cvec")} AS d
           |        FROM q CROSS JOIN c$iters)),
           |truth AS (SELECT q_id, vec_id FROM (
           |    SELECT q.q_id, e.vec_id,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY ${Sql.cos("q.q_vec", "e.embedding")} DESC,
           |          e.vec_id) AS rk
           |    FROM embeddings e CROSS JOIN q
           |    WHERE e.vec_id <> q.q_id) WHERE rk <= 3),
           |legs AS ($legs),
           |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
           |SELECT nprobe, CAST(COUNT(t.q_id) AS BIGINT) AS n_hits,
           |  MAX(nt.n_truth) AS n_truth,
           |  CAST(COUNT(t.q_id) * 1000000 // MAX(nt.n_truth) AS BIGINT)
           |    AS recall_ppm
           |FROM legs l
           |  LEFT JOIN truth t ON l.q_id = t.q_id AND l.vec_id = t.vec_id,
           |  nt
           |GROUP BY nprobe
           |ORDER BY nprobe""".stripMargin
      }
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = KMeans.fit(emb, k = 8, iters = 3)
      val assigned = emb.withColumn("cid",
        KMeans.assignExpr(col("embedding"), cents))
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val probeEntries = array_sort(array(cents.map(c =>
        struct(
          graft.functions.VectorOps.l2sq(col("q_vec"),
            array(c.cvec.map(lit): _*)).as("d"),
          lit(c.cid).as("cid"))): _*))
      val probe = queries
        .select(col("q_id"), col("q_vec"),
          posexplode(slice(probeEntries, 1, 8)).as(Seq("pr0", "pc")))
        .select(col("q_id"), col("q_vec"),
          (col("pr0") + 1).as("pr"), col("pc.cid").as("probe_cid"))
      val wRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val truth = emb.crossJoin(broadcast(queries))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          VectorOps.cosine(col("q_vec"), col("embedding")).as("cos"))
        .withColumn("rk", row_number().over(wRank))
        .where(col("rk") <= 3)
        .select(col("q_id").as("t_q"), col("vec_id").as("t_v"))
        .localCheckpoint()
      val legs = Seq(1, 2, 4, 8).map { np =>
        assigned.join(
            broadcast(probe.where(col("pr") <= np)),
            col("cid") === col("probe_cid")
              && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            VectorOps.cosine(col("q_vec"), col("embedding")).as("cos"))
          .withColumn("rk", row_number().over(wRank))
          .where(col("rk") <= 3)
          .select(lit(np.toLong).as("nprobe"), col("q_id"),
            col("vec_id"))
      }
      val nt = truth.agg(count(lit(1)).cast("long").as("n_truth"))
      legs.reduce(_ unionByName _)
        .join(truth, col("q_id") === col("t_q")
          && col("vec_id") === col("t_v"), "left")
        .crossJoin(broadcast(nt))
        .groupBy(col("nprobe"))
        .agg(count(col("t_q")).cast("long").as("n_hits"),
          max(col("n_truth")).as("n_truth"))
        .select(col("nprobe"), col("n_hits"), col("n_truth"),
          expr("CAST(n_hits * 1000000 div n_truth AS BIGINT)")
            .as("recall_ppm"))
        .orderBy(col("nprobe"))
    },

    // --- IVF ANN (inverted-file index, the other classic scale path) -----
    // Coarse quantizer → inverted lists → probe nprobe nearest lists →
    // exact rerank within probed lists. The quantizer is a LEARNED
    // k-means (KMeans.fit: deterministic md5-hash seeds + 3 Lloyd
    // iterations with 2⁵²-exact means), so centroids, probe distances,
    // and rerank are ALL engine-exact and the whole index pipeline —
    // including training — hash-checks against the oracle, which replays
    // every iteration in SQL.
    // At 100 TB: centroids broadcast (k × dim doubles), assignment is a
    // narrow map (no join), each query touches nprobe lists ≈ nprobe/k
    // of the corpus.
    Q("emb_knn_ivf", IvfOracle) { (s, d) =>
      knnIvf(Tables.embeddings(s, d))
    },

    // --- IVF index persisted as a snapshot table, then served ------------
    // Identical answer to emb_knn_ivf (same oracle, by design): what
    // changes is the execution shape — build/commit once, serve from
    // the stored per-cell files with manifest pruning. IvfPersistSpec
    // asserts the serve scan touches ONLY probed-cell files.
    Q("emb_ivf_persist", IvfOracle) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      knnIvfPersisted(s, d,
        s"${sys.props("java.io.tmpdir")}/graft_ivf_index/$tag")
    },

    // --- filtered vector search (predicate + similarity) -----------------
    // The serving shape RAG metadata filters need: top-k restricted to
    // vectors satisfying a predicate (here: the query's OWN label — a
    // per-query filter value, the hard case, since a static pre-filter
    // can't precompute it). PRE-filter semantics: restrict the corpus
    // first, then rank — so k results are guaranteed whenever the
    // filtered set has k members, unlike post-filtering a top-k' head
    // which silently under-returns on selective predicates. Brute scan
    // is the oracle-checkable baseline; at scale the same filter drops
    // into the IVF cell scan (predicate pushdown inside probed lists —
    // emb_ivf_persist's serve leg composes with .where unchanged).
    Q(
      "emb_knn_filtered",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
         |           FROM embeddings WHERE vec_id < 10),
         |sc AS (SELECT q_id, vec_id,
         |        ROUND(${Sql.cos("q_vec", "embedding")}, 6) AS cos, label
         |      FROM embeddings JOIN q ON label = q_label
         |        AND vec_id <> q_id)
         |SELECT q_id, vec_id, label, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id
         |         ORDER BY cos DESC, vec_id) AS INT) AS rank
         |FROM sc
         |QUALIFY rank <= 3
         |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = broadcast(
        emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("q_label")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      emb.join(queries,
          col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("label"),
          round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
            .as("cos"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .orderBy(col("q_id"), col("rank"))
    },

    // --- incremental index maintenance: append without retrain -----------
    // Base half trains + commits; delta half is assigned with the STORED
    // centroids and appended as a second snapshot generation. The oracle
    // trains on the base subset and assigns all vectors with those
    // centroids — a hash match proves the no-retrain append is
    // semantically invisible to serving.
    Q(
      "emb_ivf_append", {
        val iters = 3
        s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
           |  WHERE vec_id % 2 = 0),
           |${kmeansCtes(k = 8, iters = iters, src = "base")},
           |alla AS (SELECT vec_id, embedding, cid FROM (
           |    SELECT e.vec_id, e.embedding, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${Sql.l2sq("e.embedding", "c.cvec")}, c.cid)
           |        AS rn
           |    FROM embeddings e CROSS JOIN c$iters c) WHERE rn = 1),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec
           |      FROM embeddings WHERE vec_id < 10),
           |qd AS (SELECT q_id, cid, ${Sql.l2sq("q_vec", "cvec")} AS d
           |       FROM q CROSS JOIN c$iters),
           |probe AS (SELECT q_id, cid FROM (
           |    SELECT q_id, cid,
           |      row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS pr
           |    FROM qd) WHERE pr <= 4),
           |cand AS (SELECT p.q_id, a.vec_id, a.embedding
           |         FROM alla a JOIN probe p ON a.cid = p.cid
           |           AND a.vec_id <> p.q_id),
           |sc AS (SELECT cand.q_id, cand.vec_id,
           |        ROUND(${Sql.cos("q.q_vec", "cand.embedding")}, 6) AS cos
           |      FROM cand JOIN q ON q.q_id = cand.q_id)
           |SELECT q_id, vec_id, cos,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |         ORDER BY cos DESC, vec_id) AS INT) AS rank
           |FROM sc
           |QUALIFY rank <= 3
           |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      knnIvfAppended(s, d,
        s"${sys.props("java.io.tmpdir")}/graft_ivf_append/$tag")
    },

    // --- vector deletes: tombstone delta + merge-on-read serve -----------
    // The lifecycle leg emb_ivf_persist/append lack: erase vectors
    // without touching index files (see [[knnIvfDeleted]]). The oracle
    // trains on the FULL corpus and excludes the deleted ids only from
    // the candidate set — a hash match proves deleted vectors never
    // serve AND survivor ranking is exactly the no-retrain serve.
    Q("emb_ivf_delete", IvfDeleteOracle) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      knnIvfDeleted(s, d,
        s"${sys.props("java.io.tmpdir")}/graft_ivf_delete/$tag")
    },

    // --- delete compaction: copy-on-write reclaim, tombstone-free serve --
    // Same oracle as emb_ivf_delete BY DESIGN (the emb_knn_ivf vs
    // emb_ivf_persist split): what changes is the execution shape —
    // Snapshots.deleteRows rewrites only the cells holding deleted
    // vectors, and serving reads the compacted store with NO tombstone
    // anti-join in the plan. The hash match proves merge-on-read and
    // compacted serving are interchangeable, which is the rotation a
    // production store runs continuously (deletes accumulate as
    // tombstones, compaction retires them off the query path).
    Q("emb_ivf_compact", IvfDeleteOracle) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      knnIvfDeleted(s, d,
        s"${sys.props("java.io.tmpdir")}/graft_ivf_compact/$tag",
        compact = true)
    },

    // --- embedding-cosine near-duplicate pairs ---------------------------
    // LSH bucketing, self-join, high-threshold filter: the
    // embedding-space analogue of MinHash dedup. The bucket width is
    // CORPUS-SIZED ([[VectorOps.lshWidthFor]] — smallest b in [8, 24]
    // with n/2^b ≤ 8): a fixed 8-bit space saturates as the corpus
    // grows (occupancy ∝ n ⇒ within-bucket pairs ∝ n², the measured
    // ×16-at-×10-data sweep row this replaces), while the ladder keeps
    // candidate volume linear. Width choice is part of the query's
    // declared semantics and the oracle replays it EXACTLY: the same
    // integer CASE ladder over COUNT(*), the same prefix-stable plane
    // family (bit i depends only on (dim, seed, i)), so both engines
    // pick the same width and the same buckets at every tier — at the
    // sf0.01 gate and the sf0.1 bench tier the ladder resolves to 8
    // bits, bit-identical to the pre-adaptive query. TRUE near-dup
    // recall survives widening: an identical pair collides at every
    // width (widening only appends bits), and a cos ≥ t pair keeps
    // each appended bit with probability 1 − θ/π (→1 as t→1);
    // CosineWidthSpec pins planted-dup recall across the ladder.
    Q(
      "dedup_embedding_cosine", {
        val planes = VectorOps.hyperplanes(Dim, 24, 7L)
        val ladder = (8 to 23)
          .map(b => s"WHEN n <= ${8L << b} THEN $b")
          .mkString("CASE ", " ", " ELSE 24 END")
        val bits = planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN $i < w.nbits AND " +
            s"${Sql.dot("embedding", Sql.floatList(p))} >= 0 " +
            s"THEN ${1L << i} ELSE 0 END)"
        }.mkString("(", " + ", ")")
        s"""WITH w AS (SELECT $ladder AS nbits
           |  FROM (SELECT COUNT(*) AS n FROM embeddings) t),
           |e AS (SELECT vec_id, embedding, $bits AS bucket
           |  FROM embeddings, w)
           |SELECT * FROM (
           |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |    ROUND(${Sql.cos("a.embedding", "b.embedding")}, 6) AS cos
           |  FROM e a JOIN e b
           |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
           |WHERE cos >= 0.4
           |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val embT = Tables.embeddings(s, d)
      // one O(1) footer-count job sizes the width — the same
      // stats-driven planning as the broadcast-vs-SMJ demotion and
      // the SimHash banding ladder
      val nbits = VectorOps.lshWidthFor(embT.count())
      cosineNearDupPairs(embT, nbits)
    },

    // --- contrastive hard-negative mining (triplet construction) --------
    // The training-data artifact contrastive/embedding finetuning runs
    // on: per anchor, ONE positive (nearest neighbor — the retrieval
    // proxy label) and the top-3 HARD negatives — the highest-cosine
    // candidates strictly below the near-dup threshold (0.4, the same
    // corpus-calibrated line dedup_embedding_cosine draws: anything
    // above it is a probable duplicate, i.e. a FALSE negative that
    // would poison the loss) and excluding the chosen positive. One
    // broadcast of the anchor set × one corpus scan, then two
    // row_number windows over the per-anchor partitions — at 100 TB the
    // candidate generation swaps to the LSH/IVF index scan (same
    // downstream shape), which is why the mining threshold + ranking
    // live separately from candidate generation here.
    Q(
      "pipe_hard_negatives",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT q_id, vec_id,
         |        ROUND(${Sql.cos("q_vec", "embedding")}, 6) AS cos
         |      FROM embeddings CROSS JOIN q WHERE vec_id <> q_id),
         |r AS (SELECT q_id, vec_id, cos, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
         |      FROM c),
         |pos AS (SELECT q_id, 'positive' AS role, CAST(1 AS INT) AS rank,
         |          vec_id, cos
         |        FROM r WHERE rn = 1),
         |n AS (SELECT q_id, vec_id, cos, CAST(row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INT) AS rank
         |      FROM r WHERE rn <> 1 AND cos < 0.4),
         |neg AS (SELECT q_id, 'negative' AS role, rank, vec_id, cos
         |        FROM n WHERE rank <= 3)
         |SELECT * FROM (SELECT * FROM pos UNION ALL SELECT * FROM neg)
         |ORDER BY q_id NULLS FIRST, role NULLS FIRST, rank NULLS FIRST"""
        .stripMargin
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = broadcast(
        emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val ranked = emb.join(queries, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
            .as("cos"))
        .withColumn("rn", row_number().over(w))
      val pos = ranked.where(col("rn") === 1)
        .select(col("q_id"), lit("positive").as("role"),
          lit(1).as("rank"), col("vec_id"), col("cos"))
      val neg = ranked.where(col("rn") =!= 1 && col("cos") < 0.4)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("q_id"), lit("negative").as("role"), col("rank"),
          col("vec_id"), col("cos"))
      pos.union(neg).orderBy(col("q_id"), col("role"), col("rank"))
    },

    // --- int8 embedding quantization (storage engineering) --------------
    // Symmetric per-vector int8 quantization — the 4× storage cut every
    // large embedding table takes before ANN serving: scale = max|x|/127,
    // q_i = floor(x/scale + 0.5) (explicit half-up — engine-identical,
    // unlike round()'s half-even/half-up split), plus the reconstruction
    // error bound the format guarantees (max err ≤ scale/2). Everything
    // is a narrow row-local projection (no shuffle, no join); the oracle
    // replays the identical IEEE op sequence, and the quantized array is
    // fingerprinted via its canonical string form (both engines render
    // "[a, b, c]"). At 100 TB this is a map-only rewrite pass.
    Q(
      "emb_quantize_int8",
      """WITH s AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale
        |  FROM embeddings),
        |q AS (SELECT vec_id, embedding, scale,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)) AS qv
        |  FROM s)
        |SELECT vec_id, ROUND(scale, 6) AS scale,
        |  md5(CAST(qv AS VARCHAR)) AS q_fp,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  ROUND(list_max(list_transform(list_zip(embedding, qv),
        |    p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale))),
        |    6) AS max_err
        |FROM q ORDER BY vec_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val scale = array_max(transform(col("embedding"),
        x => abs(x.cast("double")))) / 127.0
      val qv = transform(col("embedding"),
        x => floor(x.cast("double") / col("scale") + 0.5).cast("int"))
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), scale.as("scale"))
        .select(col("vec_id"), col("embedding"), col("scale"), qv.as("qv"))
        // err must be computed BEFORE the projection that re-aliases
        // `scale` to its rounded form: Spark 4's lateral column alias
        // resolution would otherwise bind col("scale") inside the
        // lambda to the ROUNDED alias defined earlier in the same
        // select (DuckDB binds to the CTE column — silent divergence)
        .select(col("vec_id"), col("scale"), col("qv"),
          array_max(zip_with(col("embedding"), col("qv"),
            (x, q) => abs(x.cast("double") - q.cast("double") * col("scale"))))
            .as("err"))
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale"),
          md5(col("qv").cast("string")).as("q_fp"),
          aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          round(col("err"), 6).as("max_err"))
        .orderBy(col("vec_id"))
    },

    // --- SemDeDup-style semantic coreset selection -----------------------
    // The cluster-then-keep-representatives pass modern curation stacks
    // run over embeddings (SemDeDup, SSL-prototype pruning): train a
    // k-means quantizer (k=64 here — fine-grained cells), assign every
    // vector, keep each cell's closest-to-centroid vector as the
    // retained representative. Training replays engine-exact (shared
    // kmeansCtes oracle); the winning distance comes free from the same
    // (d, cid) struct the assignment takes its argmin over — one narrow
    // pass, no second distance computation, no join. Per-cell argmin is
    // a window over cid (≤ k groups of corpus/k rows); at 100 TB the
    // assignment is still a broadcast map and the window shuffles once
    // on cid.
    Q(
      "pipe_semantic_dedup", {
        val iters = 2
        s"""WITH ${kmeansCtes(k = 64, iters = iters)},
           |r AS (SELECT cid, vec_id, d,
           |        row_number() OVER (PARTITION BY cid
           |          ORDER BY d, vec_id) AS rn,
           |        COUNT(*) OVER (PARTITION BY cid) AS n
           |      FROM af)
           |SELECT cid, vec_id AS rep_id, ROUND(d, 6) AS rep_d,
           |  CAST(n AS BIGINT) AS n_members
           |FROM r WHERE rn = 1
           |ORDER BY cid NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = KMeans.fit(emb, k = 64, iters = 2)
      val best = KMeans.nearestExpr(col("embedding"), cents)
      val assigned = emb.select(col("vec_id"),
        best.getField("cid").as("cid"), best.getField("d").as("d"))
      val byCell = Window.partitionBy(col("cid"))
      val byDist = byCell.orderBy(col("d"), col("vec_id"))
      assigned
        .withColumn("rn", row_number().over(byDist))
        .withColumn("n_members", count(lit(1)).over(byCell))
        .where(col("rn") === 1)
        .select(col("cid"), col("vec_id").as("rep_id"),
          round(col("d"), 6).as("rep_d"), col("n_members"))
        .orderBy(col("cid"))
    },

    // --- product-quantization codes ---------------------------------------
    // The 100 TB embedding-compression path: each vector becomes PqM
    // centroid ids (one per subspace) + nothing else — ~51× smaller
    // than the float[64], small enough that the whole corpus's
    // codes fit in cluster memory for ANN serving. ENCODING is a narrow
    // map (codebooks are driver literals, k·m VectorL2Sq kernel calls per
    // row, no join/shuffle); training is PqM independent KMeans.fit runs
    // over sliced subvectors. recon_err = Σ_s d_s — the exact squared L2
    // between the vector and its reconstruction (subspaces are disjoint
    // coordinates, so sub-distances add; invariant spec-checked). Oracle
    // replays all four trainings per-iteration in SQL.
    Q(
      "emb_pq_codes", {
        val codeCols = (1 to PqM).map(s => s"a$s.cid AS code$s")
          .mkString(", ")
        val errSum = (1 to PqM).map(s => s"a$s.d").mkString(" + ")
        val joins = (2 to PqM)
          .map(s => s"JOIN s${s}af a$s USING (vec_id)").mkString(" ")
        s"""WITH $pqCtes
           |SELECT a1.vec_id,
           |  $codeCols,
           |  ROUND($errSum, 6) AS recon_err
           |FROM s1af a1 $joins
           |ORDER BY vec_id NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val books = pqFit(emb)
      // one compiled all-subspace kernel call per row (PqNearestAll);
      // the m-struct projection form builds a 100s-of-node expression
      // tree that falls out of codegen — measured 4-5x slower
      emb.select(col("vec_id"),
          KMeans.nearestAllExpr(col("embedding"), PqSubDim, books)
            .as("pq"))
        .select(col("vec_id") +:
          (1 to PqM).map(i =>
            element_at(col("pq"), i).getField("cid").as(s"code$i")) :+
          round((1 to PqM).map(i =>
            element_at(col("pq"), i).getField("d")).reduceLeft(_ + _), 6)
            .as("recon_err"): _*)
        .orderBy(col("vec_id"))
    },

    // --- PQ ANN via asymmetric distance computation (ADC) -----------------
    // The serving-side half of PQ: per query, ONE distance table per
    // subspace (k exact sub-distances from the query's subvector to
    // the codebook — k·m kernel calls TOTAL per query, not per
    // candidate), then every candidate's distance is m map lookups +
    // m−1 adds over its CODES — the corpus's float embeddings are never
    // touched after encoding. The scan side is the narrow codes
    // projection; the query side (10 rows carrying their lookup tables)
    // broadcasts. Lookup keys are centroid IDS (not array positions) so
    // a codebook that drops an empty cluster stays correct. Oracle
    // computes the same ADC by joining codes back to the final codebook
    // CTEs; the sub-distance sum order (s1+s2)+s3)+s4 matches the
    // engine's left-assoc adds bit-for-bit.
    Q(
      "emb_knn_pq", {
        val sub = (1 to PqM).map { s =>
          val lo = (s - 1) * PqSubDim + 1
          Sql.l2sq(s"q.q_vec[$lo:${s * PqSubDim}]", s"cc$s.cvec")
        }.mkString("(", " + ", ")")
        val joins = (1 to PqM)
          .map(s => s"JOIN s${s}c$PqIters cc$s ON cc$s.cid = x.c$s")
          .mkString("\n         ")
        val codeCols = (1 to PqM).map(s => s"a$s.cid AS c$s")
          .mkString(", ")
        val codeJoins = (2 to PqM)
          .map(s => s"JOIN s${s}af a$s USING (vec_id)").mkString(" ")
        s"""WITH $pqCtes,
           |codes AS (SELECT a1.vec_id, $codeCols
           |  FROM s1af a1 $codeJoins),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec
           |      FROM embeddings WHERE vec_id < 10),
           |s AS (SELECT q.q_id, x.vec_id, $sub AS adc
           |      FROM codes x
           |         $joins
           |         CROSS JOIN q
           |      WHERE x.vec_id <> q.q_id)
           |SELECT q_id, vec_id, ROUND(adc, 6) AS adc, rank FROM (
           |  SELECT q_id, vec_id, adc,
           |    CAST(row_number() OVER (PARTITION BY q_id
           |           ORDER BY adc, vec_id) AS INT) AS rank
           |  FROM s) WHERE rank <= 5
           |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
      }
    ) { (s, d) => knnPq(Tables.embeddings(s, d)) },

    // --- IVF + PQ composed (the production vector-store serve) -----------
    // Probe nprobe=4 of 8 coarse cells, then ADC over PQ codes WITHIN the
    // probed lists only. The oracle replays the coarse training (shared
    // kmeansCtes → af), the 8 per-subspace codebook trainings (pqCtes),
    // and restricts emb_knn_pq's ADC scoring to candidates whose coarse
    // cell is probed — a hash match proves the composition introduces no
    // semantic drift over its two audited halves.
    Q(
      "emb_knn_ivfpq", {
        val iters = 3
        val sub = (1 to PqM).map { s =>
          val lo = (s - 1) * PqSubDim + 1
          Sql.l2sq(s"q.q_vec[$lo:${s * PqSubDim}]", s"cc$s.cvec")
        }.mkString("(", " + ", ")")
        val ccJoins = (1 to PqM)
          .map(s => s"JOIN s${s}c$PqIters cc$s ON cc$s.cid = x.c$s")
          .mkString("\n         ")
        val codeCols = (1 to PqM).map(s => s"a$s.cid AS c$s")
          .mkString(", ")
        val codeJoins = (2 to PqM)
          .map(s => s"JOIN s${s}af a$s USING (vec_id)").mkString(" ")
        s"""WITH ${kmeansCtes(k = 8, iters = iters)},
           |$pqCtes,
           |codes AS (SELECT a1.vec_id, $codeCols
           |  FROM s1af a1 $codeJoins),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec
           |      FROM embeddings WHERE vec_id < 10),
           |qd AS (SELECT q_id, cid, ${Sql.l2sq("q_vec", "cvec")} AS d
           |       FROM q CROSS JOIN c$iters),
           |probe AS (SELECT q_id, cid FROM (
           |    SELECT q_id, cid,
           |      row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS pr
           |    FROM qd) WHERE pr <= 4),
           |sc AS (SELECT q.q_id, x.vec_id, $sub AS adc
           |      FROM codes x
           |         JOIN af ON af.vec_id = x.vec_id
           |         JOIN probe p ON p.cid = af.cid
           |         JOIN q ON q.q_id = p.q_id
           |         $ccJoins
           |      WHERE x.vec_id <> q.q_id)
           |SELECT q_id, vec_id, ROUND(adc, 6) AS adc, rank FROM (
           |  SELECT q_id, vec_id, adc,
           |    CAST(row_number() OVER (PARTITION BY q_id
           |           ORDER BY adc, vec_id) AS INT) AS rank
           |  FROM sc) WHERE rank <= 5
           |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
      }
    ) { (s, d) => knnIvfPq(Tables.embeddings(s, d)) },

    // --- two-stage serve: PQ shortlist + exact refine ---------------------
    // ADC over codes picks a top-20 shortlist; the exact cosine reranks
    // just those candidates — full-precision top-5 at code-scan cost.
    // The oracle chains emb_knn_pq's ADC replay with an exact-cosine
    // rerank restricted to the shortlist.
    Q(
      "emb_knn_refine", {
        val sub = (1 to PqM).map { s =>
          val lo = (s - 1) * PqSubDim + 1
          Sql.l2sq(s"q.q_vec[$lo:${s * PqSubDim}]", s"cc$s.cvec")
        }.mkString("(", " + ", ")")
        val joins = (1 to PqM)
          .map(s => s"JOIN s${s}c$PqIters cc$s ON cc$s.cid = x.c$s")
          .mkString("\n         ")
        val codeCols = (1 to PqM).map(s => s"a$s.cid AS c$s")
          .mkString(", ")
        val codeJoins = (2 to PqM)
          .map(s => s"JOIN s${s}af a$s USING (vec_id)").mkString(" ")
        s"""WITH $pqCtes,
           |codes AS (SELECT a1.vec_id, $codeCols
           |  FROM s1af a1 $codeJoins),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec
           |      FROM embeddings WHERE vec_id < 10),
           |sc AS (SELECT q.q_id, x.vec_id, $sub AS adc
           |      FROM codes x
           |         $joins
           |         CROSS JOIN q
           |      WHERE x.vec_id <> q.q_id),
           |short AS (SELECT q_id, vec_id FROM (
           |    SELECT q_id, vec_id,
           |      row_number() OVER (PARTITION BY q_id
           |        ORDER BY adc, vec_id) AS srank
           |    FROM sc) WHERE srank <= 20),
           |re AS (SELECT s.q_id, s.vec_id,
           |        ROUND(${Sql.cos("q.q_vec", "e.embedding")}, 6) AS cos
           |      FROM short s
           |        JOIN embeddings e ON e.vec_id = s.vec_id
           |        JOIN q ON q.q_id = s.q_id)
           |SELECT q_id, vec_id, cos,
           |  CAST(row_number() OVER (PARTITION BY q_id
           |         ORDER BY cos DESC, vec_id) AS INT) AS rank
           |FROM re
           |QUALIFY rank <= 5
           |ORDER BY q_id NULLS FIRST, rank NULLS FIRST""".stripMargin
      }
    ) { (s, d) => knnRefine(Tables.embeddings(s, d)) },

    // --- mutual nearest neighbors (bitext-mining primitive) --------------
    // The pair selection behind parallel-corpus mining (Artetxe &
    // Schwenk's margin criterion starts here): keep (a, b) only when b
    // is a's nearest neighbor AND a is b's — mutuality kills the hub
    // vectors that one-directional kNN drags in. Candidates come from
    // the same 8-bit LSH bucketing as dedup_embedding_cosine (equi-join
    // on the bucket key, never all-pairs), so this is LSH-mutual-NN by
    // declared semantics: the oracle replays the bucket assignment from
    // the serialized planes, the per-vector argmax, and the mutuality
    // join. Shape: bucket equi-join → one window per direction (same
    // partition key) → self-join of the two rank-1 sets.
    Q(
      "emb_mutual_nn", {
        val planes = VectorOps.hyperplanes(Dim, 8, 7L)
        s"""WITH e AS (SELECT vec_id, embedding,
           |    ${Sql.bucket("embedding", planes)} AS bucket
           |  FROM embeddings),
           |cand AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |    ${Sql.cos("a.embedding", "b.embedding")} AS cos
           |  FROM e a JOIN e b
           |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
           |r1 AS (SELECT a_id, b_id, cos FROM (
           |    SELECT a_id, b_id, cos, row_number() OVER (
           |      PARTITION BY a_id ORDER BY cos DESC, b_id) AS rn
           |    FROM cand) WHERE rn = 1)
           |SELECT x.a_id AS a_id, x.b_id AS b_id,
           |  ROUND(x.cos, 6) AS cos
           |FROM r1 x JOIN r1 y ON x.a_id = y.b_id AND x.b_id = y.a_id
           |WHERE x.a_id < x.b_id
           |ORDER BY a_id NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .withColumn("bucket",
          VectorOps.lshBucket(col("embedding"), Dim, nBits = 8))
      val a = emb.select(col("bucket"), col("vec_id").as("a_id"),
        col("embedding").as("a_vec"))
      val b = emb.select(col("bucket").as("b_bucket"),
        col("vec_id").as("b_id"), col("embedding").as("b_vec"))
      val w = Window.partitionBy(col("a_id"))
        .orderBy(col("cos").desc, col("b_id"))
      val r1 = a.join(b, col("bucket") === col("b_bucket")
          && col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          VectorOps.cosine(col("a_vec"), col("b_vec")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("a_id"), col("b_id"), col("cos"))
      r1.as("x").join(r1.as("y"),
          col("x.a_id") === col("y.b_id") &&
            col("x.b_id") === col("y.a_id"))
        .where(col("x.a_id") < col("x.b_id"))
        .select(col("x.a_id").as("a_id"), col("x.b_id").as("b_id"),
          round(col("x.cos"), 6).as("cos"))
        .orderBy(col("a_id"))
    },

    // --- per-dimension variance profile (which dims carry signal) --------
    // The diagnostic behind emb_mrl_recall's truncation curve: variance
    // per coordinate says which dims are informative and which are
    // near-constant padding — the profile that justifies (or vetoes)
    // prefix truncation and guides PQ subspace splits. Components are
    // quantized to 2⁻²⁰ grid INTEGERS first (floor(v·2²⁰ + 0.5), exact
    // in both engines — the declared quantization, same contract as
    // emb_quantize_int8), so the MOMENTS are exact integers; the
    // n·Σq² − (Σq)² variance arithmetic is then fixed-order doubles —
    // correctly-rounded ops, bit-identical across engines. One
    // posexplode scan, one 64-group aggregate.
    Q(
      "emb_dim_variance",
      """WITH px AS (SELECT CAST(pos AS BIGINT) AS pos,
        |    CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS q
        |  FROM (SELECT unnest(embedding) AS v,
        |          generate_subscripts(embedding, 1) AS pos
        |        FROM embeddings)),
        |m AS (SELECT pos, COUNT(*) AS n,
        |        CAST(SUM(q) AS BIGINT) AS sum_q,
        |        CAST(SUM(q * q) AS BIGINT) AS sumsq_q
        |      FROM px GROUP BY pos)
        |SELECT pos, CAST(n AS BIGINT) AS n, sum_q, sumsq_q,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sumsq_q AS DOUBLE)
        |      - CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    / 1099511627776, 9) AS variance
        |FROM m ORDER BY pos NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val q = floor(col("v").cast("double") * 1048576 + 0.5).cast("long")
      val m = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("p", "v")))
        .select((col("p") + 1).cast("long").as("pos"), q.as("q"))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).cast("long").as("sum_q"),
          sum(col("q") * col("q")).cast("long").as("sumsq_q"))
      def dd(c: String) = col(c).cast("double")
      m.select(col("pos"), col("n"), col("sum_q"), col("sumsq_q"),
          round((dd("n") * dd("sumsq_q") - dd("sum_q") * dd("sum_q"))
            / (dd("n") * dd("n")) / 1099511627776.0, 9).as("variance"))
        .orderBy(col("pos"))
    },

    // --- embedding distribution drift (shared-quantizer histogram) -------
    // The monitor a production vector store runs between index
    // refreshes: train the coarse quantizer on the BASE half (even ids
    // — the same stored-centroid discipline as emb_ivf_append), assign
    // BOTH halves with it, and compare per-cell occupancy shares. A
    // healthy delta matches the base distribution; retrain is triggered
    // when the share gap crosses a threshold — the embedding-space
    // analogue of ref_type_drift's categorical check. Assignment is the
    // broadcast-centroid narrow map; the comparison is one k-row
    // aggregate; shares are integer ppm (exact).
    Q(
      "emb_centroid_drift", {
        val iters = 3
        s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
           |  WHERE vec_id % 2 = 0),
           |${kmeansCtes(k = 8, iters = iters, src = "base")},
           |alla AS (SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${Sql.l2sq("e.embedding", "c.cvec")}, c.cid)
           |        AS rn
           |    FROM embeddings e CROSS JOIN c$iters c) WHERE rn = 1),
           |cnt AS (SELECT cid,
           |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_base,
           |    CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_delta
           |  FROM alla GROUP BY cid),
           |tot AS (SELECT SUM(n_base) AS tb, SUM(n_delta) AS td FROM cnt)
           |SELECT cid, n_base, n_delta,
           |  CAST(n_base * 1000000 // tb AS BIGINT) AS base_ppm,
           |  CAST(n_delta * 1000000 // td AS BIGINT) AS delta_ppm,
           |  CAST(ABS(n_base * 1000000 // tb - n_delta * 1000000 // td)
           |    AS BIGINT) AS gap_ppm
           |FROM cnt CROSS JOIN tot
           |ORDER BY cid NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val cents = KMeans.fit(base, k = 8, iters = 3)
      val cnt = emb
        .select(col("vec_id"),
          KMeans.assignExpr(col("embedding"), cents).as("cid"))
        .groupBy(col("cid"))
        .agg(
          sum(when(pmod(col("vec_id"), lit(2)) === 0, 1).otherwise(0))
            .cast("long").as("n_base"),
          sum(when(pmod(col("vec_id"), lit(2)) === 1, 1).otherwise(0))
            .cast("long").as("n_delta"))
      val tot = cnt.agg(sum(col("n_base")).as("tb"),
        sum(col("n_delta")).as("td"))
      cnt.crossJoin(broadcast(tot))
        .select(col("cid"), col("n_base"), col("n_delta"),
          expr("n_base * 1000000 div tb").cast("long").as("base_ppm"),
          expr("n_delta * 1000000 div td").cast("long").as("delta_ppm"),
          expr("abs(n_base * 1000000 div tb - n_delta * 1000000 div td)")
            .cast("long").as("gap_ppm"))
        .orderBy(col("cid"))
    },

    // --- LSH index health: per-table bucket occupancy --------------------
    // The index audit run BEFORE trusting emb_knn_lsh's recall: per hash
    // table, how many of the 2⁶ buckets are used, the hottest bucket,
    // the colliding-pair load Σs(s−1)/2 (the join work the table
    // contributes), and the expected probe cost for a random query
    // E[|bucket|] = Σs²/n in exact integer milli-units. A skewed table
    // (one mega-bucket) degrades to a scan — this is the query that
    // catches it. One explode + two hash rollups; output is O(tables).
    Q(
      "emb_lsh_occupancy", {
        val tables = (0 until 16).map { t =>
          val planes = VectorOps.hyperplanes(Dim, 6, 7L + 1000L * t)
          s"struct_pack(tbl := $t, bucket := ${Sql.bucket("embedding", planes)})"
        }.mkString(",\n    ")
        s"""WITH b AS (SELECT vec_id, unnest([
           |    $tables]) AS tb
           |  FROM embeddings),
           |x AS (SELECT vec_id, tb.tbl AS tbl, tb.bucket AS bucket FROM b),
           |s AS (SELECT tbl, bucket, CAST(COUNT(*) AS BIGINT) AS sz
           |      FROM x GROUP BY tbl, bucket)
           |SELECT CAST(tbl AS INT) AS tbl,
           |  CAST(COUNT(*) AS BIGINT) AS buckets_used,
           |  CAST(MAX(sz) AS BIGINT) AS max_bucket,
           |  CAST(SUM(sz * (sz - 1)) // 2 AS BIGINT) AS colliding_pairs,
           |  CAST(SUM(sz * sz) * 1000 // SUM(sz) AS BIGINT)
           |    AS expected_probe_milli
           |FROM s GROUP BY tbl
           |ORDER BY tbl NULLS FIRST""".stripMargin
      }
    ) { (s, d) =>
      val x = Tables.embeddings(s, d)
        .withColumn("t", explode(VectorOps.lshTables(col("embedding"), Dim,
          nBits = 6, nTables = 16)))
        .select(col("t.table").as("tbl"), col("t.bucket").as("bucket"))
      x.groupBy(col("tbl"), col("bucket"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("tbl"))
        .agg(count(lit(1)).as("buckets_used"),
          max(col("sz")).cast("long").as("max_bucket"),
          sum(col("sz") * (col("sz") - 1)).as("pair2"),
          sum(col("sz") * col("sz")).as("ssq"),
          sum(col("sz")).as("n"))
        .select(col("tbl").cast("int").as("tbl"), col("buckets_used"),
          col("max_bucket"),
          expr("CAST(pair2 div 2 AS BIGINT)").as("colliding_pairs"),
          expr("CAST(ssq * 1000 div n AS BIGINT)")
            .as("expected_probe_milli"))
        .orderBy(col("tbl"))
    },

    // --- top principal component via power iteration -----------------------
    // The dimensionality-analysis step emb_dim_variance stops short of:
    // the dominant eigenvector of the (uncentered) second-moment matrix
    // XᵀX — what PCA whitening, spectral dedup, and ABTT ("all-but-the-
    // top" embedding post-processing) all start from. Exact-arithmetic
    // restatement: coordinates floor-scaled to integers (in explicit
    // DOUBLE — a float×int multiply lands a different integer on ~0.5%
    // of coordinates), the 64×64 moment matrix accumulated as one
    // combiner-friendly aggregate over the per-vector coordinate pair
    // join (map-side combine collapses the d² fanout per partition),
    // then FIVE power-iteration rounds on the driver in exact BigInt
    // over the MODEL-sized (4096-entry) matrix — the trainQualityWeights
    // topology: corpus-scale moments stay distributed, the 64-vector
    // update is parameter-sized (a relational matvec per round spent
    // 10+ scheduler stages on 4096-row joins — measured 9.9 s → this
    // shape). Each round rescales to ±10⁶ by sign·(|s|·10⁶ div max|s|);
    // the sign split keeps every integer division on positives, where
    // trunc ≡ floor, so BigInt, Spark `div`, and DuckDB `//` agree. The
    // oracle replays the rounds as an unrolled relational matvec chain
    // in HUGEINT.
    Q(
      "emb_top_component",
      PowerIterOracle
    ) { (s, d) =>
      // spread first: the 64×64 per-vector pair fanout below is the
      // CPU-dense stage and would otherwise run on the one scan split
      val xs = spread(Tables.embeddings(s, d))
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("p", "e")))
        .select(col("vec_id"), (col("p") + 1).as("i"),
          // scale in DOUBLE explicitly: a float×int multiply runs in
          // single precision and lands a different integer on ~0.5% of
          // coordinates than the oracle's double path
          floor(col("e").cast("double") * lit(1000000.0)).cast("long")
            .as("v"))
      // the 64×64 moment matrix is MODEL-sized (4096 rows): collect it
      // once and run the eigen-iteration on the driver in exact BigInt
      // — the trainQualityWeights bounded-collect topology (distributed
      // moment accumulation, model-sized parameter update; a relational
      // matvec per round spends 10+ scheduler stages on 4096-row joins)
      val cRows = xs.as("a")
        .join(xs.as("b"), "vec_id")
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(sum(expr("CAST(a.v AS DECIMAL(38,0)) * b.v")).as("c"))
        .collect()
      val dim = 64
      val cm = Array.ofDim[BigInt](dim, dim)
      cRows.foreach { r =>
        cm(r.getAs[Number](0).intValue - 1)(r.getAs[Number](1).intValue - 1) =
          BigInt(r.getDecimal(2).toBigInteger)
      }
      var vec = Array.fill(dim)(BigInt(1000000))
      (1 to 5).foreach { _ =>
        val sVec = Array.tabulate(dim)(i =>
          (0 until dim).map(j => cm(i)(j) * vec(j)).sum)
        val m = sVec.map(_.abs).max
        vec = sVec.map(sv =>
          (if (sv < 0) BigInt(-1) else BigInt(1)) * (sv.abs * 1000000 / m))
      }
      import s.implicits._
      vec.zipWithIndex
        .map { case (v, i) => ((i + 1).toLong, v.toLong) }.toSeq
        .toDF("dim", "component_ppm")
        .orderBy(col("dim"))
    },

    // --- cluster-label purity of the IVF cells ----------------------------
    // The clustering-QUALITY metric the IVF family never reports: the
    // corpus carries ground-truth labels, so each trained cell earns a
    // purity score — the share of its members agreeing with the cell's
    // majority label (ties to the smallest label id), plus the overall
    // size-weighted purity. High purity means the quantizer's cells
    // align with semantics (cell-restricted ANN probes stay
    // label-consistent); a collapsed cell shows up as a low-purity
    // giant. Training replays the SAME deterministic k=8×3-iteration
    // Lloyd fit as emb_knn_ivf (shared helper, shared oracle CTEs);
    // past the fit, one (cid,label) aggregate + an argmax on the
    // ≤k·labels cell table — every window bounded by k.
    Q(
      "emb_cell_purity",
      s"""WITH ${kmeansOracleCtes(8, 3)},
         |p AS (SELECT af.cid, e.label, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM af JOIN embeddings e USING (vec_id)
         |  GROUP BY af.cid, e.label),
         |top AS (SELECT cid, label AS top_label, n AS top_n FROM (
         |    SELECT cid, label, n, row_number() OVER (PARTITION BY cid
         |        ORDER BY n DESC, label) AS rn FROM p) WHERE rn = 1),
         |tot AS (SELECT cid, CAST(SUM(n) AS BIGINT) AS n_vecs FROM p
         |        GROUP BY cid)
         |SELECT CAST(t.cid AS BIGINT) AS cid, tot.n_vecs,
         |  CAST(t.top_label AS BIGINT) AS top_label, t.top_n,
         |  CAST(t.top_n * 1000000 // tot.n_vecs AS BIGINT) AS purity_ppm,
         |  CAST(SUM(t.top_n) OVER () * 1000000
         |    // SUM(tot.n_vecs) OVER () AS BIGINT) AS overall_ppm
         |FROM top t JOIN tot USING (cid)
         |ORDER BY cid""".stripMargin
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = KMeans.fit(emb, k = 8, iters = 3)
      val p = emb
        .withColumn("cid", KMeans.assignExpr(col("embedding"), cents))
        .groupBy(col("cid"), col("label"))
        .agg(count(lit(1)).cast("long").as("n"))
      val w = Window.partitionBy(col("cid"))
        .orderBy(col("n").desc, col("label"))
      val top = p.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("cid"), col("label").cast("long").as("top_label"),
          col("n").as("top_n"))
      val tot = p.groupBy(col("cid"))
        .agg(sum(col("n")).cast("long").as("n_vecs"))
      top.join(tot, "cid")
        .select(col("cid").cast("long").as("cid"), col("n_vecs"),
          col("top_label"), col("top_n"),
          expr("CAST(top_n * 1000000 div n_vecs AS BIGINT)")
            .as("purity_ppm"),
          expr("CAST(sum(top_n) over () * 1000000" +
            " div sum(n_vecs) over () AS BIGINT)").as("overall_ppm"))
        .orderBy(col("cid"))
    },

    // --- cosine-similarity calibration histogram ----------------------------
    // The distribution every similarity THRESHOLD in this module is
    // calibrated against (dedup_embedding_cosine's 0.4 line, the hard-
    // negative mining cut): pairwise cosine over a deterministic
    // 100-vector sample — the k-smallest md5 hashes of vec_id, the KMV
    // sampling idiom, so the sample is REPLAYABLE and corpus-size-
    // independent (top-k by hash, never a full sort at scale; 4 950
    // pairs regardless of corpus size). Pairs bin into fixed 0.2-wide
    // cosine bins via a comparison CASE ladder — binning by COMPARISON,
    // not by float arithmetic on the rounded value, is what keeps the
    // two engines' bin assignment bit-identical at the bin edges.
    Q(
      "emb_pair_hist", {
        val ladder = (8 to -8 by -2)
          .map(b => s"WHEN cos >= ${b / 10.0} THEN $b")
          .mkString("CASE ", " ", " ELSE -10 END")
        s"""WITH smp AS (SELECT vec_id, embedding FROM (
           |    SELECT vec_id, embedding,
           |      ${graft.functions.TextOps.md5Low60Sql(
              "CAST(vec_id AS VARCHAR)")} AS hv
           |    FROM embeddings ORDER BY hv, vec_id LIMIT 100)),
           |pr AS (SELECT ROUND(${Sql.cos("a.embedding", "b.embedding")}, 6)
           |      AS cos
           |  FROM smp a JOIN smp b ON a.vec_id < b.vec_id),
           |bn AS (SELECT CAST($ladder AS BIGINT) AS bin FROM pr),
           |h AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs
           |  FROM bn GROUP BY bin)
           |SELECT bin, n_pairs,
           |  CAST(n_pairs * 1000000 // SUM(n_pairs) OVER () AS BIGINT)
           |    AS share_ppm
           |FROM h ORDER BY bin""".stripMargin
      }
    ) { (s, d) =>
      val ladder = (8 to -8 by -2)
        .map(b => s"WHEN cos >= ${b / 10.0} THEN ${b}L")
        .mkString("CASE ", " ", " ELSE -10L END")
      val smp = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          graft.functions.TextOps.md5Low60(col("vec_id").cast("string"))
            .as("hv"))
        .orderBy(col("hv"), col("vec_id"))
        .limit(100)
        .select(col("vec_id"), col("embedding"))
      val a = smp.select(col("vec_id").as("a_id"),
        col("embedding").as("a_vec"))
      val b = smp.select(col("vec_id").as("b_id"),
        col("embedding").as("b_vec"))
      a.join(b, col("a_id") < col("b_id"))
        .select(round(VectorOps.cosine(col("a_vec"), col("b_vec")), 6)
          .as("cos"))
        .select(expr(ladder).cast("long").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).cast("long").as("n_pairs"))
        .withColumn("share_ppm",
          expr("CAST(n_pairs * 1000000 div sum(n_pairs) over ()" +
            " AS BIGINT)"))
        .orderBy(col("bin"))
    },

    // --- k-NN graph reciprocity (hubness diagnostic) -------------------------
    // The standard ANN-index health check: build the directed 3-NN
    // graph over the LSH-bucketed candidate sets (the
    // dedup_embedding_cosine generation — equi-join on the 8-bit
    // sign-bucket key, so candidates are O(bucket), never O(corpus)),
    // and measure edge reciprocity. Low reciprocity = hub vectors that
    // appear in everyone's neighbor list without reciprocating — the
    // degraded-recall regime that tells an embedding pipeline to
    // re-normalize or re-train before serving. Mutuality is an exact
    // self-semi-join of the edge list on the swapped pair; the result
    // is two integers and one floor-ppm ratio — nothing float-ordered
    // survives to the output.
    Q(
      "emb_knn_reciprocity", {
        val planes = VectorOps.hyperplanes(Dim, 8, 7L)
        s"""WITH e AS (SELECT vec_id, embedding,
           |    ${Sql.bucket("embedding", planes)} AS bucket
           |  FROM embeddings),
           |c AS (SELECT a.vec_id AS src, b.vec_id AS dst,
           |    ROUND(${Sql.cos("a.embedding", "b.embedding")}, 6) AS cos
           |  FROM e a JOIN e b
           |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
           |k AS (SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER (PARTITION BY src
           |      ORDER BY cos DESC, dst) AS rn FROM c) WHERE rn <= 3),
           |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM k),
           |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_mutual FROM k x
           |  WHERE EXISTS (SELECT 1 FROM k y
           |                WHERE y.src = x.dst AND y.dst = x.src))
           |SELECT n_edges, n_mutual,
           |  CAST(n_mutual * 1000000 // n_edges AS BIGINT)
           |    AS reciprocity_ppm
           |FROM t, m ORDER BY n_edges""".stripMargin
      }
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .withColumn("bucket",
          VectorOps.lshBucket(col("embedding"), Dim, nBits = 8))
      val a = emb.select(col("bucket"), col("vec_id").as("src"),
        col("embedding").as("a_vec"))
      val b = emb.select(col("bucket").as("b_bucket"),
        col("vec_id").as("dst"), col("embedding").as("b_vec"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst"))
      val k = a.join(b, col("bucket") === col("b_bucket")
            && col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          round(VectorOps.cosine(col("a_vec"), col("b_vec")), 6)
            .as("cos"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("src"), col("dst"))
        .localCheckpoint()
      val t = k.agg(count(lit(1)).cast("long").as("n_edges"))
      val m = k.join(
          k.select(col("src").as("ysrc"), col("dst").as("ydst")),
          col("src") === col("ydst") && col("dst") === col("ysrc"),
          "left_semi")
        .agg(count(lit(1)).cast("long").as("n_mutual"))
      t.crossJoin(broadcast(m))
        .select(col("n_edges"), col("n_mutual"),
          expr("CAST(n_mutual * 1000000 div n_edges AS BIGINT)")
            .as("reciprocity_ppm"))
        .orderBy(col("n_edges"))
    },

    // --- graph-index ANN: committed k-NN graph + 2-hop beam serve --------
    // The graph-index alternative alongside IVF/PQ (the HNSW/NSG family
    // reduced to its Spark-native core): BUILD commits a directed k-NN
    // edge relation (degree M=32) as a snapshot table RANGE-SORTED on
    // src (each file covers a disjoint src range, recorded as manifest
    // min/max), and SERVE answers a query by greedy 2-hop expansion
    // over adjacency lists read OFF THE STORE: one batched stats-pruned
    // range read per hop (bounded probe sets, O(edges of probed files)
    // bytes — never the corpus), exact-cosine rerank of the ≤ M+M²
    // candidates, top-3.
    //
    // Build candidates = multi-table LSH (7 bits × 8 tables, the
    // emb_knn_lsh amplification; one 8-bit table measured 1/30 recall
    // from bucket starvation — 7 bits halves the seed-pair pool vs 6
    // with NO recall cost once NN-descent refines it, measured)
    // REFINED by one SAMPLED NN-DESCENT round
    // (Dong et al., WWW'11 — the billion-scale graph-build standard):
    // the neighbor-of-a-neighbor pool (undirected, so reverse edges
    // contribute), SAMPLED at the paper's ρ=0.5 by a deterministic
    // hash coin per directed adjacency entry, re-ranked to top-M
    // repairs the edges LSH missed. Measured on the recall harness
    // (GraphRecallLab, sf0.1/2000 vecs): LSH-only M=8 = 0.50 recall@3,
    // +full-pool NN-descent M=16 plateaus at 0.87 (disconnected LSH
    // component), M=24 + 1 full round = 0.97. Sampling at ρ=0.5 costs
    // recall at fixed degree (M=24: 0.97→0.87), and the paper's cure
    // is the right one here too — spend the saved pool on DEGREE:
    // M=32 + ρ=0.5 = 0.933 at sf0.1 (1.00 at sf0.01), above IVF's
    // 0.90, with ρ²·M² = 256·N NoN pairs vs the full-pool M=24's
    // 576·N — better recall AND a 2.25× cheaper round (ρ sweep in
    // DESIGN_NOTES). The
    // oracle replays build (LSH pool, sampled NN-descent round, top-M)
    // and walk flat in SQL, so a hash match proves the persisted index
    // serves exactly the walk's semantics; its recall rides
    // emb_recall_at_k's 'graph' row against the same brute-force truth
    // as IVF/LSH/PQ.
    Q(
      "emb_knn_graph", {
        val tables = (0 until 8).map { t =>
          val planes = VectorOps.hyperplanes(Dim, 7, 7L + 1000L * t)
          s"struct_pack(tbl := $t, bucket := ${Sql.bucket("embedding", planes)})"
        }.mkString(",\n    ")
        val qcos = Sql.cos("q.q_vec", "b.embedding")
        s"""WITH b0 AS (SELECT vec_id, embedding, unnest([
           |    $tables]) AS tb
           |  FROM embeddings),
           |x AS (SELECT vec_id, embedding, tb.tbl AS tbl,
           |    tb.bucket AS bucket FROM b0),
           |c AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
           |  FROM x a JOIN x b
           |    ON a.tbl = b.tbl AND a.bucket = b.bucket
           |      AND a.vec_id <> b.vec_id),
           |cs AS (SELECT c.src, c.dst,
           |    ROUND(${Sql.cos("ae.embedding", "be.embedding")}, 6) AS cos
           |  FROM c JOIN embeddings ae ON ae.vec_id = c.src
           |    JOIN embeddings be ON be.vec_id = c.dst),
           |k0 AS (SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER (PARTITION BY src
           |      ORDER BY cos DESC, dst) AS rn FROM cs) WHERE rn <= 32),
           |und AS (SELECT src, dst FROM k0
           |  UNION ALL SELECT dst AS src, src AS dst FROM k0),
           |su AS (SELECT src, dst FROM und
           |  WHERE ${graft.functions.TextOps.md5Low60Sql(
                 "CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)")}
           |      % 100 < 50),
           |nn AS (SELECT a.src, b.dst FROM su a JOIN su b
           |  ON a.dst = b.src AND a.src <> b.dst),
           |c1 AS (SELECT src, dst FROM k0 UNION SELECT src, dst FROM nn),
           |cs1 AS (SELECT c1.src, c1.dst,
           |    ROUND(${Sql.cos("ae.embedding", "be.embedding")}, 6) AS cos
           |  FROM c1 JOIN embeddings ae ON ae.vec_id = c1.src
           |    JOIN embeddings be ON be.vec_id = c1.dst),
           |k AS (SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER (PARTITION BY src
           |      ORDER BY cos DESC, dst) AS rn FROM cs1) WHERE rn <= 32),
           |q AS (SELECT vec_id AS q_id, embedding AS q_vec
           |  FROM embeddings WHERE vec_id < 10),
           |h1 AS (SELECT q.q_id, k.dst FROM q JOIN k ON k.src = q.q_id),
           |h2 AS (SELECT h1.q_id, k2.dst FROM h1
           |  JOIN k k2 ON k2.src = h1.dst),
           |cand AS (SELECT DISTINCT q_id, dst FROM (
           |    SELECT q_id, dst FROM h1
           |    UNION ALL SELECT q_id, dst FROM h2)
           |  WHERE dst <> q_id),
           |r AS (SELECT cand.q_id, cand.dst AS vec_id,
           |    ROUND($qcos, 6) AS cos,
           |    row_number() OVER (PARTITION BY cand.q_id
           |      ORDER BY ROUND($qcos, 6) DESC, cand.dst) AS rn
           |  FROM cand JOIN embeddings b ON b.vec_id = cand.dst
           |  JOIN q ON q.q_id = cand.q_id)
           |SELECT q_id, vec_id, cos, CAST(rn AS INT) AS rank
           |FROM r WHERE rn <= 3
           |ORDER BY q_id, rank""".stripMargin
      }
    ) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      knnGraphServe(s, d,
        s"${sys.props("java.io.tmpdir")}/graft_knn_graph/$tag/edges")
    }
  )

  /** BUILD + SERVE of the committed k-NN-graph index (`emb_knn_graph`):
    * the one-query shape. emb_recall_at_k instead builds ONCE per tier
    * ([[knnGraphBuild]]) and re-serves ([[knnGraphQuery]]) — same
    * result by construction, the index store is identical. Driver
    * state is bounded by the probe sets: |Q| query ids and the ≤ k·|Q|
    * 1-hop beam. */
  def knnGraphServe(s: SparkSession, d: String, table: String)
      : DataFrame = {
    val p = new org.apache.hadoop.fs.Path(table)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    val emb = Tables.embeddings(s, d)
    knnGraphBuild(s, emb, table)
    knnGraphQuery(s, emb, table)
  }

  /** BUILD half: LSH-seeded sampled NN-descent, committed range-sorted
    * on src (see [[knnGraphServe]]'s scaladoc for the design record). */
  private[queries] def knnGraphBuild(s: SparkSession, emb: DataFrame,
      table: String): Unit = {
    val withT = emb.withColumn("t",
      explode(VectorOps.lshTables(col("embedding"), Dim,
        nBits = 7, nTables = 8)))
    val a = withT.select(col("t"), col("vec_id").as("src"))
    val b = withT.select(col("t").as("b_t"), col("vec_id").as("dst"))
    // dedupe every candidate pool as NARROW (src, dst) pairs — a first
    // cut carried both 64-float vectors through the distinct's shuffle
    // and tripled the build (measured 30 s vs 9 at sf0.1); vectors
    // re-attach by two id equi-joins (the oracle's own shape). Graph
    // DEGREE M=32 (HNSW-class fanout), distinct from the k=3 the serve
    // returns: hop-1 probes 32 lists, rerank keeps 3.
    // clustering by src at session parallelism both spreads the
    // CPU-dense cosine re-rank (AQE byte-coalesced the scored pool to
    // 2 tasks at sf0.1 — the §2.5 bytes-vs-CPU trap again) and
    // pre-satisfies topM's window partitioning
    def scored(cand: DataFrame): DataFrame = cand
      .repartition(s.sparkContext.defaultParallelism, col("src"))
      .join(emb.select(col("vec_id").as("src"),
        col("embedding").as("a_vec")), Seq("src"))
      .join(emb.select(col("vec_id").as("dst"),
        col("embedding").as("b_vec")), Seq("dst"))
      .select(col("src"), col("dst"),
        round(VectorOps.cosine(col("a_vec"), col("b_vec")), 6)
          .as("cos"))
    def topM(sc: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst"))
      sc.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 32)
        .select(col("src"), col("dst"))
    }
    val pairs = a.join(b, col("t") === col("b_t")
          && col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    // ONE SAMPLED NN-DESCENT round over the LSH-seeded graph (Dong et
    // al., WWW'11): the undirected neighbor-of-a-neighbor pool
    // re-ranked to top-M repairs edges the hash tables missed. The pool
    // is SAMPLED at the paper's ρ=0.5 — each directed adjacency entry
    // enters the self-join iff a hash coin on its (src, dst) pair
    // selects it (hash-derived-uniform, the pipe_weighted_sample
    // discipline, so the oracle replays the identical sample) — cutting
    // the candidate constant ~ρ²·N·M² for the paper's typical <2%
    // recall cost (measured on GraphRecallLab: full-pool 0.97 recall@3
    // at sf0.1, see DESIGN_NOTES for the ρ sweep). localCheckpoint cuts
    // the lineage before the self-join (the iterative-plan discipline)
    // — N·M narrow rows, bounded.
    // (A score-reuse variant — checkpoint every seed pair's cos and
    // re-score only NN-descent's new pairs — measured SLOWER at sf0.1:
    // the 250k-row checkpoint plus two narrow joins cost more than the
    // saved cosine evals. Re-scoring the union is the cheaper shape.)
    val k0 = topM(scored(pairs)).localCheckpoint()
    val und = k0.unionByName(
      k0.select(col("dst").as("src"), col("src").as("dst")))
    val su = und.where(pmod(graft.functions.TextOps.md5Low60(
      concat_ws(":", col("src"), col("dst"))), lit(100)) < 50)
    val nn = su.select(col("src"), col("dst").as("mid"))
      .join(su.select(col("src").as("mid"), col("dst")), Seq("mid"))
      .select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    val edges = topM(scored(k0.unionByName(nn).distinct()))
    // range-sorted on src so each file's manifest min/max covers a
    // disjoint adjacency range — a probe read opens only its node's
    // file (the BM25-postings layout, src for term)
    graft.io.Snapshots.commitFull(
      edges.repartitionByRange(8, col("src")).withColumn("sp", lit(0)),
      table, "sp", statsCols = Seq("src"))
    ()
  }

  /** SERVE half: 2-hop beam over the committed adjacency store, exact
    * rerank, top-3 — reads only probed lists off the manifest. */
  private[queries] def knnGraphQuery(s: SparkSession, emb: DataFrame,
      table: String): DataFrame = {
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val qIds = queries.select(col("q_id")).collect()
      .map(_.getLong(0)).sorted.toSeq // |Q| = 10, bounded
    // BATCHED probe reads: one stats-pruned range read spanning the
    // probe set + an exact isin residual — 2 scans per hop instead of
    // one manifest resolution per probed node (a first cut paid ~40
    // scans for 10 queries). The range covers only files whose src
    // min/max overlap [min(ids), max(ids)]; scattered probe sets
    // over-read the gap files, the price of batching — the same
    // trade a term-batched BM25 serve makes.
    def lists(ids: Seq[Long]) = graft.io.Snapshots
      .readRange(s, table, "src", ids.min.toString, ids.max.toString)
      .where(col("src").isin(ids: _*))
    val h1 = lists(qIds).select(col("src").as("q_id"), col("dst"))
    val beam = h1.select(col("dst")).distinct().collect()
      .map(_.getLong(0)).sorted.toSeq // ≤ M·|Q| bounded
    val h2 =
      if (beam.isEmpty) h1.where(lit(false))
      else h1.join(
        lists(beam).select(col("src").as("dst"), col("dst").as("dst2")),
        Seq("dst"))
        .select(col("q_id"), col("dst2").as("dst"))
    val cand = h1.unionByName(h2)
      .where(col("dst") =!= col("q_id")).distinct()
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(emb.select(col("vec_id"), col("embedding")),
        col("vec_id") === col("dst"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
          .as("cos"))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= 3)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Unrolled 5-round power-iteration oracle (the perceptronChain /
    * bpeWithChain fixed-iteration replay pattern), all HUGEINT. */
  private lazy val PowerIterOracle: String = {
    val rounds = (1 to 5).map { k =>
      s"""s$k AS (SELECT c.i, SUM(c.c * v.val) AS s
         |  FROM c JOIN v${k - 1} v ON c.j = v.i GROUP BY c.i),
         |m$k AS (SELECT MAX(ABS(s)) AS m FROM s$k),
         |v$k AS (SELECT i,
         |    CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END AS HUGEINT)
         |      * (ABS(s) * 1000000 // m) AS val
         |  FROM s$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS (SELECT vec_id, CAST(i AS BIGINT) AS i,
       |    CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
       |      * 1000000) AS BIGINT) AS v
       |  FROM embeddings, UNNEST(range(1, 65)) AS u(i)),
       |c AS (SELECT a.i AS i, b.i AS j,
       |    SUM(CAST(a.v AS HUGEINT) * b.v) AS c
       |  FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i),
       |v0 AS (SELECT CAST(range AS BIGINT) AS i,
       |    CAST(1000000 AS HUGEINT) AS val FROM range(1, 65)),
       |$rounds
       |SELECT CAST(i AS BIGINT) AS dim, CAST(val AS BIGINT)
       |  AS component_ppm
       |FROM v5 ORDER BY dim NULLS FIRST""".stripMargin
  }
}
