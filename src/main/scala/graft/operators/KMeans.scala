package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Broadcast Lloyd's k-means over an embedding column, built for the IVF
  * coarse-quantizer role (cf. the FAISS IVF construction; reference has no
  * vector ops — this is extension surface per the build brief).
  *
  * Scale shape, per iteration:
  *  - ASSIGNMENT is a narrow map: centroids are a driver-side literal
  *    (k × dim doubles — same bounded state MLlib's KMeans keeps), so each
  *    corpus row picks its nearest centroid with k codegen'd
  *    [[graft.functions.VectorL2Sq]] calls and NO join, NO shuffle;
  *  - UPDATE is one hash aggregate: posexplode → partial sums per
  *    (cid, dim) combine map-side, so the exchange carries ≤ k×dim rows
  *    per task regardless of corpus size.
  * Driver collects only the k×dim centroid table per iteration — never a
  * row set.
  *
  * Everything is engine-exact so an external SQL oracle can replay
  * training bit-for-bit: seeds are the k rows with the smallest
  * md5-derived hash (md5 of the DECIMAL-FREE string of vec_id — both
  * engines produce identical digests), per-component means use the 2⁵²
  * decimal trick (floats have 24-bit mantissas, so scaled products stay
  * integral), distances are a sequential fold, and argmin ties break on
  * the lower centroid id. A cluster that loses all members drops out on
  * both engines identically.
  */
object KMeans {

  final case class Centroid(cid: Int, cvec: Seq[Double])

  private val Scale = 4503599627370496L // 2^52

  /** Nearest centroid as a (d, cid) struct: min of per-centroid structs —
    * lexicographic struct order gives the tie-break for free, and each
    * distance is evaluated exactly once. Exposing the struct (not just
    * the id) lets callers keep the winning distance without a second
    * pass (SemDeDup-style representative selection needs it). */
  def nearestExpr(embedding: Column, cents: Seq[Centroid]): Column = {
    require(cents.nonEmpty, "no centroids")
    array_min(array(cents.map(c =>
      struct(
        VectorOps.l2sq(embedding,
          array(c.cvec.map(lit): _*)).as("d"),
        lit(c.cid).as("cid"))): _*))
  }

  /** Nearest-centroid id for an embedding column. */
  def assignExpr(embedding: Column, cents: Seq[Centroid]): Column =
    nearestExpr(embedding, cents).getField("cid")

  /** All-subspace nearest (d, cid) structs in one compiled kernel —
    * the PQ encoding form of [[nearestExpr]]; see
    * [[graft.functions.PqNearestAll]]. */
  def nearestAllExpr(embedding: Column, subDim: Int,
      books: Seq[Seq[Centroid]]): Column =
    VectorOps.pqNearestAll(embedding, subDim,
      books.map(_.map(c => (c.cid, c.cvec.toArray))))

  /** Deterministic hash-sampled seeds: the k vectors with the smallest
    * `md5(vec_id)`-derived 60-bit hash. TakeOrdered (no global sort), and
    * the hash is reproducible by any engine from the id alone. */
  private def seeds(emb: DataFrame, k: Int): Seq[Centroid] =
    emb.select(col("vec_id"), col("embedding"))
      .withColumn("h",
        conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
      .zipWithIndex
      .map { case (v, i) => Centroid(i, v) }
      .toSeq

  /** Exact per-(cid, component) means of the assigned vectors. */
  private def exactMeans(assigned: DataFrame): Seq[Centroid] = {
    val scale = lit(Scale)
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("cid"), col("p"))
      .agg((sum((col("v").cast("double") * scale).cast("decimal(38,0)"))
        .cast("double") / scale / count(lit(1))).as("comp"))
      .groupBy(col("cid"))
      .agg(transform(sort_array(collect_list(struct(col("p"), col("comp")))),
        x => x.getField("comp")).as("cvec"))
      .collect()
      .map(r => Centroid(r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_.cid)
      .toSeq
  }

  /** Train: deterministic seeds + `iters` Lloyd iterations.
    * @param emb frame with `vec_id: bigint`, `embedding: array<float>` */
  def fit(emb: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    var cents = seeds(emb, k)
    var i = 0
    while (i < iters) {
      cents = exactMeans(
        emb.withColumn("cid", assignExpr(col("embedding"), cents)))
      i += 1
    }
    cents
  }

  /** Product-quantization trainer: `m` independent k-means fits, one per
    * contiguous `subDim`-wide coordinate slice, FUSED into one corpus
    * scan + ONE aggregate per Lloyd iteration (vs m separate fits = 3m
    * jobs: at 100 TB the corpus scan dominates, so per-subspace passes
    * multiply the dominant cost by m for no reason). Bit-identical to
    * `fit` on each slice — proven in KMeansSpec:
    *  - the seed ROWS are slice-independent (the hash orders on vec_id
    *    alone), so one TakeOrdered yields every subspace's seed slices;
    *  - assignment runs all m argmins in the one compiled
    *    [[graft.functions.PqNearestAll]] kernel (bit-equal to m
    *    [[nearestExpr]] slices — the compositional form builds a
    *    100s-of-node tree that falls out of codegen, measured 4–5×
    *    slower);
    *  - the (s, cid, pos) means use the same 2⁵²-decimal exact sum,
    *    which is order-independent, so fusing the m aggregates into one
    *    cannot change a single component.
    * Driver state stays m × k × subDim doubles. */
  def fitMulti(emb: DataFrame, m: Int, subDim: Int, k: Int,
      iters: Int): Seq[Seq[Centroid]] = {
    val seedRows = emb.select(col("vec_id"), col("embedding"))
      .withColumn("h",
        conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    var cents: Seq[Seq[Centroid]] = (0 until m).map { s =>
      seedRows.zipWithIndex.map { case (v, i) =>
        Centroid(i, v.slice(s * subDim, (s + 1) * subDim).toSeq)
      }.toSeq
    }
    val scale = lit(Scale)
    var it = 0
    while (it < iters) {
      // all m assignments in ONE compiled kernel call per corpus row,
      // zipped with the vector BEFORE the explode so the kernel sits in
      // the Generate's input (an element_at(cids,...) above the explode
      // gets CollapseProject-inlined and re-runs the kernel once per
      // EXPLODED row — dim× the work; seen in the plan and measured ~2×
      // on the whole fit). The subspace and in-subspace position fall
      // out of the global position arithmetically.
      val cidsArr = VectorOps.pqAssignAll(col("embedding"), subDim,
        cents.map(_.map(c => (c.cid, c.cvec.toArray))))
      val rep = flatten(transform(cidsArr,
        c => array_repeat(c, subDim)))
      val rows = emb
        .select(posexplode(
          arrays_zip(rep.as("cid"), col("embedding").as("v")))
          .as(Seq("gp", "z")))
        .select(
          (col("gp") / subDim).cast("int").as("s"),
          col("z.cid").as("cid"),
          pmod(col("gp"), lit(subDim)).as("p"), col("z.v").as("v"))
        .groupBy(col("s"), col("cid"), col("p"))
        .agg((sum((col("v").cast("double") * scale).cast("decimal(38,0)"))
          .cast("double") / scale / count(lit(1))).as("comp"))
        .groupBy(col("s"), col("cid"))
        .agg(transform(
          sort_array(collect_list(struct(col("p"), col("comp")))),
          x => x.getField("comp")).as("cvec"))
        .collect()
      cents = (0 until m).map { s =>
        rows.filter(_.getInt(0) == s)
          .map(r => Centroid(r.getInt(1), r.getSeq[Double](2)))
          .sortBy(_.cid)
          .toSeq
      }
      it += 1
    }
    cents
  }
}
