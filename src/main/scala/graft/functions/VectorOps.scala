package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector kernels for similarity search.
  *
  * Why a native expression and not `aggregate`/`zip_with`: Spark's
  * higher-order functions evaluate their lambda per element through the
  * interpreted path (no whole-stage codegen), which is the difference
  * between ~ns and ~µs per element on a 64-dim float vector. KNN over
  * N×M candidate pairs runs this kernel N·M times — it IS the workload —
  * so it gets the custom-Expression treatment (build-brief preference
  * order (b)). Fixed-width float loop, no allocation, codegen splices a
  * static call into the fused stage.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires two array<float>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.dotKernel($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDot = copy(newLeft, newRight)
}

/** Squared L2 distance between a float[] vector and a double[] centroid —
  * the k-means / IVF-probe hot kernel. Same codegen rationale as
  * [[VectorDot]]: assignment evaluates this k times per corpus row per
  * Lloyd iteration. Fold order matches a row-local sequential fold
  * (subtract in double, square, left-to-right sum) so any other engine
  * reproduces the bits. */
case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_l2sq requires array<float>, array<double>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sqKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.l2sqKernel($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorL2Sq = copy(newLeft, newRight)
}

/** All-subspace nearest-centroid search in ONE compiled kernel — the PQ
  * training/encoding hot path. Composing it from m × k `array_min`-of-
  * struct [[VectorL2Sq]] expressions is semantically identical but
  * builds a 100s-of-nodes tree that falls out of whole-stage codegen
  * (measured: 22.8 s vs 4–6 s for the same assignment at sf0.1) and
  * re-evaluates each `slice` k times. Here the m argmin loops run as
  * one tight JVM method over the raw float array — one virtual call per
  * row, zero allocation until the m-element result.
  *
  * Semantics are BIT-IDENTICAL to the compositional form (spec-proven):
  * per subspace s the distance is [[VectorOps.l2sqKernel]]'s sequential
  * (float−double)² fold over `min(subDim, remaining, centroid.length)`
  * components, and the argmin tie-breaks on the lower centroid id —
  * `java.lang.Double.compare` gives the same total order Catalyst's
  * struct min uses (distances are Σ of squares, so −0.0 never occurs
  * and NaN sorts greatest on both paths).
  *
  * `withDist=true` → `array<struct<d:double, cid:int>>` (encoding keeps
  * the winning distance for recon_err); `withDist=false` →
  * `array<int>` of cids (training needs only assignments). Centroid
  * tables ride the expression (m × k × subDim doubles — broadcast-sized
  * driver state, same as MLlib's KMeans model).
  */
case class PqNearestAll(child: Expression, subDim: Int,
    cids: Array[Array[Int]], cvecs: Array[Array[Array[Double]]],
    withDist: Boolean) extends UnaryExpression {

  require(cids.length == cvecs.length && cids.nonEmpty &&
    cids.forall(_.nonEmpty), "need >=1 centroid per subspace")

  override def dataType: DataType =
    if (withDist) ArrayType(StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("cid", IntegerType, nullable = false))),
      containsNull = false)
    else ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_nearest_all requires array<float>, got ${t.catalogString}")
    }

  def kernel(embRaw: Any): ArrayData = {
    val emb = embRaw.asInstanceOf[ArrayData]
    val m = cids.length
    val embLen = emb.numElements()
    val outCids = if (withDist) null else new Array[Int](m)
    val outStructs =
      if (withDist) new Array[Any](m) else null
    var s = 0
    while (s < m) {
      val base = s * subDim
      val scids = cids(s)
      val svecs = cvecs(s)
      val avail = math.max(0, embLen - base)
      var bestD = 0.0
      var bestCid = 0
      var j = 0
      while (j < scids.length) {
        val cv = svecs(j)
        val n = math.min(math.min(subDim, avail), cv.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = emb.getFloat(base + i).toDouble - cv(i)
          acc += d * d
          i += 1
        }
        // same total order as Catalyst's struct-min on (d, cid):
        // Double.compare handles NaN-greatest; ties keep the earlier
        // (lower, since each codebook is cid-sorted) centroid id
        if (j == 0 || {
          val c = java.lang.Double.compare(acc, bestD)
          c < 0 || (c == 0 && scids(j) < bestCid)
        }) { bestD = acc; bestCid = scids(j) }
        j += 1
      }
      if (withDist)
        outStructs(s) = org.apache.spark.sql.catalyst.InternalRow(
          bestD, bestCid)
      else outCids(s) = bestCid
      s += 1
    }
    if (withDist)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(outStructs)
    else
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(outCids)
  }

  override def nullSafeEval(a: Any): Any = kernel(a)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNearestAll", this,
      classOf[PqNearestAll].getName)
    defineCodeGen(ctx, ev, a => s"$ref.kernel($a)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqNearestAll = copy(child = newChild)
}

object VectorOps {

  /** Sequential left-to-right accumulation (deterministic, matches a
    * row-local fold in any other engine). */
  def dotKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  /** Sequential (float - double)² fold; see [[VectorL2Sq]]. */
  def l2sqKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def l2sq(a: Column, b: Column): Column =
    column(VectorL2Sq(expression(a), expression(b)))

  /** All-subspace PQ argmin as `array<struct<d,cid>>`; see
    * [[PqNearestAll]]. `cents(s)` is the (cid, centroid) codebook for
    * subspace s, cid-sorted. */
  def pqNearestAll(emb: Column, subDim: Int,
      cents: Seq[Seq[(Int, Array[Double])]]): Column =
    column(PqNearestAll(expression(emb), subDim,
      cents.map(_.map(_._1).toArray).toArray,
      cents.map(_.map(_._2).toArray).toArray, withDist = true))

  /** All-subspace PQ argmin as `array<int>` of centroid ids. */
  def pqAssignAll(emb: Column, subDim: Int,
      cents: Seq[Seq[(Int, Array[Double])]]): Column =
    column(PqNearestAll(expression(emb), subDim,
      cents.map(_.map(_._1).toArray).toArray,
      cents.map(_.map(_._2).toArray).toArray, withDist = false))

  def normL2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (normL2(a) * normL2(b))

  /** Random-hyperplane LSH bucket key (Charikar 2002): sign bit of the
    * dot product against `nBits` seeded pseudo-random hyperplanes, packed
    * into a long. Cosine-close vectors collide with high probability →
    * ANN candidate generation becomes a bucket equi-join, the scale path
    * for similarity search over billions of vectors. Hyperplanes are
    * deterministic (fixed seed) so bucket assignment is reproducible. */
  /** The seeded hyperplane family behind [[lshBucket]]/[[lshTables]] —
    * public so an external auditor (or the correctness oracle) can
    * replay bucket assignment: the planes are plain float constants, and
    * the sign of a sequential-fold dot product is engine-independent. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Corpus-sized LSH bucket width: the smallest `b` in
    * [minBits, maxBits] with expected occupancy `n / 2^b ≤ targetOcc`
    * — the production knob that keeps within-bucket pair volume
    * LINEAR in corpus size (fixed width goes quadratic once buckets
    * saturate: occupancy ∝ n ⇒ pairs ∝ n²). Integer ladder, no
    * floating-point log: the same comparison chain is replayable
    * verbatim in any SQL engine (the DuckDB oracle emits it as a CASE
    * ladder), so width choice can never diverge across engines.
    * [[hyperplanes]] is prefix-stable in `nBits` (one sequential
    * seeded stream), so widening only APPENDS bits — a pair of
    * identical vectors collides at every width, and the narrow
    * bucket is always a coarsening of the wide one. */
  def lshWidthFor(n: Long, targetOcc: Int = 8, minBits: Int = 8,
      maxBits: Int = 24): Int =
    (minBits to maxBits).find(b => n <= (targetOcc.toLong << b))
      .getOrElse(maxBits)

  def lshBucket(vec: Column, dim: Int, nBits: Int,
      seed: Long = 7L): Column = {
    val planes = hyperplanes(dim, nBits, seed)
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(v => lit(v)): _*).cast("array<float>")
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Multi-table LSH (OR-amplification, the FLANN/FAISS construction):
    * `nTables` independent `nBits`-bit keys; a pair is a candidate if it
    * collides in ANY table. Per-table collision prob for angle θ is
    * (1-θ/π)^nBits, union over tables amplifies recall: e.g. cosine 0.9
    * pairs at 6 bits × 8 tables ⇒ ~98% recall, while each table still
    * prunes the corpus to 1/2^nBits per bucket. Single-table sign-LSH has
    * near-zero recall for moderate-similarity neighbors — measured on the
    * test corpus — which is why the tables axis exists. Returns an array
    * of (table, bucket) structs to explode + equi-join on. */
  def lshTables(vec: Column, dim: Int, nBits: Int, nTables: Int,
      seed: Long = 7L): Column =
    array((0 until nTables).map { t =>
      struct(lit(t).as("table"),
        lshBucket(vec, dim, nBits, seed + 1000L * t).as("bucket"))
    }: _*)
}
