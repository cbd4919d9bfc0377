package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
