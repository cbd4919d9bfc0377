package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", 2019) as a mergeable distributed
  * aggregate — the quantile member of the engine's sketch family, next
  * to HLL (distinct counts), KMV (set algebra) and Misra–Gries (heavy
  * hitters).
  *
  * A digest is a sorted list of (mean, weight) centroids whose sizes are
  * bounded by the k₁ scale function k(q) = (δ/2π)·asin(2q−1): a cluster
  * may absorb its neighbor only while the merged span costs ≤ 1 unit of
  * k — tight at the tails (q→0,1 clusters hold few points) and loose in
  * the middle, which is what gives the digest its signature
  * relative-accuracy-at-the-tails profile with only O(δ) centroids.
  * Merging two digests = concatenate centroid lists, re-run the same
  * size-bounded merge pass — the error bound is preserved (ibid. §3), so
  * the aggregate fits Spark's partial/final two-phase aggregation: each
  * task digests its partition, reducers merge O(δ)-byte states, and the
  * shuffle never carries raw values. The store/serve split mirrors the
  * HLL rollup queries: persist a per-partition digest column (binary),
  * serve any rollup later by `merge_agg` + `quantile` without touching
  * the raw rows again — at 100 TB the nightly quantile report reads
  * days × O(δ) bytes, not the lake.
  *
  * Determinism note: a digest's centroid layout depends on input
  * encounter order, so served quantiles are approximate VALUES that vary
  * run-to-run within the error envelope — correctness is therefore
  * asserted in rank space (count of rows below the served estimate vs
  * the target rank), the same contract `q_value_percentiles_approx`
  * uses for Spark's own GK sketch.
  */
object TDigest {

  /** Aggregation state: compressed centroids plus an append buffer that
    * amortizes the O(δ log δ) merge pass over `BufferCap` arrivals. */
  final class State(val compression: Int) {
    var means: ArrayBuffer[Double] = ArrayBuffer.empty
    var weights: ArrayBuffer[Long] = ArrayBuffer.empty
    val pendingM: ArrayBuffer[Double] = ArrayBuffer.empty
    val pendingW: ArrayBuffer[Long] = ArrayBuffer.empty

    def add(mean: Double, weight: Long): Unit = {
      pendingM += mean
      pendingW += weight
      if (pendingM.size >= TDigest.BufferCap) compress()
    }

    /** The Dunning merge pass: sort all centroids by mean, then greedily
      * grow clusters while the k₁ budget allows. */
    def compress(): Unit = {
      if (pendingM.isEmpty) return
      val n = means.size + pendingM.size
      val m = new Array[Double](n)
      val w = new Array[Long](n)
      means.copyToArray(m); pendingM.copyToArray(m, means.size)
      weights.copyToArray(w); pendingW.copyToArray(w, weights.size)
      pendingM.clear(); pendingW.clear()
      val idx = (0 until n).sortBy(m(_)).toArray
      val total = { var s = 0L; var i = 0; while (i < n) { s += w(i); i += 1 }; s }
      val outM = ArrayBuffer.empty[Double]
      val outW = ArrayBuffer.empty[Long]
      var cm = m(idx(0)) // running cluster (weighted mean, weight)
      var cw = w(idx(0))
      var wSoFar = 0L // weight of CLOSED clusters
      var qLimit = kInv(k(0.0) + 1.0)
      var i = 1
      while (i < n) {
        val nm = m(idx(i)); val nw = w(idx(i))
        if ((wSoFar + cw + nw).toDouble / total <= qLimit) {
          cm = cm + (nm - cm) * nw / (cw + nw) // stable weighted mean
          cw += nw
        } else {
          outM += cm; outW += cw
          wSoFar += cw
          qLimit = kInv(k(wSoFar.toDouble / total) + 1.0)
          cm = nm; cw = nw
        }
        i += 1
      }
      outM += cm; outW += cw
      means = outM
      weights = outW
    }

    private def k(q: Double): Double =
      compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)
    private def kInv(kVal: Double): Double = {
      val s = math.sin(kVal * 2.0 * math.Pi / compression)
      math.min(1.0, (s + 1.0) / 2.0)
    }

    def totalWeight: Long = {
      var s = 0L; var i = 0
      while (i < weights.size) { s += weights(i); i += 1 }
      s
    }

    /** Quantile by midpoint interpolation over the centroid chain. */
    def quantile(q: Double): Option[Double] = {
      compress()
      val n = means.size
      if (n == 0) return None
      if (n == 1) return Some(means(0))
      val total = totalWeight
      val index = q * total
      // midpoint cumulative position of centroid i
      var cumBefore = 0L
      var prevMid = weights(0) / 2.0
      if (index <= prevMid) return Some(means(0))
      var i = 1
      while (i < n) {
        cumBefore += weights(i - 1)
        val mid = cumBefore + weights(i) / 2.0
        if (index <= mid) {
          val f = (index - prevMid) / (mid - prevMid)
          return Some(means(i - 1) + f * (means(i) - means(i - 1)))
        }
        prevMid = mid
        i += 1
      }
      Some(means(n - 1))
    }

    def serialized: Array[Byte] = {
      compress()
      val bytes = new ByteArrayOutputStream()
      val out = new DataOutputStream(bytes)
      out.writeInt(compression)
      out.writeInt(means.size)
      var i = 0
      while (i < means.size) {
        out.writeDouble(means(i)); out.writeLong(weights(i)); i += 1
      }
      out.flush()
      bytes.toByteArray
    }

    /** Fold another serialized digest into this state. */
    def absorb(data: Array[Byte]): Unit = {
      val in = new DataInputStream(new ByteArrayInputStream(data))
      in.readInt() // compression of the incoming sketch; ours governs
      val n = in.readInt()
      var i = 0
      while (i < n) { add(in.readDouble(), in.readLong()); i += 1 }
    }
  }

  val BufferCap = 512

  def fromBytes(data: Array[Byte]): State = {
    val in = new DataInputStream(new ByteArrayInputStream(data))
    val s = new State(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { s.add(in.readDouble(), in.readLong()); i += 1 }
    s
  }

  /** Column API: value column → binary digest. */
  def sketch_agg(values: Column, compression: Int = 200): Column =
    column(TDigestAgg(expression(values), compression,
      mergeInput = false).toAggregateExpression())

  /** Column API: binary digest column → merged binary digest. */
  def merge_agg(sketches: Column, compression: Int = 200): Column =
    column(TDigestAgg(expression(sketches), compression,
      mergeInput = true).toAggregateExpression())

  /** Column API: served quantile estimate from a binary digest. */
  def quantile(sketch: Column, q: Double): Column =
    column(TDigestQuantile(expression(sketch), q))
}

/** The aggregate. With `mergeInput = false` the child is a DOUBLE value
  * column (build a digest from raw rows); with `mergeInput = true` the
  * child is a BINARY digest column (union previously stored digests).
  * One class serves both so the merge pass, scale function, and
  * serialization cannot drift between the build and rollup paths.
  */
case class TDigestAgg(
    child: Expression,
    compression: Int,
    mergeInput: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest.State]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (compression < 20) {
      TypeCheckResult.TypeCheckFailure("tdigest compression must be >= 20")
    } else if (mergeInput && child.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"tdigest_merge requires binary, got ${child.dataType.catalogString}")
    } else if (!mergeInput && child.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"tdigest requires double, got ${child.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TDigest.State =
    new TDigest.State(compression)

  override def update(buf: TDigest.State, input: InternalRow): TDigest.State = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeInput) buf.absorb(v.asInstanceOf[Array[Byte]])
      else buf.add(v.asInstanceOf[Double], 1L)
    }
    buf
  }

  override def merge(a: TDigest.State, b: TDigest.State): TDigest.State = {
    b.compress()
    var i = 0
    while (i < b.means.size) { a.add(b.means(i), b.weights(i)); i += 1 }
    a
  }

  override def eval(buf: TDigest.State): Any = buf.serialized

  override def serialize(buf: TDigest.State): Array[Byte] = buf.serialized

  override def deserialize(data: Array[Byte]): TDigest.State =
    TDigest.fromBytes(data)

  override def withNewMutableAggBufferOffset(offset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): TDigestAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression)
      : TDigestAgg = copy(child = newChild)

  override def prettyName: String =
    if (mergeInput) "tdigest_merge" else "tdigest"
}

/** Scalar extractor: serves one quantile from a serialized digest. Cold
  * path by design (runs on rollup rows — days, types — never on the raw
  * corpus), so CodegenFallback costs nothing measurable.
  */
case class TDigestQuantile(child: Expression, q: Double)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (q < 0.0 || q > 1.0) {
      TypeCheckResult.TypeCheckFailure("quantile q must be in [0, 1]")
    } else if (child.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"tdigest_quantile requires binary, got ${child.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    TDigest.fromBytes(input.asInstanceOf[Array[Byte]])
      .quantile(q).map(Double.box).orNull

  override protected def withNewChildInternal(newChild: Expression)
      : TDigestQuantile = copy(child = newChild)

  override def prettyName: String = "tdigest_quantile"
}
