package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (the Dataset-API counterpart of the
  * native-Expression kernels): user-defined aggregation with a typed,
  * MERGEABLE buffer — the contract that makes an aggregate correct under
  * partial aggregation, AQE re-partitioning, and retries at any scale.
  *
  * WeightedMean keeps exact integer-scaled sums (price cents as Long) so
  * the merge is associative and order-independent — the same
  * "exactness ⇒ partitioning-independence" rule the DECIMAL query sums
  * follow, expressed through the typed API.
  */
object TypedAggregators {

  /** (weight·value, weight) accumulated in integer cents — exact. */
  final case class WMBuf(num: Long, den: Long)

  /** Weighted mean of `value` (whole-number doubles) weighted by `weight`
    * (2-dp money doubles): numerator accumulates cents·value, denominator
    * cents. Both fit Long far beyond the test scale (2⁶³ ≈ 9e18 cents). */
  final class WeightedMean extends Aggregator[(Double, Double), WMBuf, Double] {
    private def cents(x: Double): Long = math.round(x * 100)

    override def zero: WMBuf = WMBuf(0L, 0L)
    override def reduce(b: WMBuf, a: (Double, Double)): WMBuf = {
      val (value, weight) = a
      WMBuf(b.num + cents(weight) * value.toLong, b.den + cents(weight))
    }
    override def merge(x: WMBuf, y: WMBuf): WMBuf =
      WMBuf(x.num + y.num, x.den + y.den)
    override def finish(b: WMBuf): Double =
      if (b.den == 0L) Double.NaN else b.num.toDouble / b.den
    override def bufferEncoder: Encoder[WMBuf] = Encoders.product[WMBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
