package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running sums WITHOUT a single-partition window — the
  * two-phase partition-ranges form every "cumulative under a total
  * order" query needs to survive scale (the `pipe_shard_manifest`
  * shape, factored out):
  *
  *  1. rows bucket by a caller-supplied range key that is MONOTONE
  *     NON-DECREASING in the global order (e.g. `cents div 4096` for
  *     ORDER BY cents; negate for a descending order);
  *  2. per-bucket totals — a frame of #buckets rows, orders of
  *     magnitude below the data — take the only ordered global window
  *     (exclusive running sum = each bucket's offset);
  *  3. offsets broadcast back onto a bucket-PARTITIONED local window.
  *
  * exclusive(row) = bucket offset + partition-local exclusive sum: no
  * executor ever sorts more than one bucket, the only global sort is
  * over the bucket frame, and the shuffle is the same hash exchange a
  * groupBy would pay. Equality with the single-partition window is
  * exact because ties in the order keys never straddle a bucket (the
  * bucket is a function of the leading order key).
  *
  * Caller contract: `bucket` monotone in the order; `order` a total
  * order WITHIN a bucket wherever the summed values differ (the usual
  * window determinism contract). Null order keys must be absent or
  * confined to one bucket.
  */
object RangeCum {

  /** Adds, for each `(value, outName)` pair, a column `outName` holding
    * the EXCLUSIVE global running sum of `value` (sum over all rows
    * strictly before this one in the global order; 0 for the first).
    * Null values count as 0 (sum ignores them). */
  def exclusive(df: DataFrame, bucket: Column, order: Seq[Column],
      sums: Seq[(Column, String)]): DataFrame = {
    require(sums.nonEmpty, "RangeCum.exclusive: no sums requested")
    // A NULL bucket would silently drop rows at the offsets equi-join
    // (NULL never equi-joins) — fail fast instead of losing data. The
    // guard lives INSIDE the consumed column so column pruning can't
    // elide it (raise_error's NullType branch coerces to bucket's type).
    val b = df.withColumn("_rc_bucket",
      when(bucket.isNull, raise_error(lit(
        "RangeCum.exclusive: bucket expression evaluated to NULL")))
        .otherwise(bucket))
    // phase 1: per-bucket totals -> exclusive offsets. The global
    // window here runs over the BUCKET frame (#buckets rows), never
    // the data.
    val wOff = Window.orderBy(col("_rc_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggs = sums.zipWithIndex.map { case ((v, _), i) =>
      sum(v).as(s"_rc_tot_$i")
    }
    val offsets = b.groupBy(col("_rc_bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_rc_bucket") +: sums.indices.map { i =>
        coalesce(sum(col(s"_rc_tot_$i")).over(wOff), lit(0L))
          .as(s"_rc_off_$i")
      }: _*)
    // phase 2: bucket-partitioned local exclusive sums + the offset
    val wLoc = Window.partitionBy(col("_rc_bucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = sums.zipWithIndex.foldLeft(b) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"_rc_loc_$i",
          coalesce(sum(v).over(wLoc), lit(0L)))
    }
    val joined = withLocal
      .join(broadcast(offsets), Seq("_rc_bucket"))
    val withOut = sums.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name, col(s"_rc_loc_$i") + col(s"_rc_off_$i"))
    }
    withOut.drop("_rc_bucket" +:
      sums.indices.flatMap(i => Seq(s"_rc_loc_$i", s"_rc_off_$i")): _*)
  }
}
