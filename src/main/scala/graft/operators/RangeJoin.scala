package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join, decomposed Spark-first.
  *
  * Spark has no range-join optimization: `points JOIN intervals ON p >=
  * lo AND p < hi` plans as BroadcastNestedLoopJoin (every point × every
  * interval — O(n·m) comparisons, a cluster-killer when the interval
  * side outgrows a broadcast). The standard decomposition (the same one
  * behind range-join hints in engines that have them) turns it into an
  * equi-join:
  *
  *  - intervals explode to the fixed-width buckets they overlap
  *    (`sequence(floor(lo/w), floor(hi/w))`);
  *  - points map to exactly one bucket (`floor(p/w)`);
  *  - equi-join on the bucket id — shuffle-partitionable, AQE-skew-
  *    splittable, broadcastable when the exploded side is small;
  *  - the exact `[lo, hi)` predicate stays as a join residual, filtering
  *    the boundary false-positives the bucket overlap admits.
  *
  * Cost: O(points + intervals · span/w + true_matches) instead of
  * O(points · intervals). `bucketWidth` trades interval replication
  * (≈ span/w copies each) against per-bucket candidate density — set it
  * near the median interval span so most intervals copy ≤ 2×.
  */
object RangeJoin {

  /** Join each point row to every interval row whose `[lo, hi)` contains
    * the point. Output: point columns ++ interval columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / w).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
