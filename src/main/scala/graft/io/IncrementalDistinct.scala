package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained keyed DISTINCT-count state — the sketch
  * sibling of [[IncrementalAgg]]: where that keeps (n, sum_cents) per
  * key, this keeps one binary DataSketches HLL sketch per key, so
  * applying a batch reads current state (O(keys × sketch bytes)) and the
  * batch, never the raw history — the only way "distinct users ever, per
  * key" stays maintainable at 100 TB (an exact incremental distinct
  * would hold every id in state forever; cf. the streaming KMV in
  * `Streaming.approxDistinctUsers`, which makes the same trade per
  * event-type key).
  *
  * Merging is the HLL union of the stored sketch with the batch's
  * sketch. Register-max union is insertion-order independent, so the
  * merged sketch — and therefore every estimate served — is EXACTLY the
  * sketch a from-scratch rebuild over all batches would produce
  * (IncrementalDistinctSpec asserts estimate equality literally, not
  * within tolerance).
  *
  * Durability and exactly-once reuse [[VersionedState]] verbatim:
  * complete `v{N}` directories, `_CURRENT` flipped last, `_applied`
  * batch ids making replays no-ops.
  */
object IncrementalDistinct {

  /** Live (keys..., sk) sketch state. At version 0 the empty frame takes
    * key TYPES from `keyTemplate` when given (the IncrementalAgg v0
    * lesson: a fabricated string key would freeze the wrong type into
    * the first merge); the sketch column is binary either way. */
  def read(spark: SparkSession, statePath: String, keys: Seq[String],
      keyTemplate: Option[DataFrame] = None): DataFrame = {
    val v = VersionedState.currentVersion(spark, statePath)
    if (v == 0) {
      keyTemplate match {
        case Some(t) =>
          t.select(keys.map(col): _*).limit(0)
            .withColumn("sk", lit(null).cast("binary"))
        case None =>
          val key = keys.map(k => s"'' AS $k").mkString(", ")
          spark.sql(
            s"SELECT $key, CAST(NULL AS BINARY) AS sk").limit(0)
      }
    } else
      spark.read.parquet(
        s"${VersionedState.versionDir(statePath, v)}/agg")
  }

  /** The served view: per-key distinct estimates from the live state. */
  def estimates(spark: SparkSession, statePath: String, keys: Seq[String],
      keyTemplate: Option[DataFrame] = None): DataFrame =
    read(spark, statePath, keys, keyTemplate)
      .select(keys.map(col) :+
        hll_sketch_estimate(col("sk")).as("distinct_est"): _*)

  /** Batch ids already folded into the live state. */
  def appliedBatches(spark: SparkSession, statePath: String): Set[String] = {
    val v = VersionedState.currentVersion(spark, statePath)
    if (v == 0) Set.empty
    else spark.read.parquet(
      s"${VersionedState.versionDir(statePath, v)}/_applied")
      .collect().map(_.getString(0)).toSet
  }

  /** Fold `batch` (keys + `valueCol`, NULL values ignored like any
    * distinct count) into the state under `batchId`. Returns the live
    * state after the call — unchanged if the id was already applied. */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
      keys: Seq[String], valueCol: String, batchId: String): DataFrame = {
    import spark.implicits._
    if (appliedBatches(spark, statePath).contains(batchId))
      return read(spark, statePath, keys, Some(batch))

    val cur = read(spark, statePath, keys, Some(batch))
    val delta = batch
      .where(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sk"))
    val curK = keys.foldLeft(cur)((d, k) => d.withColumnRenamed(k, s"_$k"))
      .withColumnRenamed("sk", "_sk")
    val joinCond = keys.map(k => col(s"_$k") <=> col(k)).reduce(_ && _)
    val merged = curK.join(delta, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"_$k")).as(k)) :+
          when(col("_sk").isNull, col("sk"))
            .when(col("sk").isNull, col("_sk"))
            .otherwise(hll_union(col("_sk"), col("sk"))).as("sk"): _*)

    val v = VersionedState.currentVersion(spark, statePath)
    val next = VersionedState.versionDir(statePath, v + 1)
    merged.write.mode("overwrite").parquet(s"$next/agg")
    (appliedBatches(spark, statePath) + batchId).toSeq.toDF("batch_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$next/_applied")
    VersionedState.publish(spark, statePath, v + 1)
    read(spark, statePath, keys)
  }
}
