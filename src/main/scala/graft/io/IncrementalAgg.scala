package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained keyed aggregate — the batch view a daily
  * pipeline serves dashboards from without rescanning history: state is
  * (key, n, sum_cents) per key; applying a batch reads the CURRENT
  * state (O(keys)) and the batch (O(batch)), never the raw history.
  * `sum` is kept in integer cents (DECIMAL(18,2)·100 → LONG), so merge
  * order can never change a result — the same additive-exactness rule
  * the DQ counters follow.
  *
  * Durability is a miniature snapshot protocol (the poor man's table
  * format, same family as the streaming CdcView's bucketed state):
  *
  *  - each update writes a COMPLETE new version directory `v{N+1}`
  *    (aggregate parquet + `_applied` parquet of batch ids);
  *  - `_CURRENT` (a one-line file naming the live version) is written
  *    LAST via write-temp + rename — readers either see the old
  *    complete version or the new complete version, never a partial;
  *  - a crash mid-update leaves an orphan `v{N+1}` that the retry
  *    simply overwrites (version numbers derive from `_CURRENT`, not
  *    from directory listings).
  *
  * Exactly-once under at-least-once drivers: every batch carries an id;
  * ids live in the state (`_applied`), and re-applying a known id is a
  * NO-OP — the replayed batch cannot double-count (IncrementalAggSpec
  * proves replay convergence and the crash window).
  *
  * At 100 TB: state is keyed and bucketable (one shuffle per update on
  * the key), `_applied` is O(batches), and the version directories are
  * O(keys) each — compaction of old versions is a delete of `v{i<N}`.
  */
object IncrementalAgg {

  // version/publish protocol shared with IncrementalDistinct
  private def currentVersion(spark: SparkSession, statePath: String): Int =
    VersionedState.currentVersion(spark, statePath)

  private def versionDir(statePath: String, v: Int) =
    VersionedState.versionDir(statePath, v)

  /** Live aggregate. At version 0 the empty frame's key columns take
    * their types from `keyTemplate` when given (pass the batch — a
    * hardcoded STRING key would otherwise coerce non-string batch keys
    * to string in the first full_outer merge and freeze that type into
    * every published snapshot); with no template, string is the only
    * available guess. */
  def read(spark: SparkSession, statePath: String, keys: Seq[String],
      keyTemplate: Option[DataFrame] = None): DataFrame = {
    val v = currentVersion(spark, statePath)
    if (v == 0) {
      keyTemplate match {
        case Some(t) =>
          t.select(keys.map(col): _*).limit(0)
            .withColumn("n", lit(0L)).withColumn("sum_cents", lit(0L))
        case None =>
          val key = keys.map(k => s"'' AS $k").mkString(", ")
          spark.sql(s"SELECT $key, 0L AS n, 0L AS sum_cents").limit(0)
      }
    } else spark.read.parquet(s"${versionDir(statePath, v)}/agg")
  }

  /** Batch ids already folded into the live state. */
  def appliedBatches(spark: SparkSession, statePath: String): Set[String] = {
    val v = currentVersion(spark, statePath)
    if (v == 0) Set.empty
    else spark.read.parquet(s"${versionDir(statePath, v)}/_applied")
      .collect().map(_.getString(0)).toSet
  }

  /** Fold `batch` (keys + `valueCol`) into the state under `batchId`.
    * Returns the live aggregate after the call — unchanged if the id
    * was already applied. */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
      keys: Seq[String], valueCol: String, batchId: String): DataFrame = {
    import spark.implicits._
    if (appliedBatches(spark, statePath).contains(batchId))
      return read(spark, statePath, keys, Some(batch))

    val cur = read(spark, statePath, keys, Some(batch))
    val delta = batch
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum((col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
          .as("sum_cents"))
    val curK = keys.foldLeft(cur)((d, k) => d.withColumnRenamed(k, s"_$k"))
      .withColumnRenamed("n", "_n").withColumnRenamed("sum_cents", "_s")
    val joinCond = keys.map(k => col(s"_$k") <=> col(k)).reduce(_ && _)
    val merged = curK.join(delta, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"_$k")).as(k)) ++ Seq(
          (coalesce(col("_n"), lit(0L)) + coalesce(col("n"), lit(0L)))
            .as("n"),
          (coalesce(col("_s"), lit(0L)) + coalesce(col("sum_cents"), lit(0L)))
            .as("sum_cents")): _*)

    val v = currentVersion(spark, statePath)
    val next = versionDir(statePath, v + 1)
    merged.write.mode("overwrite").parquet(s"$next/agg")
    (appliedBatches(spark, statePath) + batchId).toSeq.toDF("batch_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$next/_applied")
    VersionedState.publish(spark, statePath, v + 1)
    read(spark, statePath, keys)
  }
}
