package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located fact-fact joins.
  *
  * At 100 TB the recurring cost in the star-schema workload is the
  * lineitem ⋈ orders shuffle: every query pays a full exchange of both
  * fact tables on the join key. Bucketing both tables by that key at
  * write time (`bucketBy(n, key) + sortBy(key)`) makes the partitioning
  * a property of the STORAGE — Catalyst then plans the join with zero
  * exchanges (and zero sorts when sortBy matches), paying the shuffle
  * once at ingestion instead of per query. Same trade Hive/Iceberg
  * bucket layouts make.
  *
  * Bucket count guidance: targets ~128–512 MB per bucket file at the
  * expected table size; both sides must use the same count (or a
  * multiple, with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Persist `df` as a catalog table bucketed (+ sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction (assert via plan: no Exchange above either scan). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
