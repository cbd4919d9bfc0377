package graft.io

import org.apache.spark.sql.SparkSession

/** Query-layer catalog registration (SURVEY §2.2 K5, §3.2): the Spark
  * equivalent of the reference's Athena external table + MSCK REPAIR
  * (ref: sql/athena/curated_events.sql:1-14).
  *
  * Once registered, queries run as `spark.table("curated_events")` /
  * `spark.sql(...)` with partition pruning from the catalog
  * (PruneFileSourcePartitions): a `WHERE ingestion_date = d` scans one
  * directory regardless of table size — the property that keeps the
  * query layer O(partition), not O(table), at 100 TB.
  */
object Catalog {

  /** CREATE EXTERNAL TABLE … PARTITIONED BY … STORED AS PARQUET. */
  def registerCuratedEvents(spark: SparkSession, curatedBase: String,
      table: String = "curated_events"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table (
         |  event_id string,
         |  user_id string,
         |  event_type string,
         |  event_ts timestamp,
         |  amount double,
         |  processing_ts timestamp,
         |  ingestion_date string)
         |USING PARQUET
         |PARTITIONED BY (ingestion_date)
         |LOCATION '$curatedBase'""".stripMargin)
    recoverPartitions(spark, table)
  }

  /** MSCK REPAIR TABLE ≡ recoverPartitions — discover `ingestion_date=`
    * dirs written outside the catalog (ref: curated_events.sql:14). */
  def recoverPartitions(spark: SparkSession, table: String): Unit =
    spark.catalog.recoverPartitions(table)
}
