package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.EventSchema

/** Raw-zone NDJSON sources (SURVEY §2.1 S1/S2).
  *
  * Layout: `raw/source_system=app/ingestion_date=YYYY-MM-DD/` holding
  * NDJSON files, one JSON object per line (ref: docs/design.md:55-60).
  */
object RawEvents {

  /** S1 — read ALL partitions under the raw base, schema enforced, with
    * the partition value recovered from the file path
    * (ref: raw_to_curated_events_v1.py:26-37). Path-derived so it works
    * on a raw zone with no catalog. */
  def readAll(spark: SparkSession, rawBase: String): DataFrame =
    spark.read
      .schema(EventSchema.raw)
      .option("recursiveFileLookup", "true")
      .json(rawBase)
      .withColumn("ingestion_date",
        regexp_extract(input_file_name(),
          "ingestion_date=(\\d{4}-\\d{2}-\\d{2})", 1))
      .filter(col("ingestion_date") =!= "")

  /** S2 — read exactly one `ingestion_date=` directory: partition pruning
    * by path construction, before Spark sees anything
    * (ref: raw_to_curated_events_v2_idempotent.py:30,42-47). The partition
    * value is injected as a literal (constant-folded by Catalyst). */
  def readPartition(spark: SparkSession, rawBase: String,
      ingestionDate: String): DataFrame =
    spark.read
      .schema(EventSchema.raw)
      .json(partitionPath(rawBase, ingestionDate))
      .withColumn("ingestion_date", lit(ingestionDate))

  /** Curated derivations: event_ts string→timestamp, processing-time audit
    * column (ref: raw_to_curated_events_v3_dq.py:61-65). Session timezone
    * must be UTC for `Z`-suffixed ISO-8601 parity (SURVEY §7.2). */
  def curate(raw: DataFrame): DataFrame =
    raw
      .withColumn("event_ts", to_timestamp(col("event_ts")))
      .withColumn("processing_ts", current_timestamp())

  def partitionPath(base: String, ingestionDate: String): String =
    s"${base.stripSuffix("/")}/ingestion_date=$ingestionDate/"
}
