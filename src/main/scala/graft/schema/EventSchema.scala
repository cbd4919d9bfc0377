package graft.schema

import org.apache.spark.sql.types._

/** The reference pipeline's event data model (SURVEY §1.2).
  *
  * Raw schema: 5 nullable fields, enforced at read time — never inferred
  * (ref: glue/jobs/raw_to_curated_events_v1.py:17-23). Curated adds
  * `event_ts` parsed to timestamp, `processing_ts`, and the
  * `ingestion_date` partition column (ref: sql/athena/curated_events.sql:1-11).
  */
object EventSchema {

  /** Enforced NDJSON read schema — passing this to the reader skips
    * Spark's JSON schema-inference scan (one full pass saved; at 100 TB
    * that is the difference between one read and two). */
  val raw: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = true),
    StructField("user_id", StringType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("event_ts", StringType, nullable = true),
    StructField("amount", DoubleType, nullable = true)))

  /** Curated schema (post-derivation, pre-partition-column). */
  val curated: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = true),
    StructField("user_id", StringType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("event_ts", TimestampType, nullable = true),
    StructField("amount", DoubleType, nullable = true),
    StructField("processing_ts", TimestampType, nullable = true)))

  /** Domain constraint on event_type
    * (ref: raw_to_curated_events_v3_dq.py:22). */
  val allowedEventTypes: Seq[String] =
    Seq("login", "view_item", "add_to_cart", "purchase")
}

/** Typed row for generator / DQ boundaries where compile-time field checks
  * pay (SURVEY §1.4); the relational pipeline itself stays DataFrame. */
final case class RawEvent(
    event_id: String,
    user_id: Option[String],
    event_type: String,
    event_ts: String,
    amount: Option[Double])
