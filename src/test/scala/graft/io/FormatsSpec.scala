package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.gen.EventsGen
import graft.schema.EventSchema

/** Source/sink format coverage beyond the reference's NDJSON+parquet:
  * the same curated frame round-trips through CSV and ORC with value
  * fidelity (the formats a lake migration actually encounters). */
class FormatsSpec extends SparkSpec {

  private lazy val curated = {
    val raw = tmpDir("graft-fmt-raw")
    EventsGen.writeNdjson(EventsGen.generateDay("2025-01-01", 200), raw,
      "2025-01-01")
    RawEvents.curate(RawEvents.readPartition(spark, raw, "2025-01-01"))
      .drop("processing_ts") // nondeterministic; excluded like the oracle does
  }

  private def key(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.selectExpr("event_id", "user_id", "event_type",
      "cast(event_ts as string)", "cast(amount as string)")
      .collect().map(_.mkString("|")).toSet

  test("CSV round-trip preserves the row set (schema re-enforced on read)") {
    val dir = tmpDir("graft-fmt-csv")
    curated.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("event_id string, user_id string, event_type string, " +
        "event_ts timestamp, amount double, ingestion_date string")
      .option("header", "true").csv(dir)
    assert(key(back) == key(curated))
  }

  test("ORC round-trip preserves rows and types") {
    val dir = tmpDir("graft-fmt-orc")
    curated.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema("event_ts").dataType.typeName == "timestamp")
    assert(key(back) == key(curated))
  }

  // Avro: the spark-avro connector jar is not in this distro (only Avro
  // core); with an offline resolver it can't be added, so Avro coverage
  // is deferred to an environment that ships the connector.

  test("NDJSON written back out re-reads under the enforced schema (S3→S1)") {
    val dir = tmpDir("graft-fmt-json")
    curated
      .withColumn("event_ts", date_format(col("event_ts"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .drop("ingestion_date")
      .write.mode("overwrite").json(dir)
    val back = spark.read.schema(EventSchema.raw).json(dir)
    assert(back.count() == curated.count())
    assert(back.schema == EventSchema.raw)
  }
}
