package graft

import org.apache.spark.sql.types._

/** Fixture-format drift guard: the driver regenerates /root/testdata between
  * rounds and has already changed the events.ts parquet encoding once
  * (TIMESTAMP(NANOS) → TIMESTAMP_MICROS, round 5 — broke 56 queries with no
  * direct signal). This spec pins the RESOLVED dtypes every `Tables.*`
  * loader hands downstream, so the next regeneration fails in one obvious
  * place instead of 56 opaque ones.
  */
class TablesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: ts resolves to session-TZ TimestampType regardless of file encoding") {
    val f = fields(Tables.events(spark, sf))
    assert(f("ts") === TimestampType,
      s"events.ts must normalize to TimestampType, got ${f("ts")} — " +
        "driver testdata encoding changed again? extend Tables.events branch")
    assert(f("event_id") === LongType)
    assert(f("user_id") === LongType)
    assert(f("event_type") === StringType)
    assert(f("value") === DoubleType)
    assert(f("props") === StringType)
  }

  test("events: ts values land in a sane epoch range (no unit mixup)") {
    import org.apache.spark.sql.functions._
    // A nanos-vs-micros-vs-millis mixup shifts timestamps by 10^3/10^6 —
    // bound the min/max year instead of pinning exact values.
    val r = Tables.events(spark, sf)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (r.getInt(0), r.getInt(1))
    assert(lo >= 2000 && hi <= 2100, s"events.ts years [$lo,$hi] out of range")
  }

  test("lineitem/orders: key and date dtypes stable") {
    val li = fields(Tables.lineitem(spark, sf))
    assert(li("l_orderkey") === LongType)
    assert(li("l_quantity") === DoubleType)
    assert(li("l_shipdate") === TimestampNTZType,
      s"l_shipdate resolved to ${li("l_shipdate")}")
    val o = fields(Tables.orders(spark, sf))
    assert(o("o_orderkey") === LongType)
    assert(o("o_orderdate") === TimestampNTZType,
      s"o_orderdate resolved to ${o("o_orderdate")}")
    assert(o("o_totalprice") === DoubleType)
  }

  test("documents/embeddings: text and vector dtypes stable") {
    val d = fields(Tables.documents(spark, sf))
    assert(d("doc_id") === LongType)
    assert(d("text") === StringType)
    assert(d("lang") === StringType)
    val e = fields(Tables.embeddings(spark, sf))
    assert(e("vec_id") === LongType)
    assert(e("embedding") === ArrayType(FloatType, containsNull = true),
      s"embeddings.embedding unexpected type ${e("embedding")}")
  }

  test("dimension tables load with rows at sf0.001") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      assert(Tables.load(spark, sf, t).count() > 0, s"$t empty")
  }
}
