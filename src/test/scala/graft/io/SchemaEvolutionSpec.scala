package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {

  private val v2Schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),      // added in v2
    StructField("n", LongType)))           // was INT in v1

  test("readMerged unions partitions written under different schemas") {
    val s = spark
    import s.implicits._
    val d1 = tmpDir("graft-evo-v1")
    val d2 = tmpDir("graft-evo-v2")
    // mergeSchema unions COLUMNS; it does not widen types (int n stays
    // int in both versions here — type widening is conform's job)
    Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "n")
      .write.mode("overwrite").parquet(d1)
    Seq((3L, "c", 0.5, 30)).toDF("id", "name", "score", "n")
      .write.mode("overwrite").parquet(d2)
    val merged = SchemaEvolution.readMerged(s, Seq(d1, d2))
    assert(merged.schema.fieldNames.toSet ==
      Set("id", "name", "score", "n"))
    assert(merged.count() == 3)
    // v1 rows surface the added column as null
    assert(merged.where(col("id") === 1L).head().isNullAt(
      merged.schema.fieldIndex("score")))
  }

  test("conform: adds typed nulls, casts widened types, drops extras, " +
      "normalizes order") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1, "a", 7, "junk")).toDF("n", "name", "id", "legacy")
    val out = SchemaEvolution.conform(v1, v2Schema)
    // contract: names, types, order exactly; nullability follows data
    // provenance (a cast of a non-null column stays non-null)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      v2Schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = out.head()
    assert(r.getLong(0) == 7L && r.getString(1) == "a"
      && r.isNullAt(2) && r.getLong(3) == 1L)
  }

  test("conform matches field names case-insensitively (Spark default)") {
    val s = spark
    import s.implicits._
    // A v1 writer spelled the columns differently — Spark's analyzer
    // would resolve these, so conform must too, not null them out.
    val v1 = Seq((7, "a", 1)).toDF("ID", "Name", "N")
    val out = SchemaEvolution.conform(v1, v2Schema)
    assert(out.schema.fieldNames.toSeq == Seq("id", "name", "score", "n"))
    val r = out.head()
    assert(r.getLong(0) == 7L, "ID must conform to id, not become null")
    assert(r.getString(1) == "a")
    assert(r.isNullAt(2) && r.getLong(3) == 1L)
  }

  test("conform is idempotent and total on an already-conformed frame") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 0.1, 2L)).toDF("id", "name", "score", "n")
    val once = SchemaEvolution.conform(df, v2Schema)
    val twice = SchemaEvolution.conform(once, v2Schema)
    assert(once.schema == twice.schema)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}
