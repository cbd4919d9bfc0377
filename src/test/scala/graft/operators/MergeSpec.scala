package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {

  private def target = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "seg", "bal")
  }

  private def changes(rows: (Long, String, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "op", "seg", "bal")
  }

  private def apply(chg: org.apache.spark.sql.DataFrame) =
    Merge.upsert(target, chg, "k", Seq("seg", "bal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSet

  test("update, delete, insert, and pass-through in one apply") {
    val got = apply(changes(
      (1L, "U", "a2", 11.0),   // update key 1
      (2L, "D", "b", 20.0),    // delete key 2
      (9L, "I", "z", 90.0)))   // insert key 9
    assert(got == Set(
      (1L, "a2", 11.0, "updated"),
      (3L, "c", 30.0, "kept"),
      (9L, "z", 90.0, "inserted")))
  }

  test("delete of a missing key is a no-op; U to a missing key upserts") {
    val got = apply(changes(
      (7L, "D", "x", 0.0),     // no such key — MERGE's no-op branch
      (8L, "U", "y", 80.0)))   // WHEN NOT MATCHED → insert
    assert(got == Set(
      (1L, "a", 10.0, "kept"),
      (2L, "b", 20.0, "kept"),
      (3L, "c", 30.0, "kept"),
      (8L, "y", 80.0, "inserted")))
  }

  test("empty change batch returns the snapshot unchanged") {
    val got = apply(changes())
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    assert(got.forall(_._4 == "kept"))
  }
}
