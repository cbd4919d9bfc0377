package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def snapshot(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString.take(19),
        Option(r.getTimestamp(3)).map(_.toString.take(19)))
    }.toSet

  test("two update waves: changes close+reopen, no-ops pass, new keys insert") {
    val s = spark
    import s.implicits._
    val dim0 = Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      (2L, "silver", ts("2024-01-01 00:00:00"), None: Option[Timestamp]))
      .toDF("cust", "tier", "valid_from", "valid_to")

    // wave 1: cust 1 upgrades, cust 2 unchanged, cust 3 appears
    val u1 = Seq(
      (1L, "gold", ts("2024-02-01 00:00:00")),
      (2L, "silver", ts("2024-02-01 00:00:00")),
      (3L, "bronze", ts("2024-02-01 00:00:00")))
      .toDF("cust", "tier", "effective_ts")
    val dim1 = Scd2.merge(dim0, u1, "cust", Seq("tier"))
    assert(snapshot(dim1) == Set(
      (1L, "bronze", "2024-01-01 00:00:00", Some("2024-02-01 00:00:00")),
      (1L, "gold", "2024-02-01 00:00:00", None),
      (2L, "silver", "2024-01-01 00:00:00", None),
      (3L, "bronze", "2024-02-01 00:00:00", None)),
      s"got ${snapshot(dim1)}")

    // wave 2: cust 3 churns; closed history must ride through untouched
    val u2 = Seq((3L, "churned", ts("2024-03-01 00:00:00")))
      .toDF("cust", "tier", "effective_ts")
    val dim2 = Scd2.merge(dim1, u2, "cust", Seq("tier"))
    assert(snapshot(dim2) == Set(
      (1L, "bronze", "2024-01-01 00:00:00", Some("2024-02-01 00:00:00")),
      (1L, "gold", "2024-02-01 00:00:00", None),
      (2L, "silver", "2024-01-01 00:00:00", None),
      (3L, "bronze", "2024-02-01 00:00:00", Some("2024-03-01 00:00:00")),
      (3L, "churned", "2024-03-01 00:00:00", None)))

    // invariant: exactly one open row per key, intervals don't overlap
    val opens = dim2.where(col("valid_to").isNull)
      .groupBy("cust").count().collect()
    assert(opens.forall(_.getLong(1) == 1L))
  }

  test("null-safe attribute compare: null → value and value → null both " +
      "count as changes; null → null does not") {
    val s = spark
    import s.implicits._
    val dim0 = Seq(
      (1L, Some("a"), ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      (2L, None: Option[String], ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      (3L, None: Option[String], ts("2024-01-01 00:00:00"), None: Option[Timestamp]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val u = Seq(
      (1L, None: Option[String], ts("2024-02-01 00:00:00")),   // value → null
      (2L, Some("x"), ts("2024-02-01 00:00:00")),              // null → value
      (3L, None: Option[String], ts("2024-02-01 00:00:00")))   // null → null
      .toDF("k", "attr", "effective_ts")
    val out = Scd2.merge(dim0, u, "k", Seq("attr"))
    val closedKeys = out.where(col("valid_to").isNotNull)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(closedKeys == Set(1L, 2L), s"got $closedKeys")
    assert(out.where(col("valid_to").isNull).count() == 3)
  }
}
