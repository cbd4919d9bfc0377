package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right row at-or-before each left row, per key") {
    val s = spark
    import s.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:20"), 101.0),
      (2L, ts("2024-01-01 10:00:10"), 50.0),
      (3L, ts("2024-01-01 10:00:10"), 7.0) // key with no quotes
    ).toDF("sym", "trade_ts", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.5),
      (1L, ts("2024-01-01 10:00:10"), 100.5),
      (1L, ts("2024-01-01 10:00:30"), 102.0), // after both trades
      (2L, ts("2024-01-01 10:00:10"), 49.9)   // equal ts → inclusive match
    ).toDF("sym", "quote_ts", "bid")

    val out = AsOfJoin.backward(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("bid"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        (Option(r.getTimestamp(3)).map(_.toString), Option(r.get(4))))
      .toMap

    assert(out((1L, "2024-01-01 10:00:05.0")) ==
      (Some("2024-01-01 10:00:00.0"), Some(99.5)))
    assert(out((1L, "2024-01-01 10:00:20.0")) ==
      (Some("2024-01-01 10:00:10.0"), Some(100.5)))
    // equal timestamp is inclusive
    assert(out((2L, "2024-01-01 10:00:10.0")) ==
      (Some("2024-01-01 10:00:10.0"), Some(49.9)))
    // no right row for the key → nulls, row preserved (left semantics)
    assert(out((3L, "2024-01-01 10:00:10.0")) == (None, None))
  }

  test("forward as-of: earliest right row at-or-after each left row, per key") {
    val s = spark
    import s.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:35"), 101.0), // after the last quote
      (2L, ts("2024-01-01 10:00:10"), 50.0),  // equal ts → inclusive match
      (3L, ts("2024-01-01 10:00:10"), 7.0)    // key with no quotes
    ).toDF("sym", "trade_ts", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.5),  // before — must not match
      (1L, ts("2024-01-01 10:00:10"), 100.5),
      (1L, ts("2024-01-01 10:00:30"), 102.0),
      (2L, ts("2024-01-01 10:00:10"), 49.9)
    ).toDF("sym", "quote_ts", "bid")

    val out = AsOfJoin.forward(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("bid"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        (Option(r.getTimestamp(3)).map(_.toString), Option(r.get(4))))
      .toMap

    assert(out((1L, "2024-01-01 10:00:05.0")) ==
      (Some("2024-01-01 10:00:10.0"), Some(100.5)))
    // nothing at-or-after → nulls, row preserved
    assert(out((1L, "2024-01-01 10:00:35.0")) == (None, None))
    // equal timestamp is inclusive
    assert(out((2L, "2024-01-01 10:00:10.0")) ==
      (Some("2024-01-01 10:00:10.0"), Some(49.9)))
    assert(out((3L, "2024-01-01 10:00:10.0")) == (None, None))
  }

  test("NULL right timestamps/keys never match (SQL/ASOF semantics)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:05"), 1.0))
      .toDF("k", "lts", "v")
    val right = Seq(
      (Some(1L), None: Option[Timestamp], 99.0),          // null ts
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), 98.0)) // null key
      .toDF("k", "rts", "rv")
    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      Seq("rv")).collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(3) && out(0).isNullAt(4),
      "null-ts / null-key right rows must not match")
  }

  test("NULL LEFT timestamps never match, in either direction") {
    val s = spark
    import s.implicits._
    // Two non-null left rows bracket the null one so a sort-order bug
    // (desc defaults to nulls-LAST) would hand the null row a payload.
    val left = Seq(
      (1L, Some(ts("2024-01-01 10:00:05")), 1.0),
      (1L, None: Option[Timestamp], 2.0),
      (1L, Some(ts("2024-01-01 10:00:25")), 3.0))
      .toDF("k", "lts", "v")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.0),
      (1L, ts("2024-01-01 10:00:30"), 98.0))
      .toDF("k", "rts", "rv")

    for (dir <- Seq("backward", "forward")) {
      val out = (if (dir == "backward")
        AsOfJoin.backward(left, right, Seq("k"), "lts", "rts", Seq("rv"))
      else
        AsOfJoin.forward(left, right, Seq("k"), "lts", "rts", Seq("rv")))
        .collect().map(r => Option(r.get(1)).map(_.toString) ->
          (r.isNullAt(3) && r.isNullAt(4))).toMap
      assert(out(None), s"$dir: NULL left ts must match nothing")
      assert(!out(Some("2024-01-01 10:00:05.0")),
        s"$dir: non-null rows still match")
      assert(!out(Some("2024-01-01 10:00:25.0")),
        s"$dir: non-null rows still match")
    }
  }

  test("left row count is always preserved (no fan-out, no drops)") {
    val s = spark
    import s.implicits._
    val left = (1 to 100).map(i =>
      (i.toLong % 5, ts(f"2024-01-01 10:00:${i % 60}%02d"), i.toDouble))
      .toDF("k", "lts", "v")
    val right = (1 to 300).map(i =>
      (i.toLong % 7, ts(f"2024-01-01 09:59:${i % 60}%02d"), i.toDouble))
      .toDF("k", "rts", "rv")
    val joined = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      Seq("rv"))
    assert(joined.count() == 100)
  }
}
