package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Delta-algebra edge cases for q_incremental_join_view that the flat
  * oracle recompute exercises only at one data shape: empty deltas must
  * degrade the refresh to the base view exactly, and orders with no
  * lineitems must not surface in the view (inner-join semantics on both
  * the base and every delta leg).
  */
class IncrementalViewSpec extends SparkSpec {

  private def q =
    StatsQueries.all.find(_.name == "q_incremental_join_view").get

  /** Orders all ≡ 1 (mod 4) → the orders delta (o_orderkey % 4 == 0) is
    * EMPTY; lineitems all l_linenumber ≤ 4 → the lineitem delta is
    * EMPTY. Order 9 has no lineitems at all. */
  private lazy val dir: String = {
    val d = tmpDir("ivm-edge")
    val oSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType)))
    val orders = Seq(
      Row(1L, 10L, "O"), Row(5L, 10L, "F"), Row(9L, 20L, "O"))
    val lSchema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", LongType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType)))
    val lineitem = Seq(
      Row(1L, 1L, 100.0, 0.1), // order 1: 90 + 200 = 290
      Row(1L, 2L, 200.0, 0.0),
      Row(5L, 1L, 50.0, 0.5), // order 5: 25
      Row(7L, 1L, 999.0, 0.0)) // dangling lineitem: no order 7
    spark.createDataFrame(
      spark.sparkContext.parallelize(orders, 2), oSchema)
      .write.parquet(s"$d/orders.parquet")
    spark.createDataFrame(
      spark.sparkContext.parallelize(lineitem, 2), lSchema)
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("empty deltas degrade to the base view; inner-join semantics hold") {
    val out = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // customer 10: orders 1 (290.0 over 2 items) + 5 (25.0 over 1 item);
    // customer 20's order 9 has no lineitems → absent; dangling
    // lineitem 7 has no order → absent
    assert(out.toSeq == Seq((10L, 315.0, 3L)), s"got ${out.toSeq}")
  }

  test("every (order, lineitem) pair lands in exactly one delta leg") {
    // the full sf0.001 view: merged refresh must equal the flat join —
    // same assertion the oracle makes, but here per-customer over a
    // DIFFERENT tier than the driver gate runs, guarding the split
    // predicates (parity mod 4, linenumber threshold) against drift
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val flat = graft.Tables.orders(spark, d)
      .join(graft.Tables.lineitem(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val inc = q.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(inc == flat)
  }
}
