package graft.io

import graft.SparkSpec
import graft.Tables

/** Proof that bucketed layout eliminates the fact-fact join shuffle:
  * the same join over plain parquet plans two Exchanges; over bucketed
  * tables it plans none. */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero shuffle exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the join strategy comparison is shuffle vs none
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, sf),
        "li_bucketed", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed", "l_orderkey", 4)

      val bucketedPlan = Bucketing
        .colocatedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
        .queryExecution.executedPlan.toString
      val plainPlan = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf)
          .withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .queryExecution.executedPlan.toString

      def shuffles(plan: String) =
        plan.linesIterator.count(l =>
          l.contains("Exchange hashpartitioning"))
      assert(shuffles(plainPlan) == 2,
        s"plain join should shuffle both sides:\n$plainPlan")
      assert(shuffles(bucketedPlan) == 0,
        s"bucketed join must be shuffle-free:\n$bucketedPlan")

      // and the join still answers correctly
      val n = Bucketing
        .colocatedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
        .count()
      assert(n == 6000) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
