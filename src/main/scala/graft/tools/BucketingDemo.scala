package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.io.Bucketing

/** Demonstrates the bucketed co-located join: writes lineitem/orders
  * bucketed by orderkey into a temp warehouse, then prints the shuffle
  * count of the plain vs bucketed join plan.
  *
  * usage: runMain graft.tools.BucketingDemo [sfDir]
  */
object BucketingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-demo-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Bucketing.writeBucketed(Tables.lineitem(spark, sfDir),
      "demo_li", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).withColumnRenamed("o_orderkey", "l_orderkey"),
      "demo_ord", "l_orderkey", 4)

    def shuffles(plan: String) =
      plan.linesIterator.count(_.contains("Exchange hashpartitioning"))

    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
    val bucketed = Bucketing.colocatedJoin(spark, "demo_li", "demo_ord",
      "l_orderkey")

    println(s"BUCKETDEMO plainShuffles=${shuffles(plain.queryExecution.executedPlan.toString)} " +
      s"bucketedShuffles=${shuffles(bucketed.queryExecution.executedPlan.toString)} " +
      s"rows=${bucketed.count()}")
    spark.sql("DROP TABLE demo_li")
    spark.sql("DROP TABLE demo_ord")
    spark.stop()
  }
}
