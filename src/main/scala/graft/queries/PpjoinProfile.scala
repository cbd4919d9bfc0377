package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.TextOps

/** Stage-by-stage profile of the PPJoin pipeline (`dedup_ppjoin`) — run
  * when its wall-clock moves between rounds to attribute the change to
  * corpus statistics (candidate counts are data-dependent) vs a plan
  * regression. Lives in this package for access to [[DedupQueries]]'
  * internals; it is a measurement harness, not part of the inventory.
  *
  * usage: SPARK_GRAFT_SF_DIR=... runMain graft.queries.PpjoinProfile
  */
object PpjoinProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      TextOps.sortedShingleSet(TextOps.tokens(col("text")), 3).as("sh"))
      .withColumn("n", size(col("sh")))
      .repartition(col("doc_id"))
    docs.persist()
    val stats = docs.agg(count(lit(1)), avg(col("n")), max(col("n"))).head()
    println(s"docs=${stats.getLong(0)} avg_shingles=${stats.getDouble(1)}" +
      f" max_shingles=${stats.getInt(2)}")

    val ex = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("g"))
    val gdf = ex.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    println("distinct shingles: " + gdf.count())
    println("hot shingles (df>100): " +
      gdf.where(col("gdf") > 100).count())

    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("gdf"), col("g"))
    val prefix = ex.join(gdf, "g")
      .withColumn("rn", row_number().over(byRarity))
      .where(col("rn") <= expr("n div 2 + 1"))
      .withColumn("pocc", count(lit(1)).over(Window.partitionBy(col("g"))))
      .where(col("pocc") <= DedupQueries.HotBucketCap)
      .select(col("g"), col("doc_id"), col("n"), col("rn"))
    prefix.persist()
    println("prefix occurrences: " + prefix.count())
    println("max posting occupancy kept: " +
      prefix.groupBy(col("g")).count().agg(max(col("count"))).head().getLong(0))

    val occ = prefix.as("x")
      .join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
    println("occurrence pairs (no filters): " + occ.count())
    val lenF = occ.where(col("x.n") <= col("y.n") * 2
      && col("y.n") <= col("x.n") * 2)
    println("after length filter: " + lenF.count())
    val posF = lenF.where(lit(3) * (lit(1) + least(
      col("x.n") - col("x.rn"), col("y.n") - col("y.rn")))
      >= col("x.n") + col("y.n"))
    println("after positional filter: " + posF.count())
    val cand = posF.select(col("x.doc_id").as("a_id"),
      col("y.doc_id").as("b_id")).distinct()
    println("distinct candidates: " + cand.count())

    val t0 = System.nanoTime()
    DedupQueries.ppjoinPairs(Tables.documents(spark, sfDir))
      .where(col("jac") >= 0.5)
      .write.format("noop").mode("overwrite").save()
    println(f"full ppjoin pass: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
