package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-by-stage profile of the PPJoin pipeline (`dedup_ppjoin`) — run
  * when its wall-clock moves between rounds to attribute the change to
  * corpus statistics (candidate counts are data-dependent) vs a plan
  * regression. Consumes the SAME stage builders as the shipped query
  * ([[DedupQueries.ppjoinDocs]] / [[DedupQueries.ppjoinPrefix]] /
  * [[DedupQueries.ppjoinCandCond]]), so a tuned threshold or cap can
  * never make the profiler silently measure a different pipeline.
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

    val docs = DedupQueries.ppjoinDocs(Tables.documents(spark, sfDir))
    docs.persist()
    // getAs[Any] + Option: avg/max over an EMPTY corpus are NULL — report
    // zeros instead of an opaque driver NPE
    val st = docs.agg(count(lit(1)).as("c"), avg(col("n")).as("a"),
      max(col("n")).as("m")).head()
    println(s"docs=${st.getLong(0)}" +
      s" avg_shingles=${Option(st.getAs[Any]("a")).getOrElse(0)}" +
      s" max_shingles=${Option(st.getAs[Any]("m")).getOrElse(0)}")

    val ex = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("g"))
    val gdf = ex.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    println("distinct shingles: " + gdf.count())
    println("hot shingles (df>100): " + gdf.where(col("gdf") > 100).count())

    val prefix = DedupQueries.ppjoinPrefix(docs)
    prefix.persist()
    println("prefix occurrences: " + prefix.count())
    val occMax = prefix.groupBy(col("g")).count()
      .agg(max(col("count")).as("m")).head()
    println("max posting occupancy kept: " +
      Option(occMax.getAs[Any]("m")).getOrElse(0))

    val occ = prefix.as("x").join(prefix.as("y"),
      col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
    println("occurrence pairs (no filters): " + occ.count())
    val filtered = prefix.as("x")
      .join(prefix.as("y"), DedupQueries.ppjoinCandCond)
    println("after length+positional filters: " + filtered.count())
    val cand = filtered.select(col("x.doc_id").as("a_id"),
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
