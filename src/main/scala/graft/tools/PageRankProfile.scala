package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q_pagerank_copurchase: edge-build vs supersteps —
  * `runMain graft.tools.PageRankProfile <sfDir>`. Variant B restructures
  * the degree computation to avoid re-shuffling the doubled edge list
  * (degrees from the pair list + narrow union after the join).
  */
object PageRankProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep: variant A (current) ---")
      val pairs = graft.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = pairs
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
      val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
      val e = edges.join(deg, "a").persist()
      time("A edge build + persist")(e.count())
      var ranks = deg.select(col("a").as("node"), lit(1000000L).as("rank"))
      time("A 5 supersteps + topk") {
        (1 to 5).foreach { _ =>
          ranks = e.join(broadcast(ranks), col("a") === col("node"))
            .select(col("b"),
              expr("(rank * 85) div (100 * outdeg)").as("contrib"))
            .groupBy(col("b"))
            .agg((lit(150000L) + sum(col("contrib"))).as("rank"))
            .select(col("b").as("node"), col("rank"))
        }
        ranks.orderBy(col("rank").desc, col("node")).limit(50)
          .write.format("noop").mode("overwrite").save()
      }
      e.unpersist()

      println(s"--- rep $rep: variant B (deg from pairs, narrow union) ---")
      val p2 = graft.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct().persist()
      val degA = p2.groupBy(col("a")).agg(count(lit(1)).as("dega"))
      val degB = p2.groupBy(col("b")).agg(count(lit(1)).as("degb"))
      val j = p2.join(broadcast(degA), "a").join(broadcast(degB), "b")
      val e2 = j.select(col("a"), col("b"), col("dega").as("outdeg"))
        .union(j.select(col("b").as("a"), col("a").as("b"),
          col("degb").as("outdeg")))
        .persist()
      time("B edge build + persist")(e2.count())
      var r2 = degA.select(col("a").as("node"), lit(1000000L).as("rank"))
        .union(degB.select(col("b").as("node"), lit(1000000L).as("rank")))
      time("B 5 supersteps + topk") {
        (1 to 5).foreach { _ =>
          r2 = e2.join(broadcast(r2), col("a") === col("node"))
            .select(col("b"),
              expr("(rank * 85) div (100 * outdeg)").as("contrib"))
            .groupBy(col("b"))
            .agg((lit(150000L) + sum(col("contrib"))).as("rank"))
            .select(col("b").as("node"), col("rank"))
        }
        r2.orderBy(col("rank").desc, col("node")).limit(50)
          .write.format("noop").mode("overwrite").save()
      }
      p2.unpersist(); e2.unpersist()
    }
    spark.stop()
  }
}
