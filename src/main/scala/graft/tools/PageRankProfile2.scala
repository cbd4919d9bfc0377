package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Superstep-discipline shootout for PageRank: nested lazy broadcasts
  * (current) vs per-iteration materialization that breaks the lineage.
  * `runMain graft.tools.PageRankProfile2 <sfDir>` */
object PageRankProfile2 {
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
    e.count()
    val r0 = deg.select(col("a").as("node"), lit(1000000L).as("rank"))

    def step(prev: DataFrame): DataFrame =
      e.join(broadcast(prev), col("a") === col("node"))
        .select(col("b"),
          expr("(rank * 85) div (100 * outdeg)").as("contrib"))
        .groupBy(col("b"))
        .agg((lit(150000L) + sum(col("contrib"))).as("rank"))
        .select(col("b").as("node"), col("rank"))
    def sink(r: DataFrame): Unit =
      r.orderBy(col("rank").desc, col("node")).limit(50)
        .write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { rep =>
      time(s"rep$rep lazy-nested (current)") {
        var r = r0
        (1 to 5).foreach(_ => r = step(r)); sink(r)
      }
      time(s"rep$rep collect+recreate per step") {
        var r = r0
        (1 to 5).foreach { _ =>
          val rows = step(r).collect().toSeq
          r = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            StructType(Seq(StructField("node", LongType),
              StructField("rank", LongType))))
        }
        sink(r)
      }
      time(s"rep$rep persist+count per step") {
        var r = r0
        val cached = (1 to 5).map { _ => r = step(r).persist(); r.count(); r }
        sink(r); cached.foreach(_.unpersist())
      }
      time(s"rep$rep localCheckpoint(eager) per step") {
        var r = r0
        (1 to 5).foreach(_ => r = step(r).localCheckpoint(true))
        sink(r)
      }
    }
    spark.stop()
  }
}
