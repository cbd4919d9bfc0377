package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic testdata scale-up: writes `factor` key-offset copies of
  * a source scale-factor directory, preserving referential integrity
  * (each copy's orders point at the same copy's customers, etc.) and all
  * value distributions. Joins and aggregates therefore scale exactly by
  * `factor` — the point of the tier: catch plans whose cost bends
  * super-linearly when shuffles stop fitting where they used to.
  *
  * The tiny fixed dims (region, nation) are copied once — scaling a
  * 25-row dim would change plan shapes (broadcastability) rather than
  * stress them. Every synthetic key sits far below `Stride`, so offset
  * key spaces never collide. `events.ts` round-trips as-is for the
  * current TIMESTAMP_MICROS fixtures (NTZ in → NTZ out); for a legacy
  * TIMESTAMP(NANOS) source the nanosAsLong conf below reads it as long
  * and writes INT64 — [[graft.Tables.events]] branches on the resolved
  * type and handles both.
  *
  * Usage: `runMain graft.gen.ScaleUp <srcDir> <dstDir> [factor]`
  */
object ScaleUp {

  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(t: String, keyCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out = (0 until factor).map { i =>
        keyCols.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(i * Stride)))
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$factor")
    }
    def once(t: String): Unit = {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x1 (fixed dim)")
    }

    once("region"); once("nation")
    copies("customer", Seq("c_custkey"))
    copies("supplier", Seq("s_suppkey"))
    copies("part", Seq("p_partkey"))
    copies("orders", Seq("o_orderkey", "o_custkey"))
    copies("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    copies("events", Seq("event_id", "user_id"))
    copies("documents", Seq("doc_id"))
    copies("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
