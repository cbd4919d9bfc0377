package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Stage-by-stage timing of the MinHash+LSH near-dup pipeline — keeps the
  * measured evidence for which exchange dominates (docs/DESIGN_NOTES.md). */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      TextOps.sortedShingleSet(TextOps.tokens(col("text")), 3).as("sh"))
      .repartition(col("doc_id"))
    val buckets = docs.select(col("doc_id"),
      explode(TextOps.lshBands(
        TextOps.minhashSignature(col("sh"), 48), 12, 4)).as("b"))
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.b") === col("y.b") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val verified = cand
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.TextKernels.sorted_jaccard(
          col("a_sh"), col("b_sh")).as("jac"))

    time("1 docs+shingles")(docs)
    time("2 sig+bands")(buckets)
    time("3 cand join+distinct")(cand)
    time("4 verified pairs")(verified)
    println("cand rows: " + cand.count())
    spark.stop()
  }
}
