package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextKernels, TextOps}

/** One-off calibration probe (kept out of the inventory): per verified
  * near-dup pair, exact jaccard, signature estimate, and the smaller
  * set size — the data behind dedup_minhash_accuracy's size-dependent
  * bound. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextOps.sortedShingleSet(TextOps.tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), col("sh"),
        TextOps.minhashSignature(col("sh"), 48).as("sig"))
    val a = docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
      col("sig").as("a_sig"))
    val b = docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
      col("sig").as("b_sig"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        TextKernels.sorted_jaccard(col("a_sh"), col("b_sh")).as("jac"),
        TextOps.minhashJaccard(col("a_sig"), col("b_sig")).as("est"),
        least(size(col("a_sh")), size(col("b_sh"))).as("minsz"))
      .where(col("jac") >= 0.5)
    pairs.select(col("minsz"), abs(col("est") - col("jac")).as("dev"))
      .groupBy((col("minsz") >= 32).as("big"))
      .agg(count(lit(1)).as("n"), max(col("dev")).as("max_dev"),
        expr("percentile(dev, 0.99)").as("p99_dev"))
      .show(false)
    pairs.orderBy(abs(col("est") - col("jac")).desc).show(10, false)
    spark.stop()
  }
}
