package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{TextKernels, TextOps}
import graft.io.Snapshots

/** Online corpus ingestion with near-dup rejection — the composition a
  * production training-data feed runs: every micro-batch of documents
  * is deduplicated (MinHash+LSH, jaccard ≥ threshold) against the
  * CURRENT corpus snapshot AND within itself, and only the survivors
  * are appended, exactly once, as a new snapshot version.
  *
  * The 100 TB design point: shingle sets and LSH band keys are
  * MATERIALIZED as columns when a doc is admitted, so the corpus side
  * of every batch's candidate join reads stored columns — no
  * per-batch recompute of corpus signatures, the cost that makes naive
  * streaming dedup quadratic-over-time. Candidate generation is the
  * asymmetric bucket equi-join of [[graft.queries]]' incremental dedup
  * (batch-sized left side), verification is the exact merge-walk
  * jaccard kernel once per distinct candidate pair.
  *
  * Within-batch semantics: lower doc_id wins (a batch row is dropped
  * if it near-dups an earlier-id row of the same batch — the same
  * keep-first rule the batch dedup family uses).
  */
object StreamingDedup {

  private val MinhashK = 48
  private val Bands = 12
  private val RowsPerBand = 4

  /** Admitted-corpus row shape: doc columns + materialized signature
    * columns (`sh`, `band`). */
  private def signed(docs: DataFrame): DataFrame =
    docs
      .withColumn("sh",
        TextOps.sortedShingleSet(TextOps.tokens(col("text")), 3))
      .withColumn("bands",
        TextOps.lshBands(
          TextOps.minhashSignature(col("sh"), MinhashK),
          Bands, RowsPerBand))

  /** Per-band corpus occupancy above which the bucket is dropped from
    * candidate generation — the `graft.queries` HotBucketCap discipline:
    * a super-cap bucket is boilerplate, and capping bounds per-band join
    * work at batch_occ × cap under any corpus skew. */
  private val HotBucketCap = 1000

  /** Near-dup (a_id, b_id) pairs between left and right signed frames
    * (bucket join on band keys, hot right-side buckets capped,
    * exact-jaccard verify). */
  private def nearDupPairs(left: DataFrame, right: DataFrame,
      threshold: Double): DataFrame = {
    val l = left.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
      explode(col("bands")).as("b"))
    val r = right.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
      explode(col("bands")).as("b"))
      .withColumn("occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
      .where(col("occ") <= HotBucketCap)
      .drop("occ")
    l.join(r, "b")
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh"))
      .distinct()
      .where(TextKernels.sorted_jaccard(col("a_sh"), col("b_sh"))
        >= threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** Unit-testable core: dedup one batch against corpus + itself, then
    * exactly-once append the survivors. Returns survivor count. */
  def applyBatch(batch: DataFrame, batchId: Long, table: String,
      partCol: String, threshold: Double = 0.5): Long = {
    val spark = batch.sparkSession
    val tag = s"b$batchId"
    if (Snapshots.batchApplied(spark, table, tag)) return 0L
    val b = signed(batch).persist()
    try {
      // vs corpus: stored signature columns, zero corpus recompute
      val corpusDups =
        if (Snapshots.currentVersion(spark, table) == 0)
          b.select(col("doc_id")).where(lit(false))
        else
          nearDupPairs(b, Snapshots.read(spark, table), threshold)
            .select(col("a_id").as("doc_id")).distinct()
      // within batch: keep-first by id — drop the HIGHER id of a pair
      val innerDups = nearDupPairs(b, b, threshold)
        .where(col("a_id") > col("b_id"))
        .select(col("a_id").as("doc_id")).distinct()
      val survivors = b
        .join(corpusDups.unionByName(innerDups).distinct(),
          Seq("doc_id"), "left_anti")
      // same single-writer reclaim contract as SnapshotStream.applyBatch
      def append(): Unit = {
        Snapshots.commitAppend(survivors, table, partCol,
          statsCols = Nil, tag = Some(tag))
        ()
      }
      try append()
      catch {
        case _: Snapshots.ConcurrentCommitException =>
          Snapshots.breakReservation(spark, table,
            Snapshots.currentVersion(spark, table) + 1)
          append()
      }
      survivors.count()
    } finally b.unpersist()
  }

  def sink(docs: DataFrame, table: String, checkpoint: String,
      partCol: String, threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => {
        applyBatch(b, id, table, partCol, threshold)
        ()
      })
      .start()
}
