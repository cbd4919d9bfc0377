package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.Snapshots
import graft.queries.GraphQueries

/** Streaming maintenance of the co-purchase edge index — the
  * [[StreamingDedup]] twin for graphs: every micro-batch of lineitem
  * rows contributes its orders' RAW pair counts as one exactly-once
  * snapshot append, and the graph family serves off the merged store
  * ([[graft.queries.GraphQueries.servedEdges]]) without ever
  * re-deriving edges from the raw corpus.
  *
  * Why this composes: pair counts partition BY ORDER — an order's
  * basket contributes its pairs to exactly the batch that carries it —
  * so generation-wise counts SUM to the full-corpus count and the
  * ≥ 2 edge threshold is applied only at serve time (the
  * q_graph_append contract, including pairs whose count crosses the
  * threshold only ACROSS batches). The ingestion contract this rests
  * on: an order's rows arrive WHOLE within one micro-batch (the
  * standard upstream session/transaction boundary); a split order
  * would under-count exactly the within-order pairs straddling the
  * split. StreamingGraphSpec proves stream-maintained ≡ sequential
  * batch rebuild and that batch replay is a no-op.
  *
  * 100 TB shape: per-batch cost is the batch's own order-pair
  * self-join (bounded by basket sizes) plus an O(batch) append —
  * no corpus re-scan, the text_bm25_append / emb_ivf_append cost
  * model applied to edges.
  */
object StreamingGraph {

  /** Unit-testable core: append one micro-batch's pair counts,
    * exactly once. `batch` carries (l_orderkey, l_partkey) rows of
    * WHOLE orders. Returns the appended pair-row count. */
  def applyBatch(batch: DataFrame, batchId: Long, table: String): Long = {
    val spark = batch.sparkSession
    val tag = s"b$batchId"
    if (Snapshots.batchApplied(spark, table, tag)) return 0L
    val pairs = GraphQueries.rawPairCounts(
        batch.select(col("l_orderkey"), col("l_partkey")).distinct())
      .withColumn("ub", pmod(col("u"), lit(8)))
      .persist()
    try {
      def append(): Int = Snapshots.commitAppend(pairs, table, "ub",
        statsCols = Seq("u", "v"), tag = Some(tag))
      // same single-writer reclaim contract as SnapshotStream.applyBatch
      try append()
      catch {
        case _: Snapshots.ConcurrentCommitException =>
          Snapshots.breakReservation(spark, table,
            Snapshots.currentVersion(spark, table) + 1)
          append()
      }
      pairs.count()
    } finally { pairs.unpersist(); () }
  }

  /** Serve the thresholded edge set off the maintained store: the
    * (e0, e) pair every graph algorithm consumes. */
  def edges(spark: org.apache.spark.sql.SparkSession, table: String)
      : (DataFrame, DataFrame) =
    GraphQueries.servedEdges(spark, table)

  def sink(lineitems: DataFrame, table: String, checkpoint: String)
      : StreamingQuery =
    lineitems.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => {
        applyBatch(b, id, table)
        ()
      })
      .start()
}
