package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Snapshots

class StreamingDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, text) => (id, "d1", text) }
      .toDF("doc_id", "day", "text")
  }

  private def corpusIds(table: String): Set[Long] =
    Snapshots.read(spark, table).select("doc_id").collect()
      .map(_.getLong(0)).toSet

  private val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
  private val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
  private val textD = (1 to 30).map(i => s"delta$i").mkString(" ")
  // near-dup of A: same 30 tokens plus a short tail → jac ≈ 28/33
  private val textAish = textA + " tail1 tail2"

  test("batches admit only docs novel vs the corpus and within-batch; " +
      "replay is exactly-once") {
    val t = tmpDir("sdedup")
    val n0 = StreamingDedup.applyBatch(docs(1L -> textA, 2L -> textB),
      0L, t, "day")
    assert(n0 == 2 && corpusIds(t) == Set(1L, 2L))

    // batch 1: near-dup of corpus doc A, a novel doc D, and an exact
    // within-batch copy of D (higher id loses)
    val n1 = StreamingDedup.applyBatch(
      docs(10L -> textAish, 11L -> textD, 12L -> textD), 1L, t, "day")
    assert(n1 == 1, s"only the novel doc may land (got $n1)")
    assert(corpusIds(t) == Set(1L, 2L, 11L))

    // replay of batch 1: tag found → no-op, corpus unchanged
    val n1r = StreamingDedup.applyBatch(
      docs(10L -> textAish, 11L -> textD, 12L -> textD), 1L, t, "day")
    assert(n1r == 0L && corpusIds(t) == Set(1L, 2L, 11L))

    // a later batch near-dupping doc D (admitted in a PREVIOUS batch)
    // is rejected against the STORED corpus signatures
    val n2 = StreamingDedup.applyBatch(
      docs(20L -> (textD + " x1 x2")), 2L, t, "day")
    assert(n2 == 0 && corpusIds(t) == Set(1L, 2L, 11L))

    // the admitted corpus carries its materialized signature columns
    val cols = Snapshots.read(spark, t).columns.toSet
    assert(cols.contains("sh") && cols.contains("bands"),
      "signatures must be stored, not recomputed per batch")
  }
}
