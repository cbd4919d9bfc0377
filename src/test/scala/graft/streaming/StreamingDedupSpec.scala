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

  test("stream-maintained index equals the sequential batch rebuild " +
      "(greedy keep-first), and batched ingestion only tightens it") {
    val s = spark
    import s.implicits._
    // fixture with near-dup chains: B≈A and C≈B but C̸≈A, so greedy
    // order genuinely matters (B rejected against A; C then judged
    // against the ADMITTED corpus only — a clustering shortcut would
    // get C wrong)
    def mk(base: String, n: Int, extra: String = "") =
      (1 to n).map(i => s"$base$i").mkString(" ") +
        (if (extra.isEmpty) "" else s" $extra")
    val corpus = Seq(
      1L -> mk("a", 30),
      2L -> mk("a", 30, "t1 t2 t3 t4 t5 t6"), // ≈ doc1 (jac ~ .83)
      3L -> mk("a", 30,
        "t1 t2 t3 t4 t5 t6 u1 u2 u3 u4 u5 u6 u7 u8"), // chain: nearer doc2 than doc1
      4L -> mk("b", 30),
      5L -> mk("c", 30),
      6L -> mk("b", 30, "x1 x2"), // ≈ doc4
      7L -> mk("d", 30),
      8L -> mk("c", 28)) // ≈ doc5
    val thr = 0.5

    // reference: SEQUENTIAL greedy rebuild — admit a doc iff it
    // near-dups nothing already admitted; exact jaccard from the same
    // kernel the stream uses, computed once on an all-pairs frame
    val docsDf = corpus.toDF("doc_id", "text")
      .withColumn("sh", graft.functions.TextOps.sortedShingleSet(
        graft.functions.TextOps.tokens(org.apache.spark.sql.functions
          .col("text")), 3))
    val l = docsDf.select(col("doc_id").as("a"), col("sh").as("a_sh"))
    val r = docsDf.select(col("doc_id").as("b"), col("sh").as("b_sh"))
    val near = l.crossJoin(r).where(col("a") < col("b"))
      .where(graft.functions.TextKernels
        .sorted_jaccard(col("a_sh"), col("b_sh")) >= thr)
      .select("a", "b").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    val admittedRef = corpus.map(_._1).foldLeft(Vector.empty[Long]) {
      (acc, id) =>
        if (acc.exists(p => near.contains((p min id, p max id)))) acc
        else acc :+ id
    }.toSet

    // stream one doc per micro-batch: must equal the greedy rebuild
    val t1 = tmpDir("sdedup-eq")
    corpus.zipWithIndex.foreach { case ((id, text), i) =>
      StreamingDedup.applyBatch(docs(id -> text), i.toLong, t1, "day")
    }
    assert(corpusIds(t1) == admittedRef,
      s"stream ${corpusIds(t1)} vs greedy rebuild $admittedRef")

    // batched ingestion (3 per batch): within-batch rejection also
    // fires against lower-id docs that were themselves rejected, so
    // the admitted set can only shrink — never admit a near-dup pair,
    // never exceed the greedy set
    val t2 = tmpDir("sdedup-b3")
    corpus.grouped(3).zipWithIndex.foreach { case (g, i) =>
      StreamingDedup.applyBatch(docs(g: _*), i.toLong, t2, "day")
    }
    val got = corpusIds(t2)
    assert(got.subsetOf(admittedRef))
    for (a <- got; b <- got if a < b)
      assert(!near.contains((a, b)),
        s"batched corpus admitted near-dup pair ($a,$b)")
  }
}
