package graft.operators

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {

  test("transitive closure: chained pairs collapse into one cluster") {
    val s = spark
    import s.implicits._
    // edges: 1-2, 2-3 (chain, no 1-3 edge), 10-11, 20 alone never appears
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val clusters = DedupClusters.fromPairs(s, pairs, "a_id", "b_id")
    val byDoc = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) == byDoc(2L) && byDoc(2L) == byDoc(3L),
      "chain must be one component")
    assert(byDoc(10L) == byDoc(11L))
    assert(byDoc(1L) != byDoc(10L))

    val summary = DedupClusters.summarize(clusters).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getSeq[Long](3)))
      .toMap
    assert(summary(1L) == (3L, Seq(1L, 2L, 3L)))
    assert(summary(10L) == (2L, Seq(10L, 11L)))
  }

  test("end-to-end over the LSH pipeline: planted dup triangle clusters together") {
    val s = spark
    import s.implicits._
    // three near-identical docs + unrelated ones, through the real
    // minhash-LSH candidate query shape
    import org.apache.spark.sql.functions._
    import graft.functions.TextOps
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " z1"), (3L, base + " z2"),
      (50L, (1 to 60).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    val prepped = docs.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val buckets = prepped.select(col("doc_id"),
      explode(TextOps.lshBands(
        TextOps.minhashSignature(col("sh"), 48), 12, 4)).as("b"))
    val pairs = buckets.as("x").join(buckets.as("y"),
        col("x.b") === col("y.b") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val summary = DedupClusters.summarize(
      DedupClusters.fromPairs(s, pairs, "a_id", "b_id")).collect()
    val cluster1 = summary.find(_.getLong(1) == 1L)
    assert(cluster1.isDefined, "planted triangle missing")
    assert(cluster1.get.getSeq[Long](3) == Seq(1L, 2L, 3L),
      s"got ${cluster1.get.getSeq[Long](3)}")
    assert(!summary.exists(_.getSeq[Long](3).contains(50L)),
      "unrelated doc must not join any cluster")
  }
}
