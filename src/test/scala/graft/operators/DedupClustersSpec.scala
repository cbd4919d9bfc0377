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

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating-star labels == GraphX Pregel labels on random graphs") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 120 + trial * 40
      val pairs = Seq.fill(n)(
        (rng.nextInt(200).toLong, rng.nextInt(200).toLong))
        .filter { case (a, b) => a != b }
        .toDF("a_id", "b_id")
      val stars = labels(
        DedupClusters.fromPairsStars(s, pairs, "a_id", "b_id"))
      val pregel = labels(
        DedupClusters.fromPairsGraphX(s, pairs, "a_id", "b_id"))
      assert(stars == pregel, s"trial $trial: label maps differ")
    }
  }

  test("path graph (worst diameter) converges and labels with the min") {
    val s = spark
    import s.implicits._
    // a 60-node chain: diameter 59, but star rounds halve heights —
    // converges well inside the O(log n) bound enforced by MaxRounds
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = labels(DedupClusters.fromPairsStars(s, pairs, "a_id", "b_id"))
    assert(got.size == 60 && got.values.forall(_ == 1L))
  }

  test("empty pair set yields an empty labeling") {
    val s = spark
    import s.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(DedupClusters.fromPairsStars(s, pairs, "a_id", "b_id").isEmpty)
  }

  test("spark.graft.cc.stars=true routes fromPairs to the stars path") {
    val s = spark
    import s.implicits._
    val pairs = Seq((5L, 9L), (9L, 7L)).toDF("a_id", "b_id")
    s.conf.set("spark.graft.cc.stars", "true")
    try {
      val got = labels(DedupClusters.fromPairs(s, pairs, "a_id", "b_id"))
      assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L))
    } finally s.conf.unset("spark.graft.cc.stars")
  }
}
