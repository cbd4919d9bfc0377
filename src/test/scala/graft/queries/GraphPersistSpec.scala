package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Snapshots

/** The committed co-purchase edge store (q_graph_persist /
  * q_graph_append) stores RAW pair counts so generations merge by
  * summation. This spec plants the case a thresholded store would
  * lose — a pair at w=1 in the base commit and w=1 in the appended
  * delta, which is an edge ONLY in the merged view — and audits the
  * targeted-read pruning the (u, v) manifest stats buy.
  */
class GraphPersistSpec extends SparkSpec {

  // order 2 (base):  parts 10,20,30 → pairs (10,20) (10,30) (20,30)
  // order 4 (base):  parts 10,30    → pair (10,30)
  // order 1 (delta): parts 10,20    → pair (10,20)   <- crosses w>=2
  // order 3 (delta): parts 40,50    → pair (40,50)
  private def pp(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }
  private def base = pp((2L, 10L), (2L, 20L), (2L, 30L),
    (4L, 10L), (4L, 30L))
  private def delta = pp((1L, 10L), (1L, 20L), (3L, 40L), (3L, 50L))

  private def commitBoth(table: String): Unit = {
    Snapshots.commitFull(
      GraphQueries.rawPairCounts(base)
        .withColumn("ub", pmod(col("u"), lit(8))),
      table, "ub", statsCols = Seq("u", "v"))
    Snapshots.commitAppend(
      GraphQueries.rawPairCounts(delta)
        .withColumn("ub", pmod(col("u"), lit(8))),
      table, "ub", statsCols = Seq("u", "v"))
  }

  test("a pair crossing the edge threshold only ACROSS generations " +
      "is served; thresholding matches the full rebuild") {
    val t = tmpDir("graph_persist")
    commitBoth(t)
    val (e0, _) = GraphQueries.servedEdges(spark, t)
    val served = e0.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (10,20): w=1 base + w=1 delta → edge only when counts merge;
    // (10,30): w=2 in base alone; (20,30) and (40,50): w=1 → no edge
    assert(served == Set((10L, 20L), (10L, 30L)),
      s"served edge set wrong: $served")

    // value equality with a single-shot build over the union
    val full = GraphQueries.rawPairCounts(base.unionByName(delta))
      .where(col("w") >= 2).select(col("u"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == full, "split build must equal the full rebuild")
  }

  test("a targeted neighborhood read prunes to the node's bucket files " +
      "via the manifest (u, v) stats") {
    val t = tmpDir("graph_persist_prune")
    commitBoth(t)
    val cur = Snapshots.currentVersion(spark, t)
    val total = Snapshots.readManifest(spark, t, cur)
    // neighbors of node 10 (bucket 10 % 8 = 2): both generations wrote
    // a bucket-2 file; buckets 0 and 4 must be skipped at planning time
    val pruned = Snapshots.prunedFiles(spark, t, cur, "u", "10", "10")
    assert(pruned.nonEmpty && pruned.size < total.size,
      s"pruning must skip non-overlapping files: ${pruned.size} of " +
        s"${total.size}")
    assert(pruned.forall(_.partition == "2"),
      s"only bucket-2 files may survive: ${pruned.map(_.partition)}")
  }
}
