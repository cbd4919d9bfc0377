package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Snapshots

/** The stream-maintained co-purchase edge index must equal the
  * sequential batch rebuild — including the pair whose co-occurrence
  * count crosses the >= 2 edge threshold only ACROSS micro-batches —
  * and batch replay must be exactly-once. */
class StreamingGraphSpec extends SparkSpec {

  private def li(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("l_orderkey", "l_partkey")
  }

  // batch 0: order 1 {10,20,30}, order 2 {10,30}
  //   pairs: (10,20)=1 (10,30)=2 (20,30)=1
  // batch 1: order 3 {10,20}, order 4 {40,50}
  //   pairs: (10,20)=1 → crosses the threshold ONLY merged; (40,50)=1
  // batch 2: order 5 {40,50}
  //   pairs: (40,50)=1 → (40,50) crosses across batches 1+2
  private def b0 = li((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L),
    (2L, 30L))
  private def b1 = li((3L, 10L), (3L, 20L), (4L, 40L), (4L, 50L))
  private def b2 = li((5L, 40L), (5L, 50L))

  private def servedSet(table: String): Set[(Long, Long)] =
    StreamingGraph.edges(spark, table)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stream-maintained edges equal the batch rebuild; threshold " +
      "crossings across batches are served; replay is a no-op") {
    val t = tmpDir("sgraph") + "/edges"
    assert(StreamingGraph.applyBatch(b0, 0L, t) == 3L)
    assert(servedSet(t) == Set((10L, 30L)),
      "after batch 0 only the within-batch w=2 pair is an edge")

    assert(StreamingGraph.applyBatch(b1, 1L, t) == 2L)
    assert(servedSet(t) == Set((10L, 30L), (10L, 20L)),
      "(10,20) must cross the threshold across batches 0+1")

    assert(StreamingGraph.applyBatch(b2, 2L, t) == 1L)
    val streamed = servedSet(t)
    assert(streamed == Set((10L, 30L), (10L, 20L), (40L, 50L)))

    // equality with the one-shot rebuild over the full input
    val full = graft.queries.GraphQueries
      .rawPairCounts(b0.unionByName(b1).unionByName(b2).distinct())
      .where(col("w") >= 2).select(col("u"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == full,
      "stream-maintained index must equal the sequential rebuild")

    // replay of batch 1 (a foreachBatch retry): applied tag → no-op
    val v = Snapshots.currentVersion(spark, t)
    assert(StreamingGraph.applyBatch(b1, 1L, t) == 0L)
    assert(Snapshots.currentVersion(spark, t) == v,
      "replay must not publish a new version")
    assert(servedSet(t) == streamed, "replay must not change the graph")
  }
}
