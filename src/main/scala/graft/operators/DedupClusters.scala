package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster formation: the step AFTER near-dup pair generation
  * in a corpus dedup pipeline. LSH/SimHash emit pairwise edges; keeping
  * "one doc per near-dup group" requires the transitive closure —
  * connected components over the pair graph (a ~ b, b ~ c ⇒ {a,b,c} is
  * one group even if (a,c) never collided).
  *
  * GraphX's ConnectedComponents runs this as iterative Pregel over the
  * edge RDD — O(diameter) supersteps, each a shuffle on vertex id; dedup
  * graphs are near-degenerate (tiny diameter), so this converges in a
  * few rounds at any corpus size. The canonical keep-doc per cluster is
  * the minimum doc_id (= the component id GraphX assigns).
  */
object DedupClusters {

  /** @param pairs DataFrame with two long id columns (a near-dup edge).
    * @return (doc_id, cluster_id) — every doc that appears in any pair,
    *         labeled with its component's minimum doc_id. */
  def fromPairs(spark: SparkSession, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    import spark.implicits._
    val edges = pairs
      .select(col(aCol).cast("long"), col(bCol).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph.fromEdges(edges, defaultValue = ())
    graph.connectedComponents().vertices
      .toDF("doc_id", "cluster_id")
  }

  /** Cluster summary: per cluster the keeper (min id), member count, and
    * the members to drop — the actionable dedup output. */
  def summarize(clusters: DataFrame): DataFrame =
    clusters
      .groupBy(col("cluster_id"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_members"),
        sort_array(collect_list(col("doc_id"))).as("members"))
      .orderBy(col("keep_id"))
}
