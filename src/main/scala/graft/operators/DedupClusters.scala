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
  * Two interchangeable implementations, cross-checked label-for-label
  * in DedupClustersSpec:
  *  - [[fromPairsGraphX]] — GraphX Pregel, O(diameter) supersteps in
  *    one tight RDD loop; the bench-scale default.
  *  - [[fromPairsStars]] — the alternating large-star/small-star
  *    algorithm (Kiveris et al., "Connected Components in MapReduce and
  *    Beyond", 2014) as pure DataFrame aggregations and equi-joins: no
  *    RDD caching of vertex+edge views, no per-node neighbor lists
  *    (`collect_list` would make one hot vertex a straggler; the
  *    min-agg + join shape keeps every stage a partial-aggregated
  *    shuffle AQE can rebalance). Heights halve per round → O(log n)
  *    rounds even on a path graph; dedup graphs settle in 2–3.
  */
object DedupClusters {

  /** Rounds cap: 2^40 nodes fit comfortably (heights halve per round). */
  private val MaxRounds = 40

  /** large-star: every node connects its LARGER neighbors to the
    * minimum of its closed neighborhood. Edges are kept canonical
    * (big, small); output likewise — m ≤ u < v for every emitted
    * (v, m). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbr = edges.select(col("hi").as("u"), col("lo").as("v"))
      .union(edges.select(col("lo").as("u"), col("hi").as("v")))
    val mins = nbr.groupBy(col("u"))
      .agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    // no distinct here: smallStar's terminal distinct dedups the round,
    // its min-aggs are duplicate-insensitive, and the saved shuffle is a
    // whole stage per round
    nbr.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))
  }

  /** small-star: every node connects its SMALLER neighbors (and itself)
    * to the minimum among them. On canonical (big, small) edges the
    * smaller-neighbor lists are exactly the rows grouped by `hi`. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy(col("hi")).agg(min(col("lo")).as("m"))
    edges.join(mins, "hi")
      .where(col("lo") =!= col("m"))
      .select(col("lo").as("hi"), col("m").as("lo"))
      .union(mins.select(col("hi"), col("m").as("lo")))
      .distinct()
  }

  /** @param pairs DataFrame with two long id columns (a near-dup edge).
    * @return (doc_id, cluster_id) — every doc that appears in any pair,
    *         labeled with its component's minimum doc_id.
    *
    * Dispatch mirrors the PageRank broadcast/shuffle split: GraphX
    * Pregel by default (at bench scale its single tight RDD loop beats
    * the stars' ~3 scheduled jobs per round by ~4×), and
    * `spark.graft.cc.stars=true` switches to [[fromPairsStars]] — the
    * RDD-free shape for edge sets where caching both GraphX RDD views
    * stops fitting and AQE-planned shuffles are the point.
    * DedupClustersSpec proves label parity on random graphs. */
  def fromPairs(spark: SparkSession, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame =
    if (spark.conf.getOption("spark.graft.cc.stars").contains("true"))
      fromPairsStars(spark, pairs, aCol, bCol)
    else fromPairsGraphX(spark, pairs, aCol, bCol)

  /** Alternating large-star/small-star rounds as pure DataFrame ops —
    * see the header; the 100 TB-scale formulation. */
  def fromPairsStars(spark: SparkSession, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    // materialize the pair list ONCE: both the node set and the initial
    // edge set derive from it, and upstream is typically the expensive
    // LSH/verification pipeline — recomputing it per consumer dwarfs the
    // star rounds themselves
    val raw = pairs.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b")).localCheckpoint()
    val nodes = raw.select(col("a").as("doc_id"))
      .union(raw.select(col("b").as("doc_id"))).distinct()
    var edges = raw
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct()
      .localCheckpoint()
    var edgeCount = edges.count()
    var converged = edgeCount == 0
    var round = 0
    while (!converged && round < MaxRounds) {
      // one round = large-star then small-star; localCheckpoint cuts the
      // per-round lineage (same discipline as the PageRank supersteps)
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nextCount = next.count()
      // fixpoint test on canonical distinct sets: equal counts plus
      // one-sided difference-emptiness ⇒ set equality (the count rides
      // the previous round's probe — one count + one except per round)
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edges = next
      edgeCount = nextCount
      round += 1
    }
    require(converged, s"connected components did not converge in $MaxRounds rounds")
    // at the fixpoint every edge is (member, component-min); roots and
    // isolated nodes label themselves
    nodes.join(edges, nodes("doc_id") === edges("hi"), "left")
      .select(col("doc_id"), coalesce(col("lo"), col("doc_id")).as("cluster_id"))
  }

  /** GraphX Pregel formulation — O(diameter) supersteps over the edge
    * RDD; kept as the independent cross-check for [[fromPairs]]. */
  def fromPairsGraphX(spark: SparkSession, pairs: DataFrame,
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
