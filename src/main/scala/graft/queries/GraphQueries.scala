package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.Tables

/** Iterative graph analytics over the star schema — the computation
  * class (loop-until-k of join + re-aggregate) that sits beside the
  * one-shot relational inventory. GraphX connected components already
  * covers the vertex-program path ([[graft.operators.DedupClusters]]);
  * this module runs the DataFrame-native iteration pattern instead:
  * the edge relation is a plain DataFrame reused across iterations, so
  * Spark's ReuseExchange dedups the repeated edge shuffles inside the
  * single final plan, and each iteration is one shuffle on the source
  * vertex — the same cost shape a Pregel superstep has.
  *
  * Everything is INTEGER arithmetic (rank units of 1e-6), so five
  * unrolled iterations are bit-identical across engines and the oracle
  * replays them exactly — the same engine-exactness trick as the
  * k-means IVF training ([[SimilarityQueries]]).
  */
object GraphQueries {

  private val Iters = 5
  private val CheckpointEvery = 2

  /** The oracle unrolls the same five integer iterations the engine
    * runs, CTE by CTE (aggregates are illegal in a recursive CTE term,
    * so unrolling IS the standard oracle form — same as the k-means
    * replay). */
  private def pagerankSql: String = {
    val iters = (1 to Iters).map { i =>
      s"""r$i AS (SELECT e.b AS node,
         |  150000 + CAST(SUM((pr.rank * 85) // (100 * e.outdeg)) AS BIGINT)
         |    AS rank
         |  FROM e JOIN r${i - 1} pr ON e.a = pr.node GROUP BY e.b)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |ed AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
       |dg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS outdeg
       |       FROM ed GROUP BY a),
       |e AS (SELECT ed.a, ed.b, dg.outdeg FROM ed JOIN dg ON ed.a = dg.a),
       |r0 AS (SELECT a AS node, CAST(1000000 AS BIGINT) AS rank FROM dg),
       |$iters
       |SELECT node, rank FROM r$Iters
       |ORDER BY rank DESC, node LIMIT 50""".stripMargin
  }

  /** k-core peeling oracle: 6 unrolled MATERIALIZED rounds (DuckDB's
    * default CTE inlining is exponential in rounds — measured hang).
    * Shared verbatim by q_kcore_copurchase (inline derivation) and
    * q_graph_append (serve from the committed edge store) — the same
    * SQL proving both execution shapes answer identically. */
  private def kcoreSql: String = {
    val base =
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
        |           FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
        |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM e0
        |     UNION ALL SELECT v, u FROM e0),
        |a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM e)"""
        .stripMargin
    val rounds = (1 to 6).map { r =>
      s"""a$r AS MATERIALIZED (SELECT e.u AS node
         |  FROM e JOIN a${r - 1} x ON e.u = x.node
         |         JOIN a${r - 1} y ON e.v = y.node
         |  GROUP BY e.u HAVING COUNT(*) >= 2)""".stripMargin
    }.mkString(",\n")
    val counts = (0 to 6).map { r =>
      s"SELECT $r AS round, CAST(COUNT(*) AS BIGINT) AS n_alive" +
        s" FROM a$r"
    }.mkString("\nUNION ALL\n")
    s"""$base,
       |$rounds
       |SELECT CAST(round AS BIGINT) AS round, n_alive FROM (
       |$counts)
       |ORDER BY round""".stripMargin
  }

  /** 3-round synchronous LPA + community-size head oracle. Shared
    * verbatim by q_label_propagation (inline derivation) and
    * q_graph_persist (serve from the committed edge store). */
  private def lpaSql: String = {
    val base =
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
        |           FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
        |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM e0
        |     UNION ALL SELECT v, u FROM e0),
        |l0 AS MATERIALIZED (SELECT u AS node, u AS label
        |     FROM (SELECT DISTINCT u FROM e))""".stripMargin
    val rounds = (1 to 3).map { r =>
      s"""c$r AS MATERIALIZED (SELECT e.u AS node, p.label,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e JOIN l${r - 1} p ON e.v = p.node GROUP BY 1, 2),
         |l$r AS MATERIALIZED (SELECT node, label FROM (
         |  SELECT node, label,
         |    row_number() OVER (PARTITION BY node
         |      ORDER BY c DESC, label) AS rn
         |  FROM c$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds,
       |cs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
       |       FROM l3 GROUP BY label)
       |SELECT label, csize,
       |  CAST(COUNT(*) OVER () AS BIGINT) AS n_communities
       |FROM cs
       |ORDER BY csize DESC, label LIMIT 20""".stripMargin
  }

  /** 5-hop BFS reachability oracle from the hub node — shared verbatim
    * by q_graph_bfs_hops (inline derivation) and q_graph_serve_bfs
    * (committed edge store). */
  private def bfsSql: String = {
    val base =
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
        |           FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
        |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM e0
        |     UNION ALL SELECT v, u FROM e0),
        |v0 AS MATERIALIZED (SELECT u AS node FROM (
        |  SELECT u, COUNT(*) AS c FROM e GROUP BY u
        |  ORDER BY c DESC, u LIMIT 1))""".stripMargin
    val rounds = (1 to 5).map { r =>
      s"""v$r AS MATERIALIZED (SELECT DISTINCT node FROM (
         |  SELECT node FROM v${r - 1}
         |  UNION ALL
         |  SELECT e.v AS node FROM e JOIN v${r - 1} x ON e.u = x.node))"""
        .stripMargin
    }.mkString(",\n")
    val counts = (0 to 5).map { r =>
      s"SELECT $r AS hop, CAST(COUNT(*) AS BIGINT) AS n_reached" +
        s" FROM v$r"
    }.mkString("\nUNION ALL\n")
    s"""$base,
       |$rounds
       |SELECT CAST(hop AS BIGINT) AS hop, n_reached FROM (
       |$counts)
       |ORDER BY hop""".stripMargin
  }

  /** The 5-hop BFS frontier expansion over an undirected edge list
    * (the q_graph_bfs_hops iteration, factored for the edge-store
    * serve path). */
  private def bfsTrace(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    var visited = e.groupBy(col("u"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("u"))
      .limit(1)
      .select(col("u").as("node"))
      .localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer(
      visited.agg(count(lit(1)).cast("long").as("n_reached"))
        .select(lit(0L).as("hop"), col("n_reached")))
    for (r <- 1 to 5) {
      visited = visited
        .unionByName(e.join(visited, col("u") === col("node"))
          .select(col("v").as("node")))
        .distinct()
        .localCheckpoint()
      counts += visited.agg(count(lit(1)).cast("long").as("n_reached"))
        .select(lit(r.toLong).as("hop"), col("n_reached"))
    }
    counts.reduce(_ unionByName _).orderBy(col("hop"))
  }

  /** Newman-modularity-of-LPA oracle (3 LPA rounds + the 128-bit exact
    * modularity audit) — shared verbatim by q_modularity_lpa and
    * q_graph_serve_modularity. */
  private def modularitySql: String = {
    val base =
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
        |           FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
        |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM e0
        |     UNION ALL SELECT v, u FROM e0),
        |l0 AS MATERIALIZED (SELECT u AS node, u AS label
        |     FROM (SELECT DISTINCT u FROM e))""".stripMargin
    val rounds = (1 to 3).map { r =>
      s"""c$r AS MATERIALIZED (SELECT e.u AS node, p.label,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e JOIN l${r - 1} p ON e.v = p.node GROUP BY 1, 2),
         |l$r AS MATERIALIZED (SELECT node, label FROM (
         |  SELECT node, label,
         |    row_number() OVER (PARTITION BY node
         |      ORDER BY c DESC, label) AS rn
         |  FROM c$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$rounds,
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
       |dc AS (SELECT l.label, CAST(COUNT(*) AS BIGINT) AS d_c
       |  FROM e JOIN l3 l ON e.u = l.node GROUP BY l.label),
       |mc AS (SELECT la.label, CAST(COUNT(*) AS BIGINT) AS m_c
       |  FROM e0 JOIN l3 la ON e0.u = la.node
       |          JOIN l3 lb ON e0.v = lb.node
       |  WHERE la.label = lb.label GROUP BY la.label),
       |num AS (SELECT CAST(SUM(4 * CAST(m.m AS HUGEINT)
       |      * COALESCE(mc.m_c, 0)
       |      - CAST(dc.d_c AS HUGEINT) * dc.d_c) AS HUGEINT) AS num,
       |    CAST(COUNT(*) AS BIGINT) AS n_communities, MAX(m.m) AS m
       |  FROM dc LEFT JOIN mc ON dc.label = mc.label, m)
       |SELECT n_communities, m AS m_edges,
       |  CAST(CASE WHEN num < 0
       |    THEN -(ABS(num) * 1000000
       |           // (4 * CAST(m AS HUGEINT) * m))
       |    ELSE num * 1000000 // (4 * CAST(m AS HUGEINT) * m) END
       |    AS BIGINT) AS modularity_ppm
       |FROM num ORDER BY n_communities""".stripMargin
  }

  /** The modularity audit body over (e0, e) — 3 LPA rounds + the
    * exact-integer Newman score (factored for the edge-store serve
    * path; see q_modularity_lpa's scaladoc for the arithmetic). */
  private def modularityOf(e0: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val labels = lpaLabels(e, rounds = 3)
    val m = e0.agg(count(lit(1)).cast("long").as("m"))
    val dc = e.join(labels, e("u") === labels("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("d_c"))
    val mc = e0
      .join(labels.select(col("node").as("na"), col("label").as("la")),
        col("u") === col("na"))
      .join(labels.select(col("node").as("nb"), col("label").as("lb")),
        col("v") === col("nb"))
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("mlabel"))
      .agg(count(lit(1)).cast("long").as("m_c"))
    dc.join(mc, col("label") === col("mlabel"), "left")
      .crossJoin(broadcast(m))
      .agg(
        sum(expr("4 * CAST(m AS DECIMAL(19,0)) * COALESCE(m_c, 0)" +
          " - CAST(d_c AS DECIMAL(19,0)) * d_c"))
          .cast("decimal(38,0)").as("num"),
        count(lit(1)).cast("long").as("n_communities"),
        max(col("m")).as("m_edges"))
      .select(col("n_communities"), col("m_edges"),
        expr("CAST(CASE WHEN num < 0 THEN -(ABS(num) * 1000000" +
          " div (4 * CAST(m_edges AS DECIMAL(19,0)) * m_edges))" +
          " ELSE num * 1000000" +
          " div (4 * CAST(m_edges AS DECIMAL(19,0)) * m_edges) END" +
          " AS BIGINT)").as("modularity_ppm"))
      .orderBy(col("n_communities"))
  }

  /** Derive + commit the co-purchase pair-count store (clean slate for
    * deterministic versions) and return its table path — the build
    * half shared by the serve-off-the-store queries. */
  private def edgeStore(s: org.apache.spark.sql.SparkSession, d: String,
      sub: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"${sys.props("java.io.tmpdir")}/$sub/$tag"
    val p = new org.apache.hadoop.fs.Path(table)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    val pp = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    graft.io.Snapshots.commitFull(
      rawPairCounts(pp).withColumn("ub", pmod(col("u"), lit(8))),
      table, "ub", statsCols = Seq("u", "v"))
    table
  }

  /** Walk-corpus oracle CTEs through `wall` (walk_id, step, node) —
    * shared by q_graph_random_walks and q_graph_skipgram_pairs. Same
    * deterministic draw as the engine: neighbor index
    * md5_number_upper(walk‖step‖node) % 2^60 % degree over the
    * (u, v)-sorted adjacency. */
  private def walkChainSql: String = {
    val base =
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
        |           FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
        |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM e0
        |     UNION ALL SELECT v, u FROM e0),
        |dg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
        |     FROM e GROUP BY u),
        |nb AS MATERIALIZED (SELECT u, v,
        |      CAST(row_number() OVER (PARTITION BY u ORDER BY v) - 1
        |        AS BIGINT) AS idx
        |     FROM e),
        |w0 AS MATERIALIZED (SELECT u AS walk_id, u AS node FROM (
        |     SELECT u FROM dg ORDER BY deg DESC, u LIMIT 20))"""
        .stripMargin
    val steps = (1 to 4).map { k =>
      s"""w$k AS MATERIALIZED (SELECT w.walk_id, nb.v AS node
         |  FROM w${k - 1} w
         |  JOIN dg ON w.node = dg.u
         |  JOIN nb ON nb.u = w.node AND nb.idx =
         |    CAST(md5_number_upper(concat(CAST(w.walk_id AS VARCHAR),
         |      '_${k}_', CAST(w.node AS VARCHAR)))
         |      % 1152921504606846976 AS BIGINT) % dg.deg)"""
        .stripMargin
    }.mkString(",\n")
    val out = (0 to 4).map { k =>
      s"SELECT walk_id, CAST($k AS BIGINT) AS step, node FROM w$k"
    }.mkString("\nUNION ALL\n")
    s"""$base,
       |$steps,
       |wall AS MATERIALIZED (
       |$out)""".stripMargin
  }

  /** Engine walk corpus: (walk_id, step, node), unsorted — the
    * q_graph_random_walks iteration, factored for the skip-gram pair
    * extraction. */
  private def walkCorpus(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val (_, e) = partEdges(s, d)
    val dg = e.groupBy(col("u")).agg(count(lit(1)).cast("long").as("deg"))
    val nb = e.withColumn("idx",
      (row_number().over(Window.partitionBy(col("u")).orderBy(col("v")))
        - 1).cast("long"))
    var walk = dg.orderBy(col("deg").desc, col("u")).limit(20)
      .select(col("u").as("walk_id"), col("u").as("node"))
    val rows = scala.collection.mutable.ArrayBuffer(
      walk.select(col("walk_id"), lit(0L).as("step"), col("node")))
    for (k <- 1 to 4) {
      // iteration shape, MEASURED both ways at sf0.1: per-step
      // localCheckpoint makes the tiny frontier's stats visible (AQE
      // then broadcasts it, smj 16→0) but the 4 job barriers cost
      // more than the saved shuffles at this walk count (1.9 → 3.4 s —
      // the same barrier-vs-broadcast trade the pagerank scaladoc
      // documents); the lazy stats-driven form wins until the frontier
      // (seeds × walks/node) is itself data-scale, where the
      // checkpointed variant takes over exactly like shuffle-pagerank
      walk = walk
        .join(dg, walk("node") === dg("u"))
        .withColumn("pick",
          pmod(graft.functions.TextOps.md5Low60(
            concat(col("walk_id").cast("string"), lit(s"_${k}_"),
              col("node").cast("string"))), col("deg")))
        .join(nb.select(col("u").as("nu"), col("v").as("nv"),
            col("idx")),
          col("node") === col("nu") && col("pick") === col("idx"))
        .select(col("walk_id"), col("nv").as("node"))
      rows += walk.select(col("walk_id"), lit(k.toLong).as("step"),
        col("node"))
    }
    rows.reduce(_ unionByName _)
  }

  val all: Seq[Q] = Seq(
    // --- PageRank over the customer–supplier co-purchase graph ----------
    // Undirected bipartite graph: customer c and supplier s are linked
    // when some order of c contains a lineitem of s (node ids 2c / 2s+1
    // keep the key spaces apart). Five damped power iterations in exact
    // integer units: contribution = (rank * 85) div (100 * outdeg),
    // new rank = 150000 + Σ contributions — floor division on positive
    // longs is identical in both engines, and total mass stays below
    // 2^53.
    //
    // Iteration discipline (all three shapes measured at sf0.1):
    // naively nesting the joins puts i copies of the edge subtree in
    // iteration i's lineage — 22 parquet scans in the final plan, and
    // ReuseExchange recovers none (per-iteration re-aliasing defeats
    // canonical matching). persist() on the edge relation collapses
    // every nested reference onto one InMemoryRelation (the cache is
    // the iteration working set — left pinned, LRU-evictable), and each
    // rank generation rides a broadcast (one row per node, far under
    // any broadcast threshold here), so a superstep is a narrow pass
    // over cached edges plus a combiner-friendly aggregate. The eager
    // localCheckpoint-per-iteration variant was ~40% SLOWER at this
    // node count (five job barriers dominate); it becomes the right
    // shape only when ranks outgrow a broadcast — billion-node graphs,
    // where the SHUFFLE-JOIN superstep below takes over.
    //
    // Beyond-broadcast regime: `spark.graft.pagerank.shuffle=true`
    // switches every superstep to a shuffled hash join of a
    // key-partitioned rank table against the (pre-partitioned, cached)
    // edge relation — no broadcast of ranks anywhere in the plan — with
    // an eager localCheckpoint every CheckpointEvery supersteps to
    // truncate lineage (unbounded iteration lineage is what OOMs
    // drivers on long power iterations). Crossover: ranks broadcast ≈
    // 16 bytes/node; at ~26 MB per 10 M nodes the broadcast is still
    // fine at sf10 (measured note in git history) but a billion-node
    // graph needs ~16 GB on every executor — the shuffle variant keeps
    // per-superstep memory at (edges+ranks)/partitions instead. Same
    // integer arithmetic bit-for-bit: the flag changes the PLAN, never
    // the result (GraphShuffleSpec proves both).
    Q("q_pagerank_copurchase", pagerankSql) { (s, d) =>
      val (out, e) = pagerankTopK(s, d)
      // materialize the bounded top-50 now and release the pinned edge
      // cache — the iteration working set has no reader after this
      // query, and leaving it resident compounds across a 250-query
      // session (the q_weighted_median_price discipline). Non-bounded
      // outputs (q_triangle_copurchase: one row per part) keep their
      // documented retained cache instead — collecting them would be a
      // driver-side materialization of data-scale rows. Consequence:
      // the returned frame is a LocalRelation, so plan assertions
      // (GraphShuffleSpec) and bench fingerprints inspect
      // [[pagerankTopK]]'s lazy frame instead.
      val rows = out.collect().toSeq
      e.unpersist()
      s.createDataFrame(rows.asJava, out.schema)
    },

    // --- Connected components on the part co-purchase graph -------------
    // The alternating large-star/small-star rounds
    // (operators.DedupClusters.fromPairsStars — Kiveris et al. 2014)
    // run oracle-checked here, on a graph with real structure: the
    // sf0.01 co-purchase graph has one giant 1860-member component plus
    // a fringe of pairs/triples, so the rounds must collapse a large
    // shallow tree, not just the tiny dedup clusters the spec exercises.
    // Oracle: min-label propagation as a recursive CTE over the same
    // edge set. Component summary (min id, size, max member) is the
    // stable projection — labels themselves are the min ids.
    Q(
      "q_components_copurchase",
      """WITH RECURSIVE pp AS (SELECT DISTINCT l_orderkey, l_partkey
        |                      FROM lineitem),
        |e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
        |      FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |cc AS (SELECT u AS node, u AS comp FROM e
        |       UNION
        |       SELECT e.v, cc.comp FROM cc JOIN e ON e.u = cc.node),
        |lab AS (SELECT node, MIN(comp) AS cluster_id FROM cc GROUP BY node)
        |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_members,
        |  CAST(MAX(node) AS BIGINT) AS max_member
        |FROM lab GROUP BY cluster_id
        |ORDER BY cluster_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val p = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = p.as("x")
        .join(p.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select(col("a"), col("b"))
      graft.operators.DedupClusters.fromPairsStars(s, edges, "a", "b")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(col("doc_id")).as("max_member"))
        .orderBy(col("cluster_id"))
    },

    // --- Triangle counting on the part co-purchase graph ----------------
    // Parts are linked when they ship together in >= 2 distinct orders
    // (the weight floor prunes the heavy tail of one-off co-occurrence —
    // same densification the pagerank edge relation would need at scale).
    // Per-part triangle participation is the classic local clustering
    // signal (recommendation candidates, community seeds).
    //
    // Scale shape — "compact-forward" (Schank & Wagner 2005, public):
    // orient every edge from its lower-(degree, id) endpoint to the
    // higher one. Orientation caps out-degree at O(sqrt(m)) on any
    // graph, so the wedge join (e1.dst = e2.src) generates
    // O(m^1.5) candidate wedges instead of Σ deg² — the difference
    // between hours and minutes on a skewed 100 TB co-purchase graph.
    // Each triangle u≺v≺w survives exactly once (as wedge u→v→w closed
    // by u→w), so no post-hoc de-dup. All three steps are equi-joins
    // on part keys; the closure check is a LEFT SEMI join (no payload
    // moves). The oracle counts the same triangle set with simple id
    // orientation — the per-part counts are orientation-invariant.
    Q(
      "q_triangle_copurchase",
      """WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
        |      FROM p a JOIN p b
        |        ON a.l_orderkey = b.l_orderkey
        |       AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |        FROM e e1 JOIN e e2 ON e1.b = e2.a
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |vx AS (SELECT u AS part_id FROM tri
        |       UNION ALL SELECT v FROM tri
        |       UNION ALL SELECT w FROM tri)
        |SELECT part_id, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM vx GROUP BY part_id
        |ORDER BY n_tri DESC, part_id""".stripMargin
    ) { (s, d) =>
      val p = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = p.as("x")
        .join(p.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select(col("a"), col("b"))
      val deg = edges.select(col("a").as("pid"))
        .union(edges.select(col("b").as("pid")))
        .groupBy(col("pid")).agg(count(lit(1)).as("deg"))
      // orient low-(deg, id) -> high-(deg, id); ids break degree ties
      val oriented = edges
        .join(deg.select(col("pid").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("pid").as("b"), col("deg").as("db")), "b")
        .select(
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("src"), col("b").as("dst")))
            .otherwise(struct(col("b").as("src"), col("a").as("dst")))
            .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        // referenced three times below (both wedge sides + closure);
        // without persist each reference re-derives the edge list from
        // the order-pair self-join — three copies of the most expensive
        // subtree in one plan (same working-set discipline as the
        // pagerank edge relation above)
        .persist()
      val wedges = oriented.as("e1")
        .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("u"), col("e1.dst").as("v"),
          col("e2.dst").as("tw"))
      val tri = wedges.join(oriented.as("e3"),
        col("u") === col("e3.src") && col("tw") === col("e3.dst"),
        "left_semi")
      tri.select(explode(array(col("u"), col("v"), col("tw"))).as("part_id"))
        .groupBy(col("part_id")).agg(count(lit(1)).as("n_tri"))
        .orderBy(col("n_tri").desc, col("part_id"))
    },

    // --- item-item collaborative filtering (top-3 by Jaccard) ------------
    // The "similar items" serving table: parts co-purchased in the same
    // order, scored by Jaccard over their order sets in exact integer
    // ppm, top-3 per item. Pair generation fans out per ORDER (bounded
    // by basket size, like q_basket_rules), per-item order counts join
    // back on the part key, and the only window partitions by part — no
    // global sort, no cross join. co >= 2 prunes noise pairs before the
    // rank, the same support floor the basket rules use.
    Q(
      "q_item_cf",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_ord
        |  FROM op GROUP BY l_partkey),
        |co AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    CAST(COUNT(*) AS BIGINT) AS co
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY pa, pb HAVING COUNT(*) >= 2),
        |j AS (SELECT pa, pb, co,
        |    CAST(co * 1000000 // (na.n_ord + nb.n_ord - co) AS BIGINT)
        |      AS jaccard_ppm
        |  FROM co JOIN n na ON co.pa = na.l_partkey
        |          JOIN n nb ON co.pb = nb.l_partkey),
        |r AS (SELECT pa, pb, co, jaccard_ppm, row_number() OVER (
        |    PARTITION BY pa ORDER BY jaccard_ppm DESC, co DESC, pb) AS rk
        |  FROM j)
        |SELECT pa AS part_a, pb AS part_b, co, jaccard_ppm,
        |  CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3
        |ORDER BY part_a NULLS FIRST, rk NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val n = op.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_ord"))
      val co = op.as("a")
        .join(op.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(count(lit(1)).as("co"))
        .where(col("co") >= 2)
      val j = co
        .join(n.select(col("l_partkey").as("pa"), col("n_ord").as("na")), "pa")
        .join(n.select(col("l_partkey").as("pb"), col("n_ord").as("nb")), "pb")
        .select(col("pa"), col("pb"), col("co"),
          expr("CAST(co * 1000000 div (na + nb - co) AS BIGINT)")
            .as("jaccard_ppm"))
      val w = Window.partitionBy(col("pa"))
        .orderBy(col("jaccard_ppm").desc, col("co").desc, col("pb"))
      j.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select(col("pa").as("part_a"), col("pb").as("part_b"),
          col("co"), col("jaccard_ppm"), col("rk"))
        .orderBy(col("part_a"), col("rk"))
    },

    // --- k-core decomposition by iterative peeling ------------------------
    // The graph-densification primitive (community seeds, spam-farm
    // detection, the subgraph GNN samplers train on): repeatedly drop
    // nodes whose alive-degree falls under k until a fixpoint. Peeling
    // is inherently iterative — each round is ONE degree aggregate over
    // the alive-filtered edge relation (two semi-joins + groupBy on the
    // node key), the same bounded-superstep shape as pagerank; 6 rounds
    // reach the 2-core fixpoint on this graph (the output trace SHOWS
    // convergence: trailing rounds repeat n_alive), and the round count
    // is fixed, so both engines replay identical work whether or not a
    // larger graph converges — no data-dependent control flow. Spark
    // caps lineage with a per-round localCheckpoint (the BPE/pagerank
    // discipline); the oracle's unrolled CTEs are MATERIALIZED because
    // each round references the previous twice — DuckDB's default
    // inlining made the plan EXPONENTIAL in rounds (measured hang at 8
    // rounds; materialization makes it linear, the same fix the
    // localCheckpoint applies on the Spark side).
    Q("q_kcore_copurchase", kcoreSql) { (s, d) =>
      val (_, e) = partEdges(s, d)
      kcoreTrace(e)
    },

    // --- BFS reachability frontier from the hub part ----------------------
    // Hop-distance expansion from the highest-degree node (ties to the
    // smallest id): 5 rounds of visited ∪ neighbors(visited), reporting
    // |visited| per hop — the reachability/diameter probe for the
    // copurchase graph (how many parts a hub recommendation can reach
    // in k hops). Each round is one equi-join frontier expansion + a
    // distinct on the node key — the bounded-superstep shape again;
    // round count fixed, convergence visible in the trace when the
    // component is exhausted. Same lineage discipline as k-core
    // (per-round localCheckpoint ↔ MATERIALIZED oracle CTEs).
    Q("q_graph_bfs_hops", bfsSql) { (s, d) =>
      val (_, e) = partEdges(s, d)
      bfsTrace(e)
    },

    // --- serve BFS off the committed edge store --------------------------
    // Completes the build-once/serve-many family: the reachability
    // probe runs off the persisted pair-count table (oracle =
    // q_graph_bfs_hops's full-corpus SQL verbatim — the commit is
    // semantically invisible).
    Q("q_graph_serve_bfs", bfsSql) { (s, d) =>
      val (_, e) = servedEdges(s, edgeStore(s, d, "graft_copurchase_bfs"))
      bfsTrace(e)
    },

    // --- serve the modularity audit off the committed edge store ---------
    Q("q_graph_serve_modularity", modularitySql) { (s, d) =>
      val (e0, e) =
        servedEdges(s, edgeStore(s, d, "graft_copurchase_mod"))
      modularityOf(e0, e)
    },

    // --- link prediction: common neighbors + Jaccard ---------------------
    // The classic neighborhood-overlap link predictor (Liben-Nowell &
    // Kleinberg, CIKM'03) over the part co-purchase graph: for every
    // NON-adjacent pair sharing at least one neighbor, score by common
    // neighbor count and by Jaccard overlap of the neighborhoods,
    // serve the top 20. Candidate generation is the wedge equi-join
    // (two edge copies meeting on the shared endpoint — the
    // q_triangle_copurchase shape, O(Σ deg²) wedges), adjacency is
    // removed with an anti-join, and degrees arrive by equi-join, so
    // every step is a hash shuffle on a key — no pairwise scan.
    //
    // HUB-DEGREE CAP (the 100 TB guard, now CODED, not just named):
    // nodes whose degree exceeds `spark.graft.graph.hubcap` (default
    // [[DefaultHubCap]]) are dropped as WEDGE CENTERS before the
    // e ⋈ e pairing. On a power-law graph one hub of degree h floods
    // the self-join with C(h,2) candidate pairs — quadratic in the
    // hub, and predictively worthless (every pair shares the hub, so
    // it separates nothing; the same reasoning stopword pruning
    // applies to df-heavy terms). Capping bounds the wedge stage at
    // Σ_{deg≤cap} deg² regardless of skew; cn then counts COMMON
    // NON-HUB NEIGHBORS, and the Jaccard denominators keep the FULL
    // degrees (the score semantics are unchanged — only candidate
    // generation is pruned). The oracle replays the same cap at the
    // default literal; the synthetic graph's max degree is far below
    // it, so base-tier results equal the pure form bit-for-bit, and
    // LinkPredictionSpec proves engagement + bounded candidates on an
    // adversarial planted-hub fixture (the emb_lsh_occupancy/PPJoin
    // occupancy-cap discipline). Jaccard in floor-ppm:
    // cn·1e6 // (deg(x)+deg(y)−cn); exact integers, ties by (x, y).
    Q(
      "q_link_prediction",
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
        |     FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |       AND a.l_partkey < b.l_partkey
        |     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT u, v FROM e0
        |     UNION ALL SELECT v, u FROM e0),
        |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY u),
        |wc AS (SELECT e.u, e.v FROM e JOIN dg ON e.u = dg.u
        |  WHERE dg.deg <= 10000),
        |cand AS (SELECT a.v AS x, b.v AS y, CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM wc a JOIN wc b ON a.u = b.u AND a.v < b.v
        |  GROUP BY 1, 2),
        |ne AS (SELECT c.x, c.y, c.cn FROM cand c
        |  WHERE NOT EXISTS (SELECT 1 FROM e0
        |                    WHERE e0.u = c.x AND e0.v = c.y)),
        |sc AS (SELECT n.x, n.y, n.cn,
        |    CAST(n.cn * 1000000 // (dx.deg + dy.deg - n.cn) AS BIGINT)
        |      AS jaccard_ppm
        |  FROM ne n JOIN dg dx ON n.x = dx.u JOIN dg dy ON n.y = dy.u)
        |SELECT x, y, cn, jaccard_ppm FROM sc
        |ORDER BY cn DESC, jaccard_ppm DESC, x, y LIMIT 20""".stripMargin
    ) { (s, d) =>
      val (e0, e) = partEdges(s, d)
      val cap = s.conf.getOption("spark.graft.graph.hubcap")
        .map(_.toLong).getOrElse(DefaultHubCap)
      linkPredictionScores(e0, e, cap)
        .orderBy(col("cn").desc, col("jaccard_ppm").desc, col("x"),
          col("y"))
        .limit(20)
    },

    // --- label-propagation communities ------------------------------------
    // Synchronous label propagation (Raghavan et al. 2007) made
    // deterministic: every node starts labeled by its own id, and each
    // of 3 synchronous rounds relabels every node with its neighbors'
    // MOST FREQUENT label, ties broken by the smaller label — a
    // (node, label) count aggregate plus a row_number pick per round,
    // both hash shuffles on the node key. Iteration discipline is the
    // k-core/BFS pair: per-round localCheckpoint on the Spark side ↔
    // MATERIALIZED round CTEs on the oracle side (DuckDB's default CTE
    // inlining is exponential in rounds — measured on the k-core
    // oracle). Isolated parts (no qualifying co-purchase edge) have no
    // neighbors and so no community — documented out. Output is the
    // community-size head plus the global community count, both exact.
    Q("q_label_propagation", lpaSql) { (s, d) =>
      val (_, e) = partEdges(s, d)
      communityHead(lpaLabels(e, rounds = 3))
    },

    // --- modularity of the LPA partition --------------------------------------
    // The quality score FOR q_label_propagation's output: Newman
    // modularity Q = Σ_c [m_c/m − (d_c/2m)²] of the 3-round LPA
    // partition over the same part co-purchase graph. Everything is
    // exact integers until ONE division: the per-community terms
    // cross-multiply into num = Σ_c (4·m·m_c − d_c²) (128-bit — d_c²
    // outgrows int64 on hub-heavy graphs), then Q_ppm = num·1e6/(4m²)
    // with the division sign-split to truncation because num CAN be
    // negative (a partition worse than random) and DuckDB's // floors
    // while Spark's div truncates. Intra-community edge counts and
    // degree sums are label equi-joins on the undirected edge list —
    // the LPA superstep shape again, so the modularity audit costs one
    // more superstep, not a new computation class.
    Q("q_modularity_lpa", modularitySql) { (s, d) =>
      val (e0, e) = partEdges(s, d)
      modularityOf(e0, e)
    },

    // --- degree distribution (power-of-two buckets) ---------------------------
    // The degree histogram every graph pipeline prints before choosing
    // an algorithm variant (broadcast vs shuffle pagerank, hub caps for
    // wedge joins): node counts per power-of-two degree bucket. The
    // bucket is length(bin(deg)) — the integer log2 idiom the BM25 idf
    // already uses, no libm — so the histogram is one degree aggregate
    // plus one bounded (≤64-key) rollup; share in floor-ppm of the
    // node count. The heavy tail visible here is exactly why
    // q_link_prediction documents a production hub cap.
    Q(
      "q_degree_distribution",
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
        |     FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
        |       AND a.l_partkey < b.l_partkey
        |     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY u),
        |b AS (SELECT CAST(1 << (length(bin(deg)) - 1) AS BIGINT)
        |      AS bucket_lo, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |  FROM dg GROUP BY bucket_lo)
        |SELECT bucket_lo, n_nodes,
        |  CAST(n_nodes * 1000000 // SUM(n_nodes) OVER () AS BIGINT)
        |    AS share_ppm
        |FROM b ORDER BY bucket_lo""".stripMargin
    ) { (s, d) =>
      val (_, e) = partEdges(s, d)
      e.groupBy(col("u"))
        .agg(count(lit(1)).cast("long").as("deg"))
        .select(expr("CAST(shiftleft(1, length(bin(deg)) - 1) AS BIGINT)")
          .as("bucket_lo"))
        .groupBy(col("bucket_lo"))
        .agg(count(lit(1)).cast("long").as("n_nodes"))
        .withColumn("share_ppm",
          expr("CAST(n_nodes * 1000000 div sum(n_nodes) over ()" +
            " AS BIGINT)"))
        .orderBy(col("bucket_lo"))
    },

    // --- co-purchase graph persisted as a snapshot table, then served ----
    // Identical answer to q_label_propagation (same oracle, by design):
    // what changes is the execution shape — the edge derivation commits
    // ONCE as raw pair counts (see the store comment above
    // [[rawPairCounts]]) and the LPA supersteps run off the committed
    // table. This is the build-once/serve-many shape the 8 inline graph
    // queries would share in production (each verify query stays
    // hermetic, so the inline twins keep their own derivation — the
    // same split as emb_knn_ivf vs emb_ivf_persist).
    Q("q_graph_persist", lpaSql) { (s, d) =>
      val (_, e) = servedEdges(s, edgeStore(s, d, "graft_copurchase"))
      communityHead(lpaLabels(e, rounds = 3))
    },

    // --- random-walk corpus generation (DeepWalk/node2vec-style) ---------
    // The graph→sequence bridge embedding trainers consume (Perozzi et
    // al., DeepWalk, KDD'14; Grover & Leskovec, node2vec, KDD'16 —
    // public): fixed-length walks over the co-purchase graph, emitted
    // as (walk_id, step, node) sequence rows — the "sentences" a
    // skip-gram trainer would read. The RNG is replaced by the
    // engine-exact deterministic draw the sampling family already uses
    // ([[graft.functions.TextOps.md5Low60]] ≡ DuckDB md5_number_upper
    // % 2^60): at step s the walk at node c moves to neighbor index
    // H(walk_id‖s‖c) mod deg(c) over the (u, v)-sorted adjacency list,
    // so both engines replay identical walks and the corpus is
    // reproducible run to run — the property a training corpus needs
    // anyway (resumable generation, debuggable lineage).
    //
    // Scale shape: the adjacency index is one row_number window over
    // the edge list; every step is one hash equi-join of the walk frontier
    // against (u, idx) — frontier-sized, never corpus-sized. Walks
    // here seed from the top-20 degree nodes; a production corpus
    // seeds from every node with walks_per_node × id salts, same plan.
    Q(
      "q_graph_random_walks",
      s"""$walkChainSql
         |SELECT walk_id, step, node FROM wall
         |ORDER BY walk_id NULLS FIRST, step NULLS FIRST""".stripMargin
    ) { (s, d) =>
      walkCorpus(s, d).orderBy(col("walk_id"), col("step"))
    },

    // --- skip-gram training pairs from the walk corpus -------------------
    // The stage AFTER walk generation in the DeepWalk pipeline: the
    // (center, context) co-occurrence pairs a skip-gram embedding
    // trainer actually optimizes over — every ordered pair of nodes
    // within window ±2 inside one walk, aggregated to pair counts.
    // One self-join of the walk corpus on walk_id (walks are short, so
    // the join fans out by window width, not corpus size) + one hash
    // aggregate on the pair key. Counts are symmetric by construction
    // (both orderings emitted) — the trainer consumes them as-is.
    Q(
      "q_graph_skipgram_pairs",
      s"""$walkChainSql
         |SELECT a.node AS center, b.node AS context,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM wall a JOIN wall b ON a.walk_id = b.walk_id
         |  AND a.step <> b.step AND abs(a.step - b.step) <= 2
         |GROUP BY 1, 2
         |ORDER BY center NULLS FIRST, context NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = walkCorpus(s, d)
      w.as("a")
        .join(w.as("b"),
          col("a.walk_id") === col("b.walk_id") &&
            col("a.step") =!= col("b.step") &&
            abs(col("a.step") - col("b.step")) <= 2)
        .groupBy(col("a.node").as("center"), col("b.node").as("context"))
        .agg(count(lit(1)).cast("long").as("n_pairs"))
        .orderBy(col("center"), col("context"))
    },

    // --- O(delta) edge append, serve across generations ------------------
    // The incremental half (the text_bm25_append / emb_ivf_append
    // twin): the base commit holds pair counts from half the orders,
    // the arriving orders' pair counts APPEND as a second generation —
    // cost O(delta orders), no base re-scan — and serving merges
    // generations by summing counts before the >= 2 threshold. The
    // oracle is q_kcore_copurchase's full-corpus SQL verbatim: a hash
    // match proves the split-build is semantically invisible, including
    // pairs whose count crosses the edge threshold only ACROSS the two
    // generations (w=1 base + w=1 delta — the case a thresholded store
    // would lose; GraphPersistSpec plants it explicitly).
    Q("q_graph_append", kcoreSql) { (s, d) =>
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val table =
        s"${sys.props("java.io.tmpdir")}/graft_copurchase_append/$tag"
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val pp = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      def half(parity: Int) =
        pp.where(pmod(col("l_orderkey"), lit(2)) === parity)
      graft.io.Snapshots.commitFull(
        rawPairCounts(half(0)).withColumn("ub", pmod(col("u"), lit(8))),
        table, "ub", statsCols = Seq("u", "v"))
      graft.io.Snapshots.commitAppend(
        rawPairCounts(half(1)).withColumn("ub", pmod(col("u"), lit(8))),
        table, "ub", statsCols = Seq("u", "v"))
      val (_, e) = servedEdges(s, table)
      kcoreTrace(e)
    }
  )

  /** Wedge-stage hub-degree cap default (`spark.graft.graph.hubcap`).
    * MUST match the literal in q_link_prediction's oracle SQL — the
    * conf exists for specs and operators, the default is the oracle
    * contract. 10k keeps the per-hub wedge contribution under
    * C(10k,2) ≈ 5·10⁷ pairs — one shuffle partition's worth — while
    * sitting far above any genuine product neighborhood. */
  private[queries] val DefaultHubCap = 10000L

  /** Link-prediction scoring over a prepared edge set, factored so the
    * adversarial planted-hub fixture (LinkPredictionSpec) can drive it
    * directly: wedge candidates from HUB-CAPPED centers, adjacency
    * anti-join, Jaccard over FULL degrees. `e0` is the canonical u<v
    * edge list, `e` its undirected doubling. */
  private[queries] def linkPredictionScores(
      e0: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame,
      cap: Long): org.apache.spark.sql.DataFrame = {
    val dg = e.groupBy(col("u")).agg(count(lit(1)).cast("long").as("deg"))
    // the cap prunes wedge CENTERS only — a left-semi join against the
    // under-cap node set, so no payload moves and the subsequent
    // self-join's worst case is Σ_{deg≤cap} deg², independent of skew
    val wc = e.join(dg.where(col("deg") <= cap).select(col("u")),
      Seq("u"), "left_semi")
    val cand = wc.as("a")
      .join(wc.as("b"),
        col("a.u") === col("b.u") && col("a.v") < col("b.v"))
      .groupBy(col("a.v").as("x"), col("b.v").as("y"))
      .agg(count(lit(1)).cast("long").as("cn"))
    val ne = cand.join(e0,
      cand("x") === e0("u") && cand("y") === e0("v"), "left_anti")
    ne.join(dg.withColumnRenamed("u", "x")
          .withColumnRenamed("deg", "dx"), "x")
      .join(dg.withColumnRenamed("u", "y")
          .withColumnRenamed("deg", "dy"), "y")
      .select(col("x"), col("y"), col("cn"),
        expr("CAST(cn * 1000000 div (dx + dy - cn) AS BIGINT)")
          .as("jaccard_ppm"))
  }

  /** The part co-purchase graph shared by the BFS / link-prediction /
    * LPA / modularity / degree entries: parts co-occurring in ≥2
    * orders, as (canonical u<v edges, checkpointed undirected list). */
  private def partEdges(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val pp = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    // e0 is checkpointed too: the modularity audit references it in two
    // further joins (intra-community edges, edge total), and without
    // the cut each reference re-runs the wedge self-join from raw
    // lineitem; e derives from the checkpointed e0 by a narrow union
    // but is ALSO cut because LPA supersteps join it repeatedly
    val e0 = pp.as("a")
      .join(pp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select(col("u"), col("v"))
      .localCheckpoint()
    val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    (e0, e)
  }

  /** The 6-round k-core peel over an undirected edge list (the
    * q_kcore_copurchase iteration, factored so q_graph_append can run
    * it off the committed edge store). Per-round localCheckpoint ↔
    * the oracle's MATERIALIZED round CTEs. */
  private def kcoreTrace(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    var alive = e.select(col("u").as("node")).distinct()
    val counts = scala.collection.mutable.ArrayBuffer(
      alive.agg(count(lit(1)).cast("long").as("n_alive"))
        .select(lit(0L).as("round"), col("n_alive")))
    for (r <- 1 to 6) {
      alive = e
        .join(alive, col("u") === col("node"), "left_semi")
        .join(alive, col("v") === col("node"), "left_semi")
        .groupBy(col("u"))
        .agg(count(lit(1)).as("deg"))
        .where(col("deg") >= 2)
        .select(col("u").as("node"))
        .localCheckpoint()
      counts += alive.agg(count(lit(1)).cast("long").as("n_alive"))
        .select(lit(r.toLong).as("round"), col("n_alive"))
    }
    counts.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** Community-size head of an LPA labeling (top-20 by size + global
    * community count) — the q_label_propagation projection, shared by
    * the persisted-graph serve path. */
  private def communityHead(labels: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    labels.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("csize"))
      .withColumn("n_communities",
        count(lit(1)).over(Window.partitionBy()).cast("long"))
      .orderBy(col("csize").desc, col("label"))
      .limit(20)

  // ---- the co-purchase graph as a snapshot table -----------------------
  //
  // Build-once/serve-many (the text_bm25_persist / emb_ivf_persist
  // twin for graphs): the expensive edge derivation — the order-pair
  // self-join over all of lineitem — runs ONCE and commits to a
  // graft.io.Snapshots table; every downstream graph algorithm then
  // reads the committed edge list (O(edges)) instead of re-deriving it
  // from the raw corpus (O(lineitem) + a wedge self-join, today repeated
  // by each of the 8 graph queries). The store holds RAW per-order-split
  // pair counts (u, v, w) — NOT thresholded edges — because counts are
  // the mergeable statistic: an order contributes its pairs to exactly
  // one commit, so generation-wise counts SUM to the full-corpus count,
  // and a pair at w=1 in the base and w=1 in the delta correctly
  // crosses the >= 2 edge threshold only in the merged view (a
  // thresholded store could never recover it). Append cost is O(delta
  // orders); serve is one groupBy over the edge list. Partitioned by
  // pmod(u, 8) with per-file (u, v) min/max manifest stats, so a
  // targeted neighborhood read (one node's edges) prunes to one
  // bucket's files at planning time (GraphPersistSpec audits this).

  /** RAW canonical pair counts (u < v, w = co-occurrence count over the
    * given order subset) — unthresholded, the mergeable store row. */
  private[graft] def rawPairCounts(pp: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pp.as("a")
      .join(pp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).cast("long").as("w"))

  /** Serve the committed edge store: merge all generations' raw counts,
    * apply the >= 2 edge threshold, return the (e0, e) pair every graph
    * algorithm consumes — checkpointed, the iteration working-set
    * discipline of [[partEdges]]. */
  private[graft] def servedEdges(s: org.apache.spark.sql.SparkSession,
      table: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val e0 = graft.io.Snapshots.read(s, table)
      .groupBy(col("u"), col("v"))
      .agg(sum(col("w")).as("w"))
      .where(col("w") >= 2)
      .select(col("u"), col("v"))
      .localCheckpoint()
    val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    (e0, e)
  }

  /** Synchronous LPA labels after `rounds` supersteps (the
    * q_label_propagation iteration, factored for reuse by the
    * modularity audit). */
  private def lpaLabels(e: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame = {
    var labels = e.select(col("u")).distinct()
      .select(col("u").as("node"), col("u").as("label"))
    val wn = Window.partitionBy(col("node"))
      .orderBy(col("c").desc, col("label"))
    for (_ <- 1 to rounds) {
      labels = e.join(labels, e("v") === labels("node"))
        .groupBy(e("u").as("node2"), col("label"))
        .agg(count(lit(1)).cast("long").as("c"))
        .select(col("node2").as("node"), col("label"), col("c"))
        .withColumn("rn", row_number().over(wn))
        .where(col("rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
    }
    labels
  }

  /** The pagerank power iteration as a LAZY pair: (top-50 result frame,
    * pinned edge cache). The Q entry materializes the first and
    * unpersists the second; GraphShuffleSpec inspects the first's PLAN
    * (the Q entry's returned LocalRelation has none). */
  private[queries] def pagerankTopK(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val shuffleRanks =
      s.conf.getOption("spark.graft.pagerank.shuffle").contains("true")
    // pairs is CUT: it feeds both halves of the undirected doubling and
    // (through edges) the degree aggregate — lazy, the orders⋈lineitem
    // distinct ran 4× before the first superstep (profiled at sf0.1:
    // 4 × ~0.9 s near-identical jobs; guide §1.2). One checkpoint, the
    // same working-set discipline partEdges applies.
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .localCheckpoint()
    val edges = pairs
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
    val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
    val e0 = edges.join(deg, "a")
    // shuffle mode: pin the edge partitioning on the join key so each
    // superstep's join reshuffles only the (smaller) rank side
    val e = (if (shuffleRanks) e0.repartition(col("a")) else e0).persist()
    var ranks = deg.select(col("a").as("node"), lit(1000000L).as("rank"))
    (1 to Iters).foreach { i =>
      val rankSide =
        if (shuffleRanks) ranks.hint("shuffle_hash") else broadcast(ranks)
      ranks = e.join(rankSide, col("a") === col("node"))
        .select(col("b"),
          expr("(rank * 85) div (100 * outdeg)").as("contrib"))
        .groupBy(col("b"))
        .agg((lit(150000L) + sum(col("contrib"))).as("rank"))
        .select(col("b").as("node"), col("rank"))
      if (shuffleRanks && i % CheckpointEvery == 0 && i < Iters)
        ranks = ranks.localCheckpoint()
    }
    (ranks.orderBy(col("rank").desc, col("node")).limit(50), e)
  }
}
