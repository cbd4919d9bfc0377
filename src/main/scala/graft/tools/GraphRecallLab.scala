package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps
import graft.queries.SimilarityQueries

/** Measurement lab for the k-NN-graph index's BUILD quality (the
  * emb_knn_graph recall knob): recall@3 of (degree M × NN-descent
  * rounds × serve hops) variants against the brute-force truth, built
  * in memory (no store commits — build QUALITY is what's measured;
  * the committed-store serve is unchanged by these knobs).
  *
  * Run: sbt "runMain graft.tools.GraphRecallLab /root/testdata/sf0.01"
  */
object GraphRecallLab {

  /** @param rhoPct NN-descent pool sample rate in percent (Dong et
    *                al.'s ρ): each directed adjacency entry enters the
    *                neighbor-of-a-neighbor self-join iff a hash coin on
    *                its (src, dst) pair selects it — the same
    *                deterministic coin the shipped build flips, so the
    *                lab measures exactly the production sample. 100 =
    *                full pool. */
  def buildEdges(emb: DataFrame, m: Int, rounds: Int,
      rhoPct: Int = 100, nBits: Int = 6, nTables: Int = 8): DataFrame = {
    val withT = emb.withColumn("t",
      explode(VectorOps.lshTables(col("embedding"), 64, nBits = nBits,
        nTables = nTables)))
    val a = withT.select(col("t"), col("vec_id").as("src"))
    val b = withT.select(col("t").as("b_t"), col("vec_id").as("dst"))
    def topM(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst"))
      cand
        .join(emb.select(col("vec_id").as("src"),
          col("embedding").as("a_vec")), Seq("src"))
        .join(emb.select(col("vec_id").as("dst"),
          col("embedding").as("b_vec")), Seq("dst"))
        .select(col("src"), col("dst"),
          round(VectorOps.cosine(col("a_vec"), col("b_vec")), 6).as("cos"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= m)
        .select(col("src"), col("dst"))
    }
    var edges = topM(
      a.join(b, col("t") === col("b_t") && col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct())
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val und = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val pool =
        if (rhoPct >= 100) und
        else und.where(pmod(graft.functions.TextOps.md5Low60(
          concat_ws(":", col("src"), col("dst"))), lit(100)) < rhoPct)
      val non = pool.select(col("src"), col("dst").as("mid"))
        .join(pool.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .select(col("src"), col("dst"))
        .where(col("src") =!= col("dst"))
      edges = topM(edges.unionByName(non).distinct()).localCheckpoint()
    }
    edges
  }

  def serve(emb: DataFrame, edges: DataFrame, hops: Int): DataFrame = {
    val queries = broadcast(emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
    var frontier = edges.join(queries, col("src") === col("q_id"))
      .select(col("q_id"), col("dst"))
    var cand = frontier
    for (_ <- 2 to hops) {
      frontier = frontier
        .join(edges.select(col("src").as("dst"), col("dst").as("dst2")),
          Seq("dst"))
        .select(col("q_id"), col("dst2").as("dst")).distinct()
      cand = cand.unionByName(frontier)
    }
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.where(col("dst") =!= col("q_id")).distinct()
      .join(emb.select(col("vec_id"), col("embedding")),
        col("vec_id") === col("dst"))
      .join(queries, Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.cosine(col("q_vec"), col("embedding")), 6)
          .as("cos"))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= 3)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graph-recall-lab")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel
    val emb = Tables.embeddings(spark, sfDir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val truth = SimilarityQueries.knnBrute(emb)
      .where(col("rank") <= 3).select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"corpus=$n truth pairs=${truth.size}")
    // (M, ndRounds, hops, ρ%): the degree/round sweep that picked
    // M=24×1 round, then the ρ sweep over the shipped config — Dong et
    // al. report small recall loss at ρ≈0.5 for ~ρ² pool cost per
    // round. Override with --configs=m:rounds:hops:rho,...
    // m:rounds:hops:rho[:bits[:tables]] — bits/tables shape the LSH
    // seed pool (sharper buckets = fewer seed pairs for NN-descent to
    // refine)
    val configs = args.collectFirst {
      case a if a.startsWith("--configs=") =>
        a.stripPrefix("--configs=").split(',').toSeq.map { c =>
          val xs = c.split(':').map(_.trim.toInt)
          (xs(0), xs(1), xs(2), xs(3),
            if (xs.length > 4) xs(4) else 6,
            if (xs.length > 5) xs(5) else 8)
        }
    }.getOrElse(Seq(
      (16, 1, 2, 100, 6, 8), (16, 2, 2, 100, 6, 8), (24, 1, 2, 100, 6, 8),
      (24, 1, 2, 50, 6, 8), (32, 1, 2, 50, 6, 8)))
    for ((m, rounds, hops, rho, bits, tables) <- configs) {
      val t0 = System.nanoTime()
      val edges = buildEdges(emb, m, rounds, rho, bits, tables)
      val got = serve(emb, edges, hops)
        .select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = got.count(truth.contains)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"M=$m%2d ndRounds=$rounds hops=$hops rho=$rho%3d " +
        f"bits=$bits tables=$tables  " +
        f"recall@3=${hits.toDouble / truth.size}%.3f  (${dt}%.1f s)")
    }
    spark.stop()
  }
}
