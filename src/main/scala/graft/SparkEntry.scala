package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's query inventory is assembled from per-domain modules; each
  * [[graft.queries.Q]] carries both the Spark builder and (when
  * SQL-expressible) the DuckDB oracle SQL, kept side by side so column
  * names/types stay in lock-step (driver hash-compares by sorted column
  * name).
  */
object SparkEntry {

  /** Full inventory: reference-parity + star-schema extensions (+ text /
    * dedup / similarity modules as they land). Names must be unique —
    * `queries`/`oracleSql` are maps, so a duplicate would silently
    * shadow one implementation while the bench (list-driven) times both. */
  def inventory: Seq[Q] = {
    val all =
      RefQueries.all ++ StarQueries.all ++ TpchQueries.all ++
        WindowingQueries.all ++ StatsQueries.all ++ TextQueries.all ++
        DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
        CurationQueries.all ++ GraphQueries.all ++ SnapshotQueries.all ++
        RecallQueries.all ++ RetrievalQueries.all ++ RankStatsQueries.all ++
        PipelineQueries.all
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-style 6-way star join — exercises scans, broadcasts, a
    * fact-fact shuffle join, and decimal-exact aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame =
    inventory.find(_.name == "q5_local_supplier_volume").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
