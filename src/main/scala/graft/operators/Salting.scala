package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — for the shapes Spark does NOT
  * already absorb. Spark's partial (map-side) aggregation flattens hot
  * grouping keys for algebraic aggregates by itself, and AQE splits
  * skewed sort-merge partitions; what remains exposed is (a) holistic
  * aggregation state that partial aggregation can't collapse —
  * collect_* / exact percentiles / large distinct sets funneling into
  * one reducer — and (b) joins on a skewed key whose build side can't
  * broadcast.
  *
  * 1. Salted two-phase aggregation: phase 1 aggregates on (key, salt) —
  *    a hot key's state spreads over `nSalts` reducers; phase 2 merges
  *    the partials per key. Exact for algebraic aggregates
  *    (sum/count/min/max), and exact for count-distinct IFF the salt is
  *    derived from the distinct column itself (equal values always land
  *    in the same salt bucket, so per-bucket distinct sets are disjoint
  *    and their sizes sum — the same idea behind Spark's own distinct-
  *    aggregate expansion, made explicit and composable here).
  *
  * 2. Salted replicated join: fact rows take a salt from a high-
  *    cardinality column; the (small but not broadcastable, or badly
  *    skewed) build side replicates once per salt value; the join key
  *    becomes (key, salt) — a hot key's probe rows spread over nSalts
  *    tasks at the cost of nSalts× the build side.
  *
  * The salt is `pmod(xxhash64(saltSource), nSalts)` — deterministic under
  * task retry (a `rand()` salt silently breaks exactly-once semantics on
  * speculative re-execution).
  */
object Salting {

  def withSalt(df: DataFrame, saltSource: Column, nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts.toLong)))

  /** Two-phase count + count-distinct per key. `distinctCol` doubles as
    * the salt source, which is what makes the two-phase distinct exact. */
  def saltedCounts(df: DataFrame, keys: Seq[String], distinctCol: String,
      nSalts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    withSalt(df, col(distinctCol), nSalts)
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__pn"),
        count_distinct(col(distinctCol)).as("__pu"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__pn")).as("n"), sum(col("__pu")).as("distinct_" + distinctCol))
  }

  /** Replicate `build` once per salt and join on (key, salt). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltSource: Column, nSalts: Int = 16): DataFrame = {
    val saltedProbe = withSalt(probe, saltSource, nSalts)
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    saltedProbe.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
