package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key TRAILING sliding-window minimum at data scale.
  *
  * `trailing(df, key, ord, value, W)` gives every probed row
  * min(value) over same-key rows with ord ∈ [row.ord − W, row.ord] —
  * the q_attribution_first_touch lookback shape (and every "best in
  * the trailing window" feature a training pipeline derives).
  *
  * Why not ONE window? `min OVER (PARTITION BY key ORDER BY ord RANGE
  * W PRECEDING)` puts a hot key's whole history in a single task —
  * the round-11 ×100 skew tier measured 63 s vs 6.5 s uniform on one
  * 10%-hot user — and a sliding frame has no inverse for min, so
  * Spark re-evaluates the frame on every shrink (quadratic in the
  * frame for adversarial layouts). AQE cannot split a window
  * partition.
  *
  * This is the sparse-table / two-bucket decomposition instead:
  * with bucket size = W, the window [t−W, t] covers EXACTLY a suffix
  * of bucket b−1 (from t−W on) and a prefix of bucket b (up to t),
  * where b = ⌊t/W⌋. Both halves are CUMULATIVE mins — running frames
  * Spark maintains incrementally, never re-evaluates:
  *
  *   1. prefix pass: min(value) ASC-cumulative over (key, bucket) —
  *      each row reads its own prefix min;
  *   2. suffix pass: each probed row plants a PROBE at (key, b−1,
  *      t−W); probes union the data rows and a DESC-cumulative min
  *      per (key, bucket) hands every probe the min over data rows
  *      with ord ≥ its threshold (RANGE frames include equal-ord
  *      peers, so both interval ends stay inclusive);
  *   3. the probe's answer joins back by `id` and the result is
  *      least(prefix, suffix).
  *
  * Partitions are (key, bucket): a hot key's history splits across
  * its active buckets, each pass linear and parallel. Cost: two
  * window shuffles + one equi-join on the unique id — all on keys
  * no hotter than per-bucket activity.
  */
object SlidingMin {

  /** @param df      input; every column is preserved on the output
    * @param keyCol  partition key (the skewable dimension)
    * @param ordCol  LONG ordering column (seconds, days, …); any sign
    * @param valueCol LONG value to minimize (pack (ts, id) keys into
    *                one long for argmin-by-lexicographic semantics)
    * @param idCol   column UNIQUE among probed rows — carries the
    *                suffix answer back (no synthetic non-deterministic
    *                ids: task retries must re-derive the same join key)
    * @param window  trailing width W; the window is [ord − W, ord],
    *                both ends inclusive
    * @param out     name of the added result column; rows where
    *                `probeFilter` does not hold get NULL
    * @param probeFilter restrict the rows that need an answer (e.g.
    *                only purchases) — the suffix pass carries one
    *                probe per SATISFYING row, not per row */
  def trailing(df: DataFrame, keyCol: String, ordCol: String,
      valueCol: String, idCol: String, window: Long, out: String,
      probeFilter: Column = lit(true)): DataFrame = {
    require(window > 0, "SlidingMin.trailing: window must be positive")
    val w = lit(window)
    // floor division, sign-correct via pmod and EXACT for the full long
    // range: `div` is integer division — Column./ is double division in
    // Spark, which rounds |ord| > 2^53 into the wrong bucket and
    // silently corrupts the decomposition
    val bucket = expr(
      s"(`$ordCol` - pmod(`$ordCol`, ${window}L)) div ${window}L")

    val base = df.withColumn("__probe", probeFilter)
      .withColumn("__bkt", bucket)

    // pass 1: ASC-cumulative min within (key, bucket) — the prefix half
    val preW = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(ordCol))
    val withPre = base.withColumn("__pre", min(col(valueCol)).over(preW))

    // pass 2: DESC-cumulative min within (key, bucket) over data ∪ probes
    // the probe id rides UNCAST: casting to long would null out a
    // non-long-castable id, silently dropping every probe and degrading
    // the answer to the prefix-only min — the join key is the id's own
    // type
    val idType = df.schema(idCol).dataType
    val data = base.select(col(keyCol), col("__bkt"), col(ordCol),
      col(valueCol).as("__v"), lit(null).cast(idType).as("__pid"))
    val probes = base.where(col("__probe"))
      .select(col(keyCol), (col("__bkt") - 1).as("__bkt"),
        (col(ordCol) - w).as(ordCol),
        lit(null).cast(data.schema("__v").dataType.catalogString).as("__v"),
        col(idCol).as("__pid"))
    val sufW = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(ordCol).desc)
    val suffix = data.unionByName(probes)
      .withColumn("__suf", min(col("__v")).over(sufW))
      .where(col("__pid").isNotNull)
      .select(col("__pid"), col("__suf"))

    withPre
      .join(suffix, col(idCol) === col("__pid"), "left")
      .withColumn(out,
        when(col("__probe"), least(col("__pre"), col("__suf"))))
      .drop("__probe", "__bkt", "__pre", "__pid", "__suf")
  }
}
