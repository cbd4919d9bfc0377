package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, the single latest right row with
  * `rightTs <= leftTs` (backward) or earliest with `rightTs >= leftTs`
  * (forward) within the same key group — the time-series joins Spark
  * has no built-in for.
  *
  * Implementation follows build-brief preference (a) — compose built-in
  * operators — rather than a custom LogicalPlan: both sides are tagged
  * and unioned, then a single `last(..., ignoreNulls)` carry window per
  * key delivers the match (carry-forward over ascending time for
  * backward; the same carry over DESCENDING time is the forward
  * variant). Cost: ONE shuffle on the key + one sort per partition,
  * independent of time-range width; a naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + max) explodes to O(|L|·|R|/keys)
  * intermediate rows, which at 100 TB is the difference between a
  * working plan and an OOM. Equal timestamps match (inclusive bounds):
  * right rows sort before left rows at the same instant in both
  * directions.
  */
object AsOfJoin {

  /** @param rightValueCols right columns to surface, each prefixed
    *                       `asof_` in the output (besides the key/ts).
    *
    * NULL semantics follow SQL join matching (and DuckDB's ASOF JOIN,
    * the oracle): right rows with a NULL timestamp or NULL key can never
    * match — they are dropped before the union, otherwise a NULL ts
    * would sort first and become everyone's "earliest prior" payload,
    * and Spark's window partitioning (which groups NULL keys) would
    * match NULL-key rows to each other. Left rows with a NULL
    * timestamp survive (it is an outer join on the left) but match
    * nothing: the window ordering pins NULLs first in BOTH directions
    * so the carry has no payload when it reaches them. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, rightValueCols,
      forwardDir = false)

  /** Earliest right row with `rightTs >= leftTs` per key (inclusive). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightValueCols: Seq[String]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, rightValueCols,
      forwardDir = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightValueCols: Seq[String], forwardDir: Boolean): DataFrame = {
    val payload = struct(
      (rightTs +: rightValueCols).map(c => col(c).as(c)): _*)
    val matchableRight = right.where(
      (col(rightTs).isNotNull +: keys.map(col(_).isNotNull))
        .reduce(_ && _))
    val taggedRight = matchableRight.select(
      keys.map(col) :+ col(rightTs).as("_asof_ts") :+
        lit(0).as("_asof_side") :+ payload.as("_asof_payload"): _*)
    val taggedLeft = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_payload",
        lit(null).cast(taggedRight.schema("_asof_payload").dataType))

    val unioned = taggedLeft.unionByName(taggedRight,
      allowMissingColumns = true)
    // NULL left timestamps must never match. Right NULL-ts rows are
    // already filtered, so only left rows can carry a NULL _asof_ts;
    // they must sort BEFORE every right row so the carry window has
    // seen no payload yet. asc defaults to nulls-first, but desc
    // defaults to nulls-LAST — which would hand a NULL-ts left row the
    // key's earliest right row. Pin nulls-first in both directions.
    val tsOrd =
      if (forwardDir) col("_asof_ts").desc_nulls_first
      else col("_asof_ts").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("_asof_match",
        last(col("_asof_payload"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)

    val out = left.columns.map(col) ++
      (rightTs +: rightValueCols).map(c =>
        col(s"_asof_match.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }
}
