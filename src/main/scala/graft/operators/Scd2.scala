package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge: keep full attribute history
  * as validity intervals instead of overwriting in place. Rows carry
  * `valid_from` / `valid_to` (NULL = current); applying a batch of
  * updates closes the current row of every key whose attributes
  * actually changed and opens a new one, leaves unchanged keys alone,
  * and inserts first-seen keys as new open rows.
  *
  * Shape at scale: ONE equi-join of the current slice against the
  * update batch on the business key (history rows pass through
  * untouched — at 100 TB the closed history is the bulk and never
  * shuffles), attribute comparison is null-safe (`<=>`), and the output
  * is a union of pass-through + closed + opened rows. Deterministic:
  * no RNG, no processing-time — versioning comes from the caller's
  * `effective_ts` column, so re-running a batch is idempotent-by-value.
  *
  * Caller contract: one update row per key per batch (pre-aggregate
  * upstream if the feed has more), and `effective_ts` strictly after
  * every open row's `valid_from` (time moves forward between batches).
  */
object Scd2 {

  /** @param dim     current SCD2 table: key ++ attrs ++ valid_from,
    *                valid_to (both timestamps, valid_to NULL = open)
    * @param updates batch: key ++ attrs ++ effective_ts */
  def merge(dim: DataFrame, updates: DataFrame, key: String,
      attrCols: Seq[String]): DataFrame = {
    val history = dim.where(col("valid_to").isNotNull)
    val open = dim.where(col("valid_to").isNull)

    val u = updates.select(
      col(key).as("u_key") +:
        col("effective_ts") +:
        attrCols.map(c => col(c).as(s"u_$c")): _*)

    val joined = open.join(u, col(key) === col("u_key"), "full_outer")
    val changed = attrCols
      .map(c => !(col(c) <=> col(s"u_$c")))
      .reduce(_ || _)

    // open rows with a differing update → closed at the effective ts
    val closed = joined
      .where(col(key).isNotNull && col("u_key").isNotNull && changed)
      .select(col(key) +: attrCols.map(col) :+ col("valid_from") :+
        col("effective_ts").as("valid_to"): _*)
    // unchanged open rows + keys with no update this batch → pass through
    val stillOpen = joined
      .where(col(key).isNotNull && (col("u_key").isNull || !changed))
      .select(col(key) +: attrCols.map(col) :+ col("valid_from") :+
        lit(null).cast("timestamp").as("valid_to"): _*)
    // differing updates + first-seen keys → new open rows
    val opened = joined
      .where(col("u_key").isNotNull && (col(key).isNull || changed))
      .select(col("u_key").as(key) +:
        attrCols.map(c => col(s"u_$c").as(c)) :+
        col("effective_ts").as("valid_from") :+
        lit(null).cast("timestamp").as("valid_to"): _*)

    history.select(closed.columns.map(col): _*)
      .unionByName(closed).unionByName(stillOpen).unionByName(opened)
  }
}
