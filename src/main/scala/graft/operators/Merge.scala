package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC apply: MERGE-INTO semantics (upsert + delete) as one full-outer
  * join — the warehouse-engine `MERGE INTO target USING changes` shape
  * (Delta/Iceberg's core write primitive) expressed as a pure batch
  * transform over immutable snapshots.
  *
  * Change rows carry an op column: 'U' (update in place), 'I' (insert
  * new key), 'D' (delete). Semantics per key:
  *   - no change row            → target row passes through
  *   - op 'U' / 'I'             → change row's attributes win
  *   - op 'D'                   → key dropped
  *   - change with no target    → insert (whatever the op says; a 'U'
  *                                to a missing key upserts, matching
  *                                MERGE ... WHEN NOT MATCHED behavior)
  *
  * Shape at scale: ONE equi-shuffle of target ∪ changes on the key —
  * full-outer joins don't broadcast (Spark plans them sort-merge /
  * shuffled-hash regardless of side sizes), so a naive apply against a
  * 100 TB snapshot pays one full co-location of both sides. That cost
  * is the storage layout's to kill, not this join's: keep the snapshot
  * bucketed by key ([[graft.streaming.CdcView]] does exactly this) and
  * the same one-join apply runs bucket-locally against only the buckets
  * the batch touches. No window, no second pass; deletes ride the same
  * join instead of a separate anti-join (which would scan the snapshot
  * twice).
  *
  * Caller contract: at most one change row per key per batch
  * (pre-aggregate a multi-event feed to last-writer-wins upstream —
  * the same contract Scd2.merge documents).
  */
object Merge {

  /** @param target   current snapshot: key ++ attrs
    * @param changes  change batch: key ++ attrs ++ `op` ('U'|'I'|'D')
    * @param key      equality key column name (same name both sides)
    * @param attrCols attribute columns (same names both sides)
    * @param opCol    name of the op column in `changes`
    */
  def upsert(target: DataFrame, changes: DataFrame, key: String,
      attrCols: Seq[String], opCol: String = "op"): DataFrame = {
    val c = changes.select(
      col(key).as("m_key") +: col(opCol).as("m_op") +:
        attrCols.map(a => col(a).as(s"m_$a")): _*)
    def merged(a: String): Column =
      when(col("m_key").isNotNull, col(s"m_$a")).otherwise(col(a)).as(a)
    target.join(c, col(key) === col("m_key"), "full_outer")
      .where(col("m_key").isNull || col("m_op") =!= "D")
      .select(coalesce(col(key), col("m_key")).as(key) +:
        attrCols.map(merged) :+
        when(col("m_key").isNull, lit("kept"))
          .when(col(key).isNull, lit("inserted"))
          .when(col("m_op") === "U", lit("updated"))
          .otherwise(lit("inserted")).as("merge_status"): _*)
  }
}
