package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema evolution for long-lived partitioned tables — the reference
  * lists this as its next step (README.md:13 roadmap); a table that
  * lives for years WILL gain columns, and 100 TB of history cannot be
  * rewritten to match.
  *
  * Two primitives:
  *  - [[readMerged]]: scan partitions written under different schema
  *    versions as one frame (parquet mergeSchema; per-file footers union
  *    into the widest schema, absent columns read as null). Schema
  *    merging costs a footer pass per file — acceptable for a migration
  *    read, not for every query, which is why [[conform]] exists;
  *  - [[conform]]: project ANY frame onto a target schema — missing
  *    fields become typed nulls, matching names cast to the target type,
  *    extras drop, field order normalizes. Deterministic and total: the
  *    output schema is exactly `target` regardless of input. This is the
  *    write-side companion (conform old data once, or conform new data
  *    down to a stable contract).
  */
object SchemaEvolution {

  def readMerged(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Field names match case-INsensitively (Spark's default analyzer
    * behavior, `spark.sql.caseSensitive=false`): a column whose name
    * differs from the target field only in case — common across schema
    * versions — is cast and renamed, not silently replaced by nulls.
    * The input column is addressed by ITS OWN spelling (backtick-safe
    * via the Column API) and aliased to the target spelling. */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.fields
      .map(f => f.name.toLowerCase -> f)
      .toMap // last wins on case-duplicate input names, like merge
    val cols = target.fields.map { f =>
      present.get(f.name.toLowerCase) match {
        case Some(in) if in.dataType == f.dataType =>
          df(in.name).as(f.name)
        case Some(in) => df(in.name).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
