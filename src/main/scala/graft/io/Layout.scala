package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the storage-side half of
  * "filters reach the parquet reader".
  *
  * Parquet keeps min/max statistics per row group and per file; the
  * reader skips units whose range can't satisfy a predicate. Those
  * statistics only PRUNE if the data is clustered: a randomly-laid-out
  * table has every file spanning the whole key range and nothing skips.
  * [[writeRangeSorted]] produces the layout that makes stats effective:
  * `repartitionByRange` gives files DISJOINT key ranges (a point/range
  * predicate then touches the few files that can match), and
  * `sortWithinPartitions` orders rows inside each file so row groups
  * subdivide the range the same way.
  *
  * At 100 TB this is the difference between "read 3 of 4000 files" and
  * "read them all" for selective time/key predicates — same idea as
  * clustering keys in warehouse engines (a linear order; multi-column
  * z-ordering would slot in here as an alternative ordering column).
  */
object Layout {

  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
      sortCols: Seq[String]): Unit = {
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols.map(_.asc): _*)
      .write.mode("overwrite").parquet(path)
  }
}
