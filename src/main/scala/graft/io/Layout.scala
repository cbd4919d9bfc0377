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

  /** Two-dimensional clustering: files hold contiguous ranges of the
    * Morton code of (dimA, dimB), i.e. axis-aligned blocks of the 2-D
    * key space, so per-file min/max statistics prune scans filtered on
    * EITHER dimension — where [[writeRangeSorted]] only serves its
    * leading column. The z-value is persisted as a `zvalue` column: it
    * is the cluster key (useful for curve-range predicates) and costs
    * one RLE-friendly sorted long column. Dimensions must fit 16 bits —
    * discretize (bucketize) wider domains first, exactly like choosing
    * a clustering-key granularity in a warehouse engine. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
      dimA: String, dimB: String): Unit = {
    df.withColumn("zvalue",
        graft.functions.ZOrder.zvalue16(col(dimA), col(dimB)))
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
      .write.mode("overwrite").parquet(path)
  }

  /** Point-lookup skipping for columns clustering can't serve: sorting
    * orders ONE axis (and z-order two); a needle-in-haystack equality on
    * any other high-cardinality column still touches every row group,
    * because min/max over an unclustered column spans the domain.
    * Parquet's split-block Bloom filters close that gap — one filter per
    * row group per column, consulted by the reader on `=` / `IN`
    * predicates, skipping groups whose filter rules the value out.
    * False positives only cost a read; sizing is per expected distinct
    * values (bits ≈ 10·ndv for ~1% fp). The filters ride in the file
    * tail, so writers pay O(ndv) memory per open file and readers only
    * fetch them when a candidate predicate exists — at 100 TB this
    * turns key-lookup audits ("which files hold user X?") from
    * full-table scans into a handful of row groups. */
  def writeBloomIndexed(df: DataFrame, path: String, numFiles: Int,
      bloomCols: Seq[String], expectedNdv: Long): Unit = {
    require(bloomCols.nonEmpty, "at least one bloom column")
    val base = df.repartition(numFiles).write.mode("overwrite")
    bloomCols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          expectedNdv.toString)
    }.parquet(path)
  }
}
