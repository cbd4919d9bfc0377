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

  test("zvalue16 interleaves bits (known Morton codes)") {
    val s = spark
    import s.implicits._
    // z(x=0b101, y=0b011) = y2x2 y1x1 y0x0 = 0 1 | 1 0 | 1 1 = 0b011011
    val got = Seq((5L, 3L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(graft.functions.ZOrder.zvalue16(col("x"), col("y")))
      .as[Long].collect().toSeq
    assert(got == Seq(0x1BL, 0L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("z-order layout keeps per-file stats selective on BOTH dims; " +
      "a lexicographic sort only serves its leading column") {
    val s = spark
    import s.implicits._
    // a full 32x32 grid, written scrambled
    val grid = (0 until 1024).map { i =>
      val p = (i * 587) % 1024 // 587 coprime to 1024
      (p / 32).toLong -> (p % 32).toLong
    }.toDF("x", "y")

    val zDir = tmpDir("graft-zorder")
    val linDir = tmpDir("graft-linsort")
    Layout.writeZOrdered(grid, zDir, numFiles = 16, "x", "y")
    Layout.writeRangeSorted(grid, linDir, numFiles = 16, Seq("x", "y"))

    // per-file [min,max] of the TRAILING dimension y — what a parquet
    // reader consults for a `y = 7` predicate
    def yRanges(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      .map { f =>
        val r = s.read.parquet(f).agg(min(col("y")), max(col("y"))).head()
        (r.getLong(0), r.getLong(1))
      }
    val zHits = yRanges(zDir).count { case (lo, hi) => lo <= 7 && 7 <= hi }
    val linHits = yRanges(linDir)
      .count { case (lo, hi) => lo <= 7 && 7 <= hi }
    // 16 z-files over a 10-bit curve = aligned 8x8 blocks: y=7 lives in
    // the bottom block row -> 4 of 16 files. The x-major sort spreads
    // every y into every file -> nothing skips.
    assert(zHits <= 4, s"z-order should localize y=7, hit $zHits files")
    assert(linHits == 16,
      s"x-major sort should be useless for y (got $linHits)")
    // both layouts still hold the full grid
    assert(s.read.parquet(zDir).count() == 1024)
    assert(s.read.parquet(zDir).select(col("zvalue")).distinct()
      .count() == 1024)
  }

  test("bloom-indexed layout: filters land in the footer and answer " +
      "membership; the plain write has none") {
    val s = spark
    import s.implicits._
    import scala.jdk.CollectionConverters._
    // high-cardinality scrambled keys — clustering can't serve them
    val keys = (0 until 20000).map(i => ((i * 48271) % 100003).toLong)
    val df = keys.toDF("k")

    val bloomDir = tmpDir("graft-bloom")
    val plainDir = tmpDir("graft-plain")
    Layout.writeBloomIndexed(df, bloomDir, numFiles = 2, Seq("k"),
      expectedNdv = 20000)
    df.repartition(2).write.mode("overwrite").parquet(plainDir)

    def blooms(dir: String) = {
      val file = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        new org.apache.hadoop.conf.Configuration(),
        new org.apache.hadoop.fs.Path(file.getAbsolutePath))
      try {
        val block = reader.getFooter.getBlocks.get(0)
        val meta = block.getColumns.asScala
          .find(_.getPath.toDotString == "k").get
        (Option(reader.readBloomFilter(meta)), block.getRowCount)
      } finally reader.close()
    }

    val (bloom, rows) = blooms(bloomDir)
    assert(bloom.isDefined, "bloom filter missing from footer")
    val bf = bloom.get
    val present = s.read.parquet(bloomDir).select("k").as[Long].collect()
    assert(rows > 0)
    // per-file filter: at least the global check — all stored keys in
    // some file's filter; spot-check membership + false-positive rate
    val hits = keys.count(k => bf.findHash(bf.hash(k)))
    assert(hits >= keys.distinct.size / 2,
      s"too few maybes for present keys: $hits") // 2 files, ~half each
    val absentMaybes = (1 to 2000)
      .map(i => 100003L + i) // values never written
      .count(k => bf.findHash(bf.hash(k)))
    assert(absentMaybes < 200,
      s"false-positive rate off: $absentMaybes/2000")
    assert(present.length == 20000)

    assert(blooms(plainDir)._1.isEmpty,
      "plain write unexpectedly has a bloom filter")
  }
}
