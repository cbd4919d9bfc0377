package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  test("compaction collapses many small files, preserves the row set") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-compact")
    val df = (0 until 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(64).write.mode("overwrite").parquet(dir) // 64 tiny files

    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"setup should produce many files, got $before")
    val sumBefore = s.read.parquet(dir).agg(sum("id")).head().getLong(0)

    val after = Compaction.compactPartition(s, dir, targetBytes = 512L * 1024)
    assert(after < before / 4, s"expected big reduction, $before -> $after")
    val back = s.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(sum("id")).head().getLong(0) == sumBefore)
    // idempotent: a second pass converges (no-op scale change)
    val again = Compaction.compactPartition(s, dir, targetBytes = 512L * 1024)
    assert(again == after)
  }

  test("empty partition dir is a no-op") {
    val dir = tmpDir("graft-compact-empty")
    assert(Compaction.compactPartition(spark, dir) == 0)
  }
}
