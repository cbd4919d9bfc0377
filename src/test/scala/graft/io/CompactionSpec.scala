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

  private def writeRows(dir: String, n: Int, parts: Int): Long = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(parts).write.mode("overwrite").parquet(dir)
    s.read.parquet(dir).agg(sum("id")).head().getLong(0)
  }

  test("re-run converges after a crash between the two swap renames") {
    val s = spark
    val dir = tmpDir("graft-compact-crash1")
    val sumBefore = writeRows(dir, 2000, 16)
    // Simulate: temp written, original renamed to backup, then crash
    // BEFORE tmp→dir — partition dir is missing entirely.
    val d = new java.io.File(dir)
    val tmp = new java.io.File(d.getParent, "_compacting_" + d.getName)
    val bak = new java.io.File(d.getParent, "_precompact_" + d.getName)
    s.read.parquet(dir).repartition(1)
      .write.mode("overwrite").parquet(tmp.getPath)
    assert(d.renameTo(bak))
    assert(!d.exists(), "crash state: partition dir gone")

    val after = Compaction.compactPartition(s, dir, targetBytes = 512L * 1024)
    assert(after >= 1)
    assert(s.read.parquet(dir).count() == 2000)
    assert(s.read.parquet(dir).agg(sum("id")).head().getLong(0) == sumBefore)
    assert(!bak.exists() && !tmp.exists(), "recovery must clean siblings")
  }

  test("re-run converges after a crash before the swap started (rolls back)") {
    val s = spark
    val dir = tmpDir("graft-compact-crash2")
    val sumBefore = writeRows(dir, 2000, 16)
    // Simulate: original renamed to backup but temp never made it (or was
    // itself renamed away) — recovery must restore the ORIGINAL data.
    val d = new java.io.File(dir)
    val bak = new java.io.File(d.getParent, "_precompact_" + d.getName)
    assert(d.renameTo(bak))

    val after = Compaction.compactPartition(s, dir, targetBytes = 512L * 1024)
    assert(after >= 1)
    assert(s.read.parquet(dir).count() == 2000)
    assert(s.read.parquet(dir).agg(sum("id")).head().getLong(0) == sumBefore)
    assert(!bak.exists(), "backup consumed by rollback")
  }

  test("re-run converges after the swap finished but backup cleanup crashed") {
    val s = spark
    val dir = tmpDir("graft-compact-crash3")
    val sumBefore = writeRows(dir, 2000, 16)
    // Simulate: swap complete, stale backup left behind with DIFFERENT
    // (old) content — recovery must keep dir and drop the backup.
    val d = new java.io.File(dir)
    val bak = new java.io.File(d.getParent, "_precompact_" + d.getName)
    s.read.parquet(dir).limit(10).write.parquet(bak.getPath)

    val after = Compaction.compactPartition(s, dir, targetBytes = 512L * 1024)
    assert(after >= 1)
    assert(s.read.parquet(dir).count() == 2000)
    assert(s.read.parquet(dir).agg(sum("id")).head().getLong(0) == sumBefore)
    assert(!bak.exists(), "stale backup must be removed")
  }
}
