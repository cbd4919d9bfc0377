package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for partitioned parquet — the operational debt
  * every streaming/micro-batch producer accrues: thousands of KB-sized
  * files per partition turn a 100 TB scan into a metadata stampede
  * (one open + footer read per file) and starve the scheduler with
  * million-task stages.
  *
  * [[compactPartition]] rewrites one partition directory into
  * ⌈bytes / targetBytes⌉ files. Failure contract: the compacted copy is
  * written to a sibling temp dir first, then swapped in via
  * rename-original-to-backup → rename-temp-to-dir → delete-backup, so
  * every crash point leaves the partition's data in exactly one of the
  * three sibling dirs and [[compactPartition]] RE-RUN CONVERGES — entry
  * recovery completes or rolls back a half-finished swap before doing
  * any new work. (On HDFS each rename is atomic; on object stores
  * "rename" is copy+delete, so the single-syscall windows here widen to
  * copy windows — the recovery logic still converges, but readers can
  * observe a missing dir for the duration of a copy.)
  * Partition-scoped like everything else in this io layer: compacting a
  * day never touches the table.
  */
object Compaction {

  private def tmpPath(dir: Path) =
    new Path(dir.getParent, "_compacting_" + dir.getName)
  private def backupPath(dir: Path) =
    new Path(dir.getParent, "_precompact_" + dir.getName)

  /** Finish or roll back a swap a previous run crashed inside of.
    * Postcondition: `dir` holds the partition's data (new copy if the
    * swap had gone far enough to be completed, original otherwise) and
    * no backup dir remains. A stale temp from a crash BEFORE the swap
    * started is left for the writer to overwrite. */
  private def recover(fs: FileSystem, dir: Path): Unit = {
    val (tmp, backup) = (tmpPath(dir), backupPath(dir))
    if (fs.exists(backup)) {
      if (!fs.exists(dir)) {
        if (fs.exists(tmp)) fs.rename(tmp, dir) // crash between renames
        else fs.rename(backup, dir)             // roll back to original
      }
      fs.delete(backup, true) // no-op if the rollback consumed it
    } else if (!fs.exists(dir) && fs.exists(tmp)) {
      fs.rename(tmp, dir) // legacy delete→rename crash: temp is newest
    }
  }

  /** @return number of files after compaction */
  def compactPartition(spark: SparkSession, partitionDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int =
    compactDir(spark, partitionDir, ".parquet", targetBytes,
      read = spark.read.parquet(_),
      write = (df, out) => df.write.mode("overwrite").parquet(out))

  /** Raw-zone (NDJSON) variant — the reference's own tradeoff note
    * ("in production, raw would usually be append-only with separate
    * arrivals and a compaction step", ref: docs/design.md:155-157).
    * Arrival files accumulate per partition (one append per producer
    * flush); this merges them into ⌈bytes / targetBytes⌉ NDJSON files
    * under the same crash-convergent swap as the parquet path. The
    * caller's schema pins the read (raw dirs have no footer to infer
    * from — and inference would cost an extra full pass); nulls are
    * written EXPLICITLY so the rewritten lines keep the wire contract
    * of one complete object per line ([[graft.io.RawEvents]]).
    * Row-count/counter stability across the rewrite is pinned by
    * PipelineSpec and the `q_raw_compaction` oracle. */
  def compactRawPartition(spark: SparkSession, partitionDir: String,
      schema: org.apache.spark.sql.types.StructType,
      targetBytes: Long = 128L * 1024 * 1024): Int =
    compactDir(spark, partitionDir, ".json", targetBytes,
      read = spark.read.schema(schema).json(_),
      write = (df, out) => df.write.mode("overwrite")
        .option("ignoreNullFields", "false").json(out))

  private def compactDir(spark: SparkSession, partitionDir: String,
      ext: String, targetBytes: Long,
      read: String => org.apache.spark.sql.DataFrame,
      write: (org.apache.spark.sql.DataFrame, String) => Unit): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = new Path(partitionDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, dir)
    val dataFiles = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(ext))
    if (dataFiles.isEmpty) return 0
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetBytes).toInt)

    val (tmp, backup) = (tmpPath(dir), backupPath(dir))
    fs.delete(tmp, true)
    write(read(partitionDir).repartition(nFiles), tmp.toString)
    // swap — original survives any failure; see recover() for each window
    fs.rename(dir, backup)
    fs.rename(tmp, dir)
    fs.delete(backup, true)
    fs.listStatus(dir)
      .count(f => f.isFile && f.getPath.getName.endsWith(ext))
  }
}
