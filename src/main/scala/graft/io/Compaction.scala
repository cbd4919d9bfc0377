package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for partitioned parquet — the operational debt
  * every streaming/micro-batch producer accrues: thousands of KB-sized
  * files per partition turn a 100 TB scan into a metadata stampede
  * (one open + footer read per file) and starve the scheduler with
  * million-task stages.
  *
  * [[compactPartition]] rewrites one partition directory into
  * ⌈bytes / targetBytes⌉ files. Safety follows the curated-zone
  * idempotency playbook (same guarantees as [[CuratedWriter]]):
  * write the compacted copy to a sibling temp dir first, then swap —
  * a crash mid-compaction leaves the original intact (at worst a stale
  * temp dir to GC), and re-running converges to the same layout.
  * Partition-scoped like everything else in this io layer: compacting a
  * day never touches the table.
  */
object Compaction {

  /** @return number of files after compaction */
  def compactPartition(spark: SparkSession, partitionDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new Path(partitionDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(partitionDir)
    val dataFiles = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    if (dataFiles.isEmpty) return 0
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetBytes).toInt)

    val tmp = new Path(dir.getParent, "_compacting_" + dir.getName)
    fs.delete(tmp, true)
    spark.read.parquet(partitionDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: the original survives any failure before this point
    fs.delete(dir, true)
    fs.rename(tmp, dir)
    fs.listStatus(dir)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
