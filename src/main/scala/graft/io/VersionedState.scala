package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The miniature snapshot protocol shared by the incremental state
  * keepers ([[IncrementalAgg]], [[IncrementalDistinct]]): complete
  * version directories `v{N}`, a `_CURRENT` pointer published last via
  * temp + rename (readers see old-complete or new-complete, never a
  * partial), and crash-window self-heal — "tmp exists, cur doesn't"
  * means the crash hit between delete and rename, so finish the rename.
  * Version numbers derive from `_CURRENT`, never directory listings: a
  * crash's orphan `v{N+1}` is simply overwritten by the retry.
  */
private[io] object VersionedState {

  def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currentVersion(spark: SparkSession, statePath: String): Int = {
    val f = fs(spark, statePath)
    val cur = new Path(statePath, "_CURRENT")
    val tmp = new Path(statePath, "_CURRENT.tmp")
    // legacy crash heal, parse-verified like Snapshots.currentVersion:
    // an empty/half-written tmp is a live legacy writer, not a crash
    if (!f.exists(cur) && f.exists(tmp) &&
        scala.util.Try(read(f, tmp).trim.stripPrefix("v").toInt).isSuccess)
      f.rename(tmp, cur)
    if (!f.exists(cur)) 0
    else read(f, cur).trim.stripPrefix("v").toInt
  }

  private def read(f: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](256)
      var r = in.read(chunk)
      while (r > 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  def versionDir(statePath: String, v: Int): String = s"$statePath/v$v"

  /** Flip `_CURRENT` to version `v` — the all-or-nothing publish, as an
    * atomic REPLACE (writer-unique tmp + FileContext rename OVERWRITE —
    * the Snapshots.publish discipline: no missing-pointer window, no
    * shared tmp a reader heal could promote half-written). */
  def publish(spark: SparkSession, statePath: String, v: Int): Unit = {
    val f = fs(spark, statePath)
    val cur = f.makeQualified(new Path(statePath, "_CURRENT"))
    val tmp = f.makeQualified(new Path(statePath,
      s"_CURRENT.${java.util.UUID.randomUUID}.tmp"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      cur.toUri, spark.sparkContext.hadoopConfiguration)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(s"v$v".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.delete(new Path(cur.getParent, "." + cur.getName + ".crc"), false)
    // no-missing-pointer replace (local Hadoop overwrite-rename is
    // delete-then-rename — the soak-measured reader gap): POSIX rename
    // for file://, FileContext OVERWRITE elsewhere
    Snapshots.atomicReplace(fc, tmp, cur)
    // best-effort: reclaim uuid tmps a crashed publisher stranded (the
    // heal only promotes the legacy shared-name tmp; nothing else ever
    // deletes these). Same age-gated sweep as Snapshots.publish.
    Snapshots.sweepStaleTmps(f, new Path(statePath), cur.getName)
  }
}
