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
    if (!f.exists(cur) && f.exists(tmp)) f.rename(tmp, cur)
    if (!f.exists(cur)) 0
    else {
      val in = f.open(cur)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](256)
        var r = in.read(chunk)
        while (r > 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
        new String(buf.toByteArray, StandardCharsets.UTF_8)
          .trim.stripPrefix("v").toInt
      } finally in.close()
    }
  }

  def versionDir(statePath: String, v: Int): String = s"$statePath/v$v"

  /** Flip `_CURRENT` to version `v` — the all-or-nothing publish. */
  def publish(spark: SparkSession, statePath: String, v: Int): Unit = {
    val f = fs(spark, statePath)
    val tmp = new Path(statePath, "_CURRENT.tmp")
    val out = f.create(tmp, true)
    try out.write(s"v$v".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val curPath = new Path(statePath, "_CURRENT")
    f.delete(curPath, false)
    if (!f.rename(tmp, curPath))
      throw new java.io.IOException(
        s"publish failed for ${versionDir(statePath, v)}")
  }
}
