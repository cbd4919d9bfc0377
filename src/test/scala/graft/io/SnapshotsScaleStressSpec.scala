package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** sf1-tier stress for the snapshot layer: the round-4 torn-read spec ran
  * at toy row counts, where commit/vacuum windows are microseconds wide.
  * Here the table holds ~800k rows (the sf1 events tier's volume), so
  * every window a reader could fall into — manifest publish, partition
  * rewrite, file reclamation — is open for real fractions of a second
  * while a reader thread hammers `read()`.
  *
  * Retention contract exercised: `vacuum(retainFrom = current - 1)` keeps
  * the previous version readable, so a reader that resolved its manifest
  * just before a commit+vacuum pair never sees its files reclaimed. The
  * reader must (a) never throw, and (b) only ever observe COMPLETE
  * states: every partition carries exactly one commit tag and the total
  * row count never drifts.
  */
class SnapshotsScaleStressSpec extends SparkSpec {

  private val PartN = 100000L // rows per partition; 8 partitions ≈ sf1 events
  private val days = (0 until 8).map(i => s"d$i")

  /** Partition `day` as written by commit `tag`: PartN rows, cents
    * encoding the tag so a torn read is detectable per row. */
  private def part(day: String, tag: Long): DataFrame =
    spark.range(PartN).select(
      concat(lit(s"$day-"), col("id")).as("id"),
      lit(day).as("day"),
      (lit(tag) * 10000000L + col("id")).as("cents"))

  test("sf1-tier: reader hammering read() during commit+vacuum churn " +
      "sees only complete states and never a reclaimed file") {
    val t = tmpDir("snap_scale")
    Snapshots.commitFull(
      days.map(d => part(d, 1L)).reduce(_ unionByName _), t, "day")

    // one observation = (total rows, max distinct tags in any partition)
    case class Obs(total: Long, maxTags: Long)
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Obs]()
    val readerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    @volatile var writerDone = false
    val reader = new Thread(() => {
      try {
        while (!writerDone) {
          val r = Snapshots.read(spark, t)
            .groupBy(col("day"))
            .agg(count_distinct(floor(col("cents") / 10000000L)).as("tags"),
              count(lit(1)).as("n"))
            .agg(sum(col("n")).as("total"), max(col("tags")).as("maxTags"))
            .head()
          observed.add(Obs(r.getLong(0), r.getLong(1)))
        }
      } catch { case e: Throwable => readerErr.set(e) }
    })
    reader.start()
    try {
      (2 to 7).foreach { k =>
        Snapshots.commitOverwritePartition(
          part(days((k - 2) % days.size), k.toLong), t, "day",
          days((k - 2) % days.size))
        // retain TWO versions behind current: an in-flight reader
        // resolves at latest one commit back, but its 800k-row scan can
        // still be running a full writer iteration later under local[4]
        // contention — one extra retained version covers that window
        // (the production retention-vs-longest-reader sizing rule)
        val retain = math.max(1, k - 2)
        Snapshots.vacuum(spark, t, retainFrom = retain)
        // every retained version must stay fully readable
        assert(Snapshots.readAsOf(spark, t, retain).count() ===
          PartN * days.size, s"retained v$retain unreadable after vacuum")
      }
    } finally { writerDone = true; reader.join(60000) }

    assert(readerErr.get() == null,
      s"reader thread threw: ${readerErr.get()}")
    val seen = scala.jdk.CollectionConverters
      .CollectionHasAsScala(observed).asScala.toSeq
    assert(seen.nonEmpty, "the reader must have completed some reads")
    val torn = seen.filter(o =>
      o.total != PartN * days.size || o.maxTags != 1L)
    assert(torn.isEmpty, s"torn observations: ${torn.take(3)}")

    // fully-vacuumed historical versions fail loudly, not wrongly
    val err = intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, t, 1)
    }
    assert(err.getMessage.contains("vacuumed"))
  }
}
