package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Optimistic-concurrency validation on the copy-on-write rewrites:
  * a rewrite computed FROM version N must refuse to publish on top of
  * anything newer — publishing would silently drop the interleaved
  * commit's changes to the rewritten partitions (lost update). The
  * version-slot reservation alone only serializes the slot; the
  * `expectedPrev` check is the snapshot validation (the Delta/Iceberg
  * commit-conflict rule), and it is exact because the held slot
  * freezes currentVersion until the holder publishes or releases.
  */
class SnapshotsOccSpec extends SparkSpec {

  private def rows(part: String, ids: Range, v: Long): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (s"$part-$i", part, v + i)).toDF("id", "day", "cents")
  }

  test("an overwrite computed from a stale version is refused, the " +
      "slot is released, and a retry from a fresh read succeeds with " +
      "BOTH writers' changes") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_occ")
    Snapshots.commitFull(
      rows("d1", 1 to 4, 0).unionByName(rows("d2", 1 to 2, 100)),
      t, "day")

    // writer A computes a d1 rewrite against v1...
    val stale = Snapshots.readAsOf(spark, t, 1)
      .where(col("day") === "d1" && col("id") =!= "d1-1")
    // ...writer B lands v2 first (touching the same partition)
    Snapshots.commitOverwritePartitions(
      rows("d1", 1 to 5, 1000), t, "day", Seq("d1"))
    assert(Snapshots.currentVersion(spark, t) == 2)

    // A's publish must fail the snapshot validation, not drop B's rows
    intercept[Snapshots.ConcurrentCommitException] {
      Snapshots.commitOverwritePartitions(stale, t, "day", Seq("d1"),
        expectedPrev = Some(1))
    }
    assert(Snapshots.currentVersion(spark, t) == 2,
      "the refused commit must not publish")
    // the refused slot is released: the retry needs no manual break
    val fresh = Snapshots.read(spark, t)
      .where(col("day") === "d1" && col("id") =!= "d1-1")
    Snapshots.commitOverwritePartitions(fresh, t, "day", Seq("d1"),
      expectedPrev = Some(Snapshots.currentVersion(spark, t)))
    val ids = Snapshots.read(spark, t).where(col("day") === "d1")
      .select(col("id")).collect().map(_.getString(0)).toSet
    assert(ids == Set("d1-2", "d1-3", "d1-4", "d1-5"),
      s"retry must apply A's delete ON TOP of B's rewrite: $ids")
  }

  test("mergeRows refuses to publish over a commit that landed after " +
      "its pinned read (simulated via the validated primitive); a " +
      "single-writer merge with no interleaving is unaffected") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_occ_merge")
    Snapshots.commitFull(rows("d1", 1 to 3, 0), t, "day")
    // no interleaving: normal merge passes its own validation
    val v = Snapshots.mergeRows(spark, t, "day", "id",
      Seq(("d1-1", "d1", 999L, "U")).toDF("id", "day", "cents", "op"))
    assert(v == 2)
    // stale expectedPrev on the primitive (what mergeRows passes
    // internally) is refused
    intercept[Snapshots.ConcurrentCommitException] {
      Snapshots.commitOverwritePartitions(
        rows("d1", 1 to 1, 5000), t, "day", Seq("d1"),
        expectedPrev = Some(1))
    }
    assert(Snapshots.currentVersion(spark, t) == 2)
  }
}
