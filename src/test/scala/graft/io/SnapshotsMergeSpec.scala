package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transactional MERGE into the snapshot store ([[Snapshots.mergeRows]]):
  * one CDC batch of updates/inserts/deletes must land as ONE atomic
  * version, pinned readers must keep their pre-merge answer, untouched
  * partitions must carry by reference, a partition emptied by its
  * deletes must publish as a pure tombstone, and a batch that would
  * empty the whole table must be refused.
  */
class SnapshotsMergeSpec extends SparkSpec {

  private def rows(part: String, ids: Range, v: Long): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (s"$part-$i", part, v + i)).toDF("id", "day", "cents")
  }

  private def changeRows(rs: Seq[(String, String, Long, String)])
      : DataFrame = {
    val s = spark
    import s.implicits._
    rs.toDF("id", "day", "cents", "op")
  }

  private def contents(df: DataFrame): Set[(String, String, Long)] =
    df.select(col("id"), col("day"), col("cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

  test("one CDC batch (update, delete, insert into a new partition, " +
      "partition-key-changing update) lands as ONE version; pinned " +
      "reader and untouched partition are undisturbed") {
    val t = tmpDir("snap_merge")
    Snapshots.commitFull(
      rows("d1", 1 to 4, 0).unionByName(rows("d2", 1 to 3, 100))
        .unionByName(rows("d3", 1 to 2, 200)), t, "day")
    val pinned = Snapshots.read(spark, t)
    val before = contents(pinned)

    val v = Snapshots.mergeRows(spark, t, "day", "id", changeRows(Seq(
      ("d1-1", "d1", 999L, "U"), // in-place update
      ("d1-2", "d2", 777L, "U"), // partition-key change: d1 → d2
      ("d2-2", "d2", 0L, "D"), // delete
      ("d4-1", "d4", 444L, "I")))) // insert into a brand-new partition
    assert(v == 2, "all four changes must land as ONE version")

    val after = contents(Snapshots.read(spark, t))
    val want = before -
      (("d1-1", "d1", 1L)) - (("d1-2", "d1", 2L)) - (("d2-2", "d2", 102L)) +
      (("d1-1", "d1", 999L)) + (("d1-2", "d2", 777L)) +
      (("d4-1", "d4", 444L))
    assert(after == want, s"merged content wrong:\n got $after\nwant $want")
    assert(contents(pinned) == before,
      "the pinned pre-merge reader must keep answering with v1")
    assert(contents(Snapshots.readAsOf(spark, t, 1)) == before,
      "time travel across the merge returns the pre-merge rows")

    // d3 held no changed key and received no row: carried by reference
    val m1 = Snapshots.readManifest(spark, t, 1)
    val m2 = Snapshots.readManifest(spark, t, 2)
    assert(m1.filter(_.partition == "d3").map(_.path).toSet ==
      m2.filter(_.partition == "d3").map(_.path).toSet,
      "untouched partition must ride by reference, not rewrite")
    assert(m2.exists(_.partition == "d4"), "new partition materialized")
  }

  test("a partition emptied by its deletes publishes as a pure " +
      "tombstone; a no-op batch commits nothing") {
    val t = tmpDir("snap_merge_tomb")
    Snapshots.commitFull(
      rows("d1", 1 to 2, 0).unionByName(rows("d2", 1 to 3, 100)),
      t, "day")
    val v = Snapshots.mergeRows(spark, t, "day", "id", changeRows(Seq(
      ("d1-1", "d1", 0L, "D"), ("d1-2", "d1", 0L, "D"))))
    assert(v == 2)
    val after = Snapshots.read(spark, t)
    assert(after.where(col("day") === "d1").count() == 0,
      "emptied partition must disappear")
    assert(after.count() == 3)
    assert(!Snapshots.readManifest(spark, t, 2).exists(_.partition == "d1"))

    // deletes of absent keys touch no partition: no commit at all
    val v2 = Snapshots.mergeRows(spark, t, "day", "id", changeRows(Seq(
      ("nope-1", "d9", 0L, "D"))))
    assert(v2 == 0, "a batch touching nothing must not publish")
    assert(Snapshots.currentVersion(spark, t) == 2)
  }

  test("a merge that would empty the whole table is refused and the " +
      "table stays readable") {
    val t = tmpDir("snap_merge_empty")
    Snapshots.commitFull(rows("d1", 1 to 2, 0), t, "day")
    val ex = intercept[IllegalArgumentException] {
      Snapshots.mergeRows(spark, t, "day", "id", changeRows(Seq(
        ("d1-1", "d1", 0L, "D"), ("d1-2", "d1", 0L, "D"))))
    }
    assert(ex.getMessage.contains("EMPTY version"))
    assert(Snapshots.currentVersion(spark, t) == 1)
    assert(Snapshots.read(spark, t).count() == 2)
  }

  test("mergeRows forwards statsCols so rewritten partitions keep " +
      "their manifest min/max") {
    val t = tmpDir("snap_merge_stats")
    Snapshots.commitFull(
      rows("d1", 1 to 3, 0).unionByName(rows("d2", 1 to 3, 100)),
      t, "day", statsCols = Seq("cents"))
    Snapshots.mergeRows(spark, t, "day", "id", changeRows(Seq(
      ("d1-1", "d1", 999L, "U"))), statsCols = Seq("cents"))
    val m = Snapshots.readManifest(spark, t, 2)
    assert(m.forall(_.stats.contains("cents")),
      "a rewritten file lost its 'cents' manifest stats")
  }
}
