package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.SparkSpec

/** Add-only schema evolution on the snapshot store: an append that
  * carries a new column evolves the table schema without touching old
  * files, reads null-fill the column in pre-change files, time travel
  * to a pre-change version returns exactly that version's columns,
  * manifest stats pruning still skips pre-change files, and a type
  * change is refused.
  */
class SnapshotsSchemaSpec extends SparkSpec {

  private def v1Rows: DataFrame = {
    val s = spark
    import s.implicits._
    (1 to 6).map(i => (s"a-$i", "d1", i.toLong))
      .toDF("id", "day", "cents")
  }

  private def v2Rows: DataFrame = {
    val s = spark
    import s.implicits._
    (1 to 4).map(i => (s"b-$i", "d2", 100L + i, s"web-$i"))
      .toDF("id", "day", "cents", "channel")
  }

  test("append with a new column: old files null-fill, time travel " +
      "returns the pre-change columns, history stays walkable") {
    val t = tmpDir("snap_schema")
    Snapshots.commitFull(v1Rows, t, "day", statsCols = Seq("cents"))
    Snapshots.commitAppend(v2Rows, t, "day", statsCols = Seq("cents"))

    val cur = Snapshots.read(spark, t)
    assert(cur.columns.toSeq == Seq("id", "day", "cents", "channel"),
      s"evolved read must surface the union schema: ${cur.columns.toSeq}")
    assert(cur.schema("channel").dataType == StringType)
    assert(cur.where(col("day") === "d1" && col("channel").isNull)
      .count() == 6, "pre-change rows must null-fill the added column")
    assert(cur.where(col("day") === "d2" && col("channel").isNotNull)
      .count() == 4)

    // time travel ACROSS the change: v1 has exactly its own columns
    val old = Snapshots.readAsOf(spark, t, 1)
    assert(old.columns.toSeq == Seq("id", "day", "cents"),
      s"pre-change version must not grow columns: ${old.columns.toSeq}")
    assert(old.count() == 6)
    assert(Snapshots.schemaOf(spark, t, 1).get.fieldNames.toSeq ==
      Seq("id", "day", "cents"))
    assert(Snapshots.schemaOf(spark, t, 2).get.fieldNames.toSeq ==
      Seq("id", "day", "cents", "channel"))
  }

  test("stats pruning still skips pre-change files after the evolution") {
    val t = tmpDir("snap_schema_prune")
    Snapshots.commitFull(v1Rows, t, "day", statsCols = Seq("cents"))
    Snapshots.commitAppend(v2Rows, t, "day", statsCols = Seq("cents"))
    // cents ranges are disjoint (1..6 vs 101..104): a low-range read
    // must plan zero post-change files and still parse the old ones
    val low = Snapshots.readRange(spark, t, "cents", "1", "6")
    assert(low.count() == 6)
    val pruned = Snapshots.prunedFiles(spark, t,
      Snapshots.currentVersion(spark, t), "cents", "1", "6")
    assert(pruned.nonEmpty && pruned.forall(_.partition == "d1"),
      s"low-range prune must keep only pre-change files: $pruned")
    // and the pruned read STILL surfaces the evolved schema
    assert(low.columns.contains("channel"))
  }

  test("mergeRows into an evolved table: a CDC batch carrying the new " +
      "column updates pre-change rows and the rewrite null-fills the " +
      "rest") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_schema_merge")
    Snapshots.commitFull(v1Rows, t, "day")
    Snapshots.commitAppend(v2Rows, t, "day")
    // the CDC batch speaks the EVOLVED schema: update a pre-change row
    // (gains a channel), delete another, insert into the old partition
    val changes = Seq(
      ("a-1", "d1", 999L, "email", "U"),
      ("a-2", "d1", 0L, null.asInstanceOf[String], "D"),
      ("a-9", "d1", 777L, "sms", "I"))
      .toDF("id", "day", "cents", "channel", "op")
    val v = Snapshots.mergeRows(spark, t, "day", "id", changes)
    assert(v == 3)
    val d1 = Snapshots.read(spark, t).where(col("day") === "d1")
    assert(d1.count() == 6) // 6 - 1 deleted + 1 inserted
    val byId = d1.collect().map(r => r.getAs[String]("id") ->
      ((r.getAs[Long]("cents"), Option(r.getAs[String]("channel"))))).toMap
    assert(byId("a-1") == ((999L, Some("email"))),
      "updated pre-change row must carry the new column's value")
    assert(byId("a-9") == ((777L, Some("sms"))))
    assert(!byId.contains("a-2"), "deleted key must be gone")
    assert(byId("a-3") == ((3L, None)),
      "passed-through pre-change rows null-fill the new column")
    // the untouched post-change partition still serves its values
    assert(Snapshots.read(spark, t)
      .where(col("day") === "d2" && col("channel").isNotNull)
      .count() == 4)
  }

  test("mergeRows accepts an OLD-SHAPE batch after an evolution " +
      "(recorded-schema null-fill on write), a NEW-column batch evolves " +
      "the schema through the merge, and time travel spans both") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_schema_merge_old")
    Snapshots.commitFull(v1Rows, t, "day") // v1: id, day, cents
    val v2 = Snapshots.commitAppend(v2Rows, t, "day") // v2: + channel
    // a producer still emitting the PRE-EVOLUTION shape: no channel
    val oldShape = Seq(
      ("a-1", "d1", 111L, "U"),
      ("a-2", "d1", 0L, "D"),
      ("b-1", "d2", 222L, "U"), // post-change row updated by old shape
      ("z-1", "d3", 333L, "I")) // insert into a brand-new partition
      .toDF("id", "day", "cents", "op")
    val v3 = Snapshots.mergeRows(spark, t, "day", "id", oldShape)
    assert(v3 == 3)
    val cur = Snapshots.read(spark, t)
    assert(cur.columns.toSeq == Seq("id", "day", "cents", "channel"))
    assert(cur.count() == 10) // 6 + 4 - 1 deleted + 1 inserted
    val byId = cur.collect().map(r => r.getAs[String]("id") ->
      ((r.getAs[Long]("cents"), Option(r.getAs[String]("channel"))))).toMap
    assert(byId("a-1") == ((111L, None)))
    assert(!byId.contains("a-2"))
    assert(byId("z-1") == ((333L, None)))
    // the old-shape update is a full-row statement in ITS schema: the
    // evolved column null-fills, mirroring the read path's rule
    assert(byId("b-1") == ((222L, None)),
      "old-shape update must null-fill the evolved column")
    assert(byId("b-2")._2 == Some("web-2"),
      "untouched post-change rows keep their values")
    // time travel across the merge AND the evolution
    assert(Snapshots.readAsOf(spark, t, 1).columns.toSeq ==
      Seq("id", "day", "cents"))
    assert(Snapshots.readAsOf(spark, t, v2)
      .where(col("id") === "a-2").count() == 1)
    // a batch carrying a column the TABLE has never seen evolves the
    // schema add-only through the merge
    val newer = Seq(("a-3", "d1", 555L, "promo", "U"))
      .toDF("id", "day", "cents", "origin", "op")
    val v4 = Snapshots.mergeRows(spark, t, "day", "id", newer)
    val cur4 = Snapshots.read(spark, t)
    assert(cur4.columns.toSeq ==
      Seq("id", "day", "cents", "channel", "origin"))
    val a3 = cur4.where(col("id") === "a-3").collect().head
    assert(a3.getAs[Long]("cents") == 555L &&
      a3.getAs[String]("origin") == "promo")
    assert(cur4.where(col("origin").isNull).count() == cur4.count() - 1,
      "every pre-existing row null-fills the merged-in column")
    assert(Snapshots.schemaOf(spark, t, v4).get.fieldNames.contains("origin"))
    // a key/part/op-less batch is refused fail-fast
    val ex = intercept[IllegalArgumentException] {
      Snapshots.mergeRows(spark, t, "day", "id",
        Seq(("x", 1L)).toDF("id", "cents"))
    }
    assert(ex.getMessage.contains("must carry"))
  }

  test("a rewrite of a pre-change partition lands under the evolved " +
      "schema; a type change is refused") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_schema_rewrite")
    Snapshots.commitFull(v1Rows, t, "day", statsCols = Seq("cents"))
    Snapshots.commitAppend(v2Rows, t, "day", statsCols = Seq("cents"))
    // deleteRows rewrites d1 copy-on-write: the surviving rows are
    // re-written under the evolved schema (channel physically present)
    Snapshots.deleteRows(spark, t, "day", "id",
      Seq("a-1").toDF("id"), statsCols = Seq("cents"))
    val cur = Snapshots.read(spark, t)
    assert(cur.count() == 9)
    assert(cur.where(col("day") === "d1").count() == 5)
    assert(Snapshots.schemaOf(spark, t, 3).get.fieldNames.toSeq ==
      Seq("id", "day", "cents", "channel"))

    // add-only: cents long -> string must fail fast
    val bad = Seq(("c-1", "d3", "oops")).toDF("id", "day", "cents")
    val ex = intercept[IllegalArgumentException] {
      Snapshots.commitAppend(bad, t, "day")
    }
    assert(ex.getMessage.contains("add-only"))
    assert(Snapshots.read(spark, t).schema("cents").dataType == LongType)
  }

  test("legacy adoption resolves the CARRIED files' schema: a first " +
      "tracked commit with a narrower frame keeps carried-only columns " +
      "and refuses a type conflict with carried files") {
    val s = spark
    import s.implicits._
    val t = tmpDir("snap_schema_legacy")
    Snapshots.commitFull(v2Rows, t, "day") // id, day, cents, channel
    // simulate a pre-schema-tracking table: drop the recorded _schema
    val f = new java.io.File(t, "_manifests/v1/_schema")
    assert(f.delete(), "test setup: _schema must exist to delete")
    assert(Snapshots.schemaOf(spark, t, 1).isEmpty)
    // first tracked commit carries a frame LACKING `channel`: legacy
    // adoption must take carried-files ++ frame, not just the frame —
    // otherwise evolved reads silently drop `channel` from v2Rows' files
    val narrow = Seq(("n-1", "d9", 7L)).toDF("id", "day", "cents")
    Snapshots.commitAppend(narrow, t, "day")
    val sch2 = Snapshots.schemaOf(spark, t, 2).get
    assert(sch2.fieldNames.toSeq == Seq("id", "day", "cents", "channel"),
      s"carried-file columns must survive legacy adoption: " +
        s"${sch2.fieldNames.toSeq}")
    val cur = Snapshots.read(spark, t)
    assert(cur.where(col("channel").isNotNull).count() == 4)
    assert(cur.where(col("day") === "d9" && col("channel").isNull)
      .count() == 1)
    // a type conflict with CARRIED files is refused at commit time
    val t2 = tmpDir("snap_schema_legacy2")
    Snapshots.commitFull(v1Rows, t2, "day")
    assert(new java.io.File(t2, "_manifests/v1/_schema").delete())
    val bad = Seq(("c-1", "d3", "oops")).toDF("id", "day", "cents")
    val ex = intercept[IllegalArgumentException] {
      Snapshots.commitAppend(bad, t2, "day")
    }
    assert(ex.getMessage.contains("add-only"),
      s"legacy adoption must type-check against carried files: " +
        ex.getMessage)
    // the refused slot is released: the next good commit lands
    Snapshots.commitAppend(narrow, t2, "day")
    assert(Snapshots.currentVersion(spark, t2) == 2)
  }
}
